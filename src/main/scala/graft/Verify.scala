package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // flag > env > default, same dialect as graft.Search; positionals
    // stay `<sfDir> <outDir>` so the driver's invocation is unchanged
    val (flags, positionals) = Search.splitArgs(args.toSeq)
    val needed = Seq("sf-dir", "out-dir").count(f => !flags.contains(f))
    require(positionals.length >= needed,
      "usage: graft.Verify <sfDir> <outDir> [--sf-dir D] [--out-dir D] [--cpus N]")
    val sfDir = flags.getOrElse("sf-dir", positionals.head)
    val outDir = flags.getOrElse("out-dir", positionals(if (flags.contains("sf-dir")) 0 else 1))
    val cpus = flags.get("cpus")
      .orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // fixture events.ts is TIMESTAMP(NANOS) parquet, which Spark 4
      // otherwise refuses; read as long, normalized in the queries
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional dev-loop filter (--queries a,b,c); the driver's bare
    // two-positional invocation still dumps everything
    val only = flags.get("queries").map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // Fail LOUDLY, not by omission: a failed query must leave an
        // artifact the driver turns into an `err` row. Writing nothing
        // silently shrinks the correctness file (round 8: five broken
        // queries showed as missing rows, not red ones). The `_error`
        // file inside the query's output dir makes the breakage visible
        // both to the driver (unreadable-as-parquet → err entry) and to
        // a human listing the dump.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val dir = Paths.get(s"$outDir/$name")
        try {
          if (Files.exists(dir)) { // clear any partial parquet output
            Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
              .forEach(p => Files.deleteIfExists(p))
          }
          Files.createDirectories(dir)
          Files.writeString(dir.resolve("_error"),
            s"${e.getClass.getName}: ${e.getMessage}\n")
        } catch { case m: Throwable =>
          System.err.println(s"[verify] $name: could not write _error marker: ${m.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
