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
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
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
