package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-18 optimization evidence tool: writes the FULL
  * `explain("formatted")` output of named declared queries to
  * `<outDir>/<query>_<tag>.txt`, one file per query — the
  * before/after plan record the optimization round commits under
  * `plans/r18/`. Unlike [[PlanDump]] (which curates PLANS.md with
  * trimmed plans + prose), this dumps the complete formatted plan so
  * a reviewer can check Exchange counts, join strategies,
  * PushedFilters and ReadSchema claims against the file.
  *
  * Usage:
  *   sbt "runMain graft.PlanSnap <sfDir> <outDir> <tag> q1,q2,..."
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanSnap <sfDir> <outDir> <tag:before|after> <q1,q2,...>")
    val Array(sfDir, outDir, tag, sel) = args.take(4)
    val names = sel.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
