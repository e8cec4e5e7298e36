package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch twins of the streaming operators (graft.streaming.EventStreams)
  * so the driver's DuckDB oracle can check the semantics the streams
  * implement incrementally. q9_hourly_events is the twin of
  * `hourlyCounts`; q23_sessions is the twin of `sessionize`.
  */
object StreamingQueries {

  val SessionGapMinutes = 30
  private val gapUs = SessionGapMinutes * 60L * 1000000L

  /** events with ts normalized — see [[graft.sources.Sources.normalizeEventTs]]. */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.sources.Sources.normalizeEventTs(graft.SparkEntry.tbl(s, dir, "events"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q23_sessions" -> ((s, dir) => {
      val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sess = events(s, dir)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byTime))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("is_new")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_ev"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("dur_us"))
      sess
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_sessions"),
          sum(col("n_ev")).as("n_events"),
          max(col("n_ev")).as("max_session_events"),
          max(col("dur_us")).as("max_session_us"))
        .orderBy(col("user_id"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q23_sessions" ->
      s"""WITH ordered AS (
         |  SELECT user_id, event_id, ts,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |  FROM events),
         |flags AS (
         |  SELECT user_id, event_id, ts,
         |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > $gapUs
         |      THEN 1 ELSE 0 END AS is_new
         |  FROM ordered),
         |sess_ids AS (
         |  SELECT user_id, event_id, ts,
         |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS session_id
         |  FROM flags),
         |sess AS (
         |  SELECT user_id, session_id, COUNT(*) AS n_ev,
         |    MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS dur_us
         |  FROM sess_ids GROUP BY user_id, session_id)
         |SELECT user_id,
         |  COUNT(*) AS n_sessions,
         |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
         |  CAST(MAX(n_ev) AS BIGINT) AS max_session_events,
         |  CAST(MAX(dur_us) AS BIGINT) AS max_session_us
         |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
