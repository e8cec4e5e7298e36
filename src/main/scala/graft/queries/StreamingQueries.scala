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

    "q119_session_concurrency" -> ((s, dir) => {
      // Peak concurrent sessions by sweep-line — the capacity question
      // ("how many sessions were open at once?") answered WITHOUT the
      // interval-overlap self-join, which is quadratic in concurrency
      // exactly when the answer is interesting. Each q23 session emits
      // two deltas (+1 at its start minute, −1 after its end minute);
      // ONE map-side-combined groupBy collapses them to the minute
      // directory — VALUE-RANGE-bounded (≤ minutes in the corpus'
      // time span, the q92/q110 argument), so the cumulative window
      // runs on a bounded frame (non-foldable constant partition key)
      // and concurrency between deltas is constant, making the
      // directory max the true max everywhere. Top-5 peak minutes via
      // TakeOrderedAndProject.
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = events(s, dir)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byTime))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("is_new")).over(
            byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(unix_micros(col("ts"))).as("s_us"),
          max(unix_micros(col("ts"))).as("e_us"))
      val deltas = sess
        .select(expr("s_us div 60000000").as("m"), lit(1L).as("d"))
        .unionByName(sess
          .select((expr("e_us div 60000000") + 1).as("m"), lit(-1L).as("d")))
      deltas.groupBy(col("m")).agg(sum(col("d")).as("dd"))
        .withColumn("n_active", sum(col("dd")).over(
          Window.partitionBy(pmod(col("m"), lit(1))).orderBy(col("m"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("m").as("minute"), col("n_active").cast("long"))
        .orderBy(col("n_active").desc, col("minute").asc)
        .limit(5)
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

    "q119_session_concurrency" ->
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
         |  SELECT user_id, session_id,
         |    MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
         |  FROM sess_ids GROUP BY user_id, session_id),
         |deltas AS (
         |  SELECT s_us // 60000000 AS m, 1::BIGINT AS d FROM sess
         |  UNION ALL
         |  SELECT e_us // 60000000 + 1 AS m, -1::BIGINT AS d FROM sess),
         |dir AS (SELECT m, SUM(d) AS dd FROM deltas GROUP BY m),
         |conc AS (
         |  SELECT m, SUM(dd) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS n_active
         |  FROM dir)
         |SELECT m AS minute, CAST(n_active AS BIGINT) AS n_active
         |FROM conc ORDER BY n_active DESC, minute ASC LIMIT 5""".stripMargin,
  )
}
