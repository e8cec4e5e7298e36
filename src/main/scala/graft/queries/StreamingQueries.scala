package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** q132's latency quantiles (percent points over the minute grid). */
  val FunnelQuantiles: Seq[Int] = Seq(50, 90, 99)

  /** The q128 funnel engine: per-user (t1, t2, t3) first-qualified
    * step times in microseconds (NULL where the user never reaches
    * the step) — ONE keyed window chain sharing a single per-user
    * sort. Shared by q128 (step counts) and q132 (conversion-latency
    * quantiles) so both read the same strict-ordering semantics. */
  private[graft] def funnelTimes(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("tsu", unix_micros(col("ts")))
      .withColumn("v1",
        min(when(col("event_type") === "view", col("tsu"))).over(w))
      .withColumn("c1",
        min(when(col("event_type") === "click" &&
          col("v1") < col("tsu"), col("tsu"))).over(w))
      .withColumn("p1",
        min(when(col("event_type") === "purchase" &&
          col("c1") < col("tsu"), col("tsu"))).over(w))
      .groupBy(col("user_id")).agg(
        min(col("v1")).as("t1"), min(col("c1")).as("t2"),
        min(col("p1")).as("t3"))
  }

  /** Oracle twin of [[funnelTimes]] — CTEs through `f(user_id, t1,
    * t2, t3)`, shared by the q128 and q132 oracles. */
  private def funnelCtes: String =
    s"""e AS (SELECT *, epoch_us(ts) AS tsu FROM events),
       |w1 AS (SELECT *,
       |  MIN(CASE WHEN event_type = 'view' THEN tsu END) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS UNBOUNDED PRECEDING) AS v1 FROM e),
       |w2 AS (SELECT *,
       |  MIN(CASE WHEN event_type = 'click' AND v1 < tsu THEN tsu END) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS UNBOUNDED PRECEDING) AS c1 FROM w1),
       |w3 AS (SELECT *,
       |  MIN(CASE WHEN event_type = 'purchase' AND c1 < tsu THEN tsu END) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS UNBOUNDED PRECEDING) AS p1 FROM w2),
       |f AS (SELECT user_id, MIN(v1) AS t1, MIN(c1) AS t2, MIN(p1) AS t3
       |  FROM w3 GROUP BY user_id)""".stripMargin

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

    "q132_conversion_latency" -> ((s, dir) => {
      // Conversion-latency quantiles for the q128 funnel: among
      // CONVERTED users, how long from first view to first qualified
      // purchase — read off a minute-grain latency directory by the
      // q92 all-integer rule (first bin whose cumulative count covers
      // q% — conservative to one minute, no percentile-interpolation
      // convention to port). The directory is TIME-RANGE-bounded, so
      // the cumulative window runs on a bounded frame under the
      // non-foldable constant key; everything upstream is q128's one
      // keyed window chain.
      val lat = funnelTimes(s, dir)
        .filter(col("t3").isNotNull)
        .select(expr("(t3 - t1) div 60000000").as("m"))
        .groupBy(col("m")).agg(count(lit(1)).as("n"))
      val grp = pmod(col("m"), lit(1))
      val c = lat
        .withColumn("cum_n", sum(col("n")).over(
          Window.partitionBy(grp).orderBy(col("m"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total_n", sum(col("n")).over(
          Window.partitionBy(grp)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      import s.implicits._
      broadcast(FunnelQuantiles.toDF("q")).join(c,
          col("cum_n") * 100 >= col("q") * col("total_n"))
        .groupBy(col("q"))
        .agg(min(struct(col("m"), col("cum_n"), col("total_n"))).as("p"))
        .select(col("q").cast("long").as("q"), col("p.m").as("lat_minutes"),
          col("p.cum_n").as("cum_n"), col("p.total_n").as("total_n"))
        .orderBy(col("q"))
    }),

    "q131_event_transitions" -> ((s, dir) => {
      // Order-1 Markov transition matrix between event types, per-user
      // sequences — the behavioral model behind next-event prediction
      // and bot detection (a scraper's view→view→view row lights up
      // against the organic view→click mass). ONE keyed window pass
      // pairs each event with its successor (lead over the per-user
      // time order — millions of small groups at scale), the matrix
      // collapses map-side to ≤ types² cells, and row totals return
      // by broadcast for the probability normalization; n_trans
      // conservation (Σ = events − users) is spec-proven.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tr = events(s, dir)
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_trans"))
      val rows = tr.groupBy(col("from_type"))
        .agg(sum(col("n_trans")).as("row_total"))
      tr.join(broadcast(rows), "from_type")
        .select(col("from_type"), col("to_type"), col("n_trans"),
          col("row_total"),
          round(col("n_trans").cast("double") /
            col("row_total").cast("double"), 6).as("prob"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    "q128_funnel" -> ((s, dir) => {
      // Ordered conversion funnel view → click → purchase: a user
      // converts step k only with an event STRICTLY AFTER their first
      // qualified step-(k−1) event — the classic product-analytics
      // operator, computed in ONE keyed window pass instead of the
      // k-way self-join: running "first view so far" / "first
      // qualified click so far" columns (each window references the
      // previous one, so the per-user sort is planned once and
      // reused), then a per-user min rollup and a 3-row report.
      // Shape: per-user windows are millions of small groups at scale
      // (the q23/q114 argument); everything after the rollup is
      // arithmetic on one row.
      val c = funnelTimes(s, dir).agg(
        sum(col("t1").isNotNull.cast("long")).as("n1"),
        sum(col("t2").isNotNull.cast("long")).as("n2"),
        sum(col("t3").isNotNull.cast("long")).as("n3"))
      def ratio(a: Column, b: Column) =
        when(b > 0, round(a.cast("double") / b.cast("double"), 6))
          .otherwise(lit(null).cast("double"))
      c.select(lit(1L).as("step_id"), lit("view").as("step"),
          col("n1").as("n_users"),
          lit(null).cast("double").as("conv_prev"),
          lit(null).cast("double").as("conv_first"))
        .unionByName(c.select(lit(2L).as("step_id"), lit("click").as("step"),
          col("n2").as("n_users"),
          ratio(col("n2"), col("n1")).as("conv_prev"),
          ratio(col("n2"), col("n1")).as("conv_first")))
        .unionByName(c.select(lit(3L).as("step_id"), lit("purchase").as("step"),
          col("n3").as("n_users"),
          ratio(col("n3"), col("n2")).as("conv_prev"),
          ratio(col("n3"), col("n1")).as("conv_first")))
        .orderBy(col("step_id"))
    }),

    "q129_retention" -> ((s, dir) => {
      // Cohort retention matrix at day grain: cohort = a user's first
      // active day, retention(c, k) = fraction of cohort c active
      // again k days later — the other classic product-analytics
      // table. Shape: first-day rollup is one user-keyed aggregation,
      // the activity join is user-keyed, and the matrix is a
      // map-side-combined groupBy into a TIME-RANGE-bounded directory
      // (≤ days² /2 cells — the q92 argument); day arithmetic is
      // exact integer epoch-day division. Division-convention note
      // (also q119/q130): Spark `div` and DuckDB's integer `//` BOTH
      // truncate toward zero (measured on DuckDB 1.0: -7 // 4 = -1),
      // so engine parity holds for any epoch sign — but truncation
      // is not calendar flooring, so pre-1970 timestamps would bucket
      // toward zero (epoch day 0 spans two calendar days). The events
      // fixture is all post-1970, where truncation == floor.
      val e = events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
      val first = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val sizes = first.groupBy(col("cohort_day"))
        .agg(count(lit(1)).as("cohort_size"))
      e.join(first, "user_id")
        .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"),
          col("user_id"))
        .distinct()
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), "cohort_day")
        .select(col("cohort_day"), col("cohort_size"), col("day_offset"),
          col("n_active"),
          round(col("n_active").cast("double") /
            col("cohort_size").cast("double"), 6).as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
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

    "q131_event_transitions" ->
      s"""WITH tr0 AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS to_type
         |  FROM events),
         |tr AS (
         |  SELECT from_type, to_type, COUNT(*)::BIGINT AS n_trans
         |  FROM tr0 WHERE to_type IS NOT NULL
         |  GROUP BY from_type, to_type),
         |rt AS (SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS row_total
         |  FROM tr GROUP BY from_type)
         |SELECT tr.from_type, tr.to_type, tr.n_trans, rt.row_total,
         |  round(tr.n_trans::DOUBLE / rt.row_total::DOUBLE, 6) AS prob
         |FROM tr JOIN rt USING (from_type)
         |ORDER BY tr.from_type, tr.to_type""".stripMargin,

    "q132_conversion_latency" -> {
      val qlist = FunnelQuantiles.mkString("[", ", ", "]")
      s"""WITH $funnelCtes,
         |lat AS (SELECT (t3 - t1) // 60000000 AS m FROM f WHERE t3 IS NOT NULL),
         |d AS (SELECT m, COUNT(*)::BIGINT AS n FROM lat GROUP BY m),
         |c AS (SELECT m, n,
         |    CAST(SUM(n) OVER (ORDER BY m) AS BIGINT) AS cum_n,
         |    CAST(SUM(n) OVER () AS BIGINT) AS total_n FROM d),
         |qs AS (SELECT CAST(unnest($qlist) AS BIGINT) AS q),
         |pick AS (SELECT qs.q, MIN(c.m) AS m FROM qs JOIN c
         |    ON c.cum_n * 100 >= qs.q * c.total_n GROUP BY qs.q)
         |SELECT p.q, p.m AS lat_minutes, c.cum_n, c.total_n
         |FROM pick p JOIN c ON p.m = c.m ORDER BY p.q""".stripMargin
    },

    "q128_funnel" ->
      s"""WITH $funnelCtes,
         |c AS (SELECT COUNT(t1)::BIGINT AS n1, COUNT(t2)::BIGINT AS n2,
         |    COUNT(t3)::BIGINT AS n3 FROM f)
         |SELECT 1::BIGINT AS step_id, 'view' AS step, n1 AS n_users,
         |  NULL::DOUBLE AS conv_prev, NULL::DOUBLE AS conv_first FROM c
         |UNION ALL
         |SELECT 2::BIGINT, 'click', n2,
         |  CASE WHEN n1 > 0 THEN round(n2::DOUBLE / n1::DOUBLE, 6) END,
         |  CASE WHEN n1 > 0 THEN round(n2::DOUBLE / n1::DOUBLE, 6) END FROM c
         |UNION ALL
         |SELECT 3::BIGINT, 'purchase', n3,
         |  CASE WHEN n2 > 0 THEN round(n3::DOUBLE / n2::DOUBLE, 6) END,
         |  CASE WHEN n1 > 0 THEN round(n3::DOUBLE / n1::DOUBLE, 6) END FROM c
         |ORDER BY step_id""".stripMargin,

    "q129_retention" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
         |first AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
         |sizes AS (SELECT cohort_day, COUNT(*)::BIGINT AS cohort_size
         |  FROM first GROUP BY cohort_day),
         |act AS (
         |  SELECT DISTINCT f.cohort_day, e.day - f.cohort_day AS day_offset,
         |    e.user_id
         |  FROM e JOIN first f USING (user_id)),
         |m AS (SELECT cohort_day, day_offset, COUNT(*)::BIGINT AS n_active
         |  FROM act GROUP BY cohort_day, day_offset)
         |SELECT m.cohort_day, s.cohort_size, m.day_offset, m.n_active,
         |  round(m.n_active::DOUBLE / s.cohort_size::DOUBLE, 6) AS retention
         |FROM m JOIN sizes s USING (cohort_day)
         |ORDER BY m.cohort_day, m.day_offset""".stripMargin,

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
