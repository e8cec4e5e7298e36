package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions._
import graft.search.{HashingEmbedder, SearchEngine}
import graft.operators.TopKAggregator

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Determinism conventions shared by every (query, oracle) pair so the
  * driver's DuckDB hash compare is exact (SURVEY.md §7 hard part (e)):
  *  - double aggregates go through decimal: `CAST(SUM(CAST(x AS
  *    DECIMAL(p,s))) AS DOUBLE)` — decimal addition is associative, so
  *    the result is independent of partition/row order in both engines;
  *  - cosine scores are rounded to 6 decimals *before* any ranking, and
  *    ties broken by id, so ordering can't flip on 1-ulp differences;
  *  - integer aggregates are cast to BIGINT (DuckDB SUM(int)→HUGEINT);
  *  - timestamps in outputs are formatted to strings;
  *  - every query ends in a deterministic total ORDER BY.
  */
object SparkEntry {

  /** Per-session memoized parquet reads, stored as session temp views:
    * the resolved relation (file listing + footer schema) is reused
    * across the 30+ queries of a Verify/Bench run, and the registry
    * lives *inside* the SparkSession — no static map pinning sessions
    * or plans beyond their lifetime. Assumption (documented): files
    * under a path are immutable within a session; a rewrite between
    * queries would serve the stale listing until the session ends. */
  private[graft] def pathSlug(path: String): String =
    path.replaceAll("[^a-zA-Z0-9]", "_")

  private[graft] def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val view = "graft_src_" + pathSlug(path)
    if (!s.catalog.tableExists(view))
      s.read.parquet(path).createOrReplaceTempView(view)
    s.table(view)
  }

  /** Session-scoped cached intermediate: registers `build` as a temp
    * view and caches it through the session's CacheManager, so (a) the
    * blocks are owned by the session and released with it — no static
    * tracking, no cross-call accumulation — and (b) every query in the
    * session shares ONE materialization (q18/q19/q31 all consume the
    * same shingle table). `spark.catalog.uncacheTable(name)` releases
    * it early if needed.
    *
    * MEMORY_AND_DISK, not the default MEMORY_ONLY: under a constrained
    * driver heap (the gate runs local[32] at 8g) MEMORY_ONLY evicts
    * whole cached views under pressure and silently RECOMPUTES them
    * inside whichever query touches them next — a re-tokenization of
    * the corpus landing on an arbitrary timed query. Spilling to local
    * disk keeps the recompute cost bounded by a sequential read. On a
    * real cluster the same reasoning holds per executor. */
  private[graft] def cachedView(s: SparkSession, name: String)(build: => DataFrame): DataFrame = {
    if (!s.catalog.tableExists(name)) {
      build.createOrReplaceTempView(name)
      s.catalog.cacheTable(name,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    s.table(name)
  }

  /** Spread a narrow ingest frame across the session's cores ONLY
    * when the source scan is too coarse to parallelize the heavy
    * per-row work that follows (tokenization, media decode). The
    * driver fixtures are one row group per table, so a naive read is
    * ONE partition feeding 32 cores — that case must repartition. A
    * realistic multi-file layout already scans in parallel, and an
    * unconditional exchange there is pure waste (round-11 verdict
    * #5) — so the spread is GATED on the scan's actual partition
    * count: repartition only while the input has at most a QUARTER of
    * the session's cores (above that the downstream CPU stage already
    * saturates via Spark's task-per-core overlap; measured: the
    * 12-file probe layout on 32 cores plans NO extra exchange, the
    * one-row-group fixture still spreads). Correctness never depends
    * on the choice — partition-invariance is the repo-wide contract,
    * re-proven by the multi-file probe and MultiFileSpec. */
  private[graft] def spreadIfNarrow(s: SparkSession, df: DataFrame): DataFrame = {
    val want = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 4 <= want) df.repartition(want) else df
  }

  /** `.spreadIfNarrow(s)` as a chainable method — the ingest twin of
    * `.repartition(defaultParallelism)` it replaces at every call
    * site. */
  private[graft] implicit class IngestOps(private val df: DataFrame) extends AnyVal {
    def spreadIfNarrow(s: SparkSession): DataFrame =
      SparkEntry.spreadIfNarrow(s, df)
  }

  /** events with `ts` normalized to TIMESTAMP — all encoding handling
    * lives in [[graft.sources.Sources.normalizeEventTs]]. */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.sources.Sources.normalizeEventTs(tbl(s, dir, "events"))

  /** decimal-routed deterministic sum of a double expression */
  private def dsum(c: Column, scale: Int = 10): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one tool call end-to-end (server.py:71-102): prompt →
    * deterministic embedding → cosine top-10 over the corpus. */
  def entry(spark: SparkSession): DataFrame = {
    val eng = new SearchEngine(spark, new HashingEmbedder(64))
    eng.search("/root/testdata/sf0.001", "fast hash join on a big table", k = 10).toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2 + the
    * north-star extension modules (graft.queries.*). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relationalQueries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.AnnQueries.queries ++
      graft.queries.StreamingQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.ExtraQueries.queries ++
      graft.queries.KeywordQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.CurationQueries.queries

  /** Oracle-checked by Verify but EXCLUDED from the bench set: these
    * are the declared quadratic verification baselines (all-pairs /
    * per-lang-quadratic exact scans whose only job is to prove the LSH
    * production twins q19/q20/q22 lossless at test SF). Their cost
    * grows with corpus², so benching them would measure a shape the
    * engine never runs at scale. */
  val verifyOnly: Set[String] = Set("q18_jaccard_pairs", "q21_embedding_neardup")

  /** The queries whose plans survive a 100× scale-up — what Bench times. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries -- verifyOnly

  private def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- relational core (SURVEY §2.2: scans, aggs, joins, windows) ----

    "q1_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      val disc = $"l_extendedprice" * (lit(1.0) - $"l_discount")
      // spreadIfNarrow (r18): the one-row-group fixture scan feeds the
      // 4 decimal partial aggregates from a single task; the gated
      // spread parallelizes the heavy map side and is a no-op on a
      // realistic multi-file layout (see spreadIfNarrow scaladoc)
      tbl(s, dir, "lineitem")
        .spreadIfNarrow(s)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity", 2).as("sum_qty"),
          dsum($"l_extendedprice", 2).as("sum_base_price"),
          dsum(disc).as("sum_disc_price"),
          dsum(disc * (lit(1.0) + $"l_tax")).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    "q2_revenue_by_nation" -> ((s, dir) => {
      import s.implicits._
      // partial aggregation BELOW the join: lineitem collapses to one
      // exact-decimal row per order before touching orders — the join
      // then moves |orders| rows instead of |lineitem|, and the groupBy
      // output partitioning on l_orderkey is reused by the equi-join
      // (no second fact shuffle). Decimal addition is associative, so
      // sum-of-per-order-sums equals the single-pass sum bit-for-bit.
      // Dims are tiny at any scale factor → broadcast.
      val perOrder = tbl(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(28,10)")).as("rev"),
          count(lit(1)).as("n"))
      perOrder
        .join(tbl(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(tbl(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(tbl(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(tbl(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(
          sum($"rev").cast("double").as("revenue"),
          sum($"n").as("n_items"))
        .orderBy($"r_name", $"n_name")
    }),

    "q3_top_orders" -> ((s, dir) => {
      import s.implicits._
      // global top-k → TakeOrderedAndProject (per-partition heaps, no sort)
      tbl(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
    }),

    "q4_latest_order_per_customer" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
          $"o_totalprice")
        .orderBy($"o_custkey")
    }),

    "q5_filtered_revenue" -> ((s, dir) => {
      import s.implicits._
      // TPC-H Q6 flavor: selective predicates reach the parquet scan
      tbl(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1999-01-01").cast("timestamp") &&
          $"l_discount" >= 0.05 && $"l_quantity" < 24)
        .agg(
          dsum($"l_extendedprice" * $"l_discount").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    "q6_customers_without_orders" -> ((s, dir) => {
      import s.implicits._
      // anti join (SURVEY §2.2 set ops): customers with no big order
      tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders").filter($"o_totalprice" > 300000),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    "q7_mktsegment_stats" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "customer")
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).as("n_customers"),
          dsum($"c_acctbal", 2).as("sum_acctbal"),
          min($"c_acctbal").as("min_acctbal"),
          max($"c_acctbal").as("max_acctbal"))
        .orderBy($"c_mktsegment")
    }),

    "q8_events_json" -> ((s, dir) => {
      import s.implicits._
      events(s, dir)
        .withColumn("k",
          from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    }),

    "q9_hourly_events" -> ((s, dir) => {
      import s.implicits._
      // batch twin of the streaming tumbling-window aggregation
      events(s, dir)
        .groupBy(date_trunc("hour", $"ts").as("bucket"), $"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value", 6).as("sum_value"))
        .select(date_format($"bucket", "yyyy-MM-dd HH:mm:ss").as("hour"),
          $"event_type", $"n", $"sum_value")
        .orderBy($"hour", $"event_type")
    }),

    "q25_rollup_revenue" -> ((s, dir) => {
      import s.implicits._
      // hierarchical subtotals region → nation → grand total (rollup);
      // '*ALL*' sentinel instead of NULL so ordering/hashing is
      // collation-trivial in both engines. Same partial-agg-below-join
      // shape as q2: the rollup's Expand (which duplicates every input
      // row once per grouping set) runs over per-order rows, not raw
      // lineitem.
      val perOrder = tbl(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(28,10)")).as("rev"),
          count(lit(1)).as("n"))
      perOrder
        .join(tbl(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(tbl(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(tbl(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(tbl(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(
          sum($"rev").cast("double").as("revenue"),
          sum($"n").as("n_items"))
        .select(coalesce($"r_name", lit("*ALL*")).as("r_name"),
          coalesce($"n_name", lit("*ALL*")).as("n_name"),
          $"revenue", $"n_items")
        .orderBy($"r_name", $"n_name")
    }),

    "q26_customer_set_ops" -> ((s, dir) => {
      import s.implicits._
      // set operators: customers ordering in 1997 vs 1998
      val o = tbl(s, dir, "orders")
      val y97 = o.filter(year($"o_orderdate") === 1997).select($"o_custkey")
      val y98 = o.filter(year($"o_orderdate") === 1998).select($"o_custkey")
      y97.intersect(y98).withColumn("tag", lit("both"))
        .unionByName(y97.except(y98).withColumn("tag", lit("only97")))
        .select($"tag", $"o_custkey")
        .orderBy($"tag", $"o_custkey")
    }),

    "q29_pivot_priority" -> ((s, dir) => {
      import s.implicits._
      // pivot as conditional aggregation (engine-portable; Spark's
      // .pivot() sugar compiles to exactly this shape)
      val o = tbl(s, dir, "orders")
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      o.groupBy($"o_orderstatus")
        .agg(
          count(lit(1)).as("n_orders"),
          prios.map(p =>
            dsum(when($"o_orderpriority" === p, $"o_totalprice").otherwise(lit(0.0)), 2)
              .as("rev_" + p.charAt(0))): _*)
        .orderBy($"o_orderstatus")
    }),

    "q40_moving_avg" -> ((s, dir) => {
      import s.implicits._
      // window FRAMES (beyond row_number/lag): per-user 5-row moving
      // average + running count over event time. The frame sum routes
      // through decimal: sliding-window implementations (running
      // subtract vs segment tree) differ in double rounding between
      // engines, decimal addition does not.
      val ord = Seq($"ts_us", $"event_id")
      val w = Window.partitionBy($"user_id").orderBy(ord: _*).rowsBetween(-4, 0)
      val wc = Window.partitionBy($"user_id").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir).filter($"user_id" < 20)
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"), $"value")
        .withColumn("mov_avg",
          round(sum($"value".cast("decimal(28,6)")).over(w).cast("double") /
            count(lit(1)).over(w), 6))
        .withColumn("cum_n", count(lit(1)).over(wc))
        .select($"user_id", $"event_id", $"ts_us", $"mov_avg", $"cum_n")
        .orderBy($"user_id", $"ts_us", $"event_id")
    }),

    "q37_cube_orders" -> ((s, dir) => {
      import s.implicits._
      // full cube over (status, year): all four grouping sets in one
      // pass — Spark expands to a single Expand + one shuffle, same as
      // rollup but with the cross-marginals a reporting layer wants
      tbl(s, dir, "orders")
        .withColumn("o_year", year($"o_orderdate").cast("long"))
        .cube($"o_orderstatus", $"o_year")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice", 2).as("revenue"))
        .select(
          coalesce($"o_orderstatus", lit("*ALL*")).as("o_orderstatus"),
          coalesce($"o_year", lit(-1L)).as("o_year"),
          $"n_orders", $"revenue")
        .orderBy($"o_orderstatus", $"o_year")
    }),

    "q48_grouping_sets" -> ((s, dir) => {
      // the SQL front door: the engine's other entry point next to the
      // Column API — spark.sql over a session view, exercising GROUPING
      // SETS, the one grouping shape .rollup/.cube can't express
      // (arbitrary set lists; here the two one-dimension margins plus
      // the grand total, WITHOUT the (status, priority) cross cells a
      // cube would add). Same Expand + single shuffle physical shape as
      // rollup/cube.
      tbl(s, dir, "orders").createOrReplaceTempView("graft_q48_orders")
      s.sql("""
        SELECT coalesce(o_orderstatus, '*ALL*') AS o_orderstatus,
               coalesce(o_orderpriority, '*ALL*') AS o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
        FROM graft_q48_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority""")
    }),

    "q30_percentiles" -> ((s, dir) => {
      import s.implicits._
      // exact interpolated percentiles (Spark `percentile` == DuckDB
      // `quantile_cont`: same sorted linear interpolation in Double)
      tbl(s, dir, "customer")
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(c_acctbal, 0.5)"), 6).as("p50_acctbal"),
          round(expr("percentile(c_acctbal, 0.9)"), 6).as("p90_acctbal"))
        .orderBy($"c_mktsegment")
    }),

    "q93_unpivot_metrics" -> ((s, dir) => {
      import s.implicits._
      // unpivot/melt — the inverse of q29's pivot: the wide per-flag
      // metric row folds into (flag, metric, value) tuples, the long
      // shape feeding generic metric stores and plotting pipelines.
      // Aggregation happens BEFORE the unpivot (decimal-routed sums on
      // flag-count-sized data), so the melt is a row-local expression
      // over a tiny frame — at any corpus scale the only shuffle is
      // the q1-shaped partial agg.
      tbl(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          dsum($"l_quantity", 2).as("sum_qty"),
          dsum($"l_extendedprice", 2).as("sum_price"),
          dsum($"l_discount", 2).as("sum_disc"),
          dsum($"l_tax", 2).as("sum_tax"))
        .unpivot(Array($"l_returnflag"),
          Array($"sum_qty", $"sum_price", $"sum_disc", $"sum_tax"),
          "metric", "value")
        .orderBy($"l_returnflag", $"metric")
    }),

    // ---- vector search core (reference server.py:85-91; SURVEY §2.1 O5-O7) ----

    "q10_knn_exact" -> ((s, dir) => {
      import s.implicits._
      val eng = new SearchEngine(s)
      // session-memoized probe vector (AnnQueries.probeVec64): one
      // collect job per session, not per evaluation
      val qv = graft.queries.AnnQueries.probeVec64(s, dir, 0L, "q10_knn_exact")
      eng.corpus(dir)
        .withColumn("score", round(neo4jScore($"embedding", typedLit(qv.toSeq)), 6))
        .orderBy($"score".desc, $"doc_id".asc)
        .limit(10)
        .select($"doc_id", $"text", $"score")
    }),

    "q11_knn_multi" -> ((s, dir) => {
      import s.implicits._
      // batch KNN join: 5 query vectors broadcast against the corpus,
      // per-query top-5 via map-side partial top-k (binary-buffer
      // TypedImperativeAggregate; graft.expressions.TopKAgg). Scores
      // round to 6dp BEFORE ranking so ordering can't flip on 1-ulp
      // differences vs the oracle.
      val embs = tbl(s, dir, "embeddings").filter(hasDim($"embedding", 64))
      val queries = embs.filter($"vec_id" < 5)
      embs.crossJoin(broadcast(
          queries.select($"vec_id".as("query_id"), $"embedding".as("query_embedding"))))
        .select($"query_id", $"vec_id".as("id"),
          round(neo4jScore($"embedding", $"query_embedding"), 6).as("score"))
        .groupBy($"query_id")
        .agg(graft.expressions.TopKAggExpr.topK($"id", $"score", 5).as("hits"))
        .select($"query_id", posexplode($"hits").as(Seq("pos", "hit")))
        .select($"query_id", $"hit.id".as("doc_id"), $"hit.score".as("score"),
          ($"pos" + 1).cast("long").as("rank"))
        .orderBy($"query_id", $"rank")
    }),

    "q12_label_stats" -> ((s, dir) => {
      import s.implicits._
      // dim guard (SURVEY §2.1 O3) + array math + grouped stats
      tbl(s, dir, "embeddings")
        .filter(hasDim($"embedding", 64))
        .groupBy($"label".cast("long").as("label"))
        .agg(
          count(lit(1)).as("n"),
          sum(size($"embedding")).cast("long").as("total_dims"),
          sum(squaredNorm($"embedding").cast("decimal(28,9)")).cast("double").as("sum_sq_norm"))
        .orderBy($"label")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    relationalOracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.DedupQueries.oracleSql ++
      graft.queries.AnnQueries.oracleSql ++
      graft.queries.StreamingQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.ExtraQueries.oracleSql ++
      graft.queries.KeywordQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.CurationQueries.oracleSql

  private def relationalOracleSql: Map[String, String] = Map(

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,10))) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q3_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q4_latest_order_per_customer" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin,

    "q5_filtered_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |  AND l_discount >= 0.05 AND l_quantity < 24""".stripMargin,

    "q6_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q7_mktsegment_stats" ->
      """SELECT c_mktsegment,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_acctbal,
        |  MIN(c_acctbal) AS min_acctbal,
        |  MAX(c_acctbal) AS max_acctbal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q8_events_json" ->
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q9_hourly_events" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q25_rollup_revenue" ->
      """SELECT coalesce(r_name, '*ALL*') AS r_name, coalesce(n_name, '*ALL*') AS n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY 1, 2""".stripMargin,

    "q26_customer_set_ops" ->
      """SELECT 'both' AS tag, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
        |UNION ALL
        |SELECT 'only97' AS tag, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
        |ORDER BY tag, o_custkey""".stripMargin,

    "q29_pivot_priority" -> {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val cols = prios.map(p =>
        s"CAST(SUM(CAST(CASE WHEN o_orderpriority = '$p' THEN o_totalprice ELSE 0.0 END AS DECIMAL(28,2))) AS DOUBLE) AS rev_${p.charAt(0)}")
        .mkString(",\n  ")
      s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
         |  $cols
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },

    "q40_moving_avg" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  round(CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
        |    / (COUNT(*) OVER w), 6) AS mov_avg,
        |  COUNT(*) OVER wc AS cum_n
        |FROM events WHERE user_id < 20
        |WINDOW
        |  w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
        |  wc AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |         ROWS UNBOUNDED PRECEDING)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q37_cube_orders" ->
      """WITH o AS (SELECT o_orderstatus, year(o_orderdate)::BIGINT AS o_year, o_totalprice
        |  FROM orders)
        |SELECT coalesce(o_orderstatus, '*ALL*') AS o_orderstatus,
        |  coalesce(o_year, -1) AS o_year,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
        |FROM o GROUP BY CUBE (o_orderstatus, o_year)
        |ORDER BY 1, 2""".stripMargin,

    "q48_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '*ALL*') AS o_orderstatus,
        |  coalesce(o_orderpriority, '*ALL*') AS o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q30_percentiles" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  round(quantile_cont(c_acctbal, 0.5), 6) AS p50_acctbal,
        |  round(quantile_cont(c_acctbal, 0.9), 6) AS p90_acctbal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q93_unpivot_metrics" ->
      """WITH a AS (SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(28,2))) AS DOUBLE) AS sum_disc,
        |    CAST(SUM(CAST(l_tax AS DECIMAL(28,2))) AS DOUBLE) AS sum_tax
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
        |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
        |  UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a
        |  UNION ALL SELECT l_returnflag, 'sum_tax', sum_tax FROM a)
        |ORDER BY l_returnflag, metric""".stripMargin,

    "q10_knn_exact" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT e.vec_id AS doc_id, d.text,
        |    round((1.0 +
        |      list_sum(list_transform(list_zip(e.embedding, q.qe),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
        |      / 2.0, 6) AS score
        |  FROM embeddings e CROSS JOIN q
        |  JOIN documents d ON e.vec_id = d.doc_id
        |  WHERE len(e.embedding) = 64)
        |SELECT doc_id, text, score FROM scored
        |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,

    "q11_knn_multi" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 5 AND len(embedding) = 64),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS doc_id,
        |    round((1.0 +
        |      list_sum(list_transform(list_zip(e.embedding, q.qe),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
        |      / 2.0, 6) AS score
        |  FROM embeddings e CROSS JOIN q
        |  WHERE len(e.embedding) = 64),
        |ranked AS (
        |  SELECT query_id, doc_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT query_id, doc_id, score, rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q12_label_stats" ->
      """SELECT CAST(label AS BIGINT) AS label,
        |  COUNT(*) AS n,
        |  CAST(SUM(len(embedding)) AS BIGINT) AS total_dims,
        |  CAST(SUM(CAST(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DECIMAL(28,9))) AS DOUBLE) AS sum_sq_norm
        |FROM embeddings
        |WHERE len(embedding) = 64
        |GROUP BY label ORDER BY label""".stripMargin,
  )
}
