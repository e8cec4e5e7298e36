package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join: each point row matches
  * every interval row of the same key with `start <= t < end`.
  * Extension surface — the reference joins nothing (server.py:85-91);
  * this is the temporal-validity join a training-data pipeline needs
  * to attach "what was active at event time" context.
  *
  * Spark has no native range-join operator, and a plain `a.join(b,
  * keyEq && rangePred)` leaves the range predicate as a post-join
  * filter over every same-key pair — quadratic in per-key cardinality.
  * The scale shape here is *bucketing*: quantize time into fixed-width
  * buckets, explode each interval to the buckets it overlaps, and
  * equi-join on (key, bucket) before applying the exact range
  * predicate. Each point joins exactly one bucket; an interval of
  * width W explodes to ceil(W/bucketWidth)+1 buckets — bounded,
  * chosen by the caller to match the interval distribution. The join
  * is then an ordinary shuffled (or broadcast) hash join on a compound
  * key: no per-key quadratic blowup, partition-count independent.
  */
object RangeJoin {

  /** @param points    left side; must share no column names with `intervals`.
    * @param pKey      point join key column (on `points`).
    * @param pTime     point time (LONG, e.g. epoch micros).
    * @param intervals right side.
    * @param iKey      interval join key column (on `intervals`).
    * @param iStart    interval start (LONG, inclusive).
    * @param iEnd      interval end (LONG, exclusive; rows with
    *                  `end <= start` match nothing).
    * @param bucketWidth time-bucket width in the same units; pick it
    *                  near the typical interval width so explosion
    *                  factor stays ~2.
    * @return matched pairs: all point columns + all interval columns. */
  def pointInInterval(points: DataFrame, pKey: Column, pTime: Column,
                      intervals: DataFrame, iKey: Column, iStart: Column, iEnd: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty,
      s"points and intervals share column names ${clash.mkString(", ")}; alias before joining")
    // integer `div`, not `/`: Column./ promotes to Double, and epoch
    // micros sit near Double's 2^53 exact range — a quotient landing on
    // an integer boundary ± 1 ulp would put point and interval in
    // different buckets. `div` truncates; it is monotonic, so the
    // point's bucket always lies within the interval's bucket span.
    val p = points
      .withColumn("__pk", pKey)
      .withColumn("__pt", pTime.cast("long"))
      .withColumn("__bucket", expr(s"__pt div $bucketWidth"))
    val i = intervals
      .withColumn("__ik", iKey)
      .withColumn("__is", iStart.cast("long"))
      .withColumn("__ie", iEnd.cast("long"))
      .filter(col("__ie") > col("__is"))
      // an interval [s, e) overlaps buckets trunc(s/w) .. trunc((e-1)/w)
      .withColumn("__bucket",
        explode(sequence(expr(s"__is div $bucketWidth"), expr(s"(__ie - 1) div $bucketWidth"))))
    p.join(i,
        p("__bucket") === i("__bucket") && col("__pk") === col("__ik") &&
          col("__is") <= col("__pt") && col("__pt") < col("__ie"))
      .select((points.columns ++ intervals.columns).map(col).toIndexedSeq: _*)
  }
}
