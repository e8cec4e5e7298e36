package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: each left row picks the latest right row with
  * `rightTime <= leftTime` within the same key (the time-series /
  * point-in-time join Spark has no native operator for; extension
  * surface — the reference joins nothing, SURVEY.md §2.2 joins row).
  *
  * Implementation is the classic *union + last-non-null window*: tag
  * both inputs, union them, and run `last(payload, ignoreNulls)` over
  * `(key ORDER BY time, side, id)` with side ordering right-before-left
  * so a right row at exactly t matches left rows at t (<= semantics)
  * and `id` makes ties total.
  *
  * Scale shape: ONE shuffle of |L|+|R| rows on the key (same cost as
  * any keyed join), a per-partition sort, zero per-row search — versus
  * the naive per-left-row subquery which is O(|L|·|R|). At 100 TB with
  * a time-bucketed layout the window becomes a merge of pre-sorted
  * runs; semantics unchanged.
  */
object AsofJoin {

  /** @param payloadCols right-side columns carried to matched left rows
    *                    (null when no right row precedes the left row).
    * @return left rows (original columns) + payloadCols. */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: Column, rightTime: Column,
           leftId: String, rightId: String,
           payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // a payload name shadowing a left column would be silently nulled
    // by the shaping below (wrong data, not an error) — reject up front
    val clash = payloadCols.filter(leftCols.contains)
    require(clash.isEmpty,
      s"payloadCols ${clash.mkString(", ")} already exist on the left side; " +
        "alias the right-side payload columns before the as-of join")
    val missing = payloadCols.filterNot(right.columns.contains)
    require(missing.isEmpty,
      s"payloadCols ${missing.mkString(", ")} not found on the right side")
    val lTagged = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(1))
      .withColumn("__id", col(leftId))
    val lShaped = payloadCols.foldLeft(lTagged) { (df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val rTagged = right
      .withColumn("__key", col(rightKey))
      .withColumn("__t", rightTime)
      .withColumn("__side", lit(0))
      .withColumn("__id", col(rightId))
    val rShaped = leftCols.foldLeft(rTagged) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = (leftCols ++ payloadCols ++ Seq("__key", "__t", "__side", "__id")).distinct
    val unioned = lShaped.select(cols.map(col): _*)
      .unionByName(rShaped.select(cols.map(col): _*))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    matched.filter(col("__side") === 1)
      .select((leftCols ++ payloadCols).map(col): _*)
  }
}
