package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder
import graft.queries.ExtraQueries

class ZOrderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Driver-side Morton reference: interleave bit i of x to 2i, of y
    * to 2i+1. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zSql matches a driver-side bit interleave on the full 6-bit plane") {
    val bits = 6
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = pts.toDF("xb", "yb")
      .withColumn("z", expr(ZOrder.zSql("xb", "yb", bits, "div")))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === morton(x, y, bits), s"($x, $y)")
    }
  }

  test("the interleave is a bijection: z decodes back to (xb, yb)") {
    val bits = 8
    val pts = Seq.tabulate(500)(i => (i * 37L % 256L, i * 91L % 256L))
    val zs = pts.toDF("xb", "yb")
      .withColumn("z", expr(ZOrder.zSql("xb", "yb", bits, "div")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    zs.foreach { case (x, y, z) =>
      val xd = (0 until bits).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val yd = (0 until bits).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert((xd, yd) === ((x, y)), s"z=$z")
    }
  }

  test("q111 layout audit: equal-row files, boxes in range, z-order skips at least as well") {
    val df = ExtraQueries.queries("q111_zorder_layout")(spark, sf0001)
    val rows = df.collect()
    assert(rows.length === 2 * ExtraQueries.ZFiles)
    val total = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    Seq("zorder", "linear").foreach { layout =>
      val fs = rows.filter(_.getString(0) == layout)
      assert(fs.length === ExtraQueries.ZFiles, layout)
      assert(fs.map(_.getLong(2)).sum === total, s"$layout row conservation")
      // equal-row carve: file sizes differ by at most 1
      val sizes = fs.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$layout sizes")
      fs.foreach { r =>
        assert(r.getLong(3) >= 0 && r.getLong(4) < ExtraQueries.ZBuckets)
        assert(r.getLong(5) >= 0 && r.getLong(6) < ExtraQueries.ZBuckets)
        assert(r.getLong(3) <= r.getLong(4) && r.getLong(5) <= r.getLong(6))
      }
    }
    val scans = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getInt(7)).sum).toMap
    assert(scans("zorder") > 0, "the probe rectangle must hit some file")
    assert(scans("zorder") <= scans("linear"),
      s"z-order must prune at least as hard: $scans")
  }
}
