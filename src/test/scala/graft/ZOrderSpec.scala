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

  /** Driver-side Hilbert reference: the classic xy2d loop. */
  private def xy2d(n: Long, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbertAddress matches the driver xy2d loop on the full 8-bit plane, bijectively") {
    val n = 256L
    val pts = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    val got = ExtraQueries.hilbertAddress(pts.toDF("xb", "yb"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(got.length === (n * n).toInt)
    got.foreach { case ((x, y), h) =>
      assert(h === xy2d(n, x, y), s"($x, $y)")
    }
    // bijection onto [0, n^2)
    val hs = got.map(_._2)
    assert(hs.distinct.length === hs.length)
    assert(hs.min === 0L && hs.max === n * n - 1)
  }

  test("hilbert unit-step law: consecutive addresses are adjacent cells; morton is not") {
    // the property that makes an equal-row carve along the curve
    // spatially compact: |cell(d+1) - cell(d)| is ONE king-move-free
    // Manhattan step, everywhere. Morton violates it at every quadrant
    // boundary — measured here so the q125 comparison isn't folklore.
    val n = 64L
    val pts = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    val inv = pts.map { case (x, y) =>
      // 6-bit xy2d via the same reference loop, grid n=64
      xy2d(n, x, y) -> ((x, y))
    }.toMap
    val steps = (0L until n * n - 1).map { d =>
      val (x1, y1) = inv(d); val (x2, y2) = inv(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }
    assert(steps.forall(_ == 1L), "hilbert must move one cell per step")
    // morton: count jumps > 1 — strictly positive (quadrant seams)
    val minv = pts.map { case (x, y) => morton(x, y, 6) -> ((x, y)) }.toMap
    val mjumps = (0L until n * n - 1).count { d =>
      val (x1, y1) = minv(d); val (x2, y2) = minv(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(mjumps > 0, "morton has quadrant-boundary jumps")
  }

  test("q125 three-way audit: row conservation per layout, scan flags honest") {
    val rows = ExtraQueries.queries("q125_hilbert_layout")(spark, sf0001)
      .collect()
    val layouts = rows.map(_.getString(0)).distinct.sorted
    assert(layouts === Array("hilbert", "linear", "zorder"))
    val total = rows.filter(_.getString(0) == "hilbert").map(_.getLong(2)).sum
    layouts.foreach { l =>
      assert(rows.filter(_.getString(0) == l).map(_.getLong(2)).sum === total,
        s"$l row conservation")
    }
    // every file's extent box must contain >= 1 row and the scan flag
    // must equal the box-overlap test
    rows.foreach { r =>
      assert(r.getLong(2) > 0)
      val hit = !(r.getLong(4) < ExtraQueries.ZQueryLo ||
        r.getLong(3) > ExtraQueries.ZQueryHi ||
        r.getLong(6) < ExtraQueries.ZQueryLo ||
        r.getLong(5) > ExtraQueries.ZQueryHi)
      assert(r.getInt(7) === (if (hit) 1 else 0))
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
