package graft.operators

/** Z-order (Morton) interleaving for multi-dimensional data layout —
  * the clustering step behind min/max file skipping on two correlated
  * query dimensions (the public OPTIMIZE ZORDER operation of Delta
  * Lake / Iceberg rewrite strategies, after Morton 1966).
  *
  * The reference has no layout machinery at all (its storage is a
  * Neo4j node store behind one vector index — reference server.py:87);
  * this is pure north-star extension surface: at 100 TB the dominant
  * cost of every selective query is the files it can SKIP, and
  * skipping on two dimensions at once needs a space-filling curve —
  * sorting on (x, y) lexicographically gives perfect x-pruning and
  * zero y-pruning.
  *
  * Everything here is pure integer modular arithmetic over
  * pre-bucketed dimension values, emitted as ONE SQL string shared by
  * the Spark plan (`expr`) and the DuckDB oracle (the PortableHash
  * anti-drift rule): bit `i` of `x` is `(x div 2^i) % 2`, shifted to
  * even z positions, `y` to odd ones. No engine bit intrinsics, so the
  * two engines cannot disagree.
  *
  * Scale shape: the z-value is row-local (codegen'd arithmetic); the
  * layout assignment is a range partition over z — exactly what
  * `repartitionByRange(z)` + per-task file writes do on a cluster, and
  * what [[RankedCumsum.scoreRank]]'s two-pass rank makes exact and
  * auditable here. Nothing about the curve itself ever shuffles.
  */
object ZOrder {

  /** SQL computing the Morton interleave of two `bits`-bit non-negative
    * integer expressions; `idiv` is the engine's integer-division
    * operator (Spark `div`, DuckDB `//`). Result < 2^(2*bits). */
  def zSql(x: String, y: String, bits: Int, idiv: String): String =
    (0 until bits).map { i =>
      s"(($x $idiv ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"(($y $idiv ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** One iteration of the classic xy2d Hilbert-curve conversion loop
    * (Hilbert 1891; the quadrant-digit-plus-rotation formulation of
    * the widely published xy2d/d2xy code), as three portable SQL
    * expressions over the PREVIOUS step's (x, y, d) column names —
    * both engines materialize one column set per step (8 steps at
    * 8 bits), so the expression never grows combinatorially.
    *
    * At scale s = 2^i (descending from n/2): the bit tests
    * rx = (x div s) % 2, ry = (y div s) % 2 pick the quadrant, the
    * digit (3·rx XOR ry) is enumerated as a CASE over the four
    * (rx, ry) combinations — no engine-specific XOR operator — and
    * the ry = 0 rotation (flip by n−1 when rx = 1, then swap x/y)
    * becomes two CASEs. Returns (d, x, y) expression strings.
    *
    * Why Hilbert next to Morton: consecutive Hilbert addresses are
    * always ADJACENT cells (unit Manhattan step — spec-proven), so an
    * equal-row file carve along d yields spatially compact files with
    * no quadrant-boundary jumps; Morton's diagonal discontinuities
    * are exactly what its skipping audit pays for. */
  def hilbertStepSql(x: String, y: String, d: String, s: Long, n: Long,
                     idiv: String): (String, String, String) = {
    val rx = s"(($x $idiv $s) % 2)"
    val ry = s"(($y $idiv $s) % 2)"
    val digit = s"(CASE WHEN $rx = 0 AND $ry = 0 THEN 0 " +
      s"WHEN $rx = 0 THEN 1 WHEN $ry = 0 THEN 3 ELSE 2 END)"
    val dNext = s"($d + ${s * s} * $digit)"
    val xNext = s"(CASE WHEN $ry = 1 THEN $x " +
      s"WHEN $rx = 1 THEN ${n - 1} - $y ELSE $y END)"
    val yNext = s"(CASE WHEN $ry = 1 THEN $y " +
      s"WHEN $rx = 1 THEN ${n - 1} - $x ELSE $x END)"
    (dNext, xNext, yNext)
  }

  /** The descending scales of the `bits`-bit Hilbert loop. */
  def hilbertScales(bits: Int): Seq[Long] =
    (bits - 1 to 0 by -1).map(i => 1L << i)
}
