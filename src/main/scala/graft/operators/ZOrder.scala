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
}
