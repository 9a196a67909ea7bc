package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.index.CellGrid

/** Spatial scalar functions as composed `Column` arithmetic — no UDFs, so
  * everything stays inside whole-stage codegen and Parquet pushdown
  * (SURVEY.md §4 item 2: composed columns first; a custom Catalyst
  * `Expression` only if profiling demands).
  *
  * Semantics match graft.geom.AABB exactly (closed intervals, IEEE double
  * ops in fixed order), so the DataFrame tier and the per-partition trees
  * agree bit-for-bit. Reference math: rstar/src/aabb.rs:104-223.
  */
object SpatialFunctions {

  /** Squared euclidean distance. Plain multiply/add (IEEE-exact, identical
    * in any ANSI SQL engine) — never `pow`, whose libm rounding can differ
    * across engines.
    */
  def stDistanceSq(x: Column, y: Column, px: Column, py: Column): Column =
    (x - px) * (x - px) + (y - py) * (y - py)

  /** Closed-interval point-in-box (rstar/src/aabb.rs:140-143). */
  def stContainsPoint(
      minX: Column, minY: Column, maxX: Column, maxY: Column,
      px: Column, py: Column): Column =
    minX <= px && px <= maxX && minY <= py && py <= maxY

  /** Box contains box (rstar/src/aabb.rs:145-148). */
  def stContainsBox(
      aMinX: Column, aMinY: Column, aMaxX: Column, aMaxY: Column,
      bMinX: Column, bMinY: Column, bMaxX: Column, bMaxY: Column): Column =
    aMinX <= bMinX && aMinY <= bMinY && aMaxX >= bMaxX && aMaxY >= bMaxY

  /** Box intersects box; touching counts (rstar/src/aabb.rs:162-165). */
  def stIntersectsBox(
      aMinX: Column, aMinY: Column, aMaxX: Column, aMaxY: Column,
      bMinX: Column, bMinY: Column, bMaxX: Column, bMaxY: Column): Column =
    aMinX <= bMaxX && aMaxX >= bMinX && aMinY <= bMaxY && aMaxY >= bMinY

  /** Squared distance from a point to a box: clamp then distance
    * (rstar/src/aabb.rs:104-118).
    */
  def stBoxDistanceSq(
      minX: Column, minY: Column, maxX: Column, maxY: Column,
      px: Column, py: Column): Column = {
    val cx = least(maxX, greatest(minX, px))
    val cy = least(maxY, greatest(minY, py))
    stDistanceSq(cx, cy, px, py)
  }

  /** Squared distance from point (px,py) to segment (x1,y1)-(x2,y2): the
    * segment-clamped projection (reference `Line::distance_2`,
    * rstar/src/primitives/line.rs:71-113). Callers guarantee a
    * non-degenerate segment (len² > 0); operand order is fixed so the SQL
    * twin is bit-identical.
    */
  def stLineDistanceSq(
      x1: Column, y1: Column, x2: Column, y2: Column,
      px: Column, py: Column): Column = {
    val dx = x2 - x1
    val dy = y2 - y1
    val len2 = dx * dx + dy * dy
    val t = ((px - x1) * dx + (py - y1) * dy) / len2
    val tc = least(lit(1.0), greatest(lit(0.0), t))
    val nx = x1 + tc * dx
    val ny = y1 + tc * dy
    (px - nx) * (px - nx) + (py - ny) * (py - ny)
  }

  /** Grid axis index for one coordinate — MUST mirror CellGrid.ix/iy
    * bit-for-bit: floor((v - min) / extent * n), clamped to [0, n-1].
    */
  private def axisIdx(v: Column, mn: Double, extent: Double, n: Int): Column =
    least(lit(n - 1L),
      greatest(lit(0L),
        floor((v - lit(mn)) / lit(extent) * lit(n)).cast("long")))

  /** Row-major cell id at the grid's resolution — the Column twin of
    * CellGrid.cellId, expressible in ANSI SQL for the oracle.
    */
  def stCell(grid: CellGrid)(x: Column, y: Column): Column = {
    val n = grid.cellsPerAxis
    axisIdx(x, grid.minX, grid.maxX - grid.minX, n) * lit(n.toLong) +
      axisIdx(y, grid.minY, grid.maxY - grid.minY, n)
  }

  /** All cells covered by a box, as an array column to `explode` — the
    * distributed analog of exploding a multi-cell geometry to each
    * overlapping partition (SURVEY.md §2.4 J1). Built from two `sequence`
    * ranges (ix0..ix1 × iy0..iy1), kept as built-ins for codegen.
    */
  def stCoverCells(grid: CellGrid)(
      minX: Column, minY: Column, maxX: Column, maxY: Column): Column = {
    val n = grid.cellsPerAxis
    val x0 = axisIdx(minX, grid.minX, grid.maxX - grid.minX, n)
    val x1 = axisIdx(maxX, grid.minX, grid.maxX - grid.minX, n)
    val y0 = axisIdx(minY, grid.minY, grid.maxY - grid.minY, n)
    val y1 = axisIdx(maxY, grid.minY, grid.maxY - grid.minY, n)
    flatten(
      transform(sequence(x0, x1), ix =>
        transform(sequence(y0, y1), iy => ix * lit(n.toLong) + iy)))
  }

  /** Point-in-polygon by ray casting, UNROLLED over the fixed 8-vertex
    * polygon columns (px1..px8 / py1..py8) — pure comparisons, multiplies
    * and one correctly-rounded division per edge, in a fixed textual order,
    * so the predicate evaluates bit-identically in ANSI SQL and both
    * engines agree even for points within ulps of an edge (consistently,
    * if arbitrarily, classified). Scalar columns rather than vertex arrays
    * keep the whole test inside whole-stage codegen. Callers guarantee
    * nonzero y-span per edge (TpchGeo octagons: consecutive uy always
    * differ and radii are padded), so the division never hits zero under
    * ANSI. Classic crossing-number algorithm (Franklin's PNPOLY form).
    */
  def stPointInPolygon8(
      pxs: Seq[Column], pys: Seq[Column], qx: Column, qy: Column): Column = {
    require(pxs.length == 8 && pys.length == 8)
    val crossings = (0 until 8).map { i =>
      val j = (i + 7) % 8
      val cond = (pys(i) > qy) =!= (pys(j) > qy)
      val xCross = (pxs(j) - pxs(i)) * (qy - pys(i)) /
        (pys(j) - pys(i)) + pxs(i)
      when(cond && qx < xCross, 1).otherwise(0)
    }
    crossings.reduce(_ + _) % 2 === 1
  }

  /** General n-vertex ray-cast point-in-polygon over vertex ARRAY columns
    * (the [[stPointInPolygon8]] predicate without the fixed-arity
    * unrolling): crossings = integer fold over the 1-based vertex index
    * sequence, predecessor of vertex 1 wrapping to n. The crossing sum is
    * an integer, so the fold order is parity-irrelevant and the DuckDB
    * twin may use any list sum. Layers must have no horizontal edges
    * (TpchGeo.polyNUnit guarantees it by construction) so the division
    * never sees a zero denominator under either engine's conjunct
    * evaluation. HOF lambdas are CodegenFallback — the predicate runs
    * only on cell-cohabiting pairs, where generality is worth the
    * interpreted eval (the octagon fast path stays fully unrolled).
    */
  def stPointInPolygonN(pxs: Column, pys: Column, qx: Column, qy: Column,
      maxVerts: Int = 10): Column = {
    val n = size(pxs)
    // unrolled to maxVerts with lazy i<=n guards instead of a HOF fold:
    // aggregate()/transform() lambdas are CodegenFallback, which dropped
    // the whole candidate-pair Project out of whole-stage codegen (8.3 s
    // -> 1.3 s at sf0.1 for q_pip_poly). CaseWhen branches are lazy in
    // codegen, so out-of-range element_at is never evaluated (ANSI-safe);
    // the crossing sum is an integer, so the term order is
    // parity-irrelevant and the SQL twin may keep its list fold.
    val terms = (1 to maxVerts).map { i =>
      val iC = lit(i)
      val j: Column = if (i == 1) n else lit(i - 1)
      val xi = element_at(pxs, iC); val yi = element_at(pys, iC)
      val xj = element_at(pxs, j); val yj = element_at(pys, j)
      val cond = (yi > qy) =!= (yj > qy)
      val xCross = (xj - xi) * (qy - yi) / (yj - yi) + xi
      when(iC <= n, when(cond && qx < xCross, 1).otherwise(0)).otherwise(0)
    }
    // layers beyond the unroll bound would silently undercount, and a
    // degenerate < 3-gon has even crossing parity everywhere (every row
    // silently filtered) — refuse both loudly
    when(n > maxVerts || n < 3,
      raise_error(concat(
        lit(s"stPointInPolygonN: vertex count outside [3, $maxVerts]: "),
        n.cast("string"))).cast("boolean"))
      .otherwise(terms.reduce(_ + _) % 2 === 1)
  }

  /** [[stPointInPolygonN]] over FLATTENED vertex columns (vx1..vxM /
    * vy1..vyM, null-padded past k) — the hot-join form: the array is
    * unpacked ONCE on the (small) polygon side, so the per-candidate-pair
    * work is flat double reads exactly like the unrolled octagon
    * predicate, not M ANSI array accesses per pair (23× on q_pip_poly).
    * Edges are (i, i-1) for i = 2..k plus the closing edge (1, k); the
    * k-th vertex is selected by a tiny CASE over the legal k range.
    */
  def stPointInPolygonFlat(k: Column, vxs: Seq[Column], vys: Seq[Column],
      qx: Column, qy: Column): Column = {
    val m = vxs.length
    def crossing(xi: Column, yi: Column, xj: Column, yj: Column): Column = {
      val cond = (yi > qy) =!= (yj > qy)
      val xCross = (xj - xi) * (qy - yi) / (yj - yi) + xi
      when(cond && qx < xCross, 1).otherwise(0)
    }
    def lastOf(vs: Seq[Column]): Column =
      (4 to m).foldLeft(when(k === 3, vs(2))) { (acc, kk) =>
        acc.when(k === kk, vs(kk - 1))
      }
    val closing = crossing(vxs.head, vys.head, lastOf(vxs), lastOf(vys))
    val rest = (2 to m).map { i =>
      when(lit(i) <= k,
        crossing(vxs(i - 1), vys(i - 1), vxs(i - 2), vys(i - 2)))
        .otherwise(0)
    }
    // same refusal as stPointInPolygonN for over-bound layers — and k < 3
    // fails just as loudly: a degenerate "polygon" makes lastOf's when-
    // chain yield NULL, which would propagate NULL through the predicate
    // and silently DROP the row instead of erroring
    when(k > m || k < 3,
      raise_error(concat(
        lit(s"stPointInPolygonFlat: vertex count outside [3, $m]: "),
        k.cast("string"))).cast("boolean"))
      .otherwise((closing +: rest).reduce(_ + _) % 2 === 1)
  }

  /** Reference-point de-duplication predicate for exploded spatial joins:
    * a pair is emitted only in the cell containing the lower corner of the
    * intersection box (SURVEY.md §7.4), so multi-cell overlaps appear
    * exactly once — matching the reference join's exact pair set
    * (rstar/src/algorithm/intersection_iterator.rs:112-134).
    */
  def stRefPointDedup(grid: CellGrid)(
      cell: Column,
      aMinX: Column, aMinY: Column, bMinX: Column, bMinY: Column): Column =
    cell === stCell(grid)(greatest(aMinX, bMinX), greatest(aMinY, bMinY))
}
