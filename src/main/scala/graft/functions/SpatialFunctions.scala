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
