package graft.index

import graft.geom.AABB

/** Hand-rolled hierarchical lat/lon (or any planar) grid — the distributed
  * top level of the two-level index (SURVEY.md §4: no H3/S2 jars offline, so
  * the cell index is pure Scala). Plays the role of the reference R-tree's
  * upper levels: the driver broadcasts per-cell statistics and prunes whole
  * partitions the way rstar prunes subtrees by envelope
  * (rstar/src/algorithm/selection_functions.rs:27-31).
  *
  * Cell ids are row-major `ix * cellsPerAxis + iy` over a fixed domain so the
  * id is expressible in ANSI SQL (`FLOOR((x-minX)/w*n)*n + FLOOR(...)`) for
  * the DuckDB oracle; Spark hash-partitions by id, so Z-order locality would
  * buy nothing at the shuffle.
  *
  * Coordinates outside the domain clamp to the border cells, so every point
  * gets a cell (web-extracted coordinates can be garbage; they must not be
  * dropped silently).
  */
final case class CellGrid(
    minX: Double, minY: Double, maxX: Double, maxY: Double, res: Int)
    extends Serializable {
  require(res >= 0 && res <= 15, "res in [0, 15]")

  val cellsPerAxis: Int = 1 << res
  private val width = maxX - minX
  private val height = maxY - minY

  def ix(x: Double): Int =
    math.min(cellsPerAxis - 1,
      math.max(0, math.floor((x - minX) / width * cellsPerAxis).toInt))
  def iy(y: Double): Int =
    math.min(cellsPerAxis - 1,
      math.max(0, math.floor((y - minY) / height * cellsPerAxis).toInt))

  def cellId(x: Double, y: Double): Long =
    ix(x).toLong * cellsPerAxis + iy(y)

  def cellOf(ixv: Int, iyv: Int): Long = ixv.toLong * cellsPerAxis + iyv

  def cellBox(id: Long): AABB = {
    val cx = (id / cellsPerAxis).toInt
    val cy = (id % cellsPerAxis).toInt
    AABB.of2d(
      minX + cx * width / cellsPerAxis,
      minY + cy * height / cellsPerAxis,
      minX + (cx + 1) * width / cellsPerAxis,
      minY + (cy + 1) * height / cellsPerAxis)
  }

  /** Ids of all cells intersecting `box` — the partition-pruning analog of
    * envelope-based subtree pruning. Geometries spanning several cells are
    * exploded to each (deduped later by the reference-point rule, SURVEY §7.4).
    */
  def cover(box: AABB): Seq[Long] = {
    val x0 = ix(box.lower(0)); val x1 = ix(box.upper(0))
    val y0 = iy(box.lower(1)); val y1 = iy(box.upper(1))
    val out = new scala.collection.mutable.ArrayBuffer[Long](
      (x1 - x0 + 1) * (y1 - y0 + 1))
    var cx = x0
    while (cx <= x1) {
      var cy = y0
      while (cy <= y1) { out += cellOf(cx, cy); cy += 1 }
      cx += 1
    }
    out.toSeq
  }

  /** Cells exactly `ring` steps (Chebyshev distance) from cell (cx, cy) —
    * the expanding-ring candidate search for distributed kNN (SURVEY §2.4 J2).
    * Ring 0 is the cell itself.
    */
  def ring(cx: Int, cy: Int, r: Int): Seq[Long] = {
    if (r == 0) return Seq(cellOf(cx, cy))
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var dx = -r
    while (dx <= r) {
      var dy = -r
      while (dy <= r) {
        if (math.max(math.abs(dx), math.abs(dy)) == r) {
          val nx = cx + dx; val ny = cy + dy
          if (nx >= 0 && nx < cellsPerAxis && ny >= 0 && ny < cellsPerAxis)
            out += cellOf(nx, ny)
        }
        dy += 1
      }
      dx += 1
    }
    out.toSeq
  }
}

object CellGrid {
  /** Whole-earth lon/lat grid at the given resolution; res 9 over 360°
    * gives ~0.7° cells (~78 km at the equator) — the partition-pruning
    * granularity, not the precision of any result.
    */
  def lonLat(res: Int): CellGrid = CellGrid(-180.0, -90.0, 180.0, 90.0, res)

  /** Unit-square grid for reference-shaped fixtures ([0,1)² points,
    * rstar/src/test_utilities.rs:23-30).
    */
  def unit(res: Int): CellGrid = CellGrid(0.0, 0.0, 1.0, 1.0, res)
}
