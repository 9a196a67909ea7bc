package graft.index

import graft.geom.AABB

/** n-dimensional generalization of [[CellGrid]] — the distributed top level
  * for d-dim point spaces (the reference tree is n-dimensional,
  * rstar/src/point.rs:158-179; the 2-D `CellGrid` stays the web-geo fast
  * path, this covers the embedding-space / 3-D use cases). Row-major cell
  * ids over `res` bits per axis, so d·res must fit a Long (d=3, res≤15 ✓);
  * out-of-domain coordinates clamp to border cells, as in 2-D.
  */
final case class CellGridN(
    mins: Array[Double], maxs: Array[Double], res: Int)
    extends Serializable {
  val dims: Int = mins.length
  require(maxs.length == dims, "mins/maxs dim mismatch")
  // res <= 30 guards the Int shift below (1 << 31 is negative, and Scala
  // shifts mod 32 would silently alias larger res); dims*res <= 62 guards
  // the packed Long id
  require(res >= 0 && res <= 30 && dims * res <= 62,
    s"id overflow: $dims dims x $res bits")

  val cellsPerAxis: Int = 1 << res

  def idx(axis: Int, v: Double): Int = {
    val ext = maxs(axis) - mins(axis)
    math.min(cellsPerAxis - 1,
      math.max(0, math.floor((v - mins(axis)) / ext * cellsPerAxis).toInt))
  }

  def cellId(p: Array[Double]): Long = {
    var id = 0L
    var d = 0
    while (d < dims) { id = (id << res) | idx(d, p(d)).toLong; d += 1 }
    id
  }

  def cellOf(ix: Array[Int]): Long = {
    var id = 0L
    var d = 0
    while (d < dims) { id = (id << res) | ix(d).toLong; d += 1 }
    id
  }

  def axisOf(id: Long, axis: Int): Int =
    ((id >> ((dims - 1 - axis) * res)) & (cellsPerAxis - 1)).toInt

  def cellBox(id: Long): AABB = {
    val lo = new Array[Double](dims)
    val hi = new Array[Double](dims)
    var d = 0
    while (d < dims) {
      val i = axisOf(id, d)
      val w = (maxs(d) - mins(d)) / cellsPerAxis
      lo(d) = mins(d) + i * w
      hi(d) = mins(d) + (i + 1) * w
      d += 1
    }
    AABB.fromBounds(lo, hi)
  }

  /** All cells intersecting `box` (d-dim hyper-rectangle cover). */
  def cover(box: AABB): Seq[Long] = {
    val lo = Array.tabulate(dims)(d => idx(d, box.lower(d)))
    val hi = Array.tabulate(dims)(d => idx(d, box.upper(d)))
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cur = lo.clone()
    var done = false
    while (!done) {
      out += cellOf(cur)
      // odometer increment
      var d = dims - 1
      var carry = true
      while (carry && d >= 0) {
        cur(d) += 1
        if (cur(d) > hi(d)) { cur(d) = lo(d); d -= 1 }
        else carry = false
      }
      if (carry) done = true
    }
    out.toSeq
  }

  /** Cells at Chebyshev distance exactly `r` from center indices `c` —
    * the d-dim expanding-shell candidate search (ring 0 = the cell).
    */
  def ring(c: Array[Int], r: Int): Seq[Long] = {
    if (r == 0) return Seq(cellOf(c))
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cur = new Array[Int](dims)
    def rec(d: Int, onShell: Boolean): Unit =
      if (d == dims) { if (onShell) out += cellOf(cur) }
      else {
        var off = -r
        while (off <= r) {
          val v = c(d) + off
          if (v >= 0 && v < cellsPerAxis) {
            cur(d) = v
            rec(d + 1, onShell || math.abs(off) == r)
          }
          off += 1
        }
      }
    rec(0, onShell = false)
    out.toSeq
  }
}

object CellGridN {
  /** Unit hyper-cube grid ([0,1)^d fixtures). */
  def unit(dims: Int, res: Int): CellGridN =
    CellGridN(Array.fill(dims)(0.0), Array.fill(dims)(1.0), res)
}
