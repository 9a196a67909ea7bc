package graft.geom

/** Vector helpers over `Array[Double]` points, mirroring the reference's
  * `PointExt` operations (rstar/src/point.rs:184-269). Summations always run
  * in dimension order so distances are bit-identical regardless of partition
  * layout (see rstar/src/point.rs:241-243 for `length_2`).
  */
object Pt {
  def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  def length2(a: Array[Double]): Double = dot(a, a)

  def sub(a: Array[Double], b: Array[Double]): Array[Double] = {
    val r = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { r(i) = a(i) - b(i); i += 1 }
    r
  }

  def add(a: Array[Double], b: Array[Double]): Array[Double] = {
    val r = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { r(i) = a(i) + b(i); i += 1 }
    r
  }

  def scale(a: Array[Double], s: Double): Array[Double] = {
    val r = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { r(i) = a(i) * s; i += 1 }
    r
  }

  def distance2(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }
}

/** A thing with an envelope — the reference's `RTreeObject`
  * (rstar/src/object.rs:83-92). At the DataFrame boundary rows carry
  * geometry columns from which this is derived.
  */
trait SpatialObject extends Serializable {
  def envelope: AABB
}

/** A thing with a distance to a point — the reference's `PointDistance`
  * (rstar/src/object.rs:154-200). `distance2IfLessOrEqual` is the
  * short-circuit lower-bound check used by nearest-neighbor search
  * (rstar/src/object.rs:186-199): first test the envelope distance (a cheap
  * lower bound); only when it passes compute the exact distance, and return
  * it only if it is within the limit.
  */
trait DistanceObject extends SpatialObject {
  def distance2(p: Array[Double]): Double

  /** Default: inside iff distance² ≤ 0 (rstar/src/object.rs:164-171). */
  def containsPoint(p: Array[Double]): Boolean = distance2(p) <= 0.0

  def distance2IfLessOrEqual(p: Array[Double], maxDistance2: Double): Option[Double] = {
    val envDist = envelope.distance2(p)
    if (envDist <= maxDistance2) {
      val d = distance2(p)
      if (d <= maxDistance2) Some(d) else None
    } else None
  }
}

/** Point geometry: envelope is the degenerate box, containment is exact
  * equality (rstar/src/object.rs:216-237).
  */
final case class PointObj(coords: Array[Double]) extends DistanceObject {
  def envelope: AABB = AABB.fromPoint(coords)
  def distance2(p: Array[Double]): Double = Pt.distance2(coords, p)
  override def containsPoint(p: Array[Double]): Boolean =
    java.util.Arrays.equals(coords, p)
}

/** Line segment; distance is the segment-clamped projection
  * (rstar/src/primitives/line.rs:71-113); envelope is the corner box
  * (line.rs:47-56).
  */
final case class LineObj(from: Array[Double], to: Array[Double])
    extends DistanceObject {
  def envelope: AABB = AABB.fromCorners(from, to)

  def length2: Double = Pt.distance2(from, to)

  /** Closest point on the segment to `p` (rstar/src/primitives/line.rs:76-95):
    * project onto the carrier line, clamp the parameter to [0, 1].
    */
  def nearestPoint(p: Array[Double]): Array[Double] = {
    val dir = Pt.sub(to, from)
    val len2 = Pt.length2(dir)
    if (len2 == 0.0) return from.clone()
    val t = Pt.dot(Pt.sub(p, from), dir) / len2
    if (t <= 0.0) from.clone()
    else if (t >= 1.0) to.clone()
    else Pt.add(from, Pt.scale(dir, t))
  }

  def distance2(p: Array[Double]): Double = Pt.distance2(nearestPoint(p), p)
}

/** Axis-aligned rectangle with payload semantics per
  * rstar/src/primitives/rectangle.rs:17-22; distance/containment delegate to
  * the AABB (rectangle.rs:79-111).
  */
final case class RectObj(box2: AABB) extends DistanceObject {
  def envelope: AABB = box2
  def distance2(p: Array[Double]): Double = box2.distance2(p)
  override def containsPoint(p: Array[Double]): Boolean = box2.containsPoint(p)
  def nearestPoint(p: Array[Double]): Array[Double] = box2.minPoint(p)
}
