package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._

/** Unit tests mirroring the reference's AABB / primitives suites
  * (rstar/src/aabb.rs:250-304, line.rs:115-139, rectangle.rs:113-131).
  */
class GeomSpec extends AnyFunSuite {

  private def box(a: Double, b: Double, c: Double, d: Double) =
    AABB.of2d(a, b, c, d)

  test("empty box convention: lower=+Max, upper=-Max; merge is identity") {
    val e = AABB.empty(2)
    assert(e.isEmpty)
    val b = box(0, 0, 1, 1)
    assert(e.merged(b) == b)
    assert(b.merged(e) == b)
    assert(e.area == 0.0)
  }

  test("fromPoints folds from the empty box (reference regression aabb.rs:291-294)") {
    val b = AABB.fromPoints(Seq(Array(0.5, 0.5)))
    assert(b == box(0.5, 0.5, 0.5, 0.5))
    assert(AABB.fromPoints(Seq.empty[Array[Double]]).isEmpty)
  }

  test("closed-interval semantics: touching boxes intersect, border points contained") {
    val a = box(0, 0, 1, 1)
    val b = box(1, 1, 2, 2) // touches at corner
    assert(a.intersects(b) && b.intersects(a))
    assert(a.containsPoint(Array(1.0, 1.0)))
    assert(a.containsPoint(Array(0.0, 0.5)))
    assert(!a.containsPoint(Array(1.0000001, 1.0)))
    assert(!a.intersects(box(1.1, 0, 2, 1)))
  }

  test("containsEnvelope is full containment, not intersection") {
    val a = box(0, 0, 10, 10)
    assert(a.containsEnvelope(box(1, 1, 2, 2)))
    assert(a.containsEnvelope(a))
    assert(!a.containsEnvelope(box(5, 5, 11, 6)))
  }

  test("area / perimeter / intersectionArea / center arithmetic") {
    val a = box(0, 0, 2, 3)
    assert(a.area == 6.0)
    assert(a.perimeterValue == 5.0)
    assert(a.center.toSeq == Seq(1.0, 1.5))
    assert(a.intersectionArea(box(1, 1, 5, 5)) == 1.0 * 2.0)
    assert(a.intersectionArea(box(10, 10, 11, 11)) == 0.0)
  }

  test("distance2: zero inside, clamped squared distance outside") {
    val a = box(0, 0, 1, 1)
    assert(a.distance2(Array(0.5, 0.5)) == 0.0)
    assert(a.distance2(Array(2.0, 0.5)) == 1.0)
    assert(a.distance2(Array(2.0, 2.0)) == 2.0)
    assert(a.minPoint(Array(2.0, -1.0)).toSeq == Seq(1.0, 0.0))
  }

  test("minMaxDist2 ≥ distance2 and ≤ distance to farthest corner (bound property)") {
    val rng = new java.util.Random(42)
    (1 to 500).foreach { _ =>
      val b = AABB.fromCorners(
        Array(rng.nextDouble(), rng.nextDouble()),
        Array(rng.nextDouble(), rng.nextDouble()))
      val p = Array(rng.nextDouble() * 3 - 1, rng.nextDouble() * 3 - 1)
      val mmd = b.minMaxDist2(p)
      assert(mmd >= b.distance2(p) - 1e-12)
      // farthest corner distance
      val far = (for {
        x <- Seq(b.lower(0), b.upper(0)); y <- Seq(b.lower(1), b.upper(1))
      } yield Pt.distance2(Array(x, y), p)).max
      assert(mmd <= far + 1e-12)
    }
  }

  test("minMaxDist2 reference regression shape (aabb.rs:277-288)") {
    // A degenerate box (a point) must give the exact squared distance.
    val b = AABB.fromPoint(Array(3.0, 4.0))
    assert(b.minMaxDist2(Array(0.0, 0.0)) == 25.0)
  }

  test("line: nearest point is the segment-clamped projection (line.rs:115-139)") {
    val l = LineObj(Array(0.0, 0.0), Array(1.0, 1.0))
    assert(l.nearestPoint(Array(0.0, 0.1)).toSeq == Seq(0.05, 0.05))
    assert(l.nearestPoint(Array(-1.0, -1.0)).toSeq == Seq(0.0, 0.0))
    assert(l.nearestPoint(Array(5.0, 5.0)).toSeq == Seq(1.0, 1.0))
    assert(l.distance2(Array(1.0, 0.0)) == 0.5)
    // degenerate segment
    val d = LineObj(Array(2.0, 2.0), Array(2.0, 2.0))
    assert(d.distance2(Array(3.0, 2.0)) == 1.0)
  }

  test("rectangle delegates to AABB (rectangle.rs:95-111)") {
    val r = RectObj(box(0, 0, 1, 1))
    assert(r.containsPoint(Array(1.0, 1.0)))
    assert(r.distance2(Array(2.0, 1.0)) == 1.0)
  }

  test("point containment is exact equality (object.rs:216-237)") {
    val p = PointObj(Array(0.3, 0.4))
    assert(p.containsPoint(Array(0.3, 0.4)))
    assert(!p.containsPoint(Array(0.3, 0.4000001)))
  }
}
