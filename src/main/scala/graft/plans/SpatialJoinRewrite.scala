package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Catalyst optimizer rule: an inner join whose condition is the
  * closed-interval box-intersection conjunction (the exact canonical shape
  * `SpatialFunctions.stIntersectsBox` emits — SURVEY.md §4 item 3, the "v2"
  * planner integration) is rewritten from a theta join (which Spark can
  * only execute as a nested-loop join) into the grid-cell equi-join:
  *
  *   Join(l, r, lminX<=rmaxX && lmaxX>=rminX && lminY<=rmaxY && lmaxY>=rminY)
  *     ⇒ Project(original output,
  *         Join(Generate(ix)(Generate(iy)(l)), Generate(ix)(Generate(iy)(r)),
  *              ixL=ixR && iyL=iyR && <original> && <reference-point dedup>))
  *
  * so Catalyst plans a broadcast/sort-merge HASH join on the cell indices.
  * The reference-point predicate keeps each intersecting pair exactly once
  * (reference join semantics, rstar/src/algorithm/intersection_iterator.rs:112-134).
  *
  * The rewrite never fires twice: its own output contains equality
  * conjuncts, which the matcher rejects.
  *
  * Config: `spark.graft.spatialJoin.res` (grid resolution, default 4),
  * `spark.graft.spatialJoin.enabled` (default true).
  *
  * Domain note: the matcher is purely syntactic, so with GraftExtensions
  * installed the rule fires on ANY inner join in the 4-comparison
  * double-interval shape (e.g. interval-overlap joins over epoch seconds).
  * Results stay correct — the original predicate is kept — but values
  * outside the lon/lat domain all clamp to one border cell, degrading the
  * rewrite to a single-key hash join plus Generate overhead. Sessions whose
  * double-interval joins are not lon/lat-shaped should set
  * `spark.graft.spatialJoin.enabled=false` (or scope the extension to
  * spatial sessions); a value-aware gate is impossible at plan time, since
  * the optimizer sees expressions, not data.
  */
object SpatialJoinRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.spatialJoin.enabled", "true").toBoolean
  private def res: Int =
    conf.getConfString("spark.graft.spatialJoin.res", "4").toInt

  // fixed lon/lat domain; clamping makes out-of-domain coords complete
  private val (minX, extX) = (-180.0, 360.0)
  private val (minY, extY) = (-90.0, 180.0)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if matches(cond, left, right) =>
        rewrite(j, left, right, cond)
    }

  /** The canonical left-assoc shape:
    * And(And(And(LTE(a,b), GTE(c,d)), LTE(e,f)), GTE(g,h)) with each
    * comparison's lower/upper pure to one side, double-typed,
    * deterministic.
    */
  private def matches(
      cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    cond match {
      case And(And(And(
        LessThanOrEqual(lMinX, rMaxX), GreaterThanOrEqual(lMaxX, rMinX)),
        LessThanOrEqual(lMinY, rMaxY)), GreaterThanOrEqual(lMaxY, rMinY)) =>
        def l(e: Expression) = e.deterministic && e.dataType == DoubleType &&
          e.references.nonEmpty && e.references.subsetOf(left.outputSet)
        def r(e: Expression) = e.deterministic && e.dataType == DoubleType &&
          e.references.nonEmpty && e.references.subsetOf(right.outputSet)
        l(lMinX) && l(lMaxX) && l(lMinY) && l(lMaxY) &&
          r(rMinX) && r(rMaxX) && r(rMinY) && r(rMaxY)
      case _ => false
    }

  private def axisIdx(v: Expression, mn: Double, ext: Double): Expression = {
    val n = 1 << res
    Least(Seq(Literal((n - 1).toLong),
      Greatest(Seq(Literal(0L),
        Cast(Floor(Multiply(Divide(Subtract(v, Literal(mn)), Literal(ext)),
          Literal(n.toDouble))), LongType)))))
  }

  /** Explode the inclusive index range [lo, hi] as a generated column. */
  private def genAxis(
      child: LogicalPlan, lo: Expression, hi: Expression,
      name: String): (LogicalPlan, Attribute) = {
    val attr = AttributeReference(name, LongType, nullable = false)()
    (Generate(
      // Sequence is TimeZoneAware: resolved only once timeZoneId is set
      Explode(Sequence(axisIdx(lo, dom(name)._1, dom(name)._2),
        axisIdx(hi, dom(name)._1, dom(name)._2), None,
        Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(attr), child = child), attr)
  }

  private def dom(name: String): (Double, Double) =
    if (name.startsWith("__gx")) (minX, extX) else (minY, extY)

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression): LogicalPlan = {
    val And(And(And(
      LessThanOrEqual(lMinX, rMaxX), GreaterThanOrEqual(lMaxX, rMinX)),
      LessThanOrEqual(lMinY, rMaxY)), GreaterThanOrEqual(lMaxY, rMinY)) = cond

    val (lGx, ixL) = genAxis(left, lMinX, lMaxX, "__gxl")
    val (lGxy, iyL) = genAxis(lGx, lMinY, lMaxY, "__gyl")
    val (rGx, ixR) = genAxis(right, rMinX, rMaxX, "__gxr")
    val (rGxy, iyR) = genAxis(rGx, rMinY, rMaxY, "__gyr")

    // reference-point dedup: emit only in the cell of the intersection
    // box's lower corner
    val dedup = And(
      EqualTo(ixL, axisIdx(Greatest(Seq(lMinX, rMinX)), minX, extX)),
      EqualTo(iyL, axisIdx(Greatest(Seq(lMinY, rMinY)), minY, extY)))

    val newCond = And(And(EqualTo(ixL, ixR), EqualTo(iyL, iyR)),
      And(cond, dedup))
    Project(j.output,
      Join(lGxy, rGxy, Inner, Some(newCond), j.hint))
  }
}

/** Session extension registration:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SpatialJoinRewrite)
    GraftFunctions.registrations.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

/** SQL registrations for the st_* functions, as raw Catalyst expression
  * builders (Spark 4's Column API is node-based, so Column compositions
  * can't be reused as SQL function bodies; SpatialJoinRewriteSpec asserts
  * the two surfaces agree). Same IEEE arithmetic, same operand order as
  * graft.functions.SpatialFunctions.
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def sq(a: Expression): Expression = Multiply(a, a)

  /** (x-px)² + (y-py)² — twin of stDistanceSq. */
  private def dist2(x: Expression, y: Expression,
      px: Expression, py: Expression): Expression =
    Add(sq(Subtract(x, px)), sq(Subtract(y, py)))

  private def containsPoint(es: Seq[Expression]): Expression = {
    val Seq(minX, minY, maxX, maxY, px, py) = es
    And(And(LessThanOrEqual(minX, px), LessThanOrEqual(px, maxX)),
      And(LessThanOrEqual(minY, py), LessThanOrEqual(py, maxY)))
  }

  private def intersectsBox(es: Seq[Expression]): Expression = {
    val Seq(aMinX, aMinY, aMaxX, aMaxY, bMinX, bMinY, bMaxX, bMaxY) = es
    And(And(LessThanOrEqual(aMinX, bMaxX), GreaterThanOrEqual(aMaxX, bMinX)),
      And(LessThanOrEqual(aMinY, bMaxY), GreaterThanOrEqual(aMaxY, bMinY)))
  }

  private def boxDist2(es: Seq[Expression]): Expression = {
    val Seq(minX, minY, maxX, maxY, px, py) = es
    val cx = Least(Seq(maxX, Greatest(Seq(minX, px))))
    val cy = Least(Seq(maxY, Greatest(Seq(minY, py))))
    dist2(cx, cy, px, py)
  }

  /** Segment-clamped projection — twin of stLineDistanceSq. */
  private def lineDist2(es: Seq[Expression]): Expression = {
    val Seq(x1, y1, x2, y2, px, py) = es
    val dx = Subtract(x2, x1)
    val dy = Subtract(y2, y1)
    val len2 = Add(sq(dx), sq(dy))
    val t = Divide(Add(Multiply(Subtract(px, x1), dx),
      Multiply(Subtract(py, y1), dy)), len2)
    val tc = Least(Seq(Literal(1.0), Greatest(Seq(Literal(0.0), t))))
    val nx = Add(x1, Multiply(tc, dx))
    val ny = Add(y1, Multiply(tc, dy))
    Add(sq(Subtract(px, nx)), sq(Subtract(py, ny)))
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.SpatialFunctions", null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  val registrations: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("st_distance_sq",
      info("st_distance_sq", "squared euclidean distance (x, y, px, py)"),
      (es: Seq[Expression]) => dist2(es(0), es(1), es(2), es(3))),
    ("st_contains_point",
      info("st_contains_point",
        "closed-interval point-in-box (minX, minY, maxX, maxY, px, py)"),
      containsPoint _),
    ("st_intersects_box",
      info("st_intersects_box",
        "closed-interval box overlap (aMinX..aMaxY, bMinX..bMaxY)"),
      intersectsBox _),
    ("st_box_distance_sq",
      info("st_box_distance_sq",
        "squared distance from point to box (minX, minY, maxX, maxY, px, py)"),
      boxDist2 _),
    ("st_line_distance_sq",
      info("st_line_distance_sq",
        "squared distance from point to segment (x1, y1, x2, y2, px, py)"),
      lineDist2 _),
    ("strhash31",
      info("strhash31",
        "31-bit polynomial codepoint hash mod 2^31-1 (oracle-expressible)"),
      (es: Seq[Expression]) => graft.functions.StrHash31(es.head)))
}
