package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.SpatialFunctions.stIntersectsBox
import graft.plans.GraftExtensions

/** The Catalyst extension: a plain theta join on `st_intersects_box` gets
  * auto-rewritten to the grid equi-join — verified on results (vs crossJoin
  * oracle) AND on the physical plan (hash join + generate, no nested-loop).
  */
class SpatialJoinRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // withExtensions only applies at session CREATION — a session left over
    // from another suite would silently drop the rule; stop it first.
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-rewrite-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  import graft.data.PagesGen.uniform

  private def rects(n: Int, seed: Int, prefix: String) = {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(n).map { id =>
      val x = uniform(id + seed, 1) * 360.0 - 180.0
      val y = uniform(id + seed, 2) * 170.0 - 85.0
      (id, x, y, math.min(x + uniform(id + seed, 3) * 4.0, 180.0),
        math.min(y + uniform(id + seed, 4) * 4.0, 85.0))
    }.toDF(s"${prefix}id", s"${prefix}minx", s"${prefix}miny",
      s"${prefix}maxx", s"${prefix}maxy")
  }

  test("theta join on st_intersects_box is rewritten to a hash join and " +
    "matches the crossJoin oracle exactly") {
    val l = rects(500, 11, "l")
    val r = rects(300, 22, "r")
    val pred = stIntersectsBox(
      col("lminx"), col("lminy"), col("lmaxx"), col("lmaxy"),
      col("rminx"), col("rminy"), col("rmaxx"), col("rmaxy"))
    val joined = l.join(r, pred)

    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("NestedLoop"),
      s"rewrite did not fire; plan:\n$phys")
    assert(phys.contains("Generate"))

    val got = joined.select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val want = l.crossJoin(r)
      .where(col("lminx") <= col("rmaxx") && col("lmaxx") >= col("rminx") &&
        col("lminy") <= col("rmaxy") && col("lmaxy") >= col("rminy"))
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length == got.toSet.size, "duplicates emitted by rewrite")
    assert(got.toSet == want.toSet)
    assert(want.nonEmpty)
  }

  test("rewrite can be disabled by config; disabled plan falls back to " +
    "nested loop with identical results") {
    val l = rects(200, 33, "l")
    val r = rects(100, 44, "r")
    val pred = stIntersectsBox(
      col("lminx"), col("lminy"), col("lmaxx"), col("lmaxy"),
      col("rminx"), col("rminy"), col("rmaxx"), col("rmaxy"))
    val on = l.join(r, pred).select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    spark.conf.set("spark.graft.spatialJoin.enabled", "false")
    try {
      val joined = l.join(r, pred)
      assert(joined.queryExecution.executedPlan.toString.contains("NestedLoop"))
      val off = joined.select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(on == off)
    } finally spark.conf.set("spark.graft.spatialJoin.enabled", "true")
  }

  test("st_* functions are callable from SQL via the extensions") {
    import spark.implicits._
    Seq((0.5, 0.5), (3.0, 4.0)).toDF("x", "y").createOrReplaceTempView("pts")
    val d = spark.sql("SELECT st_distance_sq(x, y, 0.0d, 0.0d) AS d2 FROM pts ORDER BY d2")
      .collect().map(_.getDouble(0)).toSeq
    assert(d == Seq(0.5, 25.0))
    val hit = spark.sql(
      "SELECT st_contains_point(0.0d, 0.0d, 1.0d, 1.0d, 1.0d, 1.0d) AS c").collect()(0).getBoolean(0)
    assert(hit) // closed interval: border contained
    val seg = spark.sql(
      "SELECT st_line_distance_sq(0.0d, 0.0d, 1.0d, 1.0d, 1.0d, 0.0d) AS d").collect()(0).getDouble(0)
    assert(seg == 0.5)
  }

  test("non-spatial joins are untouched") {
    import spark.implicits._
    val a = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
    val b = Seq((1L, 5.0), (3L, 6.0)).toDF("id2", "w")
    val j = a.join(b, col("id") === col("id2"))
    assert(j.count() == 1)
    assert(!j.queryExecution.optimizedPlan.toString.contains("__gx"))
  }
}
