package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.PagesGen
import graft.engine._
import graft.index.CellGrid

/** Per-round benchmark (driver contract: ONE JSON line on stdout).
  *
  * Two parts:
  *   1. the SparkEntry operator suite timed on SPARK_GRAFT_SF_DIR;
  *   2. the headline metric from BASELINE.json — spatial-join + kNN
  *      throughput over the Common-Crawl-shaped pages pipeline — run at two
  *      parallelism levels (cpus/4 and cpus) on the SAME input, reporting
  *      throughput at both plus scaling efficiency, the sandbox stand-in
  *      for the N vs 4N executor criterion (north_rule; BASELINE.md).
  */
object Bench {

  /** The headline pipeline: synthesize pages, extract geo-entities, spatial
    * join vs a tile layer (J1), 1-NN join vs a POI layer (K1). Returns
    * (entities processed, join pairs, knn rows).
    */
  def headline(spark: SparkSession, nPages: Long): (Long, Long, Long) = {
    import spark.implicits._
    val grid = CellGrid.lonLat(6)
    val parts = spark.sparkContext.defaultParallelism * 2
    val entities = PagesGen.pages(spark, nPages, skewShare = 0.3, partitions = parts)
      .toDF()
      .withColumn("e", explode(PagesGen.entities(col("text"))))
      .select(
        monotonically_increasing_id().as("id"),
        col("e.lon").as("x"), col("e.lat").as("y"))
      .cache()
    val nEnt = entities.count()

    // J1: entities (as degenerate rects) vs tiles — DataFrame plan.
    val entRects = entities.select(
      col("id"), col("x").as("minX"), col("y").as("minY"),
      col("x").as("maxX"), col("y").as("maxY"))
    val tileRects = PagesGen.tiles(spark, nPages / 100 max 1000, maxW = 0.2)
      .select(col("tile_id").as("id"),
        col("minX"), col("minY"), col("maxX"), col("maxY"))
    val pairs = SpatialOps.intersectionJoin(entRects, tileRects, grid).count()

    // K1: 1-NN of each entity among the POI layer.
    val pois = PagesGen.pois(spark, nPages / 10 max 10000)
      .select(col("poi_id").as("id"), col("lon").as("x"), col("lat").as("y"))
      .as[PointRow]
    val queries = entities.select(col("id").as("qid"), col("x"), col("y"))
      .as[QueryRow]
    val knn = SpatialOps.knnJoin(queries, pois, 1, grid).count()
    entities.unpersist()
    (nEnt, pairs, knn)
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "1000000").toLong

    // Part 1: operator suite at full parallelism.
    val spark = session(cpus)
    // warm-up (JIT + parquet footer cache): run the cheapest query once
    try SparkEntry.queries("q_cell_stats")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // Part 2: headline throughput at cpus/4 and cpus (same input size).
    val loN = math.max(1, cpus / 4)
    def run(n: Int): Double = {
      val s = session(n)
      // warm one small pass to amortize JIT before the measured run
      headline(s, nPages / 10)
      val t0 = System.nanoTime()
      val (ents, _, _) = headline(s, nPages)
      val sec = (System.nanoTime() - t0) / 1e9
      s.stop()
      ents / sec / 1e6 // M entity-rows/s through join+kNN
    }
    spark.stop()
    val tputLo = run(loN)
    val tputHi = run(cpus)
    val eff = tputHi / (tputLo * (cpus.toDouble / loN))

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling =
      f"""{"cores_lo":$loN,"cores_hi":$cpus,"mrows_s_lo":$tputLo%.4f,"mrows_s_hi":$tputHi%.4f,"efficiency":$eff%.3f,"pages":$nPages}"""
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","throughput_mrows_s":$tputHi%.4f,"scaling":$scaling}""")
  }
}
