package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.PagesGen
import graft.engine._
import graft.index.CellGrid

/** The minimum end-to-end slice (SURVEY.md §7.2): synthesize pages, build
  * the checkpointed entity index, run the pairwise tile join (J1) and the
  * 1-NN POI join (K1) over it, verify both against crossJoin brute force,
  * and check the north-rule per-row invariant — byte-identical `text` per
  * `url` after the full pipeline (extraction, cell shuffle, checkpoint
  * round-trip, spatial joins).
  */
class FlagshipSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-flagship-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("pages -> entity index -> tile join + 1-NN join, brute-force equal, " +
    "text byte-identical end-to-end") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val grid = CellGrid.lonLat(5)
    val root = java.nio.file.Files.createTempDirectory("graft_flagship").toString
    val pages = PagesGen.pages(spark, 10000, skewShare = 0.3).toDF().cache()

    // build: checkpointed extraction + cell assignment (C2 stage 1)
    val entities = Checkpoint.buildEntityIndex(spark, pages, grid, root, nGroups = 4)
      .withColumn("id", monotonically_increasing_id()).cache()
    val nEnt = entities.count()
    assert(nEnt > 10000, s"expected ~1.5 entities/page, got $nEnt")

    // J1: entities vs tiles
    val entRects = entities.select(col("id"),
      col("x").as("minX"), col("y").as("minY"),
      col("x").as("maxX"), col("y").as("maxY"))
    val tiles = PagesGen.tiles(spark, 1000, maxW = 2.0)
      .select(col("tile_id").as("id"), col("minX"), col("minY"),
        col("maxX"), col("maxY"))
    val pairs = SpatialOps.intersectionJoin(entRects, tiles, grid)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteJ = entRects.select(col("id").as("eid"), col("minX").as("ex"), col("minY").as("ey"))
      .crossJoin(tiles)
      .where(col("minX") <= col("ex") && col("ex") <= col("maxX") &&
        col("minY") <= col("ey") && col("ey") <= col("maxY"))
      .select(col("eid"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == bruteJ)
    assert(pairs.nonEmpty)

    // K1: 1-NN POI per entity
    val pois = PagesGen.pois(spark, 2000)
      .select(col("poi_id").as("id"), col("lon").as("x"), col("lat").as("y"))
      .as[PointRow]
    val queries = entities.select(col("id").as("qid"), col("x"), col("y"))
      .as[QueryRow]
    val knn = SpatialOps.knnJoin(queries, pois, 1, grid)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(knn.size == nEnt)
    // brute force on a sample of 200 entities
    val sample = entities.limit(200).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("x"), r.getAs[Double]("y")))
    val poiArr = pois.collect()
    sample.foreach { case (id, x, y) =>
      val best = poiArr.minBy(p =>
        ((p.x - x) * (p.x - x) + (p.y - y) * (p.y - y), p.id))
      assert(knn(id) == best.id, s"entity $id")
    }

    // north-rule invariant: text per url byte-identical after the pipeline
    // (join the indexed entities back to their pages by url)
    val joined = entities.select("url").distinct()
      .join(pages, Seq("url"))
    val bad = joined.map { r =>
      val url = r.getAs[String]("url")
      val text = r.getAs[String]("text")
      if (PagesGen.textFor(PagesGen.idFromUrl(url), 0.3) == text) 0L else 1L
    }.reduce(_ + _)
    assert(bad == 0L)

    // lineage covers every group with exact row counts
    val lin = new Checkpoint(spark, root).lineage()
    assert(lin.agg(sum("rows")).collect()(0).getLong(0) == nEnt)
    pages.unpersist(); entities.unpersist()
  }
}
