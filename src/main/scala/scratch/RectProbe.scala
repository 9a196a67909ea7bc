import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-wise timing of knnRectJoinTrees — DELETE after use. */
object RectProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.TpchGeo.{load, rects, points}
    import graft.index.CellGrid

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val grid = CellGrid.lonLat(6)
      val geoms = rects(load(spark, sfDir, "orders"), "o_orderkey").select(
        col("id").as("gid"),
        col("min_x").as("minX"), col("min_y").as("minY"),
        col("max_x").as("maxX"), col("max_y").as("maxY"))
      val pts = points(load(spark, sfDir, "customer"), "c_custkey")
        .as[graft.engine.PointRow]
      import graft.functions.SpatialFunctions.{stCell, stCoverCells}
      val histRows = timed("hist") {
        geoms.select(stCell(grid)(col("minX"), col("minY")).as("cell"))
          .groupBy("cell").count().as[(Long, Long)].collect().sortBy(_._1)
      }
      println(s"  hist cells=${histRows.length} total=${histRows.map(_._2).sum}")
      val parts = 32
      val rectShuffled = timed("rectShuffle+ckpt") {
        geoms.select(
          explode(stCoverCells(grid)(
            col("minX"), col("minY"), col("maxX"), col("maxY"))).as("cell"),
          col("gid"), col("minX"), col("minY"), col("maxX"), col("maxY"))
          .repartition(parts, col("cell")).sortWithinPartitions("cell")
          .localCheckpoint(true)
      }
      println(s"  rect rows=${rectShuffled.count()}")
      val full = timed("fullQuery") {
        graft.engine.SpatialOps.knnRectJoinTrees(pts, geoms, 3, grid).count()
      }
      println(s"  out=$full")
    }
    spark.stop()
  }
}
