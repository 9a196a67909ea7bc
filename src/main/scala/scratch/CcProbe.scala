import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: dupClusters stage timing — DELETE after use. */
object CcProbe {
  def main(args: Array[String]): Unit = {
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
    val docs = graft.TpchGeo.load(spark, "/root/testdata/sf0.1", "documents")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val pairs = timed("minhashLshPairs") {
        graft.pipeline.PipelineOps.minhashLshPairs(docs, 3, 0.7)
          .select("a", "b").localCheckpoint(true)
      }
      println("  pairs=" + pairs.count())
      timed("connectedComponents") {
        graft.pipeline.PipelineOps.connectedComponents(pairs).count()
      }
      timed("fullDupClusters") {
        graft.pipeline.PipelineOps.dupClusters(docs, 3, 0.7).count()
      }
    }
    spark.stop()
  }
}
