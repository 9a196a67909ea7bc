import org.apache.spark.sql.SparkSession

/** Scratch: A/B annIvfTopK kmeansIters on sf0.1 — DELETE after use. */
object IvfProbe {
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
    val emb = graft.TpchGeo.load(spark, "/root/testdata/sf0.1", "embeddings")
    Seq(1, 0, 1, 0, 1, 0).foreach { iters =>
      val t0 = System.nanoTime()
      val n = graft.pipeline.PipelineOps.annIvfTopK(
        emb, nQueries = 10, k = 10, nClusters = 32, kmeansIters = iters).count()
      println(f"IVF iters=$iters ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
