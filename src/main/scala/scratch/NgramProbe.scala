import org.apache.spark.sql.SparkSession

/** Scratch: ngram_dup executed-plan reuse check — DELETE after use. */
object NgramProbe {
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
    val df = graft.SparkEntry.queries("q_ngram_dup")(spark, "/root/testdata/sf0.1")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE=" + "ReusedExchange".r.findAllIn(plan).size)
    println("EXCHANGE=" + "Exchange".r.findAllIn(plan).size)
    println("WINDOW=" + "Window".r.findAllIn(plan).size)
    println("SCANS=" + "Scan parquet".r.findAllIn(plan).size)
    spark.stop()
  }
}
