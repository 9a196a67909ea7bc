import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch: bisect the ngram_dup regression — DELETE after use. */
object NgramBisect {
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
    val docs0 = graft.TpchGeo.load(spark, "/root/testdata/sf0.1", "documents")
    val docs = if (docs0.rdd.getNumPartitions < 32) docs0.repartition(32) else docs0
    val n = 3
    def timed(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); val r = f
        println(f"T $tag ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$r")
      }
    }
    def shingles(d: org.apache.spark.sql.DataFrame) = {
      val toks = split(col("text"), " ")
      val grams = transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))
      d.where(size(toks) >= n)
        .select(col("doc_id"), explode(array_distinct(grams)).as("shingle"))
    }
    timed("explodeOnly") { shingles(docs).count() }
    timed("groupShingle") {
      shingles(docs).groupBy("shingle").agg(count(lit(1)).as("df"))
        .where(col("df") > 128).count()
    }
    timed("windowDf") {
      shingles(docs)
        .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
        .where(col("df") > 128).count()
    }
    timed("cntInRow") {
      val toks = split(col("text"), " ")
      val grams = transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))
      docs.where(size(toks) >= n)
        .select(col("doc_id"), size(array_distinct(grams)).cast("long").as("cnt"))
        .count()
    }
    spark.stop()
  }
}
