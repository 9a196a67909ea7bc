package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries warm (one untimed pass,
  * then `reps` timed passes) at local[cpus]. Not part of the driver
  * contract — `graft.Bench` is the round benchmark.
  *
  * Usage: runMain graft.BenchOne <sfDir> <q1,q2,...> [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm (JIT + listing)
      val times = (1 to reps).map { _ =>
        graft.streaming.StreamMetrics.lastOpSeconds = -1.0
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9,
          graft.streaming.StreamMetrics.lastOpSeconds, n)
      }
      val best = times.map(_._1).min
      val opBest = times.map(_._2).filter(_ >= 0).minOption
      println(f"BENCHONE $name%-20s best=$best%.3f s${
        opBest.fold("")(o => f"  op=$o%.3f s")}  runs=${
        times.map(t => f"${t._1}%.3f").mkString(",")}  rows=${times.head._3}")
    }
    spark.stop()
  }
}
