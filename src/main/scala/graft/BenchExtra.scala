package graft

import org.apache.spark.sql.SparkSession

/** Round-7 measurement harness (guide §1): NOT part of the driver
  * contract — `graft.Bench` stays the round benchmark and is frozen.
  *
  * Three modes, all on a session configured IDENTICALLY to
  * [[Bench.session]] so numbers and plans are representative of the
  * driver's runs:
  *
  *   runMain graft.BenchExtra time <sfDir> <q1,q2,...> [reps]
  *     count()-timed (the driver's action), warm pass first, best-of.
  *   runMain graft.BenchExtra noop <sfDir> <q1,q2,...> [reps]
  *     noop-sink timed (guide §1.4): every column of every row computed
  *     and discarded — isolates computation from count()'s pruning.
  *   runMain graft.BenchExtra plan <sfDir> <outDir> <suffix> <q1,...|all>
  *     writes .explain("formatted") of each query to
  *     <outDir>/<name>_<suffix>.txt (the judge-facing plan evidence).
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)

    mode match {
      case "time" | "noop" =>
        val names = args(2).split(",").toSeq
        val reps = if (args.length > 3) args(3).toInt else 3
        def act(name: String): Long = {
          val df = SparkEntry.queries(name)(spark, sfDir)
          if (mode == "noop") {
            df.write.format("noop").mode("overwrite").save(); -1L
          } else df.count()
        }
        names.foreach { name =>
          spark.sparkContext.setJobDescription(s"$mode:$name")
          act(name) // warm: JIT + codegen + listing
          System.gc()
          val times = (1 to reps).map { _ =>
            graft.streaming.StreamMetrics.lastOpSeconds = -1.0
            val t0 = System.nanoTime()
            val n = act(name)
            ((System.nanoTime() - t0) / 1e9,
              graft.streaming.StreamMetrics.lastOpSeconds, n)
          }
          val opBest = times.map(_._2).filter(_ >= 0).minOption
          println(f"BENCHEXTRA $mode $name%-22s best=${times.map(_._1).min}%.3f${
            opBest.fold("")(o => f" op=$o%.3f")}  runs=${
            times.map(t => f"${t._1}%.3f").mkString(",")}  rows=${times.head._3}")
        }

      case "plan" =>
        val outDir = args(2)
        val suffix = args(3)
        val names =
          if (args(4) == "all") SparkEntry.queries.keys.toSeq.sorted
          else args(4).split(",").toSeq
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        names.foreach { name =>
          // q_stream_* queries EXECUTE streams on construction; their plan
          // is the streaming micro-batch plan, not captured here.
          if (!name.startsWith("q_stream")) {
            val df = SparkEntry.queries(name)(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"PLAN $name -> $outDir/${name}_$suffix.txt")
          }
        }

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
