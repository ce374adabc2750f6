package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round profiling harness (guide §1: measure first) — NOT
  * the driver bench. Mirrors [[graft.Bench]]'s session(32) config exactly
  * and, for each named query, times the DataFrame BUILD (driver-side
  * fixture generation + plan construction) separately from the COUNT
  * (the Spark job), over `reps` repetitions, so driver-side fixture cost
  * and cluster compute can be attributed separately.
  *
  * `sbt "runMain graft.tools.BenchExtra <sfDir> [q1,q2,...|all] [reps]"`
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val all = graft.SparkEntry.queries
    val names = args.lift(1).filter(_ != "all").map(_.split(",").toSeq)
      .getOrElse(all.keys.toSeq.sorted)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-benchextra")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1L << 20).toString)
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val verbose = args.lift(3).contains("-v")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (verbose) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, System.nanoTime()): Unit
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = Option(starts.remove(je.jobId)).getOrElse(0L)
          jobs.add(f"  job=${je.jobId} ${(System.nanoTime() - t0) / 1e9}%.3f s")
          ()
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = sc.stageInfo
          val dur = for {
            a <- si.submissionTime; b <- si.completionTime
          } yield (b - a) / 1e3
          jobs.add(f"    stage=${si.stageId} tasks=${si.numTasks} " +
            f"dur=${dur.getOrElse(-1.0)}%.3f s name=${si.name.take(60)}")
          ()
        }
      })
    names.foreach { n =>
      val fn = all(n)
      (0 until reps).foreach { r =>
        spark.sparkContext.setJobDescription(s"benchextra:$n")
        jobs.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val c = df.count()
        val t2 = System.nanoTime()
        println(f"[bx] $n rep=$r build=${(t1 - t0) / 1e9}%.3f " +
          f"count=${(t2 - t1) / 1e9}%.3f total=${(t2 - t0) / 1e9}%.3f " +
          f"rows=$c")
        if (verbose) {
          Thread.sleep(200) // let listener events drain
          jobs.forEach(println(_))
        }
      }
    }
    spark.stop()
  }
}
