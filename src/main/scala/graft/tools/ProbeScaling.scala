package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.InputDoc

/** Optimization-round probe (guide §1) — decomposes the EXACT
  * BenchChild-shaped scaling job into its component jobs so the
  * non-scaling fraction can be attributed: the skew-decision count job,
  * the stride-sample cost job, extract-to-noop (no write), and the full
  * ExtractJob (write + checkpoint + metrics). NOT the driver bench.
  *
  * `sbt "runMain graft.tools.ProbeScaling <cores> [nDocs]"`
  */
object ProbeScaling {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(8)
    val nDocs = args.lift(1).map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"probe-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1L << 20).toString)
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def dirMb(d: String): Long = {
      def sz(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles.map(sz).sum else f.length
      sz(new java.io.File(d)) / (1 << 20)
    }
    val dir = java.nio.file.Files.createTempDirectory("probe-in").toString
    graft.gen.CorpusGen.dataset(spark, nDocs, 42L)
      .repartition(64).write.mode("overwrite").parquet(dir)
    println(s"[ps] input: $nDocs docs, ${dirMb(dir)} MiB, " +
      s"${spark.read.parquet(dir).rdd.getNumPartitions} scan partitions")
    val docs = spark.read.parquet(dir).as[InputDoc]
    def tm(tag: String, reps: Int = 3)(f: => Any): Unit = {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[ps] c$cores $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val withGroup = docs.toDF()
      .withColumn("_group", pmod(xxhash64(col("doc_id")), lit(1)).cast("int"))
      .withColumn("_cost",
        coalesce(aggregate(col("spans"), lit(0L),
          (a, s) => a + coalesce(octet_length(s.getField("text")).cast("long"),
                                 lit(0L))), lit(0L)))
    tm("count-job (pre-r06.2 decision component)")(withGroup.count())
    tm("stride-sample-job (r06.2 shape: 8 kept partitions)") {
      val costs = withGroup.select(col("_cost")).rdd
      val k = math.max(1, costs.getNumPartitions / 8)
      val kept = org.apache.spark.rdd.PartitionPruningRDD.create(
        costs, i => i % k == 0)
      kept.map(_.getLong(0)).aggregate((0L, 0L, 0L))(
        { case ((m, t, c), v) => (math.max(m, v), t + v, c + 1) },
        { case ((m1, t1, c1), (m2, t2, c2)) =>
          (math.max(m1, m2), t1 + t2, c1 + c2) })
    }
    tm("extract-noop (no write)")(
      docs.mapPartitions(it => it.flatMap(graft.extract.Extractor.extractRows))
        .write.format("noop").mode("overwrite").save())
    val outP = java.nio.file.Files.createTempDirectory("probe-wr").toString
    tm("extract-parquet (write only, no ckpt)") {
      docs.mapPartitions(it => it.flatMap(graft.extract.Extractor.extractRows))
        .write.mode("overwrite").parquet(s"$outP/${System.nanoTime()}")
    }
    val extracted = docs.mapPartitions(it =>
      it.flatMap(graft.extract.Extractor.extractRows))
    Seq("3" -> "zstd-l3(default)", "1" -> "zstd-l1", "2" -> "zstd-l2")
      .foreach { case (lvl, tag) =>
        val d = s"$outP/lvl$lvl"
        tm(s"write $tag") {
          extracted.write.mode("overwrite")
            .option("parquet.compression.codec.zstd.level", lvl)
            .parquet(d)
        }
        println(s"[ps] c$cores write $tag size=${dirMb(d)} MiB")
      }
    val dSnap = s"$outP/snap"
    tm("write snappy") {
      extracted.write.mode("overwrite")
        .option("compression", "snappy").parquet(dSnap)
    }
    println(s"[ps] c$cores write snappy size=${dirMb(dSnap)} MiB")
    val dNoDict = s"$outP/nodict"
    tm("write zstd no-dictionary") {
      extracted.write.mode("overwrite")
        .option("parquet.enable.dictionary", "false").parquet(dNoDict)
    }
    println(s"[ps] c$cores write zstd no-dictionary size=${dirMb(dNoDict)} MiB")
    val outF = java.nio.file.Files.createTempDirectory("probe-full").toString
    // job-timeline listener: job wall times AND the driver-side gaps
    // between them (planning, commit, manifest, metrics)
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t00 = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          events.add(f"jobStart ${js.jobId} @${(System.nanoTime() - t00.get) / 1e9}%.3f")
          ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          events.add(f"jobEnd   ${je.jobId} @${(System.nanoTime() - t00.get) / 1e9}%.3f")
          ()
        }
      })
    tm("full ExtractJob") {
      events.clear(); t00.set(System.nanoTime())
      graft.pipeline.ExtractJob.run(spark, docs,
        graft.pipeline.ExtractJob.Config(s"$outF/${System.nanoTime()}",
          runId = "p", groups = 1, partitions = 64))
      events.add(f"runEnd @${(System.nanoTime() - t00.get) / 1e9}%.3f")
    }
    Thread.sleep(300)
    events.forEach(e => println(s"[ps]   $e"))
    spark.stop()
  }
}
