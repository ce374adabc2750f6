package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition probe for the ex_* ingest-query overhead
  * (optimization round): times generation, binaryFile listing/read,
  * plain scan count, and the full extract pipeline count separately.
  */
object ProbeEx {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (0 until 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val tmp = java.nio.file.Files.createTempDirectory("probe-docx").toString
      time("gen")(graft.gen.DocxGen.write(tmp, 24))
      val raw = time("read-build")(
        spark.read.format("binaryFile").load(tmp))
      time("path-count")(raw.select("path").count())
      time("path-count2")(raw.select("path").count())
      val ds = time("rawfiles-build")(graft.sources.RawFiles.read(spark, tmp))
      time("rawfiles-count")(ds.count())
      val full = time("full-build") {
        ds.flatMap(d => graft.extract.Extractor.extractRows(d)).toDF()
          .select(col("doc_id"), col("kind"), col("text"),
            element_at(split(col("media_ref"), "/"), -1).as("media_ref"),
            col("order").as("ord"))
          .orderBy("doc_id", "ord")
      }
      time("full-count")(full.count())
      time("full-count2")(full.count())
      // decomposition: which half of RawFiles.read costs what
      val scan = spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true").load(tmp)
      time("scan-content-count")(scan.select("path", "content").count())
      val trivial = scan.select(col("path"), col("content"))
        .flatMap { r => Seq(graft.core.InputDoc(r.getString(0),
          Vector(graft.core.Span("text", "x", null, 0)))) }
      time("trivial-flatmap-count")(trivial.count())
      time("trivial-flatmap-count2")(trivial.count())
      val plan = time("qe-plan") {
        val ds2 = graft.sources.RawFiles.read(spark, tmp)
        ds2.queryExecution.executedPlan
        ds2
      }
      time("qe-then-count")(plan.count())
    }
    spark.stop()
  }
}
