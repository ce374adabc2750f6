package graft.tools
import org.apache.spark.sql.SparkSession
import graft.core.InputDoc
object ProfileExtract {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1L << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prof-in").toString
    graft.gen.CorpusGen.dataset(spark, 300000, 42L)
      .repartition(64).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir).as[InputDoc]
    def tm(tag: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[prof] $tag rep$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    tm("decode-only (sum span sizes)")(docs.map(_.spans.length).reduce(_+_))
    tm("decode+extract+encode, no write")(
      docs.mapPartitions(it => it.flatMap(graft.extract.Extractor.extractRows)).count())
    val out = java.nio.file.Files.createTempDirectory("prof-out").toString
    tm("full ExtractJob (write+ckpt)")({
      graft.pipeline.ExtractJob.run(spark, docs,
        graft.pipeline.ExtractJob.Config(out + "/" + System.nanoTime(),
          runId = "p", groups = 1, partitions = 24))
    })
    spark.stop()
  }
}
