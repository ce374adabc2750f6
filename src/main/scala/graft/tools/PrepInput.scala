package graft.tools
import org.apache.spark.sql.SparkSession
object PrepInput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(300000L)
    val out = args.lift(1).getOrElse("/tmp/bench-input")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.gen.CorpusGen.dataset(s, n, 42L)
      .repartition(64).write.mode("overwrite").parquet(out)
    s.stop()
  }
}
