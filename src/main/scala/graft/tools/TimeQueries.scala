package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query wall-time probe: times the named SparkEntry queries
  * (default: the r02 regression-watch pair) at local[32] over argv(0).
  * `sbt "runMain graft.tools.TimeQueries <sfDir> [q1,q2,...]"`
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("dd_minhash_lsh", "dd_dedup_removal"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[time] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
