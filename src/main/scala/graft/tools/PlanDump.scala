package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-query `explain("formatted")` dumps for the optimization rounds:
  * writes `plans/<tag>/<query>_<suffix>.txt` for each named query (or
  * all), under the SAME session config as the bench sweep (local[32],
  * AQE on, 32 shuffle partitions) so plan shapes match what the driver
  * measures.
  *
  * `sbt "runMain graft.tools.PlanDump <sfDir> <tag> <suffix> [q1,q2,...|all]"`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val tag = args.lift(1).getOrElse("r06")
    val suffix = args.lift(2).getOrElse("before")
    val names = args.lift(3).filter(_ != "all").map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get(s"/root/repo/plans/$tag")
    Files.createDirectories(dir)
    names.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(dir.resolve(s"${name}_$suffix.txt"), plan)
      } catch { case e: Throwable =>
        Files.writeString(dir.resolve(s"${name}_$suffix.txt"),
          s"ERROR: ${e.getMessage}\n")
      }
    }
    println(s"[plans] wrote ${names.size} $suffix plans to $dir")
    spark.stop()
  }
}
