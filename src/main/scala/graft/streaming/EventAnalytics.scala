package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming analytics over an events stream: watermarked event-time
  * tumbling windows. [north-rule extension — the reference has no
  * streaming (SURVEY.md X5); this is the Structured Streaming shape its
  * hourly-task counters would take at scale.]
  *
  * The same aggregation runs identically in batch (`q_event_windows`) —
  * Spark's unified Dataset semantics; the streaming variant adds the
  * watermark for bounded state and late-data discard.
  */
object EventAnalytics {

  /** Hourly (window, event_type) counts/sums with a 2h watermark. Works
    * on any DataFrame with (ts timestamp, event_type string, value
    * double) — batch or stream.
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
      .select(col("window.start").as("h"), col("event_type"),
              col("n"), col("total"))

  /** Run the streaming variant over parquet files arriving in `inputDir`
    * and materialize to an in-memory table; returns the table name.
    * (Complete mode: every trigger emits the full result — fine for the
    * bounded test corpus; production would use append + sink table.)
    */
  def runFileStream(spark: SparkSession, inputDir: String,
                    tableName: String): Unit = {
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val q = hourlyByType(stream).writeStream
      .format("memory").queryName(tableName).outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
