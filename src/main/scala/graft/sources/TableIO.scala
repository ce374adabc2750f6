package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Format-agnostic table IO (SURVEY.md §7.1): the pipeline writes through
  * this seam so the in-sandbox Hadoop-path implementation swaps for
  * Iceberg by config alone — no pipeline-code change.
  *
  * The one operation the checkpoint protocol needs is idempotent
  * per-group overwrite: re-running a failed group must replace, not
  * duplicate (ExtractJob exactly-once semantics).
  */
trait TableIO extends Serializable {
  /** Overwrite the data of one checkpoint group. */
  def overwriteGroup(df: DataFrame, group: Int): Unit
  /** Read the whole table back (all groups). */
  def read(spark: SparkSession): DataFrame
}

/** Partitioned-Parquet implementation used in-sandbox: one directory per
  * group (`<root>/data/group=<g>`), overwritten atomically enough for the
  * manifest protocol (the manifest rename in [[graft.pipeline.Checkpoint]]
  * is the commit point, not the file write).
  */
final case class HadoopTableIO(root: String) extends TableIO {
  override def overwriteGroup(df: DataFrame, group: Int): Unit =
    df.write.mode("overwrite").parquet(s"$root/data/group=$group")
  override def read(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$root/data")
}

/** Iceberg implementation — the north-rule deployment target. Requires
  * the iceberg-spark-runtime jar + catalog config at runtime (not present
  * in this sandbox, hence never constructed by tests); compiles against
  * the stable DataFrameWriterV2 API only.
  *
  * The group column doubles as the Iceberg partition spec
  * (`PARTITIONED BY (group)`), so `overwritePartitions` replaces exactly
  * the rows of the re-run group — the same idempotence contract as the
  * Hadoop path, but transactional.
  */
final case class IcebergTableIO(table: String) extends TableIO {
  import org.apache.spark.sql.functions.lit
  override def overwriteGroup(df: DataFrame, group: Int): Unit =
    df.withColumn("group", lit(group))
      .writeTo(table).overwritePartitions()
  override def read(spark: SparkSession): DataFrame =
    spark.read.table(table)
}
