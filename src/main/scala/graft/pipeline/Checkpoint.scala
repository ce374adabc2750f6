package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/** Partition(group)-level checkpoint manifest — the distributed
  * generalization of the reference's incremental anti-join resume
  * (/root/reference/setup.sql:222): instead of `doc NOT IN (processed)`,
  * whole doc-groups are committed atomically and skipped on re-run.
  *
  * Layout: `<outDir>/_checkpoint/group_<g>.json`, written via
  * temp-file + rename (same directory ⇒ same filesystem; atomic on HDFS
  * and posix — on S3-family stores swap the manifest for an Iceberg
  * table commit, SURVEY.md §7.1). A group's data lives under
  * `<outDir>/data/group=<g>/` written with mode=overwrite, so a crashed
  * group re-runs cleanly with no duplicates (exactly-once per group).
  *
  * All I/O goes through the Hadoop [[FileSystem]] API (VERDICT r01 #8) —
  * the same code path works on file://, hdfs://, or any object-store
  * connector on the cluster classpath; nothing here assumes a local
  * filesystem.
  */
object Checkpoint {

  /** The active session's Hadoop conf when one exists (so spark.hadoop.*
    * credentials/endpoints reach object-store connectors), else a fresh
    * default — the manifest must work from plain driver code too.
    */
  private[graft] def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fsFor(p: Path): FileSystem =
    p.getFileSystem(hadoopConf())

  private def dir(outDir: String): Path = new Path(outDir, "_checkpoint")

  def committedGroups(outDir: String): Set[Int] = {
    val d = dir(outDir)
    val fs = fsFor(d)
    if (!fs.isDirectory(d)) return Set.empty
    fs.listStatus(d).iterator.map(_.getPath.getName)
      .collect { case s if s.startsWith("group_") && s.endsWith(".json") =>
        s.stripPrefix("group_").stripSuffix(".json").toInt }
      .toSet
  }

  def commitGroup(outDir: String, group: Int, runId: String,
                  docCount: Long, durationMs: Long): Unit = {
    val d = dir(outDir)
    val fs = fsFor(d)
    fs.mkdirs(d)
    val body =
      s"""{"group":$group,"run_id":"$runId","doc_count":$docCount,"duration_ms":$durationMs}"""
    val tmp = new Path(d, s".group_$group.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val dst = new Path(d, s"group_$group.json")
    fs.delete(dst, false) // rename does not overwrite on all FS impls
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"checkpoint rename failed: $tmp -> $dst")
  }

  def clear(outDir: String): Unit = {
    val d = dir(outDir)
    val fs = fsFor(d)
    if (fs.isDirectory(d)) fs.delete(d, true)
  }
}
