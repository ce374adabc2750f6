package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Partition(group)-level checkpoint manifest — the distributed
  * generalization of the reference's incremental anti-join resume
  * (/root/reference/setup.sql:222): instead of `doc NOT IN (processed)`,
  * whole doc-groups are committed atomically and skipped on re-run.
  *
  * Layout: `<outDir>/_checkpoint/group_<g>.json`, written via
  * temp-file + atomic rename (same directory ⇒ same filesystem). A group's
  * data lives under `<outDir>/data/group=<g>/` written with
  * mode=overwrite, so a crashed group re-runs cleanly with no duplicates
  * (exactly-once per group).
  *
  * In-sandbox this is plain-filesystem; the production deployment swaps in
  * Iceberg table commits (SURVEY.md §7.1) — the pipeline code is agnostic.
  */
object Checkpoint {

  private def dir(outDir: String): Path = Paths.get(outDir, "_checkpoint")

  def committedGroups(outDir: String): Set[Int] = {
    val d = dir(outDir)
    if (!Files.isDirectory(d)) return Set.empty
    Files.list(d).iterator.asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("group_") && s.endsWith(".json") =>
        s.stripPrefix("group_").stripSuffix(".json").toInt }
      .toSet
  }

  def commitGroup(outDir: String, group: Int, runId: String,
                  docCount: Long, durationMs: Long): Unit = {
    val d = dir(outDir)
    Files.createDirectories(d)
    val body =
      s"""{"group":$group,"run_id":"$runId","doc_count":$docCount,"duration_ms":$durationMs}"""
    val tmp = d.resolve(s".group_$group.json.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, d.resolve(s"group_$group.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def clear(outDir: String): Unit = {
    val d = dir(outDir)
    if (Files.isDirectory(d))
      Files.list(d).iterator.asScala.toList.foreach(Files.deleteIfExists(_))
  }
}
