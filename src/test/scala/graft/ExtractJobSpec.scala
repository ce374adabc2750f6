package graft

import graft.core._
import graft.gen.CorpusGen
import graft.oracle.RefOracle
import graft.pipeline.{Checkpoint, ExtractJob}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

class ExtractJobSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpDir(name: String): String = {
    val p = Files.createTempDirectory(s"graft-$name")
    deleteOnExitRec(p)
    p.toString
  }
  private def deleteOnExitRec(p: Path): Unit = p.toFile.deleteOnExit()

  private val N = 600

  private def oracleByDoc: Map[String, Seq[(String, String, String, Int)]] =
    CorpusGen.corpus(42L, N).map { d =>
      d.doc_id -> RefOracle.extract(d).outSpans
        .map(o => (o.kind, o.text, o.media_ref, o.order))
    }.toMap

  test("pipeline output matches oracle per-doc sequences (any partitioning)") {
    spark.sparkContext.setLogLevel("WARN")
    val out = tmpDir("e2e")
    val docs = CorpusGen.dataset(spark, N, 42L)
    val report = ExtractJob.run(spark, docs,
      ExtractJob.Config(out, runId = "t1", groups = 4, partitions = 16))
    assert(report.groupsRun == Seq(0, 1, 2, 3))
    assert(report.docsProcessed == N)

    val got = ExtractJob.spansView(spark, out).collect()
      .groupBy(_.getString(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(4)).toSeq
          .map(r => (r.getString(1), r.getString(2), r.getString(3),
                     r.getInt(4)))
      }
    val want = oracleByDoc
    // empty-output docs appear in `want` with empty seqs but not in `got`
    want.foreach { case (id, seq) =>
      assert(got.getOrElse(id, Seq.empty) == seq, s"mismatch for $id")
    }
    // and no SPURIOUS doc_ids either (output ⊆ oracle universe)
    assert(got.keySet.subsetOf(want.keySet))
  }

  test("runBucketed: physical bucket column prunes at the source, same output") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val in = tmpDir("bucketed-in")
    val groups = 4
    // lay the input out like the 10^12-doc deployment: the checkpoint
    // group is a PHYSICAL partition column of the input table
    CorpusGen.dataset(spark, N, 42L)
      .withColumn("bucket",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(col("doc_id")),
          org.apache.spark.sql.functions.lit(groups)).cast("int"))
      .write.partitionBy("bucket").mode("overwrite").parquet(in)
    val docs = spark.read.parquet(in)

    // the group filter the job applies must reach the scan as a
    // PartitionFilter (source pruning), not a post-scan Filter
    val gPlan = docs.withColumn("_group", col("bucket").cast("int"))
      .where(col("_group") === 2)
      .queryExecution.executedPlan.toString
    assert(gPlan.contains("PartitionFilters: [") &&
      gPlan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("bucket"),
      s"group filter did not prune:\n$gPlan")

    val out = tmpDir("bucketed-out")
    val report = ExtractJob.runBucketed(spark, docs,
      ExtractJob.Config(out, runId = "tb", groups = groups,
        partitions = 8), "bucket")
    assert(report.groupsRun == Seq(0, 1, 2, 3))
    assert(report.docsProcessed == N)
    // identical spans to the computed-hash run path
    val got = ExtractJob.spansView(spark, out).collect()
      .groupBy(_.getString(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(4)).toSeq
          .map(r => (r.getString(1), r.getString(2), r.getString(3),
                     r.getInt(4)))
      }
    oracleByDoc.foreach { case (id, seq) =>
      assert(got.getOrElse(id, Seq.empty) == seq, s"mismatch for $id")
    }
    assert(got.keySet.subsetOf(oracleByDoc.keySet))
  }

  test("runBucketed fails fast when bucket values exceed cfg.groups") {
    import spark.implicits._
    val in = tmpDir("bucketed-bad-in")
    // 8 physical buckets but a config expecting 4: buckets 4..7 would be
    // silently dropped by the group loop — the min/max probe must raise
    CorpusGen.dataset(spark, 64, 42L)
      .withColumn("bucket",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(col("doc_id")),
          org.apache.spark.sql.functions.lit(8)).cast("int"))
      .write.partitionBy("bucket").mode("overwrite").parquet(in)
    val docs = spark.read.parquet(in)
    val ex = intercept[IllegalArgumentException] {
      ExtractJob.runBucketed(spark, docs,
        ExtractJob.Config(tmpDir("bucketed-bad-out"), runId = "tbad",
          groups = 4, partitions = 8), "bucket")
    }
    assert(ex.getMessage.contains("silently dropped"))
  }

  test("resume recomputes exactly the missing group, no duplicates") {
    val out = tmpDir("resume")
    val docs = CorpusGen.dataset(spark, N, 42L)
    ExtractJob.run(spark, docs,
      ExtractJob.Config(out, runId = "r1", groups = 4, partitions = 8))
    val before = ExtractJob.spansView(spark, out).count()

    // simulate a lost group commit
    Files.delete(java.nio.file.Paths.get(out, "_checkpoint", "group_2.json"))
    val report2 = ExtractJob.run(spark, docs,
      ExtractJob.Config(out, runId = "r2", groups = 4, partitions = 8))
    assert(report2.groupsRun == Seq(2))
    assert(report2.groupsSkipped == Seq(0, 1, 3))
    val after = ExtractJob.spansView(spark, out).count()
    assert(after == before, "re-run must not duplicate rows")

    // full re-run with all groups committed: nothing recomputed
    val report3 = ExtractJob.run(spark, docs,
      ExtractJob.Config(out, runId = "r3", groups = 4, partitions = 8))
    assert(report3.groupsRun.isEmpty)
    assert(ExtractJob.spansView(spark, out).count() == before)
  }

  test("partitioning independence: 2 vs 32 partitions give identical output") {
    val outA = tmpDir("p2"); val outB = tmpDir("p32")
    val docs = CorpusGen.dataset(spark, 300, 42L)
    ExtractJob.run(spark, docs,
      ExtractJob.Config(outA, runId = "a", groups = 2, partitions = 2))
    ExtractJob.run(spark, docs,
      ExtractJob.Config(outB, runId = "b", groups = 2, partitions = 32))
    val a = ExtractJob.spansView(spark, outA).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
                 r.getString(3), r.getInt(4))).sortBy(_.toString)
    val b = ExtractJob.spansView(spark, outB).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
                 r.getString(3), r.getInt(4))).sortBy(_.toString)
    assert(a.sameElements(b))
  }

  test("metrics sidecar: per-partition lineage rows cover all docs") {
    val out = tmpDir("metrics")
    val docs = CorpusGen.dataset(spark, 300, 42L)
    ExtractJob.run(spark, docs,
      ExtractJob.Config(out, runId = "m1", groups = 2, partitions = 8))
    val m = spark.read.json(s"$out/metrics")
    import org.apache.spark.sql.functions._
    val agg = m.agg(sum("doc_count"), sum("chunk_count"),
                    sum("out_span_count")).collect()(0)
    assert(agg.getLong(0) == 300)
    val chunkRows = ExtractJob.chunksView(spark, out).count()
    assert(agg.getLong(1) == chunkRows)
    assert(agg.getLong(2) == ExtractJob.spansView(spark, out).count())
    assert(m.select("status").distinct().collect()
      .map(_.getString(0)).toSet == Set("committed"))
  }

  test("chunks view matches oracle chunks (document_chunks semantics)") {
    val out = tmpDir("chunks")
    val docs = CorpusGen.dataset(spark, 300, 42L)
    ExtractJob.run(spark, docs,
      ExtractJob.Config(out, runId = "c1", groups = 2, partitions = 8))
    val got = ExtractJob.chunksView(spark, out).collect().map { r =>
      Chunk(r.getString(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getDouble(9))
    }.groupBy(_.doc_id)
    CorpusGen.corpus(42L, 300).foreach { d =>
      val want = RefOracle.extract(d).chunks
      val g = got.getOrElse(d.doc_id, Array.empty[Chunk])
        .sortBy(_.chunk_n).toSeq
      assert(g == want, s"chunks mismatch for ${d.doc_id}")
    }
  }


  test("chunks view carries P13 extracted_at (reference DEFAULT semantics)") {
    val out = tmpDir("p13")
    val t0 = new java.sql.Timestamp(System.currentTimeMillis() - 1000)
    ExtractJob.run(spark, CorpusGen.dataset(spark, 50, 42L),
      ExtractJob.Config(out, runId = "p", groups = 1, partitions = 4))
    val cv = ExtractJob.chunksView(spark, out)
    assert(cv.schema.fieldNames.last == "extracted_at")
    val ts = cv.select("extracted_at").collect().map(_.getTimestamp(0))
    val t1 = new java.sql.Timestamp(System.currentTimeMillis() + 1000)
    assert(ts.nonEmpty && ts.forall(t => !t.before(t0) && !t.after(t1)))
  }

  test("reused runId with remaining new docs fails fast (ADVICE r01)") {
    val out = tmpDir("reuse")
    ExtractJob.runIncremental(spark, CorpusGen.dataset(spark, 100, 42L),
      ExtractJob.Config(out, runId = "w1", groups = 2, partitions = 4))
    // same runId, grown input: the run=w1 manifest is fully committed, so
    // every group would silently skip — must throw instead
    val e = intercept[IllegalStateException] {
      ExtractJob.runIncremental(spark, CorpusGen.dataset(spark, 200, 42L),
        ExtractJob.Config(out, runId = "w1", groups = 2, partitions = 4))
    }
    assert(e.getMessage.contains("fresh runId"))
    // fresh runId proceeds normally
    val r2 = ExtractJob.runIncremental(spark, CorpusGen.dataset(spark, 200, 42L),
      ExtractJob.Config(out, runId = "w2", groups = 2, partitions = 4))
    assert(r2.docsProcessed >= 100)
  }

  test("crash-resume with ORPHANED group data (write landed, commit lost) loses nothing") {
    val out = tmpDir("incr-resume")
    val docs = CorpusGen.dataset(spark, 100, 42L)
    ExtractJob.runIncremental(spark, docs,
      ExtractJob.Config(out, runId = "w1", groups = 2, partitions = 4))
    val complete = ExtractJob.readAllRuns(spark, out).count()
    // crash between overwriteGroup and commitGroup: group 1's parquet
    // files exist but the manifest entry does not. Committed-only reads
    // must make the orphan invisible (else the anti-join would count its
    // docs as processed and the re-run would overwrite the group with an
    // EMPTY write — silent data loss)
    val runDir = s"$out/run=w1"
    Files.delete(java.nio.file.Paths.get(runDir, "_checkpoint", "group_1.json"))
    val visible = ExtractJob.readAllRuns(spark, out).count()
    assert(visible < complete, "orphaned group data must be invisible")
    // same runId + same input: survivors all hash into the UNcommitted
    // group → guard must not trip; group 1 recomputes over its FULL docs
    val r = ExtractJob.runIncremental(spark, docs,
      ExtractJob.Config(out, runId = "w1", groups = 2, partitions = 4))
    assert(r.groupsRun == Seq(1) && r.groupsSkipped == Seq(0))
    val after = ExtractJob.readAllRuns(spark, out)
    assert(after.count() == complete, "resume must restore the full output")
    assert(after.groupBy("doc_id", "order").count()
      .where(col("count") > 1).count() == 0)
  }

  test("adaptive skew salting: monster doc triggers it, uniform corpus skips it") {
    import spark.implicits._
    val uniform = CorpusGen.dataset(spark, 200, 42L)
      .filter(d => d.doc_id != "doc_00000000") // drop nothing important
    // uniform corpus at default thresholds: small docs, no monster
    val outA = tmpDir("saltA")
    val repA = ExtractJob.run(spark, uniform,
      ExtractJob.Config(outA, "sa", groups = 1, partitions = 8,
        bigDocBytes = 1L << 20))
    // one 2MB single-span monster forces the decision on
    val monster = Seq(InputDoc("monster",
      Vector(Span("text", "x" * (2 << 20), null, 0)))).toDS()
    val outB = tmpDir("saltB")
    val repB = ExtractJob.run(spark, uniform.union(monster),
      ExtractJob.Config(outB, "sb", groups = 1, partitions = 8,
        bigDocBytes = 1L << 20))
    assert(repB.salted, "monster doc must trigger salting")
    // and the monster's row must still come through intact
    val got = ExtractJob.spansView(spark, outB)
      .where(col("doc_id") === "monster").collect()
    assert(got.length == 1 && got(0).getString(2).length == (2 << 20))
  }


  test("salting decision from a bounded sample when input exceeds the cap") {
    import spark.implicits._
    // 12 input partitions > skewSampleParts=2 → the stride-sampled path
    // decides from every-6th partition (2 kept). Uniform corpus: OFF
    // (the partition-fraction-scaled total keeps fair-share relative
    // skew honest); every-3rd-doc-big corpus: ON (round-robin
    // repartition spreads the big docs densely, so every kept
    // partition contains them with certainty at these proportions).
    val uniform = CorpusGen.dataset(spark, 300, 7L).repartition(12)
      .as[core.InputDoc]
    val repA = ExtractJob.run(spark, uniform,
      ExtractJob.Config(tmpDir("sampA"), "pa", groups = 1, partitions = 8,
        skewSampleParts = 2))
    assert(!repA.salted, "uniform corpus must not salt under sampling")
    val skewed = spark.createDataset((0 until 300).map(i =>
      core.InputDoc(f"s$i%04d", Vector(core.Span("text",
        (if (i % 3 == 0) "x" * 65536 else "y" * 100), null, 0)))))
      .repartition(12).as[core.InputDoc]
    val repB = ExtractJob.run(spark, skewed,
      ExtractJob.Config(tmpDir("sampB"), "pb", groups = 1, partitions = 8,
        bigDocBytes = 32768, skewSampleParts = 2))
    assert(repB.salted, "sampled stats must detect the big-doc corpus")
  }

  test("incremental ingestion: grown input table re-extracts ONLY new docs") {
    val out = tmpDir("incr")
    // wave 1: docs [0, 300)
    val r1 = ExtractJob.runIncremental(spark, CorpusGen.dataset(spark, 300, 42L),
      ExtractJob.Config(out, runId = "w1", groups = 2, partitions = 8))
    assert(r1.docsProcessed == 300)
    val count1 = ExtractJob.readAllRuns(spark, out).count()

    // the table GROWS to 500 docs (superset); a fresh incremental run
    // must process exactly the 200 new ones — group-level resume alone
    // would wrongly skip them (their groups are committed)
    val r2 = ExtractJob.runIncremental(spark, CorpusGen.dataset(spark, 500, 42L),
      ExtractJob.Config(out, runId = "w2", groups = 2, partitions = 8))
    // empty-output docs re-extract harmlessly (never appear in output)
    assert(r2.docsProcessed >= 200 && r2.docsProcessed <= 210,
      s"processed ${r2.docsProcessed}")

    val all = ExtractJob.readAllRuns(spark, out)
    // no duplicates across runs
    assert(all.groupBy("doc_id", "order").count()
      .where(col("count") > 1).count() == 0)
    // full content equality vs oracle over all 500 docs
    val got = all.select("doc_id", "kind", "text", "media_ref", "order")
      .collect().groupBy(_.getString(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getInt(4)).toSeq
        .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getInt(4))) }
    CorpusGen.corpus(42L, 500).foreach { d =>
      val want = RefOracle.extract(d).outSpans
        .map(o => (o.kind, o.text, o.media_ref, o.order))
      assert(got.getOrElse(d.doc_id, Seq.empty) == want, d.doc_id)
    }

    // idempotence: re-running wave-2 unchanged processes ~nothing new
    val r3 = ExtractJob.runIncremental(spark, CorpusGen.dataset(spark, 500, 42L),
      ExtractJob.Config(out, runId = "w3", groups = 2, partitions = 8))
    assert(r3.docsProcessed <= 10) // only the persistent empty-output docs
    assert(ExtractJob.readAllRuns(spark, out).count() == all.count())
  }

  test("incremental delta plan: payload re-join is a broadcast left-semi, no payload shuffle") {
    val out = tmpDir("incr-plan")
    ExtractJob.runIncremental(spark, CorpusGen.dataset(spark, 100, 7L),
      ExtractJob.Config(out, runId = "p1", groups = 2, partitions = 8))
    val grown = CorpusGen.dataset(spark, 160, 7L)
    val delta = ExtractJob.incrementalDelta(spark, grown, out)
    val plan = delta.queryExecution.executedPlan.toString
    // the delta ids broadcast back onto the payload scan …
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan)
    // … and the payload side never hash-shuffles (the id-only anti-join
    // ran eagerly inside incrementalDelta; this final plan is the only
    // one that touches spans)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // semantics unchanged: every genuinely new doc survives, and any
    // re-extracted survivor is an empty-output doc
    val ids = delta.select("doc_id").collect().map(_.getString(0)).toSet
    val wave1 = CorpusGen.corpus(7L, 100).map(d => d.doc_id).toSet
    val all = CorpusGen.corpus(7L, 160)
    val newIds = all.map(_.doc_id).filterNot(wave1).toSet
    assert(newIds.subsetOf(ids))
    val reextracted = ids -- newIds
    all.filter(d => reextracted.contains(d.doc_id)).foreach { d =>
      assert(RefOracle.extract(d).outSpans.isEmpty, d.doc_id)
    }
  }

  private implicit class ChunkN(c: Chunk) {
    def chunk_n: Int = c.chunk_id.substring(c.chunk_id.lastIndexOf('c') + 1).toInt
  }
}
