package graft.pipeline

import graft.core._
import graft.extract.Extractor
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator
import scala.jdk.CollectionConverters._

/** The extraction pipeline: one distributed `mapPartitions` stage over the
  * interleaved spans table — the Spark replacement for the reference's
  * sequential per-document cursor loop (/root/reference/setup.sql:225-260),
  * which bounds the reference at ~1/30–1/60 doc/s per CALL regardless of
  * warehouse size (README.md:268).
  *
  * Scale design (SURVEY.md §4):
  *  - NO shuffle in the hot path except the skew-salting repartition;
  *    extraction is embarrassingly parallel per document, ordering is
  *    computed in-memory per doc (the reference's ROW_NUMBER window
  *    degenerates to a local index).
  *  - SKEW: a cheap cost proxy (`sum(length(span.text))`, computed as a
  *    codegen'd Catalyst `aggregate`) routes pathological docs to their
  *    own hash space; normal docs hash-partition uniformly. One giant doc
  *    occupies one task that the scheduler backfills around.
  *  - CHECKPOINT/RESUME: docs are bucketed by `xxhash64(doc_id)` into
  *    `groups` sequential sub-jobs; each group's output directory is
  *    written with overwrite semantics and committed to the manifest
  *    atomically ([[Checkpoint]]) — exactly-once per group, idempotent
  *    re-runs. At 10^12 docs, `groups` bounds the blast radius of a
  *    failure to 1/groups of the input.
  *  - METRICS/LINEAGE: each task appends a [[PartitionMetrics]] row via an
  *    accumulator; the driver dedupes retries (keeps the max attempt) and
  *    writes the sidecar table.
  */
object ExtractJob {

  /** Incremental-delta broadcast threshold (ids, ~tens of bytes each —
    * 5M ids ≈ a few hundred MB peak on the driver, inside the default
    * broadcast comfort zone). Above it the semi-join falls back to a
    * shuffle, which is never worse than the direct anti-join it
    * replaced.
    */
  private val BroadcastDeltaCap = 5000000L

  case class Config(
    outDir: String,
    runId: String = "run",
    groups: Int = 8,               // checkpoint granularity
    partitions: Int = 0,           // 0 = 4 x defaultParallelism
    bigDocBytes: Long = 1L << 20,  // cost-proxy threshold for skew isolation
    salting: String = "auto",      // "on" | "off" | "auto" (sampled decision)
    skewSampleParts: Int = 8,      // auto decision reads ≤ ~2x this many input partitions
    io: graft.sources.TableIO = null) { // default: HadoopTableIO(outDir)
    def tableIO: graft.sources.TableIO =
      if (io != null) io else graft.sources.HadoopTableIO(outDir)
  }

  case class RunReport(runId: String, groupsRun: Seq[Int],
                       groupsSkipped: Seq[Int], docsProcessed: Long,
                       elapsedMs: Long, salted: Boolean)

  /** Extract an iterator of docs, streaming (iterator-to-iterator — no
    * partition materialization), recording per-partition metrics.
    */
  private def extractPartition(
      docs: Iterator[InputDoc], group: Int, runId: String,
      acc: CollectionAccumulator[PartitionMetrics])
      : Iterator[ExtractedRow] = {
    val tc = TaskContext.get()
    val t0 = System.nanoTime()
    var nDocs = 0L; var nSpans = 0L; var nOut = 0L; var nChunks = 0L
    var nText = 0L; var nMedia = 0L; var bytesIn = 0L
    new Iterator[ExtractedRow] {
      private var cur: Iterator[ExtractedRow] = Iterator.empty
      private var done = false
      override def hasNext: Boolean = {
        while (!cur.hasNext && docs.hasNext) {
          val d = docs.next()
          nDocs += 1
          if (d.spans != null) {
            nSpans += d.spans.size
            d.spans.foreach(s => if (s.text != null) bytesIn += s.text.length)
          }
          val rows = Extractor.extractRows(d)
          nOut += rows.size
          rows.foreach { r =>
            if (r.chunk_id != null) nChunks += 1
            if (r.kind == "text") nText += 1
            if (ExtractionSpec.MediaKinds(r.kind)) nMedia += 1
          }
          cur = rows.iterator
        }
        val h = cur.hasNext
        if (!h && !done) {
          done = true
          acc.add(PartitionMetrics(runId, group,
            if (tc == null) -1 else tc.partitionId(),
            if (tc == null) -1L else tc.taskAttemptId(),
            nDocs, nSpans, nOut, nChunks, nText, nMedia, bytesIn,
            (System.nanoTime() - t0) / 1000000L, "committed"))
        }
        h
      }
      override def next(): ExtractedRow = cur.next()
    }
  }

  def run(spark: SparkSession, docs: Dataset[InputDoc], cfg: Config)
      : RunReport =
    // group = pmod(xxhash64(doc_id), groups), computed in the scan. NOTE
    // the per-group filter below cannot prune a computed column, so the
    // `groups` sub-jobs together re-read the input `groups` times — fine
    // at bench scale, NOT at 10^12 docs; there, lay the table out with a
    // physical bucket column and use [[runBucketed]].
    runImpl(spark, docs.toDF().withColumn("_group",
      pmod(xxhash64(col("doc_id")), lit(cfg.groups)).cast("int")), cfg)

  /** [[run]] over an input whose PHYSICAL layout already carries the
    * checkpoint group (parquet `partitionBy(bucketCol)` or an Iceberg
    * `bucket(groups, …)` partition spec, values integers in
    * [0, cfg.groups)): the per-group filter becomes a source-level
    * partition filter (`PartitionFilters` in the scan — asserted in
    * ExtractJobSpec), so all `groups` sub-jobs together read the table
    * ONCE instead of `groups` times. This is the 10^12-doc deployment
    * shape; semantics (checkpoint, resume, salting, metrics, output)
    * are identical to [[run]].
    *
    * CONTRACT: bucket values must lie in [0, cfg.groups) — the group
    * loop only visits 0..groups-1, so out-of-range values would be
    * silently skipped. Enforced by a min/max probe before the loop: on a
    * `partitionBy(bucketCol)` parquet layout (or an Iceberg bucket spec)
    * that aggregate is answered from partition values / column stats,
    * not a data pass, so failing FAST beats the r03 contract of
    * "compare docsProcessed yourself afterwards" (VERDICT r03 #4).
    */
  def runBucketed(spark: SparkSession, docs: DataFrame, cfg: Config,
                  bucketCol: String): RunReport = {
    val grouped = docs.withColumn("_group", col(bucketCol).cast("int"))
    val mm = grouped.agg(min(col("_group")), max(col("_group"))).head()
    if (!mm.isNullAt(0)) {
      val lo = mm.getInt(0); val hi = mm.getInt(1)
      require(lo >= 0 && hi < cfg.groups,
        s"runBucketed: bucket column '$bucketCol' has values in [$lo, $hi]" +
          s" but cfg.groups=${cfg.groups} only processes [0, ${cfg.groups})" +
          " — docs would be silently dropped")
    }
    runImpl(spark, grouped, cfg)
  }

  private def runImpl(spark: SparkSession, grouped: DataFrame, cfg: Config)
      : RunReport = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val nPart = if (cfg.partitions > 0) cfg.partitions
                else spark.sparkContext.defaultParallelism * 4
    val committed = Checkpoint.committedGroups(cfg.outDir)
    val acc = new CollectionAccumulator[PartitionMetrics]
    spark.sparkContext.register(acc, "graft.extract.metrics")

    // skew cost proxy, a codegen'd column expr — no data pass beyond the
    // scan itself. cost proxy = payload bytes via octet_length (O(1) per
    // span — byte count off the UTF8 buffer, unlike length() which scans
    // for chars); catches both many-span and single-giant-span docs
    val withGroup = grouped
      .withColumn("_cost",
        coalesce(aggregate(col("spans"), lit(0L),
          (a, s) => a + coalesce(octet_length(s.getField("text")).cast("long"),
                                 lit(0L))), lit(0L)))

    var docsProcessed = 0L
    val groupsRun = Seq.newBuilder[Int]
    val groupsSkipped = Seq.newBuilder[Int]

    // salting decision: the repartition shuffle moves the full payload —
    // worth it iff the cost distribution is skewed RELATIVE TO a
    // partition's fair share (one doc ≥ 25% of a partition, or over the
    // absolute big-doc threshold). The expensive part of the stats pass
    // is _cost itself (octet_length over every span payload), so it is
    // BOUNDED (VERDICT r04 #3) in PARTITION units — a scan partition is
    // byte-bounded by the split config (maxPartitionBytes), so touching
    // ≤ ~2x skewSampleParts evenly-spaced partitions bounds decision
    // I/O in bytes with NO separate row-count job (r06 second pass: the
    // previous row-bounded design spent a count() job + a 13-partition
    // sample job ≈ 0.6 s of every run — ~17% of the whole bench job —
    // and the sample job's wall time was a fixed cost that did not
    // scale with cores, dragging measured scaling efficiency). The
    // total is scaled back up by the kept-partition fraction. A lone
    // monster doc can evade a sample; the miss cost is one straggler
    // task on the NARROW path, strictly cheaper than the full-payload
    // shuffle a false "on" would buy at 10^12 docs. In an Iceberg
    // deployment the exact max/sum come free from table column stats
    // instead. Skipped entirely when every group is already committed —
    // a no-op resume must not pay any input scan (report.salted is then
    // false).
    // BEHAVIOR DELTA vs the pre-r06.2 row-bounded design (deliberate):
    // inputs of ≤100k rows spread over many partitions (e.g. a
    // file-per-doc binaryFile source) used to get an EXACT decision at
    // the cost of a full extra payload pass per run; they now get the
    // same bounded sample as everything else. A missed monster costs
    // one straggler task on the narrow path (after mergeDown it may
    // share that task with its coalesce neighbors); the removed full
    // pre-pass was the strictly larger cost at every corpus size. The
    // partition-fraction total extrapolation can also drift when
    // bytes-per-partition vary — the 4x fair-share margin and the
    // absolute bigDocBytes threshold absorb that; both miss directions
    // degrade to known, bounded shapes (a straggler, or one
    // payload-shuffle that wasn't needed).
    // one narrow projection serves both the decision sample and the
    // partition-count probes (partition count is projection-invariant);
    // planning it once avoids a second full-plan-to-RDD conversion
    lazy val costsRdd = withGroup.select(col("_cost")).rdd
    lazy val srcParts = costsRdd.getNumPartitions
    def skewDecision(mx: Long, total: Long): Boolean = {
      val fairShare = math.max(total / math.max(nPart, 1), 1L)
      mx >= cfg.bigDocBytes || mx >= fairShare / 4
    }
    val anyToRun = (0 until cfg.groups).exists(g => !committed.contains(g))
    val useSalt = anyToRun && (cfg.salting match {
      case "on"  => true
      case "off" => false
      case _ =>
        val p = math.max(1, cfg.skewSampleParts)
        val k = srcParts / p // evenly-spaced stride; 0 handled below
        if (k <= 1) {
          // few input partitions (test corpora, resumes of small
          // groups): one exact aggregate over everything. NOTE this is
          // a PARTITION-count gate, not a row bound — a caller can
          // shuffle a huge input into few partitions and land here
          // paying a full payload pass (exactly what the pre-r06
          // k>=srcN fallback paid too)
          val s = withGroup.agg(max("_cost"), sum("_cost")).collect()(0)
          !s.isNullAt(0) && skewDecision(s.getLong(0), s.getLong(1))
        } else {
          // PartitionPruningRDD: launch ONLY the kept partitions'
          // tasks (a mapPartitionsWithIndex formulation would still
          // dispatch one no-op task per skipped partition); unpulled
          // partition iterators never open their files (FileScanRDD
          // opens lazily on first pull), so the skipped partitions'
          // payloads are never read
          val keptN = (srcParts + k - 1) / k // |{i : i % k == 0}|
          val kept = org.apache.spark.rdd.PartitionPruningRDD.create(
            costsRdd, i => i % k == 0)
          val (mx, tot, cnt) = kept
            .map(_.getLong(0))
            .aggregate((0L, 0L, 0L))(
              { case ((m, t, c), v) => (math.max(m, v), t + v, c + 1) },
              { case ((m1, t1, c1), (m2, t2, c2)) =>
                (math.max(m1, m2), t1 + t2, c1 + c2) })
          cnt > 0 &&
            skewDecision(mx, (tot * (srcParts.toDouble / keptN)).toLong)
        }
    })

    // small-file sources (a binaryFile directory scan) can arrive with
    // ONE partition per file — that many write tasks each paying a
    // parquet-writer init (measured: 40k tiny partitions turned a 30s
    // ingest into 170s). When the source partitioning is pathological
    // relative to the configured parallelism, merge with a NARROW
    // coalesce (no shuffle; skewed inputs take the salted repartition
    // path instead, which the auto decision already detects).
    val mergeDown = !useSalt && srcParts > nPart * 4

    (0 until cfg.groups).foreach { g =>
      if (committed.contains(g)) groupsSkipped += g
      else {
        val gT0 = System.currentTimeMillis()
        val gDocs = withGroup.filter(col("_group") === g)
        // skew isolation: big docs get the full 64-bit hash (≈ singleton
        // partitions among nPart); normal docs hash into [0, nPart)
        val salted = (if (useSalt)
          gDocs.withColumn("_salt",
              when(col("_cost") >= cfg.bigDocBytes,
                   xxhash64(col("doc_id"), lit(1)))
                .otherwise(pmod(xxhash64(col("doc_id")), lit(nPart))))
            .repartition(nPart, col("_salt"))
          else if (mergeDown) gDocs.coalesce(nPart)
          else gDocs)
          .select("doc_id", "spans").as[InputDoc]
        val out = salted.mapPartitions(it =>
          extractPartition(it, g, cfg.runId, acc))
        cfg.tableIO.overwriteGroup(out.toDF(), g)
        val gDocCount = {
          // metrics rows for this group (accumulator is cumulative)
          val rows = acc.value.asScala.filter(_.group == g)
          rows.groupBy(_.partition_id)
            .map(_._2.maxBy(_.task_attempt).doc_count).sum
        }
        docsProcessed += gDocCount
        Checkpoint.commitGroup(cfg.outDir, g, cfg.runId, gDocCount,
          System.currentTimeMillis() - gT0)
        groupsRun += g
      }
    }

    // metrics sidecar: dedupe task retries (keep max attempt per partition),
    // written driver-side as JSONL (one row per task partition — tiny; a
    // Spark write job here would add a serial stage to every run). Read it
    // back as a table with spark.read.json.
    val metrics = acc.value.asScala
      .groupBy(m => (m.group, m.partition_id))
      .map(_._2.maxBy(_.task_attempt)).toSeq
      .sortBy(m => (m.group, m.partition_id))
    if (metrics.nonEmpty) {
      val dir = new org.apache.hadoop.fs.Path(cfg.outDir, "metrics")
      val fs = dir.getFileSystem(Checkpoint.hadoopConf())
      fs.mkdirs(dir)
      def esc(s: String): String =
        s.replace("\\", "\\\\").replace("\"", "\\\"")
      val body = metrics.map { m =>
        s"""{"run_id":"${esc(m.run_id)}","group":${m.group},""" +
        s""""partition_id":${m.partition_id},"task_attempt":${m.task_attempt},""" +
        s""""doc_count":${m.doc_count},"span_count":${m.span_count},""" +
        s""""out_span_count":${m.out_span_count},"chunk_count":${m.chunk_count},""" +
        s""""text_spans":${m.text_spans},"media_spans":${m.media_spans},""" +
        s""""bytes_in":${m.bytes_in},"duration_ms":${m.duration_ms},""" +
        s""""status":"${m.status}"}"""
      }.mkString("", "\n", "\n")
      val f = new org.apache.hadoop.fs.Path(dir,
        s"${cfg.runId}-${System.currentTimeMillis()}.jsonl")
      val out = fs.create(f, true)
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    RunReport(cfg.runId, groupsRun.result(), groupsSkipped.result(),
      docsProcessed, System.currentTimeMillis() - t0, useSalt)
  }

  /** Read back the unified output table (all committed groups). */
  def readOutput(spark: SparkSession, outDir: String): Dataset[ExtractedRow] = {
    import spark.implicits._
    spark.read.parquet(s"$outDir/data")
      .drop("group")
      .as[ExtractedRow]
  }

  /** The `spans` view — the correctness-invariant columns. */
  def spansView(spark: SparkSession, outDir: String) =
    readOutput(spark, outDir)
      .select("doc_id", "kind", "text", "media_ref", "order")

  /** The `chunks` view ≅ reference document_chunks (setup.sql:109-124)
    * incl. the P13 `extracted_at` column, filled like the reference's
    * DEFAULT CURRENT_TIMESTAMP (setup.sql:123) at view materialization.
    * (The driver-oracled ex_chunks query in [[graft.SparkEntry]] uses a
    * deterministic base+chunk_n variant instead so it can be hashed.)
    */
  def chunksView(spark: SparkSession, outDir: String) =
    readOutput(spark, outDir).where(col("chunk_id").isNotNull)
      .select(col("chunk_id"), col("doc_id"), col("page"), col("text"),
        col("bbox_x0"), col("bbox_y0"), col("bbox_x1"), col("bbox_y1"),
        col("page_width"), col("page_height"))
      .withColumn("extracted_at", current_timestamp())

  /** `group` is pmod(xxhash64(doc_id), groups) — recompute it driver-side
    * so a doc lookup prunes to ONE partition directory instead of
    * scanning all groups. At 10^12 docs this is the difference between
    * touching 1/groups of the table and touching all of it.
    */
  def groupOf(spark: SparkSession, docId: String, groups: Int): Int = {
    import spark.implicits._
    Seq(docId).toDF("doc_id")
      .select(pmod(xxhash64(col("doc_id")), lit(groups)).cast("int"))
      .collect()(0).getInt(0)
  }

  /** Q2 page-content query (streamlit_app.py:418-427) with partition
    * pruning + reading order.
    */
  def pageContent(spark: SparkSession, outDir: String, groups: Int,
                  docId: String, page: Int) = {
    val g = groupOf(spark, docId, groups)
    spark.read.parquet(s"$outDir/data")
      .where(col("group") === g && col("doc_id") === docId &&
             col("page") === page)
      .orderBy(col("bbox_y0").desc, col("bbox_x0").asc)
      .select("chunk_id", "text", "bbox_x0", "bbox_y0", "bbox_x1",
              "bbox_y1", "page_width", "page_height")
  }

  /** Incremental ingestion ≅ the reference's NOT-IN anti-join on the
    * processed set (/root/reference/setup.sql:222), at doc granularity:
    * group-level resume alone would wrongly SKIP new docs that hash into
    * an already-committed group when the input table has grown between
    * runs. Each incremental run gets its own run-scoped output subtree
    * (`<outDir>/run=<runId>/...`) with its own manifest, so within-run
    * crash/resume keeps the exactly-once-per-group contract, and
    * across-run dedup is the anti-join.
    *
    * SCALE SHAPE (the 10^12-doc consideration): a direct
    * `docs ⟕anti processed` sort-merge join would shuffle the ENTIRE
    * input table — spans payload included — on doc_id, i.e. move the
    * whole corpus once to discover a (typically small) delta. Instead
    * the delta is computed id-only (two column-pruned scans, 8-byte-ish
    * rows through the exchange), then joined BACK as a left-semi whose
    * delta side BROADCASTS when small (the normal incremental case) —
    * the payload never shuffles at all. A huge delta (first run on a
    * grown table) falls back to a shuffle semi-join, which is no worse
    * than the direct anti-join. The extra id-only pass over the input
    * is parquet-column-pruned here and metadata-served under Iceberg.
    */
  def runIncremental(spark: SparkSession, docs: Dataset[InputDoc],
                     cfg: Config): RunReport = {
    import spark.implicits._
    val runs = listRuns(cfg.outDir)
    val newDocs =
      if (runs.isEmpty) docs
      else incrementalDelta(spark, docs, cfg.outDir)
    val runDir = s"${cfg.outDir}/run=${cfg.runId}"
    // reused runId guard (ADVICE r01): if any anti-join survivor hashes
    // into a group this run's manifest has ALREADY committed, it would be
    // silently skipped (and re-running that group would overwrite the
    // committed output). A crashed run resumed with the SAME input never
    // trips this — its committed groups' docs were all written, so the
    // anti-join removed them; a survivor in a committed group can only
    // mean the input grew under a reused runId → fail fast.
    val committed = Checkpoint.committedGroups(runDir)
    if (committed.nonEmpty) {
      val clash = newDocs
        .select(pmod(xxhash64(col("doc_id")), lit(cfg.groups)).cast("int")
          .as("g"))
        .where(col("g").isin(committed.toSeq: _*))
        .limit(1).count() > 0
      if (clash)
        throw new IllegalStateException(
          s"runId '${cfg.runId}' has committed groups under $runDir but " +
          "the incremental input still has new docs hashing into them — " +
          "use a fresh runId (each incremental batch needs its own " +
          "run-scoped subtree)")
    }
    run(spark, newDocs, cfg.copy(outDir = runDir))
  }

  /** The not-yet-extracted subset of `docs`, payload-shuffle-free (the
    * scale shape documented on [[runIncremental]]): id-only anti-join
    * for the delta, eager localCheckpoint so the size probe and the
    * semi-join share one computation, broadcast back when the delta is
    * small. Docs with EMPTY output never appear in the output table
    * and so re-extract — harmless (they emit nothing) and keeps the
    * scan id-only.
    */
  private[graft] def incrementalDelta(spark: SparkSession,
      docs: Dataset[InputDoc], outDir: String): Dataset[InputDoc] = {
    import spark.implicits._
    val processed = readAllRuns(spark, outDir)
      .select("doc_id").distinct()
    val newIds = docs.select("doc_id").distinct()
      .join(processed, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val back =
      if (newIds.count() <= BroadcastDeltaCap)
        org.apache.spark.sql.functions.broadcast(newIds)
      else newIds
    docs.join(back, Seq("doc_id"), "left_semi").as[InputDoc]
  }

  private def listRuns(outDir: String): Seq[String] = {
    // Hadoop FileSystem so the run listing works on any cluster store
    // (VERDICT r01 #8), like the Checkpoint manifest
    val d = new org.apache.hadoop.fs.Path(outDir)
    val fs = d.getFileSystem(Checkpoint.hadoopConf())
    if (!fs.isDirectory(d)) Seq.empty
    else fs.listStatus(d).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("run="))
      .map(_.getPath.toString)
  }

  /** Union of all incremental runs' COMMITTED group outputs. Reading only
    * manifest-committed groups is what keeps crash-resume exactly-once:
    * data files whose group commit never landed are invisible here — so
    * the incremental anti-join does NOT treat their docs as processed,
    * the re-run recomputes that group in full, and the overwrite replaces
    * the orphaned files (previously, orphaned data counted as processed
    * and a same-runId resume overwrote the group with an empty write).
    * No runs / nothing committed → empty typed DataFrame.
    */
  def readAllRuns(spark: SparkSession, outDir: String) = {
    import spark.implicits._
    val dirs = for {
      r <- listRuns(outDir)
      g <- Checkpoint.committedGroups(r).toSeq.sorted
    } yield s"$r/data/group=$g"
    if (dirs.isEmpty) spark.emptyDataset[ExtractedRow].toDF()
    else spark.read.parquet(dirs: _*)
  }

}
