package graft.ml

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TableIO

/**
 * INCREMENTAL exact dedup — the ingest-time shape of [[Dedup.exact]] for a
 * pipeline that receives the corpus in batches (a production crawl ingests
 * continuously; re-running a full-corpus dedup per batch re-shuffles the
 * whole 100-TB history every day). Each batch is deduped against itself
 * (first occurrence per text, min id — [[Dedup.exact]]'s keep rule) and
 * against ALL previously ACCEPTED content, then its accepted rows are
 * appended to persisted state. The final corpus equals what the one-shot
 * [[Dedup.exact]] over the concatenated batches would keep, batch arrival
 * order deciding ties across batches (spec'd in IncrementalSpec).
 *
 * State layout — one BUCKETED stage per ingested batch
 * (`state_<batch>`, [[TableIO.bucketedStage]] on `h` = xxhash64(text)):
 *
 *  - the state side of every anti-join arrives pre-partitioned: bucketing
 *    on `h` satisfies the join's clustering requirement, so ONLY the new
 *    batch shuffles — accepted history never moves again (plan-asserted:
 *    no Exchange above the state scan). At 100 TB the state is the big
 *    side; this is the difference between an ingest that reads history
 *    and one that re-shuffles it.
 *  - ingest is APPEND-ONLY: a batch never rewrites earlier state
 *    (Iceberg-style — a snapshot is the set of batch stage dirs; resume
 *    and lineage ride the TableIO manifests like every other stage).
 *  - the raw text stays alongside `h`, and the join matches on BOTH
 *    (null-safe on text), so dedup is EXACT under hash collisions — same
 *    contract as [[Dedup.joinSpanStats]]; `h` exists to keep shuffle /
 *    bucket / sort comparisons on longs.
 *
 * Anti-join chaining: a batch is filtered through each prior stage in
 * sequence. Cost per ingest is O(batches) joins, each shuffle-free on the
 * state side; a long-running pipeline compacts (unions all `state_*`
 * stages into one bucketed stage and retires them) on the usual log-
 * structured schedule — compaction is just `bucketedStage(union)`, not a
 * new primitive, so it is left to the operator.
 *
 * NULL text is one content value (null-safe equality in the join,
 * `groupBy` already treats NULL as a group): a null-text row dedups
 * against earlier null-text rows instead of being re-accepted forever —
 * the [[Sketch]] null lesson applied here from the start.
 */
object Incremental {

  /** Stage-name prefix for accepted-batch state tables (exact dedup). */
  val StatePrefix = "state_"

  /** Stage-name prefixes for the near-dup (minhash) state: the banded
   *  signature index (probe side) and the accepted docs (refine side). */
  val NsigPrefix = "nsig_"
  val NdocPrefix = "ndoc_"

  /** Buckets for the state tables — a fixed layout every batch shares
   *  (bucketed joins require equal bucket counts on both staged sides). */
  val DefaultBuckets = 8

  /** Per-batch first occurrences: one row per distinct text with the kept
   *  (min) id and the in-batch duplicate count — [[Dedup.exact]] plus the
   *  long hash key the state layout buckets on. One shuffle, map-side
   *  combined. */
  def batchFirsts(batch: DataFrame, idCol: String, textCol: String): DataFrame =
    batch.groupBy(col(textCol).as("text"))
      .agg(min(col(idCol)).as("id"), count(lit(1)).as("n_dups"))
      .select(xxhash64(col("text")).as("h"), col("id"), col("text"), col("n_dups"))

  /** Completed state stages under `stateDir` with the given name prefix,
   *  in ingest order (stage names are listed from the filesystem, ordered
   *  by the zero-padded sequence number each batch gets on write). */
  def stateNames(stateDir: String, prefix: String = StatePrefix): Seq[String] = {
    val root = Paths.get(stateDir)
    if (!Files.isDirectory(root)) return Seq.empty
    // close the directory stream deterministically: stateNames runs on
    // every ingest of a long-running loop, and an unclosed Files.list
    // leaks a directory fd per call until GC
    val names = scala.util.Using.resource(Files.list(root)) { s =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith(prefix) && TableIO.isComplete(stateDir, n))
        .toSeq
    }
    names.sorted
  }

  /** Free a localCheckpoint'ed DataFrame's storage blocks: `Dataset
   *  .unpersist` only clears CacheManager entries, but an eager local
   *  checkpoint lives as persisted partitions of the RDD inside the
   *  resulting `LogicalRDD` leaf — unpersist THAT (the Components
   *  releaseResults lesson, applied to checkpointed Datasets). A later
   *  action on the released frame fails rather than silently recomputing
   *  (local checkpoints truncate lineage), so release only after every
   *  consumer has run — here: after the stage writes. */
  private def releaseCheckpoint(dfs: DataFrame*): Unit =
    dfs.filter(_ != null).foreach(_.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    })

  private def stateTable(spark: SparkSession, stateDir: String,
                         name: String, key: String = "h"): DataFrame =
    TableIO.bucketedStage(spark, stateDir, name, key, DefaultBuckets) {
      sys.error(s"state stage $name under $stateDir is incomplete — " +
        "it must have been written by a previous ingest")
    }

  /** Next stage sequence number: max existing + 1 (NOT the stage count —
   *  after [[compact]] retires stages, a count-derived number could collide
   *  with a surviving higher-numbered stage and silently resume it). */
  private def nextSeq(names: Seq[String], prefix: String = StatePrefix): Int =
    names.map(_.stripPrefix(prefix).takeWhile(_.isDigit).toInt)
      .foldLeft(-1)(math.max) + 1

  /**
   * Ingest one batch: returns (and persists) its accepted rows
   * `(h, id, text, n_dups)` — first occurrence per text within the batch,
   * text unseen in state. Idempotent with TableIO semantics: if this
   * batch name was already ingested, the staged result is returned without
   * recomputation (stages are deterministic pipeline steps; hand the same
   * name the same batch).
   */
  def ingestExact(spark: SparkSession, stateDir: String, batchName: String,
                  batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    require(batchName.nonEmpty && batchName.forall(c =>
        c.isLetterOrDigit || c == '-' || c == '.'),
      s"batch name must be [A-Za-z0-9.-]+: $batchName")
    require(!batchName.startsWith("compact"),
      s"batch names starting with 'compact' are reserved for [[compact]]: $batchName")
    val prior = stateNames(stateDir)
    prior.find(_.split("_", 3).last == batchName) match {
      case Some(existing) => return stateTable(spark, stateDir, existing)
      case None => ()
    }
    Files.createDirectories(Paths.get(stateDir))
    val name = f"$StatePrefix${nextSeq(prior)}%06d_$batchName"
    val firsts = batchFirsts(batch, idCol, textCol)
    val survivors = prior.foldLeft(firsts) { (acc, st) =>
      val state = stateTable(spark, stateDir, st)
        .select(col("h").as("s_h"), col("text").as("s_text"))
      acc.join(state,
        acc("h") === state("s_h") && acc("text") <=> state("s_text"),
        "left_anti")
    }
    // the join keys are (h, text) but the state is bucketed on h alone (h
    // already co-locates every equal-(h, text) pair; text is the collision-
    // exactness refinement, not a distribution key) — Spark's default
    // requireAllClusterKeysForCoPartition=true would reject the subset
    // co-partitioning, re-shuffle BOTH sides and disable the bucketed scan,
    // which is precisely the history re-shuffle this layout exists to avoid.
    // Relax it for the ingest (planning happens inside the stage write
    // below, so the previous value is restored before returning).
    val kReq = "spark.sql.requireAllClusterKeysForCoPartition"
    val prev = spark.conf.get(kReq)
    spark.conf.set(kReq, "false")
    try TableIO.bucketedStage(spark, stateDir, name, "h", DefaultBuckets) { survivors }
    finally spark.conf.set(kReq, prev)
  }

  /** The accepted corpus so far — the union of every batch's state stage
   *  (what a one-shot [[Dedup.exact]] over all ingested rows would keep,
   *  with cross-batch ties resolved by arrival order). */
  def accepted(spark: SparkSession, stateDir: String): DataFrame = {
    val names = stateNames(stateDir)
    require(names.nonEmpty, s"no completed state stages under $stateDir")
    names.map(stateTable(spark, stateDir, _)).reduce(_ unionByName _)
  }

  /**
   * Incremental NEAR-dup dedup — [[ingestExact]]'s minhash twin: each batch
   * is near-dup-filtered against itself and against all previously accepted
   * content, using the same banding + exact-Jaccard-refine machinery as the
   * batch operators ([[Dedup.minhashCandidates]] / [[Dedup.jaccardRefine]]).
   *
   * Pinned semantics (deterministic, oracle-able):
   *  - in-batch: a doc is rejected when a banding candidate with a SMALLER
   *    id in the same batch refines to Jaccard >= `threshold` — whether or
   *    not that partner is itself accepted (aggressive first-wins, NOT
   *    leader clustering: if A~B and B~C but A!~C, both B and C drop; the
   *    batch family's `dupClusters` is the clustering semantics when
   *    transitive grouping is wanted);
   *  - cross-batch: a surviving doc is rejected when any ACCEPTED doc from
   *    an earlier batch is a banding candidate refining to >= `threshold`.
   *
   * State per batch, both TableIO-bucketed:
   *  - `nsig_<seq>_<batch>` (doc_id, band, band_key) bucketed on band_key —
   *    the banded signature index the new batch PROBES; the state side of
   *    the probe join arrives pre-partitioned (subset co-partitioning on
   *    band_key), so the signature history never re-shuffles;
   *  - `ndoc_<seq>_<batch>` (doc_id, text) bucketed on doc_id — the refine
   *    side. Accepted TEXT is fetched ONLY for candidate partners (a
   *    doc_id semi-join against the bucketed table): the state's text is
   *    never rescanned wholesale, which is the difference between probing
   *    an index and re-reading 100 TB of history per batch.
   *
   * CONTRACT: doc ids must be unique ACROSS batches, not just within one —
   * the refine input unions accepted-state partner rows with the new batch
   * keyed by doc_id alone, so a cross-batch id collision would merge two
   * different texts' shingles under one id and corrupt the computed
   * Jaccard sizes/intersections (the same global-uniqueness assumption
   * [[ingestPack]] enforces via its monotonic-id require; here the id
   * space is the caller's to govern — crawl pipelines key by content hash
   * or snapshot-prefixed ids).
   *
   * The signature index is ~4 small rows per accepted doc; `maxBucket`
   * carries the usual banding discriminativeness cap. Crash between the
   * two stage writes resumes cleanly: the batch is keyed by name, both
   * stages are individually idempotent, and an orphan half is completed on
   * re-ingest (the stage suffix is reconstructed from the existing half).
   * That recovery is ENFORCED, not just documented: ingesting a DIFFERENT
   * batch while another batch's half-completed state exists fails loudly
   * (an orphan ndoc_ without its nsig_ would silently exempt its docs from
   * every later batch's near-dup check). Returns the accepted
   * (doc_id, text) table.
   */
  def ingestMinhash(spark: SparkSession, stateDir: String, batchName: String,
                    batch: DataFrame, idCol: String, textCol: String,
                    threshold: Double, shingleN: Int = 3,
                    maxBucket: Option[Int] = None): DataFrame = {
    require(batchName.nonEmpty && batchName.forall(c =>
        c.isLetterOrDigit || c == '-' || c == '.'),
      s"batch name must be [A-Za-z0-9.-]+: $batchName")
    val ndocPrior = stateNames(stateDir, NdocPrefix)
    val nsigPrior = stateNames(stateDir, NsigPrefix)
    def batchOf(n: String) = n.split("_", 3).last
    val ownSuffix = ndocPrior.find(n => batchOf(n) == batchName)
      .map(_.stripPrefix(NdocPrefix))
      .orElse(nsigPrior.find(n => batchOf(n) == batchName).map(_.stripPrefix(NsigPrefix)))
      .getOrElse {
        val seq = math.max(nextSeq(ndocPrior, NdocPrefix), nextSeq(nsigPrior, NsigPrefix))
        f"$seq%06d_$batchName"
      }
    val (ndocName, nsigName) = (NdocPrefix + ownSuffix, NsigPrefix + ownSuffix)
    if (TableIO.isComplete(stateDir, ndocName) && TableIO.isComplete(stateDir, nsigName))
      return stateTable(spark, stateDir, ndocName, key = "doc_id")
    Files.createDirectories(Paths.get(stateDir))
    val priorSigs = nsigPrior.filterNot(_ == nsigName)
    val priorDocs = ndocPrior.filterNot(_ == ndocName)
    // Orphan-state guard: an ingest that crashed between its two stage
    // writes leaves one completed half; the recovery contract is that the
    // SAME batch is re-ingested (the suffix reconstruction above completes
    // it). If the pipeline instead moved on to a DIFFERENT batch, the
    // orphan's accepted docs would sit in ndoc_ with no signature index —
    // every later batch would silently skip near-dup checks against them.
    // Enforce the contract loudly instead of documenting it.
    val orphanSuffixes =
      (priorDocs.map(_.stripPrefix(NdocPrefix)).toSet union
        priorSigs.map(_.stripPrefix(NsigPrefix)).toSet) diff
      (priorDocs.map(_.stripPrefix(NdocPrefix)).toSet intersect
        priorSigs.map(_.stripPrefix(NsigPrefix)).toSet)
    require(orphanSuffixes.isEmpty,
      s"half-completed near-dup state under $stateDir: batch(es) " +
        s"${orphanSuffixes.toSeq.sorted.mkString(", ")} have only one of their " +
        "nsig_/ndoc_ stages — re-ingest those batches (same name, same rows) " +
        "to complete them before ingesting a new batch")

    // phase timers (stdout, gated): SPARK_GRAFT_INGEST_DIAG=1
    val diag = sys.env.get("SPARK_GRAFT_INGEST_DIAG").contains("1")
    var tPhase = System.nanoTime()
    def phase(name: String): Unit = if (diag) {
      val now = System.nanoTime()
      println(f"INGESTDIAG $batchName $name ${(now - tPhase) / 1e9}%.1f s")
      tPhase = now
    }
    val b = batch.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .localCheckpoint(true)
    val sigs = Dedup.minhashSignatures(b, "doc_id", "text").localCheckpoint(true)
    phase("sigs")
    // in-batch candidate pairs: reject the larger id of every refined pair
    val inPairs = Dedup.minhashCandidates(sigs, maxBucket)
    var cands: DataFrame = null
    var refineIn: DataFrame = null

    val kReq = "spark.sql.requireAllClusterKeysForCoPartition"
    val prev = spark.conf.get(kReq)
    spark.conf.set(kReq, "false")
    try {
      // ONE refine per ingest (optimization round): the in-batch and
      // cross-batch verifications used to run as two jaccardRefine chains
      // separated by an inOk barrier (probe with survivors only). The
      // accepted set is IDENTICAL when both pair lists refine together
      // against (batch ∪ partners) and rejects = all refined id2:
      //  - in-batch rejection never depended on the partner's own fate
      //    (aggressive first-wins), so those pairs are unchanged;
      //  - a cross pair whose id2 was also in-batch-rejected is a no-op
      //    (the doc is rejected either way) — which is exactly why probing
      //    with ALL batch signatures instead of survivors cannot change
      //    the result, only add candidate volume bounded by the in-batch
      //    duplicate fraction. The oracle unrolls acceptance from the one
      //    global banding+refine pair list, so this shape matches it more
      //    directly. Saves a full refine chain (≈6 shuffle stages) and the
      //    survivor checkpoint per ingest; measured d11 ~10 -> ~8 s sf0.1.
      val accepted = if (priorSigs.isEmpty) {
        val rejects = Dedup.jaccardRefine(b, "doc_id", "text", shingleN,
            threshold, inPairs)
          .select(col("id2").as("doc_id")).distinct()
        b.join(rejects, Seq("doc_id"), "left_anti")
      } else {
        // probe the banded state index: the batch's band keys vs each stage
        val rawProbe = Dedup.minhashBands(sigs)
        // the cross probe needs the SAME discriminativeness cap as
        // minhashCandidates: char-trigram banding is weak on short text
        // (universal trigrams make a few band keys corpus-wide hot), and an
        // uncapped probe forms |bucket_batch| x |bucket_state| pairs PER
        // STAGE — measured 2.3M candidate pairs per 20k-doc batch against
        // ONE 20k-doc stage (ScaleIncrNear), growing linearly with state.
        // Dropping the probe side of a hot key suffices (the state side
        // then never matches); true near-dups survive via their other,
        // discriminative bands — the minhashCandidates rationale. (pn now
        // counts the whole batch's probe rows rather than survivors-only —
        // the cap is a discriminativeness heuristic and the count basis is
        // documented, not load-bearing.)
        val probe = maxBucket match {
          case None => rawProbe
          case Some(cap) =>
            val stateCnt = priorSigs.map { st =>
              stateTable(spark, stateDir, st, key = "band_key")
                .select(col("band"), col("band_key"))
            }.reduce(_ unionByName _)
              .groupBy(col("band"), col("band_key")).agg(count(lit(1)).as("sn"))
            val ok = rawProbe.groupBy(col("band"), col("band_key"))
              .agg(count(lit(1)).as("pn"))
              .join(stateCnt, Seq("band", "band_key"), "left")
              .filter(col("pn") + coalesce(col("sn"), lit(0L)) <= cap)
              .select(col("band"), col("band_key"))
            rawProbe.join(ok, Seq("band", "band_key"))
              .select(col("doc_id"), col("band"), col("band_key"))
        }
        cands = priorSigs.map { st =>
          val state = stateTable(spark, stateDir, st, key = "band_key")
            .select(col("band"), col("band_key"), col("doc_id").as("id1"))
          probe.join(state, Seq("band", "band_key"))
            .select(col("id1"), col("doc_id").as("id2"))
        }.reduce(_ unionByName _).distinct().localCheckpoint(true)
        if (diag) println(s"INGESTDIAG $batchName cands_rows=${cands.count()}")
        phase("probe")
        // refine only the candidate partners: state text via doc_id
        // semi-joins against the bucketed ndoc tables, never a full rescan
        val partnerIds = cands.select(col("id1").as("doc_id")).distinct()
        val partners = priorDocs.map { st =>
          stateTable(spark, stateDir, st, key = "doc_id")
            .join(partnerIds, Seq("doc_id"), "left_semi")
            .select(col("doc_id"), col("text"))
        }.reduce(_ unionByName _)
        // MATERIALIZE the refine input: jaccardRefine references its
        // shingle table in six plan positions, so an un-checkpointed
        // (batch ∪ k-stage-union) subtree is embedded 6x and the plan
        // grows with the stage count — measured 74 s -> 135 s per added
        // stage at 20k docs/batch before this leaf, flat after
        refineIn = b.unionByName(partners).localCheckpoint(true)
        if (diag) println(s"INGESTDIAG $batchName refine_in_rows=${refineIn.count()}")
        // in-batch and cross pairs are disjoint (cross id1 is an accepted
        // EARLIER-batch doc; the cross-batch id-uniqueness contract above)
        // and individually distinct, so the union stays distinct — the
        // jaccardRefine requirement
        val rejects = Dedup.jaccardRefine(refineIn, "doc_id", "text",
            shingleN, threshold,
            inPairs.unionByName(cands.select(col("id1"), col("id2"))))
          .select(col("id2").as("doc_id")).distinct()
        b.join(rejects, Seq("doc_id"), "left_anti")
      }
      val ndoc = TableIO.bucketedStage(spark, stateDir, ndocName, "doc_id",
        DefaultBuckets) { accepted.select(col("doc_id"), col("text")) }
      phase("ndoc")
      TableIO.bucketedStage(spark, stateDir, nsigName, "band_key", DefaultBuckets) {
        Dedup.minhashBands(
          sigs.join(ndoc.select(col("doc_id")), Seq("doc_id"), "left_semi"))
          .select(col("band_key"), col("band"), col("doc_id"))
      }
      phase("nsig")
      ndoc
    } finally {
      spark.conf.set(kReq, prev)
      // release this ingest's checkpoint blocks: both outputs are staged on
      // disk, so the intermediates would only pile up across a long-running
      // ingest loop
      releaseCheckpoint(b, sigs, cands, refineIn)
    }
  }

  /** Stage-name prefix for appended training-shard batches. */
  val PackPrefix = "pack_"

  /**
   * Incremental SHARD PACKING — the export-end member of the incremental
   * family: append an arriving batch to an existing packed training stream
   * without repacking history. The batch is packed with [[Packing
   * .tokenBudgetShards]]' two-pass distributed prefix scan, its offsets
   * shifted by the persisted stream total, so the combined layout is
   * IDENTICAL to a one-shot pack over the concatenated corpus (the x12
   * oracle applies unchanged) — history shards are never rewritten; at
   * most the boundary shard gains rows in the new batch's own stage.
   *
   * Contract: ids must be globally monotonic across batches (batch min id
   * > all prior ids — natural for time-ordered crawl snapshots, REQUIRED
   * because the one-shot layout orders by id); enforced with one bounded
   * aggregate over the BATCH only. Each batch stages as `pack_<seq>_<batch>`
   * PARTITIONED BY shard — a dataloader reading shard k directory-prunes
   * every stage (the delta-read pattern shared with [[graft.ml.AnnStore]]).
   * The stream total and max id come from a per-stage stats sidecar
   * (`_pack_stats.json`, written with the stage): reading them back is
   * driver-side file IO, so ingest cost no longer grows with the stage
   * count (guide §1.2: don't recompute what the write already knew — the
   * previous Σ per-stage sum(toks) re-scan was one Spark aggregate per
   * prior stage per ingest). A stage whose sidecar is missing (pre-upgrade
   * state, or a crash between the two writes) falls back to the aggregate
   * once; [[compact]]-style retirement is unaffected because retired stages
   * drop out of `stateNames`. Idempotent by batch name. Returns the
   * batch's packed rows (id, toks, off, shard).
   */
  def ingestPack(spark: SparkSession, stateDir: String, batchName: String,
                 batch: DataFrame, idCol: String, toksCol: String,
                 budget: Long): DataFrame = {
    require(batchName.nonEmpty && batchName.forall(c =>
        c.isLetterOrDigit || c == '-' || c == '.'),
      s"batch name must be [A-Za-z0-9.-]+: $batchName")
    val prior = stateNames(stateDir, PackPrefix)
    prior.find(_.split("_", 3).last == batchName) match {
      case Some(existing) =>
        // partition-directory type inference narrows shard to int — restore
        // the packer's long (offsets reach ~1e14/budget at 100 TB)
        return spark.read.parquet(s"$stateDir/$existing")
          .select(col(idCol), col("toks"), col("off"), col("shard").cast("long").as("shard"))
      case None => ()
    }
    Files.createDirectories(Paths.get(stateDir))
    val (base, maxPrior) = prior.foldLeft((0L, Long.MinValue)) { case ((b, m), st) =>
      val (s, x) = readPackStats(spark, stateDir, st, idCol)
      (b + s, math.max(m, x))
    }
    // one bounded aggregate over the batch: min id for the monotonic-id
    // contract, sum/max recorded in the stage's stats sidecar so LATER
    // ingests never re-scan this stage. The empty-batch require runs
    // regardless of stream state — an empty FIRST batch would otherwise
    // stage an empty table and make the next ingest fail obscurely.
    val statRow = batch.agg(min(col(idCol)), max(col(idCol)),
      sum(col(toksCol).cast("long"))).head()
    require(!statRow.isNullAt(0), s"batch $batchName is empty — nothing to append")
    val (minId, maxId, sumToks) =
      (statRow.getLong(0), statRow.getLong(1), statRow.getLong(2))
    if (prior.nonEmpty) {
      require(minId > maxPrior,
        s"ids must be monotonic across batches: batch min $minId <= prior max " +
          s"$maxPrior — the packed layout orders by id, so out-of-order ids " +
          "would require repacking history")
    }
    val name = f"$PackPrefix${nextSeq(prior, PackPrefix)}%06d_$batchName"
    val packed = Packing.tokenBudgetShards(
        batch.select(col(idCol), col(toksCol).cast("long").as("toks")),
        idCol, "toks", budget)
      .withColumn("off", col("off") + lit(base))
      .withColumn("shard", expr(s"off div ${budget}L"))
    TableIO.stageWrite(spark, stateDir, name, partitionBy = Seq("shard")) { packed }
    Files.write(Paths.get(stateDir, name, PackStatsFile),
      s"""{"sum_toks": $sumToks, "max_id": $maxId}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // return the rows just computed (tokenBudgetShards materializes its
    // range layout, so this re-reads a local checkpoint, not the pipeline):
    // the staged read-back re-opened every shard file of the stage just
    // written — partition discovery over ~stage-shard-count directories per
    // ingest, measured 1.2 s of a 4 s ingest at sf0.1 (IncrProbe) — purely
    // to re-read rows already in hand. The resume path (stage complete on
    // entry) still reads from disk above; rows are identical by the stage
    // write's own contract.
    packed.select(col(idCol), col("toks"), col("off"), col("shard"))
  }

  /** Stats sidecar name for [[ingestPack]] stages. */
  val PackStatsFile = "_pack_stats.json"

  /** (sum of toks, max id) of a completed pack stage: from the sidecar when
   *  present (driver-side file read), else the one-off aggregate fallback. */
  private def readPackStats(spark: SparkSession, stateDir: String,
                            stage: String, idCol: String): (Long, Long) = {
    val p = Paths.get(stateDir, stage, PackStatsFile)
    if (Files.exists(p)) {
      val s = Files.readString(p)
      def field(n: String): Option[Long] =
        (s""""$n": (-?\\d+)""").r.findFirstMatchIn(s).map(_.group(1).toLong)
      (field("sum_toks"), field("max_id")) match {
        case (Some(a), Some(b)) => return (a, b)
        case _ => () // corrupt sidecar: fall through to the aggregate
      }
    }
    val r = spark.read.parquet(s"$stateDir/$stage")
      .agg(sum(col("toks")), max(col(idCol))).head()
    (r.getLong(0), r.getLong(1))
  }

  /**
   * Log-structured maintenance: fold every state stage into ONE bucketed
   * stage and retire the originals, so ingest cost returns to a single
   * anti-join instead of O(batches). Crash-safe without a transaction log:
   * the compacted stage is written FIRST (under the next sequence number,
   * so it can never silently resume an existing stage), then the originals
   * are deleted. A crash between the two leaves duplicate content across
   * stages, which is harmless to ingest (an anti-join rejects against
   * either copy) and is re-collapsed by the next compact — the fold
   * aggregates per (h, text), idempotent under whole-row duplication.
   * Union-then-aggregate shuffles once on (h, text); the next compaction
   * pass at 100 TB would sort-merge the bucketed inputs instead, the same
   * subset-co-partition trick as ingest — left as the documented upgrade.
   */
  def compact(spark: SparkSession, stateDir: String): DataFrame = {
    val names = stateNames(stateDir)
    require(names.nonEmpty, s"no completed state stages under $stateDir")
    if (names.size == 1) return stateTable(spark, stateDir, names.head)
    val seq = nextSeq(names)
    val folded = names.map(stateTable(spark, stateDir, _)).reduce(_ unionByName _)
      .groupBy(col("h"), col("text"))
      .agg(min(col("id")).as("id"), max(col("n_dups")).as("n_dups"))
      .select(col("h"), col("id"), col("text"), col("n_dups"))
    val out = TableIO.bucketedStage(spark, stateDir,
      f"$StatePrefix$seq%06d_compact$seq", "h", DefaultBuckets) { folded }
    names.foreach { n =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        Paths.get(stateDir, n).toFile)
    }
    out
  }
}
