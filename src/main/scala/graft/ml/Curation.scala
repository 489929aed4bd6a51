package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Derived

/**
 * The composed training-data curation pipeline — the end-to-end chain a
 * 100-TB corpus runs before tokenization, assembled from the engine's
 * already-oracled operators:
 *
 *   1. redact    — PII scrub ([[TextStats.redact]]; x8's op)
 *   2. filter    — quality + repetition thresholds over the REDACTED text
 *                  ([[TextStats.qualityScoreCol]]/[[TextStats.repetitionCol]];
 *                  x2/x6's ops), one per-row projection, no shuffle
 *   3. dedup     — MinHash banding candidates → connected-component
 *                  clusters → keep the min-id representative per cluster
 *                  ([[Dedup]]/[[Components]]; d3/d6's ops)
 *   4. sample    — deterministic language-stratified ticket sampling
 *                  ([[Sampling]] over [[TextStats.langIdCol]]; x7's op)
 *
 * [[plan]] is the pure composition (the x9_curation_e2e oracled query);
 * [[run]] persists each stage through [[graft.pipeline.TableIO.stage]] with
 * lineage manifests so a rerun resumes exactly (north-rule checkpointing,
 * asserted in PipelineSpec).
 */
object Curation {

  /** Thresholds chosen against the sf corpus so every stage does real work
   *  (filter keeps ~57%, dedup collapses the banded near-dups, sampling
   *  downweights by language). Shared with the DuckDB oracle. */
  val QualityMin = 7000L
  val RepMax = 1500L
  val SampleRates: Map[String, Double] =
    Map("en" -> 0.5, "de" -> 0.8, "fr" -> 0.8, "es" -> 0.8)
  val SampleDefaultRate = 0.1
  val SampleSalt = "cur1"

  /** Stage 1: (doc_id, redacted). */
  def redactStage(docs: DataFrame): DataFrame =
    TextStats.redact(docs, "doc_id", "text")

  /** Stage 2: quality/repetition gate over the redacted text — one per-row
   *  projection (all three signals in the same select, no joins), then the
   *  threshold filter BEHIND a materialization barrier: pushing the filter
   *  into the projection makes Catalyst substitute the full signal
   *  expressions into the predicate, re-running the regex/token work per
   *  row with no subexpression sharing against the projection (measured
   *  13.1 s vs 0.6 s for 5000 rows at one partition). */
  def filterStage(redacted: DataFrame): DataFrame =
    redacted.select(col("doc_id"), col("redacted"),
        Derived.q4(TextStats.qualityScoreCol(col("redacted"))).as("quality4"),
        Derived.q4(TextStats.repetitionCol(col("redacted"))).as("rep4"))
      .localCheckpoint(eager = true)
      .filter(col("quality4") >= QualityMin && col("rep4") <= RepMax)

  /** Jaccard cut for the refine step — pairs the banding admits must also
   *  pass the exact shingle-Jaccard test before clustering (banding alone
   *  is a PREFILTER; on templated corpora it admits far-from-duplicate
   *  pairs and would collapse everything into one cluster). */
  val JaccardRefineThreshold = 0.7

  /** Band buckets above this size are skipped (see
   *  [[Dedup.minhashCandidates]]): a hot bucket is quadratic in the pair
   *  join and non-discriminative. 32 keeps the per-bucket pair bound at
   *  496 while real near-dups still collide in their other bands. */
  val MaxBandBucket = 32

  /** Stage 3: banding prefilter → exact Jaccard refine → connected
   *  components → keep the min-id representative per cluster.
   *
   *  The reused intermediates (filter output, signatures, refined pairs)
   *  are each referenced several times downstream (band self-join sides,
   *  shingle joins, the symmetrized component edges); materializing them
   *  once collapses what is otherwise a MULTIPLICATIVE lineage blowup —
   *  measured 337 s → seconds for the composed query at sf0.1. Checkpoint
   *  blocks are reclaimed by the ContextCleaner when the result is
   *  dropped. (In the staged [[run]] form, TableIO persistence plays this
   *  role instead.) */
  def dedupStage(filteredIn: DataFrame, materializeInput: Boolean = true): DataFrame = {
    // at-rest inputs (the staged run's bucketed tables) are already
    // materialized AND carry hash(doc_id) bucketing that the final
    // keep-representative join reuses — a localCheckpoint here would both
    // recompute nothing and DESTROY the bucketing (the RDD barrier drops
    // outputPartitioning), re-shuffling the corpus side of the join
    val filtered =
      if (materializeInput) filteredIn.localCheckpoint(eager = true) else filteredIn
    val sigs = Dedup.minhashSignatures(filtered, "doc_id", "redacted")
      .localCheckpoint(eager = true)
    val candidates = Dedup.minhashCandidates(sigs, maxBucket = Some(MaxBandBucket))
    val pairs = Dedup.jaccardRefine(filtered, "doc_id", "redacted", 3,
        JaccardRefineThreshold, candidates)
      .localCheckpoint(eager = true)
    val clusters = Dedup.dupClusters(filtered, "doc_id", pairs)
    filtered.join(clusters.filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id")), Seq("doc_id"))
  }

  /** Stage 4: language-stratified deterministic sample; final kept set. */
  def sampleStage(deduped: DataFrame): DataFrame =
    Sampling.stratifiedSample(
        deduped.withColumn("lang_pred", TextStats.langIdCol(col("redacted"))),
        "doc_id", col("lang_pred"), SampleRates, SampleDefaultRate, SampleSalt)
      .select(col("doc_id"), col("lang_pred"), col("quality4"), col("rep4"))

  /** The pure composition — the x9_curation_e2e query body.
   *
   *  The redact output is materialized before the signal stage: Catalyst's
   *  projection collapse would otherwise inline the two redaction
   *  regexp_replace calls into EVERY occurrence of `redacted` inside the
   *  quality/repetition expressions, re-running them many times per row
   *  (measured 50 s → ~3 s for the filter stage at sf0.1). */
  def plan(docs: DataFrame): DataFrame = {
    // right-size the partitioning once at the fan-out root: a single-file
    // input would otherwise serialize every per-row regex/shingle stage on
    // one core (checkpoints preserve partitioning). No-op at warehouse
    // scale, where inputs already carry >= defaultParallelism splits.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val base = if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    // materializeInput = false: filterStage's output is a cheap integer
    // filter OVER its own eager checkpoint, so dedupStage's extra
    // localCheckpoint only re-materialized already-materialized rows (one
    // more full-width job per run); the downstream re-evaluations scan the
    // in-memory checkpoint
    sampleStage(dedupStage(filterStage(
      redactStage(base).localCheckpoint(eager = true)), materializeInput = false))
  }

  /** Buckets for the staged tables — every stage boundary is keyed by
   *  doc_id, so the stages persist BUCKETED by it and the dedup stage's
   *  keep-representative join re-uses the layout instead of re-shuffling
   *  the corpus side (asserted in PipelineSpec). */
  val NBuckets = 8

  /** Checkpointed run: every stage persists with a lineage manifest as an
   *  external table bucketed by doc_id; a rerun over the same outDir
   *  resumes each completed stage (read-back, not recompute) and returns
   *  identical rows. */
  def run(spark: SparkSession, docs: DataFrame, outDir: String): DataFrame = {
    import graft.pipeline.TableIO
    val red = TableIO.bucketedStage(spark, outDir, "cur_redact", "doc_id", NBuckets) {
      redactStage(docs)
    }
    val fil = TableIO.bucketedStage(spark, outDir, "cur_filter", "doc_id", NBuckets) {
      filterStage(red)
    }
    val ded = TableIO.bucketedStage(spark, outDir, "cur_dedup", "doc_id", NBuckets) {
      dedupStage(fil, materializeInput = false)
    }
    TableIO.bucketedStage(spark, outDir, "cur_sample", "doc_id", NBuckets) {
      sampleStage(ded)
    }
  }
}
