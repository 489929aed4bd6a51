package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{NGramLM, TextIndex}
import graft.spell.SpellCorrector

/**
 * The composed query entry points of the reference server, end to end:
 *
 *  - [[freeFormQuery]] = /api/search (searcher.go:97-204): tokenize →
 *    per-token candidates (vocabulary hit, else edit-distance 1, else 2) →
 *    cartesian candidate queries → rank by 4-gram stupid-backoff LM
 *    log-prob + noisy-channel edit log-prob → best corrected query →
 *    BM25F/BM25+/TF-IDF score → top-k → hydrate.
 *  - [[autocomplete]] = /api/autocomplete (searcher.go:207-399): the last
 *    token is completed by prefix ∪ edit1 ∪ edit2 candidates, candidate
 *    queries ranked by the same LM+edit probability, TOP 3 kept
 *    (kAutoComplete=3, spell_corrector.go:406-408), each scored BM25F,
 *    unioned, globally ranked.
 *
 * Scale split (SURVEY §3.1): steps up to candidate ranking are driver-side
 * over broadcast-scale models (vocabulary, n-gram counts, confusion
 * matrices — the reference holds the same structures in server RAM,
 * searcher.go:37-73); scoring/top-k/hydration are distributed jobs.
 */
class Searcher(docs: DataFrame, idCol: String, nameCol: String, addrCol: String,
               spellErrorLines: Iterable[String] = Nil) {

  val index = new SearchIndex(docs, idCol, nameCol, addrCol)

  /** Deterministic term dictionary: sorted-vocab rank (ids from 3; 0-2 are
   *  <s>, </s>, <UNK>) — replaces the reference's first-seen mutex counter
   *  (util.go:16-42), which cannot distribute. */
  private val termIdMap: Map[String, Long] = {
    val terms = index.vocabulary.select("term").orderBy("term")
      .collect().map(_.getString(0))
    terms.zipWithIndex.map { case (t, i) => t -> (i + 3L) }.toMap
  }
  private def termId(t: String): Long = termIdMap.getOrElse(t, NGramLM.UnkId)

  /** Terms the LM keeps: corpus frequency >= COUNT_THRESOLD_NGRAM over the
   *  name++address token stream. The reference ALWAYS builds (and queries)
   *  its LM over the UNK-thresholded corpus (ngram_lm.go:69-110); words
   *  below the threshold are <UNK> on both the build and the query path.
   *  vocabulary.freq IS that corpus frequency (sum of tf over both fields),
   *  so no extra distributed pass is needed. */
  private val lmKeep: Set[String] = index.vocabulary
    .filter(col("freq") >= NGramLM.CountThreshold)
    .select("term").collect().map(_.getString(0)).toSet

  /** Query-side LM id: hapax words map to <UNK>, like the build side. */
  private def lmTermId(t: String): Long =
    if (lmKeep.contains(t)) termId(t) else NGramLM.UnkId

  private val lm: NGramLM.Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    // local copies: a closure over the `termId` METHOD would capture `this`
    // (and its DataFrames) and fail task serialization
    val tid = termIdMap
    val unk = NGramLM.UnkId
    val keep = lmKeep
    // UNK thresholding applied AT the id mapping (equivalent to
    // NGramLM.replaceOOV over the id stream, without the extra pass)
    val toIds = udf((ts: Seq[String]) =>
      ts.map(t => if (keep.contains(t)) tid.getOrElse(t, unk) else unk))
    val termDocs = docs
      .select(graft.sources.Derived.tokens(
        concat_ws(" ", col(nameCol), col(addrCol))).as("toks"))
      .select(toIds(col("toks")).as("terms"))
    NGramLM.collectModel(NGramLM.countTables(termDocs))
  }

  private val noisy = SpellCorrector.buildNoisyModel(spellErrorLines)

  /** Per-token candidate generation + LM/noisy ranking → corrected tokens
   *  (FreeFormQuery steps 3-6). */
  def correct(query: String): Seq[String] = {
    val tokens = Tokenizer.tokenize(query)
    if (tokens.isEmpty) return tokens
    val perToken = tokens.map { t =>
      if (termIdMap.contains(t)) Seq(t)
      else {
        val c1 = SpellCorrector.editCandidates(index.vocabulary, t, 1)
        val cs = if (c1.nonEmpty) c1 else SpellCorrector.editCandidates(index.vocabulary, t, 2)
        if (cs.nonEmpty) cs else Seq(t) // unknown, uncorrectable: keep as-is
      }
    }
    val candidates = SpellCorrector.queryCandidates(perToken)
    SpellCorrector.rankCandidates(candidates, tokens, lm, lmTermId, noisy, 1).head
  }

  /** /api/search composed end-to-end. */
  def freeFormQuery(query: String, k: Int, offset: Int = 0,
                    scoring: String = "bm25f"): DataFrame =
    index.search(correct(query).mkString(" "), k, offset, scoring)

  /** /api/autocomplete with the reference's full candidate set for the last
   *  token: prefix ∪ edit1 ∪ edit2, deduped (searcher.go:284-315), candidate
   *  queries ranked by LM+edit, top 3 scored and unioned. */
  def autocomplete(query: String, k: Int, offset: Int = 0): DataFrame = {
    val tokens = Tokenizer.tokenize(query)
    if (tokens.isEmpty) return docs.sparkSession.emptyDataFrame
    val last = tokens.last
    val completions = (
      index.prefixCandidates(last, max = 10) ++
        SpellCorrector.editCandidates(index.vocabulary, last, 1) ++
        SpellCorrector.editCandidates(index.vocabulary, last, 2)
      ).distinct
    val candidateQueries =
      if (completions.isEmpty) Seq(tokens)
      else completions.map(c => tokens.init :+ c)
    val top3 = SpellCorrector.rankCandidates(candidateQueries, tokens, lm, lmTermId, noisy, 3)
    val scored = top3.map(index.bm25f).reduce(_ unionByName _)
      .groupBy("doc_id").agg(max("score").as("score"))
    val ranked = scored.orderBy(desc("score"), col("doc_id"))
      .limit(k + offset).offset(offset)
    broadcast(ranked).join(docs.withColumnRenamed(idCol, "doc_id"), Seq("doc_id"))
  }
}
