package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{NGramLM, TextIndex}
import graft.spell.{SpellCorrector, SpellJoin}

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
 * Scale split (SURVEY §3.1): the reference holds the vocabulary, n-gram
 * counts and confusion matrices in server RAM (searcher.go:37-73). The
 * engine mirrors that ONLY while the vocabulary fits `maxDriverVocab`
 * terms; past the budget every model-sized structure stays distributed:
 *  - candidate generation = deletion-neighborhood equi-join
 *    ([[graft.spell.SpellJoin]]) instead of a vocabulary collect/scan,
 *  - LM scoring = joins of the candidate positions against the n-gram
 *    count tables ([[NGramLM.queryLogProbsDistributed]]) instead of
 *    [[NGramLM.collectModel]].
 * Driver-resident data on the distributed path is bounded by the
 * per-request candidate set (the reference's own per-request scale), never
 * by the corpus. Scoring/top-k/hydration are distributed jobs in both
 * modes.
 */
class Searcher(docs: DataFrame, idCol: String, nameCol: String, addrCol: String,
               spellErrorLines: Iterable[String] = Nil,
               maxDriverVocab: Long = Searcher.DefaultMaxDriverVocab) {

  val index = new SearchIndex(docs, idCol, nameCol, addrCol)

  /** True when the vocabulary exceeds the driver budget: all model state
   *  stays distributed (one count job decides the mode at construction). */
  val distributed: Boolean = index.vocabulary.count() > maxDriverVocab

  private val noisy = SpellCorrector.buildNoisyModel(spellErrorLines)

  // ---- collected-mode state (reference-faithful, vocab <= budget) --------

  /** Deterministic term dictionary: sorted-vocab rank (ids from 3; 0-2 are
   *  <s>, </s>, <UNK>) — replaces the reference's first-seen mutex counter
   *  (util.go:16-42), which cannot distribute. */
  private lazy val termIdMap: Map[String, Long] = {
    val terms = index.vocabulary.select("term").orderBy("term")
      .collect().map(_.getString(0))
    terms.zipWithIndex.map { case (t, i) => t -> (i + 3L) }.toMap
  }

  /** Terms the LM keeps: corpus frequency >= COUNT_THRESOLD_NGRAM over the
   *  name++address token stream. The reference ALWAYS builds (and queries)
   *  its LM over the UNK-thresholded corpus (ngram_lm.go:69-110); words
   *  below the threshold are <UNK> on both the build and the query path.
   *  vocabulary.freq IS that corpus frequency (sum of tf over both fields),
   *  so no extra distributed pass is needed. */
  private lazy val lmKeep: Set[String] = index.vocabulary
    .filter(col("freq") >= NGramLM.CountThreshold)
    .select("term").collect().map(_.getString(0)).toSet

  /** Query-side LM id: hapax words map to <UNK>, like the build side. */
  private def lmTermId(t: String): Long =
    if (lmKeep.contains(t)) termIdMap.getOrElse(t, NGramLM.UnkId) else NGramLM.UnkId

  private lazy val lm: NGramLM.Model = {
    val spark = docs.sparkSession
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

  // ---- distributed-mode state (vocab > budget) ---------------------------

  /** (t, term_id, lmid): sorted-rank ids via distributed zipWithIndex, with
   *  the UNK-thresholded LM id alongside (hapax -> <UNK>). */
  private lazy val dict: DataFrame =
    TextIndex.termIds(index.vocabulary)
      .join(index.vocabulary.select(col("term"), col("freq")), Seq("term"))
      .select(col("term").as("t"), col("term_id"),
        when(col("freq") >= NGramLM.CountThreshold, col("term_id"))
          .otherwise(lit(NGramLM.UnkId)).as("lmid"))

  /** Deletion-neighborhood candidate index (persist via
   *  TableIO.bucketedStage(key = "del_key") at warehouse scale). */
  private lazy val spellNbr: DataFrame = SpellJoin.neighborhood(index.vocabulary)

  /** N-gram count tables built WITHOUT collecting the dictionary: tokens
   *  map to LM ids by join; empty docs are preserved (their padded grams
   *  count, exactly as on the collected path). */
  private lazy val lmCounts: DataFrame = {
    val exploded = docs
      .select(col(idCol).as("did"),
        posexplode(graft.sources.Derived.tokens(
          concat_ws(" ", col(nameCol), col(addrCol)))).as(Seq("pos", "t")))
    val grouped = exploded
      .join(dict.select(col("t"), col("lmid")), Seq("t"), "left")
      .select(col("did"), col("pos"), coalesce(col("lmid"), lit(NGramLM.UnkId)).as("tid"))
      .groupBy("did")
      .agg(array_sort(collect_list(struct(col("pos"), col("tid")))).as("ps"))
      .select(col("did"), transform(col("ps"), p => p("tid")).as("terms"))
    val termDocs = docs.select(col(idCol).as("did")).join(grouped, Seq("did"), "left")
      .select(coalesce(col("terms"), array().cast("array<long>")).as("terms"))
    NGramLM.countTables(termDocs)
  }

  /** Exact-key membership probe (a del_key == term row always exists). */
  private def inVocab(t: String): Boolean =
    spellNbr.filter(col("del_key") === t && col("term") === t).limit(1).count() > 0

  private def joinCandidates(t: String, maxDist: Int): Seq[String] =
    SpellJoin.candidates(spellNbr, t, maxDist)
      .select("term").collect().map(_.getString(0)).toSeq

  /** LM ids for a small set of candidate terms, via one join-backed probe
   *  (collected result is candidate-scale, not vocab-scale). */
  private def lmIdsFor(terms: Seq[String]): Map[String, Long] =
    if (terms.isEmpty) Map.empty
    else dict.filter(col("t").isin(terms.distinct: _*))
      .select(col("t"), col("lmid"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Rank candidate queries (distributed LM + driver noisy-channel; edit
   *  probs are per-candidate arithmetic, not model lookups). */
  private def rankDistributed(candidates: Seq[Seq[String]], tokens: Seq[String],
                              topK: Int): Seq[Seq[String]] = {
    val ids = lmIdsFor(candidates.flatten)
    val lmScores = NGramLM.queryLogProbsDistributed(lmCounts,
      candidates.zipWithIndex.map { case (c, i) =>
        (i, c.map(t => ids.getOrElse(t, NGramLM.UnkId)))
      })
    candidates.zipWithIndex.map { case (cand, i) =>
      val editLp = cand.zip(tokens).map { case (c, o) => noisy.editLogProb(o, c) }.sum
      (cand, lmScores.getOrElse(i, Double.NegativeInfinity) + editLp)
    }.sortBy { case (c, p) => (-p, c.mkString(" ")) }
      .take(topK).map(_._1)
  }

  // ---- mode dispatch -----------------------------------------------------

  private def tokenCandidates(t: String): Seq[String] = {
    val hit = if (distributed) inVocab(t) else termIdMap.contains(t)
    if (hit) Seq(t)
    else {
      def at(d: Int) =
        if (distributed) joinCandidates(t, d)
        else SpellCorrector.editCandidates(index.vocabulary, t, d)
      val c1 = at(1)
      val cs = if (c1.nonEmpty) c1 else at(2)
      if (cs.nonEmpty) cs else Seq(t) // unknown, uncorrectable: keep as-is
    }
  }

  private def rank(candidates: Seq[Seq[String]], tokens: Seq[String],
                   topK: Int): Seq[Seq[String]] =
    if (distributed) rankDistributed(candidates, tokens, topK)
    else SpellCorrector.rankCandidates(candidates, tokens, lm, lmTermId, noisy, topK)

  /** Per-token candidate generation + LM/noisy ranking → corrected tokens
   *  (FreeFormQuery steps 3-6). */
  def correct(query: String): Seq[String] = {
    val tokens = Tokenizer.tokenize(query)
    if (tokens.isEmpty) return tokens
    val perToken = tokens.map(tokenCandidates)
    val candidates = SpellCorrector.queryCandidates(perToken)
    rank(candidates, tokens, 1).head
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
    val edits =
      if (distributed) joinCandidates(last, 1) ++ joinCandidates(last, 2)
      else SpellCorrector.editCandidates(index.vocabulary, last, 1) ++
        SpellCorrector.editCandidates(index.vocabulary, last, 2)
    val completions = (index.prefixCandidates(last, max = 10) ++ edits).distinct
    val candidateQueries =
      if (completions.isEmpty) Seq(tokens)
      else completions.map(c => tokens.init :+ c)
    val top3 = rank(candidateQueries, tokens, SpellCorrector.KAutocomplete)
    val scored = top3.map(index.bm25f).reduce(_ unionByName _)
      .groupBy("doc_id").agg(max("score").as("score"))
    val ranked = scored.orderBy(desc("score"), col("doc_id"))
      .limit(k + offset).offset(offset)
    broadcast(ranked).join(docs.withColumnRenamed(idCol, "doc_id"), Seq("doc_id"))
  }
}

object Searcher {
  /** Vocabulary budget for holding the LM/dictionary on the driver — the
   *  reference's in-RAM regime. OSM-scale vocabularies are far below it;
   *  a web-scale caption corpus trips it and every model structure stays
   *  distributed. */
  val DefaultMaxDriverVocab: Long = 10000000L
}
