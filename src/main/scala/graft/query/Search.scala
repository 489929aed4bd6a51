package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.TextIndex
import graft.sources.Derived

/**
 * Scoring constants — faithful to the reference
 * (/root/reference/pkg/searcher/constant.go:29-39). Note the reference's
 * address branch reuses NAME_B (scoring.go:59); ADDRESS_B is declared but
 * never used — reproduced as-is.
 */
object ScoringConstants {
  val K1Bm25f = 10.0
  val NameWeight = 20.0
  val AddressWeight = 1.0
  val NameB = 0.95
  // BM25+ (constant.go:29-31)
  val Delta = 1.0
  val K1 = 1.2
  val B = 0.98
}

/**
 * Full-text search over a two-field document table, BM25F / BM25+ /
 * TF-IDF-cosine scored, as declarative Spark jobs against the postings
 * tables built by [[graft.index.TextIndex]].
 *
 * Mirrors /root/reference/pkg/searcher/scoring.go:
 *  - BM25F (scoring.go:9-76): per (term, doc, field)
 *      w = W_f * tf / (1 + B * (len_fd/avgLen_f - 1));  contrib = w/(K1+w) * idf
 *      idf = log10(N - df + 0.5) - log10(df + 0.5), df over BOTH fields' docs
 *  - BM25+ (scoring.go:143-181): merged name++address postings
 *      idf = log10(N+1) - log10(df); contrib = idf * (DELTA + ((K1+1)+tf) /
 *      (K1*(1-B+B*dl/avgdl)+tf))
 *  - TF-IDF cosine (scoring.go:183-228): (1+log10 tf_d)*idf * (1+log10
 *    tf_q)*idf summed; norms computed but never applied — faithful bug,
 *    reproduced by simply not dividing.
 *
 * Query plan shape: the query-term set is tiny -> `isin` filter on the
 * postings table (partition/row-group prunable on term), per-field stats
 * are scalar literals, scoring is pure column arithmetic, and the final
 * `orderBy(desc(score)).limit(k)` becomes TakeOrderedAndProject — a true
 * distributed top-k, never a full sort at scale.
 */
class SearchIndex(docs: DataFrame, idCol: String, nameCol: String, addrCol: String,
                  prebuilt: Option[SearchIndex.Tables] = None) {

  // fresh build: in-session cache mirrors the reference server's RAM index
  // (ownership: the TextQueries/Searcher memoizer holds the index for the
  // session). Loaded from an at-rest store ([[SearchIndexStore]]): the
  // bucketed tables ARE the index — no cache, term lookups prune at scan.
  val postingsName: DataFrame = prebuilt.map(_.postingsName)
    .getOrElse(TextIndex.postings(docs, idCol, nameCol).cache())
  val postingsAddr: DataFrame = prebuilt.map(_.postingsAddr)
    .getOrElse(TextIndex.postings(docs, idCol, addrCol).cache())
  val lenName: DataFrame = prebuilt.map(_.lenName)
    .getOrElse(TextIndex.fieldLengths(docs, idCol, nameCol).cache())
  val lenAddr: DataFrame = prebuilt.map(_.lenAddr)
    .getOrElse(TextIndex.fieldLengths(docs, idCol, addrCol).cache())

  lazy val (avgLenName: Double, docsCount: Long) = TextIndex.fieldStats(lenName)
  lazy val avgLenAddr: Double = TextIndex.fieldStats(lenAddr)._1
  /** merged doc length (name + address tokens, indexer.go:787-790) */
  lazy val docLen: DataFrame = lenName.select(col("doc_id"), col("len").as("nlen"))
    .join(lenAddr.select(col("doc_id"), col("len").as("alen")), Seq("doc_id"))
    .select(col("doc_id"), (col("nlen") + col("alen")).as("dl")).cache()
  lazy val avgDocLen: Double = docLen.agg(avg(col("dl"))).head().getDouble(0)

  /** Vocabulary across both fields (term, freq, df). Fresh build: cached
   *  in-session. Loaded from a store: the bucketed `idx_vocab` table is
   *  served as-is (term lookups prune at scan, no rebuild). */
  lazy val vocabulary: DataFrame = prebuilt.flatMap(_.vocab).getOrElse(
    TextIndex.vocab(postingsName.unionByName(postingsAddr)
      .groupBy("term", "doc_id").agg(sum("tf").as("tf")))
      .cache())

  private def termFilter(terms: Seq[String])(df: DataFrame): DataFrame =
    df.filter(col("term").isin(terms: _*))

  /** df over the union of both fields' docs (scoring.go:26-51). */
  private def dfBothFields(terms: Seq[String]): DataFrame =
    postingsName.transform(termFilter(terms)).select("term", "doc_id")
      .unionByName(postingsAddr.transform(termFilter(terms)).select("term", "doc_id"))
      .distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))

  import ScoringConstants._

  /** BM25F scores: (doc_id, score), descending. `terms` keeps duplicates —
   *  the reference accumulates once per query-term occurrence. */
  def bm25f(terms: Seq[String]): DataFrame = {
    val qdf = dfBothFields(terms.distinct)
    // per-occurrence multiplicity of each query term
    val multiplicity = terms.groupBy(identity).map { case (t, l) => (t, l.size) }
    val multDf = docs.sparkSession.createDataFrame(multiplicity.toSeq)
      .toDF("term", "qmult")
    val idf = log10(col("docs_n") - col("df") + 0.5) - log10(col("df") + 0.5)

    def fieldScore(postings: DataFrame, lens: DataFrame, weight: Double,
                   b: Double, avgLen: Double): DataFrame =
      postings.transform(termFilter(terms.distinct))
        .join(lens, Seq("doc_id"))
        .join(broadcast(qdf), Seq("term"))
        .join(broadcast(multDf), Seq("term"))
        .withColumn("docs_n", lit(docsCount.toDouble))
        .withColumn("w", lit(weight) * col("tf") /
          (lit(1.0) + lit(b) * (col("len") / lit(avgLen) - lit(1.0))))
        .withColumn("contrib",
          (col("w") / (lit(K1Bm25f) + col("w"))) * idf * col("qmult"))
        .select(col("doc_id"), col("contrib"))

    fieldScore(postingsName, lenName, NameWeight, NameB, avgLenName)
      .unionByName(fieldScore(postingsAddr, lenAddr, AddressWeight, NameB, avgLenAddr))
      .groupBy("doc_id").agg(sum(col("contrib")).as("score"))
  }

  /** BM25+ over merged name++address postings (scoring.go:143-181). */
  def bm25plus(terms: Seq[String]): DataFrame = {
    val merged = postingsName.transform(termFilter(terms.distinct))
      .unionByName(postingsAddr.transform(termFilter(terms.distinct)))
      .groupBy("term", "doc_id").agg(sum("tf").as("tf"))
    val dfT = merged.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log10(lit(docsCount.toDouble) + 1.0) - log10(col("df"))
    val multiplicity = terms.groupBy(identity).map { case (t, l) => (t, l.size) }
    val multDf = docs.sparkSession.createDataFrame(multiplicity.toSeq).toDF("term", "qmult")
    merged
      .join(broadcast(dfT), Seq("term"))
      .join(broadcast(multDf), Seq("term"))
      .join(docLen, Seq("doc_id"))
      .withColumn("contrib", idf * (lit(Delta) +
        ((lit(K1 + 1.0) + col("tf")) /
          (lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgDocLen)) + col("tf")))) *
        col("qmult"))
      .groupBy("doc_id").agg(sum(col("contrib")).as("score"))
  }

  /** TF-IDF "cosine" without norm division — faithful to scoring.go:183-228. */
  def tfidf(terms: Seq[String]): DataFrame = {
    val merged = postingsName.transform(termFilter(terms.distinct))
      .unionByName(postingsAddr.transform(termFilter(terms.distinct)))
      .groupBy("term", "doc_id").agg(sum("tf").as("tf"))
    val dfT = merged.groupBy("term").agg(count(lit(1)).as("df"))
    val queryCounts = terms.groupBy(identity).map { case (t, l) => (t, l.size) }
    val qDf = docs.sparkSession.createDataFrame(queryCounts.toSeq).toDF("term", "qcount")
    val idf = log10(lit(docsCount.toDouble)) - log10(col("df"))
    merged
      .join(broadcast(dfT), Seq("term"))
      .join(broadcast(qDf), Seq("term"))
      .withColumn("tfidf_doc", (lit(1.0) + log10(col("tf"))) * idf)
      .withColumn("tfidf_query", (lit(1.0) + log10(col("qcount"))) * idf)
      .withColumn("contrib", col("tfidf_doc") * col("tfidf_query"))
      .groupBy("doc_id").agg(sum(col("contrib")).as("score"))
  }

  /** Top-k search: tokenize -> score -> distributed top-k -> hydrate
   *  (the reference's FreeFormQuery steps 7-9, searcher.go:159-204). */
  def search(query: String, k: Int, offset: Int = 0,
             scoring: String = "bm25f"): DataFrame = {
    val terms = Tokenizer.tokenize(query)
    val scores = scoring match {
      case "bm25f" => bm25f(terms)
      case "bm25plus" => bm25plus(terms)
      case "tfidf" => tfidf(terms)
    }
    val ranked = scores.orderBy(desc("score"), col("doc_id"))
      .limit(k + offset).offset(offset)
    // top-k hydration join (J6): k ids vs the doc table -> broadcast
    broadcast(ranked).join(docs.withColumnRenamed(idCol, "doc_id"), Seq("doc_id"))
  }

  /** Prefix candidates for autocomplete from the broadcast-sized vocabulary
   *  (replaces the FST prefix automaton, spell_corrector.go:361-392). */
  def prefixCandidates(prefix: String, max: Int = 10): Seq[String] =
    vocabulary.filter(col("term").startsWith(prefix))
      .orderBy(desc("freq"), col("term"))
      .limit(max).select("term").collect().map(_.getString(0)).toSeq

  /**
   * Autocomplete (searcher.go:207-399): last token is treated as a prefix;
   * up to 3 candidate queries are scored BM25F and unioned, then globally
   * ranked. (Candidate ranking by ngram-LM happens in SpellCorrector; here
   * the frequency-ranked prefix expansion reproduces the no-typo path.)
   */
  def autocomplete(query: String, k: Int, offset: Int = 0): DataFrame = {
    val terms = Tokenizer.tokenize(query)
    if (terms.isEmpty) return docs.sparkSession.emptyDataFrame
    val completions = prefixCandidates(terms.last, max = 3)
    val candidateQueries =
      if (completions.isEmpty) Seq(terms)
      else completions.map(c => terms.init :+ c)
    val scored = candidateQueries.map(bm25f)
      .reduce(_ unionByName _)
      .groupBy("doc_id").agg(max("score").as("score"))
    val ranked = scored.orderBy(desc("score"), col("doc_id"))
      .limit(k + offset).offset(offset)
    broadcast(ranked).join(docs.withColumnRenamed(idCol, "doc_id"), Seq("doc_id"))
  }
}

object SearchIndex {
  /** Prebuilt index artifacts for the at-rest path; `vocab` rides along
   *  when the store persisted it (older stores rebuild it on access). */
  case class Tables(postingsName: DataFrame, postingsAddr: DataFrame,
                    lenName: DataFrame, lenAddr: DataFrame,
                    vocab: Option[DataFrame] = None)
}

/**
 * The index's AT-REST form — the engine twin of the reference server's
 * on-disk index load (indexer writes segments + metadata, the server mmaps
 * and serves, /root/reference/pkg/index): postings for both fields are
 * persisted as EXTERNAL BUCKETED tables keyed by `term` (query-term
 * lookups prune buckets and push `term IN (...)` to the scan), field
 * lengths and the doc table bucketed by `doc_id` (score joins co-locate),
 * all under one directory with lineage manifests. [[load]] in any later
 * session re-registers from the manifests and serves WITHOUT rebuilding —
 * [[graft.pipeline.TableIO.bucketedStage]] resume semantics.
 */
object SearchIndexStore {
  import graft.pipeline.TableIO

  val NBuckets = 8

  /**
   * Build and persist every index artifact; idempotent (completed stages
   * are skipped on re-run). Beyond the scoring tables, the MODEL artifacts
   * of the composed [[Searcher]] are persisted too — the engine twin of
   * the reference's ngram.index (ngram_lm.go:386-423), noisy_model.index
   * (spell_corrector.go:453-490) and term map (indexer.go:872-903):
   *  - `idx_vocab` (term, freq, df), bucketed by term;
   *  - `idx_dict` (t, term_id, lmid), bucketed by t;
   *  - `idx_spell_nbr` — the deletion neighborhood with lmid riding along,
   *    bucketed by del_key so query probes prune;
   *  - `idx_lm_counts` — keyed n-gram counts (n, gram_key, cnt), bucketed
   *    by gram_key so LM probes prune;
   *  - `idx_noisy` — the noisy-channel confusion counts.
   */
  def write(spark: SparkSession, docs: DataFrame, idCol: String,
            nameCol: String, addrCol: String, dir: String,
            spellErrorLines: Iterable[String] = Nil): Unit = {
    TableIO.bucketedStage(spark, dir, "idx_docs", "doc_id", NBuckets) {
      docs.withColumnRenamed(idCol, "doc_id")
    }
    val pn = TableIO.bucketedStage(spark, dir, "idx_postings_name", "term", NBuckets) {
      TextIndex.postings(docs, idCol, nameCol)
    }
    val pa = TableIO.bucketedStage(spark, dir, "idx_postings_addr", "term", NBuckets) {
      TextIndex.postings(docs, idCol, addrCol)
    }
    TableIO.bucketedStage(spark, dir, "idx_len_name", "doc_id", NBuckets) {
      TextIndex.fieldLengths(docs, idCol, nameCol)
    }
    TableIO.bucketedStage(spark, dir, "idx_len_addr", "doc_id", NBuckets) {
      TextIndex.fieldLengths(docs, idCol, addrCol)
    }
    // model artifacts derive from the STAGED postings (bucketed by term:
    // the term,doc_id grouping below re-uses the bucketing — no shuffle)
    val vocab = TableIO.bucketedStage(spark, dir, "idx_vocab", "term", NBuckets) {
      TextIndex.vocab(pn.unionByName(pa)
        .groupBy("term", "doc_id").agg(sum("tf").as("tf")))
    }
    val dict = TableIO.bucketedStage(spark, dir, "idx_dict", "t", NBuckets) {
      Searcher.dictOf(vocab)
    }
    TableIO.bucketedStage(spark, dir, "idx_spell_nbr", "del_key", NBuckets) {
      Searcher.neighborhoodOf(vocab, dict)
    }
    TableIO.bucketedStage(spark, dir, "idx_lm_counts", "gram_key", NBuckets) {
      graft.index.NGramLM.keyedCounts(
        Searcher.lmCountTables(docs, idCol, nameCol, addrCol, dict))
    }
    TableIO.stage(spark, dir, "idx_noisy") {
      graft.spell.SpellCorrector.noisyToDf(spark,
        graft.spell.SpellCorrector.buildNoisyModel(spellErrorLines))
    }
  }

  private def served(spark: SparkSession, dir: String)(name: String, key: String) =
    TableIO.bucketedStage(spark, dir, name, key, NBuckets) {
      sys.error(s"stage $name missing under $dir — run SearchIndexStore.write first")
    }

  /** Serve from the persisted artifacts (no rebuild, no in-session cache —
   *  the bucketed tables are the index). Works in a fresh session: the
   *  stages re-register from their manifests. */
  def load(spark: SparkSession, dir: String): SearchIndex = {
    val t = served(spark, dir) _
    val docs = t("idx_docs", "doc_id")
    // vocab stage is optional for backward compatibility with stores
    // written before the model artifacts existed
    val vocab = if (TableIO.isComplete(dir, "idx_vocab"))
      Some(t("idx_vocab", "term")) else None
    new SearchIndex(docs, "doc_id", "", "",
      prebuilt = Some(SearchIndex.Tables(
        t("idx_postings_name", "term"), t("idx_postings_addr", "term"),
        t("idx_len_name", "doc_id"), t("idx_len_addr", "doc_id"), vocab)))
  }

  /** Serve the COMPOSED [[Searcher]] from the persisted artifacts — the
   *  reference server's lifecycle (cmd/server/main.go:33-57): load, never
   *  rebuild. Every model structure stays a bucketed at-rest table; query
   *  probes prune at the scan. */
  def loadSearcher(spark: SparkSession, dir: String,
                   maxDriverVocab: Long = Searcher.DefaultMaxDriverVocab): Searcher = {
    val t = served(spark, dir) _
    val idx = load(spark, dir)
    val docs = t("idx_docs", "doc_id")
    val noisy = graft.spell.SpellCorrector.noisyFromDf(
      TableIO.stage(spark, dir, "idx_noisy") {
        sys.error(s"stage idx_noisy missing under $dir — run SearchIndexStore.write first")
      })
    new Searcher(docs, "doc_id", "", "",
      maxDriverVocab = maxDriverVocab,
      store = Some(Searcher.ModelTables(idx,
        t("idx_dict", "t"), t("idx_spell_nbr", "del_key"),
        t("idx_lm_counts", "gram_key"), Some(noisy))))
  }
}

/** Driver-side tokenizer — the exact same spec as the column version
 *  (Derived.tokens); query strings are tiny. */
object Tokenizer {
  def tokenize(s: String): Seq[String] =
    s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split("\\s+").toSeq
      .filter(_.nonEmpty)
}
