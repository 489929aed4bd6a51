package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.TextIndex
import graft.query.SearchIndex
import graft.sources.Derived
import graft.sources.Derived.{q4Sql, q6, q6Sql}

/**
 * Full-text index + search queries over the documents table
 * (name field = text, address field = source), with DuckDB oracle twins
 * that recompute the identical scoring arithmetic
 * (/root/reference/pkg/searcher/scoring.go — see Search.scala).
 */
object TextQueries {

  /** Query terms: two name-field terms + one address-field term, all
   *  distinct (multiplicity 1 keeps the oracle SQL simple). */
  val QTerms = Seq("spark", "join", "src3")
  val Typo = "spqrk"
  val Prefix = "sp"

  private def docs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")

  // The index is a PERSISTED pipeline stage, not something rebuilt per
  // query (the reference server builds once at startup, serves thereafter —
  // indexer.go:672-768). Memoizing per (session, dir) gives every text
  // query the built/cached postings tables, so measured query times are
  // query cost, not index-build cost. Keyed on the session so a stopped
  // session's cached plans are never reused — and entries belonging to
  // stopped sessions are evicted on every access, so a long-lived JVM that
  // cycles sessions (test harnesses, repeated drivers) cannot accumulate
  // dead drivers' models.
  private val indexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), SearchIndex]
  private val searcherCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), graft.query.Searcher]
  private def evictStopped(): Unit = {
    indexCache.keys.foreach { case k @ (s, _) =>
      if (s.sparkContext.isStopped) indexCache.remove(k) }
    searcherCache.keys.foreach { case k @ (s, _) =>
      if (s.sparkContext.isStopped) searcherCache.remove(k) }
  }
  private def index(s: SparkSession, dir: String) = {
    evictStopped()
    indexCache.getOrElseUpdate((s, dir),
      new SearchIndex(docs(s, dir), "doc_id", "text", "source"))
  }

  private def searcher(s: SparkSession, dir: String) = {
    evictStopped()
    searcherCache.getOrElseUpdate((s, dir),
      new graft.query.Searcher(docs(s, dir), "doc_id", "text", "source",
        spellErrorLines = Seq("spark: spqrk, sprak")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A5: inverted postings with build-time tf (indexer.go:672-768)
    "a1_postings" -> ((s, dir) =>
      TextIndex.postings(docs(s, dir), "doc_id", "text")
        .filter(col("term").startsWith("s"))
        .orderBy(col("term"), col("doc_id"))),

    // A6: document frequency -> idf (scoring.go:26-51), name field
    "a6_df_idf" -> ((s, dir) => {
      val p = TextIndex.postings(docs(s, dir), "doc_id", "text")
      val n = docs(s, dir).count().toDouble
      p.groupBy("term").agg(count(lit(1)).as("df"))
        .select(col("term"), col("df"),
          q6(log10(lit(n) - col("df") + 0.5) - log10(col("df") + 0.5)).as("idf6"))
        .orderBy(col("term"))
    }),

    // A3: per-doc field length
    "a3_field_stats" -> ((s, dir) =>
      TextIndex.fieldLengths(docs(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // A4: docs count + average field length (inverted_index.go:342-354)
    "a4_avg_len" -> ((s, dir) => {
      val lens = TextIndex.fieldLengths(docs(s, dir), "doc_id", "text")
      lens.agg(count(lit(1)).as("docs_count"),
        Derived.q4(avg(col("len"))).as("avg_len4"))
    }),

    // A7: BM25F two-field search (scoring.go:9-76)
    "a7_bm25f" -> ((s, dir) =>
      index(s, dir).bm25f(QTerms)
        .select(col("doc_id"), q6(col("score")).as("score6"))
        .orderBy(desc("score6"), col("doc_id")).limit(15)),

    // A8: BM25+ merged field (scoring.go:143-181)
    "a8_bm25plus" -> ((s, dir) =>
      index(s, dir).bm25plus(QTerms)
        .select(col("doc_id"), q6(col("score")).as("score6"))
        .orderBy(desc("score6"), col("doc_id")).limit(15)),

    // A9: TF-IDF no-norm (scoring.go:183-228, faithful bug)
    "a9_tfidf" -> ((s, dir) =>
      index(s, dir).tfidf(QTerms)
        .select(col("doc_id"), q6(col("score")).as("score6"))
        .orderBy(desc("score6"), col("doc_id")).limit(15)),

    // A10: padded bigram counts (ngram_lm.go:139-160; 2 x <s> + </s>)
    "a10_bigrams" -> ((s, dir) => {
      val p = concat(array(lit("<s>"), lit("<s>")),
        Derived.tokens(col("text")), array(lit("</s>")))
      docs(s, dir).select(p.as("p"))
        .select(explode(expr(
          "transform(sequence(1, size(p) - 1), i -> struct(element_at(p, i) as w1, element_at(p, i + 1) as w2))")).as("b"))
        .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("w1"), col("w2")).limit(50)
    }),

    // T4: spell candidates at edit distance <= 2 from the vocabulary
    // (spell_corrector.go:273-302 recast as levenshtein on broadcast vocab)
    "t4_spell" -> ((s, dir) => {
      val v = TextIndex.vocab(TextIndex.postings(docs(s, dir), "doc_id", "text"))
      v.withColumn("dist", levenshtein(col("term"), lit(Typo)))
        .filter(col("dist") <= 2)
        .select(col("term"), col("freq"), col("dist"))
        .orderBy(col("dist"), desc("freq"), col("term"))
    }),

    // T4b: the SAME candidate set via the deletion-neighborhood equi-join
    // (SymSpell recast of spell_corrector.go:273-302) — the web-scale path:
    // key-equality probes into an index-time neighborhood table instead of
    // a per-token vocabulary scan. Oracle = t4's brute-force SQL, proving
    // the index path returns exactly the scan's rows.
    "t4b_spell_join" -> ((s, dir) => {
      val v = TextIndex.vocab(TextIndex.postings(docs(s, dir), "doc_id", "text"))
      graft.spell.SpellJoin.candidates(graft.spell.SpellJoin.neighborhood(v), Typo, 2)
        .select(col("term"), col("freq"), col("dist"))
        .orderBy(col("dist"), desc("freq"), col("term"))
    }),

    // SO3: prefix autocomplete candidates (FST prefix walk equivalent)
    "so3_prefix" -> ((s, dir) => {
      val v = TextIndex.vocab(TextIndex.postings(docs(s, dir), "doc_id", "text"))
      v.filter(col("term").startsWith(Prefix))
        .select(col("term"), col("freq"))
        .orderBy(desc("freq"), col("term")).limit(5)
    }),

    // SO1/J4: boolean AND via semi-join (boolean_query.go:150-167)
    "so1_and" -> ((s, dir) => {
      val p = TextIndex.postings(docs(s, dir), "doc_id", "text")
      p.filter(col("term") === "spark").select("doc_id")
        .join(p.filter(col("term") === "vector").select("doc_id"), Seq("doc_id"), "left_semi")
        .orderBy(col("doc_id"))
    }),

    // T5: full /api/search lifecycle (searcher.go:97-204) — tokenize,
    // BM25F score, distributed top-k, hydrate via broadcast join (J6)
    "t5_search_e2e" -> ((s, dir) =>
      index(s, dir).search("Spark, JOIN src3!", k = 10)
        .select(col("doc_id"), q6(col("score")).as("score6"), col("lang"), col("n_chars"))
        .orderBy(desc("score6"), col("doc_id"))),

    // T6: /api/autocomplete lifecycle (searcher.go:207-399) — last token is
    // a prefix, top-3 frequency-ranked completions, candidate queries BM25F
    // scored and unioned, max per doc, top-k, hydrate
    "t6_autocomplete" -> ((s, dir) =>
      index(s, dir).autocomplete("spark jo", k = 10)
        .select(col("doc_id"), q6(col("score")).as("score6"), col("lang"))
        .orderBy(desc("score6"), col("doc_id"))),

    // T7: the COMPOSED /api/search lifecycle including spell correction
    // (searcher.go:97-204 steps 3-9): the typo'd query corrects to exactly
    // QTerms, so the oracle is t5's SQL — the whole chain (candidate gen,
    // LM+noisy ranking, BM25F, top-k, hydration) is verified row-for-row
    "t7_freeform" -> ((s, dir) => {
      searcher(s, dir).freeFormQuery(s"$Typo join src3", k = 10)
        .select(col("doc_id"), q6(col("score")).as("score6"), col("lang"), col("n_chars"))
        .orderBy(desc("score6"), col("doc_id"))
    }),

    // SO4: PARSED boolean expression — shunting-yard + RPN evaluation
    // (boolean_query.go:43-148) over the postings table. With the
    // reference precedences NOT(3) > AND(2) > OR(1) the expression below
    // evaluates as spark AND ((join OR vector) NOT window)
    "so4_boolean_expr" -> ((s, dir) => {
      val p = TextIndex.postings(docs(s, dir), "doc_id", "text")
      graft.query.BooleanQuery.eval(p, "spark AND (join OR vector) NOT window")
        .orderBy(col("doc_id"))
    }),

    // SO-extra: OR/NOT — declared but unimplemented in the reference
    // (boolean_query.go:135-141); completed here as union/anti
    "so2_or_not" -> ((s, dir) => {
      val p = TextIndex.postings(docs(s, dir), "doc_id", "text")
      p.filter(col("term") === "spark").select("doc_id")
        .union(p.filter(col("term") === "vector").select("doc_id"))
        .distinct()
        .join(p.filter(col("term") === "window").select("doc_id"), Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))
    })
  )

  // ---- oracle SQL ----------------------------------------------------------

  private val T = Derived.tokensSql _

  /** Query-independent text-index CTEs (postings with tf + lengths, both
   *  fields, doc count). */
  val baseCtes: String =
    s"""tn AS (SELECT doc_id, unnest(${T("text")}) AS term FROM documents),
       |ta AS (SELECT doc_id, unnest(${T("source")}) AS term FROM documents),
       |pn AS (SELECT term, doc_id, COUNT(*) AS tf FROM tn GROUP BY 1, 2),
       |pa AS (SELECT term, doc_id, COUNT(*) AS tf FROM ta GROUP BY 1, 2),
       |ln AS (SELECT doc_id, len(${T("text")}) AS len FROM documents),
       |la AS (SELECT doc_id, len(${T("source")}) AS len FROM documents),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)""".stripMargin

  /** Shared text-index CTEs with the fixed QTerms query + its df. */
  val indexCtes: String =
    s"""$baseCtes,
       |q AS (SELECT unnest([${QTerms.map(t => s"'$t'").mkString(",")}]) AS term),
       |dfq AS (SELECT term, COUNT(*) AS df FROM (
       |  SELECT DISTINCT term, doc_id FROM (
       |    SELECT p.term, p.doc_id FROM pn p JOIN q ON p.term = q.term
       |    UNION ALL
       |    SELECT p.term, p.doc_id FROM pa p JOIN q ON p.term = q.term))
       |  GROUP BY term)""".stripMargin

  private val spellOracleSql: String =
    s"""WITH tn AS (SELECT doc_id, unnest(${T("text")}) AS term FROM documents),
       |v AS (SELECT term, COUNT(*) AS freq FROM tn GROUP BY term)
       |SELECT term, freq, CAST(levenshtein(term, '$Typo') AS INTEGER) AS dist
       |FROM v WHERE levenshtein(term, '$Typo') <= 2
       |ORDER BY dist, freq DESC, term""".stripMargin

  val oracles: Map[String, String] = Map(
    "a1_postings" ->
      s"""WITH tn AS (SELECT doc_id, unnest(${T("text")}) AS term FROM documents)
         |SELECT term, doc_id, COUNT(*) AS tf FROM tn WHERE term LIKE 's%'
         |GROUP BY term, doc_id ORDER BY term, doc_id""".stripMargin,

    "a6_df_idf" ->
      s"""WITH tn AS (SELECT doc_id, unnest(${T("text")}) AS term FROM documents),
         |pn AS (SELECT term, doc_id FROM tn GROUP BY 1, 2),
         |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
         |SELECT term, COUNT(*) AS df,
         |  ${q6Sql("log10((SELECT n FROM nn) - COUNT(*) + 0.5) - log10(COUNT(*) + 0.5)")} AS idf6
         |FROM pn GROUP BY term ORDER BY term""".stripMargin,

    "a3_field_stats" ->
      s"""SELECT doc_id, CAST(len(${T("text")}) AS BIGINT) AS len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "a4_avg_len" ->
      s"""SELECT COUNT(*) AS docs_count,
         |  ${q4Sql(s"AVG(CAST(len(${T("text")}) AS DOUBLE))")} AS avg_len4
         |FROM documents""".stripMargin,

    "a7_bm25f" ->
      s"""WITH $indexCtes,
         |avgn AS (SELECT AVG(CAST(len AS DOUBLE)) AS v FROM ln),
         |avga AS (SELECT AVG(CAST(len AS DOUBLE)) AS v FROM la),
         |contrib AS (
         |  SELECT doc_id,
         |    (w / (10.0 + w)) *
         |      (log10((SELECT n FROM nn) - df + 0.5) - log10(df + 0.5)) AS c
         |  FROM (
         |    SELECT p.doc_id, d.df,
         |      20.0 * p.tf / (1.0 + 0.95 * (l.len / (SELECT v FROM avgn) - 1.0)) AS w
         |    FROM pn p JOIN q ON p.term = q.term
         |      JOIN ln l ON p.doc_id = l.doc_id
         |      JOIN dfq d ON p.term = d.term
         |    UNION ALL
         |    SELECT p.doc_id, d.df,
         |      1.0 * p.tf / (1.0 + 0.95 * (l.len / (SELECT v FROM avga) - 1.0)) AS w
         |    FROM pa p JOIN q ON p.term = q.term
         |      JOIN la l ON p.doc_id = l.doc_id
         |      JOIN dfq d ON p.term = d.term))
         |SELECT doc_id, ${q6Sql("SUM(c)")} AS score6 FROM contrib
         |GROUP BY doc_id ORDER BY score6 DESC, doc_id LIMIT 15""".stripMargin,

    "a8_bm25plus" ->
      s"""WITH $indexCtes,
         |pm AS (SELECT term, doc_id, SUM(tf) AS tf FROM (
         |  SELECT * FROM pn UNION ALL SELECT * FROM pa) GROUP BY 1, 2),
         |dl AS (SELECT n.doc_id, CAST(n.len + a.len AS DOUBLE) AS dl
         |       FROM ln n JOIN la a ON n.doc_id = a.doc_id),
         |avgdl AS (SELECT AVG(dl) AS v FROM dl),
         |dfm AS (SELECT p.term, COUNT(*) AS df FROM pm p JOIN q ON p.term = q.term GROUP BY 1),
         |contrib AS (
         |  SELECT p.doc_id,
         |    (log10((SELECT n FROM nn) + 1.0) - log10(d.df)) *
         |    (1.0 + ((1.2 + 1.0) + p.tf) /
         |      (1.2 * (1.0 - 0.98 + 0.98 * l.dl / (SELECT v FROM avgdl)) + p.tf)) AS c
         |  FROM pm p JOIN q ON p.term = q.term
         |    JOIN dl l ON p.doc_id = l.doc_id
         |    JOIN dfm d ON p.term = d.term)
         |SELECT doc_id, ${q6Sql("SUM(c)")} AS score6 FROM contrib
         |GROUP BY doc_id ORDER BY score6 DESC, doc_id LIMIT 15""".stripMargin,

    "a9_tfidf" ->
      s"""WITH $indexCtes,
         |pm AS (SELECT term, doc_id, SUM(tf) AS tf FROM (
         |  SELECT * FROM pn UNION ALL SELECT * FROM pa) GROUP BY 1, 2),
         |dfm AS (SELECT p.term, COUNT(*) AS df FROM pm p JOIN q ON p.term = q.term GROUP BY 1),
         |contrib AS (
         |  SELECT p.doc_id,
         |    ((1.0 + log10(p.tf)) * (log10((SELECT n FROM nn)) - log10(d.df))) *
         |    ((1.0 + log10(1.0)) * (log10((SELECT n FROM nn)) - log10(d.df))) AS c
         |  FROM pm p JOIN q ON p.term = q.term
         |    JOIN dfm d ON p.term = d.term)
         |SELECT doc_id, ${q6Sql("SUM(c)")} AS score6 FROM contrib
         |GROUP BY doc_id ORDER BY score6 DESC, doc_id LIMIT 15""".stripMargin,

    "a10_bigrams" ->
      s"""WITH pads AS (SELECT ['<s>', '<s>'] || ${T("text")} || ['</s>'] AS p FROM documents),
         |b AS (SELECT unnest(p[1:len(p)-1]) AS w1, unnest(p[2:len(p)]) AS w2 FROM pads)
         |SELECT w1, w2, COUNT(*) AS cnt FROM b GROUP BY 1, 2
         |ORDER BY cnt DESC, w1, w2 LIMIT 50""".stripMargin,

    "t5_search_e2e" ->
      s"""WITH $indexCtes,
         |avgn AS (SELECT AVG(CAST(len AS DOUBLE)) AS v FROM ln),
         |avga AS (SELECT AVG(CAST(len AS DOUBLE)) AS v FROM la),
         |contrib AS (
         |  SELECT doc_id,
         |    (w / (10.0 + w)) *
         |      (log10((SELECT n FROM nn) - df + 0.5) - log10(df + 0.5)) AS c
         |  FROM (
         |    SELECT p.doc_id, d.df,
         |      20.0 * p.tf / (1.0 + 0.95 * (l.len / (SELECT v FROM avgn) - 1.0)) AS w
         |    FROM pn p JOIN q ON p.term = q.term
         |      JOIN ln l ON p.doc_id = l.doc_id
         |      JOIN dfq d ON p.term = d.term
         |    UNION ALL
         |    SELECT p.doc_id, d.df,
         |      1.0 * p.tf / (1.0 + 0.95 * (l.len / (SELECT v FROM avga) - 1.0)) AS w
         |    FROM pa p JOIN q ON p.term = q.term
         |      JOIN la l ON p.doc_id = l.doc_id
         |      JOIN dfq d ON p.term = d.term)),
         |top AS (
         |  SELECT doc_id, SUM(c) AS score FROM contrib GROUP BY doc_id
         |  ORDER BY score DESC, doc_id LIMIT 10)
         |SELECT t.doc_id, ${q6Sql("t.score")} AS score6, d.lang, d.n_chars
         |FROM top t JOIN documents d USING (doc_id)
         |ORDER BY score6 DESC, t.doc_id""".stripMargin,

    "t6_autocomplete" ->
      s"""WITH $baseCtes,
         |v AS (SELECT term, COUNT(*) AS freq FROM (
         |  SELECT term FROM tn UNION ALL SELECT term FROM ta) GROUP BY term),
         |cand AS (SELECT term AS cterm FROM v WHERE term LIKE 'jo%'
         |         ORDER BY freq DESC, term LIMIT 3),
         |qc AS (SELECT cterm, unnest(['spark', cterm]) AS term FROM cand),
         |dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM (
         |    SELECT term, doc_id FROM pn UNION ALL SELECT term, doc_id FROM pa)
         |  WHERE term IN (SELECT term FROM qc) GROUP BY term),
         |avgn AS (SELECT AVG(CAST(len AS DOUBLE)) AS v FROM ln),
         |avga AS (SELECT AVG(CAST(len AS DOUBLE)) AS v FROM la),
         |contrib AS (
         |  SELECT cterm, doc_id,
         |    (w / (10.0 + w)) *
         |      (log10((SELECT n FROM nn) - df + 0.5) - log10(df + 0.5)) AS c
         |  FROM (
         |    SELECT qc.cterm, p.doc_id, d.df,
         |      20.0 * p.tf / (1.0 + 0.95 * (l.len / (SELECT v FROM avgn) - 1.0)) AS w
         |    FROM pn p JOIN qc ON p.term = qc.term
         |      JOIN ln l ON p.doc_id = l.doc_id
         |      JOIN dfq d ON p.term = d.term
         |    UNION ALL
         |    SELECT qc.cterm, p.doc_id, d.df,
         |      1.0 * p.tf / (1.0 + 0.95 * (l.len / (SELECT v FROM avga) - 1.0)) AS w
         |    FROM pa p JOIN qc ON p.term = qc.term
         |      JOIN la l ON p.doc_id = l.doc_id
         |      JOIN dfq d ON p.term = d.term)),
         |perq AS (SELECT cterm, doc_id, SUM(c) AS score FROM contrib GROUP BY 1, 2),
         |best AS (SELECT doc_id, MAX(score) AS score FROM perq GROUP BY doc_id),
         |top AS (SELECT doc_id, score FROM best ORDER BY score DESC, doc_id LIMIT 10)
         |SELECT t.doc_id, ${q6Sql("t.score")} AS score6, d.lang
         |FROM top t JOIN documents d USING (doc_id)
         |ORDER BY score6 DESC, t.doc_id""".stripMargin,

    // identical to t5: the typo'd query must correct to exactly QTerms
    "t7_freeform" ->
      s"""WITH $indexCtes,
         |avgn AS (SELECT AVG(CAST(len AS DOUBLE)) AS v FROM ln),
         |avga AS (SELECT AVG(CAST(len AS DOUBLE)) AS v FROM la),
         |contrib AS (
         |  SELECT doc_id,
         |    (w / (10.0 + w)) *
         |      (log10((SELECT n FROM nn) - df + 0.5) - log10(df + 0.5)) AS c
         |  FROM (
         |    SELECT p.doc_id, d.df,
         |      20.0 * p.tf / (1.0 + 0.95 * (l.len / (SELECT v FROM avgn) - 1.0)) AS w
         |    FROM pn p JOIN q ON p.term = q.term
         |      JOIN ln l ON p.doc_id = l.doc_id
         |      JOIN dfq d ON p.term = d.term
         |    UNION ALL
         |    SELECT p.doc_id, d.df,
         |      1.0 * p.tf / (1.0 + 0.95 * (l.len / (SELECT v FROM avga) - 1.0)) AS w
         |    FROM pa p JOIN q ON p.term = q.term
         |      JOIN la l ON p.doc_id = l.doc_id
         |      JOIN dfq d ON p.term = d.term)),
         |top AS (
         |  SELECT doc_id, SUM(c) AS score FROM contrib GROUP BY doc_id
         |  ORDER BY score DESC, doc_id LIMIT 10)
         |SELECT t.doc_id, ${q6Sql("t.score")} AS score6, d.lang, d.n_chars
         |FROM top t JOIN documents d USING (doc_id)
         |ORDER BY score6 DESC, t.doc_id""".stripMargin,

    "t4_spell" -> spellOracleSql,

    // identical to t4_spell BY DESIGN: the deletion-neighborhood join must
    // return exactly the brute-force scan's candidate set
    "t4b_spell_join" -> spellOracleSql,

    "so3_prefix" ->
      s"""WITH tn AS (SELECT doc_id, unnest(${T("text")}) AS term FROM documents),
         |v AS (SELECT term, COUNT(*) AS freq FROM tn GROUP BY term)
         |SELECT term, freq FROM v WHERE term LIKE '$Prefix%'
         |ORDER BY freq DESC, term LIMIT 5""".stripMargin,

    "so1_and" ->
      s"""WITH tn AS (SELECT doc_id, unnest(${T("text")}) AS term FROM documents)
         |SELECT DISTINCT doc_id FROM tn WHERE term = 'spark'
         |INTERSECT SELECT DISTINCT doc_id FROM tn WHERE term = 'vector'
         |ORDER BY doc_id""".stripMargin,

    "so4_boolean_expr" ->
      s"""WITH tn AS (SELECT doc_id, unnest(${T("text")}) AS term FROM documents)
         |SELECT doc_id FROM (
         |  (SELECT DISTINCT doc_id FROM tn WHERE term IN ('join', 'vector')
         |   EXCEPT SELECT DISTINCT doc_id FROM tn WHERE term = 'window')
         |  INTERSECT SELECT DISTINCT doc_id FROM tn WHERE term = 'spark')
         |ORDER BY doc_id""".stripMargin,

    "so2_or_not" ->
      s"""WITH tn AS (SELECT doc_id, unnest(${T("text")}) AS term FROM documents)
         |SELECT doc_id FROM (
         |  SELECT DISTINCT doc_id FROM tn WHERE term IN ('spark', 'vector')
         |  EXCEPT SELECT DISTINCT doc_id FROM tn WHERE term = 'window')
         |ORDER BY doc_id""".stripMargin
  )
}
