package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.Derived

/**
 * Text analysis operators for training-data curation: language ID
 * (stopword-hit heuristic), quality scoring, token counting, and document
 * fingerprinting. Every op is pure column arithmetic (codegen'd, no UDF)
 * and has an exact DuckDB SQL twin used by the verification oracle.
 */
object TextStats {

  /** Tiny per-language stopword lists (shared with the oracle SQL). */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "sich", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pas", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "no", "por", "que"))

  def stopwordHits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words: _*)))

  /** Language ID: argmax of stopword hits with fixed priority on ties
   *  (en > de > fr > es); zero hits everywhere -> 'und'. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Derived.tokens(col(textCol))
    val hits = Stopwords.map { case (l, ws) => l -> size(filter(toks, t => t.isin(ws: _*))) }
    val hm = hits.toMap
    val pred = when(hits.map(_._2).reduce(_ + _) === 0, lit("und"))
      .when(hm("en") >= hm("de") && hm("en") >= hm("fr") && hm("en") >= hm("es"), lit("en"))
      .when(hm("de") >= hm("fr") && hm("de") >= hm("es"), lit("de"))
      .when(hm("fr") >= hm("es"), lit("fr"))
      .otherwise(lit("es"))
    docs.select(col(idCol).as("doc_id"), pred.as("lang_pred"))
  }

  def langIdSqlCase(textExpr: String): String = {
    def hits(ws: Seq[String]) =
      s"len(list_filter(${Derived.tokensSql(textExpr)}, t -> t IN (${ws.map(w => s"'$w'").mkString(",")})))"
    val h = Stopwords.map { case (l, ws) => l -> hits(ws) }.toMap
    s"""CASE WHEN ${h("en")} + ${h("de")} + ${h("fr")} + ${h("es")} = 0 THEN 'und'
       | WHEN ${h("en")} >= ${h("de")} AND ${h("en")} >= ${h("fr")} AND ${h("en")} >= ${h("es")} THEN 'en'
       | WHEN ${h("de")} >= ${h("fr")} AND ${h("de")} >= ${h("es")} THEN 'de'
       | WHEN ${h("fr")} >= ${h("es")} THEN 'fr'
       | ELSE 'es' END""".stripMargin
  }

  /**
   * Quality signals per doc: token count, mean token length, punctuation
   * ratio, stopword ratio (en), digit ratio — and a composite score in
   * [0, 1] = clamp(0.25*sw + 0.25*(1-punct) + 0.25*(1-digit) +
   * 0.25*min(1, n_tokens/64)). All quantized 1e-4 for hash-stable compare.
   */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = Derived.tokens(t)
    val nTok = size(toks).cast("double")
    val meanLen = when(nTok > 0,
      aggregate(toks, lit(0.0), (a, x) => a + length(x)) / nTok).otherwise(lit(0.0))
    val punct = size(regexp_extract_all(t, lit("[.!?,;:]"), lit(0))).cast("double") /
      greatest(length(t).cast("double"), lit(1.0))
    val digit = size(regexp_extract_all(t, lit("[0-9]"), lit(0))).cast("double") /
      greatest(length(t).cast("double"), lit(1.0))
    val sw = when(nTok > 0, stopwordHits(toks, Stopwords.head._2).cast("double") / nTok)
      .otherwise(lit(0.0))
    val score = least(lit(1.0),
      lit(0.25) * sw + lit(0.25) * (lit(1.0) - punct) + lit(0.25) * (lit(1.0) - digit) +
        lit(0.25) * least(lit(1.0), nTok / 64.0))
    docs.select(col(idCol).as("doc_id"),
      nTok.cast("long").as("n_tokens"),
      Derived.q4(meanLen).as("mean_len4"),
      Derived.q4(punct).as("punct4"),
      Derived.q4(sw).as("stop4"),
      Derived.q4(score).as("quality4"))
  }

  def qualitySqlSelect(textExpr: String): Seq[String] = {
    val toks = Derived.tokensSql(textExpr)
    val nTok = s"CAST(len($toks) AS DOUBLE)"
    val meanLen = s"(CASE WHEN $nTok > 0 THEN list_sum(list_transform($toks, x -> len(x))) / $nTok ELSE 0.0 END)"
    val punct = s"(len(regexp_extract_all($textExpr, '[.!?,;:]')) / greatest(CAST(len($textExpr) AS DOUBLE), 1.0))"
    val digit = s"(len(regexp_extract_all($textExpr, '[0-9]')) / greatest(CAST(len($textExpr) AS DOUBLE), 1.0))"
    val en = Stopwords.head._2.map(w => s"'$w'").mkString(",")
    val sw = s"(CASE WHEN $nTok > 0 THEN len(list_filter($toks, t -> t IN ($en))) / $nTok ELSE 0.0 END)"
    val score = s"least(1.0, 0.25*$sw + 0.25*(1.0-$punct) + 0.25*(1.0-$digit) + 0.25*least(1.0, $nTok/64.0))"
    Seq(
      s"CAST($nTok AS BIGINT) AS n_tokens",
      s"${Derived.q4Sql(meanLen)} AS mean_len4",
      s"${Derived.q4Sql(punct)} AS punct4",
      s"${Derived.q4Sql(sw)} AS stop4",
      s"${Derived.q4Sql(score)} AS quality4")
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
   *  ([a-z0-9]+ runs and single non-space symbols over the lowercased text). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(Derived.tokens(col(textCol))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("bpe_tokens"))

  def tokenCountsSqlSelect(textExpr: String): Seq[String] = Seq(
    s"CAST(len(${Derived.tokensSql(textExpr)}) AS BIGINT) AS ws_tokens",
    s"CAST(len(regexp_extract_all(lower($textExpr), '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens")

  /** Position-weighted checksum fingerprint mod 1e9+7 — deterministic and
   *  SQL-twinable (sum over chars of ascii(c_i) * i). */
  val FpMod = 1000000007L
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val fp = aggregate(
      transform(sequence(lit(1), length(t)), i => ascii(t.substr(i, lit(1))).cast("long") * i),
      lit(0L), (a, x) => a + x) % FpMod
    docs.select(col(idCol).as("doc_id"), fp.as("fingerprint"))
  }

  def fingerprintSql(textExpr: String): String =
    s"CAST(list_sum(list_transform(range(1, len(lower($textExpr)) + 1), " +
      s"i -> CAST(ascii(substr(lower($textExpr), CAST(i AS INTEGER), 1)) AS BIGINT) * i)) % $FpMod AS BIGINT)"
}
