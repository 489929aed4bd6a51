package graft.spell

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed edit-distance candidate generation via deletion
 * neighborhoods (SymSpell-style) — the web-scale path for the reference's
 * FST x Levenshtein-DFA walk
 * (/root/reference/pkg/searcher/spell_corrector.go:273-302).
 *
 * [[SpellCorrector.editCandidates]] filters the whole vocabulary with
 * `levenshtein(term, token)` — a full scan per token, fine at the
 * reference's OSM vocabulary but a real ceiling when the vocabulary of a
 * 100-TB caption corpus is not driver- or scan-per-query-sized. The
 * neighborhood recasts it as an index lookup:
 *
 *  - INDEX TIME: every vocab term is exploded into its <=maxDel-deletion
 *    variants — (del_key, term, freq), ~(1 + L + L^2/2) rows per term —
 *    one distributed projection, persisted bucketed/sorted by del_key so
 *    query-time lookups prune (SymSpell's guarantee: lev(a,b) <= d implies
 *    the depth-d deletion neighborhoods of a and b intersect).
 *  - QUERY TIME: the token's own <=maxDel variants (a few dozen strings)
 *    select matching neighborhood rows by EQUALITY — pushdown-friendly
 *    `del_key IN (...)` instead of a vocabulary scan — and the exact
 *    `levenshtein` refine removes the false positives the intersection
 *    admits. No vocabulary collect, no full scan; per-token cost is
 *    O(|neighborhood(token)|) index probes.
 */
object SpellJoin {

  val MaxDeletes = 2

  /** 1-deletion variants of a string column, as an array (length n). */
  private def del1(t: Column): Column =
    transform(sequence(lit(1), length(t)), i =>
      concat(t.substr(lit(1), i - 1), t.substr(i + 1, length(t))))

  /** All distinct <=maxDel-deletion variants of `t`, including `t` itself.
   *  Pure column arithmetic (codegen'd) — no UDF. */
  def deletionVariantsCol(t: Column, maxDel: Int = MaxDeletes): Column = {
    require(maxDel >= 1 && maxDel <= 2, "deletion neighborhoods supported for maxDel 1..2")
    val d1 = del1(t)
    val all =
      if (maxDel == 1) concat(array(t), d1)
      else concat(array(t), d1, flatten(transform(d1, v => del1(v))))
    array_distinct(all)
  }

  /** Driver-side mirror of [[deletionVariantsCol]] for query tokens. */
  def deletionVariants(term: String, maxDel: Int = MaxDeletes): Seq[String] = {
    def d1(s: String): Seq[String] = s.indices.map(i => s.substring(0, i) + s.substring(i + 1))
    val one = d1(term)
    val out = if (maxDel == 1) term +: one else (term +: one) ++ one.flatMap(d1)
    out.distinct
  }

  /**
   * The deletion-neighborhood table of a vocabulary: (del_key, term, freq),
   * one row per (term, variant). Build once at index time; persist with
   * `TableIO.bucketedStage(..., key = "del_key", ...)` so query-time key
   * lookups are partition-pruned at 10^9-term scale.
   */
  def neighborhood(vocab: DataFrame, maxDel: Int = MaxDeletes): DataFrame =
    vocab.select(col("term"), col("freq"),
        explode(deletionVariantsCol(col("term"), maxDel)).as("del_key"))
      .select(col("del_key"), col("term"), col("freq"))

  /**
   * Edit-distance <= maxDist candidates of `token` from the neighborhood
   * table: key-equality probe + exact levenshtein refine. Returns
   * (term, freq, dist) — the same shape (and, by the SymSpell property,
   * the same rows) as the brute-force scan in
   * [[SpellCorrector.editCandidates]] / the t4_spell query.
   */
  def candidates(neighborhood: DataFrame, token: String, maxDist: Int = MaxDeletes): DataFrame = {
    require(maxDist <= MaxDeletes, s"neighborhood is built for <=$MaxDeletes deletions")
    val keys = deletionVariants(token, maxDist)
    neighborhood
      .filter(col("del_key").isin(keys: _*))
      .select(col("term"), col("freq")).distinct()
      .withColumn("dist", levenshtein(col("term"), lit(token), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }
}
