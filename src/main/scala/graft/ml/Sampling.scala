package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic hash-based sampling for training-data mixing: every row
 * draws a ticket from a cross-engine hash of its key (+ a salt so
 * different sampling passes decorrelate) and survives iff
 * ticket < rate(stratum) * Tickets. This is how large pipelines subsample
 * and re-weight domains/languages: reproducible across runs, engines and
 * partitionings (no RNG state), map-side only (no shuffle), and two passes
 * with different salts are independent.
 */
object Sampling {

  val Tickets = 10000L

  /** Ticket in [0, Tickets): md5-60-bit of (key || salt), cross-engine
   *  (see [[Dedup.md5Hash60]]); nonnegative, so % is pmod. */
  def ticket(key: Column, salt: String): Column =
    Dedup.md5Hash60(concat(key.cast("string"), lit(salt))) % Tickets

  def ticketSql(keyExpr: String, salt: String): String =
    s"CAST('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || '$salt'), 1, 15) AS BIGINT) % $Tickets"

  /**
   * Stratified sample: keep a row iff its ticket clears the stratum's rate.
   * `rates` maps stratum value -> keep fraction (in units of 1/Tickets via
   * round), unknown strata fall back to `defaultRate`.
   *
   * The stratum -> cut mapping is a MAP-LITERAL lookup
   * (`element_at(map, stratum)`), not a `when(stratum === s, ...)` chain:
   * the chain form repeats the stratum expression once per branch inside a
   * CaseWhen — where Catalyst cannot eliminate the shared subexpression —
   * so a derived stratum (e.g. the language-ID expression, itself ~10
   * tokenizer evaluations) ran dozens of times per row (measured: 1.9 s vs
   * 0.3 s for the identical map-side work at sf0.1). The lookup references
   * the stratum exactly once, keeps the operator a pure map-side filter
   * (no join, no broadcast, no shuffle), and unknown strata fall through
   * `element_at`'s null to the default.
   */
  def stratifiedSample(df: DataFrame, keyCol: String, stratum: Column,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String): DataFrame = {
    val cuts: Map[String, Long] = rates.map { case (s, r) => s -> math.round(r * Tickets) }
    val cut = coalesce(element_at(typedLit(cuts), stratum.cast("string")),
      lit(math.round(defaultRate * Tickets)))
    df.filter(ticket(col(keyCol), salt) < cut)
  }
}
