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
   */
  def stratifiedSample(df: DataFrame, keyCol: String, stratum: Column,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String): DataFrame = {
    val cut = rates.foldLeft(lit(math.round(defaultRate * Tickets))) {
      case (acc, (s, r)) => when(stratum === s, lit(math.round(r * Tickets))).otherwise(acc)
    }
    df.filter(ticket(col(keyCol), salt) < cut)
  }
}
