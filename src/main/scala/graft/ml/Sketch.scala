package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Heavy hitters over a column — the two-pass exact algorithm built on a
 * MERGEABLE Misra-Gries sketch (Agarwal et al., "Mergeable Summaries"):
 *
 *   pass 1: each partition summarizes its stream into k counters
 *           (classic MG: new item evicts by decrementing all counters);
 *           the per-partition summaries (≤ k rows each) are merged on the
 *           driver by count-sum + (k+1)-th-largest subtraction. The MG
 *           guarantee survives merging: every item with global frequency
 *           > n/k is present in the merged summary, so the candidate set
 *           is a SUPERSET of the true heavy hitters regardless of
 *           partitioning.
 *   pass 2: exact counts of the ≤ k candidates only (map-side filter on a
 *           broadcast literal set), threshold count·k > n.
 *
 * The output is therefore EXACT and deterministic — identical to a full
 * groupBy + threshold — while the full-cardinality shuffle never happens:
 * pass 1 moves k rows per partition to the driver, pass 2 shuffles only
 * candidate rows. At 10^12 tokens with vocabulary-scale cardinality a
 * plain groupBy must materialize the whole dictionary per partial
 * aggregate; this sketch keeps the first pass O(k) memory per task, which
 * is the point when the item column is high-cardinality (URLs, shingles,
 * n-grams). Oracle: plain GROUP BY count + HAVING in DuckDB — exact ==
 * exact, engine-independently.
 */
object Sketch {

  /** Per-partition Misra-Gries summary: at most k (item, residual) pairs.
   *  Residuals undercount true frequency by at most n_partition/k. */
  private def mgPartition(it: Iterator[String], k: Int): Iterator[(String, Long, Long)] = {
    val counters = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var n = 0L
    while (it.hasNext) {
      val s = it.next()
      n += 1
      counters.get(s) match {
        case Some(c) => counters.update(s, c + 1)
        case None =>
          if (counters.size < k) counters.update(s, 1L)
          else {
            // decrement-all eviction; drop exhausted counters
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1)
            }
            dead.foreach(counters.remove)
          }
      }
    }
    counters.iterator.map { case (s, c) => (s, c, 0L) } ++ Iterator(("", 0L, n))
  }

  /** Merge MG summaries: sum residuals per item, then restore the ≤ k
   *  invariant by subtracting the (k+1)-th largest residual. */
  private def mgMerge(partials: Seq[(String, Long)], k: Int): Map[String, Long] = {
    val summed = partials.groupMapReduce(_._1)(_._2)(_ + _)
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.collect { case (s, c) if c - cut > 0 => s -> (c - cut) }
    }
  }

  /**
   * Exact heavy hitters: every item with count·k > total, with its exact
   * count. `itemCol` is read as string. Output: (item, cnt), one row per
   * heavy hitter.
   *
   * NULL items are EXCLUDED from the stream (SQL-aggregate semantics:
   * they neither appear as candidates nor count toward `total`). Without
   * the filter a null row would inflate `total` — raising the count·k >
   * total bar for every real item — while never surviving as a candidate
   * (`isin` can't match null), i.e. a corpus where NULL itself is heavy
   * would be silently mis-thresholded. Callers who need the null group
   * counted should map it to a sentinel value first.
   */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    val strs = items.filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string").as("value")).as[String]
    val partials = strs.mapPartitions(it => mgPartition(it, k)).collect()
    val total = partials.collect { case (_, _, n) if n > 0 => n }.sum
    val candidates = mgMerge(
      partials.collect { case (s, c, _) if c > 0 => (s, c) }.toSeq, k).keys.toSeq
    if (candidates.isEmpty) return strs.limit(0)
      .select(col("value").as(itemCol), lit(0L).as("cnt"))
    strs.filter(col("value").isin(candidates: _*))
      .groupBy(col("value").as(itemCol)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > total)
      .select(col(itemCol), col("cnt"))
  }
}
