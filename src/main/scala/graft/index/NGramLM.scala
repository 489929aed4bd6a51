package graft.index

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * 1–4-gram language model with stupid backoff, used to rank corrected-query
 * candidates.
 *
 * Count semantics are faithful to the reference
 * (/root/reference/pkg/searcher/ngram_lm.go):
 *  - each doc is padded with n x <s> and one </s> before counting n-grams
 *    (addStartEndToken, ngram_lm.go:373-384) — note n start tokens, one end
 *  - OOV: words with corpus freq < 2 become <UNK>
 *    (COUNT_THRESOLD_NGRAM=2, ngram_lm.go:69-110)
 *  - stupid backoff with lambda 0.4 per level (ngram_lm.go:323-342);
 *    estimateProbability returns 0 when the (n-1)-gram prefix is unseen
 *    (ngram_lm.go:213-321)
 *  - query log-prob: pad with 4 x <s> + </s>, sum log(backoff-4gram) from
 *    i=4 (ngram_lm.go:303-321)
 *
 * Distributed build: counts are `explode(sliding window) -> groupBy.count`
 * jobs; the count tables are small relative to the corpus (vocabulary
 * scale) and are collected/broadcast for query-time scoring, exactly like
 * the reference loads them into RAM (searcher.go:37-73).
 *
 * Special token IDs are fixed (deterministic, vs the reference's first-seen
 * order): <s>=0, </s>=1, <UNK>=2; real terms from TextIndex.termIds start
 * at 3.
 */
object NGramLM {
  val StartId = 0L
  val EndId = 1L
  val UnkId = 2L
  val CountThreshold = 2

  /** Build the n-gram count DataFrames from docs of term-ID arrays.
   *  Input df: single column `terms: array<long>`. Returns a DataFrame
   *  (n, gram array<long>, cnt) for n = 1..4, plus total word freq. */
  def countTables(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    (1 to 4).map { n =>
      val padded = concat(
        array_repeat(lit(StartId), n), col("terms"), array(lit(EndId)))
      docs.select(padded.as("p"))
        .select(explode(expr(s"transform(sequence(0, size(p) - $n), i -> slice(p, i + 1, $n))"))
          .as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
        .withColumn("n", lit(n))
    }.reduce(_ unionByName _)
  }

  /** Replace rare words with <UNK> (ngram_lm.go:69-110): corpus freq < 2. */
  def replaceOOV(docs: DataFrame): DataFrame = {
    val freqs = docs.select(explode(col("terms")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .filter(col("c") >= CountThreshold)
      .agg(collect_set(col("t")).as("keep"))
    docs.crossJoin(broadcast(freqs))
      .select(expr(s"transform(terms, t -> CASE WHEN array_contains(keep, t) THEN t ELSE ${UnkId}L END)").as("terms"))
  }

  /** Collected, broadcastable model for driver-side candidate ranking. */
  case class Model(uni: Map[Long, Long], bi: Map[Seq[Long], Long],
                   tri: Map[Seq[Long], Long], quad: Map[Seq[Long], Long],
                   totalWordFreq: Long) {

    /** estimateProbability (ngram_lm.go:213-321). */
    def estimate(next: Long, prev: Seq[Long], n: Int): Double = n match {
      case 1 => uni.getOrElse(next, 0L).toDouble / totalWordFreq
      case 2 =>
        uni.get(prev(0)) match {
          case None => 0.0
          case Some(d) => bi.getOrElse(Seq(prev(0), next), 0L).toDouble / d
        }
      case 3 =>
        bi.get(prev.take(2)) match {
          case None => 0.0
          case Some(d) => tri.getOrElse(prev.take(2) :+ next, 0L).toDouble / d
        }
      case 4 =>
        tri.get(prev.take(3)) match {
          case None => 0.0
          case Some(d) => quad.getOrElse(prev.take(3) :+ next, 0L).toDouble / d
        }
      case _ => 0.0
    }

    /** stupidBackoff (ngram_lm.go:323-342), lambda *= 0.4 per level. */
    def stupidBackoff(next: Long, prevIn: Seq[Long], nIn: Int): Double = {
      var prob = 0.0
      var lambda = 1.0
      var prev = prevIn
      var n = nIn
      while (n > 0) {
        prob = lambda * estimate(next, prev, n)
        if (prob != 0) return prob
        if (prev.length == 1) prev = Seq.empty
        else if (prev.nonEmpty) prev = prev.tail
        lambda *= 0.4
        n -= 1
      }
      prob
    }

    /** Query log-prob (ngram_lm.go:303-321 + GetQueryNgramProbability):
     *  pad 4 x <s> + </s>, sum log over positions 4..end. */
    def queryLogProb(query: Seq[Long]): Double = {
      val padded = Seq.fill(4)(StartId) ++ query :+ EndId
      (4 until padded.length).map { i =>
        math.log(stupidBackoff(padded(i), padded.slice(i - 3, i), 4))
      }.sum
    }
  }

  /**
   * AT-REST form of the count tables: (n, gram_key, cnt) with the gram as
   * a comma-joined string key — bucketable/sortable (Spark cannot bucket
   * by an array column), and query-time key lookups push `gram_key IN
   * (...)` to the scan, pruning buckets and row groups. The key is
   * unambiguous: n == number of comma-separated ids.
   */
  def keyedCounts(counts: DataFrame): DataFrame =
    counts.select(col("n"),
      array_join(col("gram").cast("array<string>"), ",").as("gram_key"),
      col("cnt"))

  /** Unigram total word frequency from the keyed table — compute ONCE at
   *  construction/load, never per query. */
  def keyedTotal(keyed: DataFrame): Long =
    Option(keyed.filter(col("n") === 1).agg(sum("cnt")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)

  /** [[collectModel]] over the keyed at-rest form. */
  def collectModelKeyed(keyed: DataFrame): Model = {
    val rows = keyed.select("n", "gram_key", "cnt").collect()
      .map(r => (r.getAs[Int]("n"),
        parseKey(r.getAs[String]("gram_key")), r.getAs[Long]("cnt")))
    def grams(n: Int): Map[Seq[Long], Long] =
      rows.filter(_._1 == n).map(r => r._2 -> r._3).toMap
    val uni = rows.filter(_._1 == 1).map(r => r._2.head -> r._3).toMap
    Model(uni, grams(2), grams(3), grams(4), uni.values.sum)
  }

  private def parseKey(k: String): Seq[Long] =
    if (k.isEmpty) Seq.empty else k.split(",").toSeq.map(_.toLong)
  private def toKey(g: Seq[Long]): String = g.mkString(",")

  /** Every gram a [[Model.queryLogProb]] walk over `q` can touch: for each
   *  padded position, the numerator and prefix grams of all four backoff
   *  levels — the exact lookup set of [[Model.stupidBackoff]]. */
  def neededGrams(q: Seq[Long]): Seq[Seq[Long]] = {
    val padded = Seq.fill(4)(StartId) ++ q :+ EndId
    (4 until padded.length).flatMap { i =>
      val Seq(p1, p2, p3) = padded.slice(i - 3, i)
      val nxt = padded(i)
      Seq(Seq(p1, p2, p3, nxt), Seq(p1, p2, p3), Seq(p2, p3, nxt),
        Seq(p2, p3), Seq(p3, nxt), Seq(p3), Seq(nxt))
    }
  }

  /**
   * PARTIAL model for a SMALL set of candidate queries, built with ONE
   * key-pruned lookup against the (possibly huge) keyed count table: the
   * union of every candidate's [[neededGrams]] becomes a `gram_key IN
   * (...)` filter (bucket- and row-group-prunable on the at-rest table; a
   * columnar in-memory filter on a cached one), and the collected counts —
   * probe-scale, never model-scale — populate a [[Model]] restricted to
   * those grams. Restricted and full models agree EXACTLY on the probed
   * queries because stupid backoff only ever consults the needed-gram set.
   *
   * `total` is the full unigram mass ([[keyedTotal]]), computed once at
   * construction — not per probe.
   */
  def probeModel(keyed: DataFrame, total: Long, queries: Seq[Seq[Long]]): Model = {
    val keys = queries.flatMap(neededGrams).distinct.map(toKey)
    val found: Map[String, Long] =
      if (keys.isEmpty) Map.empty
      else keyed.filter(col("gram_key").isin(keys: _*))
        .select("gram_key", "cnt")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byN = found.toSeq.map { case (k, c) => (parseKey(k), c) }.groupBy(_._1.length)
    def grams(n: Int): Map[Seq[Long], Long] = byN.getOrElse(n, Nil).toMap
    Model(grams(1).map { case (g, c) => g.head -> c }, grams(2), grams(3), grams(4), total)
  }

  /**
   * Distributed twin of [[Model.queryLogProb]] for a small candidate set:
   * one [[probeModel]] lookup (the model never leaves the cluster; the
   * collected counts are probe-scale — the reference's per-request
   * candidate list, searcher.go:97-204), then driver arithmetic identical
   * to the collected model. `candidates`: (cid, term-id sequence); returns
   * cid -> LM log-prob.
   */
  def queryLogProbsDistributed(counts: DataFrame,
                               candidates: Seq[(Int, Seq[Long])]): Map[Int, Double] = {
    if (candidates.isEmpty) return Map.empty
    val keyed = keyedCounts(counts)
    queryLogProbsProbed(keyed, keyedTotal(keyed), candidates)
  }

  /** [[queryLogProbsDistributed]] against a pre-keyed table with a
   *  precomputed total — the serving path: exactly one Spark job. */
  def queryLogProbsProbed(keyed: DataFrame, total: Long,
                          candidates: Seq[(Int, Seq[Long])]): Map[Int, Double] = {
    if (candidates.isEmpty) return Map.empty
    val m = probeModel(keyed, total, candidates.map(_._2))
    candidates.map { case (cid, q) => cid -> m.queryLogProb(q) }.toMap
  }

  /** Collect the count tables into a driver/broadcast Model. */
  def collectModel(counts: DataFrame): Model = {
    val rows = counts.collect()
    def grams(n: Int): Map[Seq[Long], Long] = rows.filter(_.getAs[Int]("n") == n)
      .map(r => (r.getAs[Seq[Long]]("gram"), r.getAs[Long]("cnt"))).toMap
    val uni = rows.filter(_.getAs[Int]("n") == 1)
      .map(r => (r.getAs[Seq[Long]]("gram").head, r.getAs[Long]("cnt"))).toMap
    val total = uni.values.sum
    Model(uni, grams(2), grams(3), grams(4), total)
  }
}
