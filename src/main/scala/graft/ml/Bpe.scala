package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding vocabulary training + tokenization, the way a
 * large-corpus trainer actually scales: ONE corpus aggregation builds the
 * term-frequency dictionary, and every merge round after that runs on the
 * dictionary alone (vocabulary-bounded, corpus-size-independent — the
 * standard BPE trick since Sennrich et al. 2016). The corpus is touched
 * exactly twice: once to count terms, once (optionally) to re-tokenize.
 *
 * Symbol representation: a term's symbol sequence is a space-delimited
 * string with sentinel padding — `"abc"` → `" a b c "` — so a merge of
 * pair (l, r) is the literal replacement `" l r "` → `" lr "`. Literal
 * `replace` is left-to-right and non-overlapping in every engine
 * (java.lang.String, Spark's StringReplace, DuckDB), but one pass consumes
 * the shared delimiter between back-to-back matches (`" a a a a "` merges
 * only the first pair), so each round applies the replacement TWICE — a
 * fixed, engine-reproducible pass count. NOTE these pinned semantics are
 * engine-reproducible but NOT equivalent to Sennrich-style symbol-sequence
 * merging on same-symbol runs of length >= 5: two literal passes over
 * `" a a a a a a "` yield `[aa, a, aa, a]` where symbol-wise non-
 * overlapping merging yields `[aa, aa, aa]` (golden-pinned in BpeSpec), so
 * pair counts and token counts can differ from reference BPE
 * implementations on degenerate run-heavy corpora. The contract is
 * deterministic and identical across engines, which is what makes the
 * whole trainer value-level oracle-able in DuckDB: the oracle unrolls
 * every round — pair counts, argmax with (freq DESC, l ASC, r ASC)
 * tie-break, double replace — as plain SQL CTEs and must reproduce every
 * merge and every final symbol count bit-for-bit.
 *
 * TWO merge-loop paths, bit-identical by construction (parity-spec'd in
 * BpeSpec) and chosen by dictionary size:
 *
 *  - DRIVER loop (dictionaries at or under `spark.graft.bpe.driverDictMax`
 *    rows, default 4M — the common case: a vocabulary is corpus-size-
 *    independent): the (term, freq, repr) dictionary is collected ONCE and
 *    the merge rounds run in memory, SentencePiece-style — an incremental
 *    pair-count table plus a pair→terms occurrence index, so each round
 *    re-scans only the terms the winning merge actually touches. ZERO
 *    Spark jobs per round; 30k–50k production merge counts cost seconds
 *    (ScaleBpe: 1,000 merges over a 200k-term dictionary, BENCH.md).
 *    Argmax tie-break compares strings as UTF-8 BYTES — Spark's and
 *    DuckDB's binary string order, not Java's UTF-16 order.
 *  - DISTRIBUTED loop (past the threshold — a vocabulary too big to
 *    collect): one aggregation job over the dictionary plus a 1-row
 *    collect (the argmax pair) per round — the same bounded driver-loop
 *    shape as [[Ann.pqCentroids]]'s Lloyd rounds. Rounds cost seconds,
 *    never corpus scans, but 30k sequential jobs is the wrong tool when
 *    the dictionary fits the driver — hence the threshold.
 */
object Bpe {

  /** One trained merge: rank is 1-based round order. */
  final case class Merge(rank: Int, l: String, r: String, freq: Long)

  /** `"abc"` → `" a b c "` (sentinel-padded symbol string). */
  def charRepr(c: Column): Column =
    concat(lit(" "), regexp_replace(c, "(.)", "$1 "))

  /** Split a symbol string back into its symbols. */
  private def syms(repr: Column): Column =
    filter(split(repr, " "), t => t =!= "")

  /** Adjacent symbol pairs of a repr as (l, r) structs; empty for 1-symbol
   *  reprs. */
  private def pairs(repr: Column): Column = {
    val s = syms(repr)
    zip_with(slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))
  }

  /** Double literal replace — see class doc for why twice. */
  private def applyMerge(repr: Column, l: String, r: String): Column = {
    val from = s" $l $r "
    val to = s" $l$r "
    replace(replace(repr, lit(from), lit(to)), lit(from), lit(to))
  }

  /** Term-frequency dictionary of a token-array column: (term, freq, repr). */
  def dictionary(df: DataFrame, tokensCol: Column): DataFrame =
    df.select(explode(tokensCol).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .withColumn("repr", charRepr(col("term")))

  /** Conf key for the driver-loop dictionary ceiling (rows). */
  val DriverDictMaxKey = "spark.graft.bpe.driverDictMax"

  /** 4M (term, freq, repr) rows ≈ low single-digit GB of driver heap with
   *  string overheads — comfortably under the driver budget, far above any
   *  real tokenizer-training vocabulary. */
  val DriverDictMaxDefault = 4000000L

  /**
   * Train `rounds` merges over a (term, freq, repr) dictionary. Returns the
   * merge table and the final dictionary (repr rewritten by every merge).
   * Dictionaries at or under `spark.graft.bpe.driverDictMax` rows take the
   * in-memory driver loop; larger ones the per-round distributed loop —
   * see the class doc. Both paths are bit-identical (BpeSpec parity).
   */
  def train(dict: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    val cur = dict.select(col("term"), col("freq"), col("repr"))
      .localCheckpoint(true)
    val maxDriver = cur.sparkSession.conf.getOption(DriverDictMaxKey)
      .map(_.toLong).getOrElse(DriverDictMaxDefault)
    if (cur.count() <= maxDriver) trainDriver(cur, rounds)
    else trainDistributed(cur, rounds)
  }

  private def trainDistributed(dict: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    var cur = dict
    val merges = Seq.newBuilder[Merge]
    for (rank <- 1 to rounds) {
      val top = cur
        .select(col("freq"), explode(pairs(col("repr"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, cnt)
        cur = cur.withColumn("repr", applyMerge(col("repr"), l, r))
      }
    }
    (merges.result(), cur)
  }

  /** a < b in UTF-8 byte order — Spark's (UTF8String) and DuckDB's string
   *  comparison, which differs from Java's UTF-16 `compareTo` for
   *  supplementary characters. The driver argmax must match the engines'
   *  `ORDER BY l ASC, r ASC` bit-for-bit. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /**
   * In-memory merge loop over the collected dictionary: pair counts are
   * maintained INCREMENTALLY (each merge retracts/re-adds only the terms
   * whose repr contains the winning pair, found via a pair→terms index),
   * so round cost is proportional to the merge's footprint, not the
   * vocabulary. Pair counting, the (freq DESC, l, r UTF-8 ASC) argmax and
   * the double literal replace reproduce the distributed path exactly:
   * java.lang.String.replace is the same literal left-to-right
   * non-overlapping scan as Spark's StringReplace.
   */
  private def trainDriver(dict: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    import scala.collection.mutable
    val spark = dict.sparkSession
    val rows = dict.collect()
    val terms = rows.map(_.getString(0))
    val freqs = rows.map(_.getLong(1))
    val reprs = rows.map(_.getString(2))
    val cnt = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def pairsOf(repr: String): Array[(String, String)] = {
      val s = repr.split(" ").filter(_.nonEmpty)
      Array.tabulate(math.max(0, s.length - 1))(i => (s(i), s(i + 1)))
    }
    def add(i: Int): Unit = {
      val ps = pairsOf(reprs(i))
      ps.foreach(p => cnt.update(p, cnt.getOrElse(p, 0L) + freqs(i)))
      ps.distinct.foreach(p => where.getOrElseUpdate(p, mutable.HashSet.empty) += i)
    }
    def retract(i: Int): Unit = {
      val ps = pairsOf(reprs(i))
      ps.foreach { p =>
        val c = cnt(p) - freqs(i)
        if (c == 0L) cnt.remove(p) else cnt.update(p, c)
      }
      ps.distinct.foreach { p =>
        val s = where(p); s -= i; if (s.isEmpty) where.remove(p)
      }
    }
    reprs.indices.foreach(add)
    val merges = Seq.newBuilder[Merge]
    for (rank <- 1 to rounds if cnt.nonEmpty) {
      var best: (String, String) = null
      var bestC = Long.MinValue
      cnt.foreach { case (p, c) =>
        if (c > bestC || (c == bestC &&
            (utf8Lt(p._1, best._1) || (p._1 == best._1 && utf8Lt(p._2, best._2)))))
          { best = p; bestC = c }
      }
      val (l, r) = best
      merges += Merge(rank, l, r, bestC)
      val from = s" $l $r "
      val to = s" $l$r "
      // toArray: the retract/add below mutate `where` while we iterate
      where.getOrElse(best, mutable.HashSet.empty).toArray.foreach { i =>
        retract(i)
        reprs(i) = reprs(i).replace(from, to).replace(from, to)
        add(i)
      }
    }
    import spark.implicits._
    val out = terms.indices.map(i => (terms(i), freqs(i), reprs(i)))
      .toDF("term", "freq", "repr")
    (merges.result(), out)
  }

  /** Dictionaries under this row count broadcast for the tokenize join;
   *  larger vocabularies (a 100 TB crawl can reach 10^8 terms — past the
   *  executor broadcast budget) take the shuffle join instead. */
  val BroadcastDictMax = 10000000L

  /**
   * Tokenize a corpus with a trained dictionary: per doc, the total symbol
   * count after merges plus the pre-merge (whitespace-ish) token count —
   * the numbers a data pipeline reports per document when sizing shards.
   * A vocabulary-sized dictionary joins broadcast (the corpus never
   * shuffles on anything but the final doc-level aggregation); past
   * [[BroadcastDictMax]] rows the join falls back to a term-keyed shuffle.
   */
  def tokenize(df: DataFrame, idCol: String, tokensCol: Column,
               trained: DataFrame): DataFrame = {
    val nsyms = trained.select(col("term"),
      size(syms(col("repr"))).as("nsyms"))
    val dict = if (nsyms.count() <= BroadcastDictMax) broadcast(nsyms) else nsyms
    df.select(col(idCol), explode(tokensCol).as("term"))
      .join(dict, Seq("term"))
      .groupBy(col(idCol))
      .agg(sum(col("nsyms")).as("bpe_len"), count(lit(1)).as("n_terms"))
  }
}
