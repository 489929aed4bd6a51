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
 * Each training round is one aggregation job over the dictionary plus a
 * 1-row collect (the argmax pair) — the same bounded driver-loop shape as
 * [[Ann.pqCentroids]]'s Lloyd rounds. At 100 TB the dictionary is still
 * vocabulary-sized (tens of millions of rows at worst), so rounds cost
 * seconds, not corpus scans.
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

  /**
   * Train `rounds` merges over a (term, freq, repr) dictionary. Returns the
   * merge table and the final dictionary (repr rewritten by every merge).
   * The dictionary is materialized once up front; each round's plan is the
   * checkpointed dict plus `2*round` literal replaces — vocabulary-scale
   * work per round, never corpus-scale.
   */
  def train(dict: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    var cur = dict.select(col("term"), col("freq"), col("repr"))
      .localCheckpoint(true)
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
