package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.Bpe
import graft.sources.Derived

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merges chain: later rounds consume earlier merge outputs") {
    // 'ab' dominates, then 'abc' (= merged 'ab' + 'c') dominates round 2
    val docs = Seq(
      (1L, "abc abc abc abc abd"),
      (2L, "abc abc abd xy")
    ).toDF("doc_id", "text")
    val dict = Bpe.dictionary(docs, Derived.tokens(col("text")))
    val (merges, trained) = Bpe.train(dict, 3)
    assert(merges(0).l == "a" && merges(0).r == "b" && merges(0).freq == 8L)
    assert(merges(1).l == "ab" && merges(1).r == "c" && merges(1).freq == 6L)
    assert(merges(2).l == "ab" && merges(2).r == "d" && merges(2).freq == 2L)
    val reprs = trained.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(reprs("abc") == " abc ")
    assert(reprs("abd") == " abd ")
    assert(reprs("xy") == " x y ") // untouched by any merge
  }

  test("tie-break is (freq DESC, l ASC, r ASC)") {
    // pairs (a,b) and (c,d) both appear exactly twice; (a,b) must win
    val docs = Seq((1L, "ab cd ab cd")).toDF("doc_id", "text")
    val (merges, _) =
      Bpe.train(Bpe.dictionary(docs, Derived.tokens(col("text"))), 1)
    assert(merges.head.l == "a" && merges.head.r == "b")
  }

  test("double replace pins the delimiter-starved run semantics") {
    // one literal-replace pass over ' a a a a ' merges only the first pair
    // (the match consumes the shared delimiter); the second pass catches
    // the survivor — the engine/oracle-pinned contract from Bpe's scaladoc
    val one = Seq(" a a a a ").toDF("s")
      .select(replace(col("s"), lit(" a a "), lit(" aa ")))
      .head().getString(0)
    assert(one == " aa a a ")
    val docs = Seq((1L, "aaaa aaaa aaaa b")).toDF("doc_id", "text")
    val (merges, trained) =
      Bpe.train(Bpe.dictionary(docs, Derived.tokens(col("text"))), 1)
    assert(merges.head.l == "a" && merges.head.r == "a")
    val repr = trained.filter(col("term") === "aaaa").head().getString(2)
    assert(repr == " aa aa ")
  }

  test("golden: 6-run divergence from symbol-wise BPE is the pinned contract") {
    // two literal-replace passes over ' a a a a a a ' leave [aa, a, aa, a]
    // (4 symbols); Sennrich-style symbol-sequence merging would give
    // [aa, aa, aa]. The divergence on runs >= 5 is an explicit, documented
    // contract (Bpe scaladoc) — this golden keeps it from silently changing.
    val docs = Seq((1L, "aaaaaa aaaaaa b")).toDF("doc_id", "text")
    val (merges, trained) =
      Bpe.train(Bpe.dictionary(docs, Derived.tokens(col("text"))), 1)
    assert(merges.head.l == "a" && merges.head.r == "a" && merges.head.freq == 10L)
    val repr = trained.filter(col("term") === "aaaaaa").head().getString(2)
    assert(repr == " aa a aa a ")
  }

  test("tokenize: per-doc symbol count shrinks by exactly the merge hits") {
    val docs = Seq(
      (1L, "abc abc xy"), // 3+3+2 chars -> after 'a b'->'ab': 2+2+2
      (2L, "abd")
    ).toDF("doc_id", "text")
    val dict = Bpe.dictionary(docs, Derived.tokens(col("text")))
    val (_, trained) = Bpe.train(dict, 1) // merges (a,b) with freq 3
    val out = Bpe.tokenize(docs, "doc_id", Derived.tokens(col("text")), trained)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (6L, 3L)) // ab|c ab|c x|y = 2+2+2 symbols, 3 terms
    assert(out(2L) == (2L, 1L)) // ab|d
  }

  test("training rounds never touch the corpus: dictionary is vocab-sized") {
    // dictionary collapses duplicate terms BEFORE training — same merges
    // regardless of how many docs repeat a term
    val small = Seq((1L, "abc abd")).toDF("doc_id", "text")
    val big = Seq.tabulate(50)(i => (i.toLong, "abc abd")).toDF("doc_id", "text")
    val dSmall = Bpe.dictionary(small, Derived.tokens(col("text")))
    val dBig = Bpe.dictionary(big, Derived.tokens(col("text")))
    assert(dSmall.count() == 2 && dBig.count() == 2)
    val (mS, _) = Bpe.train(dSmall, 2)
    val (mB, _) = Bpe.train(dBig, 2)
    assert(mS.map(m => (m.l, m.r)) == mB.map(m => (m.l, m.r)))
    assert(mB.map(_.freq) == mS.map(_.freq * 50))
  }

  test("driver and distributed merge loops are bit-identical") {
    // run-heavy + tie-heavy corpus to exercise the double-replace and the
    // (freq DESC, l, r ASC) tie-break on both paths; 8 rounds exhausts
    // several pair generations
    val docs = Seq(
      (1L, "abc abc abc abd aaaa xy xy"),
      (2L, "abcd abcd aaaaaa cd cd ab"),
      (3L, "zz zz zz yy yy xy abc")
    ).toDF("doc_id", "text")
    val dict = Bpe.dictionary(docs, Derived.tokens(col("text")))
    def snap(t: (Seq[Bpe.Merge], org.apache.spark.sql.DataFrame)) =
      (t._1, t._2.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq)
    val driver = snap(Bpe.train(dict, 8)) // default threshold: driver path
    spark.conf.set(Bpe.DriverDictMaxKey, "0") // force distributed
    val dist = try snap(Bpe.train(dict, 8))
               finally spark.conf.unset(Bpe.DriverDictMaxKey)
    assert(driver._1 == dist._1, "merge sequences diverge between paths")
    assert(driver._2 == dist._2, "final dictionaries diverge between paths")
  }

  test("driver loop: rounds past pair exhaustion are no-ops on both paths") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val dict = Bpe.dictionary(docs, Derived.tokens(col("text")))
    val (m, trained) = Bpe.train(dict, 50) // far more rounds than pairs
    assert(m.size < 50 && m.nonEmpty)
    val reprs = trained.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(reprs("ab") == " ab " && reprs("cd") == " cd ")
    spark.conf.set(Bpe.DriverDictMaxKey, "0")
    val (mD, _) = try Bpe.train(dict, 50)
                  finally spark.conf.unset(Bpe.DriverDictMaxKey)
    assert(m == mD)
  }
}
