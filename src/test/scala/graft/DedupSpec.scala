package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.{Ann, Dedup}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumped over the lazy dog"), // near dup
    (4L, "completely different text about spark engines"),
    (5L, "another unrelated document mentioning databases")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per text group") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2L) // docs 1+2 collapse, keep 1
    assert(out(3L) == 1L && out(4L) == 1L && out(5L) == 1L)
  }

  test("n-gram Jaccard finds the near-dup pair and not unrelated ones") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash: identical docs share full signature; candidates cover high-jaccard pairs") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text").cache()
    val rows = sigs.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows(1L) == rows(2L))
    val cands = Dedup.minhashCandidates(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(cands.contains((1L, 3L)))
  }

  test("simhash: identical docs identical hash; near dups within small hamming") {
    val sh = Dedup.simhash(docs, "doc_id", "text").cache()
    val m = sh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(m(1L), m(3L)) < hamming(m(1L), m(4L)))
    val pairs = Dedup.simhashPairs(sh, maxHamming = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("minhashCandidates maxBucket: hot buckets skipped, sparse buckets intact") {
    // 6 identical docs share every band bucket (bucket size 6); one
    // separate near-dup pair (1,3) lives in small buckets
    val hot = (10L to 15L).map(i => (i, "zzz qqq rrr sss identical hot bucket"))
    val all = (hot ++ Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumped over the lazy dog"))).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(all, "doc_id", "text")
    val uncapped = Dedup.minhashCandidates(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((10L, 11L)) && uncapped.contains((1L, 3L)))
    val capped = Dedup.minhashCandidates(sigs, maxBucket = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 3L)), "sparse-bucket pair must survive the cap")
    assert(!capped.exists(p => p._1 >= 10L), "hot-bucket pairs must be skipped")
  }

  test("dupClusters: transitive pairs collapse to min id, singletons keep themselves") {
    val nodes = (1L to 6L).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id1", "id2")
    val out = Dedup.dupClusters(nodes, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("jaccardPairs pins no cache after the query completes") {
    // the project cache rule: no library call may leave storage pinned with
    // no owner to unpersist it
    val before = spark.sharedState.cacheManager.isEmpty
    Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.7).count()
    assert(spark.sharedState.cacheManager.isEmpty == before,
      "jaccardPairs left a pinned cache entry behind")
  }

  test("minLabel outrun by the graph: throws without fallback, star-contracts with it") {
    // a 64-node path graph with maxIters=2: min-label + pointer jumping
    // covers distance ~2^r after r rounds, so 2 rounds cannot reach the far
    // end — without the fallback the call must throw, never silently
    // mislabel; with it (the default) the star algorithm finishes the job.
    // driverMax=0 forces the distributed loop (the driver fast path would
    // otherwise solve a 64-node graph before the loop runs).
    val nodes = (0L to 63L).map(Tuple1(_)).toDF("id")
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("id1", "id2")
    spark.conf.set("spark.graft.components.driverMax", "0")
    try {
      val e = intercept[IllegalStateException] {
        graft.ml.Components.minLabel(nodes, edges, maxIters = 2,
          starFallback = false).collect()
      }
      assert(e.getMessage.contains("did not converge"))
      val viaStar = graft.ml.Components.minLabel(nodes, edges, maxIters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaStar.values.forall(_ == 0L), "star fallback must label the full path")
      // the same graph converges directly with the default budget
      val ok = graft.ml.Components.minLabel(nodes, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ok.values.forall(_ == 0L))
    } finally spark.conf.unset("spark.graft.components.driverMax")
  }

  test("components driver fast path equals the distributed loop exactly") {
    // chains, a clique patch, isolates, a duplicate edge, and edges whose
    // endpoints are NOT in the node set (both paths must ignore them)
    val nodes = (0L until 500L).map(Tuple1(_)).toDF("id")
    val edges = ((0L until 200L by 2).map(i => (i, i + 1)) ++
      Seq((10L, 11L), (11L, 12L), (900L, 1L), (3L, 900L)) ++
      (300L until 340L).map(i => (i, i + 3))).toDF("id1", "id2")
    val viaDriver = graft.ml.Components.minLabel(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.graft.components.driverMax", "0")
    val viaDist =
      try graft.ml.Components.minLabel(nodes, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.graft.components.driverMax")
    assert(viaDriver == viaDist)
    assert(viaDriver(11L) == 10L && viaDriver(12L) == 10L) // chain + extension
    assert(viaDriver(1L) == 0L && !viaDriver.contains(900L)) // unknown ignored
    graft.ml.Components.releaseResults()
  }

  test("starComponents: high-diameter path + mixed components, O(log^2 n) rounds") {
    // 1000-node path (diameter 999) plus a separate triangle and isolates —
    // neighbor propagation would need ~1000 rounds; star contraction must
    // finish within its default 64-round budget
    val nodes = (0L until 1000L).map(Tuple1(_)).toDF("id")
    val path = (0L until 996L).map(i => (i, i + 1)) // 0..996 connected
    val tri = Seq((997L, 998L), (998L, 999L), (997L, 999L)) // disjoint triangle
    val edges = (path ++ tri).toDF("id1", "id2")
    val out = graft.ml.Components.starComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 996L).forall(i => out(i) == 0L), "path must collapse to 0")
    assert(Seq(997L, 998L, 999L).forall(i => out(i) == 997L), "triangle to 997")
    graft.ml.Components.releaseResults()
  }

  test("minLabel releases all persisted RDDs once results are released") {
    // other tests may hold their own caches in the shared session: compare
    // against the persisted-RDD set BEFORE the call, not against empty
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val nodes = (1L to 6L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L), (5L, 6L)).toDF("id1", "id2")
    // force the distributed loop — the driver fast path persists nothing
    spark.conf.set("spark.graft.components.driverMax", "0")
    try graft.ml.Components.minLabel(nodes, edges).count()
    finally spark.conf.unset("spark.graft.components.driverMax")
    graft.ml.Components.releaseResults()
    // allow the async (blocking=false) unpersists to drain
    val deadline = System.nanoTime() + 10e9.toLong
    def leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before).size
    while (leaked > 0 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(leaked == 0, s"$leaked RDDs still persisted after releaseResults")
  }

  test("md5Hash60: first 60 md5 bits, exact cross-engine goldens") {
    // goldens = int(hashlib.md5(s).hexdigest()[:15], 16) — the same value
    // DuckDB's CAST('0x' || substr(md5(s),1,15) AS BIGINT) produces
    val out = Seq("abc", "jakarta").toDF("t")
      .select(Dedup.md5Hash60(col("t"))).collect().map(_.getLong(0))
    assert(out(0) == 648541476951500027L)
    assert(out(1) == 444074144866726615L)
  }

  test("simhashWith md5 basis: same invariants as xxhash64, bits confined to 60") {
    val sh = Dedup.simhashWith(docs, "doc_id", "text", Dedup.md5Hash60, 60).cache()
    val m = sh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L)) // identical docs, identical signature
    assert(m.values.forall(v => (v >>> 60) == 0L)) // no bit above width
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(m(1L), m(3L)) < hamming(m(1L), m(4L)))
  }

  test("embedding cosine near-dup pairs via LSH buckets") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.2f)),
      (2L, Seq(0.99f, 0.01f, 0.0f, 0.2f)), // near dup of 1
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f, -0.4f))
    ).toDF("vec_id", "embedding")
    val bucketed = Ann.lshBuckets(vecs, "vec_id", "embedding", nBits = 6, dim = 4)
    val pairs = Ann.cosinePairs(bucketed, 0.99)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("spanDupStats: within-doc repeats, cross-doc shares, overlap-merged coverage") {
    val d = Seq(
      // "a b c" occurs twice within doc 1 (pos 0 and pos 3): both occurrences
      // dup; coverage = positions {0,1,2,3,4,5} = 6
      (1L, "a b c a b c"),
      // shares "x y z" with doc 3; overlapping dup spans "x y z" (pos 0) and
      // "y z w" (absent from 3) -> only pos-0 span dup; coverage = {0,1,2}
      (2L, "x y z w q"),
      (3L, "p p x y z"),
      // shorter than k: zero spans
      (4L, "one two")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDupStats(d, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((6L, 4L, 2L, 6L))) // spans at 0..3; pos0+pos3 dup; full cover
    assert(out(2L) == ((5L, 3L, 1L, 3L)))
    assert(out(3L) == ((5L, 3L, 1L, 3L))) // "x y z" at pos 2 -> cover {2,3,4}
    assert(out(4L) == ((2L, 0L, 0L, 0L)))
  }

  test("spanDupStats: merged-interval coverage never double-counts overlaps") {
    // "a b c d a b c d" (8 tokens, k=3): spans at 0..5; "a b c"(0,4) and
    // "b c d"(1,5) dup -> 4 dup occurrences covering {0..3} u {4..7} = 8
    val d = Seq((1L, "a b c d a b c d")).toDF("doc_id", "text")
    val r = Dedup.spanDupStats(d, "doc_id", "text", 3).head()
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((6L, 4L, 8L)))
  }

  test("spanRemove: keeps the globally-first occurrence, cuts the rest, rebuilds text") {
    val d = Seq(
      (1L, "a b c a b c"),  // within-doc dup: keeper (1,0), cut {3,4,5}
      (2L, "x y z w"),      // cross-doc keeper of "x y z"
      (3L, "x y z q"),      // non-kept occurrence: cut {0,1,2}
      (4L, "hi")            // shorter than k: untouched
    ).toDF("doc_id", "text")
    val out = Dedup.spanRemove(d, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("a b c", 3L)))
    assert(out(2L) == (("x y z w", 0L)))
    assert(out(3L) == (("q", 3L)))
    assert(out(4L) == (("hi", 0L)))
  }

  test("span hot path: forced-hot threshold reproduces the cold path exactly") {
    // hotThreshold=2 routes EVERY duplicated span through the broadcast hot
    // path; outputs must be bit-identical to the default (cold-join) path
    val d = Seq(
      (1L, "a b c a b c"),
      (2L, "x y z w q"),
      (3L, "p p x y z"),
      (4L, "one two")
    ).toDF("doc_id", "text")
    def snap() = (
      Dedup.spanDupStats(d, "doc_id", "text", 3).collect().map(_.toSeq).toSet,
      Dedup.spanRemove(d, "doc_id", "text", 3).collect().map(_.toSeq).toSet)
    val cold = snap()
    spark.conf.set(Dedup.HotSpanConfKey, "2")
    try assert(snap() == cold)
    finally spark.conf.unset(Dedup.HotSpanConfKey)
  }

  test("spanRemove plan has no span-keyed window (the hot-key hazard)") {
    // the old form computed n_occ/keep_key with Window.partitionBy(span) —
    // one task per span. The two-phase aggregate must leave NO window in
    // the plan at all (spanRemove has no other window).
    val d = Seq((1L, "a b c a b c"), (2L, "x y z w")).toDF("doc_id", "text")
    val plan = Dedup.spanRemove(d, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"span-keyed window still present:\n$plan")
  }

  test("simhashPairs maxBucket: degenerate all-identical corpus is bounded") {
    // 6 identical docs collapse into ONE signature -> every 16-bit band
    // bucket holds 6 docs (15 pairs x 4 bands uncapped); a separate
    // identical pair lives in size-2 buckets and must survive the cap
    val hot = (10L to 15L).map(i => (i, "zzz qqq rrr sss identical hot text"))
    val all = (hot ++ Seq(
      (1L, "completely different pair document"),
      (2L, "completely different pair document"))).toDF("doc_id", "text")
    val sigs = Dedup.simhash(all, "doc_id", "text").cache()
    try {
      val uncapped = Dedup.simhashPairs(sigs, maxHamming = 3)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(uncapped.contains((10L, 11L)) && uncapped.contains((1L, 2L)))
      val capped = Dedup.simhashPairs(sigs, maxHamming = 3, maxBucket = Some(4))
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(capped.contains((1L, 2L)), "sparse-bucket pair must survive the cap")
      assert(!capped.exists(_._1 >= 10L), "hot-bucket pairs must be skipped")
    } finally sigs.unpersist()
  }

  test("decontaminate: overlap with the bench set flags; hits count distinct spans") {
    val train = Seq(
      (1L, "the quick brown fox jumps"), // shares "the quick brown" + "quick brown fox" + "brown fox jumps"
      (2L, "entirely novel training text here"),
      (3L, "lazy dog sleeps all day") // shares "lazy dog sleeps"
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps high"),
      (101L, "a lazy dog sleeps")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((3L, true)))
    assert(out(2L) == ((0L, false)))
    assert(out(3L) == ((1L, true)))
  }

  test("decontam -> span-cut chain recounts dup spans over survivors only") {
    val train = Seq(
      (1L, "a b c x y z"),          // shares "a b c" with bench -> dropped
      (2L, "x y z q q"),            // shares "x y z" only with the DROPPED doc 1
      (3L, "totally different stuff here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    // without the drop, doc 2's "x y z" is duplicated (doc 1 holds the keeper)
    val uncut = Dedup.spanRemove(train, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uncut(2L) == 3L)
    // the chain: doc 1 dropped first, so doc 2's span is unique among survivors
    val cleanIds = Dedup.decontaminate(train, bench, "doc_id", "text", 3)
      .filter(!col("contaminated")).select(col("doc_id"))
    val out = Dedup.spanRemove(train.join(cleanIds, Seq("doc_id"), "left_semi"),
        "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(2L, 3L))
    assert(out(2L) == (("x y z q q", 0L)))
    assert(out(3L) == (("totally different stuff here", 0L)))
  }

  test("decontaminate: bench side is broadcast (no shuffle on the span join)") {
    val train = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val bench = Seq((2L, "c d e f")).toDF("doc_id", "text")
    val plan = Dedup.decontaminate(train, bench, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }
}
