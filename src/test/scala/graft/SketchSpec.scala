package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.Sketch

class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed stream: two heavy items among a long tail of distinct noise
  private def skewed(nNoise: Int) =
    (Seq.fill(400)("alpha") ++ Seq.fill(250)("beta") ++
      (0 until nNoise).map(i => s"noise$i"))
      .zipWithIndex.map { case (s, i) => (s, i) } // vary order via index
      .sortBy(_._2 * 37 % 1009).map(_._1).toDF("item")

  private def exact(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val total = df.count()
    df.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > total)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("heavy hitters equal the exact groupBy + threshold") {
    val df = skewed(800) // 1450 rows; alpha 27.6%, beta 17.2%
    for (k <- Seq(3, 5, 6, 10)) {
      val got = Sketch.heavyHitters(df, "item", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exact(df, k), s"k=$k")
    }
    // the fixture is real: beta (17.2%) clears 1/6 but not 1/5
    assert(exact(df, 6).keySet == Set("alpha", "beta"))
    assert(exact(df, 5).keySet == Set("alpha"))
  }

  test("output is partition-count invariant (MG merge guarantee)") {
    val df = skewed(2000)
    val reference = Sketch.heavyHitters(df.coalesce(1), "item", 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    for (p <- Seq(3, 17, 32)) {
      val got = Sketch.heavyHitters(df.repartition(p), "item", 8)
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got == reference, s"partitions=$p")
    }
  }

  test("null items are excluded from candidates AND the total") {
    // 300 nulls + alpha 40/beta 30/30 noise. Non-null total = 100; with
    // k=3 alpha (40 > 100/3) qualifies. Counting nulls into the total
    // (n=400, bar 133) would wrongly drop alpha.
    val df = (Seq.fill(300)(null.asInstanceOf[String]) ++
      Seq.fill(40)("alpha") ++ Seq.fill(30)("beta") ++
      (0 until 30).map(i => s"n$i")).toDF("item").repartition(5)
    val got = Sketch.heavyHitters(df, "item", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("alpha" -> 40L))
  }

  test("cardinality above the counter budget still finds every heavy hitter") {
    // 40 distinct mid-weight items + 1 heavy, k = 4 counters: evictions
    // constantly churn the tiny summary, but the MG guarantee (an item with
    // freq > n/k survives every partial and the merge) must hold.
    // total = 1500, threshold = 375: only "big" (500) qualifies.
    val df = (Seq.fill(500)("big") ++
      (0 until 40).flatMap(i => Seq.fill(25)(s"mid$i"))).toDF("item")
    val got = Sketch.heavyHitters(df.repartition(7), "item", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("big" -> 500L))
  }

  test("no heavy hitters -> empty result, correct schema") {
    val df = (0 until 300).map(i => s"u$i").toDF("item")
    val out = Sketch.heavyHitters(df, "item", 10)
    assert(out.columns.toSeq == Seq("item", "cnt"))
    assert(out.count() == 0)
  }

  test("groupQuantiles: nearest-rank exactness vs sorted reference") {
    import graft.ml.TextStats
    // ragged groups incl. a single-element group and heavy ties
    val rows = Seq("a" -> 5, "a" -> 1, "a" -> 3, "a" -> 3, "a" -> 9,
      "b" -> 7, "c" -> 2, "c" -> 2, "c" -> 2, "c" -> 8)
    val df = rows.toDF("g", "v").repartition(5)
    val got = TextStats.groupQuantiles(df, "g", "v",
        Seq((1, 2), (9, 10), (99, 100)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def ref(vs: Seq[Int], nu: Int, de: Int): Long = {
      val sorted = vs.sorted
      val r = (vs.size * nu + de - 1) / de // ceil
      sorted(r - 1).toLong
    }
    for ((g, vs) <- rows.groupMap(_._1)(_._2)) {
      val (n, p50, p90, p99) = got(g)
      assert(n == vs.size)
      assert(p50 == ref(vs, 1, 2), s"$g p50")
      assert(p90 == ref(vs, 9, 10), s"$g p90")
      assert(p99 == ref(vs, 99, 100), s"$g p99")
    }
  }

  test("groupQuantiles: the window input is the histogram, not the corpus") {
    import graft.ml.TextStats
    // the Window must run over the post-aggregate histogram — at corpus
    // scale a per-group window over raw rows serializes the dominant group
    val df = (0 until 5000).map(i => ("g" + i % 3, i % 17)).toDF("g", "v")
    val plan = TextStats.groupQuantiles(df, "g", "v", Seq((1, 2)))
      .queryExecution.optimizedPlan.toString
    val windowIdx = plan.indexOf("Window")
    val aggBelow = plan.indexOf("Aggregate", windowIdx)
    assert(windowIdx >= 0 && aggBelow > windowIdx,
      s"window does not sit above the histogram aggregate:\n$plan")
  }

  test("groupQuantilesGeneral: continuous domain, nearest-rank vs sorted reference") {
    import graft.ml.TextStats
    // continuous doubles (no two equal except the tie pair), ragged groups,
    // one single-element group
    val rows = Seq("a" -> 0.51, "a" -> 0.13, "a" -> 0.331, "a" -> 0.331,
      "a" -> 0.97, "b" -> 7.25, "c" -> 2.5, "c" -> 2.125, "c" -> 0.008,
      "c" -> 8.875)
    val df = rows.toDF("g", "v").repartition(5)
    val got = TextStats.groupQuantilesGeneral(df, "g", "v",
        Seq((1, 2), (9, 10), (99, 100)), numPartitions = 7)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    def ref(vs: Seq[Double], nu: Int, de: Int): Double = {
      val sorted = vs.sorted
      val r = (vs.size * nu + de - 1) / de // ceil
      sorted(r - 1)
    }
    for ((g, vs) <- rows.groupMap(_._1)(_._2)) {
      val (n, p50, p90, p99) = got(g)
      assert(n == vs.size)
      assert(p50 == ref(vs, 1, 2), s"$g p50")
      assert(p90 == ref(vs, 9, 10), s"$g p90")
      assert(p99 == ref(vs, 99, 100), s"$g p99")
    }
  }

  test("groupQuantilesGeneral: agrees with the bounded-domain path on an integer domain") {
    import graft.ml.TextStats
    val df = (0 until 4000).map(i => ("g" + i % 3, (i * 37) % 101)).toDF("g", "v")
    def snap(out: org.apache.spark.sql.DataFrame) =
      out.select(col("g"), col("n"),
          col("p1_2").cast("long"), col("p9_10").cast("long"))
        .collect().map(_.toSeq).toSet
    val bounded = snap(TextStats.groupQuantiles(df, "g", "v", Seq((1, 2), (9, 10))))
    val general = snap(TextStats.groupQuantilesGeneral(df, "g", "v", Seq((1, 2), (9, 10))))
    assert(general == bounded)
  }

  test("groupQuantilesGeneral: one mega-group, and no window ever partitions by the group") {
    import graft.ml.TextStats
    // 50k-row group with all-distinct values (the case that defeats both
    // the bounded-histogram contract AND a per-group window) + a tiny group
    val df = (0 until 50000).map(i => ("hot", i * 0.001))
      .++(Seq(("cold", 1.5), ("cold", 2.5))).toDF("g", "v")
    val out = TextStats.groupQuantilesGeneral(df, "g", "v", Seq((1, 2)), numPartitions = 8)
    val plan = out.queryExecution.executedPlan.toString
    // every Window's partition spec must include pid — a [g]-partitioned
    // window over the histogram puts the whole hot group in one task
    val windowLines = plan.linesIterator.filter(_.matches(".*\\bWindow\\b.*")).toSeq
    assert(windowLines.nonEmpty)
    windowLines.foreach(l =>
      assert(l.contains("pid"), s"window not keyed by pid:\n$l"))
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange in plan:\n$plan")
    val got = out.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("hot") == 24.999 && got("cold") == 1.5) // rank 25000 of 0.001*i
  }
}
