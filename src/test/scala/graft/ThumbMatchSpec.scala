package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.images.Images

/** d7 thumbnail → catalog reverse lookup: recall/precision over the mixed-
 *  codec table (the DuckDB oracle covers the lossless half value-level),
 *  the exact-fingerprint production mode, the maxBucket discriminativeness
 *  cap, and the no-cartesian plan shape. */
class ThumbMatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val catalog = Images.imageTable(spark, TestSpark.Sf).cache()
  private lazy val thumbs = Images.thumbTable(spark, TestSpark.Sf).cache()

  /** (derived thumb count, jpeg-origin derived count) from the table. */
  private lazy val derived = thumbs
    .withColumn("seed", substring(col("thumb_id"), 4, 12).cast("long"))
    .filter(col("seed") < Images.ForeignSeedOffset).cache()

  test("thumb table: derived (id%3!=2) and foreign (id%7==3) membership") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val nDocs = docs.count()
    val expDerived = docs.filter(col("doc_id") % 3 =!= 2).count()
    val expForeign = docs.filter(col("doc_id") % 7 === 3).count()
    assert(thumbs.count() == expDerived + expForeign)
    assert(derived.count() == expDerived)
    assert(nDocs > 0)
  }

  test("banded mode (ham<=3): lossless recall 1.0, lossy recall >= 0.8, precision 1.0") {
    val m = Images.thumbMatch(catalog, thumbs, hamMax = 3,
      maxBucket = None, lossyTol = 16).cache()
    // precision: every output pair is a true pair (thumb seed == catalog id)
    assert(m.filter(
      substring(col("thumb_id"), 4, 12) =!= substring(col("image_id"), 5, 12))
      .count() == 0)
    // recall per codec
    val truth = derived.select(col("seed"),
      (col("seed") % 2 === 0).as("lossless"))
    val hit = m.select(substring(col("thumb_id"), 4, 12).cast("long").as("seed"))
    val j = truth.join(hit, Seq("seed"), "left_anti")
    val missPng = j.filter(col("lossless")).count()
    val missJpg = j.filter(!col("lossless")).count()
    val nJpg = truth.filter(!col("lossless")).count()
    assert(missPng == 0, s"lossless pairs must all match, missed $missPng")
    assert(missJpg.toDouble / nJpg <= 0.2,
      s"jpeg recall ${1 - missJpg.toDouble / nJpg} below 0.8")
  }

  test("exact mode (ham=0): content-hash equi-join — the lossless tier, recall 1.0") {
    val m = Images.thumbMatch(catalog, thumbs, hamMax = 0,
      maxBucket = None, lossyTol = 16).cache()
    // pxh equality implies matrix equality (refine) implies aHash equality
    assert(m.filter(col("hamming") =!= 0).count() == 0)
    val pngSeeds = derived.filter(col("seed") % 2 === 0).select("seed")
    val miss = pngSeeds.join(
      m.select(substring(col("thumb_id"), 4, 12).cast("long").as("seed")),
      Seq("seed"), "left_anti").count()
    assert(miss == 0)
    // lossy rows match only when codec noise cancels exactly (rare by
    // design — the banded tier owns them); whatever matches must be a
    // subset of the banded result
    val banded = Images.thumbMatch(catalog, thumbs, hamMax = 3,
      maxBucket = None, lossyTol = 16)
    assert(m.join(banded, Seq("thumb_id", "image_id"), "left_anti").count() == 0)
  }

  test("maxBucket cap: output is a subset of uncapped; lossless self-recall >= 0.9") {
    val full = Images.thumbMatch(catalog, thumbs, hamMax = 3,
      maxBucket = None, lossyTol = 16)
    val capped = Images.thumbMatch(catalog, thumbs, hamMax = 3,
      maxBucket = Some(64), lossyTol = 16).cache()
    assert(capped.join(full, Seq("thumb_id", "image_id", "hamming"), "left_anti")
      .count() == 0)
    val pngSeeds = derived.filter(col("seed") % 2 === 0).select("seed")
    val nPng = pngSeeds.count()
    val hitPng = pngSeeds.join(
      capped.select(substring(col("thumb_id"), 4, 12).cast("long").as("seed")),
      Seq("seed"), "left_semi").count()
    assert(hitPng.toDouble / nPng >= 0.9,
      s"capped lossless recall $hitPng/$nPng below 0.9")
  }

  test("plan: band join is an equi-join — no cartesian, bytes not in the shuffle") {
    val m = Images.thumbMatch(catalog, thumbs, hamMax = 3,
      maxBucket = None, lossyTol = 16)
    val plan = m.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.toLowerCase.contains("broadcastnestedloop"))
  }

  test("at-rest catalog index: staged bucketed, served shuffle-free, result parity") {
    import graft.pipeline.TableIO
    val dir = java.nio.file.Files.createTempDirectory("thumb_idx").toString
    val idx = TableIO.bucketedStage(spark, dir, "thumb_fp_h3", "band_key", 8)(
      Images.catalogIndex(catalog, hamMax = 3))
    val direct = Images.thumbMatch(catalog, thumbs, hamMax = 3,
      maxBucket = None, lossyTol = 16)
    val served = Images.thumbMatchIndexed(idx, thumbs, hamMax = 3,
      maxBucket = None, lossyTol = 16)
    assert(served.join(direct, Seq("thumb_id", "image_id", "hamming"), "full")
      .filter(col("thumb_id").isNull || col("image_id").isNull).count() == 0)
    assert(served.count() == direct.count())
    // the catalog side of the serving join reads the bucketed table: its
    // scan is bucket-aware and carries no Exchange above it
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Images.thumbMatchIndexed(idx, thumbs, hamMax = 3,
        maxBucket = None, lossyTol = 16).queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"catalog scan not bucket-aware:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("corrupt thumbnail bytes are skipped, not fatal") {
    import org.apache.spark.sql.Row
    val corrupt = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("th_000000999999", Array[Byte](9, 9, 9), 8, 8, "png")), 1),
      Images.thumbSchema)
    val m = Images.thumbMatch(catalog, thumbs.limit(0).unionByName(corrupt),
      hamMax = 3, maxBucket = None, lossyTol = 16)
    assert(m.count() == 0)
  }
}
