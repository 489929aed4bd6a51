package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.images.Images

/** Per-row invariant from BASELINE.json input_hint: decoded pixels allclose
 *  (exact for png, PSNR >= 40 dB for jpeg) + caption equality. */
class ImagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("png encode/decode round-trips exactly") {
    val px = Images.pixels(123L)
    assert(Images.decode(Images.encode(px, "png")).sameElements(px))
  }

  test("jpeg decode stays within PSNR >= 40 dB of the source pixels") {
    for (id <- Seq(1L, 7L, 501L, 9999L)) {
      val px = Images.pixels(id)
      val decoded = Images.decode(Images.encode(px, "jpeg"))
      val p = Images.psnrDb(px, decoded)
      assert(p >= 40.0, s"id=$id psnr=$p")
    }
  }

  test("phash is deterministic and locality-sensitive to identity") {
    assert(Images.phash(Images.pixels(5L)) == Images.phash(Images.pixels(5L)))
    assert(Images.phash(Images.pixels(5L)) != Images.phash(Images.pixels(6L)))
  }

  test("image table carries the input_hint schema and verifies end-to-end") {
    val imgs = Images.imageTable(spark, TestSpark.Sf).cache()
    assert(imgs.schema.fieldNames.toSeq ==
      Seq("image_id", "bytes", "w", "h", "fmt", "caption", "phash"))
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val verified = Images.decodeVerify(imgs, docs).cache()
    val n = verified.count()
    assert(n == docs.count())
    assert(verified.filter(!col("pixels_ok")).count() == 0)
    assert(verified.filter(!col("caption_ok")).count() == 0)
    // jpeg rows carry a finite PSNR >= 40 dB (psnr4 = dB x 1e4)
    assert(verified.filter(col("fmt") === "jpeg" && col("psnr4") < 400000L).count() == 0)
  }

  test("augment ops: involutions, rotation composition, content preserved") {
    val px = Images.pixels(42L)
    def aug(p: Array[Int], op: String) = Images.augmentPx(p, 16, 16, op)
    // flips and rot180 are involutions; rot90 four times is identity
    assert(aug(aug(px, "flip_h"), "flip_h").sameElements(px))
    assert(aug(aug(px, "flip_v"), "flip_v").sameElements(px))
    assert(aug(aug(px, "rot180"), "rot180").sameElements(px))
    assert(aug(aug(aug(aug(px, "rot90"), "rot90"), "rot90"), "rot90").sameElements(px))
    // rot90 twice == rot180; flip_h then flip_v == rot180
    assert(aug(aug(px, "rot90"), "rot90").sameElements(aug(px, "rot180")))
    assert(aug(aug(px, "flip_h"), "flip_v").sameElements(aug(px, "rot180")))
    // permutation: multiset of pixels unchanged
    assert(aug(px, "rot90").sorted.sameElements(px.sorted))
    // spot value: flip_h moves (0,0) to (15,0)
    assert(aug(px, "flip_h")(15) == px(0))
  }

  test("augment query runs the mixed table: every decodable row, op by (id/2)%4") {
    val out = Images.augment(Images.imageTable(spark, TestSpark.Sf)).cache()
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    assert(out.count() == docs.count())
    val bad = out.withColumn("id", substring(col("image_id"), 5, 12).cast("long"))
      .filter(col("op") =!= element_at(
        typedLit(Images.AugmentOps), ((col("id") / 2) % 4).cast("int") + 1))
      .count()
    assert(bad == 0)
  }

  test("x10 multimodal curation: copies and cross-codec re-saves collapse, originals kept") {
    val imgs = Images.imageTable(spark, TestSpark.Sf)
    val resaves = Images.resaveTable(imgs).cache()
    // every zpx_ row decodes to the SAME matrix as its source (cross-codec)
    val srcChk = Images.decodeChk(imgs)
      .withColumnRenamed("chk", "src_chk")
      .withColumn("sid", substring(col("image_id"), 5, 12))
    val zpx = Images.decodeChk(resaves.filter(col("image_id").startsWith("zpx_")))
      .withColumn("sid", substring(col("image_id"), 5, 12))
    assert(zpx.join(srcChk.drop("image_id"), Seq("sid"))
      .filter(col("chk") =!= col("src_chk")).count() == 0)
    // the composed query never emits a copy row and sizes clusters right
    val out = graft.SparkEntry.queries("x10_mm_curation")(spark, TestSpark.Sf).cache()
    assert(out.filter(!col("image_id").startsWith("img_")).count() == 0)
    assert(out.filter(col("doc_id") % 5 === 0 && col("n_dup") < 2).count() == 0)
    assert(out.filter(col("doc_id") % 10 === 3 && col("n_dup") < 2).count() == 0)
    assert(out.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 10 =!= 3
      && col("n_dup") =!= 1).count() == 0)
  }

  test("corrupt bytes: transforms skip the row, decodeVerify reports it, nothing crashes") {
    import org.apache.spark.sql.Row
    val good = Images.imageTable(spark, TestSpark.Sf).limit(3)
    val corrupt = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("img_000000999999", Array[Byte](1, 2, 3), Images.W, Images.H,
          "png", "broken", 0L)), 1), Images.schema)
    val mixed = good.unionByName(corrupt)
    // transforms: corrupt row skipped, good rows intact
    assert(Images.resize(mixed, 8, 8).count() == 3)
    assert(Images.features(mixed).count() == 3)
    // verification: corrupt row REPORTED as pixels_ok=false / psnr4=-1
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq((999999L, "broken")).toDF("doc_id", "text"))
    val v = Images.decodeVerify(mixed, docs)
    val bad = v.filter(col("image_id") === "img_000000999999").collect()
    assert(bad.length == 1)
    assert(!bad(0).getAs[Boolean]("pixels_ok") && bad(0).getAs[Long]("psnr4") == -1L)
  }

  test("resizePx: dims, determinism, constant color preserved") {
    val flat = Array.fill(16 * 16)(0x336699)
    val small = Images.resizePx(flat, 16, 16, 4, 4)
    assert(small.length == 16)
    assert(small.forall(_ == 0x336699), "box resize of a constant image changed colors")
    val px = Images.pixels(42L)
    assert(Images.resizePx(px, 16, 16, 8, 8).toSeq == Images.resizePx(px, 16, 16, 8, 8).toSeq)
    // integer downscale = 2x2 box average with floor division (the
    // SQL-derivable arithmetic the f18b oracle re-derives)
    val half = Images.resizePx(px, 16, 16, 8, 8)
    for (i <- half.indices) {
      val ox = i % 8; val oy = i / 8
      for (c <- 0 to 2) {
        val exp = (0 until 4).map { j =>
          (px((oy * 2 + j / 2) * 16 + ox * 2 + j % 2) >> (8 * c)) & 0xff
        }.sum / 4
        assert(((half(i) >> (8 * c)) & 0xff) == exp, s"box avg wrong at $i ch$c")
      }
    }
    // non-integer ratio takes the fixed-point bilinear path, deterministic
    // and constant-preserving too
    val odd = Images.resizePx(flat, 16, 16, 5, 7)
    assert(odd.length == 35 && odd.forall(_ == 0x336699))
  }

  test("resizeVerify / featuresVerify: ok rows everywhere, corrupt rows report false") {
    import org.apache.spark.sql.Row
    val good = Images.imageTable(spark, TestSpark.Sf).limit(6)
    val rv = Images.resizeVerify(Images.resize(good, 8, 8), Images.W, Images.H, 16)
    assert(rv.count() == 6 && rv.filter(!col("resized_ok")).count() == 0)
    val fv = Images.featuresVerify(good, 30000, 24)
    assert(fv.count() == 6 && fv.filter(!col("means_ok") || !col("ahash_ok")).count() == 0)
    val corrupt = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("img_000000999998", Array[Byte](9, 9, 9), Images.W, Images.H,
          "png", "broken", 0L)), 1), Images.schema)
    val fvBad = Images.featuresVerify(corrupt, 30000, 24).collect()
    assert(fvBad.length == 1 && !fvBad(0).getAs[Boolean]("means_ok"))
  }

  test("resize over the binary column: schema kept, png output decodes to the resized pixels") {
    val imgs = Images.imageTable(spark, TestSpark.Sf).filter(col("fmt") === "png").limit(4)
    val resized = Images.resize(imgs, 8, 8)
    assert(resized.schema == Images.schema)
    val rows = resized.collect()
    assert(rows.forall(r => r.getAs[Int]("w") == 8 && r.getAs[Int]("h") == 8
      && r.getAs[String]("fmt") == "png"))
    // lossless path: decode(resized) == resizePx(decode(original)) exactly
    for (r <- rows) {
      val id = r.getAs[String]("image_id").stripPrefix("img_").toLong
      val expected = Images.resizePx(Images.pixels(id), Images.W, Images.H, 8, 8)
      assert(Images.decode(r.getAs[Array[Byte]]("bytes")).sameElements(expected),
        s"mismatch for ${r.getString(0)}")
    }
  }

  test("features: channel means and ahash exact for lossless rows") {
    val imgs = Images.imageTable(spark, TestSpark.Sf).filter(col("fmt") === "png").limit(4)
    val feats = Images.features(imgs).collect()
    assert(feats.nonEmpty)
    for (f <- feats) {
      val id = f.getAs[String]("image_id").stripPrefix("img_").toLong
      val px = Images.pixels(id)
      def mean(shift: Int) = px.map(p => ((p >> shift) & 0xff).toLong).sum * 10000 / px.length
      assert(f.getAs[Long]("mean_r4") == mean(16))
      assert(f.getAs[Long]("mean_g4") == mean(8))
      assert(f.getAs[Long]("mean_b4") == mean(0))
      assert(f.getAs[Long]("ahash") == Images.phash(px))
    }
  }

  test("geo derivation from phash assigns in-region coordinates and cells") {
    val g = Images.withGeo(Images.imageTable(spark, TestSpark.Sf)).cache()
    val r = g.agg(min("lat"), max("lat"), min("lon"), max("lon")).head()
    assert(r.getDouble(0) >= -8.0 && r.getDouble(1) <= -6.0)
    assert(r.getDouble(2) >= 106.0 && r.getDouble(3) <= 111.0)
    assert(g.filter(col("cell") < 0).count() == 0)
  }
}
