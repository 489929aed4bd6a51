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

  test("geo derivation from phash assigns in-region coordinates and cells") {
    val g = Images.withGeo(Images.imageTable(spark, TestSpark.Sf)).cache()
    val r = g.agg(min("lat"), max("lat"), min("lon"), max("lon")).head()
    assert(r.getDouble(0) >= -8.0 && r.getDouble(1) <= -6.0)
    assert(r.getDouble(2) >= 106.0 && r.getDouble(3) <= 111.0)
    assert(g.filter(col("cell") < 0).count() == 0)
  }
}
