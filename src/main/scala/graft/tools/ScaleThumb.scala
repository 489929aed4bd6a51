package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.images.Images

/**
 * Scale-up evidence for the d7 reverse image lookup: synthesize a catalog
 * and thumbnail pile 10× the sf0.1 size directly from seeds (same
 * membership rules as [[Images.imageTable]]/[[Images.thumbTable]]), then
 * measure
 *  - banded mode (hamMax=3) WITH the maxBucket cap: wall time, candidate
 *    pairs actually joined, and recall of true (self) pairs;
 *  - the candidate pairs the UNCAPPED banding would have formed (computed
 *    from the band-bucket histogram, not by running it);
 *  - exact-fp mode (hamMax=0): wall time + output (the scale-clean path).
 *
 * Usage: runMain graft.tools.ScaleThumb [nCatalog] [cap]
 */
object ScaleThumb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val cap = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def synth(ids: DataFrame, thumb: Boolean): DataFrame = {
      val rdd = ids.rdd.mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        if (!thumb) {
          val fmt = if (id % 2 == 0) "png" else "jpeg"
          Some(Row(f"img_$id%012d", Images.encode(Images.pixels(id), fmt),
            Images.W, Images.H, fmt, "", 0L))
        } else None
      })
      spark.createDataFrame(rdd, Images.schema)
    }
    def synthThumbs(ids: DataFrame): DataFrame = {
      val rdd = ids.rdd.mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        def mk(seed: Long): Row = {
          val fmt = if (seed % 2 == 0) "png" else "jpeg"
          val px = Images.resizePx(Images.pixels(seed), Images.W, Images.H, 8, 8)
          Row(f"th_$seed%012d", Images.encodeWH(px, 8, 8, fmt), 8, 8, fmt)
        }
        (if (id % 3 != 2) Seq(mk(id)) else Nil) ++
          (if (id % 7 == 3) Seq(mk(id + Images.ForeignSeedOffset)) else Nil)
      })
      spark.createDataFrame(rdd, Images.thumbSchema)
    }

    val ids = spark.range(n).toDF("id").repartition(64)
    val catalog = synth(ids, thumb = false).persist()
    val thumbs = synthThumbs(ids).persist()
    val nCat = catalog.count(); val nTh = thumbs.count()
    println(s"THUMBSCALE catalog=$nCat thumbs=$nTh cap=$cap")

    // band-bucket telemetry: what would the UNCAPPED banding join?
    val catFp = Images.thumbFingerprints(catalog.withColumnRenamed("image_id", "cat_id"), "cat_id")
      .select(col("cat_id"),
        explode(Images.bandKeyArray(col("fp"), col("pxh"), 3)).as("band_key")).persist()
    val thFp = Images.thumbFingerprints(thumbs, "thumb_id")
      .select(col("thumb_id"),
        explode(Images.bandKeyArray(col("fp"), col("pxh"), 3)).as("band_key")).persist()
    val hist = catFp.groupBy("band_key").count().withColumnRenamed("count", "nc")
      .join(thFp.groupBy("band_key").count().withColumnRenamed("count", "nt"),
        Seq("band_key"), "full")
      .na.fill(0, Seq("nc", "nt"))
      .withColumn("tot", col("nc") + col("nt"))
      .persist()
    val uncappedPairs = hist.agg(sum(col("nc") * col("nt"))).head().getLong(0)
    val cappedPairs = hist.filter(col("tot") <= cap)
      .agg(coalesce(sum(col("nc") * col("nt")), lit(0L))).head().getLong(0)
    val nBuckets = hist.count()
    val nSkipped = hist.filter(col("tot") > cap).count()
    val hottest = hist.agg(max(col("tot"))).head().getLong(0)
    println(s"THUMBSCALE buckets=$nBuckets skipped=$nSkipped hottest=$hottest " +
      s"uncapped_pairs=$uncappedPairs capped_pairs=$cappedPairs " +
      f"(${uncappedPairs.toDouble / math.max(1, cappedPairs)}%.0fx fewer)")

    // capped banded run: wall + recall of true pairs
    val t0 = System.nanoTime()
    val capped = Images.thumbMatch(catalog, thumbs, hamMax = 3,
      maxBucket = Some(cap), lossyTol = 16).persist()
    val nOut = capped.count()
    val wallCapped = (System.nanoTime() - t0) / 1e9
    val selfSeed = substring(col("thumb_id"), 4, 12).cast("long")
    val nSelf = capped.filter(
      substring(col("thumb_id"), 4, 12) === substring(col("image_id"), 5, 12)).count()
    val nSelfPng = capped.filter(
      substring(col("thumb_id"), 4, 12) === substring(col("image_id"), 5, 12)
        && selfSeed % 2 === 0).count()
    val nDerived = thumbs.filter(
      substring(col("thumb_id"), 4, 12).cast("long") < Images.ForeignSeedOffset).count()
    val nDerivedPng = thumbs.filter(selfSeed < Images.ForeignSeedOffset
      && selfSeed % 2 === 0).count()
    println(f"THUMBSCALE banded+cap wall=$wallCapped%.1fs out=$nOut self=$nSelf " +
      f"derived=$nDerived recall=${nSelf.toDouble / nDerived}%.4f " +
      f"png_recall=${nSelfPng.toDouble / nDerivedPng}%.4f " +
      f"jpg_recall=${(nSelf - nSelfPng).toDouble / (nDerived - nDerivedPng)}%.4f")

    // exact-fp mode: the scale-clean path
    val t1 = System.nanoTime()
    val exact = Images.thumbMatch(catalog, thumbs, hamMax = 0,
      maxBucket = Some(cap), lossyTol = 16).persist()
    val nExact = exact.count()
    val wallExact = (System.nanoTime() - t1) / 1e9
    val nSelfExact = exact.filter(
      substring(col("thumb_id"), 4, 12) === substring(col("image_id"), 5, 12)).count()
    println(f"THUMBSCALE exact wall=$wallExact%.1fs out=$nExact self=$nSelfExact " +
      f"recall=${nSelfExact.toDouble / nDerived}%.4f")
    spark.stop()
  }
}
