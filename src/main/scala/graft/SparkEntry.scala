package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.entry.{MlQueries, RasterQueries, SkewQueries, SpatialQueries, TextQueries}
import graft.images.Images
import graft.query.Spatial

/**
 * Driver contract — one `queries` entry per implemented operator from
 * SURVEY.md §2 (operator IDs in the names), with a DuckDB oracle twin in
 * `oracleSql` for EVERY query — including the approximate ops (SimHash via
 * a cross-engine md5-60-bit basis, LSH ANN / cosine pairs via
 * integer-arithmetic hyperplanes reproduced in SQL, IVF via full-probe ≡
 * brute force) and the image-binary ops: lossless rows are value-exact
 * (DuckDB re-derives the pixel matrix from doc_id), lossy rows are
 * invariant-verdict-checked per row (PSNR >= 40 dB / bounded feature
 * deviation), and tools/image_twin.py re-decodes BOTH formats with
 * from-scratch non-JVM decoders to close the self-verification loop.
 */
object SparkEntry {

  /**
   * Flagship: the north-rule pipeline in miniature on sf0.001 — synthesize
   * the image+caption table (input_hint schema), derive positions from
   * phash, cell-encode (tile assignment), then batch-kNN join a query set
   * against it and hydrate captions.
   */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val imgs = Images.withGeo(Images.imageTable(spark, dir))
      // bytes never travel through the join (SURVEY.md §7.4)
      .select(col("image_id"), col("caption"), col("lat"), col("lon"), col("cell"))
      .withColumn("id", xxhash64(col("image_id")))
    val queries = imgs.limit(8)
      .select(col("id").as("qid"), (col("lat") + 0.01).as("qlat"),
        (col("lon") - 0.01).as("qlon"))
    Spatial.knnJoin(imgs, queries, k = 5)
      .join(imgs.select(col("id"), col("image_id"), col("caption")), Seq("id"))
      .select(col("qid"), col("image_id"), col("caption"), col("dist_km"), col("rn"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SpatialQueries.queries ++ TextQueries.queries ++ MlQueries.queries ++
      SkewQueries.queries ++ RasterQueries.queries

  def oracleSql: Map[String, String] =
    SpatialQueries.oracles ++ TextQueries.oracles ++ MlQueries.oracles ++
      SkewQueries.oracles ++ RasterQueries.oracles
}
