package graft.images

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GeoFunctions
import graft.core.Cells

/**
 * The image+caption table per BASELINE.json `input_hint`:
 * (image_id string, bytes binary, w int, h int, fmt string, caption string,
 * phash long), synthesized deterministically (seeded per id) — pixels from
 * a per-image LCG, captions from the documents table, real PNG/JPEG bytes
 * via javax.imageio (present in the JDK; no external libs).
 *
 * The per-row invariant from `input_hint` — decoded pixels allclose
 * (PSNR >= 40 dB for lossy) + caption equality — is verified by
 * [[decodeVerify]], which re-derives the expected pixel matrix from the id
 * and compares against the decoded bytes.
 *
 * Spark-side plumbing is the real thing: binary column, typed schema,
 * partition-parallel encode/decode via mapPartitions (the pattern a
 * mapInPandas decode stage uses at scale), and `bytes` is projected away
 * before any shuffle (SURVEY.md §7.4 — image bytes never travel through
 * joins; spatial/text stages join back by image_id only).
 */
object Images {

  val W = 16
  val H = 16

  // Memory-backed ImageIO streams: the default file-cache mode creates and
  // deletes a temp file per encode/decode call, which dominates wall time
  // for 16x16 payloads (guide §1.2 step 2: per-task work). Output bytes and
  // decoded pixels are plugin-identical either way.
  ImageIO.setUseCache(false)

  // Per-thread codec instances: ImageIO.read/write walk the plugin registry
  // and construct a fresh reader/writer per call; the codec families decode
  // tens of thousands of tiny frames per task, so construction dominates.
  // Task threads are pooled and bounded, so so is the instance count. Same
  // plugin class => identical bytes and pixels (ImagesSpec goldens + the
  // DuckDB pixel oracles hold unchanged).
  private val pngWriterTL = ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
    ImageIO.getImageWritersByFormatName("png").next())
  private val jpegWriterTL = ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
    ImageIO.getImageWritersByFormatName("jpeg").next())
  private val pngReaderTL = ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
    ImageIO.getImageReadersByFormatName("png").next())
  private val jpegReaderTL = ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
    ImageIO.getImageReadersByFormatName("jpeg").next())

  private def readWith(tl: ThreadLocal[javax.imageio.ImageReader],
                       bytes: Array[Byte]): BufferedImage = {
    val reader = tl.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally {
      reader.setInput(null)
      iis.close()
    }
  }

  /** Right-size the partitioning of a synthesis root: the sf documents
   *  table ships as ONE parquet split, which would serialize every per-row
   *  codec stage on one core (the [[graft.ml.Curation.plan]] fan-out-root
   *  lesson). No-op at warehouse scale, where inputs already carry >=
   *  defaultParallelism splits. */
  private[images] def parallelized(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  /** Deterministic RGB pixels for image `id`: smooth per-channel gradients
   *  with LCG-seeded offsets/slopes. Smooth content keeps JPEG at
   *  quality 0.95 comfortably above the 40 dB PSNR invariant (pure noise
   *  would be the JPEG worst case and fail it by construction). */
  def pixels(id: Long): Array[Int] = {
    var s = id * 6364136223846793005L + 1442695040888963407L
    def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L; ((s >>> 40) & 0xff).toInt }
    val r0 = next(); val g0 = next(); val b0 = next()
    val rx = next() % 9 - 4; val ry = next() % 9 - 4
    val gx = next() % 9 - 4; val gy = next() % 9 - 4
    val bx = next() % 9 - 4; val by = next() % 9 - 4
    @inline def clamp(v: Int) = math.max(0, math.min(255, v))
    Array.tabulate(W * H) { i =>
      val x = i % W; val y = i / W
      val r = clamp(r0 + rx * x + ry * y)
      val g = clamp(g0 + gx * x + gy * y)
      val b = clamp(b0 + bx * x + by * y)
      (r << 16) | (g << 8) | b
    }
  }

  /** 64-bit average-hash of a 64-pixel (8×8) matrix: bit i = gray_i >
   *  mean(gray) — the thumbnail form of [[phash]], whose 2×2 cell means
   *  reduce to exactly these pixels when the input is already 8×8. */
  def ahash8(px: Array[Int]): Long = {
    require(px.length == 64, s"ahash8 wants 64 pixels, got ${px.length}")
    val gray = px.map { p =>
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      (r * 299 + g * 587 + b * 114) / 1000
    }
    val mean = gray.sum / 64
    gray.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v > mean) acc | (1L << i) else acc
    }
  }

  /** 64-bit average-hash (aHash) over the gray values of the pixel matrix. */
  def phash(px: Array[Int]): Long = {
    // 8x8 downsample of the 16x16 grid -> 64 cells, bit = cell mean > global mean
    val gray = px.map { p =>
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      (r * 299 + g * 587 + b * 114) / 1000
    }
    val cells = Array.tabulate(64) { i =>
      val cx = i % 8; val cy = i / 8
      var sum = 0
      var dy = 0
      while (dy < 2) { var dx = 0; while (dx < 2) {
        sum += gray((cy * 2 + dy) * W + cx * 2 + dx); dx += 1 }; dy += 1 }
      sum / 4
    }
    val mean = cells.sum / 64
    cells.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v > mean) acc | (1L << i) else acc
    }
  }

  def toBufferedImage(px: Array[Int], w: Int = W, h: Int = H): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  def encode(px: Array[Int], fmt: String): Array[Byte] = encodeWH(px, W, H, fmt)

  def encodeWH(px: Array[Int], w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = toBufferedImage(px, w, h)
    val bos = new ByteArrayOutputStream()
    if (fmt == "jpeg") {
      val writer = jpegWriterTL.get()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(0.95f)
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), params)
      writer.setOutput(null); ios.close()
    } else if (fmt == "png") {
      val writer = pngWriterTL.get()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      // same call chain ImageIO.write(img, "png", bos) bottoms out in:
      // default param, no metadata — byte-identical output
      writer.write(null, new IIOImage(img, null, null), null)
      writer.setOutput(null); ios.close()
    } else {
      ImageIO.write(img, fmt, bos)
    }
    bos.toByteArray
  }

  /** Strict decode for trusted bytes (tests, freshly-encoded buffers). */
  def decode(bytes: Array[Byte]): Array[Int] =
    tryDecode(bytes).getOrElse(
      throw new IllegalArgumentException("undecodable image bytes"))

  /** Decode that survives corrupt rows: ImageIO returns null (or throws)
   *  on undecodable bytes, and at 10^12 rows one bad row must not kill the
   *  job. Transform ops ([[resize]], [[features]]) SKIP corrupt rows; the
   *  verification op ([[decodeVerify]]) REPORTS them (pixels_ok=false,
   *  psnr4=-1) — filter-then-transform, never a crash, never a silent
   *  pass. */
  def tryDecode(bytes: Array[Byte]): Option[Array[Int]] =
    try {
      // sniff the two formats the tables carry and reuse the thread-local
      // reader (same plugin ImageIO.read would pick); anything else falls
      // through to the registry path, so behavior for odd-but-valid bytes
      // is unchanged. A post-magic corrupt row throws inside read -> None,
      // exactly like the registry path.
      val img =
        if (bytes.length >= 8 && bytes(0) == 0x89.toByte && bytes(1) == 'P'.toByte &&
            bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
          readWith(pngReaderTL, bytes)
        else if (bytes.length >= 2 && bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte)
          readWith(jpegReaderTL, bytes)
        else ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val out = new Array[Int](img.getWidth * img.getHeight)
        img.getRGB(0, 0, img.getWidth, img.getHeight, out, 0, img.getWidth)
        var i = 0
        while (i < out.length) { out(i) &= 0xffffff; i += 1 }
        Some(out)
      }
    } catch { case _: Exception => None }

  /** PSNR (dB) between two RGB pixel arrays; +Inf for identical. */
  def psnrDb(a: Array[Int], b: Array[Int]): Double = {
    var se = 0.0
    var n = 0
    var i = 0
    while (i < a.length) {
      var c = 0
      while (c < 3) {
        val d = ((a(i) >> (8 * c)) & 0xff) - ((b(i) >> (8 * c)) & 0xff)
        se += d.toDouble * d; n += 1; c += 1
      }
      i += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 * n / se)
  }

  val schema: StructType = StructType(Seq(
    StructField("image_id", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("fmt", StringType, nullable = false),
    StructField("caption", StringType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** Build the image table from the documents table (caption = text),
   *  encoding pixels partition-parallel. fmt cycles png/jpeg by id. */
  def imageTable(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = parallelized(spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")))
    val rdd = docs.rdd.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      val fmt = if (id % 2 == 0) "png" else "jpeg"
      val px = pixels(id)
      Row(f"img_$id%012d", encode(px, fmt), W, H, fmt, r.getString(1), phash(px))
    })
    spark.createDataFrame(rdd, schema)
  }

  /** Per-row invariant check (input_hint): decode bytes, compare with the
   *  re-derived pixels (exact for png, PSNR >= 40 dB for jpeg), caption
   *  byte-equality vs the documents table. Returns
   *  (image_id, fmt, psnr4, pixels_ok, caption_ok). */
  def decodeVerify(images: DataFrame, docs: DataFrame): DataFrame = {
    val spark = images.sparkSession
    val outSchema = StructType(Seq(
      StructField("image_id", StringType, nullable = false),
      StructField("fmt", StringType, nullable = false),
      StructField("psnr4", LongType, nullable = false),
      StructField("pixels_ok", BooleanType, nullable = false),
      StructField("caption", StringType, nullable = true)))
    // caption rides THROUGH the decode pass instead of being re-selected
    // from `images`: the image table is a synthesis/decode RDD lineage that
    // column pruning cannot reach, so a second reference re-ran the whole
    // encode pass just to read (image_id, caption) — one pass now feeds
    // both the pixel check and the caption join (guide §2.4: the decision
    // inputs travel once)
    val checked = spark.createDataFrame(
      images.select("image_id", "bytes", "fmt", "caption").rdd.mapPartitions(_.map { r =>
        val decodedOpt = tryDecode(r.getAs[Array[Byte]]("bytes"))
        // a malformed id is corruption too: no expected matrix to verify
        // against — reported like undecodable bytes, never thrown
        val idOpt = scala.util.Try(r.getString(0).stripPrefix("img_").toLong).toOption
        (decodedOpt, idOpt) match {
          // a decodable image of the WRONG size is corruption too (e.g.
          // truncated-but-valid bytes): psnrDb would index past the
          // shorter array — report it, don't let the comparison throw
          case (Some(decoded), Some(id)) if decoded.length == W * H =>
            val expected = pixels(id)
            val p = psnrDb(expected, decoded)
            val ok = if (r.getString(2) == "png") decoded.sameElements(expected) else p >= 40.0
            val pq = if (p.isInfinite) 9999999L else math.round(p * 10000)
            Row(r.getString(0), r.getString(2), pq, ok, r.getString(3))
          case _ => Row(r.getString(0), r.getString(2), -1L, false, r.getString(3))
        }
      }), outSchema)
    // LEFT join: a row whose doc_id has no documents match must still be
    // REPORTED (caption_ok=false), not silently dropped from the verify
    // output by an inner join
    checked
      .withColumn("doc_id", substring(col("image_id"), 5, 12).cast("long"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"), "left")
      .select(col("image_id"), col("fmt"), col("psnr4"), col("pixels_ok"),
        coalesce(col("caption") === col("text"), lit(false)).as("caption_ok"))
  }

  /**
   * Deterministic resize in pure integer/fixed-point arithmetic — NOT
   * Graphics2D, whose bilinear kernel is Java2D-implementation-defined and
   * therefore neither JVM-portable nor derivable by an independent oracle:
   *  - integer downscale factors -> BOX average with floor division (the
   *    16x16 -> 8x8 chain is `sum(2x2 block) / 4` per channel, which DuckDB
   *    re-derives exactly from doc_id — the f18 correctness gate);
   *  - any other ratio -> half-pixel-center bilinear in 1/256 fixed point
   *    (deterministic, no floating point).
   */
  def resizePx(px: Array[Int], w: Int, h: Int, outW: Int, outH: Int): Array[Int] =
    if (w % outW == 0 && h % outH == 0) boxResize(px, w, h, outW, outH)
    else bilinearResize(px, w, h, outW, outH)

  private def boxResize(px: Array[Int], w: Int, h: Int, outW: Int, outH: Int): Array[Int] = {
    val fx = w / outW; val fy = h / outH; val area = fx * fy
    Array.tabulate(outW * outH) { i =>
      val ox = i % outW; val oy = i / outW
      var sr = 0; var sg = 0; var sb = 0
      var dy = 0
      while (dy < fy) {
        var dx = 0
        while (dx < fx) {
          val p = px((oy * fy + dy) * w + ox * fx + dx)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          dx += 1
        }
        dy += 1
      }
      ((sr / area) << 16) | ((sg / area) << 8) | (sb / area)
    }
  }

  private def bilinearResize(px: Array[Int], w: Int, h: Int,
                             outW: Int, outH: Int): Array[Int] = {
    // half-pixel-center mapping in 1/256 fixed point:
    // src = (out + 0.5) * in/outDim - 0.5
    @inline def axis(out: Int, outDim: Int, inDim: Int): (Int, Int, Int) = {
      val fp = ((2 * out + 1) * inDim * 128) / outDim - 128 // 1/256 units
      val f0 = math.max(0, math.min(inDim * 256 - 256, fp))
      val i0 = f0 >> 8
      val i1 = math.min(inDim - 1, i0 + 1)
      (i0, i1, f0 & 0xff)
    }
    Array.tabulate(outW * outH) { i =>
      val (x0, x1, wx) = axis(i % outW, outW, w)
      val (y0, y1, wy) = axis(i / outW, outH, h)
      @inline def ch(shift: Int): Int = {
        val p00 = (px(y0 * w + x0) >> shift) & 0xff
        val p01 = (px(y0 * w + x1) >> shift) & 0xff
        val p10 = (px(y1 * w + x0) >> shift) & 0xff
        val p11 = (px(y1 * w + x1) >> shift) & 0xff
        val top = p00 * (256 - wx) + p01 * wx
        val bot = p10 * (256 - wx) + p11 * wx
        (top * (256 - wy) + bot * wy) >> 16
      }
      (ch(16) << 16) | (ch(8) << 8) | ch(0)
    }
  }

  /**
   * Distributed decode → resize → re-encode over the binary column,
   * partition-parallel (the mapInPandas-decode shape with the real JVM
   * codec; bytes stay inside the partition, no shuffle). Output keeps the
   * input_hint schema with new (bytes, w, h) and fmt forced to png
   * (deterministic re-encode).
   */
  def resize(images: DataFrame, outW: Int, outH: Int): DataFrame = {
    val spark = images.sparkSession
    val rdd = images.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
      .rdd.mapPartitions(_.flatMap { r =>
        tryDecode(r.getAs[Array[Byte]]("bytes")).map { px =>
          val rp = resizePx(px, r.getAs[Int]("w"), r.getAs[Int]("h"), outW, outH)
          Row(r.getString(0), encodeWH(rp, outW, outH, "png"), outW, outH, "png",
            r.getAs[String]("caption"), r.getAs[Long]("phash"))
        } // corrupt rows are skipped; decodeVerify is where they surface
      })
    spark.createDataFrame(rdd, schema)
  }

  /**
   * Per-image feature extraction: decode and emit channel statistics
   * (mean R/G/B ×10000 as longs — exact integers, so the spec can compare
   * against the re-derived pixel matrix bit-for-bit) plus the gray aHash.
   */
  def features(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    val outSchema = StructType(Seq(
      StructField("image_id", StringType, nullable = false),
      StructField("mean_r4", LongType, nullable = false),
      StructField("mean_g4", LongType, nullable = false),
      StructField("mean_b4", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val rdd = images.select("image_id", "bytes").rdd.mapPartitions(_.flatMap { r =>
      tryDecode(r.getAs[Array[Byte]]("bytes")).map { px =>
        var sr = 0L; var sg = 0L; var sb = 0L
        px.foreach { p => sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff }
        val n = px.length
        Row(r.getString(0), sr * 10000 / n, sg * 10000 / n, sb * 10000 / n, phash(px))
      } // corrupt rows are skipped; decodeVerify is where they surface
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * Row-level verification of the decode → resize → re-encode chain over
   * the RESIZED table: decode the output png bytes and compare with the
   * resize of the re-derived source matrix — EXACT equality for rows whose
   * source was lossless, max-abs-channel deviation <= `lossyTol` for lossy
   * sources (the box average of PSNR>=40dB noise; measured max 6 at
   * quality 0.95, bound 16). Output: (image_id, fmt_in, w, h, resized_ok) —
   * every column exactly derivable by the DuckDB oracle (f18 gate).
   * Corrupt rows REPORT resized_ok=false, never crash, never vanish.
   */
  def resizeVerify(resized: DataFrame, srcW: Int, srcH: Int,
                   lossyTol: Int): DataFrame = {
    val spark = resized.sparkSession
    val outSchema = StructType(Seq(
      StructField("image_id", StringType, nullable = false),
      StructField("fmt_in", StringType, nullable = false),
      StructField("w", IntegerType, nullable = false),
      StructField("h", IntegerType, nullable = false),
      StructField("resized_ok", BooleanType, nullable = false)))
    val rdd = resized.select("image_id", "bytes", "w", "h")
      .rdd.mapPartitions(_.map { r =>
        val idOpt = scala.util.Try(r.getString(0).stripPrefix("img_").toLong).toOption
        val w = r.getAs[Int]("w"); val h = r.getAs[Int]("h")
        val decOpt = tryDecode(r.getAs[Array[Byte]]("bytes"))
        (idOpt, decOpt) match {
          case (Some(id), Some(dec)) if dec.length == w * h =>
            val fmtIn = if (id % 2 == 0) "png" else "jpeg"
            val expected = resizePx(pixels(id), srcW, srcH, w, h)
            val ok =
              if (fmtIn == "png") dec.sameElements(expected)
              else dec.zip(expected).forall { case (a, b) =>
                (0 to 2).forall(c =>
                  math.abs(((a >> (8 * c)) & 0xff) - ((b >> (8 * c)) & 0xff)) <= lossyTol)
              }
            Row(r.getString(0), fmtIn, w, h, ok)
          case (Some(id), _) =>
            Row(r.getString(0), if (id % 2 == 0) "png" else "jpeg", w, h, false)
          case _ => Row(r.getString(0), "?", w, h, false)
        }
      })
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * Row-level verification of decode → feature extraction over the MIXED
   * table: channel means (×10⁴) and the 8×8 aHash of the decoded pixels vs
   * the matrix re-derived from the id — exact for png, bounded for jpeg
   * (mean deviation <= `meanTol4` ×10⁻⁴ gray levels, measured max 9179,
   * bound 30000; aHash hamming <= `hamTol`, measured max 12, bound 24 —
   * near-mean cells legitimately flip under codec noise). Output:
   * (image_id, fmt, means_ok, ahash_ok) — all DuckDB-derivable (f19 gate).
   */
  def featuresVerify(images: DataFrame, meanTol4: Long, hamTol: Int): DataFrame = {
    val spark = images.sparkSession
    val outSchema = StructType(Seq(
      StructField("image_id", StringType, nullable = false),
      StructField("fmt", StringType, nullable = false),
      StructField("means_ok", BooleanType, nullable = false),
      StructField("ahash_ok", BooleanType, nullable = false)))
    val rdd = images.select("image_id", "bytes", "fmt")
      .rdd.mapPartitions(_.map { r =>
        val idOpt = scala.util.Try(r.getString(0).stripPrefix("img_").toLong).toOption
        val decOpt = tryDecode(r.getAs[Array[Byte]]("bytes"))
        (idOpt, decOpt) match {
          case (Some(id), Some(dec)) if dec.length == W * H =>
            val exp = pixels(id)
            def means(px: Array[Int]): Seq[Long] = Seq(16, 8, 0).map(s =>
              px.map(p => ((p >> s) & 0xff).toLong).sum * 10000 / px.length)
            val exact = r.getString(2) == "png"
            val meanDev = means(dec).zip(means(exp)).map { case (a, b) => math.abs(a - b) }.max
            val ham = java.lang.Long.bitCount(phash(dec) ^ phash(exp))
            Row(r.getString(0), r.getString(2),
              if (exact) meanDev == 0 else meanDev <= meanTol4,
              if (exact) ham == 0 else ham <= hamTol)
          case _ => Row(r.getString(0), r.getString(2), false, false)
        }
      })
    spark.createDataFrame(rdd, outSchema)
  }

  /** EXACT values of the decoded RESIZED matrix (f18b gate, png-origin
   *  rows): channel means ×10⁴ and the positional checksum
   *  Σ (i+1)·(r·65536 + g·256 + b) — every value re-derivable in SQL from
   *  doc_id through the 2×2 box average. Corrupt rows skip (the verify op
   *  is where they surface). */
  def resizedValues(resized: DataFrame): DataFrame = {
    val spark = resized.sparkSession
    val outSchema = StructType(Seq(
      StructField("image_id", StringType, nullable = false),
      StructField("mean_r4", LongType, nullable = false),
      StructField("mean_g4", LongType, nullable = false),
      StructField("mean_b4", LongType, nullable = false),
      StructField("chk", LongType, nullable = false)))
    val rdd = resized.select("image_id", "bytes").rdd.mapPartitions(_.flatMap { r =>
      tryDecode(r.getAs[Array[Byte]]("bytes")).map { px =>
        var sr = 0L; var sg = 0L; var sb = 0L; var chk = 0L
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          chk += (i + 1).toLong * (p & 0xffffff)
          i += 1
        }
        val n = px.length
        Row(r.getString(0), sr * 10000 / n, sg * 10000 / n, sb * 10000 / n, chk)
      }
    })
    spark.createDataFrame(rdd, outSchema)
  }

  // ---- x10: multimodal curation (image + caption, composed) --------------

  /** Duplicate classes for the multimodal curation query: every
   *  doc_id % 5 == 0 contributes a byte-identical re-labeled copy
   *  ('zcp_'), and every doc_id % 10 == 3 a CROSS-CODEC lossless re-save
   *  ('zpx_': the DECODED lossy pixels re-encoded as png) — the duplicate
   *  class byte-level hashing misses and decode-level dedup catches.
   *  Prefixes sort after 'img_', so min-per-cluster keeps originals. */
  def resaveTable(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    val rdd = images.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
      .rdd.mapPartitions(_.flatMap { r =>
        scala.util.Try(r.getString(0).stripPrefix("img_").toLong).toOption.toSeq
          .flatMap { id =>
            val suffix = f"$id%012d"
            val byteCopy =
              if (id % 5 == 0)
                Seq(Row(s"zcp_$suffix", r.getAs[Array[Byte]]("bytes"),
                  r.getAs[Int]("w"), r.getAs[Int]("h"), r.getAs[String]("fmt"),
                  r.getAs[String]("caption"), r.getAs[Long]("phash")))
              else Nil
            val resave =
              if (id % 10 == 3)
                tryDecode(r.getAs[Array[Byte]]("bytes")).map { px =>
                  Row(s"zpx_$suffix",
                    encodeWH(px, r.getAs[Int]("w"), r.getAs[Int]("h"), "png"),
                    r.getAs[Int]("w"), r.getAs[Int]("h"), "png",
                    r.getAs[String]("caption"), r.getAs[Long]("phash"))
                }.toSeq
              else Nil
            byteCopy ++ resave
          }
      })
    spark.createDataFrame(rdd, schema)
  }

  /** [[imageTable]] ∪ [[resaveTable]] in ONE synthesis pass — row-for-row
   *  the same table the union produces (same ids, bytes, captions), but
   *  each source image is synthesized and encoded ONCE: the union form
   *  referenced the imageTable RDD lineage twice (once directly, once
   *  inside resaveTable), and column pruning cannot reach through an RDD
   *  boundary, so the whole encode pass ran twice (guide §2.4). Union
   *  order differs (copies follow their original instead of trailing the
   *  table) — callers aggregate or sort, never rely on row order. */
  def imageTableWithResaves(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = parallelized(spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")))
    val rdd = docs.rdd.mapPartitions(_.flatMap { r =>
      val id = r.getLong(0)
      val fmt = if (id % 2 == 0) "png" else "jpeg"
      val px = pixels(id)
      val enc = encode(px, fmt)
      val ph = phash(px)
      val cap = r.getString(1)
      val suffix = f"$id%012d"
      val orig = Row(s"img_$suffix", enc, W, H, fmt, cap, ph)
      val byteCopy =
        if (id % 5 == 0) Seq(Row(s"zcp_$suffix", enc, W, H, fmt, cap, ph)) else Nil
      val resave =
        if (id % 10 == 3)
          tryDecode(enc).map(dec =>
            Row(s"zpx_$suffix", encodeWH(dec, W, H, "png"), W, H, "png", cap, ph)).toSeq
        else Nil
      orig +: (byteCopy ++ resave)
    })
    spark.createDataFrame(rdd, schema)
  }

  /** Decode-level content key: positional checksum of the DECODED matrix
   *  (not the bytes), so a lossless re-save of a lossy image keys
   *  identically to its source. Corrupt rows drop. */
  def decodeChk(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    val outSchema = StructType(Seq(
      StructField("image_id", StringType, nullable = false),
      StructField("chk", LongType, nullable = false)))
    val rdd = images.select(col("image_id"), col("bytes"))
      .rdd.mapPartitions(_.flatMap { r =>
        tryDecode(r.getAs[Array[Byte]]("bytes")).map { px =>
          var chk = 0L
          var i = 0
          while (i < px.length) { chk += (i + 1).toLong * (px(i) & 0xffffff); i += 1 }
          Row(r.getString(0), chk)
        }
      })
    spark.createDataFrame(rdd, outSchema)
  }

  // ---- f20: deterministic augmentation (training-data op) ----------------

  /** Index-permutation augmentations — exact integer ops, so the DuckDB
   *  oracle re-derives the output matrix from the id (rot90 requires a
   *  square matrix). */
  def augmentPx(px: Array[Int], w: Int, h: Int, op: String): Array[Int] = op match {
    case "flip_h" => Array.tabulate(w * h)(i => px((i / w) * w + (w - 1 - i % w)))
    case "flip_v" => Array.tabulate(w * h)(i => px((h - 1 - i / w) * w + i % w))
    case "rot180" => Array.tabulate(w * h)(i => px(w * h - 1 - i))
    case "rot90" =>
      require(w == h, s"rot90 needs a square matrix, got ${w}x$h")
      Array.tabulate(w * h)(i => px((h - 1 - i % w) * w + i / w))
    case other => throw new IllegalArgumentException(s"unknown augment op: $other")
  }

  /** The per-image op of the f20 query: (id/2) % 4 →
   *  flip_h/flip_v/rot90/rot180 — divided by 2 so EACH codec half cycles
   *  through all four ops (id parity selects the codec). */
  val AugmentOps: Seq[String] = Seq("flip_h", "flip_v", "rot90", "rot180")

  /**
   * Distributed decode → deterministic augmentation → positional checksum,
   * the standard training-pipeline augmentation stage with a value-level
   * verification column: `chk` = Σ (i+1)·(r·65536 + g·256 + b) over the
   * AUGMENTED matrix, exactly re-derivable in SQL for lossless rows
   * (the transform is an index permutation, so the oracle only permutes
   * the checksum weights). Corrupt rows skip. Output:
   * (image_id, op, mean_r4, mean_g4, mean_b4, chk).
   */
  def augment(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    val outSchema = StructType(Seq(
      StructField("image_id", StringType, nullable = false),
      StructField("op", StringType, nullable = false),
      StructField("mean_r4", LongType, nullable = false),
      StructField("mean_g4", LongType, nullable = false),
      StructField("mean_b4", LongType, nullable = false),
      StructField("chk", LongType, nullable = false)))
    val rdd = images.select(col("image_id"), col("bytes"), col("w"), col("h"))
      .rdd.mapPartitions(_.flatMap { r =>
        val idOpt = scala.util.Try(r.getString(0).stripPrefix("img_").toLong).toOption
        val decOpt = tryDecode(r.getAs[Array[Byte]]("bytes"))
        (idOpt, decOpt) match {
          case (Some(id), Some(dec))
              if dec.length == r.getAs[Int]("w") * r.getAs[Int]("h") =>
            val op = AugmentOps(((id / 2) % 4).toInt)
            val px = augmentPx(dec, r.getAs[Int]("w"), r.getAs[Int]("h"), op)
            var sr = 0L; var sg = 0L; var sb = 0L; var chk = 0L
            var i = 0
            while (i < px.length) {
              val p = px(i)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              chk += (i + 1).toLong * (p & 0xffffff)
              i += 1
            }
            val n = px.length
            Some(Row(r.getString(0), op,
              sr * 10000 / n, sg * 10000 / n, sb * 10000 / n, chk))
          case _ => None
        }
      })
    spark.createDataFrame(rdd, outSchema)
  }

  // ---- d7: thumbnail → catalog reverse lookup ----------------------------

  /** Seed offset for "foreign" thumbnails (no catalog source): keeps the
   *  foreign pixel domain disjoint from doc ids and video frame seeds at
   *  every scale factor, while preserving parity (the offset is even, so
   *  fmt-by-seed-parity matches the source document's). */
  val ForeignSeedOffset = 5000000000L

  val thumbSchema: StructType = StructType(Seq(
    StructField("thumb_id", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("fmt", StringType, nullable = false)))

  /** The 8×8 thumbnail pile for the reverse-lookup operator: docs with
   *  doc_id % 3 != 2 contribute a true thumbnail of image doc_id (2×2 box
   *  average of its pixels, re-encoded with the source's codec), and docs
   *  with doc_id % 7 == 3 additionally contribute a FOREIGN thumbnail
   *  (seed doc_id + [[ForeignSeedOffset]]) that matches nothing — the
   *  precision probe. thumb_id carries the seed ('th_%012d'), so the
   *  oracle can re-derive the expected match set. */
  def thumbTable(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = parallelized(
      spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id")))
    val rdd = docs.rdd.mapPartitions(_.flatMap { r =>
      val id = r.getLong(0)
      def mk(seed: Long): Row = {
        val fmt = if (seed % 2 == 0) "png" else "jpeg"
        val px = resizePx(pixels(seed), W, H, 8, 8)
        Row(f"th_$seed%012d", encodeWH(px, 8, 8, fmt), 8, 8, fmt)
      }
      (if (id % 3 != 2) Seq(mk(id)) else Nil) ++
        (if (id % 7 == 3) Seq(mk(id + ForeignSeedOffset)) else Nil)
    })
    spark.createDataFrame(rdd, thumbSchema)
  }

  private def fpSchema(idName: String) = StructType(Seq(
    StructField(idName, StringType, nullable = false),
    StructField("fp", LongType, nullable = false),
    StructField("pxh", LongType, nullable = false),
    StructField("px", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("lossless", BooleanType, nullable = false)))

  /** 64-bit FNV-1a over the packed pixels — the CONTENT key for exact-mode
   *  matching. Unlike the perceptual aHash (1 bit/cell, entropy collapses
   *  on smooth corpora — measured 17,570-deep hottest bucket at 50k
   *  images), this keys the full matrix: buckets are singletons at any
   *  corpus size, so the exact tier stays strictly linear. */
  def pxHash(px: Array[Int]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < px.length) {
      var c = 0
      while (c < 3) {
        h ^= (px(i) >> (8 * c)) & 0xff
        h *= 0x100000001b3L
        c += 1
      }
      i += 1
    }
    h
  }

  /** Map-side fingerprint extraction — decode the binary column inside the
   *  partition and emit only (id, 64-bit aHash of the 8×8 matrix, the 64
   *  packed pixels, lossless?). `bytes` never reaches a shuffle: what the
   *  band join moves is ≤ ~300 B/row. Catalog rows (any size) are box-
   *  resized to 8×8 first, so both sides hash THE SAME function of the
   *  same matrix — lossless rows collide exactly, lossy rows within codec
   *  noise. Corrupt rows skip (decodeVerify is where they surface). */
  def thumbFingerprints(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol), col("bytes"), col("w"), col("h"), col("fmt"))
      .rdd.mapPartitions(_.flatMap { r =>
        tryDecode(r.getAs[Array[Byte]]("bytes")).collect {
          case dec if dec.length == r.getAs[Int]("w") * r.getAs[Int]("h") =>
            val px8 =
              if (r.getAs[Int]("w") == 8 && r.getAs[Int]("h") == 8) dec
              else resizePx(dec, r.getAs[Int]("w"), r.getAs[Int]("h"), 8, 8)
            Row(r.getString(0), ahash8(px8), pxHash(px8), px8.toSeq,
              r.getAs[String]("fmt") == "png")
        }
      })
    spark.createDataFrame(rdd, fpSchema(idCol))
  }

  /** Join keys for the candidate equi-join, shared by the batch operator
   *  and [[graft.streaming.ThumbStream]]: the full-matrix content hash
   *  when exact (hamMax 0 — singleton buckets, strictly linear), else the
   *  4 16-bit aHash bands (pigeonhole recall for hamming <= 3), each
   *  tagged with its band index in bits 16-17 so the candidate join is a
   *  SINGLE-column equi-join — which a table bucketed on band_key then
   *  satisfies shuffle-free on the catalog side. */
  def bandKeyArray(fp: Column, pxh: Column, hamMax: Int): Column =
    if (hamMax == 0) array(pxh)
    else array((0 until 4).map(b =>
      shiftrightunsigned(fp, b * 16).bitwiseAND(lit(0xffffL))
        .bitwiseOR(lit(b.toLong << 16))): _*)

  /** The d7 refine predicate over a joined candidate row (same sharing):
   *  hamming bound plus pixel verification — exact when both sides are
   *  lossless, bounded deviation otherwise. Expects columns named
   *  hamming / t_ll / c_ll / t_px / c_px. */
  def refinePredicate(hamMax: Int, lossyTol: Int): Column =
    col("hamming") <= hamMax &&
      when(col("t_ll") && col("c_ll"), col("t_px") === col("c_px"))
        .otherwise(maxChanDev(col("t_px"), col("c_px")) <= lossyTol)

  /** Max abs per-channel deviation between two packed-RGB pixel arrays. */
  private def maxChanDev(a: Column, b: Column): Column =
    array_max(zip_with(a, b, (x, y) => greatest(
      abs(shiftright(x, 16).bitwiseAND(lit(255)) - shiftright(y, 16).bitwiseAND(lit(255))),
      abs(shiftright(x, 8).bitwiseAND(lit(255)) - shiftright(y, 8).bitwiseAND(lit(255))),
      abs(x.bitwiseAND(lit(255)) - y.bitwiseAND(lit(255))))))

  /**
   * Reverse image lookup: match each thumbnail to the catalog images it is
   * a resized copy of. Semantics: fingerprint hamming <= `hamMax` AND
   * pixel verification (EXACT 8×8 equality when both rows are lossless,
   * max abs channel deviation <= `lossyTol` otherwise).
   *
   * Candidate generation is an equi-join, never a cross product:
   *  - hamMax = 0 → join directly on the 64-bit fingerprint;
   *  - hamMax in [1,3] → 4×16-bit band join: any pair within hamming 3
   *    shares at least one intact band (pigeonhole), so recall over the
   *    semantic is EXACT (Manku/Jain/Das Sarma, WWW'07).
   *
   * `maxBucket`: drop (band, key) buckets holding more than this many rows
   * across both sides — the d3-style discriminativeness cap. Low-entropy
   * fingerprints (flat images) otherwise make candidate volume quadratic;
   * with the cap it is <= 4 * maxBucket * |thumbs|, i.e. LINEAR at any
   * corpus size. None = exact semantics (the oracled configuration).
   */
  /** The catalog side of the candidate join, as ROWS: one row per
   *  (candidate key, image) with the refine payload. This is what
   *  [[graft.pipeline.TableIO.bucketedStage]] persists (bucketed by
   *  band_key) for the build-once/serve-later form — the serving join
   *  then reads the catalog side shuffle-free. */
  def catalogIndex(catalog: DataFrame, hamMax: Int): DataFrame = {
    require(hamMax >= 0 && hamMax <= 3, s"4x16 banding covers hamming <= 3, got $hamMax")
    thumbFingerprints(catalog.withColumnRenamed("image_id", "cat_id"), "cat_id")
      .select(col("cat_id"), col("fp"), col("px"), col("lossless"),
        explode(bandKeyArray(col("fp"), col("pxh"), hamMax)).as("band_key"))
  }

  def thumbMatch(catalog: DataFrame, thumbs: DataFrame, hamMax: Int,
                 maxBucket: Option[Int], lossyTol: Int): DataFrame =
    thumbMatchIndexed(catalogIndex(catalog, hamMax), thumbs, hamMax,
      maxBucket, lossyTol)

  /** [[thumbMatch]] against a pre-built (possibly at-rest bucketed)
   *  [[catalogIndex]] — no catalog re-fingerprinting per run. */
  def thumbMatchIndexed(catIndex: DataFrame, thumbs: DataFrame, hamMax: Int,
                        maxBucket: Option[Int], lossyTol: Int): DataFrame = {
    require(hamMax >= 0 && hamMax <= 3, s"4x16 banding covers hamming <= 3, got $hamMax")
    val ths = thumbFingerprints(thumbs, "thumb_id")
    val catB = catIndex
    val thB = ths.select(col("thumb_id"), col("fp"), col("px"), col("lossless"),
      explode(bandKeyArray(col("fp"), col("pxh"), hamMax)).as("band_key"))
    val admitted = maxBucket match {
      case None => catB
      case Some(cap) =>
        val ok = catB.select(col("band_key"))
          .unionAll(thB.select(col("band_key")))
          .groupBy(col("band_key")).count()
          .filter(col("count") <= cap)
          .select(col("band_key"))
        catB.join(ok, Seq("band_key"))
          .select(col("cat_id"), col("fp"), col("px"), col("lossless"),
            col("band_key"))
    }
    val t = thB.select(col("thumb_id"), col("fp").as("t_fp"), col("px").as("t_px"),
      col("lossless").as("t_ll"), col("band_key"))
    val c = admitted.select(col("cat_id"), col("fp").as("c_fp"), col("px").as("c_px"),
      col("lossless").as("c_ll"), col("band_key"))
    t.join(c, Seq("band_key"))
      .withColumn("hamming", bit_count(col("t_fp").bitwiseXOR(col("c_fp"))).cast("int"))
      .filter(refinePredicate(hamMax, lossyTol))
      .select(col("thumb_id"), col("cat_id").as("image_id"), col("hamming"))
      .distinct()
  }

  /** Spatial position derived from phash (FIXTURES.md §1): hi 32 bits ->
   *  lat, lo 32 -> lon over the Java-island region; cell at DefaultLevel. */
  def withGeo(images: DataFrame, level: Int = Cells.DefaultLevel): DataFrame = {
    val hi = shiftrightunsigned(col("phash"), 32).cast("double") / 4294967296.0
    val lo = col("phash").bitwiseAND(lit(0xffffffffL)).cast("double") / 4294967296.0
    images
      .withColumn("lat", lit(-8.0) + lit(2.0) * hi)
      .withColumn("lon", lit(106.0) + lit(5.0) * lo)
      .withColumn("cell", GeoFunctions.cellEncode(col("lat"), col("lon"), level))
  }
}
