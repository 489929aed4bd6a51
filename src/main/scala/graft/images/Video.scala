package graft.images

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Video as the third multimodal payload next to [[Images]] and [[Audio]],
 * same design contract: synthesize deterministic frames from doc_id,
 * assemble REAL container bytes (RIFF/AVI, the video sibling of Audio's
 * RIFF/WAVE — MJPG fourcc for JPEG frames, MPNG for PNG frames, both
 * real-world AVI codecs), decode partition-parallel with a bounds-safe
 * parser (corrupt rows skip or report, never crash), and run the
 * training-pipeline ops over the DECODED frames:
 *
 *  - [[frameSample]]  — every-Nth-frame sampling (the canonical video
 *    curation op: a 30fps clip feeds 1-2 frames/s to a captioner);
 *  - [[frameFeatures]] — per-sampled-frame channel means, integer-exact;
 *  - [[motion]]       — per-clip motion proxy: Σ |Δ mean-gray| over
 *    consecutive sampled frames (static-clip filtering);
 *  - [[decodeVerify]] — the input_hint per-row invariant lifted to clips:
 *    every frame exact for lossless codecs / PSNR >= 40 dB for lossy,
 *    container metadata equality, caption byte-equality.
 *
 * Scale shape: the container is the row. Every op is one mapPartitions
 * over (video_id, bytes) — frames of a clip never cross a partition
 * boundary, bytes never travel through a shuffle, and per-row cost is
 * bounded by [[MaxFrames]]. At 10^12 clips this is a pure map stage.
 *
 * Frame k of video v has pixels [[Images.pixels]](v*[[MaxFrames]]+k) —
 * unique LCG seeds per frame, so every derived feature has an exact
 * DuckDB twin from doc_id alone (PNG half; the JPEG half is PSNR-gated
 * in-engine and re-decoded independently by tools/video_twin.py's
 * from-scratch Python AVI walker + baseline-JPEG/PNG decoders).
 */
object Video {

  val FrameW = 16
  val FrameH = 16
  val Fps = 4
  /** Frame-seed radix: frame k of video v draws pixels from seed
   *  v*MaxFrames+k. Also the decoder's sanity cap on frame count. */
  val MaxFrames = 64
  /** Default frame-sample stride (keep frames with idx % EveryN == 0). */
  val EveryN = 3

  /** 6..10 frames per clip, deterministic in the video id. */
  def numFrames(vid: Long): Int = (6 + vid % 5).toInt

  def frameSeed(vid: Long, k: Int): Long = vid * MaxFrames + k

  // ---- RIFF/AVI container --------------------------------------------------

  case class Avi(w: Int, h: Int, fps: Int, fourcc: String,
                 frames: Vector[Array[Byte]])

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /**
   * Hand-assembled AVI: RIFF('AVI ') { LIST(hdrl){ avih, LIST(strl){ strh,
   * strf } }, LIST(movi){ 00dc* }, idx1 }. Single video stream, one '00dc'
   * chunk per frame (even-padded, per RIFF), keyframe-flagged idx1 entries.
   * `fourcc` is the stream handler + biCompression: "MJPG" for JPEG
   * frames, "MPNG" for PNG frames.
   */
  def encodeAvi(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
                fourcc: String): Array[Byte] = {
    require(frames.nonEmpty && fps > 0)
    val pad = frames.map(f => f.length + (f.length & 1))
    val moviSize = 4 + pad.map(_ + 8).sum            // 'movi' + chunks
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val idxSize = frames.length * 16
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idxSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val maxFrame = frames.map(_.length).max

    buf.put(fcc("RIFF")).putInt(riffSize).put(fcc("AVI "))
    // LIST hdrl
    buf.put(fcc("LIST")).putInt(hdrlSize).put(fcc("hdrl"))
    //   avih (56 bytes): usec/frame, maxBytesPerSec, padding, flags
    //   (AVIF_HASINDEX), totalFrames, initialFrames, streams, bufSize,
    //   width, height, reserved[4]
    buf.put(fcc("avih")).putInt(56)
      .putInt(1000000 / fps).putInt(0).putInt(0).putInt(0x10)
      .putInt(frames.length).putInt(0).putInt(1).putInt(maxFrame)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    //   LIST strl
    buf.put(fcc("LIST")).putInt(4 + (8 + 56) + (8 + 40)).put(fcc("strl"))
    //     strh (56): 'vids', handler, flags, prio+lang, initialFrames,
    //     scale, rate (rate/scale = fps), start, length, bufSize,
    //     quality(-1), sampleSize, rcFrame
    buf.put(fcc("strh")).putInt(56)
      .put(fcc("vids")).put(fcc(fourcc)).putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(fps).putInt(0).putInt(frames.length)
      .putInt(maxFrame).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    //     strf: BITMAPINFOHEADER (40)
    buf.put(fcc("strf")).putInt(40)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .put(fcc(fourcc)).putInt(w * h * 3).putInt(0).putInt(0)
      .putInt(0).putInt(0)
    // LIST movi
    buf.put(fcc("LIST")).putInt(moviSize).put(fcc("movi"))
    val offsets = new Array[Int](frames.length)
    var off = 4 // idx1 offsets are relative to the 'movi' fourcc start
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = off
      buf.put(fcc("00dc")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
      off += 8 + f.length + (f.length & 1)
    }
    // idx1: (ckid, AVIIF_KEYFRAME, offset, length) per frame
    buf.put(fcc("idx1")).putInt(idxSize)
    frames.zipWithIndex.foreach { case (f, i) =>
      buf.put(fcc("00dc")).putInt(0x10).putInt(offsets(i)).putInt(f.length)
    }
    buf.array()
  }

  /**
   * Bounds-safe AVI decode: returns None for anything malformed — at 10^12
   * rows a corrupt clip must not kill the job. Requirements mirror the WAV
   * decoder's fmt-before-data discipline: the hdrl header LIST (avih +
   * strh/strf with a 'vids' stream) must precede movi, chunk lengths must
   * fit, and the frame count is capped at [[MaxFrames]]*64 as a
   * runaway-container guard. Frames are the raw '00dc'/'00db' payloads;
   * empty frames and a frame count disagreeing with avih reject the clip.
   */
  def tryDecodeAvi(bytes: Array[Byte]): Option[Avi] =
    try {
      if (bytes.length < 12) return None
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag4(): String = {
        val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII")
      }
      if (tag4() != "RIFF") return None
      val riffLen = buf.getInt
      if (riffLen < 4 || riffLen - 4 > buf.remaining() - 4) return None
      if (tag4() != "AVI ") return None

      var w = -1; var h = -1; var fps = -1; var total = -1
      var fourcc = ""; var vidsOk = false; var hdrlOk = false
      var frames = Vector.empty[Array[Byte]]

      def parseHdrl(end: Int): Boolean = {
        while (buf.position() + 8 <= end) {
          val t = tag4(); val len = buf.getInt
          if (len < 0 || buf.position() + len > end) return false
          val next = buf.position() + len + (len & 1)
          t match {
            case "avih" =>
              if (len < 56) return false
              val usec = buf.getInt
              if (usec <= 0 || 1000000 % usec != 0) return false
              fps = 1000000 / usec
              buf.getInt; buf.getInt; buf.getInt
              total = buf.getInt
              buf.getInt; buf.getInt; buf.getInt
              w = buf.getInt; h = buf.getInt
            case "LIST" =>
              if (len < 4) return false
              if (tag4() == "strl") {
                // walk strh/strf inside
                while (buf.position() + 8 <= next) {
                  val st = tag4(); val sl = buf.getInt
                  if (sl < 0 || buf.position() + sl > next) return false
                  val snext = buf.position() + sl + (sl & 1)
                  if (st == "strh") {
                    if (sl < 56) return false
                    val typ = tag4()
                    if (typ == "vids") { vidsOk = true; fourcc = tag4() }
                  }
                  buf.position(snext)
                }
              }
            case _ => // ignore unknown header chunks (e.g. JUNK)
          }
          buf.position(next)
        }
        w > 0 && h > 0 && fps > 0 && total > 0 &&
          total <= MaxFrames * 64 && vidsOk
      }

      while (buf.remaining() >= 8) {
        val t = tag4(); val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return None
        val next = buf.position() + len + (len & 1)
        t match {
          case "LIST" =>
            if (len < 4) return None
            tag4() match {
              case "hdrl" =>
                if (!parseHdrl(buf.position() + len - 4)) return None
                hdrlOk = true
              case "movi" =>
                if (!hdrlOk) return None // frames before the header: reject
                val end = buf.position() + len - 4
                while (buf.position() + 8 <= end) {
                  val ct = tag4(); val cl = buf.getInt
                  if (cl < 0 || buf.position() + cl > end) return None
                  if (ct == "00dc" || ct == "00db") {
                    if (cl == 0 || frames.length >= MaxFrames * 64) return None
                    val f = new Array[Byte](cl); buf.get(f)
                    frames = frames :+ f
                    if ((cl & 1) == 1) buf.get()
                  } else buf.position(buf.position() + cl + (cl & 1))
                }
              case _ =>
            }
          case _ => // idx1 and unknown top-level chunks: skip
        }
        if (next > buf.limit()) return None
        buf.position(next)
      }
      if (hdrlOk && frames.nonEmpty && frames.length == total)
        Some(Avi(w, h, fps, fourcc, frames))
      else None
    } catch { case _: Exception => None }

  // ---- the video+caption table ----------------------------------------------

  val schema: StructType = StructType(Seq(
    StructField("video_id", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("fps", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("fmt", StringType, nullable = false),
    StructField("caption", StringType, nullable = false)))

  /** The video+caption table (input_hint shape with a clip payload),
   *  synthesized from the documents table: fmt cycles avi-mpng (PNG
   *  frames, lossless) / avi-mjpg (JPEG frames, lossy) by id; encode is
   *  partition-parallel and bytes never travel through a shuffle. */
  def videoTable(spark: SparkSession, sfDir: String): DataFrame = {
    // single-split sf input would serialize the whole encode on one core —
    // right-size at the synthesis root (no-op when splits >= parallelism)
    val docs = Images.parallelized(spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")))
    val rdd = docs.rdd.mapPartitions(_.map { r =>
      val vid = r.getLong(0)
      val (imgFmt, fourcc, fmt) =
        if (vid % 2 == 0) ("png", "MPNG", "avi-mpng")
        else ("jpeg", "MJPG", "avi-mjpg")
      val n = numFrames(vid)
      val frames = (0 until n).map(k =>
        Images.encodeWH(Images.pixels(frameSeed(vid, k)), FrameW, FrameH, imgFmt))
      Row(f"vid_$vid%012d", encodeAvi(frames, FrameW, FrameH, Fps, fourcc),
        FrameW, FrameH, Fps, n, fmt, r.getString(1))
    })
    spark.createDataFrame(rdd, schema)
  }

  // ---- operators -------------------------------------------------------------

  /** Decoded, sampled frames of every video in one pass over the decoded
   *  container — shared by the three ops below so each stays a single
   *  mapPartitions with no shuffle. */
  private def sampledPixels(r: Row, everyN: Int): Option[Seq[(Int, Array[Int])]] =
    tryDecodeAvi(r.getAs[Array[Byte]]("bytes")).flatMap { avi =>
      val picked = avi.frames.zipWithIndex.collect {
        case (f, k) if k % everyN == 0 => (k, Images.tryDecode(f))
      }
      // one undecodable frame poisons the clip (corrupt row: skip)
      if (picked.exists(_._2.isEmpty)) None
      else Some(picked.map { case (k, px) => (k, px.get) })
    }

  /** Every-Nth-frame sampling: (video_id, frame_idx, frame_bytes) — the
   *  canonical captioner-feed op. Frame bytes stay inside the partition;
   *  corrupt clips skip. */
  def frameSample(videos: DataFrame, everyN: Int = EveryN): DataFrame = {
    val spark = videos.sparkSession
    val outSchema = StructType(Seq(
      StructField("video_id", StringType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = false)))
    val rdd = videos.select("video_id", "bytes").rdd.mapPartitions(_.flatMap { r =>
      tryDecodeAvi(r.getAs[Array[Byte]]("bytes")).toSeq.flatMap { avi =>
        avi.frames.zipWithIndex.collect {
          case (f, k) if k % everyN == 0 => Row(r.getString(0), k, f)
        }
      }
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-sampled-frame channel means ×10000 from the DECODED pixels —
   *  integer-exact ([[Images.features]] arithmetic), so the PNG half has
   *  an exact DuckDB twin from doc_id (f22b gate). */
  def frameFeatures(videos: DataFrame, everyN: Int = EveryN): DataFrame = {
    val spark = videos.sparkSession
    val outSchema = StructType(Seq(
      StructField("video_id", StringType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("mean_r4", LongType, nullable = false),
      StructField("mean_g4", LongType, nullable = false),
      StructField("mean_b4", LongType, nullable = false)))
    val rdd = videos.select("video_id", "bytes").rdd.mapPartitions(_.flatMap { r =>
      sampledPixels(r, everyN).toSeq.flatMap(_.map { case (k, px) =>
        var sr = 0L; var sg = 0L; var sb = 0L
        px.foreach { p => sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff }
        val n = px.length
        Row(r.getString(0), k, sr * 10000 / n, sg * 10000 / n, sb * 10000 / n)
      })
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-clip motion proxy: Σ |Δ mean-gray| over consecutive SAMPLED
   *  frames (mean-gray = Σ((r*299+g*587+b*114)/1000) / n, floor division —
   *  the aHash gray weights). A static clip scores 0; the curation use is
   *  filtering slideshows/test-cards out of a training mix. Computed
   *  entirely inside the row — no shuffle, no window. */
  def motion(videos: DataFrame, everyN: Int = EveryN): DataFrame = {
    val spark = videos.sparkSession
    val outSchema = StructType(Seq(
      StructField("video_id", StringType, nullable = false),
      StructField("n_sampled", IntegerType, nullable = false),
      StructField("motion", LongType, nullable = false)))
    val rdd = videos.select("video_id", "bytes").rdd.mapPartitions(_.flatMap { r =>
      sampledPixels(r, everyN).map { picked =>
        val grays = picked.map { case (_, px) =>
          var s = 0L
          px.foreach { p =>
            s += (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
          }
          s / px.length
        }
        val m = grays.sliding(2).collect { case Seq(a, b) => math.abs(b - a) }.sum
        Row(r.getString(0), picked.length, m)
      }
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-clip invariant check (input_hint lifted to containers): decode
   *  the AVI, verify EVERY frame against the re-derived matrix (exact for
   *  avi-mpng, PSNR >= 40 dB for avi-mjpg), container metadata equality
   *  (w, h, fps, frame count), caption byte-equality vs documents.
   *  Corrupt/truncated/meta-mismatched clips REPORT false, never crash,
   *  never vanish. */
  def decodeVerify(videos: DataFrame, docs: DataFrame): DataFrame = {
    val spark = videos.sparkSession
    val outSchema = StructType(Seq(
      StructField("video_id", StringType, nullable = false),
      StructField("fmt", StringType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("frames_ok", BooleanType, nullable = false),
      StructField("meta_ok", BooleanType, nullable = false),
      StructField("caption", StringType, nullable = true)))
    // caption rides THROUGH the decode pass (the Images.decodeVerify fix):
    // a second reference to `videos` re-ran the whole frame-encode
    // synthesis just to read (video_id, caption)
    val checked = spark.createDataFrame(
      videos.select("video_id", "bytes", "fmt", "n_frames", "caption")
        .rdd.mapPartitions(_.map { r =>
        val idOpt = scala.util.Try(r.getString(0).stripPrefix("vid_").toLong).toOption
        val aviOpt = tryDecodeAvi(r.getAs[Array[Byte]]("bytes"))
        val lossless = r.getString(2) == "avi-mpng"
        (aviOpt, idOpt) match {
          case (Some(avi), Some(vid)) =>
            val metaOk = avi.w == FrameW && avi.h == FrameH && avi.fps == Fps &&
              avi.frames.length == numFrames(vid) &&
              avi.fourcc == (if (lossless) "MPNG" else "MJPG")
            val framesOk = avi.frames.zipWithIndex.forall { case (f, k) =>
              Images.tryDecode(f).exists { px =>
                val expected = Images.pixels(frameSeed(vid, k))
                px.length == expected.length &&
                  (if (lossless) px.sameElements(expected)
                   else Images.psnrDb(expected, px) >= 40.0)
              }
            }
            Row(r.getString(0), r.getString(2), r.getAs[Int]("n_frames"),
              framesOk, metaOk, r.getString(4))
          case _ =>
            Row(r.getString(0), r.getString(2), r.getAs[Int]("n_frames"),
              false, false, r.getString(4))
        }
      }), outSchema)
    // LEFT join, like Images.decodeVerify: an unmatched caption must be
    // REPORTED false, not dropped
    checked
      .withColumn("doc_id", substring(col("video_id"), 5, 12).cast("long"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"), "left")
      .select(col("video_id"), col("fmt"), col("n_frames"), col("frames_ok"),
        col("meta_ok"),
        coalesce(col("caption") === col("text"), lit(false)).as("caption_ok"))
  }
}
