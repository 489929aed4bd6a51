package graft.images

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Audio as an opaque binary column with typed metadata — the second
 * multimodal payload next to [[Images]], same design: synthesize
 * deterministic PCM from doc_id, encode REAL WAV (RIFF/PCM16LE) bytes,
 * decode partition-parallel with a bounds-safe parser (corrupt rows skip,
 * never crash), extract features from the DECODED samples.
 *
 * The synthesis is integer-only (sawtooth + position-hash noise, params
 * from the same 64-bit LCG as [[Images.pixels]]) so every derived feature
 * has an EXACT DuckDB twin from doc_id alone — the audio path gets the
 * same value-level oracle treatment as the PNG pixel path (f21 query).
 */
object Audio {

  val SampleRate = 8000
  val NumSamples = 800

  private val M = 6364136223846793005L
  private val C = 1442695040888963407L

  /** Deterministic int16 samples for audio `id`: sawtooth wave whose
   *  (period, phase, amplitude) come from LCG draws, plus per-position
   *  hash noise. All integer arithmetic — exactly reproducible in SQL. */
  def samples(id: Long): Array[Short] = {
    var s = id * M + C
    def next(): Int = { s = s * M + C; ((s >>> 40) & 0xff).toInt }
    val period = 20 + next() % 93
    val phase = next() % period
    val amp = 2000 + next() * 100
    val slope = (2 * amp) / period
    Array.tabulate(NumSamples) { i =>
      val saw = ((i + phase) % period) * slope - amp
      val noise = (((i.toLong * i * 2654435761L + id * 40503L) & 0xffffffffL) >>> 24).toInt - 128
      math.max(-32768, math.min(32767, saw + noise)).toShort
    }
  }

  /** RIFF/WAVE PCM16LE mono encoding — real bytes, hand-assembled. */
  def encodeWav(pcm: Array[Short], sampleRate: Int = SampleRate): Array[Byte] = {
    val dataLen = pcm.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    pcm.foreach(buf.putShort)
    buf.array()
  }

  /** Bounds-safe WAV decode: returns (sampleRate, samples) or None for
   *  anything malformed — at 10^12 rows a bad row must not kill the job. */
  def tryDecodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      if (bytes.length < 44) return None
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val riff = new Array[Byte](4); buf.get(riff)
      if (new String(riff, "US-ASCII") != "RIFF") return None
      buf.getInt // riff size
      val wave = new Array[Byte](4); buf.get(wave)
      if (new String(wave, "US-ASCII") != "WAVE") return None
      var sampleRate = 0
      var fmtOk = false
      var out: Option[Array[Short]] = None
      while (buf.remaining() >= 8 && out.isEmpty) {
        val tag = new Array[Byte](4); buf.get(tag)
        val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return None
        new String(tag, "US-ASCII") match {
          case "fmt " =>
            // a PCM fmt chunk is >= 16 bytes; anything shorter would read
            // past its declared boundary below. Only 16-bit mono PCM
            // (blockAlign 2) is this codec's format — an 8- or 24-bit WAV
            // must be SKIPPED, not silently misread as int16.
            if (len < 16) return None
            val p = buf.position()
            val fmt = buf.getShort; val ch = buf.getShort
            sampleRate = buf.getInt
            buf.getInt // byte rate
            val blockAlign = buf.getShort; val bits = buf.getShort
            if (fmt != 1 || ch != 1 || bits != 16 || blockAlign != 2) return None
            fmtOk = true
            buf.position(p + len)
          case "data" =>
            // data before a valid fmt chunk: sample width unknown — reject
            if (!fmtOk) return None
            val n = len / 2
            val arr = new Array[Short](n)
            var i = 0
            while (i < n) { arr(i) = buf.getShort; i += 1 }
            out = Some(arr)
          case _ => buf.position(buf.position() + len)
        }
      }
      out.map(a => (sampleRate, a))
    } catch { case _: Exception => None }

  val schema: StructType = StructType(Seq(
    StructField("audio_id", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("sr", IntegerType, nullable = false),
    StructField("n", IntegerType, nullable = false),
    StructField("fmt", StringType, nullable = false),
    StructField("caption", StringType, nullable = false)))

  /** The audio+caption table (input_hint shape with an audio payload),
   *  synthesized from the documents table; encode is partition-parallel
   *  and bytes never travel through a shuffle. */
  def audioTable(spark: SparkSession, sfDir: String): DataFrame = {
    // single-split sf input would serialize the whole encode on one core —
    // right-size at the synthesis root (no-op when splits >= parallelism)
    val docs = Images.parallelized(spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")))
    val rdd = docs.rdd.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      Row(f"aud_$id%012d", encodeWav(samples(id)), SampleRate, NumSamples,
        "wav", r.getString(1))
    })
    spark.createDataFrame(rdd, schema)
  }

  /** Decode → per-clip features, all from the DECODED samples:
   *  (audio_id, sr, n_samples, peak, zero_crossings, rms2 = round(rms*100)).
   *  sum-of-squares and crossings are integer-exact; rms is one IEEE
   *  division + sqrt, identical in both engines. Corrupt rows skip. */
  def features(audio: DataFrame): DataFrame = {
    val spark = audio.sparkSession
    val outSchema = StructType(Seq(
      StructField("audio_id", StringType, nullable = false),
      StructField("sr", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("peak", IntegerType, nullable = false),
      StructField("zero_crossings", IntegerType, nullable = false),
      StructField("rms2", LongType, nullable = false)))
    val rdd = audio.select("audio_id", "bytes").rdd.mapPartitions(_.flatMap { r =>
      tryDecodeWav(r.getAs[Array[Byte]]("bytes")).map { case (sr, pcm) =>
        var sumSq = 0L; var peak = 0; var zc = 0
        var i = 0
        while (i < pcm.length) {
          val v = pcm(i).toInt
          sumSq += v.toLong * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && v.toLong * pcm(i - 1) < 0) zc += 1
          i += 1
        }
        val rms = math.sqrt(sumSq.toDouble / math.max(1, pcm.length))
        Row(r.getString(0), sr, pcm.length, peak, zc, math.round(rms * 100))
      }
    })
    spark.createDataFrame(rdd, outSchema)
  }
}
