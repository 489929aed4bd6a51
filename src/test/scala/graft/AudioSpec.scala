package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.images.Audio

/**
 * The audio payload: WAV encode/decode roundtrip is bit-exact, corrupt
 * bytes are skipped (never crash), and features computed from the decoded
 * samples equal direct computation from the synthesis.
 */
class AudioSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("encode -> decode roundtrip is bit-exact, header parsed") {
    for (id <- Seq(0L, 1L, 7L, 123L)) {
      val pcm = Audio.samples(id)
      val (sr, decoded) = Audio.tryDecodeWav(Audio.encodeWav(pcm)).get
      assert(sr == Audio.SampleRate)
      assert(decoded.sameElements(pcm), s"roundtrip mismatch for id $id")
    }
  }

  test("corrupt bytes skip, never crash: truncated, wrong magic, bad chunk length") {
    val good = Audio.encodeWav(Audio.samples(1L))
    assert(Audio.tryDecodeWav(good.take(20)).isEmpty)
    assert(Audio.tryDecodeWav(Array.fill[Byte](44)(0)).isEmpty)
    val badLen = good.clone()
    badLen(40) = -1; badLen(41) = -1; badLen(42) = -1; badLen(43) = 127 // data len >> buffer
    assert(Audio.tryDecodeWav(badLen).isEmpty)
    assert(Audio.tryDecodeWav(Array.emptyByteArray).isEmpty)
  }

  test("non-16-bit-mono-PCM WAVs are rejected, not misdecoded") {
    val good = Audio.encodeWav(Audio.samples(1L))
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // bits-per-sample 8 (offset 34 in the canonical 44-byte header)
    assert(Audio.tryDecodeWav(patched(b => b(34) = 8)).isEmpty)
    // bits-per-sample 24 with matching blockAlign 3
    assert(Audio.tryDecodeWav(patched { b => b(34) = 24; b(32) = 3 }).isEmpty)
    // blockAlign 4 (stereo-like layout claim)
    assert(Audio.tryDecodeWav(patched(b => b(32) = 4)).isEmpty)
    // fmt chunk declaring len 8 — would read past its boundary
    assert(Audio.tryDecodeWav(patched(b => b(16) = 8)).isEmpty)
    // data chunk appearing before any fmt chunk: sample width unknown
    val noFmt = good.take(12) ++ good.drop(36) // strip the fmt chunk
    assert(Audio.tryDecodeWav(noFmt).isEmpty)
  }

  test("distributed features equal direct computation; corrupt rows dropped") {
    val rows = Seq(
      ("aud_1", Audio.encodeWav(Audio.samples(1L)), 1L),
      ("aud_2", Audio.encodeWav(Audio.samples(2L)), 2L),
      ("aud_bad", Array[Byte](1, 2, 3), -1L)
    ).map { case (n, b, id) => (n, b) }.toDF("audio_id", "bytes")
    val out = Audio.features(rows).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 2 && !out.contains("aud_bad"))
    for (id <- Seq(1L, 2L)) {
      val pcm = Audio.samples(id)
      var sumSq = 0L; var peak = 0; var zc = 0
      pcm.indices.foreach { i =>
        val v = pcm(i).toInt
        sumSq += v.toLong * v
        peak = math.max(peak, math.abs(v))
        if (i > 0 && v.toLong * pcm(i - 1) < 0) zc += 1
      }
      val r = out(s"aud_$id")
      assert(r.getInt(2) == pcm.length && r.getInt(3) == peak && r.getInt(4) == zc)
      assert(r.getLong(5) == math.round(math.sqrt(sumSq.toDouble / pcm.length) * 100))
    }
  }

  test("audio table carries the typed schema; bytes stay binary") {
    val t = Audio.audioTable(spark, TestSpark.Sf)
    assert(t.columns.toSeq == Seq("audio_id", "bytes", "sr", "n", "fmt", "caption"))
    val head = t.orderBy("audio_id").head()
    assert(head.getAs[Array[Byte]]("bytes").length == 44 + Audio.NumSamples * 2)
    assert(head.getAs[Int]("sr") == Audio.SampleRate)
    assert(head.getAs[String]("fmt") == "wav")
  }
}
