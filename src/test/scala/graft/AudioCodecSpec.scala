package graft

import graft.ext.AudioCodec

class AudioCodecSpec extends SparkSpec {

  test("WAV encode emits a genuine RIFF/WAVE container") {
    val wav = AudioCodec.encodeWav(AudioCodec.synth(7L))
    assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    // 16-bit mono payload + header
    assert(wav.length > AudioCodec.synth(7L).length * 2)
  }

  test("encode→decode round-trip is lossless for every sample") {
    for (id <- Seq(0L, 1L, 4L, 123L, 4999L)) {
      val original = AudioCodec.synth(id)
      val decoded = AudioCodec.decodeWav(AudioCodec.encodeWav(original))
      assert(decoded.toSeq === original.toSeq, s"id=$id")
    }
  }

  test("decode validates the format instead of silently mis-reading") {
    val garbage = Array.fill[Byte](64)(0x42)
    intercept[Exception](AudioCodec.decodeWav(garbage))
  }

  test("stats: hand-computed values on a tiny known signal") {
    // samples: 3, -4, 0  → peak 4, abs_sum 7, energy 9+16=25
    val s = Array[Short](3, -4, 0)
    val (n, first, peak, absSum, energy, active) = AudioCodec.stats(s)
    assert(n === 3L)
    assert(first === 3L)
    assert(peak === 4L)
    assert(absSum === 7L)
    assert(energy === 25L)
    assert(active === 0L) // 7 < threshold
  }

  test("stats: trailing partial frame participates in activity counting") {
    // one full silent frame then a loud 1-sample tail
    val s = Array.fill[Short](AudioCodec.FrameSamples)(0) ++
      Array[Short](Short.MaxValue)
    val (_, _, _, _, _, active) = AudioCodec.stats(s)
    assert(active === 0L) // 32767 < 32*1024 = 32768: just under
    val loud = Array.fill[Short](AudioCodec.FrameSamples)(0) ++
      Array[Short](Short.MaxValue, 1)
    assert(AudioCodec.stats(loud)._6 === 1L) // 32768 reaches the threshold
  }

  test("DataFrame pipeline: synth → WAV → decode matches direct synth stats") {
    import spark.implicits._
    val df = AudioCodec.extractAudioFeatures(
      AudioCodec.synthAudioPayload(Seq(0L, 3L, 11L, 42L).toDF("doc_id"), "doc_id"),
      "payload")
    val rows = df.select("doc_id", "n_samples", "peak", "energy").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((id, (n, peak, energy)) <- rows) {
      val direct = AudioCodec.stats(AudioCodec.synth(id))
      assert((n, peak, energy) === ((direct._1, direct._3, direct._5)), s"id=$id")
    }
    assert(rows(3L)._1 === 128L + 3L * 32L)
  }
}
