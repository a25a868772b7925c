package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL audio codec for the multimodal path — JDK-only
  * (`javax.sound.sampled`), the audio twin of [[ImageCodec]]: q103
  * synthesizes deterministic 16-bit PCM per row, encodes it through the
  * JDK's WAV writer (a genuine RIFF/WAVE container), decodes it back
  * through `AudioSystem`, and reduces the decoded samples to integer
  * stats the DuckDB oracle replays from the sample formula. PCM in a
  * WAV container is lossless, so a hash match proves the codec
  * round-trip reproduced every sample.
  *
  * Scale notes: all operators are order-preserving `mapPartitions` over
  * a binary column — no shuffle, payloads ride parquet BYTE_ARRAY pages,
  * nothing visits the driver. Feature extraction (peak / energy / VAD
  * frames) is one integer pass over the decoded samples, the shape a
  * speech-corpus pipeline runs per utterance before filtering.
  */
object AudioCodec {

  val SampleRate = 8000
  /** Samples per voice-activity frame. */
  val FrameSamples = 32
  /** A frame is "active" when its abs-amplitude sum reaches this (the
    * synthetic samples average |x| ≈ 1024, so ~half the frames pass). */
  val ActivityThreshold: Long = FrameSamples.toLong * 1024L

  /** Deterministic synthetic PCM16 signal for row `id` — the fixture
    * generator. Sample formula (all integer, shared verbatim with the
    * oracle SQL):
    *   n = 128 + (id % 5) * 32
    *   s(i) = (id*31 + i*17) % 4096 − 2048
    */
  def synth(id: Long): Array[Short] = {
    val n = (128 + (id % 5) * 32).toInt
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (((id * 31 + i.toLong * 17) % 4096) - 2048).toShort
      i += 1
    }
    out
  }

  private def pcmFormat: AudioFormat =
    new AudioFormat(SampleRate.toFloat, 16, 1, true, false) // signed mono LE

  /** Encode samples into a RIFF/WAVE container via the JDK writer. */
  def encodeWav(samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), pcmFormat, samples.length.toLong)
    val bos = new ByteArrayOutputStream(pcm.length + 64)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload back to samples via `AudioSystem` (container
    * parsed, format validated — 16-bit signed mono little-endian PCM). */
  def decodeWav(payload: Array[Byte]): Array[Short] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val f = ais.getFormat
    require(f.getEncoding == AudioFormat.Encoding.PCM_SIGNED && !f.isBigEndian &&
      f.getSampleSizeInBits == 16 && f.getChannels == 1,
      s"expected 16-bit signed mono LE PCM, got $f")
    val bytes = ais.readAllBytes()
    val out = new Array[Short](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
      i += 1
    }
    out
  }

  /** Integer reduction of a decoded signal: (n_samples, first_sample,
    * peak = max |s|, abs_sum, energy = Σ s², active_frames = count of
    * [[FrameSamples]]-sample frames with abs-sum ≥ [[ActivityThreshold]]
    * — the voice-activity gate; a trailing partial frame counts too). */
  def stats(samples: Array[Short]): (Long, Long, Long, Long, Long, Long) = {
    var peak = 0L
    var absSum = 0L
    var energy = 0L
    var active = 0L
    var frameAbs = 0L
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toLong
      val a = math.abs(s)
      if (a > peak) peak = a
      absSum += a
      energy += s * s
      frameAbs += a
      i += 1
      if (i % FrameSamples == 0 || i == samples.length) {
        if (frameAbs >= ActivityThreshold) active += 1
        frameAbs = 0L
      }
    }
    (samples.length.toLong, if (samples.isEmpty) 0L else samples(0).toLong,
      peak, absSum, energy, active)
  }

  // ---- DataFrame operators ------------------------------------------

  /** Append `payload` (WAV bytes for [[synth]] of the id column) and the
    * typed metadata struct. Fixture side: at production scale this
    * column arrives from ingest. */
  def synthAudioPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(df.schema.fields)
      .add("payload", BinaryType).add("meta", Multimodal.metadataType)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = encodeWav(synth(r.getLong(idx)))
        graft.RowUtil.appended(r, bytes,
          Row("audio/wav", bytes.length.toLong, null))
      }
    }(Encoders.row(schema))
  }

  /** REAL decode + sample reduction: appends (n_samples, sample_rate,
    * first_sample, peak, abs_sum, energy, active_frames) from the
    * AudioSystem-decoded payload. */
  def extractAudioFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields)
      .add("n_samples", LongType).add("sample_rate", LongType)
      .add("first_sample", LongType).add("peak", LongType)
      .add("abs_sum", LongType).add("energy", LongType)
      .add("active_frames", LongType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val (n, first, peak, absSum, energy, active) =
          stats(decodeWav(r.getAs[Array[Byte]](idx)))
        graft.RowUtil.appended(r, n, SampleRate.toLong, first, peak,
          absSum, energy, active)
      }
    }(Encoders.row(schema))
  }
}
