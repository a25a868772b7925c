package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north star): media as opaque `binary`
  * columns with a typed metadata struct, decode / feature-extraction as
  * batch `mapPartitions` operators.
  *
  * The actual image/audio codecs are NOT available in this environment,
  * so [[FeatureExtractor.decodeStub]] is a clearly-marked deterministic
  * stand-in — the Spark-side plumbing (schema, binary transport,
  * per-partition batching, feature schema) is real and tested, and a
  * production codec drops into the one stubbed function.
  *
  * Scale notes: binaries ride in parquet BYTE_ARRAY pages and never
  * inflate the driver; feature extraction is embarrassingly parallel
  * per partition; `spark.sql.files.maxPartitionBytes` sizes partitions
  * so a batch of decoded frames fits executor memory.
  */
object Multimodal {

  val metadataType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("source", StringType, nullable = true)))

  /** Pack a text column as a binary payload + metadata struct —
    * simulates ingesting raw media alongside typed metadata. */
  def packBinary(df: DataFrame, textCol: String, sourceCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        lit("raw/utf-8").as("format"),
        length(encode(col(textCol), "UTF-8")).cast(LongType).as("n_bytes"),
        col(sourceCol).as("source")))

  object FeatureExtractor {
    /** STUB for a real image resize: average-pool consecutive
      * `factor`-byte groups (the 1-D analog of box downsampling). A
      * production build swaps in a real resampler; the binary-in /
      * binary-out plumbing and batch shape stay. */
    def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
      require(factor >= 1, "resize factor must be >= 1")
      if (payload.isEmpty) return Array.emptyByteArray
      val out = new Array[Byte]((payload.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) {
        val start = i * factor
        val end = math.min(start + factor, payload.length)
        var s = 0L
        var j = start
        while (j < end) { s += (payload(j) & 0xff); j += 1 }
        out(i) = (s / (end - start)).toByte
        i += 1
      }
      out
    }

    /** STUB for the real media decoder. A production build replaces
      * this body with e.g. JPEG decode + resize; everything around it
      * (binary transport, batching, output schema) stays unchanged. */
    def decodeStub(payload: Array[Byte]): (Long, Long, Long, Double) = {
      val nBytes = payload.length.toLong
      val first = if (payload.nonEmpty) (payload(0) & 0xff).toLong else 0L
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
      val checksum = sum % 256
      val brightness = if (nBytes == 0) 0.0 else sum.toDouble / nBytes.toDouble
      (nBytes, first, checksum, brightness)
    }
  }

  /** Feature extraction over the binary column: one pass per partition,
    * appending (n_bytes, first_byte, checksum, brightness). */
  def extractFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields)
      .add("n_bytes", LongType).add("first_byte", LongType)
      .add("checksum", LongType).add("brightness", DoubleType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val (n, first, ck, br) = FeatureExtractor.decodeStub(
          if (payload == null) Array.emptyByteArray else payload)
        graft.RowUtil.appended(r, n, first, ck, br)
      }
    }(Encoders.row(schema))
  }

  /** Resize over the binary column: appends `resized` (see
    * [[FeatureExtractor.resizeStub]]) — one pass per partition. */
  def resizePayload(df: DataFrame, payloadCol: String, factor: Int): DataFrame = {
    val schema = StructType(df.schema.fields).add("resized", BinaryType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val resized = FeatureExtractor.resizeStub(
          if (payload == null) Array.emptyByteArray else payload, factor)
        graft.RowUtil.appended(r, resized)
      }
    }(Encoders.row(schema))
  }

  /** "Frame sampling": split the payload into fixed-size chunks and
    * keep every `stride`-th — the video-frame access pattern, exercised
    * on binary slices. Output: one row per kept frame. */
  def sampleFrames(df: DataFrame, payloadCol: String, idCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("frame_no", LongType, nullable = false),
      StructField("frame", BinaryType)))
    val pIdx = df.schema.fieldIndex(payloadCol)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        if (payload == null) Iterator.empty
        else payload.grouped(frameBytes).zipWithIndex.collect {
          case (chunk, i) if i % stride == 0 =>
            Row(r.get(iIdx), i.toLong, chunk)
        }
      }
    }(Encoders.row(outSchema))
  }
}
