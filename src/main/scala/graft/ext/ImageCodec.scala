package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL image codecs for the multimodal path — JDK-only
  * (`javax.imageio`), so the "no external codec libraries in this
  * container" constraint stays honest while the decode is no longer a
  * stub: q29/q60 PNG/BMP-encode a deterministic RGB image per row,
  * decode it back through ImageIO, and reduce the decoded pixels to
  * integer stats the DuckDB oracle replays from the pixel formula
  * (PNG and 24-bit BMP are lossless, so decoded pixels ≡ formula).
  *
  * Scale notes: every operator here is an order-preserving
  * `mapPartitions` over a binary column — embarrassingly parallel, no
  * shuffle, payloads ride parquet BYTE_ARRAY pages and never visit the
  * driver. `ImageIO.setUseCache(false)` keeps codec scratch space
  * in-memory: the default disk-backed cache would add two file
  * round-trips per image, a silent executor-local I/O tax at 100 TB.
  */
object ImageCodec {

  ImageIO.setUseCache(false)

  /** Deterministic synthetic RGB image for row `id` — the fixture
    * generator. Pixel formula (all integer, shared verbatim with the
    * oracle SQL):
    *   w = 8 + id % 9,  h = 8 + id % 7
    *   r(x,y) = (id*7 + x*3 + y*5) % 256
    *   g(x,y) = (x*x + y) % 256
    *   b(x,y) = (id + x + y*2) % 256
    */
  def synth(id: Long): BufferedImage = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 7 + x * 3 + y * 5) % 256).toInt
        val g = ((x.toLong * x + y) % 256).toInt
        val b = ((id + x + y * 2) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode through the JDK writer for `format` ("png" or "bmp" —
    * both lossless for TYPE_INT_RGB). */
  def encode(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream(1024)
    val ok = ImageIO.write(img, format, bos)
    require(ok, s"no JDK ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Decode via ImageIO (format sniffed from the byte stream). */
  def decode(payload: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, s"ImageIO could not decode payload (${payload.length} bytes)")
    img
  }

  /** Nearest-neighbor downsample: out(x,y) = in(x*factor, y*factor),
    * output dims ceil(dim/factor) — pure integer sampling, so the
    * oracle can replay it exactly (no resampling-kernel float math). */
  def resizeNearest(img: BufferedImage, factor: Int): BufferedImage = {
    require(factor >= 1, "resize factor must be >= 1")
    val rw = (img.getWidth + factor - 1) / factor
    val rh = (img.getHeight + factor - 1) / factor
    val out = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < rh) {
      var x = 0
      while (x < rw) {
        out.setRGB(x, y, img.getRGB(x * factor, y * factor) & 0xffffff)
        x += 1
      }
      y += 1
    }
    out
  }

  /** (width, height, sum of all R+G+B channel values, red of (0,0)). */
  def stats(img: BufferedImage): (Int, Int, Long, Int) = {
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, sum, (img.getRGB(0, 0) >> 16) & 0xff)
  }

  // ---- DataFrame operators ------------------------------------------

  /** Append `payload` (encoded image bytes for [[synth]] of the id
    * column) and the typed metadata struct. Fixture side of the
    * pipeline: at production scale this column arrives from ingest. */
  def synthImagePayload(df: DataFrame, idCol: String, format: String = "png"): DataFrame = {
    val schema = StructType(df.schema.fields)
      .add("payload", BinaryType).add("meta", Multimodal.metadataType)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = encode(synth(r.getLong(idx)), format)
        graft.RowUtil.appended(r, bytes,
          org.apache.spark.sql.Row(s"image/$format", bytes.length.toLong, null))
      }
    }(Encoders.row(schema))
  }

  /** REAL decode + pixel reduction: appends (width, height, n_pixels,
    * first_px, checksum, brightness) from the ImageIO-decoded payload. */
  def extractImageFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields)
      .add("width", LongType).add("height", LongType).add("n_pixels", LongType)
      .add("first_px", LongType).add("checksum", LongType).add("brightness", DoubleType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val (w, h, sum, first) = stats(decode(r.getAs[Array[Byte]](idx)))
        graft.RowUtil.appended(r, w.toLong, h.toLong, w.toLong * h,
          first.toLong, sum % 256, sum.toDouble / (3.0 * w * h))
      }
    }(Encoders.row(schema))
  }

  /** Decode → nearest-neighbor resize → RE-encode (possibly to a
    * different lossless format): appends `resized` bytes. Exercises the
    * full decode→transform→encode loop a media pipeline runs per row. */
  def resizeImagePayload(df: DataFrame, payloadCol: String, factor: Int,
      outFormat: String = "bmp"): DataFrame = {
    val schema = StructType(df.schema.fields).add("resized", BinaryType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val small = resizeNearest(decode(r.getAs[Array[Byte]](idx)), factor)
        graft.RowUtil.appended(r, encode(small, outFormat))
      }
    }(Encoders.row(schema))
  }

  /** 64-bit difference hash (dHash) of an image, returned as 8 row
    * bytes (one long per grid row, bits 0..7): sample a 9×8 grayscale
    * grid by nearest-neighbor — sx(i) = i·W div 9 (i ∈ 0..8),
    * sy(j) = j·H div 8, gray = (r+g+b) div 3, all integer — and set
    * bit i of row j iff gray(sx(i+1), sy(j)) > gray(sx(i), sy(j)).
    * The standard perceptual fingerprint for image near-dup: invariant
    * to uniform brightness shifts and (with the integer grid) to
    * resolution, cheap to compare via per-row XOR bit counts. Integer
    * sampling instead of box averaging keeps it exactly replayable by
    * the oracle (the [[resizeNearest]] discipline). */
  def dHashRows(img: BufferedImage): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    def gray(x: Int, y: Int): Int = {
      val p = img.getRGB(x, y)
      (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
    }
    val out = new Array[Long](8)
    var j = 0
    while (j < 8) {
      val sy = j * h / 8
      var bits = 0L
      var i = 0
      while (i < 8) {
        if (gray((i + 1) * w / 9, sy) > gray(i * w / 9, sy)) bits |= (1L << i)
        i += 1
      }
      out(j) = bits
      j += 1
    }
    out
  }

  /** The full 64-bit dHash packed into ONE long: row j contributes its
    * 8 bits at positions 8·j..8·j+7 (`Σ row_j << (8·j)` — the rows are
    * 8-bit, so the pack is exact and lossless). Bit 63 may be set, so
    * the value is the SIGNED 64-bit reinterpretation — both grouping
    * and the oracle compare the same signed long. */
  def dHash64(img: BufferedImage): Long = {
    val rows = dHashRows(img)
    var acc = 0L
    var j = 0
    while (j < 8) { acc |= rows(j) << (8 * j); j += 1 }
    acc
  }

  /** REAL decode + perceptual hash: appends `dhash` (ONE long — the
    * 64-bit dHash via [[dHash64]]) from the ImageIO-decoded payload.
    * Row-local — the shuffle-side of any dedup built on it carries
    * 64 bits per image, never pixels; a scalar key also groups cheaper
    * than an array and keeps gated outputs scalar-only (the driver
    * harness row-sorts results and cannot sort array columns). */
  def imageDHash(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields).add("dhash", LongType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        graft.RowUtil.appended(r,
          dHash64(decode(r.getAs[Array[Byte]](idx))))
      }
    }(Encoders.row(schema))
  }
}
