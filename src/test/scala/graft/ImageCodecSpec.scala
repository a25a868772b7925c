package graft

import graft.ext.ImageCodec
import org.apache.spark.sql.functions._

/** Real `javax.imageio` codec path (q29/q60): PNG and BMP round-trips
  * must be pixel-lossless, nearest-neighbor resize must sample exactly
  * (x*f, y*f), and the DataFrame operators must reproduce the pixel
  * formula the DuckDB oracle replays. */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  private def formulaStats(id: Long): (Int, Int, Long, Int) = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      sum += ((id * 7 + x * 3 + y * 5) % 256) +
        ((x.toLong * x + y) % 256) + ((id + x + y * 2) % 256)
    }
    (w, h, sum, ((id * 7) % 256).toInt)
  }

  test("PNG and BMP encode/decode round-trips are pixel-lossless") {
    for (id <- Seq(0L, 1L, 17L, 12345L); fmt <- Seq("png", "bmp")) {
      val img = ImageCodec.synth(id)
      val back = ImageCodec.decode(ImageCodec.encode(img, fmt))
      assert(back.getWidth == img.getWidth && back.getHeight == img.getHeight)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert((back.getRGB(x, y) & 0xffffff) == (img.getRGB(x, y) & 0xffffff),
          s"$fmt pixel ($x,$y) of id=$id corrupted")
    }
  }

  test("decode rejects undecodable bytes instead of returning garbage") {
    val e = intercept[IllegalArgumentException] {
      ImageCodec.decode("not an image".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("could not decode"))
  }

  test("stats match the generator formula (decode reproduces every pixel)") {
    for (id <- Seq(0L, 3L, 42L, 9999L)) {
      val decoded = ImageCodec.decode(ImageCodec.encode(ImageCodec.synth(id), "png"))
      assert(ImageCodec.stats(decoded) == formulaStats(id))
    }
  }

  test("resizeNearest samples (x*f, y*f) with ceil dims") {
    val img = ImageCodec.synth(11L) // 8+2=10 x 8+4=12
    val small = ImageCodec.resizeNearest(img, 3)
    assert(small.getWidth == 4 && small.getHeight == 4) // ceil(10/3), ceil(12/3)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((small.getRGB(x, y) & 0xffffff) == (img.getRGB(x * 3, y * 3) & 0xffffff))
  }

  test("DataFrame chain: synth -> png -> decode features matches the formula") {
    val ids = Seq(0L, 5L, 100L, 777L)
    val out = ImageCodec.extractImageFeatures(
        ImageCodec.synthImagePayload(ids.toDF("doc_id"), "doc_id", "png"), "payload")
      .select($"doc_id", $"width", $"height", $"n_pixels", $"first_px", $"checksum")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    for (((id, w, h, np, fp, ck), i) <- out.zipWithIndex) {
      val (ew, eh, esum, efp) = formulaStats(ids.sorted.apply(i))
      assert(id == ids.sorted.apply(i))
      assert(w == ew && h == eh && np == ew.toLong * eh)
      assert(fp == efp && ck == esum % 256)
    }
  }

  test("DataFrame resize chain re-encodes to BMP and stats the sampled grid") {
    val ids = Seq(4L, 13L)
    val packed = ImageCodec.synthImagePayload(ids.toDF("doc_id"), "doc_id", "png")
    val out = ImageCodec.extractImageFeatures(
        ImageCodec.resizeImagePayload(packed, "payload", 2, "bmp"), "resized")
      .select($"doc_id", $"width", $"height", $"checksum")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    for ((id, rw, rh, ck) <- out) {
      val src = ImageCodec.synth(id)
      val ew = (src.getWidth + 1) / 2
      val eh = (src.getHeight + 1) / 2
      var sum = 0L
      for (y <- 0 until eh; x <- 0 until ew) {
        val p = src.getRGB(x * 2, y * 2)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      }
      assert(rw == ew && rh == eh, s"id=$id resized dims")
      assert(ck == sum % 256, s"id=$id resized checksum")
    }
  }

  test("dHash is brightness-shift invariant, resolution-stable, and content-sensitive") {
    import graft.ext.ImageCodec
    import java.awt.image.BufferedImage
    def mk(w: Int, h: Int, f: (Int, Int) => Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = f(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    val base = mk(36, 32, (x, y) => x * 5 + y)
    // +40 uniform brightness: every gradient sign unchanged
    val bright = mk(36, 32, (x, y) => math.min(255, x * 5 + y + 40))
    assert(ImageCodec.dHashRows(base).toSeq == ImageCodec.dHashRows(bright).toSeq)
    // 4x resolution of the SAME gradient field: sampled grid sees the
    // same signs (sampling is proportional, content scaled to match)
    val big = mk(144, 128, (x, y) => (x / 4) * 5 + y / 4)
    assert(ImageCodec.dHashRows(base).toSeq == ImageCodec.dHashRows(big).toSeq)
    // reversed gradient: every horizontal comparison flips
    val flipped = mk(36, 32, (x, y) => 200 - x * 5 + y)
    assert(ImageCodec.dHashRows(base).toSeq != ImageCodec.dHashRows(flipped).toSeq)
    // decode round-trip (PNG lossless) preserves the hash
    val rt = ImageCodec.decode(ImageCodec.encode(base, "png"))
    assert(ImageCodec.dHashRows(rt).toSeq == ImageCodec.dHashRows(base).toSeq)
  }

  test("dHash64 packs the 8 row bytes losslessly (bit 8j+i = row j bit i)") {
    import graft.ext.ImageCodec
    // synthetic ids cover varied dims; verify pack against rows bit-by-bit,
    // including a hash with bit 63 set (negative long) if one occurs
    var sawNegative = false
    for (id <- 0L until 512L) {
      val img = ImageCodec.synth(id)
      val rows = ImageCodec.dHashRows(img)
      val packed = ImageCodec.dHash64(img)
      if (packed < 0) sawNegative = true
      for (j <- 0 until 8; i <- 0 until 8) {
        val fromRows = (rows(j) >> i) & 1L
        val fromPack = (packed >>> (8 * j + i)) & 1L
        assert(fromRows == fromPack, s"id=$id j=$j i=$i")
      }
      // rows are 8-bit, so the pack must round-trip exactly
      val unpacked = (0 until 8).map(j => (packed >>> (8 * j)) & 0xffL)
      assert(unpacked == rows.toSeq)
    }
    // the signed-reinterpretation path (bit 63 set) must be exercised
    assert(sawNegative, "expected at least one dHash with bit 63 set in 512 synthetic images")
  }
}
