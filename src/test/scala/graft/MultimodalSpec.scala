package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.FeatureExtractor
import org.apache.spark.sql.functions._

/** Multimodal binary plumbing: pack, decode-stub features, resize
  * pooling, and frame sampling (SURVEY.md north star — codecs are
  * stubbed, the Spark-side schema/batching/transport is real). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("packBinary carries payload bytes and typed metadata") {
    val df = Seq((1L, "hello", "s1"), (2L, "", "s2")).toDF("id", "text", "src")
    val packed = Multimodal.packBinary(df, "text", "src")
    val rows = packed.select($"id", $"payload", $"meta.format", $"meta.n_bytes", $"meta.source")
      .as[(Long, Array[Byte], String, Long, String)].collect().sortBy(_._1)
    assert(rows(0)._2.toSeq == "hello".getBytes("UTF-8").toSeq)
    assert(rows(0)._3 == "raw/utf-8" && rows(0)._4 == 5L && rows(0)._5 == "s1")
    assert(rows(1)._2.isEmpty && rows(1)._4 == 0L)
  }

  test("resizeStub average-pools with a ragged tail and survives empty input") {
    assert(FeatureExtractor.resizeStub(Array[Byte](0, 10, 20, 30, 40), 2).toSeq ==
      Seq[Byte](5, 25, 40)) // pairs averaged; lone tail kept as-is
    assert(FeatureExtractor.resizeStub(Array.emptyByteArray, 4).isEmpty)
    // unsigned averaging: 0xFF,0xFD -> 0xFE (not a signed-average artifact)
    assert((FeatureExtractor.resizeStub(Array[Byte](-1, -3), 2)(0) & 0xff) == 0xfe)
  }

  test("resizePayload and sampleFrames produce the expected shapes") {
    val df = Seq((1L, "abcdefghij", "s")).toDF("id", "text", "src") // 10 bytes
    val packed = Multimodal.packBinary(df, "text", "src")
    val resized = Multimodal.resizePayload(packed, "payload", factor = 4)
      .select($"id", length($"resized")).as[(Long, Int)].collect().head
    assert(resized._2 == 3) // ceil(10/4)
    val frames = Multimodal.sampleFrames(packed, "payload", "id", frameBytes = 3, stride = 2)
      .select($"frame_no", length($"frame")).as[(Long, Int)].collect().sortBy(_._1)
    // chunks: 0:[abc] 1:[def] 2:[ghi] 3:[j]; stride 2 keeps 0 and 2
    assert(frames.map(_._1).toSeq == Seq(0L, 2L))
    assert(frames.map(_._2).toSeq == Seq(3, 3))
  }

  test("extractFeatures matches a hand computation") {
    val df = Seq((1L, "AB", "s")).toDF("id", "text", "src") // bytes 65,66
    val out = Multimodal.extractFeatures(Multimodal.packBinary(df, "text", "src"), "payload")
      .select($"n_bytes", $"first_byte", $"checksum", $"brightness")
      .as[(Long, Long, Long, Double)].collect().head
    assert(out == ((2L, 65L, (65L + 66L) % 256L, (65.0 + 66.0) / 2.0)))
  }
}
