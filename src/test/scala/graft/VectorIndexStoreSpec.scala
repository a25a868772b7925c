package graft

import graft.ext.{KMeansInt, ProductQuantize, Quantize, VectorIndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted vector index: a parquet round trip must be bit-lossless
  * (loaded index ≡ built index, part by part), and the frozen-codebook
  * ingest path must reproduce training-side assignments without
  * touching training code. */
class VectorIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def assertSame(name: String, a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count(), s"$name: row count drifted")
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      s"$name: loaded part differs from built part")
  }

  private lazy val codes = Quantize.sq8Codes(
    Tables.load(spark, sf, "embeddings"), "vec_id", "embedding")
    .localCheckpoint(true)

  test("persisted IVF-PQ index round-trips bit-lossless and probes identically") {
    val built = ProductQuantize.ivfPqIndex(codes)
    val path = VectorIndexStore.defaultPath(sf + "#spec", "ivfpq")
    VectorIndexStore.writeIvfPq(built, path)
    val loaded = VectorIndexStore.readIvfPq(spark, path)
    assertSame("coarse", built._1, loaded._1)
    assertSame("asg", built._2, loaded._2)
    assertSame("books", built._3, loaded._3)
    assertSame("enc", built._4, loaded._4)
    // a probe against the loaded index must rank exactly as the built one
    val qs = codes.filter($"id" < 4)
    val a = ProductQuantize.ivfPqTopKWith(built, qs, nProbe = 2, topK = 10)
    val b = ProductQuantize.ivfPqTopKWith(loaded, qs, nProbe = 2, topK = 10)
    assertSame("probe", a, b)
  }

  test("frozen codebooks round-trip and reproduce training assignments") {
    val old = codes.filter($"id" % 10 =!= 0)
    val fits = ProductQuantize.subspaceFits(old)
    val books = ProductQuantize.codebooksFromFits(fits)
    val path = VectorIndexStore.defaultPath(sf + "#spec", "books_old")
    VectorIndexStore.writeBooks(books, path)
    val loaded = VectorIndexStore.readBooks(spark, path)
    assertSame("books", books, loaded)
    // encoding the TRAINING vectors against the loaded frozen books
    // reproduces the training-side codewords and errors exactly (same
    // argmin, same ties) — the invariant that makes frozen-codebook
    // ingest a continuation of training, not a different quantizer
    val fromTraining = ProductQuantize.encodeFromFits(fits)
      .select($"id", $"pq", $"recon_dist2")
    val fromFrozen = ProductQuantize.encodeAgainst(old, loaded)
      .select($"id", $"pq", $"recon_dist2")
    assertSame("re-encode", fromTraining, fromFrozen)
  }

  test("ivfPqAdd of indexed vectors reproduces their stored assignments") {
    val built = ProductQuantize.ivfPqIndex(codes)
    val path = VectorIndexStore.defaultPath(sf + "#spec-add", "ivfpq")
    VectorIndexStore.writeIvfPq(built, path)
    val loaded = VectorIndexStore.readIvfPq(spark, path)
    val (_, asg, _, enc) = loaded
    // re-adding vectors the index was BUILT on must land them in the
    // same coarse cell with the same residual codewords — the add path
    // is a continuation of construction, not a different quantizer
    val sample = codes.filter($"id" % 7 === 0)
    val added = ProductQuantize.ivfPqAdd(sample, loaded).localCheckpoint(true)
    val coarseDrift = added.select($"id", $"coarse")
      .except(asg.select($"id", $"coarse"))
    assert(coarseDrift.isEmpty, "coarse re-assignment drifted from the stored asg part")
    val encStored = enc.join(sample.select($"id"), "id")
      .groupBy($"id")
      .agg(transform(array_sort(collect_list(struct($"sub", $"cluster"))),
        s => s("cluster")).as("pq"))
    val pqDrift = added.select($"id", $"pq").except(encStored)
    assert(pqDrift.isEmpty, "residual re-encode drifted from the stored enc part")
  }

  test("ivfPqDelete compacts asg/enc, leaves codebooks, round-trips") {
    val built = ProductQuantize.ivfPqIndex(codes)
    val deletes = built._2.filter($"id" % 5 === 0).select($"id")
      .localCheckpoint(true)
    val nDel = deletes.count()
    assert(nDel > 0, "vacuous: delete batch is empty")
    val compacted = ProductQuantize.ivfPqDelete(built, deletes)
    // codebook parts untouched; corpus parts lose exactly the deletes
    assertSame("coarse", built._1, compacted._1)
    assertSame("books", built._3, compacted._3)
    assert(compacted._2.count() == built._2.count() - nDel,
      "asg: compacted count is not v1 minus deletes")
    assert(compacted._4.count() ==
      built._4.count() - nDel * ProductQuantize.NumSub,
      "enc: compacted count is not v1 minus deletes")
    assert(compacted._2.join(deletes, "id").isEmpty &&
      compacted._4.join(deletes, "id").isEmpty,
      "a deleted id survived compaction")
    // surviving rows are bit-identical after a parquet round trip
    val path = VectorIndexStore.defaultPath(sf + "#spec-del", "ivfpq")
    VectorIndexStore.writeIvfPq(compacted, path)
    val loaded = VectorIndexStore.readIvfPq(spark, path)
    assertSame("asg v2", compacted._2, loaded._2)
    assertSame("enc v2", compacted._4, loaded._4)
  }

  test("q165/q166 gated queries return rows with scalar-only schemas") {
    for (name <- Seq("q165_persisted_probe", "q166_frozen_encode",
        "q167_ivfpq_add", "q168_index_compact")) {
      val df = SparkEntry.queries(name)(spark, sf)
      assert(df.schema.fields.forall(f =>
        !f.dataType.typeName.contains("array")), s"$name: non-scalar output")
      assert(df.count() > 0, s"$name: empty result")
    }
  }
}
