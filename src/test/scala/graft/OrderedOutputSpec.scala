package graft

/** q29 / q36 / q60 intentionally have NO final orderBy: an orderBy above
  * their opaque map stage would make the range partitioner's sampling
  * pass re-execute the whole enrichment/decode a second time, so they
  * rely on pre-sorted input + order-preserving mapPartitions instead
  * (rationale comments at each query). The correctness gate hashes rows
  * in collected order, so a plan change (AQE re-plan, writer reorder,
  * partitioner change) that silently breaks that implicit ordering
  * would only surface at grading time. These specs collect each query
  * and assert the key column is globally sorted, so a reorder
  * regression fails fast in `sbt test`. */
class OrderedOutputSpec extends SparkSpec {

  private def assertSortedBy(query: String, key: String): Unit = {
    val rows = SparkEntry.queries(query)(spark, sf).select(key).collect()
    assert(rows.nonEmpty, s"$query returned no rows")
    val keys = rows.map(_.getLong(0)).toSeq
    assert(keys == keys.sorted,
      s"$query output not sorted by $key — implicit physical ordering broke " +
        s"(first disorder near index ${keys.zip(keys.sorted).indexWhere(p => p._1 != p._2)})")
  }

  test("q29_multimodal collected output is sorted by doc_id") {
    assertSortedBy("q29_multimodal", "doc_id")
  }

  test("q36_async_enrich collected output is sorted by o_orderkey") {
    assertSortedBy("q36_async_enrich", "o_orderkey")
  }

  test("q60_resize collected output is sorted by doc_id") {
    assertSortedBy("q60_resize", "doc_id")
  }
}
