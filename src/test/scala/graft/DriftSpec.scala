package graft

import graft.ext.Drift

/** Corpus drift (q96): exact-integer TVD between snapshot histograms. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("histogramDiff matches a hand computation, zero-filling one-sided keys") {
    val a = Seq("x", "x", "x", "y").toDF("k") // N=4
    val b = Seq("x", "z").toDF("k")           // M=2
    val rows = Drift.histogramDiff(a, b, Seq("k"))
      .select($"k", $"n_a", $"m_b", $"l1_num", $"n_total", $"m_total")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // |n·M − m·N|: x |3·2−1·4|=2, y |1·2−0·4|=2, z |0·2−1·4|=4
    assert(rows.toSeq == Seq(
      ("x", 3L, 1L, 2L, 4L, 2L),
      ("y", 1L, 0L, 2L, 4L, 2L),
      ("z", 0L, 1L, 4L, 4L, 2L)))
  }

  test("tvd: identical → 0, disjoint → 1, and the hand case → 1/2") {
    val a = Seq("x", "x", "x", "y").toDF("k")
    val b = Seq("x", "z").toDF("k")
    assert(Drift.tvd(a, a, Seq("k")) == 0.0)
    assert(Drift.tvd(Seq("p").toDF("k"), Seq("q").toDF("k"), Seq("k")) == 1.0)
    // Σ l1_num = 8, 2·N·M = 16 → 0.5
    assert(Drift.tvd(a, b, Seq("k")) == 0.5)
  }

  test("tvd of two empty snapshots is 0, not an NPE") {
    val empty = Seq.empty[String].toDF("k")
    assert(Drift.tvd(empty, empty, Seq("k")) == 0.0)
    assert(Drift.tvd(empty, Seq("x").toDF("k"), Seq("k")) == 1.0)
  }

  test("tvd is symmetric and bounded on random splits of real docs") {
    val docs = Tables.load(spark, sf, "documents").select($"doc_id", $"lang")
    val even = docs.filter($"doc_id" % 2 === 0)
    val odd = docs.filter($"doc_id" % 2 === 1)
    val d1 = Drift.tvd(even, odd, Seq("lang"))
    val d2 = Drift.tvd(odd, even, Seq("lang"))
    assert(d1 == d2, "TVD must be symmetric")
    assert(d1 >= 0.0 && d1 <= 1.0)
    // even/odd halves of the same corpus should NOT look like different
    // distributions — a loose sanity ceiling, not a tuned threshold
    assert(d1 < 0.5, s"even/odd lang drift unexpectedly large: $d1")
  }
}
