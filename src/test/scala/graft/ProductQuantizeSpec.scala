package graft

import org.apache.spark.sql.functions._
import graft.ext.ProductQuantize

class ProductQuantizeSpec extends SparkSpec {

  // 8 perfectly separated patterns (constant vectors j*10), replicated:
  // vector i carries pattern i%8; labels are seed pick order, so the
  // pattern→codeword mapping is a bijection but not the identity
  private lazy val separable = {
    import spark.implicits._
    (0L until 64L).map { i =>
      val p = i % 8
      (i, Array.fill(64)(p * 10L).toSeq)
    }.toDF("id", "codes")
  }

  test("separable clusters: exact recovery, zero reconstruction error") {
    val rows = ProductQuantize.encode(separable).collect()
    assert(rows.length === 64)
    // every vector of a pattern gets the same codewords, the four
    // subspaces agree (identical slices), the 8 patterns land on 8
    // distinct codewords, and reconstruction is exact
    val labels = rows.groupBy(_.getLong(0) % 8).map { case (p, rs) =>
      val pqs = rs.map(_.getSeq[Long](1)).toSeq
      assert(pqs.distinct.size == 1, s"pattern $p splits across codewords")
      assert(pqs.head.distinct.size == 1, s"subspaces disagree for pattern $p")
      pqs.head.head
    }
    assert(labels.toSeq.distinct.size == 8, "patterns must map to 8 distinct codewords")
    rows.foreach(r => assert(r.getLong(2) === 0L, s"id=${r.getLong(0)} recon_dist2"))
  }

  test("ADC search: same-pattern vectors rank first at distance zero") {
    import spark.implicits._
    val books = ProductQuantize.codebooks(separable)
    val queries = separable.filter(col("id") < 2) // patterns 0 and 1
    val top = ProductQuantize.adcTopK(separable, queries, books, topK = 5)
      .collect().groupBy(_.getLong(0))
    for ((qid, rows) <- top) {
      assert(rows.length === 5)
      rows.foreach { r =>
        assert(r.getLong(2) % 8 === qid % 8, s"qid=$qid got ${r.getLong(2)}")
        assert(r.getLong(3) === 0L) // exact same codeword in every subspace
      }
      // self is excluded; zero-distance ties break by ascending id
      val ids = rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      assert(ids === ids.sorted && !ids.contains(qid))
    }
  }

  test("IVF-PQ: probes restrict candidates to coarse cells; same-pattern at distance zero") {
    import spark.implicits._
    val queries = separable.filter(col("id") < 2)
    val top = ProductQuantize.ivfPqTopK(separable, queries, nProbe = 2, topK = 5)
      .collect().groupBy(_.getLong(0))
    assert(top.keySet === Set(0L, 1L))
    for ((qid, rows) <- top) {
      // rank 1..: the query's own cell (residuals identical → distance 0)
      // fills the head; ids ascend within the zero-distance tie
      val head = rows.filter(_.getLong(3) == 0L)
      assert(head.nonEmpty)
      head.foreach(r => assert(r.getLong(2) % 8 === qid % 8))
      // every candidate came from one of the two probed cells — with 8
      // separated patterns that means at most 2 distinct id-residues
      val residues = rows.map(_.getLong(2) % 8).toSet
      assert(residues.size <= 2 && residues.contains(qid % 8))
      assert(!rows.map(_.getLong(2)).contains(qid)) // self excluded
    }
  }

  test("ivfPqSweep slices are value-identical to per-nProbe searches") {
    import spark.implicits._
    // noisy fixture (ties + nonzero residual distances) so equality is
    // exercised on real rankings, not just zero-distance degeneracy
    val noisy = (0L until 64L).map { i =>
      val p = i % 8
      (i, (0 until 64).map(d => p * 30L + (i + d) % 3).toSeq)
    }.toDF("id", "codes")
    val idx = ProductQuantize.ivfPqIndex(noisy)
    val queries = noisy.filter(col("id") < 3)
    val probes = Seq(1, 2, 4, 8)
    val sweep = ProductQuantize.ivfPqSweep(idx, queries, probes, topK = 5)
      .select($"n_probe", $"qid", $"rank", $"vec_id", $"adc_dist2")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val perNp = probes.flatMap { np =>
      ProductQuantize.ivfPqTopKWith(idx, queries, nProbe = np, topK = 5)
        .select(lit(np.toLong).as("n_probe"), $"qid", $"rank", $"vec_id", $"adc_dist2")
        .as[(Long, Long, Long, Long, Long)].collect()
    }.toSet
    assert(sweep.nonEmpty)
    assert(sweep === perNp, "sweep must equal the per-nProbe searches exactly")
  }

  test("codeword ids stay within the codebook and encoding is deterministic") {
    import spark.implicits._
    // noisy variant: pattern + a per-dim wobble that keeps clusters apart
    val noisy = (0L until 64L).map { i =>
      val p = i % 8
      (i, (0 until 64).map(d => p * 30L + (i + d) % 3).toSeq)
    }.toDF("id", "codes")
    val a = ProductQuantize.encode(noisy).orderBy(col("id")).collect()
    val b = ProductQuantize.encode(noisy).orderBy(col("id")).collect()
    assert(a.toSeq === b.toSeq)
    a.foreach { r =>
      r.getSeq[Long](1).foreach(c => assert(c >= 0L && c < ProductQuantize.K))
      assert(r.getLong(2) >= 0L)
    }
  }
}
