package graft

import graft.ext.Bm25

class Bm25Spec extends SparkSpec {

  /** Independent in-memory reimplementation of the exact integer
    * formula (BigInt throughout, flooring division on positives) —
    * the engine must reproduce it bit for bit. */
  private def expected(corpus: Seq[(Long, String)], nQueries: Int,
      termsPerQuery: Int, k: Int): Seq[(Long, Long, Long, Long)] = {
    val toks = corpus.map { case (id, text) =>
      id -> text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    }.filter(_._2.nonEmpty)
    val tf = toks.flatMap { case (id, ts) => ts.map(t => (id, t)) }
      .groupBy(identity).map { case ((id, t), occ) => (id, t, occ.size.toLong) }.toSeq
    val dl = tf.groupBy(_._1).map { case (id, rs) => id -> rs.map(_._3).sum }
    val n = dl.size.toLong
    val t = dl.values.sum
    val df = tf.groupBy(_._2).map { case (term, rs) => term -> rs.size.toLong }
    def bits(x: Long) = java.lang.Long.toBinaryString(x).length.toLong
    val qterms = df.toSeq.sortBy { case (term, d) => (-d, term) }
      .take(nQueries * termsPerQuery).zipWithIndex
      .map { case ((term, d), i) => term -> (i / termsPerQuery).toLong -> d }
      .map { case ((term, qid), d) => (term, qid, d) }
    val contrib = for {
      (term, qid, d) <- qterms
      (id, tm, f) <- tf if tm == term
    } yield ((qid, id),
      (BigInt(bits(2 * n + 1) - bits(2 * d + 1)) * (BigInt(f) * (20 * t)) * Bm25.Scale
        / (BigInt(f) * (8 * t) + BigInt(3) * t + BigInt(dl(id)) * 9 * n)).toLong)
    contrib.groupBy(_._1).toSeq
      .map { case ((qid, id), cs) => (qid, id, cs.map(_._2).sum) }
      .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy { case (_, id, s) => (-s, id) }.take(k).zipWithIndex
          .map { case ((_, id, s), i) => (qid, (i + 1).toLong, id, s) }
      }.sortBy(r => (r._1, r._2))
  }

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "apple apple apple banana",
    2L -> "apple banana banana cherry",
    3L -> "banana cherry cherry cherry date",
    4L -> "date egg egg fig",
    5L -> "  ", // no tokens: not part of N, never a candidate
    6L -> "Fig FIG fig egg")

  private def run(nQueries: Int, termsPerQuery: Int, k: Int) = {
    import spark.implicits._
    Bm25.topK(corpus.toDF("id", "text"), "id", "text",
        nQueries, termsPerQuery, k)
      .orderBy($"qid", $"rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  test("matches the independent integer reimplementation exactly") {
    assert(run(2, 2, 3) === expected(corpus, 2, 2, 3))
    assert(run(3, 2, 10) === expected(corpus, 3, 2, 10))
    assert(run(1, 4, 2) === expected(corpus, 1, 4, 2))
  }

  test("only docs sharing a query term are candidates; tokenless docs never appear") {
    val got = run(2, 2, 10)
    // top-4 terms by (df desc, term asc): banana(3), apple(2) | cherry(2), date(2)
    val texts = corpus.toMap
    val qt = Map(0L -> Seq("banana", "apple"), 1L -> Seq("cherry", "date"))
    got.foreach { case (qid, _, id, score) =>
      assert(score > 0)
      assert(id != 5L)
      assert(qt(qid).exists(texts(id).toLowerCase.contains), s"qid=$qid id=$id")
    }
  }

  test("rarer term outscores a common one at equal dl") {
    import spark.implicits._
    // 'com' is in every doc (df = N → idf_bits = 0, contributes nothing);
    // 'rare' is in one. The query is {com, rare} (zpads sort after 'rare'
    // so the top-2 df ranking picks exactly these). The doc holding the
    // rare term must beat even a double-tf common-term doc.
    val c = Seq(
      10L -> "com rare zpad1 zpad2",
      11L -> "com com zpad3 zpad4",
      12L -> "com zpad5 zpad6 zpad7")
    val out = Bm25.topK(c.toDF("id", "text"), "id", "text",
        nQueries = 1, termsPerQuery = 2, k = 3)
      .orderBy($"rank").collect()
    assert(out.head.getLong(2) === 10L) // the rare-term doc wins
    assert(out.map(_.getLong(3)).sliding(2).forall(p => p(0) >= p(1)))
  }

  /** Prunable (qid, doc) count, recomputed exactly the way
    * [[Bm25.topKMaxScore]] bounds it — the spec's window into how much
    * work the prune actually removed. */
  private def prunableCount(ix: Bm25.Index,
      q: org.apache.spark.sql.DataFrame, k: Int): Long = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val qi = q.join(Bm25.impacts(ix), "term")
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"ub_fp".desc, $"term")
    val sw = rw.rowsBetween(0, Long.MaxValue)
    val ranked = qi.withColumn("ti", row_number().over(rw))
      .withColumn("suffix_ub", sum($"ub_fp").over(sw))
    val matched = ix.tf.join(ranked, "term")
    val topIds = matched.filter($"ti" === 1)
      .select($"qid".as("q1"), $"id".as("i1"))
    val theta = matched
      .join(topIds, matched("qid") === topIds("q1") && matched("id") === topIds("i1"), "left_semi")
      .join(ix.dl, "id").withColumn("c", Bm25.contribExpr(ix.n, ix.t))
      .groupBy($"qid", $"id").agg(sum($"c").as("s"))
      .withColumn("r", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"s".desc, $"id")))
      .filter($"r" === k).select($"qid", $"s".as("theta"))
    matched.groupBy($"qid", $"id")
      .agg(max($"suffix_ub").as("best_ub"))
      .join(theta, Seq("qid"))
      .filter($"best_ub" < $"theta").count()
  }

  test("MaxScore prune: identical top-k to the unpruned ranking (documents corpus)") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id".as("id"), $"text")
    val ix = Bm25.index(docs, "id", "text")
    val q = ix.queryTerms(8, 3)
    val pruned = Bm25.topKMaxScore(ix, q, 10, Bm25.impacts(ix))
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val full = Bm25.rankTopK(ix.scores(q), 10)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(pruned == full, "the prune changed the exact top-k")
    // impact bounds are hard ceilings: every actual contribution of a
    // query term is <= its term's ub_fp
    import org.apache.spark.sql.functions._
    val viol = ix.tf.join(q, "term").join(ix.dl, "id")
      .withColumn("c", Bm25.contribExpr(ix.n, ix.t))
      .join(Bm25.impacts(ix), "term")
      .filter($"c" > $"ub_fp").count()
    assert(viol == 0L)
    // the word-salad documents corpus is honestly UNPRUNABLE (every
    // doc matches a high-impact term — common words everywhere), which
    // is itself worth pinning: the prune must be a no-op, not a loss
    assert(prunableCount(ix, q, 10) == 0L)
  }

  test("MaxScore prune: non-vacuous on a skewed corpus, still exact") {
    import spark.implicits._
    // 10 strong docs carry the high-impact terms; 30 docs match ONLY
    // the low-impact term 'weak' (tf 1 in a long doc) whose suffix
    // bound cannot reach the θ set by the strong docs — the classic
    // selective-query shape MaxScore exists for
    val strong = (1L to 10L).map(i =>
      (i, "alpha alpha alpha alpha beta beta gamma"))
    val weakOnly = (11L to 40L).map(i =>
      (i, s"weak f${i}a f${i}b f${i}c f${i}d f${i}e f${i}f f${i}g f${i}h f${i}i f${i}j f${i}k"))
    val ix = Bm25.index((strong ++ weakOnly).toDF("id", "text"), "id", "text")
    val q = ix.queryTerms(1, 3) // top-3 df terms: weak, alpha, beta
    val k = 2
    val pruned = Bm25.topKMaxScore(ix, q, k, Bm25.impacts(ix))
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val full = Bm25.rankTopK(ix.scores(q), k)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(pruned == full, "the prune changed the exact top-k")
    val prunable = prunableCount(ix, q, k)
    assert(prunable >= 20L,
      s"expected the weak-only docs prunable, got $prunable — the spec is vacuous")
  }

  test("RRF fuses two ranked lists by integer reciprocal rank, nulls contribute 0") {
    import spark.implicits._
    import graft.ext.Rrf
    // qid 0: doc 1 is #1 in both lists; doc 2 only sparse #2; doc 3 only dense #2
    val sparse = Seq((0L, 1L, 1L), (0L, 2L, 2L)).toDF("qid", "id", "rank")
    val dense = Seq((0L, 1L, 1L), (0L, 3L, 2L)).toDF("qid", "id", "rank")
    val got = Rrf.fuse(Seq("s" -> sparse, "d" -> dense), topK = 10)
      .orderBy("rank")
      .select("rank", "id", "rrf_fp", "r_s", "r_d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4))))
    val c1 = 1000000L / 61; val c2 = 1000000L / 62
    assert(got === Array(
      (1L, 1L, 2 * c1, Some(1L), Some(1L)),   // both lists
      (2L, 2L, c2, Some(2L), None),           // sparse only; id tie-break
      (3L, 3L, c2, None, Some(2L))))          // dense only
  }

  test("persisted index round-trips: loaded scoring equals in-process scoring") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
      .filter(length(trim($"text")) > 0).limit(60)
    val ix = Bm25.index(docs, "doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("bm25ix").toString
    Bm25.writeIndex(ix, path)
    val lx = Bm25.readIndex(spark, path)
    assert(lx.n == ix.n && lx.t == ix.t, "globals round trip")
    def run(i: Bm25.Index) =
      Bm25.rankTopK(i.scores(i.queryTerms(4, 3)), 10)
        .select($"qid", $"rank", $"id", $"score_fp".cast("string"))
        .as[(Long, Long, Long, String)].collect().toSet
    val built = run(ix)
    val loaded = run(lx)
    assert(built.nonEmpty)
    assert(loaded === built, "loaded-index ranking diverged from built-index")
  }
}
