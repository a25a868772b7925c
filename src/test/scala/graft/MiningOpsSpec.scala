package graft

import graft.ext.{Similarity, SurprisalScore}
import org.apache.spark.sql.functions._

/** Specs for the training-data mining operators: surprisal scoring and
  * hard-negative mining. */
class MiningOpsSpec extends SparkSpec {
  import spark.implicits._

  test("BPE training merges the classic low/lower corpus in the expected order") {
    // the standard BPE walkthrough shape: "lo" dominates, then builds up
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val m = graft.ext.BpeTrain.merges(words, 4)
      .select($"merge_rank", $"lhs", $"rhs", $"merged", $"pair_freq")
      .as[(Long, String, String, String, Long)].collect().toList
    // hand-computed: es(9) -> est(9) -> lo(7) -> low(5); ties none
    assert(m == List(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L),
      (4L, "lo", "w", "low", 7L)), s"unexpected merge sequence: $m")
    // determinism: a rerun reproduces the table bit-for-bit
    val m2 = graft.ext.BpeTrain.merges(words, 4)
      .select($"merge_rank", $"lhs", $"rhs", $"merged", $"pair_freq")
      .as[(Long, String, String, String, Long)].collect().toList
    assert(m == m2)
    // the trained dictionary IS the applied tokenizer: after es, est,
    // lo, low the words segment as expected
    val dict = graft.ext.BpeTrain.train(words, 4).dict
      .select($"word", $"sym").as[(String, String)].collect().toMap
    assert(dict("newest") == " n; e; w; est;", s"got ${dict("newest")}")
    assert(dict("low") == " low;")
    assert(dict("lower") == " low; e; r;")
    assert(dict("widest") == " w; i; d; est;")
  }

  test("BPE merge rewrite never fuses the rhs with the PREFIX of a longer symbol") {
    // round 1 merges (b,c) (freq 8), leaving word 'abc' in state
    // [a, bc]; round 2's best pair is (a,b) (freq 3 from 'abd', lex
    // tie-break over (b,d)). An unguarded ' a b' -> ' ab' replace
    // would fuse 'a' with the PREFIX of symbol 'bc' -> [abc]; the
    // ';'-terminated state must leave [a, bc] untouched.
    val words = Seq(("abc", 2L), ("bc", 6L), ("abd", 3L)).toDF("word", "freq")
    val t = graft.ext.BpeTrain.train(words, 2)
    val m = t.merges.select($"merge_rank", $"lhs", $"rhs", $"pair_freq")
      .as[(Long, String, String, Long)].collect().toList
    assert(m == List((1L, "b", "c", 8L), (2L, "a", "b", 3L)), s"got $m")
    val dict = t.dict.select($"word", $"sym").as[(String, String)].collect().toMap
    assert(dict("abc") == " a; bc;", s"boundary fusion: got ${dict("abc")}")
    assert(dict("abd") == " ab; d;")
    assert(dict("bc") == " bc;")
  }

  test("driver-local BPE trainer is bit-identical to the distributed loop") {
    // the production-vocabulary scale path (zero Spark jobs per merge)
    // must replay the distributed semantics exactly: same merge table,
    // same final dictionary states, on a corpus with ties, overlap
    // chains ('aaaa'), and prefix-hazard adjacencies ('abc'/'abd')
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("aaaa", 4L), ("abc", 2L), ("bc", 6L), ("abd", 3L)).toDF("word", "freq")
    val a = graft.ext.BpeTrain.train(words, 6)
    val b = graft.ext.BpeTrain.trainLocal(words, 6)
    val ma = a.merges.as[(Long, String, String, String, Long)].collect().toList
    val mb = b.merges.as[(Long, String, String, String, Long)].collect().toList
    assert(ma == mb, s"merge tables diverge:\n  dist  = $ma\n  local = $mb")
    val da = a.dict.select($"word", $"sym", $"freq")
      .as[(String, String, Long)].collect().toSet
    val db = b.dict.select($"word", $"sym", $"freq")
      .as[(String, String, Long)].collect().toSet
    assert(da == db, s"dicts diverge:\n  dist  = $da\n  local = $db")
  }

  test("batched BPE trainer is bit-identical to the one-merge loop") {
    // same adversarial corpus as the trainLocal parity case (ties,
    // overlap chains, prefix hazards) plus the real sf dictionary —
    // the safe-prefix batching must reproduce the sequential merge
    // table and dictionary exactly
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("aaaa", 4L), ("abc", 2L), ("bc", 6L), ("abd", 3L)).toDF("word", "freq")
    val a = graft.ext.BpeTrain.train(words, 6)
    val b = graft.ext.BpeTrain.trainBatched(words, 6)
    assert(a.merges.as[(Long, String, String, String, Long)].collect().toList ==
      b.merges.as[(Long, String, String, String, Long)].collect().toList)
    assert(a.dict.select($"word", $"sym", $"freq").as[(String, String, Long)].collect().toSet ==
      b.dict.select($"word", $"sym", $"freq").as[(String, String, Long)].collect().toSet)
    val corpus = graft.ext.BpeTrain.wordDict(
      Tables.load(spark, sf, "documents"), "text")
    val ca = graft.ext.BpeTrain.train(corpus, 24)
    val (cb, rounds) = graft.ext.BpeTrain.trainBatchedRounds(corpus, 24, 64)
    assert(ca.merges.as[(Long, String, String, String, Long)].collect().toList ==
      cb.merges.as[(Long, String, String, String, Long)].collect().toList,
      "batched trainer diverges from sequential on the sf corpus")
    assert(rounds < 24, s"batching never batched: $rounds rounds for 24 merges")
  }

  test("batched BPE applies >= 10 merges in one job on a disjoint-pair corpus") {
    // 12 two-letter words with strictly decreasing frequencies and
    // pairwise-disjoint alphabets: the ranking's safe prefix is all 12
    // pairs, so one TakeOrdered round applies every merge
    val pairs = Seq("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr",
      "st", "uv", "wx")
    val words = pairs.zipWithIndex.map { case (w, i) => (w, (100 - i).toLong) }
      .toDF("word", "freq")
    val (t, rounds) = graft.ext.BpeTrain.trainBatchedRounds(words, 12, 64)
    assert(rounds == 1, s"expected one batched round, took $rounds")
    val m = t.merges.as[(Long, String, String, String, Long)].collect().toList
    assert(m.map(x => (x._2, x._3)) == pairs.map(w => (w(0).toString, w(1).toString)).toList)
    assert(m.map(_._5) == (100L to 89L by -1L).toList)
    // and it still equals the sequential loop
    val s = graft.ext.BpeTrain.train(words, 12)
      .merges.as[(Long, String, String, String, Long)].collect().toList
    assert(m == s)
  }

  test("BPE training counts every adjacency but merges non-overlapping") {
    // 'aaaa' x3: the COUNT sees all 3 adjacencies per word (standard
    // BPE get_stats semantics) -> 9; the MERGE rewrites left-to-right
    // non-overlapping, so 'a a a a' -> 'aa aa' and round 2 sees
    // (aa,aa) x1 per word -> 3
    val words = Seq(("aaaa", 3L)).toDF("word", "freq")
    val m = graft.ext.BpeTrain.merges(words, 2)
      .select($"lhs", $"rhs", $"pair_freq").as[(String, String, Long)].collect().toList
    assert(m.head == (("a", "a", 9L)), s"got $m")
    assert(m(1) == (("aa", "aa", 3L)), s"got $m")
  }

  test("BPE training throws when the corpus cannot support the requested merges") {
    val words = Seq(("ab", 1L)).toDF("word", "freq") // best pair freq 1 < 2
    intercept[IllegalStateException] {
      graft.ext.BpeTrain.merges(words, 1)
    }
  }

  test("surprisal charges rare bigrams more bits than common ones") {
    // "x y" appears once; "a b" appears 8 times across docs
    val docs = ((1 to 8).map(i => (i.toLong, "a b")) :+ (9L, "x y")).toDF("doc_id", "text")
    val out = SurprisalScore.tokenBigramSurprisal(docs, "doc_id", "text")
      .select($"id", $"surprisal_bits").as[(Long, Option[Long])].collect().toMap
    // N=9 (bitlen 4): common bigram c=8 (bitlen 4) -> 0 bits;
    // rare c=1 (bitlen 1) -> 3 bits
    assert(out(1L) === Some(0L))
    assert(out(9L) === Some(3L))
  }

  test("surprisal gives no score to documents without a bigram") {
    val docs = Seq((1L, "solo"), (2L, "two tokens here")).toDF("doc_id", "text")
    val out = SurprisalScore.tokenBigramSurprisal(docs, "doc_id", "text")
      .select($"id", $"n_bigrams", $"millibits_per_gram")
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 == 0L && out(1L)._2.isEmpty)
    assert(out(2L)._1 == 2L && out(2L)._2.isDefined)
  }

  test("hard negatives only ever pair across labels, ranked by cosine") {
    val emb = Tables.load(spark, sf, "embeddings")
    val out = Similarity.hardNegatives(emb, emb.filter($"vec_id" < 5),
        "vec_id", "embedding", "label", k = 5).cache()
    assert(out.filter($"query_label" === $"neighbor_label").isEmpty,
      "a hard negative must have a different label")
    assert(out.groupBy($"query_id").count().filter($"count" =!= 5).isEmpty)
    // rank 1 must dominate every same-query cosine
    val bad = out.as("a").join(out.as("b"),
      $"a.query_id" === $"b.query_id" && $"a.rank" < $"b.rank" && $"a.cos" < $"b.cos")
    assert(bad.isEmpty, "ranks must be cosine-descending")
    out.unpersist()
  }

  test("winnowing guarantees a shared fingerprint for any span >= k+w-1") {
    import graft.ext.Winnowing
    // docs 1/2 share an 11-char span ("QUOTEDSPAN!") embedded in
    // otherwise-different text; doc 3 is disjoint material
    val docs = Seq(
      (1L, "left padding QUOTEDSPAN! and a tail of unrelated words"),
      (2L, "completely other prefix QUOTEDSPAN! different suffix here"),
      (3L, "nothing in common with either of the documents above 123"))
      .toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert((fps(1L) & fps(2L)).nonEmpty,
      "shared >= k+w-1 span must yield a common fingerprint")
    // density: winnowing selects ~2/(w+1) of the k-grams, far below all
    val n1 = docs.filter($"doc_id" === 1).select(length($"text")).head.getInt(0) - 7
    assert(fps(1L).size < n1, "selection must be a strict sample of the k-grams")
  }

  test("winnowing selection is deterministic and short docs are absent") {
    import graft.ext.Winnowing
    val docs = Seq((1L, "abcdefghij"), (2L, "0123456789abcdef")).toDF("doc_id", "text")
    // doc 1 has 10 chars -> 3 k-grams < w=4 full window -> absent
    val a = Winnowing.fingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(!a.exists(_._1 == 1L))
    assert(a.exists(_._1 == 2L))
    val b = Winnowing.fingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("ccnetBuckets: per-lang tercile boundaries are ordered and rank-exact") {
    val docs = Tables.load(spark, sf, "documents")
    val out = graft.ext.SurprisalScore
      .ccnetBuckets(docs, "doc_id", "text", "lang")
      .select($"lang", $"mb", $"bucket")
      .as[(String, Long, String)].collect().toSeq
    assert(out.nonEmpty)
    val langs = out.map(_._1).distinct
    for (l <- langs) {
      val g = out.filter(_._1 == l)
      val byB = g.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      val n = g.size.toLong
      // every bucket present once there are ≥ 3 distinct scores
      if (g.map(_._2).distinct.size >= 3)
        assert(Set("head", "middle", "tail").subsetOf(byB.keySet), s"lang=$l $byB")
      // score ranges never interleave: head < middle < tail
      for {
        h <- byB.get("head"); m <- byB.get("middle")
      } assert(h.max < m.min, s"lang=$l head/middle overlap")
      for {
        m <- byB.get("middle"); t <- byB.get("tail")
      } assert(m.max < t.min, s"lang=$l middle/tail overlap")
      // threshold semantics: head is the smallest score-prefix with
      // ≥ N/3 docs (dropping its top score group must go below N/3)
      val headN = byB.get("head").map(_.size.toLong).getOrElse(0L)
      assert(headN * 3 >= n, s"lang=$l head too small: $headN of $n")
      byB.get("head").foreach { h =>
        val withoutTop = h.count(_ < h.max).toLong
        assert(withoutTop * 3 < n, s"lang=$l head overshoots past its tie group")
      }
    }
  }

  test("q176 persisted-registry serving equals the q171 slice (round trip lossless)") {
    val expect = graft.queries.MiningQueries.q171ScoreCalibration(spark, sf)
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", $"source", $"mb", $"bkt", $"src_pct_ppm",
        ($"src_pct_ppm" < 500000).cast("int").as("cal_keep"))
      .as[(Long, String, Long, Long, Long, Int)].collect().toSeq
    val got = graft.queries.MiningQueries.q176PersistedCalibServe(spark, sf)
      .as[(Long, String, Long, Long, Long, Int)].collect().toSeq
    assert(got.nonEmpty)
    assert(got == expect, "serving from the parquet registry diverged")
  }

  test("q175 mixing plan: weights are the normalized unique-kept token mass") {
    val rows = graft.queries.MiningQueries.q175MixingPlan(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val totTok = rows.map(_._5).sum
    rows.foreach { case (src, nDocs, nUniq, nKept, tok, w) =>
      assert(nUniq <= nDocs && nKept <= nUniq, s"$src counts disordered")
      // a calibrated-kept doc carries >= 2 tokens by construction
      assert(nKept == 0 || tok >= 2 * nKept, s"$src token mass too small")
      assert(w == tok * 1000000L / totTok, s"$src weight not normalized")
    }
    // integer floor: weights sum to 1e6 minus at most one ulp per source
    val wsum = rows.map(_._6).sum
    assert(wsum <= 1000000L && wsum > 1000000L - rows.length)
  }

  test("q171 calibration ppm ranks replay the bucketed-score ECDF") {
    val docs = Tables.load(spark, sf, "documents")
    val scored = SurprisalScore.bucketedScores(docs, "doc_id", "text", "source")
      .select($"doc_id", $"source", $"mb", $"bkt")
      .as[(Long, String, Long, Long)].collect()
    val bySrc = scored.groupBy(_._2)
    def ppm(below: Long, tot: Long): Long = below * 1000000L / tot
    val n = scored.length.toLong
    val got = graft.queries.MiningQueries.q171ScoreCalibration(spark, sf)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect()
    // every scored document survives the calibration join (the serving
    // table covers exactly the training corpus's (source, bucket) keys)
    assert(got.length == scored.length && got.nonEmpty)
    got.foreach { case (_, src, _, bkt, sp, gp, gap) =>
      val inSrc = bySrc(src)
      assert(sp == ppm(inSrc.count(_._4 < bkt).toLong, inSrc.length.toLong))
      assert(gp == ppm(scored.count(_._4 < bkt).toLong, n))
      assert(gap == sp - gp)
    }
  }

  test("q146b: exact-verify decontamination — FN structurally zero, FP zero after verify") {
    val out = graft.queries.MiningQueries.q146bDecontamVerified(spark, sf)
      .select($"doc_id", $"is_candidate", $"is_contaminated")
      .as[(Long, Int, Int)].collect()
    // brute-force truth, independent of winnowing: a train doc is
    // contaminated iff it shares an exact 27-char substring with the
    // eval slice (computed over ALL docs — no candidate narrowing, so
    // the comparison also proves narrowing the verify sets was sound)
    val docs = graft.Tables.load(spark, sf, "documents")
    def grams(side: org.apache.spark.sql.DataFrame) = side
      .filter(length($"text") >= 27)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, length(text) - 26), i -> substring(text, i, 27))")).as("g"))
    val truth = grams(docs.filter($"doc_id" % 10 =!= 0))
      .join(grams(docs.filter($"doc_id" % 10 === 0)).select($"g").distinct(),
        Seq("g"), "left_semi")
      .select($"doc_id").as[Long].collect().toSet
    // FP = 0: the verified flag IS the exact truth, on every row
    out.foreach { case (id, _, v) =>
      assert((v == 1) == truth.contains(id),
        s"doc $id verified=$v but exact truth=${truth.contains(id)}")
    }
    // FN structurally zero: every truly contaminated doc is a candidate
    out.foreach { case (id, cand, _) =>
      if (truth.contains(id))
        assert(cand == 1, s"doc $id contaminated but not a candidate — recall broken")
    }
    // and the verify stage is non-vacuous at this operating point:
    // some candidates must be refuted (q183 measured FP 331 raw)
    assert(out.exists { case (_, cand, v) => cand == 1 && v == 0 },
      "no refuted candidates — the exact-verify stage proved nothing")
    assert(out.exists(_._3 == 1), "no contaminated docs at all — degenerate corpus")
  }

  test("q183: winnowing long-span guarantee holds — no FN class on the corpus") {
    val out = graft.queries.MiningQueries.q183WinnowEval(spark, sf)
      .as[(String, Long)].collect().toMap
    // the theorem: any shared >= 27-char span plants a common selected
    // fingerprint in both docs, so truth-positive docs can never be missed
    assert(!out.contains("FN"), s"winnowing guarantee violated: $out")
    assert(out.getOrElse("TP", 0L) > 0, s"degenerate matrix (no TP): $out")
    assert(out.getOrElse("TN", 0L) > 0, s"degenerate matrix (no TN): $out")
    assert(out.values.sum == 500L, s"classes must partition the corpus: $out")
  }

  test("applyMerges replays training exactly and tokenizes unseen words") {
    import graft.ext.BpeTrain
    val docs = Seq((1L, "low low low low low lower lower newest newest newest " +
      "newest newest newest widest widest widest")).toDF("doc_id", "text")
    val words = BpeTrain.wordDict(docs, "text")
    val trained = BpeTrain.trainBatched(words, 8)
    val rules = BpeTrain.collectMerges(trained.merges)
    // round trip: applying the frozen rules to the TRAINING words must
    // reproduce the trained dictionary's symbol state bit-for-bit
    val replayed = BpeTrain.applyMerges(words, rules)
      .select($"word", $"sym").as[(String, String)].collect().toMap
    val dict = trained.dict.select($"word", $"sym")
      .as[(String, String)].collect().toMap
    assert(replayed === dict, "frozen-rule replay diverged from training")
    // unseen words tokenize under the same vocabulary: "lowest" was
    // never trained but is built from trained merges (low + est)
    val unseen = Seq(("lowest", 1L), ("zq", 1L)).toDF("word", "freq")
    val out = BpeTrain.applyMerges(unseen, rules)
      .select($"word", (size(split($"sym", " ")) - 1).as("n"))
      .as[(String, Int)].collect().toMap
    assert(out("lowest") < "lowest".length,
      s"unseen word got no merges: ${out("lowest")} tokens")
    assert(out("zq") == 2, "never-merged chars must stay one token each")
  }

  test("q188 ensemble: dense ranks, exact RRF arithmetic, and members ranked by at least one signal") {
    val out = graft.queries.MiningQueries.q188QualityEnsemble(spark, sf).collect()
    assert(out.length == 50)
    // dense 1..50 consensus ranks, non-increasing fused scores
    assert(out.map(_.getLong(0)).toSeq == (1L to 50L))
    val fps = out.map(_.getLong(2))
    assert(fps.zip(fps.tail).forall { case (a, b) => a >= b })
    out.foreach { r =>
      val ranks = Seq(3, 4, 5).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))
      assert(ranks.exists(_.isDefined), s"doc ${r.getLong(1)} in consensus but unranked by every signal")
      // exact fixed-point RRF: sum of 10^6 DIV (60 + rank) over attached ranks
      val expect = ranks.flatten.map(rk => 1000000L / (60L + rk)).sum
      assert(r.getLong(2) == expect, s"doc ${r.getLong(1)} rrf_fp ${r.getLong(2)} != $expect")
      ranks.flatten.foreach(rk => assert(rk >= 1L && rk <= 100L))
    }
    // consensus head: the top doc must be ranked by at least two signals
    // (a single 1st place scores 16393 < two mid-list placements)
    assert(Seq(3, 4, 5).count(i => !out.head.isNullAt(i)) >= 2)
  }

  test("winnowing guarantee on a crafted shared-span pair") {
    val span = "abcdefghijklmnopqrstuvwxyz!" // 27 chars, unique content
    val docs = Seq(
      (1L, "XX1 " * 10 + span + " YY1 tail one"),
      (2L, "ZZ2 " * 12 + span + " QQ2 other tail"),
      (3L, "completely unrelated text with no shared span at all 333"))
      .toDF("doc_id", "text")
    val fps = graft.ext.Winnowing.fingerprints(docs, "doc_id", "text", k = 20, w = 8)
    val shared = fps.groupBy($"fp")
      .agg(count_distinct($"id").as("nd")).filter($"nd" >= 2)
    val flagged = fps.join(shared.select("fp"), Seq("fp"), "left_semi")
      .select($"id").distinct().as[Long].collect().toSet
    assert(flagged.contains(1L) && flagged.contains(2L),
      s"docs sharing a 27-char span must both be flagged: $flagged")
    assert(!flagged.contains(3L), s"unrelated doc flagged: $flagged")
  }
}
