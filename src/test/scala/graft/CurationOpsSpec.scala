package graft

import graft.operators.BloomPrune
import graft.ext.{Quantize, Repetition, Similarity}
import org.apache.spark.sql.functions._

/** Specs for the round-3 curation/scale operators: bloom-pruned semi
  * join, int8 scalar quantization, repetition quality gate, IVF ANN
  * search. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q99 overlapping chunks cover the document and overlap by width-stride") {
    val text = ("abcdefghij" * 60).take(560) // 560 chars -> offsets 0,150,300,450
    val df = Seq((1L, text)).toDF("doc_id", "text")
    // the REAL operator the query uses — not a reimplementation
    val chunks = graft.ext.Chunking.overlapping(df, "text")
      .select($"off".cast("int"), $"chunk")
      .as[(Int, String)].collect().sortBy(_._1)
    assert(chunks.map(_._1).toSeq == Seq(0, 150, 300, 450))
    // coverage: every char position falls inside some chunk
    assert(chunks.forall { case (off, c) => c == text.substring(off, math.min(off + 200, 560)) })
    // overlap: consecutive chunks share width-stride = 50 chars
    chunks.sliding(2).foreach { case Array((o1, c1), (o2, c2)) =>
      assert(c1.takeRight(50) == c2.take(50), s"overlap broken between $o1 and $o2")
    }
  }

  test("q97 size-rank round-robin packing balances bin loads to within one max doc") {
    val bins = graft.queries.CurationQueries.q97PackBins(spark, sf)
      .select($"bin_tokens", $"max_doc").as[(Long, Long)].collect()
    assert(bins.length == 16)
    val loads = bins.map(_._1)
    val maxDoc = bins.map(_._2).max
    assert(loads.max - loads.min <= maxDoc,
      s"round-robin spread ${loads.max - loads.min} exceeds one max-size doc ($maxDoc)")
  }

  test("bloom semi join equals the plain semi join (false positives removed)") {
    val fact = (1L to 1000L).map(k => (k, k % 7)).toDF("k", "v")
    val dim = Seq(3L, 500L, 999L, 1500L).toDF("dk") // 1500 matches nothing
    val got = BloomPrune.bloomSemiJoin(fact, "k", dim, "dk", expectedItems = 10)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 500L, 999L))
    // null fact keys never match (semi-join semantics)
    val withNull = fact.union(Seq((null.asInstanceOf[java.lang.Long], 0L))
      .map(t => (Option(t._1).map(Long.unbox), t._2)).toDF("k", "v"))
    assert(BloomPrune.bloomSemiJoin(withNull, "k", dim, "dk", 10).count() == 3)
    // non-bigint keys are rejected with a clear error, not silently cast
    val e = intercept[IllegalArgumentException] {
      BloomPrune.bloomSemiJoin(Seq(("a", 1L)).toDF("k", "v"), "k", dim, "dk", 10)
    }
    assert(e.getMessage.contains("BIGINT"))
  }

  test("sq8 codes span 0..255 and hit the exact endpoints per dimension") {
    val emb = Tables.load(spark, sf, "embeddings")
    val codes = Quantize.sq8Codes(emb, "vec_id", "embedding")
      .select(explode($"codes").as("c"))
    val mn = codes.agg(min("c"), max("c")).head
    assert(mn.getLong(0) == 0L && mn.getLong(1) == 255L)
    // the corpus min of each dimension quantizes to 0, the max to 255:
    // every dimension must contain both endpoints
    val perDim = Quantize.sq8Codes(emb, "vec_id", "embedding")
      .select(posexplode($"codes").as(Seq("d", "c")))
      .groupBy("d").agg(min("c").as("lo"), max("c").as("hi"))
    assert(perDim.filter($"lo" =!= 0L || $"hi" =!= 255L).count() == 0)
  }

  test("sq8 quantization on a hand-built table gives the expected codes") {
    // dim1 range [0,2]: 0→0, 1→round(127.5)=128 (HALF_UP), 2→255
    // dim2 range [10,30]: 10→0, 20→round(127.5)=128, 30→255
    val df = Seq(
      (1L, Seq(0.0f, 10.0f)),
      (2L, Seq(1.0f, 20.0f)),
      (3L, Seq(2.0f, 30.0f))).toDF("id", "vec")
    val got = Quantize.sq8Codes(df, "id", "vec").orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(0L, 0L))
    assert(got(2L) == Seq(128L, 128L))
    assert(got(3L) == Seq(255L, 255L))
  }

  test("repetition gate flags bigram-spam, keeps varied text, zeros short docs") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),           // one bigram 5x
      (2L, "the quick brown fox jumps over the lazy dog today ok fine"),
      (3L, "hi")).toDF("doc_id", "text")               // too short for grams
    val got = Repetition.ngramRepetitionStats(docs, "doc_id", "text")
      .orderBy("id").collect()
    val spam = got(0); val varied = got(1); val short = got(2)
    // doc1: 5 bigram occurrences, all "spam spam" → top=5=total → flagged
    assert(spam.getLong(1) == 5L && spam.getLong(2) == 5L && spam.getInt(5) == 0)
    // doc2: 11 bigrams all distinct → top 1/11 < 20%, trigrams distinct → kept
    assert(varied.getInt(5) == 1)
    // doc3: no grams at all → zero counts, kept
    assert(short.getLong(1) == 0L && short.getLong(3) == 0L && short.getInt(5) == 1)
  }

  test("row-local gram kernel equals the relational repetition formulation") {
    import graft.ext.Repetition
    // the whole documents corpus plus adversarial edge strings
    val edge = Seq((9001L, ""), (9002L, "   "), (9003L, "one"),
      (9004L, "a b"), (9005L, "x x x x x x x x"), (9006L, " lead  trail "),
      (9007L, "a\tb\nc d"), (9008L, "🙂 Über 🙂 Über 🙂 Über"))
      .toDF("doc_id", "text")
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").unionByName(edge)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "n2_total", "n2_top", "n3_total", "n3_distinct", "keep_flag")
        .as[(Long, Long, Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    val local = rows(Repetition.ngramRepetitionStatsLocal(docs, "doc_id", "text"))
    val relational = rows(Repetition.ngramRepetitionStats(docs, "doc_id", "text"))
    assert(local == relational)
    // the Column gate agrees with the flag
    val gateKept = docs.filter(Repetition.keepsRepetitionGate($"text"))
      .select("doc_id").as[Long].collect().toSet
    val flagKept = local.filter(_._6 == 1).map(_._1).toSet
    assert(gateKept == flagKept)
  }

  test("stratified sampling hits target rates deterministically, edge rates exact") {
    import graft.ext.Mixing
    val docs = Tables.load(spark, sf, "documents")
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = Mixing.stratifiedSample(docs, "doc_id", "lang",
        ratesBp = Map("en" -> 4000, "zh" -> 0))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // rate 0 drops the stratum entirely; unlisted strata keep everything
    assert(!kept.contains("zh"))
    assert(kept("de") == total("de") && kept("fr") == total("fr"))
    // hash sampling concentrates near 40% (not exact — it's per-id hash)
    val enFrac = kept("en").toDouble / total("en")
    assert(enFrac > 0.25 && enFrac < 0.55, s"en fraction $enFrac far from 0.40")
    // pure function of ids: a second run is identical
    val again = Mixing.stratifiedSample(docs, "doc_id", "lang",
        ratesBp = Map("en" -> 4000, "zh" -> 0))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(again == kept)
  }

  test("keyBp is unbiased across residue-correlated strata (LCG low-bit regression)") {
    import graft.ext.Mixing
    // strata assigned round-robin by id residue — the layout that exposed
    // the single-round LCG's low-bit lattice (kept fractions 8%-80% at a
    // 50% rate before the xor-fold second round)
    val docs = (0L until 1600L).map(i => (i, s"s${i % 8}")).toDF("id", "stratum")
    val kept = Mixing.stratifiedSample(docs, "id", "stratum",
        ratesBp = Map.empty, defaultBp = 5000)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    (0 until 8).foreach { s =>
      val frac = kept.getOrElse(s"s$s", 0L).toDouble / 200.0
      assert(frac > 0.38 && frac < 0.62,
        s"stratum s$s kept fraction $frac outside [0.38, 0.62] at a 50% rate")
    }
  }

  test("temperature rates: sqrt weights, smallest stratum keeps all, kept ∝ √n") {
    import graft.ext.Mixing
    // 6400 "en" docs vs 100 "fr": w = 80 vs 10, so en's rate is
    // 10000*10/80 = 1250 bp and fr keeps everything — kept counts land
    // near 6400/8 = 800 vs 100, i.e. ∝ sqrt(n) (ratio √6400/√100 = 8)
    val docs = (0L until 6400L).map(i => (i, "en")) ++
      (10000L until 10100L).map(i => (i, "fr"))
    val df = docs.toDF("doc_id", "lang")
    val rates = Mixing.temperatureRates(df, "lang").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rates("en") === ((6400L, 80L, 1250L)))
    assert(rates("fr") === ((100L, 10L, 10000L)))
    val kept = Mixing.sampleWithRates(df, "doc_id", "lang",
        Mixing.temperatureRates(df, "lang"))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("fr") === 100L) // rate 10000 keeps every row
    val enFrac = kept("en").toDouble / 6400.0
    assert(enFrac > 0.08 && enFrac < 0.17, s"en fraction $enFrac far from 0.125")
  }

  test("DSIR importance weights shift the kept mix toward the target slice") {
    import graft.ext.{Dsir, Mixing}
    // planted distributions: "tech" docs repeat tech vocabulary, "chat"
    // docs chat vocabulary, "mix" docs blend both — weights trained on
    // the tech slice must rate tech > mix > chat, deterministically
    val docs = ((0L until 40L).map(i => (i, "tech", "kernel compiler tensor shard gpu cluster")) ++
      (100L until 140L).map(i => (i, "chat", "lol omg haha yeah cool nice")) ++
      (200L until 240L).map(i => (i, "mix", "kernel compiler tensor shard lol omg"))).toSeq
      .toDF("doc_id", "kind", "text")
    val rated = Dsir.importanceScores(docs, "doc_id", "text",
        targetPred = $"kind" === "tech", carryCols = Seq("kind"))
      .withColumn("rate_bp", Dsir.rateBp($"score"))
    val byKind = rated.groupBy("kind")
      .agg(sum($"rate_bp").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map { case (k, s, n) => k -> s.toDouble / n }.toMap
    assert(byKind("tech") > byKind("mix") && byKind("mix") > byKind("chat"),
      s"rates not ordered: $byKind")
    assert(byKind("tech") === 10000.0) // pure-target docs saturate the cap
    assert(byKind("chat") === 0.0)     // pure-off-target docs are culled
    // the realized sample shifts composition toward the target slice
    val kept = Mixing.importanceSample(rated, "doc_id", "rate_bp")
      .groupBy("kind").count().as[(String, Long)].collect().toMap
    assert(kept("tech") == 40L && !kept.contains("chat"))
    // scoring is a pure function of the data: a second run is identical
    val again = Dsir.importanceScores(docs, "doc_id", "text",
        targetPred = $"kind" === "tech", carryCols = Seq("kind"))
      .withColumn("rate_bp", Dsir.rateBp($"score"))
      .groupBy("kind").agg(sum($"rate_bp").as("s"))
      .as[(String, Long)].collect().toMap
    assert(again("tech") == 400000L && again("chat") == 0L)
  }

  test("DSIR on the real corpus: target-language docs carry the highest keep rates") {
    import graft.ext.Dsir
    val rated = Dsir.importanceScores(Tables.load(spark, sf, "documents"),
        "doc_id", "text", targetPred = $"lang" === "en", carryCols = Seq("lang"))
      .withColumn("rate_bp", Dsir.rateBp($"score"))
      .groupBy("lang").agg(sum($"rate_bp").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map { case (k, s, n) => k -> s.toDouble / n }.toMap
    // deterministic (no sampling noise): the en slice's average keep
    // rate must beat every other language's
    rated.filterNot(_._1 == "en").foreach { case (lang, avg) =>
      assert(rated("en") > avg, s"en ${rated("en")} not above $lang $avg")
    }
  }

  test("rateBp truncates toward zero on negative scores (never floors)") {
    import graft.ext.Dsir
    // -201/200: truncation -> -1 (rate 4999), floor would give -2
    // (4998); -199/200: truncation -> 0 (rate 5000), floor -1 (4999).
    // Pins the Spark-vs-DuckDB division convention explicitly instead
    // of only through the corpus hash gate.
    val out = Seq(-401L, -201L, -200L, -199L, -1L, 0L, 199L, 201L)
      .toDF("score")
      .select($"score", Dsir.rateBp($"score").as("bp"))
      .as[(Long, Long)].collect().toMap
    assert(out(-401L) == 4998L && out(-201L) == 4999L && out(-200L) == 4999L)
    assert(out(-199L) == 5000L && out(-1L) == 5000L && out(0L) == 5000L)
    assert(out(199L) == 5000L && out(201L) == 5001L)
  }

  test("Gumbel-top-k perturbed key is monotone in score for any fixed hash draw") {
    import graft.ext.Dsir
    // the q154 selection key pri = rate_bp(score)*2^31 DIV (h+1): for
    // each fixed hash value the key must be nondecreasing in score, so
    // inclusion probability rises with importance
    val hs = Seq(0L, 1L, 12345L, 2147483646L)
    val scores = (-1200000L to 1200000L by 100000L).toSeq
    val rows = hs.flatMap(h => scores.map(s => (h, s))).toDF("h", "score")
      .withColumn("rate_bp", Dsir.rateBp($"score"))
      .withColumn("pri", expr("rate_bp * 2147483648L DIV (h + 1)"))
      .select($"h", $"score", $"pri").as[(Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (h, rs) =>
      val sorted = rs.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
        s"pri not monotone in score at h=$h")
    }
    // and strictly increasing somewhere: the weight actually matters
    val atOne = rows.filter(_._1 == 0L).sortBy(_._2).map(_._3)
    assert(atOne.distinct.length > 1, "pri constant in score")
  }

  test("decontamination drops docs sharing an n-gram with the benchmark, keeps the rest") {
    import graft.ext.Dedup
    val bench = Seq((100L, "the secret eval answer phrase nobody should train on"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "clean document about completely different things entirely"),
      (2L, "contains the secret eval answer phrase nobody should see"), // 24-char overlap
      (3L, "short")) // no 24-grams → kept
      .toDF("doc_id", "text")
    val kept = Dedup.decontaminate(docs, "doc_id", "text", bench, n = 24)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("SemDeDup: representatives are kept minima; dropped vectors resolve to kept reps") {
    import graft.ext.SemDeDup
    val out = SemDeDup.dedup(Tables.load(spark, sf, "embeddings"), "vec_id", "embedding",
        nClusters = 16, minCos = 0.4)
      .select("id", "rep_id", "is_kept").as[(Long, Long, Int)].collect()
    assert(out.length == 500)
    val kept = out.filter(_._3 == 1).map(_._1).toSet
    // a representative is its own rep; dropped vectors point at a KEPT
    // rep with a smaller id (min-id convention)
    out.foreach { case (id, rep, isKept) =>
      if (isKept == 1) assert(rep == id)
      else {
        assert(rep < id, s"rep $rep not the min of $id's group")
        assert(kept.contains(rep), s"dropped $id points at dropped rep $rep")
      }
    }
    // dedup must actually drop something on this corpus, but not everything
    assert(kept.size < 500 && kept.size > 250, s"kept ${kept.size}")
  }

  test("curation pipeline composes: gates, decontamination, dedup, mixing, sharding") {
    import graft.ext.CurationPipeline
    val docs = Tables.load(spark, sf, "documents")
    val out = CurationPipeline.curate(
      docs.filter($"doc_id" >= 20), "doc_id", "text", "lang",
      benchmark = docs.filter($"doc_id" < 20).select("text"),
      params = CurationPipeline.Params(mixRatesBp = Map("en" -> 5000)))
      .orderBy("doc_id").collect()
    assert(out.nonEmpty && out.length < 480, s"gates cut nothing or everything: ${out.length}")
    // unique ids, bounded stats, shard ids start at 0 and never decrease
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    assert(out.forall(r => r.getLong(2) >= 5L && r.getLong(2) <= 1000L))
    assert(out.forall(_.getDouble(3) >= 0.3))
    val shards = out.map(_.getLong(5))
    assert(shards.head == 0L && shards.zip(shards.tail).forall { case (a, b) => b >= a })
    // cum_tokens is the inclusive running sum of n_tokens in id order
    val cums = out.map(_.getLong(4))
    val expect = out.map(_.getLong(2)).scanLeft(0L)(_ + _).tail
    assert(cums.toSeq == expect.toSeq)
  }

  test("q187 release classes are k-anonymous on the RELEASE itself, certified and minimal") {
    val k = graft.ext.KAnon.K
    val out = graft.queries.CurationQueries.q187KAnonymize(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"lang", $"source",
        expr(s"CAST(n_chars AS BIGINT) DIV ${graft.ext.KAnon.BucketChars}").as("lb"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(out.length == docs.size) // one published row per document
    // THE k-anonymity property, checked on the release: group the
    // published rows by their exact pattern — every non-suppressed
    // class has >= k members, and class_n certifies the true size
    out.filter(_.getInt(4) < 3)
      .groupBy(r => (r.getString(1), r.getString(2), r.getString(3), r.getInt(4)))
      .foreach { case (pat, rows) =>
        assert(rows.length >= k, s"release class $pat has ${rows.length} < k members")
        rows.foreach(r => assert(r.getLong(5) == rows.length.toLong,
          s"doc ${r.getLong(0)} certificate ${r.getLong(5)} != class size ${rows.length}"))
      }
    // residual-ladder replay: n0 / r1 / r2 recomputed from raw docs
    val n0 = docs.values.groupBy(identity).map { case (c, v) => c -> v.size.toLong }
    val r1 = n0.filter(_._2 < k).groupBy { case ((l, s2, _), _) => (l, s2) }
      .map { case (p, m) => p -> m.values.sum }
    val r2 = r1.filter(_._2 < k).groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    out.foreach { r =>
      val (id, lvl) = (r.getLong(0), r.getInt(4))
      val (lang, src, lb) = docs(id)
      val (cn0, cr1, cr2) = (n0((lang, src, lb)),
        r1.getOrElse((lang, src), 0L), r2.getOrElse(lang, 0L))
      val expect = if (cn0 >= k) 0 else if (cr1 >= k) 1 else if (cr2 >= k) 2 else 3
      assert(lvl == expect, s"doc $id level $lvl, residual ladder says $expect")
      if (lvl == 3) // suppressed: all-star pattern, zero certificate
        assert(r.getLong(5) == 0L && r.getString(1) == "*" &&
          r.getString(2) == "*" && r.getString(3) == "*")
    }
  }

  test("q189 audits exactly the bucketed members of q187's classes, with exact majority shares") {
    val audit = graft.queries.CurationQueries.q189LDiversity(spark, sf).collect()
    assert(audit.nonEmpty)
    // class keys unique; counts consistent: l_distinct ∈ [1,3],
    // top bucket within [ceil(n/l), n], ppm exact integer arithmetic
    val keys = audit.map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(keys.distinct.length == keys.length)
    audit.foreach { r =>
      val (n, l, top, ppm, div) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getInt(8))
      assert(l >= 1L && l <= 3L) // head/middle/tail
      assert(top >= (n + l - 1) / l && top <= n)
      assert(ppm == top * 1000000L / n)
      assert(div == (if (l >= 2) 1 else 0))
    }
    // audited mass = #docs that are both published (always) and bucketed
    val bucketed = graft.ext.SurprisalScore.ccnetBuckets(
      Tables.load(spark, sf, "documents"), "doc_id", "text", "lang").count()
    assert(audit.map(_.getLong(4)).sum == bucketed)
    // the corpus must exercise BOTH verdicts or the audit is vacuous
    assert(audit.exists(_.getInt(8) == 0) && audit.exists(_.getInt(8) == 1))
  }

  test("q190 EMD is the exact quantized-ECDF distance, zero iff the class mirrors the corpus") {
    val out = graft.queries.CurationQueries.q190TCloseness(spark, sf).collect()
    assert(out.nonEmpty)
    val gn = out.map(_.getLong(4)).sum
    val gh = out.map(_.getLong(5)).sum
    val gm = out.map(_.getLong(6)).sum
    out.foreach { r =>
      val (n, h, m, t) = (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(h + m + t == n)
      // replay the quantized-ECDF EMD exactly
      val expect = (math.abs(h * 1000000L / n - gh * 1000000L / gn) +
        math.abs((h + m) * 1000000L / n - (gh + gm) * 1000000L / gn)) / 2
      assert(r.getLong(8) == expect, s"class ${r.getString(0)}/${r.getString(1)} emd")
      assert(r.getInt(9) == (if (expect <= 200000L) 1 else 0))
    }
    // the audit must discriminate: both verdicts present on this corpus
    assert(out.exists(_.getInt(9) == 0) && out.exists(_.getInt(9) == 1))
    // same classes as the l-diversity audit — the two inspect ONE release
    val lKeys = graft.queries.CurationQueries.q189LDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(out.map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toSet == lKeys)
  }

  test("q191 each epoch is a distinct deterministic permutation with dense per-shard positions") {
    val out = graft.queries.CurationQueries.q191EpochShuffle(spark, sf).collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(out.length == 3 * nDocs)
    (0 to 2).foreach { e =>
      val ep = out.filter(_.getInt(0) == e)
      // a permutation: every doc exactly once per epoch
      assert(ep.map(_.getLong(3)).distinct.length.toLong == nDocs)
      // shard = high bits of the key; positions dense 1..n_shard in key order
      ep.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
        val sorted = rows.sortBy(r => (r.getLong(4), r.getLong(3)))
        assert(sorted.map(_.getLong(2)).toSeq == (1L to rows.length).toSeq)
        rows.foreach(r => assert(r.getLong(4) * graft.ext.Mixing.ShuffleShards
          / graft.ext.Mixing.KeyRing == shard))
      }
    }
    // epochs genuinely reshuffle: almost no doc keeps its (shard, pos) slot
    val slot0 = out.filter(_.getInt(0) == 0)
      .map(r => r.getLong(3) -> ((r.getLong(1), r.getLong(2)))).toMap
    val stuck = out.filter(_.getInt(0) == 1)
      .count(r => slot0(r.getLong(3)) == ((r.getLong(1), r.getLong(2))))
    assert(stuck <= nDocs / 20, s"$stuck docs kept their epoch-0 slot in epoch 1")
    // replayable: a second evaluation is bit-identical
    val again = graft.queries.CurationQueries.q191EpochShuffle(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q193 manifest certifies the q191 schedule and catches a lost or swapped document") {
    val sched = graft.queries.CurationQueries.q191EpochShuffle(spark, sf).collect()
    val manifest = graft.queries.CurationQueries.q193ShardManifest(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val folded = sched.groupBy(r => (r.getInt(0), r.getLong(1))).map { case (k, rows) =>
      k -> ((rows.length.toLong,
        rows.map(_.getLong(4)).min, rows.map(_.getLong(4)).max,
        rows.map(_.getLong(3)).reduce(_ ^ _), rows.map(_.getLong(4)).reduce(_ ^ _)))
    }
    assert(folded == manifest, "manifest does not certify the schedule")
    // a shard file that LOST a doc fails count + checksum; one that
    // SWAPPED a doc for another fails checksum even at equal count
    val (k0, (n, _, _, xd, _)) = folded.head
    val lost = sched.filter(r => (r.getInt(0), r.getLong(1)) == k0).drop(1)
    assert(lost.length.toLong != n &&
      lost.map(_.getLong(3)).reduce(_ ^ _) != xd)
    val swapped = sched.filter(r => (r.getInt(0), r.getLong(1)) == k0)
      .map(_.getLong(3)).updated(0, -1L)
    assert(swapped.length.toLong == n && swapped.reduce(_ ^ _) != xd)
  }

  test("q195 resumes exactly the schedule suffix and refuses corrupted shards") {
    val out = graft.queries.CurationQueries.q195EpochResume(spark, sf).collect()
    assert(out.nonEmpty, "vacuous: resume emitted nothing on a healthy shard")
    // resumed suffix ≡ the original q191 ordering's suffix, bit for bit
    val sched = graft.queries.CurationQueries.q191EpochShuffle(spark, sf)
      .localCheckpoint(true)
    val shardRows = sched.filter($"epoch" === 1 && $"shard" === 3L)
      .select($"pos", $"doc_id", $"skey").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    val ckpt = shardRows.length.toLong / 2
    val expect = shardRows.filter(_._1 > ckpt).toSeq
    assert(out.map(r => (r.getLong(3), r.getLong(4), r.getLong(5))).toSeq == expect)
    assert(out.forall(r =>
      r.getInt(0) == 1 && r.getLong(1) == 3L && r.getLong(2) == ckpt))
    // a manifest whose checksum disagrees fails certification: the
    // resume emits ZERO rows rather than serving a suspect shard
    val man = graft.queries.CurationQueries.q193ShardManifest(spark, sf)
      .localCheckpoint(true)
    val badMan = man.withColumn("xor_doc",
      when($"epoch" === 1 && $"shard" === 3L, $"xor_doc" + 1L)
        .otherwise($"xor_doc"))
    assert(graft.ext.EpochResume.resume(sched, badMan, 1, 3L).isEmpty,
      "resume served a shard whose manifest checksum disagreed")
    // ... but an untouched shard of the same tampered manifest still serves
    assert(!graft.ext.EpochResume.resume(sched, badMan, 1, 2L).isEmpty)
    // a schedule whose stored positions are NOT the dense key order
    // (two swapped positions — invisible to count/range/XOR) is refused
    val swapped = sched.withColumn("pos",
      when($"epoch" === 1 && $"shard" === 3L && $"pos" === 1L, 2L)
        .when($"epoch" === 1 && $"shard" === 3L && $"pos" === 2L, 1L)
        .otherwise($"pos"))
    assert(graft.ext.EpochResume.resume(swapped, man, 1, 3L).isEmpty,
      "resume served a shard whose positions were re-ordered")
  }

  test("q192 curriculum stages nest (head ⊂ +middle ⊂ +tail) and reuse the q191 shuffle order") {
    val out = graft.queries.CurationQueries.q192Curriculum(spark, sf).collect()
    def docsOf(e: Int) = out.filter(_.getInt(0) == e).map(_.getLong(3)).toSet
    val (e0, e1, e2) = (docsOf(0), docsOf(1), docsOf(2))
    // baby steps: each epoch's admitted set strictly contains the previous
    assert(e0.subsetOf(e1) && e1.subsetOf(e2))
    assert(e0.size < e1.size && e1.size < e2.size)
    // stage gating exact: epoch 0 all head; epoch 1 head+middle; tail only in epoch 2
    assert(out.filter(_.getInt(0) == 0).forall(_.getString(4) == "head"))
    assert(out.filter(_.getInt(0) == 1).forall(r => r.getString(4) != "tail"))
    assert(out.exists(r => r.getInt(0) == 2 && r.getString(4) == "tail"))
    // admitted set = exactly the bucketed docs at full width
    val buckets = graft.ext.SurprisalScore.ccnetBuckets(
        Tables.load(spark, sf, "documents"), "doc_id", "text", "lang")
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    assert(e2 == buckets.keySet)
    assert(e0 == buckets.filter(_._2 == "head").keySet)
    // epoch 2 (full corpus width) orders docs exactly as q191's epoch-2 shuffle
    val q191e2 = graft.queries.CurationQueries.q191EpochShuffle(spark, sf)
      .filter($"epoch" === 2).select($"shard", $"pos", $"doc_id")
      .as[(Long, Long, Long)].collect()
      .filter(r => buckets.contains(r._3)) // q191 also schedules unbucketed docs
      .sortBy(r => (r._1, r._2)).map(r => (r._1, r._3))
    val q192e2 = out.filter(_.getInt(0) == 2)
      .sortBy(r => (r.getLong(1), r.getLong(2))).map(r => (r.getLong(1), r.getLong(3)))
    assert(q192e2.toSeq == q191e2.toSeq, "curriculum epoch-2 order forked from the shuffle")
  }

  test("IVF search recall@10 vs brute force is high at nProbe=4/16") {
    val emb = Tables.load(spark, sf, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10))
    val ivf = pairs(Similarity.ivfSearch(emb, queries, "vec_id", "embedding",
      k = 10, nClusters = 16, nProbe = 4))
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@10 = $recall (expected ≥ 0.8; deterministic data gives 0.92)")
    // probing ALL clusters must reproduce brute force exactly
    val full = pairs(Similarity.ivfSearch(emb, queries, "vec_id", "embedding",
      k = 10, nClusters = 16, nProbe = 16))
    assert(full == exact, "nProbe = nClusters must equal brute force")
  }
}
