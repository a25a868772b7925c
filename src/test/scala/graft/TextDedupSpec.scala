package graft

import graft.ext.Dedup
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("token/stopword/punct stats handle edge cases") {
    val df = Seq("the cat sat.", "", "   ", "ONE").toDF("t")
    val out = df.select(tokenCount($"t").as("n"), stopwordCount($"t").as("s"),
      punctCount($"t").as("p")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 0L, 0L, 1L))
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 1L)
  }

  test("langId picks marker-dominant language with deterministic tie-break") {
    val df = Seq(
      "the cat and the dog of the house is big",
      "el perro de la casa y el gato que ladra",
      "der hund und die katze das ist gut",
      "le chat et les chiens des villes une fois",
      "xyzzy plugh").toDF("t")
    val langs = df.select(langId($"t")).as[String].collect().toSeq
    assert(langs == Seq("en", "es", "de", "fr", "und"))
  }

  test("shingles: short text yields empty set; jaccard of identical sets is 1") {
    val df = Seq(("abcdefghij", "abcdefghij"), ("short", "short")).toDF("a", "b")
    val out = df.select(size(shingles($"a", 8)).as("n"),
      jaccard(shingles($"a", 8), shingles($"b", 8)).as("j")).collect()
    assert(out(0).getInt(0) == 3 && out(0).getDouble(1) == 1.0)
    assert(out(1).getInt(0) == 0 && out(1).getDouble(1) == 0.0)
  }

  test("exactDedup keeps one min-id row per normalized content") {
    val df = Seq((1L, "Hello World"), (2L, "  hello world  "), (3L, "other"))
      .toDF("id", "text")
    val kept = Dedup.exactDedup(df, "id", "text").select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
    val groups = Dedup.exactDupGroups(df, "id", "text").orderBy("keep_id").collect()
    assert(groups.map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"))).toSeq ==
      Seq((1L, 2L), (3L, 1L)))
  }

  test("redactPii scrubs emails, IPs, phone runs; leaves clean text alone") {
    val df = Seq(
      "reach me at jane.doe+x@sub.example.org today",
      "server 192.168.001.12 rebooted",
      "call +44 (0) 7911 123456 now",
      "no pii here at all").toDF("t")
    val out = df.select(redactPii($"t").as("r")).as[String].collect()
    assert(out(0) == "reach me at <EMAIL> today")
    assert(out(1) == "server <IP> rebooted")
    assert(out(2) == "call <PHONE> now")
    assert(out(3) == "no pii here at all")
  }

  test("dedupAgainstCorpus drops known content and self-dups, keeps fresh") {
    val known = Seq("existing doc one", "existing doc two").toDF("text")
      .select(contentHash($"text").as("content_hash"))
    val batch = Seq(
      (1L, "Existing Doc One"),      // known (normalized match)
      (2L, "brand new document"),
      (3L, "brand new document"),    // self-dup of 2
      (4L, "another fresh one"))
      .toDF("doc_id", "text")
    val kept = graft.ext.Dedup.dedupAgainstCorpus(batch, "doc_id", "text", known)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 4L))
  }

  test("ngramJaccardPairs finds planted near-dups and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, base),
      (2L, base + " tail"),                       // near-dup of 1
      (3L, "completely different content here"),
      (4L, "unrelated words nothing shared at all zz"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        n = 8, threshold = 0.5, maxShingleDf = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("containmentPairs catches a quoted subset that Jaccard misses, directed") {
    val quote = "the forty two secret answer phrase lives right here"
    val long = "a much longer surrounding document with plenty of its own words " +
      "before the quotation begins " + quote + " and plenty more trailing " +
      "context after it so the union is large and jaccard collapses to nothing"
    val df = Seq(
      (1L, quote),                                   // src: fully contained in 2
      (2L, long),
      (3L, "completely different content with zero shared spans at all"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text",
        n = 8, thresholdBp = 9000, minShingles = 10, maxShingleDf = 10)
      .collect().map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
        r.getAs[Long]("n_inter"), r.getAs[Long]("n_src"), r.getAs[Long]("cont_ppm")))
    // exactly ONE directed row: quote ⊆ long at containment 1.0; the
    // reverse direction (long ⊆ quote) and doc 3 never appear
    assert(out.map(t => (t._1, t._2)).toSet == Set((1L, 2L)), out.mkString(","))
    val r = out.head
    assert(r._3 == r._4 && r._5 == 1000000L, r) // every src shingle found
    // and the symmetric Jaccard verdict at the same corpus misses it
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        n = 8, threshold = 0.5, maxShingleDf = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("containmentPairs emits both directions for near-identical sets") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text",
        n = 8, thresholdBp = 9000, minShingles = 10, maxShingleDf = 10)
      .select("src_id", "dst_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (2L, 1L)))
  }

  test("blockDedup keeps first occurrences, drops repeats, reassembles exactly") {
    val A = (0 until 20).map(i => s"a$i")   // one full block
    val B = (0 until 20).map(i => s"b$i")
    val C = (0 until 7).map(i => s"c$i")    // short tail block
    val df = Seq(
      (0L, (A ++ B).mkString(" ")),  // first owner of A and B
      (1L, (A ++ C).mkString(" ")),  // A is a repeat; tail C unique
      (2L, A.mkString(" ")),         // exactly A -> fully removed
      (3L, (C ++ C).mkString(" "))   // 14 words: ONE 14-word block, not two
    ).toDF("doc_id", "text")
    val out = graft.ext.Dedup.blockDedup(df, "doc_id", "text", blockWords = 20)
      .select($"doc_id", $"n_blocks", $"n_kept", $"clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, 2L, 2L, (A ++ B).mkString(" ")),   // untouched doc reassembles verbatim
      (1L, 2L, 1L, C.mkString(" ")),
      (2L, 1L, 0L, ""),
      (3L, 1L, 1L, (C ++ C).mkString(" "))))
  }

  test("blockDedup drops within-doc repeats after the first occurrence") {
    val A = (0 until 20).map(i => s"x$i")
    val df = Seq((7L, (A ++ A ++ A).mkString(" "))).toDF("doc_id", "text")
    val out = graft.ext.Dedup.blockDedup(df, "doc_id", "text", blockWords = 20)
      .select($"n_blocks", $"n_kept", $"clean_text")
      .as[(Long, Long, String)].head()
    assert(out == ((3L, 1L, A.mkString(" "))))
  }

  test("blockDedupAgainstCorpus drops known blocks and within-doc repeats only") {
    val A = (0 until 20).map(i => s"a$i")
    val B = (0 until 20).map(i => s"b$i")
    val corpus = Seq((100L, A.mkString(" "))).toDF("doc_id", "text")
    val known = graft.ext.Dedup.blockHashes(corpus, "text")
    // fresh doc: known block A + fresh B + B repeated (within-doc dup)
    val fresh = Seq((1L, (A ++ B ++ B).mkString(" "))).toDF("doc_id", "text")
    val out = graft.ext.Dedup.blockDedupAgainstCorpus(fresh, "doc_id", "text", known)
      .select($"n_blocks", $"n_kept", $"n_known", $"clean_text")
      .as[(Long, Long, Long, String)].head()
    assert(out == ((3L, 1L, 1L, B.mkString(" "))))
    // no cross-fresh-doc coupling: two fresh docs sharing a block BOTH keep it
    val fresh2 = Seq((1L, B.mkString(" ")), (2L, B.mkString(" "))).toDF("doc_id", "text")
    val out2 = graft.ext.Dedup.blockDedupAgainstCorpus(fresh2, "doc_id", "text", known)
      .select($"doc_id", $"n_kept").as[(Long, Long)].collect().toSet
    assert(out2 == Set((1L, 1L), (2L, 1L)))
  }

  test("NB classifier: integer weights, globals, and scoring edge cases") {
    val train = Seq((1L, "good good fine"), (2L, "good nice"),
      (3L, "bad bad awful"), (4L, "bad fine")).toDF("doc_id", "text")
    val labels = Seq((1L, 1), (2L, 1), (3L, 0), (4L, 0)).toDF("doc_id", "keep")
    val (w, g) = graft.ext.NbClassifier.trainWeights(
      train, "doc_id", "text", labels)
    // w(t) = bitlen(c1+1) − bitlen(c0+1): good (3,0)→3−1, nice (1,0)→2−1,
    // fine (1,1)→0, bad (0,3)→1−3, awful (0,1)→1−2
    val wm = w.as[(String, Long)].collect().toMap
    assert(wm == Map("good" -> 2L, "nice" -> 1L, "fine" -> 0L,
      "bad" -> -2L, "awful" -> -1L), s"weights: $wm")
    // balanced classes: n1=n0=5, v=5, nd1=nd0=2 → D = prior = 0
    val gRow = g.collect().head
    assert(gRow.getLong(0) == 0L && gRow.getLong(1) == 0L, s"globals: $gRow")
    val score = graft.ext.NbClassifier.score(
      Seq((10L, "good fine"), (11L, "bad bad"), (12L, ""), (13L, "zzz qqq"))
        .toDF("doc_id", "text"), "doc_id", "text", w, g)
      .select($"id", $"n_tokens", $"score_bits", $"nb_keep")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(score(0) == ((10L, 2L, 2L, 1)), s"keep-ish doc: ${score(0)}")
    assert(score(1) == ((11L, 2L, -4L, 0)), s"reject-ish doc: ${score(1)}")
    assert(score(2) == ((12L, 0L, 0L, 0)), s"empty doc scores prior: ${score(2)}")
    assert(score(3) == ((13L, 2L, 0L, 0)), s"unseen tokens add D only: ${score(3)}")
  }

  test("q174 persisted-model scoring equals the in-process q169 (round trip lossless)") {
    val inProc = graft.queries.TextQueries.q169NbQuality(spark, sf)
      .as[(Long, Long, Long, Int, Int, Int)].collect().toSeq
    val loaded = graft.queries.TextQueries.q174PersistedNbScore(spark, sf)
      .as[(Long, Long, Long, Int, Int, Int)].collect().toSeq
    assert(loaded.nonEmpty)
    assert(loaded == inProc, "scoring against the parquet model diverged")
  }

  test("gopherGate rules fire independently and compose into keep") {
    val pass = (Seq("the", "a") ++ (1 to 58).map(i => s"word$i")).mkString(" ")
    val short = "the a tiny doc"                            // fails word count
    val noStop = (1 to 60).map(i => s"word$i").mkString(" ") // fails stop rule
    val thin = (Seq("the", "a") ++ (1 to 58).map(_ => "zz")).mkString(" ") // mwl 2.1 < 3
    val symbolic = (Seq("the", "a") ++ (1 to 29).map(i => s"w$i") ++
      (1 to 29).map(_ => "##")).mkString(" ")               // 29/60 symbol words
    val df = Seq((0L, pass), (1L, short), (2L, noStop), (3L, thin), (4L, symbolic))
      .toDF("doc_id", "text")
    val out = graft.ext.QualityGate.gopherGate(df, "doc_id", "text")
      .select($"doc_id", $"r_words", $"r_mwl", $"r_sym", $"r_alpha", $"r_stop", $"keep")
      .as[(Long, Int, Int, Int, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((0L, 1, 1, 1, 1, 1, 1)), s"pass doc: ${out(0)}")
    assert(out(1)._2 == 0 && out(1)._7 == 0, s"short doc: ${out(1)}")
    assert(out(2)._6 == 0 && out(2)._7 == 0, s"no-stop doc: ${out(2)}")
    assert(out(3)._3 == 0 && out(3)._7 == 0, s"thin doc: ${out(3)}")
    assert(out(4)._4 == 0 && out(4)._5 == 0 && out(4)._7 == 0,
      s"symbolic doc fails symbol AND alpha: ${out(4)}")
  }

  test("DupNgrams.coverage: exact interval-union over duplicated grams") {
    val docs = Seq(
      (1L, "a b c d e"),       // "a b c"@1 "b c d"@2 dup with doc 2
      (2L, "x y a b c d q"),   // dup starts at 3,4
      (3L, "z z z z"),         // "z z z" twice WITHIN one doc -> dup
      (4L, "p q")              // shorter than n -> no grams
    ).toDF("doc_id", "text")
    val out = graft.ext.DupNgrams.coverage(docs, "doc_id", "text", n = 3)
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, 2L, 4L, 800000L),   // [1..3]u[2..4] = 4 of 5 tokens
      (2L, 7L, 2L, 4L, 571428L),   // [3..5]u[4..6] = 4 of 7
      (3L, 4L, 2L, 4L, 1000000L),  // whole doc covered
      (4L, 2L, 0L, 0L, 0L)))
  }

  test("DupNgrams: case/whitespace-normalized gram identity") {
    val docs = Seq((1L, "A  b C"), (2L, " a B   c ")).toDF("doc_id", "text")
    val out = graft.ext.DupNgrams.coverage(docs, "doc_id", "text", n = 3)
      .orderBy("id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 1L, 3L, 1000000L), (2L, 3L, 1L, 3L, 1000000L)))
  }

  test("DupNgrams.prune drops exactly the covered tokens, keeps order") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "x y a b c d q"), (3L, "z z z z"), (4L, "p q")
    ).toDF("doc_id", "text")
    val out = graft.ext.DupNgrams.prune(docs, "doc_id", "text", n = 3)
      .orderBy("id").as[(Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, "e"), (2L, 3L, "x y q"), (3L, 0L, ""), (4L, 2L, "p q")))
  }

  test("DupNgrams.coverageAgainstDict probes a frozen dictionary only") {
    val corpus = Seq((1L, "a b c d e"), (2L, "x y a b c d q")).toDF("doc_id", "text")
    val dict = graft.ext.DupNgrams.dupGramDict(
      graft.ext.DupNgrams.gramPositions(corpus, "doc_id", "text", n = 3))
    // fresh batch: hits on "a b c" and "b c d" only; "q a b" is novel
    val fresh = Seq((10L, "q a b c d"), (11L, "u v w")).toDF("doc_id", "text")
    val out = graft.ext.DupNgrams
      .coverageAgainstDict(fresh, "doc_id", "text", dict, n = 3)
      .orderBy("id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 5L, 2L, 4L, 800000L), (11L, 3L, 0L, 0L, 0L)))
  }

  test("DupNgrams.mergeCounts adds generations; absent grams count zero") {
    val g = (df: org.apache.spark.sql.DataFrame) =>
      graft.ext.DupNgrams.gramCounts(
        graft.ext.DupNgrams.gramPositions(df, "doc_id", "text", n = 3))
    val standing = g(Seq((1L, "a b c d")).toDF("doc_id", "text"))
    val batch = g(Seq((2L, "a b c x")).toDF("doc_id", "text"))
    val merged = graft.ext.DupNgrams.mergeCounts(standing, batch)
      .orderBy("gram").as[(String, Long)].collect().toSeq
    assert(merged == Seq(("a b c", 2L), ("b c d", 1L), ("b c x", 1L)))
  }

  test("DSIR importance scoring rejects an empty target slice loudly") {
    val df = Seq((1L, "some words here", "en"), (2L, "more words", "de"))
      .toDF("doc_id", "text", "lang")
    val e = intercept[IllegalArgumentException] {
      graft.ext.Dsir.importanceScores(df, "doc_id", "text",
        targetPred = $"lang" === "zz", carryCols = Seq("lang"))
    }
    assert(e.getMessage.contains("target slice"))
  }
}
