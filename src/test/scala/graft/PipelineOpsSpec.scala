package graft

import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-6 pipeline queries whose main
  * verification is the DuckDB oracle — these pin the semantics locally
  * so a refactor fails in `sbt test`, not at the gate. */
class PipelineOpsSpec extends SparkSpec {

  test("collocation lift: hand-computed counts on a four-doc corpus") {
    import spark.implicits._
    // "a b" appears twice (docs 1, 2); unigrams: a=3, b=3, c=2; N=8
    val docs = Seq("a b c", "a b", "c a", "b").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    docs.createOrReplaceTempView("pipeline_docs")
    val toks = docs.select(graft.functions.TextFunctions.tokens(lower($"text")).as("ts"))
      .filter(size($"ts") > 0)
    val uni = toks.select(explode($"ts").as("t")).groupBy($"t")
      .agg(count(lit(1)).as("c")).as[(String, Long)].collect().toMap
    assert(uni === Map("a" -> 3L, "b" -> 3L, "c" -> 2L))
    val bi = toks.filter(size($"ts") >= 2)
      .select(explode(transform(sequence(lit(0), size($"ts") - 2),
        i => struct(element_at($"ts", i + 1).as("t1"),
          element_at($"ts", i + 2).as("t2")))).as("g"))
      .groupBy($"g.t1", $"g.t2").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // bigrams: (a,b)x2, (b,c)x1, (c,a)x1
    assert(bi === Map(("a", "b") -> 2L, ("b", "c") -> 1L, ("c", "a") -> 1L))
    // lift for (a,b): n_ab*N = 2*8 = 16 vs n_a*n_b = 9 → lift > 1
    assert(2L * uni.values.sum > uni("a") * uni("b"))
  }

  test("deletion-neighborhood blocking finds every edit-distance-1 pair") {
    import spark.implicits._
    // substitution (cat~bat), deletion (cart~art, cart~cat? no — dist 2),
    // insertion (cat~cart? dist 1? c-a-t -> c-a-r-t: one insertion, yes)
    val vocab = Seq("cat", "bat", "cart", "art", "dog", "dot").toDF("t")
      .localCheckpoint(false)
    val keyed = vocab.select($"t", explode(concat(array($"t"),
        transform(sequence(lit(1), length($"t")),
          i => concat($"t".substr(lit(1), i - 1),
            $"t".substr(i + 1, length($"t")))))).as("k"))
    val blocked = keyed.as("a").join(keyed.as("b"), "k")
      .filter($"a.t" < $"b.t")
      .select($"a.t".as("t1"), $"b.t".as("t2")).distinct()
      .filter(levenshtein($"t1", $"t2") <= 1)
      .as[(String, String)].collect().toSet
    // brute force over all pairs — the completeness reference
    val brute = (for {
      a <- Seq("cat", "bat", "cart", "art", "dog", "dot"); b <- Seq("cat", "bat", "cart", "art", "dog", "dot")
      if a < b
    } yield (a, b)).filter { case (x, y) =>
      // tiny levenshtein for the fixture
      def lev(s: String, t: String): Int = {
        val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to s.length; j <- 1 to t.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
        d(s.length)(t.length)
      }
      lev(x, y) <= 1
    }.toSet
    assert(blocked === brute)
    assert(blocked.contains(("bat", "cat"))) // substitution
    assert(blocked.contains(("art", "cart"))) // deletion/insertion
    assert(blocked.contains(("cart", "cat"))) // insertion mid-string
    assert(blocked.contains(("dog", "dot"))) // substitution at the end
  }

  test("gap fill: silent days get zero counts and the carried value persists") {
    import spark.implicits._
    // one user: activity on days 10 and 13 → grid 10..13 with gaps 11, 12
    val daily = Seq((7L, 10L, 2L, 5.0), (7L, 13L, 1L, 9.0))
      .toDF("user_id", "day", "n", "dv").localCheckpoint(false)
    val grid = daily.groupBy($"user_id")
      .agg(min($"day").as("mn"), max($"day").as("mx"))
      .select($"user_id", explode(sequence($"mn", $"mx")).as("day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val filled = grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("grp", count($"dv").over(w))
      .withColumn("n0", coalesce($"n", lit(0L)))
      .withColumn("cum", sum($"n0").over(w))
      .withColumn("carried", max($"dv").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"user_id", $"grp")))
      .select($"day", $"n0", $"cum", $"carried")
      .orderBy($"day")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(filled === Seq(
      (10L, 2L, 2L, 5.0), // observed
      (11L, 0L, 2L, 5.0), // gap: zero count, carried 5.0
      (12L, 0L, 2L, 5.0), // gap persists
      (13L, 1L, 3L, 9.0))) // new observation replaces the carry
  }
}
