package graft

import org.apache.spark.sql.functions._
import graft.operators.CoreOps

/** Pins the reference's exact string/null semantics (SURVEY.md §7.4):
  * present-null → "None" (Python str(None), main.py:376), absent column
  * → "unknown" (main.py:363), unknown placeholders survive verbatim. */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  test("expandTemplate substitutes values and stringifies nulls as None") {
    val df = Seq(("AI", Some("Teachers")), ("ML", None))
      .toDF("topic", "audience")
    val out = df.select(CoreOps.expandTemplate(
      "Write about {topic} for {audience}", df.columns.toSeq).as("p"))
      .as[String].collect()
    assert(out(0) == "Write about AI for Teachers")
    assert(out(1) == "Write about ML for None")
  }

  test("expandTemplate leaves unknown placeholders verbatim, no escaping") {
    val df = Seq(("x")).toDF("a")
    val out = df.select(CoreOps.expandTemplate(
      "{a} {missing} {a}{a}", df.columns.toSeq).as("p")).as[String].head()
    assert(out == "x {missing} xx")
  }

  test("groupKey: present null -> None; absent column -> unknown") {
    val df = Seq((1, Some("g1")), (2, None)).toDF("id", "k")
    val keys = df.select(CoreOps.groupKey(df, Some("k")).as("g")).as[String].collect().toSet
    assert(keys == Set("g1", "None"))
    val missing = df.select(CoreOps.groupKey(df, Some("zzz")).as("g")).as[String].head()
    assert(missing == "unknown")
  }

  test("sanitizeName strips specials, trims, empties become unknown") {
    val df = Seq("a/b#c", "  ok name_1-x  ", "###", "").toDF("n")
    val out = df.select(CoreOps.sanitizeName($"n").as("s")).as[String].collect()
    assert(out.toSeq == Seq("abc", "ok name_1-x", "unknown", "unknown"))
  }

  test("dropBlankRows drops only all-blank rows (P1, main.py:139-147)") {
    val df = Seq(("", " "), ("a", ""), (" ", "b"), ("", "")).toDF("x", "y")
    assert(CoreOps.dropBlankRows(df).count() == 2)
  }

  test("withFileOrderIndex preserves physical order; restoreOrder sorts back") {
    val df = Seq("r0", "r1", "r2", "r3", "r4").toDF("v").repartition(3)
    val indexed = CoreOps.withFileOrderIndex(df)
    assert(indexed.count() == 5)
    assert(indexed.select("row_index").as[Long].collect().sorted.toSeq == Seq(0L, 1, 2, 3, 4))
    val restored = CoreOps.restoreOrder(indexed).select("row_index").as[Long].collect()
    assert(restored.toSeq == restored.toSeq.sorted)
  }

  test("assembleResult lays out group, main_content, sorted originals, prompt, response, row_index") {
    val df = Seq(("g", "mc", "b", "a", "p", "resp", 1L))
      .toDF("group", "mc", "zcol", "acol", "prompt", "response", "row_index")
    val out = CoreOps.assembleResult(df, "mc", Seq("zcol", "acol", "mc"),
      includePrompt = true, includeTimestamp = false)
    assert(out.columns.toSeq ==
      Seq("group", "main_content", "acol", "mc", "zcol", "prompt", "response", "row_index"))
  }

  test("withRunningSumByOrder matches the window prefix sum, nulls count as 0") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((5L, Some(10L)), (1L, Some(3L)), (3L, None),
      (2L, Some(7L)), (4L, Some(1L))).toDF("k", "v")
    val got = CoreOps.withRunningSumByOrder(df, "v", "cum", col("k"))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum",
        sum(coalesce(col("v"), lit(0L))).over(Window.orderBy("k")))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("token shards: docs land in the shard where they start, ids contiguous") {
    val docs = Seq((1L, 800L), (2L, 800L), (3L, 800L), (4L, 100L), (5L, 2500L), (6L, 50L))
      .toDF("doc_id", "n_tokens")
    val got = graft.ext.Packing.tokenShards(docs, "doc_id", "n_tokens", capacity = 1000L)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    // cum: 800,1600,2400,2500,5000,5050 → starts: 0,800,1600,2400,2500,5000
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 5L))
  }
}
