package graft

import graft.operators.{AsOfJoin, RangeJoin, SkewedAgg}
import org.apache.spark.sql.functions._

/** Edge-case specs for the composed join/agg operators (their main
  * verification is the DuckDB oracle gate — q27/q35/q28/q41; these pin
  * boundary semantics the oracles happen not to exercise). */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: no earlier right -> null; right AT the left time matches; ties pick max order") {
    val left = Seq((1L, 100L, "L1"), (1L, 50L, "L0"), (2L, 10L, "L2"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 100L, 7L, "exact"),    // right exactly AT left t=100
      (1L, 100L, 9L, "exact_hi"), // tie at t=100 -> larger order wins
      (1L, 60L, 1L, "older"))     // between the two lefts
      .toDF("k", "t", "ord", "payload")
    val out = AsOfJoin.asofLeft(left, right, "k", "t", Seq("payload"), "ord")
      .select($"tag", $"asof_payload").as[(String, String)].collect().toMap
    assert(out("L0") == null)          // t=50: nothing at-or-before
    assert(out("L1") == "exact_hi")    // at-time match, tie -> ord 9
    assert(out("L2") == null)          // key 2 has no right rows
  }

  test("range join: [start, end) boundary inclusivity and bucket-spanning intervals") {
    val points = Seq((1L, 0L), (1L, 9L), (1L, 10L), (1L, 25L), (1L, 30L))
      .toDF("k", "p")
    // interval [10, 30) spans 3 width-10 buckets; [0, 10) exactly one
    val ivs = Seq((1L, 0L, 10L, "a"), (1L, 10L, 30L, "b"), (1L, 5L, 5L, "empty"))
      .toDF("k", "s", "e", "iv")
    val got = RangeJoin.pointInInterval(points, "p", ivs, "s", "e", Seq("k"), bucketWidth = 10L)
      .select($"p", $"iv").as[(Long, String)].collect().toSet
    assert(got == Set((0L, "a"), (9L, "a"), (10L, "b"), (25L, "b")))
    // 30 excluded (end-exclusive), empty interval matched nothing,
    // and no duplicate matches despite the 3-bucket explosion
    val cnt = RangeJoin.pointInInterval(points, "p", ivs, "s", "e", Seq("k"), 10L).count()
    assert(cnt == 4L)
  }

  test("salted join and salted aggregation equal their unsalted counterparts") {
    val big = (1 to 500).map(i => (if (i % 10 == 0) 1L else i.toLong % 7, i.toLong))
      .toDF("k", "v") // key 1 is hot
    val dim = Seq((0L, "z"), (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f"))
      .toDF("k", "name")
    val plainJoin = big.join(dim, "k").groupBy($"name").count()
      .as[(String, Long)].collect().toMap
    val salted = SkewedAgg.saltedJoin(big, dim, "k", saltBuckets = 4)
      .groupBy($"name").count().as[(String, Long)].collect().toMap
    assert(salted == plainJoin)
    val plainAgg = big.groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(Long, Long, Long)].collect().toSet
    val saltedAgg = SkewedAgg.saltedCountSum(big, "k", $"v", saltBuckets = 4)
      .select($"k", $"n", $"sum_value").as[(Long, Long, Long)].collect().toSet
    assert(saltedAgg == plainAgg)
  }
}
