package graft

import org.apache.spark.sql.DataFrame
import graft.ext.KCore

class KCoreSpec extends SparkSpec {

  private def graph(edges: (Long, Long)*): DataFrame = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  private def core(df: DataFrame, k: Int, maxRounds: Int = 20): Map[Long, Long] =
    KCore.kCore(df, k, maxRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle with a pendant chain: 2-core keeps only the triangle") {
    // 1-2-3 triangle, chain 3-4-5 dangling off it
    val g = graph(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L)
    assert(core(g, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("pure path peels away entirely at k=2") {
    assert(core(graph(1L -> 2L, 2L -> 3L, 3L -> 4L), 2) === Map.empty)
  }

  test("K4 survives k=3 intact; k=4 empties it") {
    val k4 = graph(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(core(k4, 3) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(core(k4, 4) === Map.empty)
  }

  test("cascading peel: removing a fringe vertex drags its support under k") {
    // long chain into a triangle — each round peels one more chain link,
    // exercising multi-round convergence
    val g = graph(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L,
      6L -> 7L, 7L -> 5L)
    assert(core(g, 2) === Map(5L -> 2L, 6L -> 2L, 7L -> 2L))
  }

  test("maxRounds throws on non-convergence instead of under-peeling silently") {
    // 6-link chain needs 5 peel rounds at k=2; cap at 2 must throw
    val g = graph(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    intercept[IllegalStateException](core(g, 2, maxRounds = 2))
  }

  test("duplicate / reversed edges canonicalize before peeling") {
    val g = graph(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 1L -> 3L)
    assert(core(g, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("q105 engine convergence depth stays within the oracle's unroll") {
    // the q105 oracle unrolls a FIXED number of peel rounds; the engine
    // peels data-driven. They agree only while the engine converges
    // within that unroll (extra oracle rounds are identity at the fixed
    // point). Capping maxRounds at the oracle's round count makes this
    // spec THROW the moment data growth pushes convergence past it —
    // the false-divergence failure mode becomes a named assertion.
    import org.apache.spark.sql.functions.col
    val li = Tables.load(spark, sf, "lineitem")
      .filter(col("l_quantity") >= 41)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val pairs = li.as("a").join(li.as("b"), "ok")
      .filter(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
    val rounds = graft.queries.AnalyticsQueries.q105OracleRounds
    assert(KCore.kCore(pairs, k = 2, maxRounds = rounds).count() > 0)
  }
}
