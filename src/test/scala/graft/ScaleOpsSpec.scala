package graft

import graft.ext.ConnectedComponents
import graft.operators.Profiler
import org.apache.spark.sql.functions._

/** Specs for the round-2 scale operators: connected components
  * (duplicate clustering) and the single-pass profiler. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components labels a chain, a triangle, and singletons") {
    // chain 1-2-3-4-5 (diameter 4 — exercises pointer jumping),
    // triangle 10-11-12, singleton 20
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val labels = ConnectedComponents.assign(vertices, "id", edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
    assert(labels(20L) == 20L)
  }

  test("connected components on a long path converges within the round budget") {
    // a 64-node path: hash-min alone needs 63 rounds; with pointer
    // jumping the label gap closes in O(log n) — well under maxIter
    val n = 64
    val vertices = (1 to n).map(_.toLong).toDF("id")
    val edges = (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val labels = ConnectedComponents.assign(vertices, "id", edges, "src", "dst", maxIter = 12)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(1L), "every path node must reach label 1")
  }

  test("profiler computes nulls, distincts, and typed min/max in one pass") {
    val df = Seq(
      (Some(1L), Some("a"), Some(1.5)),
      (Some(2L), None, Some(-2.0)),
      (None, Some("c"), Some(1.5))).toDF("k", "s", "v")
    val p = Profiler.profile(df, Seq("k", "s", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(1) == 3 && p("k").getLong(2) == 1 && p("k").getLong(3) == 2)
    assert(p("k").getDouble(4) == 1.0 && p("k").getDouble(5) == 2.0)
    assert(p("s").getLong(2) == 1 && p("s").getString(6) == "a" && p("s").getString(7) == "c")
    assert(p("s").isNullAt(4) && p("s").isNullAt(5))
    assert(p("v").getDouble(4) == -2.0 && p("v").getDouble(5) == 1.5 && p("v").getLong(3) == 2)
  }
}
