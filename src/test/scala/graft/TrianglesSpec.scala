package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Triangles

class TrianglesSpec extends SparkSpec {

  private def graph(edges: (Long, Long)*): DataFrame = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  private def counts(df: DataFrame): Map[Long, Long] =
    Triangles.perNodeCounts(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("single triangle: every vertex counts once") {
    assert(counts(graph(1L -> 2L, 2L -> 3L, 3L -> 1L)) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("square without diagonal has no triangles") {
    assert(counts(graph(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)) === Map.empty)
  }

  test("square with one diagonal: two triangles sharing the diagonal") {
    assert(counts(graph(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L)) ===
      Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("K4: four triangles, each vertex in three") {
    val k4 = graph(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(counts(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(Triangles.triangles(k4).count() === 4L)
  }

  test("duplicate / reversed / self-loop edges canonicalize away") {
    val messy = graph(1L -> 2L, 2L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 2L)
    assert(counts(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star graph (max-degree hub) has no triangles and no wedge blowup") {
    val star = graph((2L to 40L).map(i => 1L -> i): _*)
    assert(counts(star) === Map.empty)
  }

  test("triangles are emitted id-sorted (a < b < c) exactly once") {
    val rows = Triangles.triangles(graph(5L -> 9L, 9L -> 2L, 2L -> 5L)).collect()
    assert(rows.length === 1)
    assert((rows.head.getLong(0), rows.head.getLong(1), rows.head.getLong(2)) ===
      ((2L, 5L, 9L)))
  }

  test("degree-ordered enumeration matches naive id-ordered enumeration") {
    import spark.implicits._
    // deterministic pseudo-random graph: 60 nodes, ~p=0.12 hash-sampled
    val edges = (for {
      u <- 1L to 60L; v <- (u + 1) to 60L
      if ((u * 1103515245L + v * 12345L) % 100) < 12
    } yield (u, v)).toDF("src", "dst")
    val naive = {
      val e = Triangles.canonicalEdges(edges, "src", "dst")
      e.as("e1")
        .join(e.as("e2"), $"e1.v" === $"e2.u")
        .join(e.as("e3"), $"e3.u" === $"e1.u" && $"e3.v" === $"e2.v")
        .select($"e1.u".as("a"), $"e1.v".as("b"), $"e2.v".as("c"))
    }
    val fast = Triangles.triangles(edges)
    assert(fast.count() === naive.count())
    assert(fast.exceptAll(naive).count() === 0L)
    assert(naive.exceptAll(fast).count() === 0L)
    assert(naive.count() > 50L) // the fixture actually has triangles
  }
}
