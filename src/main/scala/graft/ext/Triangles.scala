package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the third graph primitive next to
  * [[PageRank]] and [[ConnectedComponents]]: triangle participation is
  * the standard cohesion/spam signal on co-occurrence graphs (a page
  * whose link neighborhood closes no triangles is a link farm; a
  * supplier clique is a procurement community).
  *
  * Algorithm: degree-ordered edge orientation (the MapReduce classic —
  * Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
  * Reducer", WWW'11). Orient every undirected edge from its
  * lower-(degree, id) endpoint to the higher one; enumerate wedges
  * (v ← u → w) only at each edge's LOWER endpoint; a wedge closes a
  * triangle iff the oriented edge (v, w) exists. Ordering by degree
  * caps every node's out-degree at O(√m), so wedge volume is O(m^1.5)
  * worst-case instead of Σ deg² — the hub node that would explode an
  * id-ordered enumeration (the "last reducer") generates NO wedges
  * because all its edges point INTO it.
  *
  * Scale shape: two self-equi-joins (on apex, then on the closing edge
  * pair) — both plain shuffle hash joins on small (long, long) keys; no
  * payload wider than three node ids ever crosses the wire. Each
  * triangle is found exactly once (its (deg, id)-minimal vertex is the
  * unique apex).
  */
object Triangles {

  /** Canonical undirected edge set: distinct (u, v) with u < v, loops
    * dropped. Accepts raw directed/duplicated edge lists. */
  def canonicalEdges(edges: DataFrame, src: String, dst: String): DataFrame =
    edges.select(least(col(src), col(dst)).as("u"),
        greatest(col(src), col(dst)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()

  /** Per-node triangle participation counts over the undirected graph
    * `edges` (any (src, dst) list; canonicalized internally):
    * (node, n_triangles), nodes in no triangle omitted. */
  def perNodeCounts(edges: DataFrame, src: String = "src", dst: String = "dst"): DataFrame = {
    val tri = triangles(edges, src, dst)
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** All triangles as (a, b, c) with a < b < c (node-id order — the
    * orientation order is internal; callers see a canonical id-sorted
    * triple). */
  def triangles(edges: DataFrame, src: String = "src", dst: String = "dst"): DataFrame = {
    // e feeds the degree union (twice) + the orientation join;
    // oriented feeds both wedge sides + the closing join. Checkpoint
    // each so the upstream (possibly expensive) edge derivation and
    // the degree-annotation join run ONCE — O(m) materialization, the
    // standard trade for a 3x-replanned subtree
    val e = canonicalEdges(edges, src, dst).localCheckpoint(false)
    val deg = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): lo = smaller endpoint in that total order.
    // deg joins are plain equi-joins; at |V| ≪ |E| scale AQE broadcasts
    // them, at web scale they shuffle on the node id — both correct.
    val oriented = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("lo"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("hi"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("dv"))
          .otherwise(col("du")).as("dhi"))
      .localCheckpoint(false)
    // wedges at the apex: unordered spoke pairs, (deg, id)-ordered so the
    // closing edge is exactly the oriented (hi1, hi2)
    val a = oriented.select(col("lo"), col("hi").as("hi1"), col("dhi").as("dhi1"))
    val b = oriented.select(col("lo"), col("hi").as("hi2"), col("dhi").as("dhi2"))
    val wedges = a.join(b, "lo")
      .filter(struct(col("dhi1"), col("hi1")) < struct(col("dhi2"), col("hi2")))
      .select(col("lo"), col("hi1"), col("hi2"))
    wedges
      .join(oriented.select(col("lo").as("hi1"), col("hi").as("hi2")), Seq("hi1", "hi2"))
      .select(least(col("lo"), col("hi1"), col("hi2")).as("a"),
        // the middle of three distinct ids: total − min − max
        (col("lo") + col("hi1") + col("hi2")
          - least(col("lo"), col("hi1"), col("hi2"))
          - greatest(col("lo"), col("hi1"), col("hi2"))).as("b"),
        greatest(col("lo"), col("hi1"), col("hi2")).as("c"))
  }
}
