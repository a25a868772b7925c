package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition — iterative peeling: repeatedly delete every
  * vertex whose current degree is below k until none remains; what
  * survives is the k-core. The fourth graph primitive next to
  * [[PageRank]], [[ConnectedComponents]] and [[Triangles]]: cores
  * separate the cohesive body of a link/co-occurrence graph from its
  * periphery (link-farm tendrils and one-off co-occurrences peel away,
  * dense communities stay), the standard graph-side spam/quality gate.
  *
  * Scale shape: each round is one degree aggregation (shuffle on node
  * id, map-side combined) plus two anti-joins removing edges that touch
  * a peeled vertex — all O(m) with small keys; rounds bound by the
  * peeling depth (logarithmic-ish in practice, 2-4 on our graphs). The
  * surviving edge list is eagerly checkpointed per round so lineage
  * stays flat across iterations (the [[PageRank]] recipe).
  *
  * Convergence is data-driven (a round that peels nothing ends the
  * loop) and `maxRounds` THROWS instead of returning a partially-peeled
  * subgraph — the [[ConnectedComponents]] lesson: a silent cap would
  * under-peel at 100x scale with no signal.
  */
object KCore {

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** Vertices of the k-core of the undirected graph `edges` (any
    * (src, dst) list; canonicalized like [[Triangles]]) with their
    * in-core degrees: (node, core_deg). Empty when the whole graph
    * peels away. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 20,
      src: String = "src", dst: String = "dst"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var e = Triangles.canonicalEdges(edges, src, dst).localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // the peel set (usually a small fringe) feeds the convergence
      // check AND both anti-joins — materialize the degree agg once
      val low = degrees(e).filter(col("deg") < k).select(col("node"))
        .localCheckpoint(true)
      if (low.isEmpty) converged = true
      else {
        e = e
          .join(low.withColumnRenamed("node", "u"), Seq("u"), "left_anti")
          .join(low.withColumnRenamed("node", "v"), Seq("v"), "left_anti")
          .select(col("u"), col("v"))
          .localCheckpoint(true)
        round += 1
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"k-core peeling did not converge within $maxRounds rounds — raise maxRounds")
    degrees(e).select(col("node"), col("deg").as("core_deg"))
  }
}
