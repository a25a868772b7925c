package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer PageRank — entity-importance scoring over a relationship
  * graph (which duplicate to keep, which supplier/domain to trust,
  * importance-weighted corpus sampling). Fixed-point integer
  * arithmetic: ranks carry six implied decimal digits (R0 = 1e6), the
  * damping step is `150000 + (Σ contrib · 85) div 100`, and per-edge
  * contributions are `rank div out-degree` — every operation exact and
  * engine-replayable, unlike float PageRank whose reduction order
  * changes low bits per run.
  *
  * Scale design: each iteration is one join of the rank table to the
  * edge list (shuffle on src) plus one aggregation (shuffle on dst) —
  * the standard message-passing shape of [[ConnectedComponents]]; the
  * rank table is one row per vertex. Iterations localCheckpoint so the
  * loop's lineage stays flat. Floor division leaks ≤ deg·1 rank mass
  * per vertex per round — negligible at 1e6 scale and identical in any
  * engine.
  *
  * Contract: `edges` (src, dst) is treated as-is (direction matters;
  * pass both directions for an undirected graph); vertices = nodes
  * appearing in the edge list; every src therefore has out-degree ≥ 1
  * (no dangling-mass redistribution needed).
  */
object PageRank {

  /** Vertex count at or below which the per-round rank table is
    * broadcast instead of shuffle-joined. The rank table is two longs
    * per vertex (~16 bytes + row overhead), so 5M vertices ≈ 200 MB of
    * broadcast — the conventional executor-memory comfort limit. Above
    * it the loop falls back to shuffle joins with per-round eager
    * checkpoints (the web-scale-graph shape). */
  val BroadcastVertexLimit: Long = 5000000L

  /** (id, rank) after `iters` damped rounds from R0 = 1e6. */
  def ranks(edges: DataFrame, iters: Int): DataFrame =
    run(edges, iters, lit(1000000L), lit(150000L))

  /** Personalized PageRank (random walk with restart): initial mass
    * and per-round teleport land ONLY on vertices satisfying
    * `seedPred` (a predicate over `id`) — ranks then measure proximity
    * to the seed set, the recommendation / related-entity primitive,
    * rather than global importance. Same integer fixed-point
    * arithmetic as [[ranks]]. */
  def personalized(edges: DataFrame, seedPred: Column, iters: Int): DataFrame =
    run(edges, iters,
      when(seedPred, lit(1000000L)).otherwise(lit(0L)),
      when(seedPred, lit(150000L)).otherwise(lit(0L)))

  private def run(edges: DataFrame, iters: Int, init: Column,
      teleport: Column): DataFrame = {
    // one materialization of the (possibly expensive) upstream edge
    // plan; vertices and degree-annotated edges both derive from it
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the vertex set joins into EVERY iteration's rank update — without
    // materialization its union+distinct over the edge list would
    // re-run per round
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // degree rides with the edge list across all iterations
    val ed = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The rank table is one (id, rank) row per vertex — orders of
    // magnitude smaller than the edge list it joins. Broadcasting it
    // keeps the cached edge partitions in place all rounds (zero edge
    // shuffles; only the ~|V|-row partial-aggregated contribution sums
    // cross the wire). Catalyst can't discover this on its own: the
    // checkpointed rank table has no size statistics, so without the
    // hint every round pays a full shuffle of the edge list.
    val nV = vertices.count() // also materializes the vertex cache
    val bcast = nV <= BroadcastVertexLimit
    def hint(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    var r = vertices.select(col("id"), init.as("rank"))
    for (_ <- 1 to iters) {
      val contrib = ed.join(hint(r), ed("src") === r("id"))
        .select(col("dst"), expr("rank DIV deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      // contrib has ≤ |V| rows (one per message target) — same
      // broadcast envelope as the rank table itself
      r = vertices.join(hint(contrib), vertices("id") === contrib("dst"), "left")
        .select(col("id"),
          (teleport + expr("coalesce(m, 0L) * 85 DIV 100")).as("rank"))
        .localCheckpoint(true)
    }
    // the final ranks are eagerly checkpointed — the cached edge and
    // vertex tables are no longer reachable and must not leak
    // CacheManager entries for the session's lifetime
    ed.unpersist(false)
    vertices.unpersist(false)
    e.unpersist(false)
    r
  }
}
