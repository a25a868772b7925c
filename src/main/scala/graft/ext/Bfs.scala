package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS — exact hop distance from a SEED SET over a
  * directed edge list, the graph-proximity labeling primitive next to
  * [[PageRank.personalized]]'s soft proximity: "how many hops is every
  * entity from the trusted cohort" drives curation radii, contamination
  * blast-zones, and seed-expansion sampling.
  *
  * Scale shape: each round is one join of the CURRENT FRONTIER (only
  * the nodes discovered last round — not the whole visited set) to the
  * cached edge list, a min-dist dedup of the new targets, and one
  * anti-join against the visited table — all O(frontier·degree) with
  * small keys. Rounds are bounded by the seed set's eccentricity;
  * convergence is data-driven (an empty frontier ends the loop) and
  * `maxRounds` THROWS instead of returning truncated distances — the
  * [[KCore]] discipline. Distances only ever ADD rows (never revise:
  * BFS discovers each node at its true minimum hop), so a fixed
  * oracle unroll past convergence is idempotent.
  */
object Bfs {

  /** (id, dist) for every node reachable from `seeds` (an `id` column;
    * seeds themselves at dist 0, whether or not they appear in the
    * graph). Returns the distance table and the number of expansion
    * rounds actually applied. */
  def distances(edges: DataFrame, seeds: DataFrame,
      maxRounds: Int = 20): (DataFrame, Int) = {
    // the edge list joins into every round — materialize once
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dist = seeds.select(col("id")).distinct()
      .select(col("id"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var frontier = dist
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("dst").as("id"), (col("dist") + 1L).as("dist"))
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
        .join(dist.select(col("id")), Seq("id"), "left_anti")
        .localCheckpoint(true)
      if (next.isEmpty) converged = true
      else {
        // NO re-checkpoint of the visited table: it is a union of
        // already-checkpointed per-round frames, so its lineage is
        // flat (depth = rounds, over materialized blocks) and the
        // per-round re-materialization job it paid was pure overhead
        dist = dist.unionByName(next)
        frontier = next
        rounds += 1
      }
    }
    e.unpersist(false)
    if (!converged)
      throw new IllegalStateException(
        s"BFS did not exhaust its frontier within $maxRounds rounds — raise maxRounds")
    (dist, rounds)
  }
}
