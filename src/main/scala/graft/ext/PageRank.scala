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
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    val g = prepare(edges, prePartition = iters > 3)
    val r = ranksOn(g, iters)
    g.unpersistAll()
    r
  }

  /** [[ranks]] over an already-prepared graph the CALLER owns (and
    * unpersists): lets several queries in one process share one
    * materialized edge list instead of each re-running the upstream
    * scan+join+distinct — the q84/q111 shape. */
  def ranksOn(g: Graph, iters: Int): DataFrame =
    run(g, iters, lit(1000000L), lit(150000L))

  /** Personalized PageRank (random walk with restart): initial mass
    * and per-round teleport land ONLY on vertices satisfying
    * `seedPred` (a predicate over `id`) — ranks then measure proximity
    * to the seed set, the recommendation / related-entity primitive,
    * rather than global importance. Same integer fixed-point
    * arithmetic as [[ranks]]. */
  def personalized(edges: DataFrame, seedPred: Column, iters: Int): DataFrame = {
    val g = prepare(edges, prePartition = iters > 3)
    val r = personalizedOn(g, seedPred, iters)
    g.unpersistAll()
    r
  }

  /** [[personalized]] over a caller-owned prepared graph. */
  def personalizedOn(g: Graph, seedPred: Column, iters: Int): DataFrame =
    run(g, iters,
      when(seedPred, lit(1000000L)).otherwise(lit(0L)),
      when(seedPred, lit(150000L)).otherwise(lit(0L)))

  /** Teleport mass (and implied rank scale) of [[ranksToFixpoint]]:
    * damping 1/2 makes the converged total mass ≤ 2·FixTeleport·|V|. */
  val FixTeleport = 500000L

  /** PageRank iterated to its EXACT integer fixed point — data-driven
    * convergence instead of a fixed unroll, the [[KCore]] discipline:
    * a round that changes nothing ends the loop, `maxRounds` THROWS.
    *
    * Why a fixed point provably exists (no oscillation): the update
    *   F(r)(v) = T + (Σ_{u→v} r(u) div deg(u)) div 2
    * is monotone in r (floor/sum/floor compose monotone), and the loop
    * starts from r0 = T everywhere — BELOW the fixed point — so
    * r1 = F(r0) ≥ r0 pointwise and by induction the sequence is
    * pointwise nondecreasing. Total mass is bounded (S_{n+1} ≤ T·|V| +
    * S_n/2 keeps S < 2T·|V|), so a nondecreasing integer sequence must
    * stop changing: convergence to an exact fixed point is guaranteed,
    * and equality of consecutive rank SUMS (one scalar aggregate per
    * round) certifies pointwise equality. Damping 1/2 (not 85/100)
    * halves the gap per round — depth ≈ log2(rank scale) ≈ 20 rounds.
    *
    * Returns (ranks, applications) where `applications` counts update
    * applications including the final idempotent one; an oracle
    * unrolling ≥ applications−1 rounds reproduces the output exactly.
    */
  def ranksToFixpoint(edges: DataFrame, maxRounds: Int = 48): (DataFrame, Int) = {
    val g = prepare(edges)
    val r = ranksToFixpointOn(g, maxRounds)
    g.unpersistAll()
    r
  }

  /** [[ranksToFixpoint]] over a caller-owned prepared graph (caller
    * unpersists — or deliberately keeps it cached across queries). */
  def ranksToFixpointOn(g: Graph, maxRounds: Int = 48): (DataFrame, Int) = {
    // Batch several damped applications into ONE checkpointed plan:
    // per-round cost at converged scale is job overhead (a broadcast
    // build + a tiny sum), not data, so 3 steps per materialization
    // cut sf0.1 steady-state 10->7.8 s. Deeper batches regress both
    // regimes (5 warm; 4 cold, 14.1 vs 13.3 s driver-style): the
    // nested plan outgrows what it saves. Convergence is certified:
    // applications are individually nondecreasing, so sum equality
    // across a 3-step batch ⟹ all three substeps changed nothing.
    val batch = 3
    var r = g.vertices.select(col("id"), lit(FixTeleport).as("rank"))
      .localCheckpoint(true)
    var prevSum = r.agg(sum(col("rank"))).head().getLong(0)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = (1 to batch).foldLeft(r)((cur, _) =>
          stepPlan(g, cur, lit(FixTeleport), "coalesce(m, 0L) DIV 2"))
        .localCheckpoint(true)
      val s = next.agg(sum(col("rank"))).head().getLong(0)
      rounds += batch
      if (s == prevSum) converged = true
      else { prevSum = s; r = next }
    }
    if (!converged)
      throw new IllegalStateException(
        s"PageRank did not reach its fixed point within $maxRounds rounds — raise maxRounds")
    (r, rounds)
  }

  /** Materialized graph shared by every iteration: cached symmetric-ish
    * edge list, vertex table, degree-annotated edges, and whether the
    * per-round |V|-row tables fit the broadcast envelope. */
  private[graft] final case class Graph(
      e: DataFrame, vertices: DataFrame, ed: DataFrame, bcast: Boolean) {
    // The rank table is one (id, rank) row per vertex — orders of
    // magnitude smaller than the edge list it joins. Broadcasting it
    // keeps the cached edge partitions in place all rounds (zero edge
    // shuffles; only the ~|V|-row partial-aggregated contribution sums
    // cross the wire). Catalyst can't discover this on its own: the
    // checkpointed rank table has no size statistics, so without the
    // hint every round pays a full shuffle of the edge list.
    def hint(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    // the final ranks are eagerly checkpointed — the cached edge and
    // vertex tables are no longer reachable and must not leak
    // CacheManager entries for the session's lifetime
    def unpersistAll(): Unit = {
      ed.unpersist(false); vertices.unpersist(false); e.unpersist(false)
    }
  }

  private[graft] def prepare(edges: DataFrame): Graph = prepare(edges, prePartition = true)

  /** `prePartition = false` skips the upfront edge-cache shuffle — right
    * for SHORT fixed-iteration runs ([[ranks]]/[[personalized]] with a
    * couple of rounds), where one pre-shuffle cannot amortize; the
    * fixed-point loop (~20–30 rounds) always pre-partitions. */
  private[graft] def prepare(edges: DataFrame, prePartition: Boolean): Graph = {
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
    val nV = vertices.count() // also materializes the vertex cache
    val bcast = nV <= BroadcastVertexLimit
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // Pre-partition the cached edge list by the per-round HOT KEY, paid
    // once for all rounds. Broadcast mode: the only per-round exchange
    // is the contribution aggregation on dst — hash-partitioning the
    // cache by dst lets every round's groupBy(dst) reuse the cached
    // partitioning (the broadcast join and the project both preserve
    // it), so NO per-round exchange touches edge- or contribution-sized
    // data at all. Shuffle-join mode (|V| above the broadcast
    // envelope): the hot key is the src join key — the edge side of
    // each round's sort-merge join stays in place and only the |V|-row
    // rank table moves.
    val ed0 = e.join(deg, "src")
    val ed = (if (prePartition) ed0.repartition(col(if (bcast) "dst" else "src"))
              else ed0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Graph(e, vertices, ed, bcast)
  }

  /** Rebuild a prepared [[Graph]] from LOADED parts (e.g. a pinned
    * [[ArtifactRegistry]] generation): edges (src, dst), vertices
    * (id), degree-annotated edges (src, dst, deg). Same caching and
    * hot-key pre-partitioning decisions as [[prepare]], but ZERO
    * recomputation — the vertex and degree artifacts come from
    * storage, so the serve path touches no build code (the
    * ingest-vs-serve split of the index/model registries, applied to
    * graphs). */
  private[graft] def prepareLoaded(edges: DataFrame, vertices: DataFrame,
      degEdges: DataFrame): Graph = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst")).persist(lvl)
    val v = vertices.select(col("id")).persist(lvl)
    val nV = v.count() // materializes the vertex cache
    val bcast = nV <= BroadcastVertexLimit
    val ed = degEdges.select(col("src"), col("dst"), col("deg"))
      .repartition(col(if (bcast) "dst" else "src"))
      .persist(lvl)
    Graph(e, v, ed, bcast)
  }

  /** One damped message-passing round (lazy plan): join ranks to the
    * cached edge list (broadcast when small), partial-aggregate
    * contributions on dst, rejoin to the vertex table. Callers decide
    * when to checkpoint. */
  private[graft] def stepPlan(g: Graph, r: DataFrame, teleport: Column,
      dampSql: String): DataFrame = {
    val contrib = g.ed.join(g.hint(r), g.ed("src") === r("id"))
      .select(col("dst"), expr("rank DIV deg").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("m"))
    // contrib has ≤ |V| rows (one per message target) — same
    // broadcast envelope as the rank table itself
    g.vertices.join(g.hint(contrib), g.vertices("id") === contrib("dst"), "left")
      .select(col("id"), (teleport + expr(dampSql)).as("rank"))
  }

  private def run(g: Graph, iters: Int, init: Column,
      teleport: Column): DataFrame = {
    var r = g.vertices.select(col("id"), init.as("rank"))
    // eager checkpoint per round keeps lineage flat across iterations
    for (_ <- 1 to iters)
      r = stepPlan(g, r, teleport, "coalesce(m, 0L) * 85 DIV 100")
        .localCheckpoint(true)
    r
  }
}
