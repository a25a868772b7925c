package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * step that turns near-duplicate PAIRS (MinHash/SimHash/embedding) into
  * duplicate GROUPS, so a cleaner can keep one representative per
  * component (north star: dedup at 100 TB).
  *
  * Algorithm: hash-min label propagation with pointer jumping. Each
  * round every vertex takes the minimum label among {itself, its
  * neighbors} (one shuffle over the edge list), then follows its own
  * label's label (`label ← label(label)`, a second self-join) — the
  * pointer-jumping step halves chain depth each round, giving
  * O(log diameter) rounds instead of O(diameter). This is the
  * DataFrame-native version of the large-star/small-star technique
  * (Kiveris et al., "Connected Components in MapReduce and Beyond").
  *
  * Scale design: state per round is one (id, label) table — 16 bytes a
  * vertex — and the edge list is reused cached; each round is two
  * equi-join shuffles, no driver-side graph. `localCheckpoint` truncates
  * the iterative lineage so plans don't grow with round count. The
  * convergence probe is a count of changed labels (cheap aggregate).
  */
object ConnectedComponents {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Label every vertex with the smallest vertex id reachable from it.
    *
    * Pointer jumping halves chain depth per round, so `maxIter` rounds
    * resolve components of diameter ~2^maxIter; if the loop exits
    * without converging the labels are PARTIAL (under-clustered). That
    * case logs a warning, and callers that must not proceed on partial
    * labels can pass `requireConvergence = true` to fail fast instead.
    *
    * @param vertices one column `idCol`; isolated vertices keep their
    *                 own id as the component label
    * @param edges    undirected edge list in (`srcCol`, `dstCol`)
    * @return (id, cluster_id)
    */
  def assign(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25,
      requireConvergence: Boolean = false): DataFrame = {
    val vertexIds = vertices.select(col(idCol).as("vid"))
    // restrict edges to the vertex set ONCE, up front: the fused
    // message-union round below would otherwise manufacture label rows
    // for edge endpoints outside `vertices` (the pre-fusion left join
    // dropped them implicitly), breaking the output-ids ⊆ vertices
    // contract and bridging components through unknown endpoints
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .join(vertexIds.withColumnRenamed("vid", "src"), Seq("src"), "left_semi")
      .join(vertexIds.withColumnRenamed("vid", "dst"), Seq("dst"), "left_semi")
      .distinct()
      .cache()
    def labelSum(df: DataFrame): Any =
      df.agg(org.apache.spark.sql.functions.sum(
        col("cluster_id").cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head.get(0)
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("cluster_id"))
      .localCheckpoint()
    var prevSum = labelSum(labels)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // hash-min: label ← min(label, min over neighbors' labels).
      // Formulated as message-union + ONE groupBy (each vertex's own
      // label is just another message), not groupBy + left join — one
      // shuffle on `id` instead of a grouped aggregate joined back.
      // both union children project to FRESH aliases: reusing `labels`'
      // attributes in both branches trips Catalyst's union constraint
      // propagation (NoSuchElementException on the rewritten attribute)
      val fromNeighbors = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("mid"), col("cluster_id").as("mlab"))
      val own = labels.select(col("id").as("mid"), col("cluster_id").as("mlab"))
      val stepped = fromNeighbors.unionByName(own)
        .groupBy(col("mid")).agg(min("mlab").as("cluster_id"))
        .select(col("mid").as("id"), col("cluster_id"))
      // pointer jump: label ← min(label, label(label))
      // non-eager localCheckpoint: the convergence probe right below is
      // the first action, so the round's labels materialize DURING the
      // sum job (one job per round, not a checkpoint job plus a probe
      // job) while still truncating the iterative lineage
      val next = stepped.as("u")
        .join(stepped.select(col("id").as("jid"), col("cluster_id").as("jlab")).as("l"),
          col("u.cluster_id") === col("jid"), "left")
        .select(col("u.id").as("id"),
          least(col("u.cluster_id"), coalesce(col("jlab"), col("u.cluster_id"))).as("cluster_id"))
        .localCheckpoint(eager = false)
      // labels only ever decrease, so an unchanged (exact decimal) sum
      // means NO label moved — a one-table aggregate instead of a
      // join-based diff for the convergence probe
      val sum = labelSum(next)
      labels = next
      converged = sum == prevSum
      prevSum = sum
      round += 1
    }
    sym.unpersist()
    if (!converged) {
      val msg = s"ConnectedComponents.assign did not converge in $maxIter rounds; " +
        "labels are partially propagated (components may be split). " +
        "Raise maxIter (rounds needed ~ log2(graph diameter))."
      if (requireConvergence) throw new IllegalStateException(msg)
      log.warn(msg)
    }
    labels
  }
}
