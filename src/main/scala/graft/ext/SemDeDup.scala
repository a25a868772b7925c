package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over embeddings — the SemDeDup recipe
  * (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication", 2023): coarse-cluster the
  * embedding space, compare pairs only WITHIN a cluster, group the
  * above-threshold pairs into duplicate components, keep one
  * representative per component.
  *
  * Scale design: the all-pairs comparison never happens — candidate
  * pairs are bounded by Σ cluster², tunable via `nClusters` (the same
  * role LSH banding plays for text). The pairwise join co-shuffles by
  * cluster id; components come from the distributed
  * [[ConnectedComponents]] (so a chain a~b~c dedups together even when
  * cos(a,c) is below threshold, matching the transitive-closure
  * semantics of the paper's per-cluster grouping).
  */
object SemDeDup {

  /** (id, rep_id, is_kept): every vector labeled with its duplicate
    * group's representative (min id, transitively closed within
    * clusters); `is_kept` = 1 iff the vector IS the representative.
    * Filter `is_kept = 1` for the deduplicated corpus. */
  def dedup(
      df: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, minCos: Double = 0.4): DataFrame = {
    import Similarity.dot
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // assigned feeds both sides of the self-join; pairs feeds both
    // branches of CC's edge symmetrization — without persists the IVF
    // assignment runs twice and the full pairwise cosine up to twice more
    val assigned = Similarity.ivfAssign(df, idCol, vecCol, nClusters).persist(mem)
    val pairs = assigned.as("a").join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b")
      .persist(mem)
    val labels = ConnectedComponents.assign(
      df.select(col(idCol).as("id")), "id", pairs, "id_a", "id_b")
    labels.select(col("id"), col("cluster_id").as("rep_id"),
      (col("id") === col("cluster_id")).cast("int").as("is_kept"))
  }
}
