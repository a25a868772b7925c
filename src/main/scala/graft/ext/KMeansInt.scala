package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd k-means over integer code vectors — real IVF centroid
  * TRAINING (the step [[Similarity.ivfAssign]]'s fixed seeds skip).
  * Runs on int8 quantization codes ([[Quantize.sq8Codes]]), which is
  * how production vector indexes train coarse quantizers at scale:
  * integer squared-L2 has no rounding, so every iteration is exactly
  * reproducible across engines AND across cluster re-runs — a property
  * float k-means fundamentally lacks (reduction order changes results).
  *
  * Scale design: centroids are k×dim rows (a few KB) and broadcast to
  * every join; the data side is touched once per iteration in exploded
  * (id, d, c) form, persisted across iterations. Per iteration: one
  * broadcast join + two aggregations — no shuffle of the codes
  * themselves beyond the first explode. Empty clusters keep their
  * previous centroid (COALESCE), so k is stable.
  *
  * Determinism contract: ties in the argmin break toward the smaller
  * cluster id; centroid means use floor integer division; initial
  * centroids are the code vectors of ids `0 until k` (the same
  * convention as q66's seed rule).
  */
object KMeansInt {

  /** (id, codes array<long>) → (id, d [1-based], c) exploded. */
  def explodedCodes(codes: DataFrame): DataFrame =
    codes.select(col("id"), posexplode(col("codes")).as(Seq("d0", "c")))
      .select(col("id"), (col("d0") + 1).as("d"), col("c"))

  /** Nearest-centroid assignment: (id, cluster, dist2), dist2 = exact
    * integer Σ_d (c_d − m_d)². cent is (cluster, d, m), broadcast. */
  def assign(expl: DataFrame, cent: DataFrame): DataFrame = {
    val byDist = Window.partitionBy(col("id")).orderBy(col("dist2"), col("cluster"))
    expl.join(broadcast(cent), Seq("d"))
      .groupBy(col("id"), col("cluster"))
      .agg(sum((col("c") - col("m")) * (col("c") - col("m"))).as("dist2"))
      .withColumn("rn", row_number().over(byDist))
      .filter(col("rn") === 1)
      .select(col("id"), col("cluster"), col("dist2"))
  }

  /** Centroid update: per (cluster, d) the floor-mean of member codes;
    * clusters that lost all members keep their previous centroid. */
  def update(expl: DataFrame, asg: DataFrame, prev: DataFrame): DataFrame = {
    val sums = expl.join(asg.select(col("id"), col("cluster")), Seq("id"))
      .groupBy(col("cluster"), col("d"))
      .agg(sum(col("c")).as("s"), count(lit(1)).as("n"))
    prev.join(sums, Seq("cluster", "d"), "left")
      .select(col("cluster"), col("d"), coalesce(expr("s DIV n"), col("m")).as("m"))
  }

  private def fitOn(expl: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    var cent = seeds
    for (_ <- 1 to iters) {
      val asg = assign(expl, cent)
      cent = update(expl, asg, cent).localCheckpoint(true)
    }
    cent
  }

  private def seeds(codes: DataFrame, k: Int): DataFrame =
    explodedCodes(codes.filter(col("id") < k))
      .select(col("id").as("cluster"), col("d"), col("c").as("m"))

  /** Train `iters` Lloyd rounds from the id<k seeds and return the
    * centroid table (cluster, d, m) — k×dim rows, eagerly checkpointed
    * by the last round, so the exploded codes can be released. */
  def fit(codes: DataFrame, k: Int, iters: Int): DataFrame = {
    val expl = explodedCodes(codes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cent = fitOn(expl, seeds(codes, k), iters)
    expl.unpersist(false)
    cent
  }

  /** Train `iters` Lloyd rounds from the id<k seeds and return the
    * final assignment (id, cluster, dist2) against the trained
    * centroids. The exploded codes persist across iterations; each
    * round's centroids are eagerly localCheckpoint'ed (k×dim rows) so
    * the iterative lineage never deepens. */
  def fitAssign(codes: DataFrame, k: Int, iters: Int): DataFrame = {
    val expl = explodedCodes(codes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assign(expl, fitOn(expl, seeds(codes, k), iters))
  }
}
