package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
  * Training is CONVERGENCE-DRIVEN: [[fitConvergedAssign]] iterates to
  * the exact assignment-set fixed point (zero changed assignments) and
  * THROWS past `maxRounds` — never a silent truncation. Lloyd's update
  * is not monotone in an engine-checkable integer certificate (unlike
  * PageRank's from-below value iteration, q119), so the certificate is
  * the assignment set itself: when no vector changes cluster, the
  * floor-mean update reproduces the centroids exactly (empty clusters
  * carry their previous centroid, which is equally stable), so zero
  * changes IS a fixed point — and every further round is a no-op,
  * which is what lets an oracle replay with ANY unroll depth ≥ the
  * observed one. Integer Lloyd can in principle oscillate instead of
  * converging; `maxRounds` turns that into a loud failure.
  *
  * Scale design: centroids are k×dim integers — CONSTANT-size state,
  * collected to the driver each round (the q128-τ one-row-stats class;
  * MLlib's k-means does exactly this) and re-embedded as literals. So
  * a round is ONE job: the map-only reassignment (argmin over the k
  * literal centroids, a lazily-checkpointed constant-size plan)
  * materialized by the map-side-combined (cluster, d) sums aggregation
  * — the only shuffle, k×dim partials per partition — which also
  * carries the changed-count. Nothing corpus-sized shuffles in any
  * round; the codes table is read from its checkpoint each pass.
  * Empty clusters keep their previous centroid, so k is stable.
  *
  * Determinism contract: ties in the argmin break toward the smaller
  * cluster id; centroid means use floor integer division (codes are
  * non-negative, so truncating and flooring division agree); initial
  * centroids are the code vectors of ids `0 until k` (the same
  * convention as q66's seed rule).
  */
object KMeansInt {

  /** Default fail-fast bound for [[fitConvergedAssign]], and the exact
    * unroll depth of every k-means oracle replay: observed fixed-point
    * depths are ≤ 84 across all trained (sub)spaces at sf ≤ 0.1 (the
    * deepest: IVF-PQ residual subspaces at sf0.1), and because extra
    * rounds past the fixed point are no-ops, an oracle unrolled to
    * exactly MaxRounds covers every run the engine can complete
    * without throwing. The two constants must never drift — oracles
    * reference this value. */
  val MaxRounds = 96

  /** (id, codes array<long>) → (id, d [1-based], c) exploded. */
  def explodedCodes(codes: DataFrame): DataFrame =
    codes.select(col("id"), posexplode(col("codes")).as(Seq("d0", "c")))
      .select(col("id"), (col("d0") + 1).as("d"), col("c"))

  /** Nearest-centroid assignment: (id, cluster, dist2), dist2 = exact
    * integer Σ_d (c_d − m_d)². cent is (cluster, d, m), broadcast.
    * Used for single-pass assignment against FIXED centroid tables
    * (PQ encodeWith / LUT paths); the training loop embeds its
    * constant centroids as literals instead — see [[bestOf]]. */
  def assign(expl: DataFrame, cent: DataFrame): DataFrame = {
    val byDist = Window.partitionBy(col("id")).orderBy(col("dist2"), col("cluster"))
    expl.join(broadcast(cent), Seq("d"))
      .groupBy(col("id"), col("cluster"))
      .agg(sum((col("c") - col("m")) * (col("c") - col("m"))).as("dist2"))
      .withColumn("rn", row_number().over(byDist))
      .filter(col("rn") === 1)
      .select(col("id"), col("cluster"), col("dist2"))
  }

  /** struct(dist2, cluster) of the nearest of the k LITERAL centroids
    * to the `codes` array column — the row-local argmin the training
    * loop maps over the corpus (no join, no shuffle): one native
    * codegen'd JVM loop per row ([[graft.functions.KmNearest]]; ties
    * toward the smaller cluster id — the same contract as [[assign]]).
    * The HOF formulation (aggregate ∘ zip_with per candidate) is
    * interpreted per element and dominated every Lloyd round. */
  def bestOf(cents: Seq[(Long, Seq[Long])], codes: Column): Column = {
    val sorted = cents.sortBy(_._1)
    val shim = org.apache.spark.sql.GraftShim
    shim.column(graft.functions.KmNearest(shim.expression(codes),
      sorted.map(_._1).toArray, sorted.map(_._2.toArray).toArray))
  }

  private def seedCents(mat: DataFrame, k: Int): Seq[(Long, Seq[Long])] =
    mat.filter(col("id") < k)
      .select(col("id"), col("codes")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq

  /** One action over the current state: per-(cluster, d) code sums and
    * member counts (k×dim map-side-combined partials — the only
    * shuffle in a round) PLUS, piggybacked on the d=1 slice, how many
    * rows the LAST reassignment changed — so convergence detection
    * costs no extra job. Returns the floor-mean updated centroids
    * (clusters with no members keep their previous centroid) and the
    * changed-count. */
  private def updatedCents(state: DataFrame, prev: Seq[(Long, Seq[Long])]): (Seq[(Long, Seq[Long])], Long) = {
    val rows = state
      .select(col("cluster"), col("changed"), posexplode(col("codes")).as(Seq("d0", "c")))
      .groupBy(col("cluster"), (col("d0") + 1L).as("d"))
      .agg(sum(col("c")).as("s"), count(lit(1)).as("n"),
        count(when(col("changed") && col("d0") === 0, 1)).as("nch"))
      .collect()
    val changed = rows.iterator.map(_.getLong(4)).sum
    val sums = rows.iterator
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val cents = prev.map { case (cl, m) =>
      (cl, m.indices.map { i =>
        sums.get((cl, i + 1L)).map { case (s, n) => s / n }.getOrElse(m(i))
      })
    }
    (cents, changed)
  }

  /** Converged training state: the fixed-point centroids (cluster, d,
    * m), the final assignment (id, cluster, dist2), and how many
    * update rounds it took to reach zero changed assignments. */
  final case class FitResult(centroids: DataFrame, assignment: DataFrame,
      rounds: Int)

  /** Lloyd rounds from the id<k seeds to the EXACT assignment-set
    * fixed point (see object scaladoc): update → reassign until a
    * reassignment changes zero rows, THROW past `maxRounds` (too few
    * rounds silently degrades downstream ANN recall, so running out is
    * an error). Per round exactly ONE job: the reassignment is a LAZY
    * local checkpoint (constant-size LogicalRDD plan — no per-round
    * lineage or analysis growth) whose first materialization IS the
    * constant-size sums+changed collect — so a round costs one
    * (narrow map + tiny agg) job and a driver round-trip of k×dim
    * integers. Earlier rounds' checkpoint blocks are reclaimed by the
    * context cleaner as their references drop. */
  def fitConvergedAssign(codes: DataFrame, k: Int, maxRounds: Int): FitResult = {
    val spark = codes.sparkSession
    val mat = codes.select(col("id"), col("codes")).localCheckpoint(true)
    def reassign(from: DataFrame, cents: Seq[(Long, Seq[Long])], withPrev: Boolean) =
      from
        .withColumn("best", bestOf(cents, col("codes")))
        .select(col("id"), col("codes"),
          col("best.cluster").as("cluster"), col("best.dist2").as("dist2"),
          (if (withPrev) col("best.cluster") =!= col("cluster") else lit(true))
            .as("changed"))
        .localCheckpoint(false)
    var cents = seedCents(mat, k)
    var state = reassign(mat.withColumn("cluster", lit(-1L)), cents, withPrev = false)
    var rounds = 0
    var converged = false
    while (!converged) {
      // ONE action: materializes `state` (truncating its lineage) and
      // returns the k×dim sums, the changed-count of the last
      // reassignment, and so the next centroids in one pass
      val (next, changed) = updatedCents(state, cents)
      if (rounds > 0 && changed == 0L) converged = true
      else {
        rounds += 1
        if (rounds > maxRounds) throw new IllegalStateException(
          s"k-means did not reach the assignment fixed point in $maxRounds rounds")
        cents = next
        state = reassign(state, cents, withPrev = true)
      }
    }
    val asg = state.select(col("id"), col("cluster"), col("dist2"))
    import spark.implicits._
    val centRows = cents.flatMap { case (cl, m) =>
      m.zipWithIndex.map { case (v, i) => (cl, (i + 1).toLong, v) }
    }.toDF("cluster", "d", "m")
    FitResult(centRows, asg, rounds)
  }
}
