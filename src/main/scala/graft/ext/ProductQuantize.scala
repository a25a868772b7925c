package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization — the third leg of the vector-index toolchain
  * next to scalar quantization ([[Quantize]], q64) and IVF
  * ([[Similarity]]/[[KMeansInt]], q32/q66/q77): split each vector into
  * M contiguous subspaces, train an independent k-codeword codebook per
  * subspace (integer Lloyd — [[KMeansInt]], bit-deterministic), and
  * store each vector as M small codeword ids. M=4 × k=8 compresses a
  * 64-dim int8 code vector (64 bytes) to 4×3 bits while keeping
  * asymmetric distances computable from per-subspace lookup tables —
  * the IVF-PQ layout production ANN indexes (faiss-style) use at
  * billion-vector scale.
  *
  * Scale shape: per subspace everything is [[KMeansInt]]'s shape
  * (broadcast k×subDim centroids; codes touched once per Lloyd round);
  * the M subspace assignments are unioned and pivoted back to one row
  * per vector by an id-grouped collect of M elements — bounded state,
  * map-side combined. `recon_dist2` (Σ per-subspace quantization error)
  * is the exact integer objective a PQ training loop monitors.
  */
object ProductQuantize {

  val NumSub = 4
  val SubDim = 16
  val K = 8
  val Iters = 1

  /** PQ-encode 64-dim int8 code vectors (id, codes array<long>):
    * (id, pq array<long> of [[NumSub]] codeword ids, recon_dist2).
    * Codebooks are trained per subspace from the id<K seed convention
    * ([[KMeansInt.fitAssign]]). */
  def encode(codes: DataFrame): DataFrame = {
    val parts = (0 until NumSub).map { m =>
      KMeansInt.fitAssign(
          codes.select(col("id"),
            slice(col("codes"), m * SubDim + 1, SubDim).as("codes")),
          k = K, iters = Iters)
        .select(col("id"), lit(m).as("sub"), col("cluster"), col("dist2"))
    }
    parts.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(
        transform(array_sort(collect_list(struct(col("sub"), col("cluster")))),
          s => s("cluster")).as("pq"),
        sum(col("dist2")).as("recon_dist2"))
  }
}
