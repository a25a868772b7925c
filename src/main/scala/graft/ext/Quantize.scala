package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of embedding columns — the storage/compute
  * compression step of a large-scale vector pipeline: 64 float32 dims
  * (256 B) become 64 uint8 codes (64 B), and similarity scans run on
  * integer arithmetic (SIMD-friendly, exactly reproducible across
  * engines — unlike float dot products, integer products have no
  * rounding at all).
  *
  * Codes: `q_d = round((x_d - min_d) * 255 / (max_d - min_d))` with the
  * per-dimension min/max taken over the WHOLE corpus (one aggregation;
  * at 100 TB that is a 64-group partial agg — bytes shuffled are
  * constant in corpus size). The min/max row rides along as a broadcast
  * cross join, so quantization itself is a pure per-row projection.
  */
object Quantize {

  import Similarity.vecD

  /** Per-dimension (1-based dim index, min, max) over the corpus. */
  def dimMinMax(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(vecD(col(vecCol))).as(Seq("d0", "x")))
      .groupBy((col("d0") + 1).as("d"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** One row: (mns array<double>, mxs array<double>), dim-ordered. */
  private def minMaxArrays(df: DataFrame, vecCol: String): DataFrame =
    dimMinMax(df, vecCol).agg(
      transform(array_sort(collect_list(struct(col("d"), col("mn")))), s => s("mn")).as("mns"),
      transform(array_sort(collect_list(struct(col("d"), col("mx")))), s => s("mx")).as("mxs"))

  private def codeExpr(x: Column, mn: Column, mx: Column): Column =
    // a corpus-constant dimension (mx == mn) would quantize as 0.0/0.0 =
    // NaN (cast error under ANSI, silent corruption otherwise): pin it
    // to code 0 — reconstruction is exact for that dimension anyway
    when(mx === mn, lit(0L))
      .otherwise(round((x - mn) * lit(255.0) / (mx - mn)).cast("long"))

  private def codesOf(df: DataFrame, idCol: String, vecCol: String, mm: DataFrame): DataFrame =
    df.crossJoin(broadcast(mm))
      .select(col(idCol).as("id"),
        transform(vecD(col(vecCol)), (x, i) =>
          codeExpr(x, element_at(col("mns"), i + 1), element_at(col("mxs"), i + 1))).as("codes"))

  /** (id, codes array<long> in 0..255). The min/max arrays broadcast;
    * the transform mirrors `((x - mn) * 255) / (mx - mn)` structurally
    * so an external engine replays identical doubles, hence identical
    * rounded codes. */
  def sq8Codes(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    codesOf(df, idCol, vecCol, minMaxArrays(df, vecCol))

  /** Quantized-integer scan stats per vector, exploded relationally
    * (codegen'd aggregation, no interpreted array folds in the group
    * phase): total and position-weighted code sums, plus the integer
    * inner product `Σ (q_d-128)(q0_d-128)` against reference vector
    * `refId` — the asymmetric-distance computation (ADC) shape of a
    * quantized ANN scan, in exact integer arithmetic. */
  def sq8ScanStats(df: DataFrame, idCol: String, vecCol: String, refId: Long): DataFrame = {
    // the one-row min/max aggregate feeds BOTH the corpus branch and the
    // ref branch: localCheckpoint it so the corpus-wide scan behind it
    // runs once (blocks are GC-reclaimed with the plan, unlike persist)
    val mm = minMaxArrays(df, vecCol).localCheckpoint(eager = false)
    def exploded(d: DataFrame) =
      codesOf(d, idCol, vecCol, mm)
        .select(col("id"), posexplode(col("codes")).as(Seq("d0", "c")))
        .select(col("id"), (col("d0") + 1).as("d"), col("c"))
    // quantize the ref row from a one-row slice (filter pushed to the
    // scan), not by re-running the whole corpus pipeline
    val ref = exploded(df.filter(col(idCol) === refId))
      .select(col("d"), col("c").as("c0"))
    exploded(df).join(broadcast(ref), Seq("d"))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).as("code_sum"),
        sum(col("d") * col("c")).as("code_wsum"),
        sum((col("c") - 128L) * (col("c0") - 128L)).as("iprod_ref"))
  }
}
