package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
  * MOSS algorithm) — the guaranteed-recall LOCAL sampling of k-gram
  * hashes: pick the minimum hash in every window of `w` consecutive
  * k-grams. Any shared substring of length ≥ k + w − 1 is then
  * guaranteed to contribute at least one IDENTICAL selected
  * fingerprint to both documents — the span-level dup detector that
  * whole-doc digests ([[Dedup]]) and set-level MinHash ([[MinHashLsh]])
  * can't express, and the standard primitive behind copied-boilerplate
  * and quotation mining in web corpora.
  *
  * Determinism: ties inside a window are broken by position (the
  * minimized value is `hash·2^32 + offset`, exact in longs since the
  * polyhash modulus 10^9+7 < 2^30 keeps the product under 2^62), so
  * selection is bit-portable — no "rightmost previous min" state
  * machine needed. 32 offset bits cover every representable
  * document: Spark's `length` is IntegerType, so offsets are
  * structurally ≤ 2^31 − 1 and can never carry into the hash bits.
  *
  * Scale shape: selection is ROW-local — one native codegen'd pass per
  * document ([[graft.functions.WinnowFps]]: rolling k-gram polyhash,
  * monotonic-deque sliding min, distinct) — so the whole selection
  * stage needs NO shuffle at any scale; only the selected fingerprints
  * (a ~2/(w+1) fraction of k-grams, 16 bytes each) shuffle for the
  * cross-doc group-by. (The previous explode → per-doc-window
  * formulation shuffled every offset row; the oracle still replays
  * that form — bit-identical because packed values are unique, so the
  * window min has no ties.)
  */
object Winnowing {

  val K = 8
  val W = 4

  /** Offsets fit 32 bits inside the packed tie-break value (polyhash
    * < 2^30, so hash·2^32 + off < 2^62 stays exact in a long). */
  val PosBits = 32
  val PosScale: Long = 1L << PosBits

  /** Distinct selected fingerprints per document: (id, fp). Documents
    * shorter than k + w − 1 chars have no full window and are absent. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = K, w: Int = W): DataFrame = {
    require(k >= 1 && w >= 1, s"need k, w >= 1; got k=$k w=$w")
    val shim = org.apache.spark.sql.GraftShim
    val fps = shim.column(graft.functions.WinnowFps(
      shim.expression(col(textCol)), k, w, 1000000007L, PosScale))
    df.select(col(idCol).as("id"), explode(fps).as("fp"))
  }
}
