package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Scale shape: everything until the final fingerprint aggregation is
  * DOCUMENT-LOCAL — the offset explode and the w-row sliding min
  * partition by doc id, so a repartition on doc id (usually free from
  * the scan) makes the whole selection map-side; only the selected
  * fingerprints (a ~2/(w+1) fraction of k-grams, 16 bytes each)
  * shuffle for the cross-doc group-by.
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
    graft.functions.GraftFunctions.register(df.sparkSession) // polyhash
    val grams = df
      .select(col(idCol).as("id"), col(textCol).as("text"),
        (length(col(textCol)) - (k - 1)).as("ngrams"))
      .filter(col("ngrams") >= w)
      .select(col("id"), col("ngrams"), col("text"),
        explode(sequence(lit(1), col("ngrams"))).as("off"))
      .select(col("id"), col("ngrams"), col("off"),
        (graft.functions.GraftFunctions.polyhash(
          col("text").substr(col("off"), lit(k))) * PosScale + col("off")).as("c"))
    val win = Window.partitionBy(col("id")).orderBy(col("off"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .select(col("id"), col("off"), col("ngrams"), min(col("c")).over(win).as("mc"))
      .filter(col("off") + (w - 1) <= col("ngrams")) // full windows only
      .select(col("id"), expr(s"mc DIV $PosScale").as("fp")) // strip tie-break
      .distinct()
  }
}
