package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.simhash32

/** SimHash near-duplicate detection (north star): 32-bit token-level
  * SimHash ([[graft.functions.SimHash32]], one codegen'd pass per doc)
  * + banded candidate generation.
  *
  * With 4 disjoint 8-bit bands, any pair at Hamming distance ≤ 3 agrees
  * on at least one band (pigeonhole), so banded candidates + exact
  * Hamming filter produce EXACTLY the brute-force result — no recall
  * loss — while the join moves only (band, byte, id) tuples. That
  * equivalence is what the DuckDB oracle exploits: it brute-forces, we
  * band, results must be identical.
  */
object SimHashDedup {
  val Bands = 4
  val BitsPerBand = 8

  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"), simhash32(col(textCol)).as("sh"))
  }

  /** Pairs at Hamming distance ≤ `maxHamming` (must be < Bands for the
    * pigeonhole guarantee). */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < Bands,
      s"maxHamming=$maxHamming needs > $maxHamming+1 bands for exact recall; use more/narrower bands")
    val sims = simhashes(df, idCol, textCol)
    val bands = sims.select(col("id"), col("sh"),
        explode(array((0 until Bands).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sh"), b * BitsPerBand).bitwiseAND(lit(255L)).as("bval"))): _*))
          .as("bs"))
      .select(col("id"), col("sh"), col("bs.band").as("band"), col("bs.bval").as("bval"))
    // hamming filter INSIDE the band join: candidates that fail the
    // distance test never reach the output — at skewed band buckets
    // this is the difference between emitting true pairs and the whole
    // candidate blow-up.
    //
    // first-match-band emission replaces distinct(): a pair agreeing on
    // several bands would be emitted once per band, but requiring every
    // EARLIER band to disagree picks exactly one emission per pair —
    // a pure predicate, so the (at corpus scale, huge) pair stream
    // never pays a dedup shuffle.
    def bandVal(sh: org.apache.spark.sql.Column, b: Int) =
      shiftrightunsigned(sh, b * BitsPerBand).bitwiseAND(lit(255L))
    val firstMatch = (0 until Bands).map(bp =>
      when(col("a.band") > lit(bp), bandVal(col("a.sh"), bp) =!= bandVal(col("b.sh"), bp))
        .otherwise(lit(true))).reduce(_ && _)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id") &&
          bit_count(col("a.sh").bitwiseXOR(col("b.sh"))) <= maxHamming &&
          firstMatch)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("hamming"))
  }
}
