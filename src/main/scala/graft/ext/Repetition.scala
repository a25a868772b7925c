package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality filtering — the "duplicate n-gram" family
  * of gates from large-corpus curation (cf. the Gopher/MassiveText
  * rules): documents dominated by one repeated bigram, or whose
  * trigrams are mostly repeats, are boilerplate/spam and get dropped
  * before training.
  *
  * All statistics are integer COUNTS (total / top bigram, total /
  * distinct trigram) and the keep decision is integer-multiplication
  * arithmetic — no floating point anywhere, so results are exactly
  * reproducible in any engine. The computation is fully relational
  * (explode → two-level aggregation), so it scales as a pair of
  * hash-shuffles on (doc_id, gram) keys with map-side partial
  * aggregation — no per-document state ever materializes.
  */
object Repetition {

  private def tokens(c: Column): Column =
    when(trim(c) === "", array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Adjacent n-grams of `t` joined with spaces; empty when there are
    * fewer than `n` tokens. zip_with over shifted slices — pure codegen
    * input to the explode, no UDF. */
  private def grams(t: Column, n: Int): Column = {
    val sz = size(t)
    val cnt = sz - (n - 1)
    val joined = (2 to n).foldLeft(slice(t, lit(1), cnt)) { (acc, k) =>
      zip_with(acc, slice(t, lit(k), cnt), (a, b) => concat(a, lit(" "), b))
    }
    when(sz >= n, joined).otherwise(array().cast("array<string>"))
  }

  private def keepFlag(maxTopBigramPct: Int, maxDupTrigramPct: Int): Column =
    (col("n2_top") * 100L <= col("n2_total") * maxTopBigramPct &&
      (col("n3_total") - col("n3_distinct")) * 100L <= col("n3_total") * maxDupTrigramPct)
      .cast("int")

  /** The keep decision as one boolean Column — for direct use in a
    * batch filter or a stateless streaming gate (no join, no shuffle). */
  def keepsRepetitionGate(
      textCol: Column, maxTopBigramPct: Int = 20, maxDupTrigramPct: Int = 30): Column = {
    val gs = graft.functions.GraftFunctions.gramStats(textCol)
    val n2t = element_at(gs, 1)
    val n2top = element_at(gs, 2)
    val n3t = element_at(gs, 3)
    val n3d = element_at(gs, 4)
    n2top * 100L <= n2t * maxTopBigramPct &&
      (n3t - n3d) * 100L <= n3t * maxDupTrigramPct
  }

  /** Row-local one-pass variant of [[ngramRepetitionStats]] — same four
    * exact counts and keep decision from the [[graft.functions.GramKernel]]
    * native expression, computed inside the scan projection. No explode,
    * NO SHUFFLE (the relational version moves every gram occurrence
    * through two (doc, gram) shuffles — at corpus scale that is orders
    * of magnitude more data movement than the documents themselves),
    * and stateless, so it gates streaming ingest too. Spec-checked
    * equal to the relational formulation. */
  def ngramRepetitionStatsLocal(
      df: DataFrame, idCol: String, textCol: String,
      maxTopBigramPct: Int = 20, maxDupTrigramPct: Int = 30): DataFrame = {
    val gs = graft.functions.GraftFunctions.gramStats(col(textCol))
    df.select(col(idCol).as("id"), gs.as("__gs"))
      .select(col("id"),
        element_at(col("__gs"), 1).as("n2_total"),
        element_at(col("__gs"), 2).as("n2_top"),
        element_at(col("__gs"), 3).as("n3_total"),
        element_at(col("__gs"), 4).as("n3_distinct"))
      .withColumn("keep_flag", keepFlag(maxTopBigramPct, maxDupTrigramPct))
  }

  /** Per-document repetition stats + keep decision:
    * (id, n2_total, n2_top, n3_total, n3_distinct, keep_flag) where
    * keep_flag = 1 iff the top bigram is ≤ `maxTopBigramPct`% of all
    * bigram occurrences AND repeated trigram occurrences are ≤
    * `maxDupTrigramPct`% of all trigram occurrences. Documents with no
    * grams (short texts) keep zeros and pass both gates.
    *
    * Prefer [[ngramRepetitionStatsLocal]] (shuffle-free); this
    * relational formulation remains as its cross-check and for engines
    * without the native kernel. */
  def ngramRepetitionStats(
      df: DataFrame, idCol: String, textCol: String,
      maxTopBigramPct: Int = 20, maxDupTrigramPct: Int = 30): DataFrame = {
    val id = col(idCol)
    val toks = df.select(id.as("id"), tokens(col(textCol)).as("t"))

    def gramCounts(n: Int): DataFrame =
      toks.select(col("id"), explode(grams(col("t"), n)).as("g"))
        .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))

    val s2 = gramCounts(2).groupBy(col("id"))
      .agg(sum(col("c")).as("n2_total"), max(col("c")).as("n2_top"))
    val s3 = gramCounts(3).groupBy(col("id"))
      .agg(sum(col("c")).as("n3_total"), count(lit(1)).as("n3_distinct"))

    df.select(id.as("id"))
      .join(s2, Seq("id"), "left").join(s3, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n2_total"), lit(0L)).as("n2_total"),
        coalesce(col("n2_top"), lit(0L)).as("n2_top"),
        coalesce(col("n3_total"), lit(0L)).as("n3_total"),
        coalesce(col("n3_distinct"), lit(0L)).as("n3_distinct"))
      .withColumn("keep_flag", keepFlag(maxTopBigramPct, maxDupTrigramPct))
  }
}
