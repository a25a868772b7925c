package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style hard-threshold quality rules (Rae et al. 2021 §A1.1) —
  * the DECISION layer over continuous text statistics: five named
  * pass/fail rules per document and a composite keep flag. All-integer
  * verdicts (mean word length in exact milli-chars, ratios as
  * cross-multiplied integer comparisons) so the gate replays
  * bit-identically in any engine. Row-local — one codegen'd
  * projection, no shuffle, scan speed at 100 TB.
  */
object QualityGate {

  /** The function-word set rule 5 checks (≥ 2 distinct present) —
    * standing in for Gopher's English must-have stopwords; swap per
    * deployment vocabulary. */
  val StopSet: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Per-row rule columns over `(idCol, textCol)`:
    * r_words (word count in [minWords, maxWords]), r_mwl (mean word
    * length in [3, 10] chars), r_sym (symbol-to-word ratio < 0.1),
    * r_alpha (> 80% of words contain a letter), r_stop (≥ 2 distinct
    * [[StopSet]] words), keep (all five). Diagnostic integer stats
    * ride along so a report can show WHY a document failed. */
  def gopherGate(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val t = graft.functions.TextFunctions.tokens(col(textCol))
    val stopArr = array(StopSet.map(lit): _*)
    df.select(col(idCol), t.as("t"))
      .select(col(idCol),
        size(col("t")).cast("long").as("n_words"),
        aggregate(col("t"), lit(0L), (acc, w) => acc + length(w)).as("sum_len"),
        size(filter(col("t"), w => w.contains("#") || w.contains("…")))
          .cast("long").as("n_sym"),
        size(filter(col("t"), w => w.rlike("[a-z]"))).cast("long").as("n_alpha"),
        size(array_intersect(stopArr, col("t"))).cast("long").as("n_stopset"))
      .withColumn("mwl_milli",
        when(col("n_words") > 0, expr("sum_len * 1000L DIV n_words")))
      .withColumn("r_words",
        (col("n_words") >= minWords && col("n_words") <= maxWords).cast("int"))
      .withColumn("r_mwl",
        (col("n_words") > 0 && col("mwl_milli") >= 3000 &&
          col("mwl_milli") <= 10000).cast("int"))
      .withColumn("r_sym", (col("n_sym") * 10 < col("n_words")).cast("int"))
      .withColumn("r_alpha", (col("n_alpha") * 10 > col("n_words") * 8).cast("int"))
      .withColumn("r_stop", (col("n_stopset") >= 2).cast("int"))
      .withColumn("keep",
        (col("r_words") + col("r_mwl") + col("r_sym") + col("r_alpha") +
          col("r_stop") === 5).cast("int"))
      .drop("sum_len")
  }
}
