package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer surprisal scoring — a language-model quality filter (the
  * CCNet/KenLM perplexity gate of production curation pipelines)
  * rebuilt on exact integer arithmetic: the corpus itself is the LM
  * (token-bigram counts), and a document's surprisal is
  *
  *   Σ_bigrams bitlen(N) − bitlen(count(bigram))   ≈ Σ log2(N / c)
  *
  * — the bit-length difference is an integer ceiling-log2 of the
  * inverse probability, so common phrasing scores low and improbable
  * token sequences score high, with NO floating logs (libm-free, hence
  * bit-identical in any engine; real log2 would differ in the last ulp
  * and break replay).
  *
  * Scale design: one aggregation builds the bigram table (vocabulary-
  * sized, not corpus-sized), one join scores every occurrence, one
  * aggregation folds per document. The bigram table is corpus-global
  * state the same way [[Quantize]]'s min/max row is — at 100 TB it is
  * the only thing that crosses stages, and it can be broadcast when
  * the vocabulary is small.
  */
object SurprisalScore {

  /** (id, g): every adjacent token-bigram occurrence (duplicates kept —
    * counts, not sets, make a language model). */
  private def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // bind the token array to a COLUMN before the bigram lambda: an
    // inline tokens expression is re-inlined into every element_at of
    // the transform (no subexpression elimination inside Generate), so
    // each bigram would re-split the whole document — O(words²) string
    // work per doc, measured ~40× slower at sf0.1
    df.select(col(idCol).as("id"),
        graft.functions.TextFunctions.tokens(col(textCol)).as("t"))
      .select(col("id"),
        explode(when(size(col("t")) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(col("t")) - 2),
            i => concat(element_at(col("t"), i + 1), lit(" "),
              element_at(col("t"), i + 2)))))
          .as("g"))
  }

  /** Per-document integer surprisal: (id, n_bigrams, surprisal_bits,
    * millibits_per_gram = surprisal·1000 div n). Documents with < 2
    * tokens score null bits (no evidence). */
  def tokenBigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = bigrams(df, idCol, textCol)
    val counts = occ.groupBy(col("g")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n_total"))
    val scored = occ.join(counts, "g")
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(length(bin(col("n_total"))).cast("long") - length(bin(col("c"))).cast("long"))
          .as("surprisal_bits"))
    df.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("surprisal_bits"),
        expr("CASE WHEN n_bigrams > 0 THEN surprisal_bits * 1000 DIV n_bigrams END")
          .as("millibits_per_gram"))
  }

  /** CCNet-style perplexity terciles (Wenzek et al. 2020): per
    * language, split documents into head/middle/tail of the
    * [[tokenBigramSurprisal]] rate — keep the well-modeled head, audit
    * the middle, drop the tail. Thresholds are EXACT rank statistics
    * computed the scale-safe way: one aggregation to a per-(lang,
    * score) histogram (bounded by distinct integer scores, not
    * documents), a cumulative window over those few rows, tercile cut
    * = min score whose cumulative count clears N/3 / 2N/3; assignment
    * is a row-local comparison against the broadcast per-lang
    * thresholds. Ties share a score and therefore a bucket (threshold
    * semantics, not ntile row-splitting) — engine-independent. Docs
    * with no bigrams are excluded (no rate to rank).
    * Output: (idCol, langCol, mb, bucket). */
  def ccnetBuckets(df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    // checkpoint the per-doc scores: they feed BOTH the threshold
    // histogram and the final assignment — without materialization the
    // whole surprisal pipeline (bigram explode + count join) re-plans
    // per consumer
    val scored = tokenBigramSurprisal(df, idCol, textCol)
      .filter(col("n_bigrams") > 0)
      .select(col("id").as(idCol), col("millibits_per_gram").as("mb"))
      .join(df.select(col(idCol), col(langCol)), Seq(idCol))
      .localCheckpoint(true)
    val hist = scored.groupBy(col(langCol), col("mb")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol)).orderBy(col("mb"))
    val cum = hist.withColumn("cumn", sum(col("n")).over(w))
    // per-lang totals roll up from the histogram — no third pass over
    // the corpus-sized scores
    val tot = hist.groupBy(col(langCol)).agg(sum(col("n")).as("tot"))
    val thr = cum.join(tot, Seq(langCol))
      .groupBy(col(langCol))
      .agg(min(when(col("cumn") * 3 >= col("tot"), col("mb"))).as("t1"),
        min(when(col("cumn") * 3 >= col("tot") * 2, col("mb"))).as("t2"))
    scored.join(broadcast(thr), Seq(langCol))
      .select(col(idCol), col(langCol), col("mb"),
        when(col("mb") <= col("t1"), "head")
          .when(col("mb") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
  }
}
