package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding VOCABULARY TRAINING (Sennrich et al.) — the
  * tokenizer-training step of an LLM data pipeline: starting from
  * per-character symbols, repeatedly merge the adjacent symbol pair
  * with the highest corpus frequency. The merge table (rank, lhs, rhs)
  * IS the trained artifact a BPE tokenizer executes.
  *
  * Determinism contract: pair counts are exact integers over the word
  * dictionary (pair frequency = Σ word-freq over ALL adjacent symbol
  * occurrences — the standard BPE get_stats semantics, which counts
  * 'aaaa' as three (a,a) adjacencies); the argmax tie-breaks by
  * (count DESC, lhs, rhs); merging rewrites every word left-to-right
  * NON-overlapping ('a a a a' → 'aa aa'). Words are restricted to `^[a-z0-9]+$` after
  * lowercasing (standard BPE pre-tokenization), which frees ' ' as the
  * in-word symbol separator: a word's state is the string
  * `" s1 s2 …"` (leading separator, separator-joined), so one merge is
  * the plain string replace of `" lhs rhs"` with `" lhsrhs"` — the
  * same non-overlapping left-to-right scan in the JVM and in SQL,
  * which is what makes every round oracle-replayable.
  *
  * Scale shape: rounds run over the WORD DICTIONARY (one row per
  * distinct word — vocabulary-sized, orders of magnitude smaller than
  * the corpus, built by one corpus pass), in the [[KMeansInt]] loop
  * discipline: the per-round argmax is a TakeOrdered top-1 collected
  * to the driver (one row), the rewrite is a map re-embedding it as a
  * literal, and each round's state is a lazily-checkpointed constant
  * plan materialized by the next round's count — one job per round,
  * nothing corpus-sized moves after the dictionary build.
  *
  * `nMerges` is a SIZE target (the vocabulary budget), not a
  * convergence bound — but a corpus can be too small to support it:
  * if the best remaining pair occurs fewer than `minPairFreq` times
  * the trainer THROWS (the fail-fast discipline) rather than emit
  * degenerate merges, so an oracle unrolling exactly `nMerges`
  * unconditional rounds replays every run that completes.
  */
object BpeTrain {

  val MinPairFreq = 2L

  /** Word dictionary of a text corpus: (word, freq) for every distinct
    * lowercased `^[a-z0-9]+$` token. One corpus pass. */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.TextFunctions.tokens(
        lower(col(textCol)))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Trained artifacts: the merge table (merge_rank, lhs, rhs, merged,
    * pair_freq) and the final symbolized dictionary (word, sym, freq)
    * — `sym` is the word AFTER all merges, so
    * `size(split(sym, ' ')) − 1` is its BPE token count: training's
    * last state IS the tokenizer applied to the training vocabulary,
    * no separate encode pass needed. */
  final case class Trained(merges: DataFrame, dict: DataFrame)

  /** Train `nMerges` BPE merges over a (word, freq) dictionary.
    * THROWS if the corpus cannot support `nMerges` merges of frequency
    * ≥ [[MinPairFreq]]. */
  def train(words: DataFrame, nMerges: Int): Trained = {
    val spark = words.sparkSession
    var state = words
      .select(col("word"), concat(lit(" "), concat_ws(" ",
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
        .as("sym"), col("freq"))
      .localCheckpoint(false)
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to nMerges) {
      // pairs of adjacent symbols (index 1 of the split is the leading
      // empty string, so symbols run from 2): vocabulary-sized work
      val best: Array[Row] = state
        .select(split(col("sym"), " ").as("s"), col("freq"))
        .filter(size(col("s")) >= 3)
        .select(explode(expr(
            "transform(sequence(2, size(s) - 1), j -> " +
              "struct(element_at(s, j) AS a, element_at(s, j + 1) AS b))"))
          .as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .collect()
      if (best.isEmpty || best(0).getLong(2) < MinPairFreq)
        throw new IllegalStateException(
          s"corpus supports only ${r - 1} BPE merges of frequency >= $MinPairFreq" +
            s" — requested $nMerges")
      val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      out += ((r.toLong, a, b, a + b, cnt))
      // plain (non-regex) replace — tokens are [a-z0-9]+, so embedding
      // them in the expression is safe and mirrors the oracle exactly
      state = state
        .select(col("word"), expr(s"replace(sym, ' $a $b', ' $a$b')").as("sym"),
          col("freq"))
        .localCheckpoint(false)
    }
    import spark.implicits._
    Trained(
      out.result().toDF("merge_rank", "lhs", "rhs", "merged", "pair_freq"),
      state)
  }

  /** The merge table alone — see [[train]]. */
  def merges(words: DataFrame, nMerges: Int): DataFrame =
    train(words, nMerges).merges
}
