package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
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
  * lowercasing (standard BPE pre-tokenization), which frees ' ' and
  * ';' as structural characters: a word's state is the string
  * `" s1; s2; …"` — every symbol carries a leading separator AND a
  * trailing ';' terminator — so one merge is the plain string replace
  * of `" lhs; rhs;"` with `" lhsrhs;"`: the same non-overlapping
  * left-to-right scan in the JVM and in SQL, which is what makes
  * every round oracle-replayable. The terminator makes the pattern
  * self-delimiting on BOTH sides: without it, a bare `" a b"` rhs
  * would also match the PREFIX of a longer symbol (`" a bc"` would
  * corrupt to `" abc"`), and any pattern that instead CONSUMED the
  * following separator would break the overlap chain (`' a a a a'`
  * must still rewrite to `' aa aa'`, which needs the next symbol's
  * leading separator left intact for the continuing scan).
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
    docWords(docs, textCol)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** The valid-word projection BPE trains on AND applies to — one row
    * per `^[a-z0-9]+$` token of the lowercased text, with `carry`
    * columns riding along. ONE definition shared by [[wordDict]] and
    * every gate that applies a trained vocabulary back to documents
    * (q145/q148/q149): if application tokenized differently from
    * training, dictionary joins would silently drop words. */
  def docWords(docs: DataFrame, textCol: String, carry: Seq[String] = Seq.empty): DataFrame =
    docs.select(carry.map(col) :+ explode(graft.functions.TextFunctions.tokens(
        lower(col(textCol)))).as("word"): _*)
      .filter(col("word").rlike("^[a-z0-9]+$"))

  /** The applied tokenizer as a join table: (word, n_bpe) — per-word
    * BPE token count from the trained dict's final symbol state
    * (`size(split(sym)) − 1`; see [[Trained]]). ONE definition for
    * q145/q148/q149, so the token-count semantics cannot fork between
    * gates that share an oracle chain. */
  def tokenCounts(trained: Trained): DataFrame =
    trained.dict.select(col("word"),
      (size(split(col("sym"), " ")) - 1).cast("long").as("n_bpe"))

  /** Trained artifacts: the merge table (merge_rank, lhs, rhs, merged,
    * pair_freq) and the final symbolized dictionary (word, sym, freq)
    * — `sym` is the word AFTER all merges, so
    * `size(split(sym, ' ')) − 1` is its BPE token count: training's
    * last state IS the tokenizer applied to the training vocabulary,
    * no separate encode pass needed. */
  final case class Trained(merges: DataFrame, dict: DataFrame)

  /** Per-character initial symbol state (word, sym, freq) — see the
    * class doc for the `" s1; s2; …"` encoding. */
  private def initState(words: DataFrame): DataFrame = words
    .select(col("word"), expr(
        "concat_ws('', transform(sequence(1, length(word)), " +
          "i -> concat(' ', substring(word, i, 1), ';')))")
      .as("sym"), col("freq"))
    .localCheckpoint(false)

  /** The top-`m` adjacent-symbol pairs of the current state by
    * (count DESC, lhs, rhs) — the vocabulary-sized argmax frame both
    * trainers rank on (index 1 of the split is the leading empty
    * string, so symbols run from 2; the ';' terminator is stripped for
    * the pair names). */
  private def topPairs(state: DataFrame, m: Int): Array[Row] = state
    .select(split(col("sym"), " ").as("s"), col("freq"))
    .filter(size(col("s")) >= 3)
    .select(explode(expr(
        "transform(sequence(2, size(s) - 1), j -> " +
          "struct(replace(element_at(s, j), ';', '') AS a, " +
          "replace(element_at(s, j + 1), ';', '') AS b))"))
      .as("p"), col("freq"))
    .groupBy(col("p.a").as("a"), col("p.b").as("b"))
    .agg(sum(col("freq")).as("cnt"))
    .orderBy(col("cnt").desc, col("a"), col("b")).limit(m)
    .collect()

  /** Train `nMerges` BPE merges over a (word, freq) dictionary.
    * THROWS if the corpus cannot support `nMerges` merges of frequency
    * ≥ [[MinPairFreq]]. */
  def train(words: DataFrame, nMerges: Int): Trained = {
    val spark = words.sparkSession
    var state = initState(words)
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to nMerges) {
      val best = topPairs(state, 1)
      if (best.isEmpty || best(0).getLong(2) < MinPairFreq)
        throw new IllegalStateException(
          s"corpus supports only ${r - 1} BPE merges of frequency >= $MinPairFreq" +
            s" — requested $nMerges")
      val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      out += ((r.toLong, a, b, a + b, cnt))
      // plain (non-regex) replace — tokens are [a-z0-9]+, so embedding
      // them in the expression is safe and mirrors the oracle exactly;
      // the ' lhs; rhs;' pattern is fully delimited on both sides (see
      // the class doc), so it can never fuse with a longer symbol
      state = state
        .select(col("word"), expr(s"replace(sym, ' $a; $b;', ' $a$b;')").as("sym"),
          col("freq"))
        .localCheckpoint(false)
    }
    import spark.implicits._
    Trained(
      out.result().toDF("merge_rank", "lhs", "rhs", "merged", "pair_freq"),
      state)
  }

  /** Batched distributed trainer — BIT-IDENTICAL to [[train]] with
    * fewer Spark jobs: each round collects the top-`batchTopM` pairs
    * (one TakeOrdered instead of a top-1) and applies, in ONE rewrite,
    * the maximal PROVABLY-SAFE prefix of that ranking. Safety is by
    * construction, not by convention:
    *
    *  - the batch is a contiguous PREFIX of the (cnt DESC, lhs, rhs)
    *    order that stops at the FIRST candidate sharing a boundary
    *    symbol (or equal to a merged string) with an earlier member —
    *    so every batch member's count is untouched by the members
    *    before it, and the recorded pair_freq is exactly what the
    *    one-merge loop would record;
    *  - the prefix is then truncated to members whose count STRICTLY
    *    exceeds `cBound`, the count of the first pair outside it
    *    (the first excluded collected row, or the last collected row
    *    when the collection itself was truncated). Any pair the batch
    *    could newly create has count ≤ its pre-merge parent pair's
    *    count, and every such parent shares a symbol with a member —
    *    i.e. lies outside the prefix — so its count is ≤ cBound
    *    < every applied member's count. Hence neither an updated old
    *    pair nor a newly-created pair can outrank any applied member,
    *    and the sequential loop would pick exactly these merges in
    *    exactly this order.
    *
    * When the safe prefix is empty (the top count ties cBound), the
    * round degrades to the top-1 — the one-merge loop's own step — so
    * progress is always ≥ 1 merge/round and the worst case equals
    * [[train]]. Same fail-fast [[MinPairFreq]] discipline. The gated
    * corpora batch 5–24 merges per job (spec-pinned ≥ 10 on a
    * disjoint-pair corpus), making thousands of oracle-replayed merges
    * feasible where [[train]] would be driver-round-bound. */
  def trainBatched(words: DataFrame, nMerges: Int, batchTopM: Int = 64): Trained =
    trainBatchedRounds(words, nMerges, batchTopM)._1

  /** [[trainBatched]] plus the number of Spark rounds it took —
    * observability for specs pinning the merges-per-job batching. */
  private[graft] def trainBatchedRounds(
      words: DataFrame, nMerges: Int, batchTopM: Int): (Trained, Int) = {
    val spark = words.sparkSession
    var state = initState(words)
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var done = 0
    var rounds = 0
    while (done < nMerges) {
      val top = topPairs(state, batchTopM)
      rounds += 1
      if (top.isEmpty || top(0).getLong(2) < MinPairFreq)
        throw new IllegalStateException(
          s"corpus supports only $done BPE merges of frequency >= $MinPairFreq" +
            s" — requested $nMerges")
      // maximal symbol-disjoint prefix (stop at the FIRST conflict —
      // skipping over a conflicting row would let its decreased count
      // still outrank later members)
      val used = scala.collection.mutable.Set.empty[String]
      val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var i = 0
      var stop = false
      while (!stop && i < top.length && batch.size < nMerges - done) {
        val (a, b, c) = (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
        if (c < MinPairFreq || used(a) || used(b) || used(a + b)) stop = true
        else { batch += ((a, b, c)); used += a; used += b; used += a + b; i += 1 }
      }
      val cBound: Long =
        if (i < top.length) top(i).getLong(2) // first excluded row
        else if (top.length == batchTopM) top.last.getLong(2) // uncollected pairs may tie the tail
        else -1L // the collection IS the complete pair list; nothing excluded
      val safe = batch.takeWhile(_._3 > cBound).toSeq
      val applied = if (safe.nonEmpty) safe else Seq((top(0).getString(0),
        top(0).getString(1), top(0).getLong(2)))
      applied.foreach { case (a, b, c) =>
        done += 1
        out += ((done.toLong, a, b, a + b, c))
      }
      // one rewrite applies the whole batch in rank order (the members
      // are symbol-disjoint, so the chained replaces commute — the
      // order is kept anyway to mirror the sequential loop verbatim)
      val rewrite = applied.foldLeft("sym") { case (e, (a, b, _)) =>
        s"replace($e, ' $a; $b;', ' $a$b;')"
      }
      state = state
        .select(col("word"), expr(rewrite).as("sym"), col("freq"))
        .localCheckpoint(false)
    }
    import spark.implicits._
    (Trained(
      out.result().toDF("merge_rank", "lhs", "rhs", "merged", "pair_freq"),
      state), rounds)
  }

  /** The merge table alone — see [[train]]. */
  def merges(words: DataFrame, nMerges: Int): DataFrame =
    train(words, nMerges).merges

  /** Collect a merge table into its ranked (lhs, rhs, merged) list —
    * vocabulary-sized (one row per merge), the driver-literal form a
    * frozen tokenizer ships with ([[applyMerges]]); typically read
    * from a persisted artifact, never from live training. */
  def collectMerges(merges: DataFrame): Seq[(String, String, String)] =
    merges.orderBy(col("merge_rank"))
      .select(col("lhs"), col("rhs"), col("merged"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq

  /** Apply a FROZEN ranked merge list to an arbitrary word table —
    * the serving-side tokenizer: each merge is training's own rewrite
    * (replace `" a; b;"` with `" ab;"`, all non-overlapping
    * occurrences left-to-right) applied in rank order as a chain of
    * codegen'd string replaces, so (a) replaying it over the training
    * words reproduces the trained dictionary's `sym` EXACTLY
    * (spec-pinned — the tokenizer round-trip theorem) and (b) words
    * the trainer never saw tokenize correctly under the same frozen
    * vocabulary — the property a (word → count) dictionary join
    * cannot provide. Row-local, zero shuffle; the merge list rides
    * the plan as literals (24-10⁵ rules — the collectBooks class). */
  def applyMerges(words: DataFrame,
      mergeList: Seq[(String, String, String)]): DataFrame =
    words.withColumn("sym", symExpr(col("word"), mergeList))

  /** The frozen-rule rewrite chain as a pure Column over ANY word
    * expression — usable on a scalar word column ([[applyMerges]]) or
    * INSIDE an array lambda (the row-local streaming serve, where each
    * doc's words tokenize without an explode or any state). */
  def symExpr(word: Column,
      mergeList: Seq[(String, String, String)]): Column = {
    val init = concat_ws("", transform(sequence(lit(1), length(word)),
      i => concat(lit(" "), word.substr(i, lit(1)), lit(";"))))
    mergeList.foldLeft(init) { case (c, (a, b, ab)) =>
      replace(c, lit(s" $a; $b;"), lit(s" $ab;"))
    }
  }

  /** Driver-local trainer over the COLLECTED word dictionary — the
    * production-vocabulary scale path. [[train]] pays one Spark job
    * (one driver round-trip + one TakeOrdered) per merge: fine at the
    * gated vocabulary budget, but a real 30k–50k-merge tokenizer would
    * be driver-ROUND-bound, not data-bound. The dictionary itself is
    * vocabulary-sized (one row per distinct word — orders of magnitude
    * smaller than the corpus, built by the same single corpus pass),
    * so it fits on the driver by construction; after collecting it,
    * all merge rounds run in-memory with classic incremental pair
    * bookkeeping (only words containing the merged pair are touched —
    * Sennrich's get_stats/merge loop), i.e. ZERO Spark jobs per merge.
    *
    * Semantics are IDENTICAL to [[train]]: exact integer pair counts,
    * (count DESC, lhs, rhs) tie-break, left-to-right non-overlapping
    * rewrite, THROW below [[MinPairFreq]], and the same `" s1; s2;…"`
    * dict encoding — parity is spec-pinned (BpeTrainSpec) so the two
    * paths cannot fork. */
  def trainLocal(words: DataFrame, nMerges: Int): Trained = {
    val spark = words.sparkSession
    import scala.collection.mutable
    val rows = words.select(col("word"), col("freq")).collect()
    val word = rows.map(_.getString(0))
    val freq = rows.map(_.getLong(1))
    val syms: Array[Array[String]] = word.map(_.map(_.toString).toArray)
    def pairsOf(s: Array[String]): Iterator[(String, String)] =
      (0 until s.length - 1).iterator.map(j => (s(j), s(j + 1)))
    val counts = mutable.HashMap.empty[(String, String), Long]
    // inverted index pair -> word ids; entries may go stale after a
    // word is rewritten (they are lazily discarded when consumed)
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def add(i: Int): Unit = pairsOf(syms(i)).foreach { p =>
      counts(p) = counts.getOrElse(p, 0L) + freq(i)
      where.getOrElseUpdate(p, mutable.Set.empty) += i
    }
    def subtract(i: Int): Unit = pairsOf(syms(i)).foreach { p =>
      val c = counts(p) - freq(i)
      if (c == 0L) counts.remove(p) else counts(p) = c
    }
    syms.indices.foreach(add)
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to nMerges) {
      // total order => min is deterministic regardless of map iteration
      val best = if (counts.isEmpty) None else Some(counts.minBy {
        case ((a, b), c) => (-c, a, b)
      })
      if (best.isEmpty || best.get._2 < MinPairFreq)
        throw new IllegalStateException(
          s"corpus supports only ${r - 1} BPE merges of frequency >= $MinPairFreq" +
            s" — requested $nMerges")
      val ((a, b), cnt) = best.get
      out += ((r.toLong, a, b, a + b, cnt))
      // rewrite only the words indexed under (a, b); a stale id (word
      // rewritten since) nets to an identity update
      where.remove((a, b)).getOrElse(mutable.Set.empty).toSeq.sorted.foreach { i =>
        subtract(i)
        val s = syms(i)
        val ns = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < s.length) {
          if (j < s.length - 1 && s(j) == a && s(j + 1) == b) { ns += a + b; j += 2 }
          else { ns += s(j); j += 1 }
        }
        syms(i) = ns.toArray
        add(i)
      }
    }
    import spark.implicits._
    Trained(
      out.result().toDF("merge_rank", "lhs", "rhs", "merged", "pair_freq"),
      word.indices.map(i =>
          (word(i), syms(i).map(x => " " + x + ";").mkString, freq(i)))
        .toDF("word", "sym", "freq"))
  }
}
