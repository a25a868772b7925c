package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed heavy hitters: per-partition Misra-Gries sketches
  * produce a guaranteed-superset candidate set, then one exact recount
  * of just the candidates. At 100 TB this replaces a full groupBy over
  * the token universe (shuffle proportional to DISTINCT tokens) with a
  * map-side sketch (k counters per partition, no shuffle) plus an
  * aggregation restricted to ≤ k·partitions candidate keys.
  *
  * Superset guarantee (why the final output is exact and deterministic
  * even though sketch contents depend on partitioning): if an item has
  * global count > N/k, then in at least one partition p its local count
  * exceeds N_p/k (otherwise summing the per-partition bounds gives
  * count ≤ N/k, a contradiction), and a Misra-Gries summary of k−1
  * counters retains every item whose local count exceeds N_p/k (each
  * decrement step removes one unit from k counter slots at once, so at
  * most N_p/k decrements ever hit any one item). So the union of
  * per-partition sketch keys contains every true heavy hitter; the
  * exact recount then removes false candidates. The emitted rows
  * therefore equal the plain `GROUP BY HAVING count·k > N` — which is
  * exactly the oracle.
  */
object HeavyHitters {

  /** Misra-Gries over one partition's token stream: at most k−1 keys
    * survive (the classic sketch size); every token with local count >
    * (partition size)/k is among them. */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      counters.get(t) match {
        case Some(c) => counters.update(t, c + 1)
        case None if counters.size < k - 1 => counters.update(t, 1L)
        case None =>
          // decrement-all step: one unit off every counter (and the
          // incoming item's implicit counter), dropping zeros
          val dead = counters.collect { case (key, 1L) => key }
          counters.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  /** Candidate keys: union of per-partition Misra-Gries survivors. */
  def candidates(tokens: Dataset[String], k: Int): DataFrame = {
    import tokens.sparkSession.implicits._
    tokens.mapPartitions(it => misraGries(it, k)).toDF("token").distinct()
  }

  /** Exact heavy hitters of the `token` column of `tokens` (one row per
    * occurrence): all tokens with count·k > N, with their exact counts
    * and N. Composes lazily — no driver-side action. */
  def exactHeavy(tokens: DataFrame, k: Int): DataFrame = {
    import tokens.sparkSession.implicits._
    // the exploded token scan feeds candidates, the total, AND the
    // recount — checkpoint it so the explode runs once, not three times
    val toks = tokens.localCheckpoint(false)
    val cand = candidates(toks.select(col("token").as[String]), k)
    val total = toks.agg(count(lit(1)).as("total"))
    toks.join(broadcast(cand), Seq("token"), "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("total"))
  }
}
