package graft

import org.apache.spark.sql.execution.ExplainMode

/** Pins the SHUFFLE COUNT of scale-critical plans. [[PlanAudit]] catches
  * bad shapes (SinglePartition/cartesian/BNLJ); this catches the other
  * scale regression — an accidental EXTRA exchange (a lost broadcast
  * hint, a repartition sneaking above a join, a reused subtree
  * duplicated) that keeps the plan "clean" but doubles wire traffic at
  * 100 TB. Budgets are the counts of the reviewed, intended plans;
  * loosening one should be a deliberate diff, not drift. */
class ShuffleBudgetSpec extends SparkSpec {

  private def exchanges(name: String): Int = {
    val p = SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // each physical Exchange node renders as "(n) Exchange"; reused
    // subtrees render as ReusedExchange and do not re-shuffle
    p.linesIterator.count(l => l.trim.matches("\\(\\d+\\) Exchange.*"))
  }

  private val budgets = Map(
    "q01_agg" -> 2, // partial+final agg + the deterministic final sort
    "q03_broadcast_join" -> 2, // dims broadcast; agg + final sort
    "q18_exact_dedup" -> 2, // digest groupBy + order
    "q34_corpus_clean" -> 8, // gate→dedup→LSH chain
    "q48_tfidf" -> 5, // tf + df + join + topk
    "q67_token_shards" -> 3, // prefix-sum range partition + order
    "q88_grouped_topk" -> 2, // partial topk + final + order
    "q96_drift" -> 4, // two histograms + outer join + order
    "q97_pack_bins" -> 3, // rank range partition + bin agg + order
    "q99_chunk_overlap" -> 1, // chunking is shuffle-free; final order only
    "q100_retrieval_prep" -> 2, // sig window + final order
    "q101_stratified_k" -> 2, // stratum window + final order
    "q102_triangles" -> 7, // wedge join + closing join + node agg + order (edges/oriented checkpointed)
    "q103_audio" -> 1, // codec chain is shuffle-free; range partition only
    "q104_collocations" -> 4, // bigram agg + two count joins + topk order (unigrams checkpointed)
    "q105_kcore" -> 2, // final-core degree agg + order (peel rounds checkpoint per round)
    "q106_temperature_mix" -> 3, // kept-count agg + audit join + order (rates checkpointed)
    "q109_gap_fill" -> 2, // span agg reuses the user partitioning; windows + order share it
    "q112_tpch_q3" -> 1, // dims broadcast; revenue agg; top-10 is TakeOrdered, not a sort exchange
    "q113_tpch_q5" -> 2, // order-customer fact join + final agg; all dims broadcast
    "q126_skyline" -> 3, // per-cost agg + range partition + final order (prefix max is scan-local)
    "q127_tpch_q7" -> 4) // lineitem-orders fact join (2) + final agg + order; both nation dims broadcast

  budgets.foreach { case (name, budget) =>
    test(s"$name plans at most $budget exchanges") {
      val n = exchanges(name)
      assert(n <= budget,
        s"$name now shuffles $n times (budget $budget) — a new exchange crept in")
    }
  }
}
