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
    "q127_tpch_q7" -> 4, // lineitem-orders fact join (2) + final agg + order; both nation dims broadcast
    "q198_enrich_resume" -> 1, // resume anti-join reuses the index partitioning; final order (verdict collected eagerly at build)
    "q201_conversation_resume" -> 2, // prior replay join + group repartition share keys; final order (certificate folds eager at build)
    "q202_simhash_bucket_cap" -> 4, // band window (reused by the self-join) + pair distinct + final order + sig build
    "q203_dedup_first_simhash" -> 3, // guarded band self-join + two size joins + order (rep dedup checkpointed)
    "q204_dedup_first_prefix_join" -> 6, // df counts + prefix agg + candidate join + verify/size joins + order (rep sets checkpointed)
    // cross-split probe + size joins fold into one exchange set (both
    // rep sides checkpointed); +2 deliberate r17 exchanges for the
    // n_dropped_corpus accounting (dropped-clone count agg + its join)
    // — both digest/rep-sized, never raw-corpus-sized
    "q205_dedup_first_probe" -> 3)

  test("PageRank round plans ZERO exchanges against the pre-partitioned edge cache") {
    // the per-round plans are checkpointed away from the final query
    // plan, so pin the round itself: with the edge cache
    // hash-partitioned by dst and the rank table broadcast, the
    // contribution groupBy(dst) must reuse the cached partitioning —
    // no exchange touches edge- or contribution-sized data in a round
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val edges = Tables.load(spark, sf, "lineitem")
      .filter($"l_quantity" >= 45)
      .select($"l_orderkey".as("src"), $"l_partkey".as("dst")).distinct()
    val g = graft.ext.PageRank.prepare(edges)
    try {
      // materialize the edge cache the way round 1 does — steady-state
      // rounds (the ones that repeat ~20×) plan against the FINAL
      // cached plan, whose dst hash-partitioning is then visible to
      // EnsureRequirements
      g.ed.count()
      val r0 = g.vertices.select($"id", lit(graft.ext.PageRank.FixTeleport).as("rank"))
        .localCheckpoint(true)
      val step = graft.ext.PageRank.stepPlan(g, r0, lit(graft.ext.PageRank.FixTeleport),
        "coalesce(m, 0L) DIV 2")
      // count LIVE shuffle exchanges by tree walk: cached subtrees
      // render their historical (already-paid) exchanges in explain
      // text, but an InMemoryTableScan has no children, so a traversal
      // sees only what this round would actually shuffle; broadcast
      // exchanges (the rank and contribution tables) are the intended
      // transport and don't count
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      def live(p: SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => live(a.executedPlan)
        case e: ShuffleExchangeLike => 1 + e.children.map(live).sum
        case o => o.children.map(live).sum
      }
      val n = live(step.queryExecution.executedPlan)
      assert(n == 0,
        s"a PageRank round now plans $n live shuffle exchanges — the dst pre-partitioning is not being reused:\n" +
          step.queryExecution.executedPlan.toString)
    } finally g.unpersistAll()
  }

  budgets.foreach { case (name, budget) =>
    test(s"$name plans at most $budget exchanges") {
      val n = exchanges(name)
      assert(n <= budget,
        s"$name now shuffles $n times (budget $budget) — a new exchange crept in")
    }
  }
}
