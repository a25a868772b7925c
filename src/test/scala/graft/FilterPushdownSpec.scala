package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.enrich._
import graft.model.AiConfig
import graft.plans.GraftPlans
import org.apache.spark.sql.functions._

/** Counts actual enrich() invocations across tasks (JVM-static —
  * works in local mode where tasks share the process). */
object CallCounter {
  val calls = new AtomicInteger(0)
}
class CountingEnricher extends Enricher {
  def enrich(ms: Seq[Message], c: AiConfig): String = {
    CallCounter.calls.incrementAndGet(); "ok:" + ms.last.content
  }
}

class FilterPushdownSpec extends SparkSpec {
  import spark.implicits._

  test("filter on pass-through columns is pushed below the enrichment map") {
    GraftPlans.install(spark)
    val df = (1L to 100L).map(i => (i, s"p$i")).toDF("id", "prompt")
    CallCounter.calls.set(0)
    val out = EnrichRunner.mapWithResponse(df, "prompt", new CountingEnricher, AiConfig.test())
      .filter($"id" <= 10) // written AFTER enrichment
      .collect()
    assert(out.length == 10)
    // without pushdown all 100 rows would be enriched; with it, 10
    assert(CallCounter.calls.get() == 10,
      s"filter not pushed: ${CallCounter.calls.get()} enrichment calls for 10 kept rows")
    // and the optimized plan shows the Filter under the map barrier
    val optimized = EnrichRunner.mapWithResponse(df, "prompt", new CountingEnricher, AiConfig.test())
      .filter($"id" <= 10).queryExecution.optimizedPlan.toString
    assert(optimized.indexOf("Filter") > optimized.indexOf("MapPartitions"),
      s"Filter not below MapPartitions in:\n$optimized")
  }

  test("filter on the ENRICHED column is NOT pushed (correctness guard)") {
    GraftPlans.install(spark)
    val df = (1L to 20L).map(i => (i, s"p$i")).toDF("id", "prompt")
    CallCounter.calls.set(0)
    val out = EnrichRunner.mapWithResponse(df, "prompt", new CountingEnricher, AiConfig.test())
      .filter($"response".contains("p1")) // references an appended column
      .collect()
    // p1 and p10..p19 → 11 rows; ALL 20 must have been enriched
    assert(out.length == 11)
    assert(CallCounter.calls.get() == 20,
      s"predicate on appended column must not push: ${CallCounter.calls.get()}")
  }
}
