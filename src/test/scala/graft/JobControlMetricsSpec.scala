package graft

import graft.enrich._
import graft.model.AiConfig
import graft.pipeline.JobControl
import org.apache.spark.sql.functions._

class JobControlMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("stop cancels a running job group; session stays usable (P6/T6)") {
    val slowDf = spark.range(0, 200000, 1, 8).as[Long].mapPartitions { it =>
      it.map { i => Thread.sleep(1); i }
    }
    val t = new Thread {
      override def run(): Unit = { Thread.sleep(1500); JobControl.stop(spark, "jg-test") }
    }
    t.start()
    val result = JobControl.runCancellable(spark, "jg-test", "slow job") {
      slowDf.count()
    }
    t.join()
    assert(result.isLeft, s"expected cancellation, got $result")
    // session unaffected: next job runs fine
    assert(spark.range(10).count() == 10)
  }

  test("metrics accumulate processed/errors/retries across the enrichment map (A4)") {
    val metrics = new EnrichMetrics(spark)
    val df = (1 to 30).map(i => (i.toLong, s"p$i")).toDF("id", "prompt").repartition(2)
    val flaky = new FlakyEnricher(DeterministicEnricher(), failEvery = 10, transient = false)
    val enriched = EnrichRunner.mapWithResponse(df, "prompt", flaky, AiConfig.test(),
      metrics = Some(metrics))
    enriched.count() // trigger
    assert(metrics.processed.value == 30)
    assert(metrics.errors.value >= 2) // fatal every 10th call per partition instance
    assert(metrics.ratePerMinute(60000) == metrics.processed.value.toDouble)
    assert(metrics.etaSeconds(total = 60, elapsedMs = 60000) > 0.0)
  }

  test("transient failures count retries (A4 + E2)") {
    val metrics = new EnrichMetrics(spark)
    val df = (1 to 4).map(i => (i.toLong, s"p$i")).toDF("id", "prompt").repartition(1)
    // every 2nd call throws a retryable error -> withRetries sleeps+retries
    val flakyTransient = new FlakyEnricher(DeterministicEnricher(), failEvery = 2, transient = true)
    val enriched = EnrichRunner.mapWithResponse(df, "prompt", flakyTransient,
      AiConfig.test().copy(retryAttempts = 3), metrics = Some(metrics))
    val (ok, bad) = EnrichRunner.quarantine(enriched)
    assert(ok.count() + bad.count() == 4)
    assert(metrics.retries.value > 0)
  }
}
