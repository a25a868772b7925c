package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.enrich.{EnrichRunner, Enricher}
import graft.model.PipelineConfig
import graft.operators.CoreOps

/** The reference's EP2 end-to-end run (`/root/reference/main.py:308-357`,
  * SURVEY.md §3) as one declarative Spark plan:
  *
  *   read → index → group-key → template → enrich (grouped fold |
  *   parallel map) → assemble → restore order
  *
  * Only the enrich step is opaque (mapPartitions); everything else is
  * Column space, so Catalyst prunes/pushes through the whole pipeline.
  * Grouped mode shuffles once on the group key; ungrouped mode has no
  * shuffle until the final order-restoring sort.
  */
object BatchPipeline {

  /** Returns (results, quarantine). Results are assembled and sorted by
    * `row_index` (W2, main.py:696-697); quarantine holds failed rows —
    * an auditability improvement over the reference's silent drop
    * (main.py:487-502). `orderCols`: explicit total order defining
    * row_index deterministically; empty → physical file order
    * (reference semantics, at the cost of a zipWithIndex pass). */
  def run(
      df: DataFrame,
      cfg: PipelineConfig,
      enricher: Enricher,
      orderCols: Seq[Column] = Nil,
      metrics: Option[graft.enrich.EnrichMetrics] = None): (DataFrame, DataFrame) = {
    cfg.validateAgainst(df.columns.toSeq)
    cfg.prompt.validated
    val ai = cfg.ai.validated // V1/V2/V5 + the [1,60] rate clamp
    // the deterministic test service needs no throttle; real services do
    val throttle = if (ai.service == "test") None else Some(ai.rateLimit)
    val originalCols = df.columns.toSeq

    val indexed =
      if (orderCols.nonEmpty) CoreOps.withRowIndexByOrder(df, "row_index", orderCols: _*)
      else CoreOps.withFileOrderIndex(df, "row_index")

    // A2 (main.py:324): ungrouped rows each form their own group "row_{i}"
    // (0-based); grouped rows use F2 key semantics.
    val keyed = cfg.mapping.groupBy match {
      case Some(_) => indexed.withColumn("group", CoreOps.groupKey(indexed, cfg.mapping.groupBy))
      case None => indexed.withColumn("group",
        concat(lit("row_"), col("row_index").cast("string")))
    }
    val templated = keyed.withColumn("prompt",
      CoreOps.expandTemplate(cfg.prompt.template, originalCols))

    val enriched = cfg.mapping.groupBy match {
      case Some(_) =>
        EnrichRunner.runConversations(templated, "group", Seq("row_index"), "prompt",
          enricher, ai, cfg.prompt.systemPrompt, rateLimitPerMinute = throttle,
          metrics = metrics)
          .withColumn("error", when(col("response").isNull, lit("enrichment failed")))
      case None =>
        EnrichRunner.mapWithResponse(templated, "prompt", enricher, ai,
          rateLimitPerMinute = throttle, metrics = metrics)
    }
    // both outputs derive from the enrichment; without a cache,
    // evaluating results AND quarantine re-runs every external call
    // (and a nondeterministic enricher would emit different responses)
    val enrichedOnce = enriched.cache()
    val (ok, bad) = EnrichRunner.quarantine(enrichedOnce)
    val assembled = CoreOps.assembleResult(ok, cfg.mapping.mainContent, originalCols,
      cfg.output.includePrompt, cfg.output.includeTimestamp)
    (CoreOps.restoreOrder(assembled), bad)
  }
}
