package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** The composed training-data cleanup pipeline (north star capstone):
  *
  *   quality gate → exact dedup → MinHash near-dup removal
  *
  * exactly the shape a 100 TB pretraining-corpus pass takes:
  *   1. cheap row-local filters first (token bounds, quality score) —
  *      pure codegen'd projections, cut volume before anything shuffles;
  *   2. exact dedup on a 16-byte content hash — one shuffle of digests;
  *   3. MinHash-LSH near-dup removal among survivors — signatures only,
  *      the raw text never joins.
  * Stage order is part of the contract (dedup among quality survivors,
  * near-dup among exact-dedup survivors) and is mirrored stage-for-
  * stage in the q34 oracle SQL.
  */
object CorpusPipeline {

  final case class Params(
      minTokens: Long = 5L,
      maxTokens: Long = 1000L,
      minQuality: Double = 0.3,
      nearDupEstSim: Double = 0.5)

  /** Returns the kept documents with their stats: doc_id, n_tokens,
    * quality. Of a near-dup pair, the lower id survives. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      params: Params = Params()): DataFrame = {
    val id = col(idCol)
    // 1. row-local gates
    val gated = docs.select(id, col(textCol).as("__text"),
        tokenCount(col(textCol)).as("n_tokens"),
        qualityScore(col(textCol)).as("quality"))
      .filter(col("n_tokens") >= params.minTokens &&
        col("n_tokens") <= params.maxTokens &&
        col("quality") >= params.minQuality)
    // 2. exact dedup among survivors (min id per normalized content)
    val keepIds = gated
      .select(contentHash(col("__text")).as("h"), id)
      .groupBy("h").agg(min(id).as(idCol))
      .select(idCol)
    // exactKept feeds THREE consumers (minhash signatures, the loser
    // pair join, the final anti-join): without materialization the whole
    // gate+dedup prefix re-executes once per consumer. Plan-level persist
    // keeps the columnar cache + codegen (a localCheckpoint's raw-row
    // blocks lose both, measured ~1.5x slower); the CacheManager entry
    // outlives the plan — long-lived callers should clear it (see
    // [[CurationPipeline.curate]]'s materialize parameter for the
    // per-call strategy knob). The cached set is the post-gate
    // post-dedup survivor slice — the smallest table in the pipeline.
    val exactKept = gated.join(keepIds, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 3. near-dup removal among exact survivors: drop the higher id of
    //    every MinHash pair at est_sim ≥ threshold
    val nearDupLosers = MinHashLsh.nearDupPairs(
        exactKept.select(id, col("__text").as(textCol)), idCol, textCol,
        minEstSim = params.nearDupEstSim)
      .select(col("id_b").as(idCol)).distinct()
    exactKept.join(nearDupLosers, Seq(idCol), "left_anti")
      .select(id, col("n_tokens"), col("quality"))
  }
}
