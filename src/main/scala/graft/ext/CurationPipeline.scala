package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{qualityScore, tokenCount}

/** The full training-corpus curation pass, composed from the library's
  * operators in production order — each stage cuts volume before the
  * next (more expensive) one runs, so at 100 TB the heavy similarity
  * stages see only the cheap-filtered survivor slice:
  *
  *   1. quality gate        — row-local, pure codegen projections
  *   2. repetition gate     — two (doc, gram) aggregations
  *   3. decontamination     — broadcast semi join vs the eval set
  *   4. exact dedup         — one shuffle of 16-byte digests
  *   5. near-dup removal    — MinHash-LSH on signatures
  *   6. corpus mixing       — stratified hash sampling, no shuffle
  *   7. token sharding      — scalable prefix sum
  *
  * [[CorpusPipeline]] is the gate→dedup→near-dup core (oracle-verified
  * as q34); this composition adds the curation stages around it and
  * produces the shard layout a trainer consumes. Stage order is the
  * standard corpus-cleanup recipe (quality/repetition gates before
  * dedup: they are cheapest; decontamination before dedup so an
  * eval-contaminated "original" cannot crowd out a clean duplicate).
  */
object CurationPipeline {

  final case class Params(
      minTokens: Long = 5L,
      maxTokens: Long = 1000L,
      minQuality: Double = 0.3,
      decontaminateNgram: Int = 24,
      nearDupEstSim: Double = 0.5,
      mixRatesBp: Map[String, Int] = Map.empty,
      shardCapacityTokens: Long = 2000L)

  /** docs(idCol, textCol, strataCol) + benchmark(textCol) →
    * (id, stratum, n_tokens, quality, cum_tokens, shard_id) of the
    * curated corpus, shard-ordered.
    *
    * `materialize` is applied to the two multiply-consumed survivor
    * slices. The default — plan-level persist — keeps the columnar
    * cache + codegen (measured ~2x faster here than a localCheckpoint,
    * whose raw-row blocks break both), but CacheManager entries outlive
    * the returned plan: a long-lived service calling curate() per batch
    * should pass `_.localCheckpoint(eager = false)` (blocks reclaimed
    * with the plan) or persist-track-unpersist itself. */
  def curate(
      docs: DataFrame, idCol: String, textCol: String, strataCol: String,
      benchmark: DataFrame, params: Params = Params(),
      materialize: DataFrame => DataFrame =
        _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)): DataFrame = {
    val id = col(idCol)
    // 1-2: row-local gates first (cheapest, biggest volume cut)
    val gated = docs
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .filter(col("n_tokens").between(params.minTokens, params.maxTokens) &&
        col("quality") >= params.minQuality)
    // row-local kernel: the repetition gate is a pure filter, no
    // (doc, gram) shuffles and no join
    val unrepeated = gated.filter(Repetition.keepsRepetitionGate(col(textCol)))
    // 3: eval-set overlap gate. Materialized: both the dedup digest
    // aggregation and the digest join re-read it, and everything above
    // (two gate joins + the decontamination semi join) would otherwise
    // re-execute per consumer.
    val clean = materialize(Dedup.decontaminate(unrepeated, idCol, textCol, benchmark,
      n = params.decontaminateNgram))
    // 4: exact dedup (keep min id per content digest)
    val keepIds = clean
      .select(graft.functions.TextFunctions.contentHash(col(textCol)).as("h"), id)
      .groupBy("h").agg(min(id).as(idCol)).select(idCol)
    val exactKept = materialize(clean.join(keepIds, Seq(idCol)))
    // 5: near-dup removal among survivors (lower id wins)
    val losers = MinHashLsh.nearDupPairs(
        exactKept.select(id, col(textCol)), idCol, textCol,
        minEstSim = params.nearDupEstSim)
      .select(col("id_b").as(idCol)).distinct()
    val nearKept = exactKept.join(losers, Seq(idCol), "left_anti")
    // 6: mixture control
    val mixed =
      if (params.mixRatesBp.isEmpty) nearKept
      else Mixing.stratifiedSample(nearKept, idCol, strataCol, params.mixRatesBp)
    // 7: shard layout — strata/quality ride through the prefix-sum
    // append, no join-back
    Packing.tokenShards(
        mixed.select(id, col(strataCol), col("n_tokens"), col("quality")),
        idCol, "n_tokens", params.shardCapacityTokens)
      .select(id, col(strataCol), col("n_tokens"), col("quality"),
        col("cum_tokens"), col("shard_id"))
  }
}
