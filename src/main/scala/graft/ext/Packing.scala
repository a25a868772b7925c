package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.CoreOps

/** Token-budget sharding — the batch-construction step of a training
  * pipeline: documents are laid out in a deterministic order and cut
  * into contiguous shards of ~`capacity` tokens each (a shard is the
  * unit a downstream packer/tokenizer consumes; documents never split
  * across shards — each doc lands in the shard where it STARTS).
  *
  * The running token total uses the scalable prefix-sum recipe
  * ([[CoreOps.withRunningSumByOrder]]) — an unpartitioned
  * `sum over (order by id)` window would pull the whole corpus through
  * one partition. Shard assignment is then a pure projection:
  * `shard_id = (cum - n) div capacity`, exact integer arithmetic at any
  * corpus size (no doubles — 100 TB of tokens overflows 2^53).
  */
object Packing {

  /** All input columns + (cum_tokens, shard_id), ordered by `idCol` —
    * the prefix-sum shim appends to the full row, so carrying the other
    * columns through is free (no join-back needed by callers).
    * `nTokensCol` must be BIGINT and non-negative. */
  def tokenShards(
      df: DataFrame, idCol: String, nTokensCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    CoreOps.withRunningSumByOrder(df, nTokensCol, "cum_tokens", col(idCol))
      // `div`, not `/`: long division stays exact past 2^53 where a
      // double quotient would round
      .withColumn("shard_id", expr(s"(cum_tokens - `$nTokensCol`) div $capacity"))
  }
}
