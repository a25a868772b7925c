package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mid-epoch RESUME over a persisted epoch schedule — the loader
  * contract the shard manifest (q193) exists for: a training run
  * preempted at (epoch, shard, pos) validates the shard it is about to
  * re-enter against the manifest and then streams the REMAINDER of the
  * schedule, refusing to emit a single row from a shard that lost,
  * duplicated, swapped or re-ordered a document.
  *
  * Certification re-folds the shard from the schedule side — member
  * count, key range, order-independent XOR checksums of ids and keys
  * (exactly the q193 fold), PLUS dense key-ordered positions (pos ≡
  * row_number over (skey, doc_id), which the XOR fold alone cannot
  * see) — and inner-joins the fold against the loaded manifest on ALL
  * stat columns: a corrupted shard simply produces no certified rows,
  * so the failure mode is "resume refuses", never "resume emits wrong
  * data".
  *
  * Scale shape: everything is bounded by the ONE shard being resumed
  * (the fold is a single aggregation over shard-sized input, the rank
  * window partitions by (epoch, shard), the certificate is a one-row
  * broadcast); the manifest side is (epochs × shards) rows. Nothing
  * corpus-sized moves.
  */
object EpochResume {

  /** The per-(epoch, shard) fold of a positioned schedule frame
    * (epoch, shard, pos, doc_id, skey) — q193's manifest stats plus
    * the position-disorder count. */
  private def fold(schedule: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("skey"), col("doc_id"))
    schedule
      .withColumn("rpos", row_number().over(w).cast("long"))
      .groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("skey")).as("min_skey"), max(col("skey")).as("max_skey"),
        expr("bit_xor(doc_id)").as("xor_doc"),
        expr("bit_xor(skey)").as("xor_skey"),
        sum(when(col("pos") === col("rpos"), 0L).otherwise(1L)).as("n_disorder"))
  }

  /** Certificates for every (epoch, shard) of `schedule` that matches
    * its `manifest` row exactly: (epoch, shard, n_docs). A shard whose
    * fold disagrees with the manifest on ANY stat — or whose stored
    * positions are not the dense key order — has no certificate. */
  def certificates(schedule: DataFrame, manifest: DataFrame): DataFrame =
    fold(schedule)
      .filter(col("n_disorder") === 0L).drop("n_disorder")
      .join(manifest.select(col("epoch"), col("shard"), col("n_docs"),
          col("min_skey"), col("max_skey"), col("xor_doc"), col("xor_skey")),
        Seq("epoch", "shard", "n_docs", "min_skey", "max_skey",
          "xor_doc", "xor_skey"))
      .select(col("epoch"), col("shard"), col("n_docs"))

  /** Emit the remainder of (epoch, shard) past `ckptPos` — positions
    * strictly greater, i.e. the checkpointed position was the last one
    * consumed — from a positioned schedule, gated on certification.
    * `ckptPos = None` resumes from the shard midpoint (n_docs DIV 2),
    * a size-relative default that stays meaningful at any corpus
    * scale. Output: (epoch, shard, ckpt_pos, pos, doc_id, skey);
    * EMPTY if the shard fails certification. */
  def resume(schedule: DataFrame, manifest: DataFrame,
      epoch: Int, shard: Long, ckptPos: Option[Long] = None): DataFrame = {
    val sh = schedule.filter(col("epoch") === epoch && col("shard") === shard)
    val cert = certificates(sh, manifest)
      .select(col("epoch"), col("shard"),
        ckptPos.map(lit(_)).getOrElse(expr("n_docs DIV 2")).as("ckpt_pos"))
    sh.join(broadcast(cert), Seq("epoch", "shard"))
      .filter(col("pos") > col("ckpt_pos"))
      .select(col("epoch"), col("shard"), col("ckpt_pos"), col("pos"),
        col("doc_id"), col("skey"))
  }
}
