package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity local recoding over release-metadata quasi-identifiers
  * (Sweeney 2002) — the privacy gate a published training-data
  * manifest passes before per-document metadata ships: a rare
  * (lang, source, length) combination pinpoints a document even with
  * the text withheld. Each document publishes the finest prefix of
  * the generalization ladder
  *   L0 (lang, source, len_bucket) → L1 (lang, source) →
  *   L2 (lang) → L3 (fully suppressed)
  * whose marginal count in the FROZEN reference corpus is ≥ k. The
  * anonymity set of a published pattern is every corpus document
  * matching it on the retained attributes — exactly the marginal
  * count (`class_n` certifies it; a withheld attribute matches
  * anything), so every published row is k-anonymous by construction
  * and `class_n = 0` marks the suppressed class.
  *
  * ONE recipe serves batch and stream: the marginal tables are
  * bounded by attribute cardinality (langs × sources × buckets), so
  * they broadcast, and [[publish]] is three broadcast LEFT equi-joins
  * plus a row-local level decision — a corpus pass never shuffles in
  * batch, and the same plan runs stateless stream-static in
  * [[graft.streaming.Streaming.kAnonServeStream]] (an arrival whose
  * combination the frozen corpus never saw has anonymity set 0 at
  * that level — the left join's NULL → 0 is the correct verdict,
  * not a missing row).
  */
object KAnon {

  /** Minimum anonymity-set size a published pattern must certify. */
  val K = 5

  /** Width of the document-length quasi-identifier bucket (chars). */
  val BucketChars = 500L

  /** Project the quasi-identifier tuple (doc_id, lang, source,
    * len_bucket) from raw document rows. Row-local. */
  def quasi(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("source"),
      expr(s"CAST(n_chars AS BIGINT) DIV $BucketChars").as("len_bucket"))

  /** The frozen release policy: the three marginal-count tables of
    * the reference corpus, finest to coarsest. Bounded by attribute
    * cardinality — these are the broadcast-sized artifact a serving
    * deployment trains offline. */
  def marginals(q: DataFrame): (DataFrame, DataFrame, DataFrame) = (
    q.groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("n0")),
    q.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n1")),
    q.groupBy(col("lang")).agg(count(lit(1)).as("n2")))

  /** Publish each quasi-identifier row at its finest k-safe ladder
    * level against the given (frozen) marginals: (doc_id, g_lang,
    * g_source, g_len, level, class_n). Left joins: combinations the
    * marginals never saw count 0 and fall through the ladder. */
  def publish(q: DataFrame, c0: DataFrame, c1: DataFrame, c2: DataFrame)
      : DataFrame =
    q.join(broadcast(c0), Seq("lang", "source", "len_bucket"), "left")
      .join(broadcast(c1), Seq("lang", "source"), "left")
      .join(broadcast(c2), Seq("lang"), "left")
      .withColumn("n0", coalesce(col("n0"), lit(0L)))
      .withColumn("n1", coalesce(col("n1"), lit(0L)))
      .withColumn("n2", coalesce(col("n2"), lit(0L)))
      .withColumn("level",
        when(col("n0") >= K, 0).when(col("n1") >= K, 1)
          .when(col("n2") >= K, 2).otherwise(3).cast("int"))
      .select(col("doc_id"),
        when(col("level") <= 2, col("lang")).otherwise(lit("*")).as("g_lang"),
        when(col("level") <= 1, col("source")).otherwise(lit("*")).as("g_source"),
        when(col("level") === 0, col("len_bucket").cast("string"))
          .otherwise(lit("*")).as("g_len"),
        col("level"),
        when(col("level") === 0, col("n0")).when(col("level") === 1, col("n1"))
          .when(col("level") === 2, col("n2")).otherwise(lit(0L)).as("class_n"))
}
