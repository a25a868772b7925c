package graft.operators

import org.apache.spark.sql.{DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the runtime-filter pattern for joins
  * where the dimension side is too large to broadcast as a hash
  * relation but its KEY SET fits a few megabytes of bloom bits.
  *
  * The fact side is filtered by `mightContain` BEFORE its shuffle, so
  * only rows that can possibly match pay shuffle I/O; the exact semi
  * join afterwards removes the bloom's false positives, so the result
  * is EXACTLY the plain semi join (the oracle for q63 is the plain
  * `IN` subquery). At 100 TB this is the difference between shuffling
  * the whole fact table and shuffling the ~matching fraction: a 1%
  * selective dimension with fpp=0.01 cuts shuffled fact bytes ~50x.
  *
  * Spark's own AQE runtime bloom filter (`spark.sql.optimizer.runtime.
  * bloomFilter.enabled`) does this automatically for some shapes; this
  * operator makes the pattern explicit and usable when the dimension is
  * a computed DataFrame the optimizer won't infer creation from.
  *
  * Reference scope: the reference engine joins nothing (single-table
  * pipeline, `/root/reference/main.py` EP2); joins are part of this
  * engine's extension surface (SURVEY §2.3).
  */
object BloomPrune {

  /** `fact` rows whose `factKey` appears in `dim.dimKey` — the result
    * equals `fact LEFT SEMI JOIN dim`, computed as bloom-prune → exact
    * semi join. Null fact keys never match (semi-join semantics).
    *
    * Building the bloom is one aggregation over `dim` (an eager action,
    * like any runtime filter); size it with `expectedItems` ≥ the true
    * distinct key count or the fpp guarantee degrades.
    */
  def bloomSemiJoin(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // BloomFilterMightContain requires a BIGINT probe; a non-bigint key
    // would get a silent cast (matching nothing, or throwing under ANSI)
    // — reject it up front with a clear error instead
    for ((df, k, side) <- Seq((fact, factKey, "fact"), (dim, dimKey, "dim")))
      require(df.schema(k).dataType == org.apache.spark.sql.types.LongType,
        s"bloomSemiJoin requires BIGINT keys; $side key '$k' is " +
          df.schema(k).dataType.sql)
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    // probe through Catalyst's own BloomFilterMightContain (the expression
    // InjectRuntimeFilter plants): codegen'd, null-safe (null key → null →
    // filtered), and the serialized bloom ships as a foldable literal
    // exactly like the optimizer's scalar-subquery result would
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val probe = GraftShim.column(BloomFilterMightContain(
      Literal(bytes, BinaryType), GraftShim.expression(col(factKey))))
    fact.filter(probe)
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
  }
}
