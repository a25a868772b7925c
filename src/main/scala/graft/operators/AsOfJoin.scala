package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (point-in-time lookup) — an operator Spark lacks natively,
  * composed from built-ins per the preference order (SURVEY.md §7.3a):
  * for each left row, the right row with the greatest time ≤ the left
  * time within the same key.
  *
  * Implementation: tag + union + ordered window carry-forward. Both
  * sides shuffle ONCE on the key; within each key-partition a single
  * sort orders (time, side) and `last(_, ignoreNulls)` carries the most
  * recent right-side payload into each left row. At 100 TB this is
  * strictly cheaper than the naive range-join (which explodes) and
  * equals one sort-merge pass; skewed keys fall to AQE. Right-side ties
  * at the same time resolve to the largest `rightOrderCol` value
  * (deterministic), matching DuckDB's ASOF JOIN (the oracle).
  */
object AsOfJoin {

  /** Left rows gain `asofPrefix`-ed right payload columns (null when no
    * right row precedes). `timeCol` must be a numeric (e.g. unix_micros)
    * column name present on both sides; `rightOrderCol` breaks right-
    * side time ties. */
  def asofLeft(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      rightPayloadCols: Seq[String],
      rightOrderCol: String,
      asofPrefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
    // right side: only key, time, order, payload travel through the union
    val rPayload = rightPayloadCols.map(c => col(c).as(s"__p_$c"))
    val r = right.select(Seq(col(keyCol), col(timeCol), col(rightOrderCol).as("__rord")) ++ rPayload: _*)
      .withColumn("__side", lit(0))
    val unioned = l
      .withColumn("__rord", lit(null).cast(r.schema("__rord").dataType))
      .select((l.columns.filterNot(_ == "__side").map(col) :+ col("__rord")) ++
        rightPayloadCols.map(c => lit(null).cast(r.schema(s"__p_$c").dataType).as(s"__p_$c")) :+
        col("__side"): _*)
      .unionByName(
        r.select(Seq(col(keyCol), col(timeCol), col("__rord"), col("__side")) ++
          rightPayloadCols.map(c => col(s"__p_$c")): _*),
        allowMissingColumns = true)
    // order: time asc, right rows (side 0) before left rows at equal time
    // (so a right row AT the left timestamp is visible), right ties by __rord.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"), col("__rord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayloadCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"$asofPrefix$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightPayloadCols.map(c => col(s"$asofPrefix$c")): _*)
  }
}
