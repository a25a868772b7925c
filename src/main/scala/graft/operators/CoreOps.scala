package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core column/row operators re-expressing the reference's row loops as
  * Catalyst-visible transforms (SURVEY.md §2.2, §2.5, §2.7, §7.1 ops/).
  *
  * Everything here stays in `Column` space so predicate pushdown, column
  * pruning and whole-stage codegen see through it — at 100 TB these ops
  * cost nothing beyond the expressions themselves (no shuffle, no opaque
  * lambda except the explicitly-documented file-order indexer).
  */
object CoreOps {

  /** F1 (`/root/reference/main.py:372-377`): expand `{col}` placeholders.
    *
    * Semantics pinned to the reference: every *existing* column's
    * `{name}` is replaced with its stringified value; present-but-null
    * values render as `"None"` (Python `str(None)`); placeholders naming
    * no column survive verbatim; no escaping. Implemented as a fold of
    * codegen'd `replace` expressions — Catalyst constant-folds the
    * literals and the whole chain stays in one codegen stage.
    */
  def expandTemplate(template: String, columns: Seq[String]): Column = {
    val referenced = "\\{(\\w+)\\}".r.findAllMatchIn(template).map(_.group(1)).toSet
    columns.filter(referenced.contains).foldLeft(lit(template)) { (e, c) =>
      replace(e, lit(s"{$c}"), coalesce(col(c).cast("string"), lit("None")))
    }
  }

  /** F2 (`main.py:363`): group key = `str(row.get(k, default))`.
    * Column present: nulls stringify to `"None"` (Python `str(None)`);
    * column absent from the schema: constant `"unknown"`. */
  def groupKey(df: DataFrame, keyCol: Option[String]): Column = keyCol match {
    case Some(k) if df.columns.contains(k) =>
      coalesce(col(k).cast("string"), lit("None"))
    case Some(_) => lit("unknown")
    case None => lit("unknown")
  }

  /** F3 (`main.py:806-809`): filename sanitization — keep alnum, space,
    * `-`, `_`; trim; empty → "unknown". */
  def sanitizeName(c: Column): Column = {
    val cleaned = trim(regexp_replace(c, "[^A-Za-z0-9 _-]", ""))
    when(cleaned.isNull || cleaned === "", lit("unknown")).otherwise(cleaned)
  }

  /** P1 (`main.py:139-147`): drop rows where every cell is blank after
    * trim (string-typed ingest tables). */
  def dropBlankRows(df: DataFrame): DataFrame = {
    val anyNonBlank = df.columns
      .map(c => trim(coalesce(col(c).cast("string"), lit(""))) =!= "")
      .reduce(_ || _)
    df.filter(anyNonBlank)
  }

  /** P3: trim every string cell (TXT ingest semantics, main.py:256,271). */
  def trimAll(df: DataFrame): DataFrame =
    df.columns.foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType.typeName == "string") d.withColumn(c, trim(col(c))) else d
    }

  /** W1, deterministic flavor: 0-based row index (reference `_row_index`
    * semantics, main.py:366-369) from a total ordering on explicit key
    * columns. Scalable: a global-window `row_number` would funnel every
    * row through ONE partition (Spark warns "No Partition Defined"), so
    * instead range-repartition on the order keys (partition i holds keys
    * below partition i+1), sort within partitions, and add per-partition
    * offsets via the zipWithIndex pass — the distributed dense-rank
    * recipe. The range shuffle is reused by zipWithIndex's count job, so
    * the data moves once. Keys must be tie-free for a deterministic
    * result (same contract as the window version). */
  def withRowIndexByOrder(df: DataFrame, name: String, orderCols: Column*): DataFrame =
    org.apache.spark.sql.GraftShim.zipWithRowIndex(
      df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*), name)

  /** Scalable global running sum: the inclusive prefix sum of
    * `valueCol` under a total ordering on `orderCols` — what
    * `sum(...) over (order by ...)` computes, WITHOUT the unpartitioned
    * window's single-partition funnel. Same range-partition + offset
    * recipe as [[withRowIndexByOrder]] ([[org.apache.spark.sql.GraftShim.zipWithPrefixSum]]).
    * Order keys must be tie-free for a deterministic result. */
  def withRunningSumByOrder(
      df: DataFrame, valueCol: String, name: String, orderCols: Column*): DataFrame =
    org.apache.spark.sql.GraftShim.zipWithPrefixSum(
      df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*), valueCol, name)

  /** W1, file-order flavor (`main.py:362,366-369`): index rows by their
    * physical input order. Uses `zipWithIndex` (one extra count job to
    * offset partitions — O(#partitions) driver work, rows never
    * collected). This is the only RDD boundary in the core engine; it
    * exists because Spark has no "input file order" column and the
    * reference's export contract sorts by it (main.py:696-697).
    */
  def withFileOrderIndex(df: DataFrame, name: String = "row_index"): DataFrame =
    org.apache.spark.sql.GraftShim.zipWithRowIndex(df, name)

  /** W2 (`main.py:696-697`): restore original order before export —
    * a range-partitioned total sort on the index column. */
  def restoreOrder(df: DataFrame, indexCol: String = "row_index"): DataFrame =
    df.orderBy(col(indexCol))

  /** E6 + S6 column layout (`main.py:713-733`): group, main_content,
    * original columns (sorted), [prompt], response, [timestamp],
    * row_index last for order restore. */
  def assembleResult(
      df: DataFrame,
      mainContent: String,
      originalCols: Seq[String],
      includePrompt: Boolean,
      includeTimestamp: Boolean): DataFrame = {
    val sys = Set("group", "main_content", "prompt", "response", "timestamp", "row_index")
    val orig = originalCols.filterNot(sys.contains).sorted.map(col)
    val head = Seq(col("group"), coalesce(col(mainContent).cast("string"), lit("")).as("main_content"))
    val tail = (if (includePrompt) Seq(col("prompt")) else Nil) ++
      Seq(col("response")) ++
      (if (includeTimestamp) Seq(date_format(current_timestamp(),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("timestamp")) else Nil) ++
      Seq(col("row_index"))
    df.select(head ++ orig ++ tail: _*)
  }
}
