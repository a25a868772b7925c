package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) snapshot builder — turns an
  * append-only change log into a versioned dimension with effective
  * ranges, the standard "current + history view" primitive of a
  * large-scale warehouse (CDC ingest, upsert compaction's historical
  * twin; `operators/SkewedAgg`-style latest-per-key is the degenerate
  * is_current slice of this).
  *
  * The reference engine re-processes whole files per run
  * (`/root/reference/main.py:106-111` holds one table in RAM); an SCD2
  * build is how the same "reprocess" becomes incremental at 100 TB:
  * every window here is partitioned by the dimension key, so the build
  * is one shuffle on the key — no global sort, no driver state. Run
  * collapse (dropping rows whose tracked attributes are unchanged)
  * happens BEFORE versioning, so version numbers are dense per key.
  */
object Scd {

  /** Build the SCD2 table.
    *
    * @param df       change log (one row per observed state)
    * @param keyCol   dimension key (windows partition on it)
    * @param orderCol monotonically comparable change ordinal (e.g. epoch
    *                 millis); pair it with `tieCol` for a total order
    * @param tieCol   unique tie-breaker within a key (e.g. the log's id)
    * @param tracked  attribute columns whose changes open a new version;
    *                 consecutive rows with identical tracked values
    *                 collapse into one version row
    *
    * Output: key, tracked..., version (1-based, dense per key),
    * eff_from (orderCol of the opening change), eff_to (orderCol of the
    * next version's opening change; null while current), is_current.
    */
  def scd2(
      df: DataFrame, keyCol: String, orderCol: Column, tieCol: Column,
      tracked: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCol, tieCol)
    val state = struct(tracked.map(col): _*)
    // a version opens where the tracked state differs from the previous
    // log row (lag is null on the first row per key)
    val changed = df
      .withColumn("graft_ord", orderCol)
      .withColumn("graft_prev", lag(state, 1).over(w))
      .filter(col("graft_prev").isNull || col("graft_prev") =!= state)
    val wk = Window.partitionBy(col(keyCol)).orderBy(col("graft_ord"), tieCol)
    changed
      .withColumn("version", row_number().over(wk).cast("long"))
      .withColumn("eff_from", col("graft_ord"))
      .withColumn("eff_to", lead(col("graft_ord"), 1).over(wk))
      .withColumn("is_current", col("eff_to").isNull.cast("int"))
      .select((keyCol +: tracked).map(col) ++
        Seq(col("version"), col("eff_from"), col("eff_to"), col("is_current")): _*)
  }

  /** Point-in-time slice of an SCD2 table: the version effective at
    * `at` (eff_from <= at < eff_to, open-ended current rows included).
    * A pure filter — pushed to the scan when the SCD2 table is stored. */
  def snapshotAt(scd2Table: DataFrame, at: Column): DataFrame =
    scd2Table.filter(col("eff_from") <= at &&
      (col("eff_to").isNull || at < col("eff_to")))
}
