package graft.ext

import org.apache.spark.sql.{DataFrame, GraftShim}
import org.apache.spark.sql.functions._

/** Two-criteria skyline (Pareto frontier) — the "no strictly better
  * trade-off exists" filter: keep rows where no other row is at least
  * as good on BOTH axes and strictly better on one. The curation
  * primitive behind cost/quality frontiers (cheapest doc at each
  * quality level, best quality at each length budget) and the classic
  * price/performance OLAP question.
  *
  * Distributed shape — NO quadratic dominance join and NO global
  * window: reduce to one row per distinct cost (its max gain, one
  * map-side-combined aggregation), range-partition + sort that grouped
  * table by cost, and take the EXCLUSIVE running max of gain with the
  * two-pass prefix scan ([[GraftShim.zipWithPrefixMax]] — one partial
  * per partition to the driver, never the data). A cost level is on
  * the frontier iff its max gain strictly exceeds every cheaper
  * level's: monotone-decreasing gain along increasing cost is exactly
  * the skyline. Original rows rejoin the (small) frontier on
  * (cost, gain) equality.
  */
object Skyline {

  /** Rows of `df` on the minimize-`costCol` / maximize-`gainCol`
    * frontier. Both columns must be BIGINT (exact semantics — floats
    * have no portable ordering ties). Duplicate frontier points all
    * survive (neither dominates the other). */
  def frontier2(df: DataFrame, costCol: String, gainCol: String): DataFrame = {
    for (c <- Seq(costCol, gainCol))
      require(df.schema(c).dataType == org.apache.spark.sql.types.LongType,
        s"frontier2 requires BIGINT criteria; '$c' is ${df.schema(c).dataType.sql}")
    val perCost = df.groupBy(col(costCol)).agg(max(col(gainCol)).as("_mx"))
      .repartitionByRange(col(costCol))
      .sortWithinPartitions(col(costCol))
    val frontier = GraftShim.zipWithPrefixMax(perCost, "_mx", "_rm")
      .filter(col("_mx") > col("_rm"))
      .select(col(costCol), col("_mx"))
    df.join(frontier,
      df(costCol) === frontier(costCol) && df(gainCol) === frontier("_mx"))
      .select(df.columns.map(df(_)): _*)
  }
}
