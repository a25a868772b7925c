package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.ColOps._

/** Relational operator coverage (SURVEY.md §2.3-§2.6 engine extensions):
  * scans, filter/project pushdown, broadcast + shuffle joins, hash
  * aggregation, windows, top-k, distinct, set ops, rollup.
  *
  * Scale notes (100 TB): every query here is pure DataFrame space, so
  * Catalyst sees through it — filters/projections reach the parquet scan,
  * dimension joins are explicitly `broadcast()` (region/nation/customer
  * never warrant a shuffle), fact-fact joins shuffle on the join key and
  * AQE handles skew. No driver-side materialization anywhere.
  */
object Relational {

  /** q01: TPC-H Q1-style scan+agg over lineitem. One shuffle on a
    * 6-value grouping key; partial aggregation makes the map side emit
    * ~6 rows per partition regardless of input size. */
  def q01Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum(dec($"l_quantity")).as("sum_qty"),
        dsum(dec($"l_extendedprice")).as("sum_base_price"),
        dsum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).as("sum_disc_price"),
        dsum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")) * (lit(1) + dec($"l_tax"))).as("sum_charge"),
        dmean(dec($"l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02: TPC-H Q6-style selective filter + global agg. The predicate is
    * pushed to the parquet scan (row-group pruning on l_shipdate) and only
    * 4 columns are read — at 100 TB this is the difference between
    * scanning ~4% and 100% of the table. */
  def q02Filter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1998-01-01").cast("timestamp") &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
              $"l_quantity" < 24)
      .agg(
        dsum(dec($"l_extendedprice") * dec($"l_discount")).as("revenue"),
        count(lit(1)).as("n"))
  }

  val q02Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** q03: snowflake dimension join — customer ⋈ nation ⋈ region, all
    * dims broadcast (region/nation are tiny at any scale factor; no
    * shuffle of the customer fact). */
  def q03BroadcastJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_cust"), dsum(dec($"c_acctbal")).as("sum_bal"))
      .orderBy($"r_name", $"n_name")
  }

  val q03Sql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** q04: fact-fact shuffle join (lineitem ⋈ orders on orderkey) + agg.
    * At scale this is a sort-merge join on co-shuffled keys; AQE coalesces
    * post-shuffle partitions. Partial aggregation collapses to 5 priority
    * rows before the final exchange. */
  def q04JoinAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        dsum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).as("revenue"),
        countDistinct($"o_orderkey").as("n_orders"),
        count(lit(1)).as("n_lines"))
      .orderBy($"o_orderpriority")
  }

  val q04Sql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o_orderkey) AS n_orders,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q05: window functions — per-customer running order total + row
    * number (SURVEY.md §2.5 engine extension). Deterministic frame: the
    * sort key (o_orderdate, o_orderkey) is total within a partition. */
  def q05Window(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.load(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        row_number().over(w).as("order_seq"),
        sum(dec($"o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"))
      .orderBy($"o_custkey", $"order_seq")
  }

  val q05Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  ROW_NUMBER() OVER w AS order_seq,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, order_seq""".stripMargin

  /** q06: top-k with deterministic tie-break — global sort is a range-
    * partitioned shuffle, but LIMIT pushes a per-partition top-k to the
    * map side (TakeOrderedAndProject), so only k rows move. */
  def q06TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_acctbal".desc, $"c_custkey")
      .limit(100)
  }

  val q06Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |ORDER BY c_acctbal DESC, c_custkey LIMIT 100""".stripMargin

  /** q07: distinct (SURVEY.md §2.4 — engine exposes dropDuplicates; the
    * reference has no distinct). Partial-aggregate dedup before shuffle. */
  def q07Distinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "customer")
      .select($"c_mktsegment", $"c_nationkey")
      .distinct()
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  val q07Sql: String =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** q08: set operations (SURVEY.md §2.6 — none in reference; Catalyst
    * built-ins). Nations having customers but no suppliers, and the
    * intersection, tagged and unioned. */
  def q08SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cn = Tables.load(s, dir, "customer").select($"c_nationkey".as("nk"))
    val sn = Tables.load(s, dir, "supplier").select($"s_nationkey".as("nk"))
    val both = cn.intersect(sn).withColumn("tag", lit("both"))
    val custOnly = cn.except(sn).withColumn("tag", lit("cust_only"))
    both.unionByName(custOnly).orderBy($"tag", $"nk")
  }

  val q08Sql: String =
    """WITH cn AS (SELECT c_nationkey AS nk FROM customer),
      |     sn AS (SELECT s_nationkey AS nk FROM supplier),
      |     b AS (SELECT nk, 'both' AS tag FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)),
      |     c AS (SELECT nk, 'cust_only' AS tag FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn))
      |SELECT nk, tag FROM b UNION ALL SELECT nk, tag FROM c
      |ORDER BY tag, nk""".stripMargin

  /** q09: rollup (grouping sets) over lineitem flags — multi-level agg in
    * one pass; `grouping()` flags disambiguate subtotal rows from data. */
  def q09Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(dec($"l_quantity")).as("sum_qty"),
        grouping($"l_returnflag").cast("int").as("g_rf"),
        grouping($"l_linestatus").cast("int").as("g_ls"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"g_rf", $"g_ls", $"n", $"sum_qty")
      .orderBy($"g_rf", $"g_ls", $"returnflag", $"linestatus")
  }

  val q09Sql: String =
    """SELECT
      |  COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, returnflag, linestatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> (q01Agg _),
    "q02_filter_pushdown" -> (q02Filter _),
    "q03_broadcast_join" -> (q03BroadcastJoin _),
    "q04_join_agg" -> (q04JoinAgg _),
    "q05_window" -> (q05Window _),
    "q06_topk" -> (q06TopK _),
    "q07_distinct" -> (q07Distinct _),
    "q08_setops" -> (q08SetOps _),
    "q09_rollup" -> (q09Rollup _))

  val oracle: Map[String, String] = Map(
    "q01_agg" -> q01Sql,
    "q02_filter_pushdown" -> q02Sql,
    "q03_broadcast_join" -> q03Sql,
    "q04_join_agg" -> q04Sql,
    "q05_window" -> q05Sql,
    "q06_topk" -> q06Sql,
    "q07_distinct" -> q07Sql,
    "q08_setops" -> q08Sql,
    "q09_rollup" -> q09Sql)
}
