package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.ColOps._

/** Coverage expansions: A5 ragged-schema union, cube grouping sets,
  * and the wider window-function surface (lag/lead/rank/range frames). */
object MoreRelational {

  /** q38: A5 (`main.py:703-708`) — the reference reconstructs a schema
    * from ragged result dicts; the Spark analog is unionByName with
    * allowMissingColumns, null-padding the disjoint columns. Two
    * different projections of customer/supplier united by name. */
  def q38RaggedUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.load(s, dir, "customer")
      .select($"c_custkey".cast("long").as("entity_id"), $"c_name".as("name"),
        $"c_acctbal".as("balance"), $"c_mktsegment".as("segment"))
    val sup = Tables.load(s, dir, "supplier")
      .select($"s_suppkey".cast("long").as("entity_id"), $"s_name".as("name"),
        $"s_acctbal".as("balance"), lit("supplier").as("kind"))
    c.withColumn("kind", lit("customer"))
      .unionByName(sup, allowMissingColumns = true)
      .orderBy($"kind", $"entity_id")
  }

  val q38Sql: String =
    """SELECT * FROM (
      |  SELECT CAST(c_custkey AS BIGINT) AS entity_id, c_name AS name,
      |    c_acctbal AS balance, c_mktsegment AS segment, 'customer' AS kind
      |  FROM customer
      |  UNION ALL
      |  SELECT CAST(s_suppkey AS BIGINT), s_name, s_acctbal, NULL, 'supplier'
      |  FROM supplier) t
      |ORDER BY kind, entity_id""".stripMargin

  /** q39: CUBE over lineitem flags — all four grouping-set combinations
    * in one pass (q09 covers ROLLUP's three). */
  def q39Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(dec($"l_extendedprice")).as("sum_price"),
        grouping($"l_returnflag").cast("int").as("g_rf"),
        grouping($"l_linestatus").cast("int").as("g_ls"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"g_rf", $"g_ls", $"n", $"sum_price")
      .orderBy($"g_rf", $"g_ls", $"returnflag", $"linestatus")
  }

  val q39Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, returnflag, linestatus""".stripMargin

  /** q40: the window-function family beyond q05 — lag, lead,
    * dense_rank, ntile, and a RANGE frame — per-customer over orders. */
  def q40WindowFamily(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val wPrice = Window.partitionBy($"o_custkey").orderBy(dec($"o_totalprice"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        lag($"o_orderkey", 1).over(w).as("prev_order"),
        lead($"o_orderkey", 1).over(w).as("next_order"),
        dense_rank().over(w).cast("long").as("order_rank"),
        ntile(4).over(w).cast("long").as("quartile"),
        count(lit(1)).over(wPrice).cast("long").as("n_cheaper_or_equal"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q40Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  lag(o_orderkey, 1) OVER w AS prev_order,
      |  lead(o_orderkey, 1) OVER w AS next_order,
      |  CAST(dense_rank() OVER w AS BIGINT) AS order_rank,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(12,2))
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_cheaper_or_equal
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q45: semi/anti joins — customers with orders (EXISTS) vs without
    * (NOT EXISTS), tagged and counted per market segment. Semi/anti
    * ship only the probe side's keys — no payload from orders moves. */
  def q45SemiAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").select($"o_custkey")
    val withOrders = c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
      .withColumn("has_orders", lit(1))
    val withoutOrders = c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .withColumn("has_orders", lit(0))
    withOrders.unionByName(withoutOrders)
      .groupBy($"c_mktsegment", $"has_orders")
      .agg(count(lit(1)).as("n_customers"), dsum(dec($"c_acctbal")).as("sum_bal"))
      .orderBy($"c_mktsegment", $"has_orders")
  }

  val q45Sql: String =
    """SELECT c_mktsegment, has_orders, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
      |FROM (
      |  SELECT c.*, CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |    THEN 1 ELSE 0 END AS has_orders
      |  FROM customer c) t
      |GROUP BY c_mktsegment, has_orders
      |ORDER BY c_mktsegment, has_orders""".stripMargin

  /** q46: F8 JSON decode — events.props is a JSON string column;
    * from_json extracts the typed field, aggregated per event type. */
  def q46JsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.loadEvents(s, dir)
      .withColumn("k", from_json($"props", schema).getField("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val q46Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
      |  MAX(CAST(props->>'k' AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q112: TPC-H Q3 shape — top-10 highest-revenue unshipped orders for
    * one market segment. The classic selective-dim → fact → fact chain:
    * the segment filter prunes customers BEFORE the broadcast join, the
    * date filters push to both fact scans, and revenue stays an exact
    * DECIMAL through the ORDER BY (cross-engine-deterministic ranking;
    * cast to double only in the output). */
  def q112TpchQ3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.load(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ord = Tables.load(s, dir, "orders")
      .filter($"o_orderdate" < lit("1995-03-15").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" > lit("1995-03-15").cast("timestamp"))
      .select($"l_orderkey", dec($"l_extendedprice").as("ep"), dec($"l_discount").as("dc"))
    val ranked = li.join(ord.join(broadcast(cust), $"o_custkey" === $"c_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(sum($"ep" * (lit(1) - $"dc")).as("rev"))
      .orderBy($"rev".desc, $"l_orderkey")
      .limit(10)
    ranked.select($"l_orderkey", $"rev".cast("double").as("revenue"), $"o_orderdate")
  }

  val q112Sql: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** q113: TPC-H Q5 shape — per-nation revenue where customer and
    * supplier share a nation, for one region and year. Six-table chain:
    * region→nation prune broadcast into supplier/customer; the
    * co-nationality predicate rides the join; facts shuffle on their
    * keys. Revenue is exact DECIMAL until the final cast. */
  def q113TpchQ5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nat = Tables.load(s, dir, "nation")
      .join(broadcast(Tables.load(s, dir, "region").filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val supp = Tables.load(s, dir, "supplier")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_nationkey", $"n_name")
    val cust = Tables.load(s, dir, "customer").select($"c_custkey", $"c_nationkey")
    val ord = Tables.load(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val li = Tables.load(s, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey",
        dec($"l_extendedprice").as("ep"), dec($"l_discount").as("dc"))
    li.join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .filter($"c_nationkey" === $"s_nationkey")
      .groupBy($"n_name")
      .agg(sum($"ep" * (lit(1) - $"dc")).cast("double").as("revenue"))
      .orderBy($"n_name")
  }

  val q113Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q126: price/size skyline of `part` ([[graft.ext.Skyline]]) — the
    * Pareto frontier minimizing retail price (exact cents) while
    * maximizing size: no other part is both cheaper-or-equal and
    * larger-or-equal with one strict. Engine reduces per distinct
    * price then runs the two-pass distributed prefix max (no global
    * window, no dominance self-join); the oracle is the quadratic
    * NOT EXISTS dominance definition, so the hash match proves the
    * frontier recurrence EQUALS the definition. */
  def q126Skyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.load(s, dir, "part")
      .select($"p_partkey",
        ($"p_retailprice".cast("decimal(12,2)") * 100).cast("long").as("price_fp"),
        $"p_size".cast("long").as("p_size"))
    graft.ext.Skyline.frontier2(p, "price_fp", "p_size")
      .select($"p_partkey", $"price_fp", $"p_size")
      .orderBy($"p_partkey")
  }

  val q126Sql: String =
    """WITH p AS (SELECT p_partkey,
      |    CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_fp,
      |    CAST(p_size AS BIGINT) AS p_size FROM part)
      |SELECT p_partkey, price_fp, p_size FROM p a
      |WHERE NOT EXISTS (SELECT 1 FROM p b
      |  WHERE b.price_fp <= a.price_fp AND b.p_size >= a.p_size
      |    AND (b.price_fp < a.price_fp OR b.p_size > a.p_size))
      |ORDER BY p_partkey""".stripMargin

  /** q127: TPC-H Q7 shape — bilateral shipping volume among a nation
    * cohort by ship year: lineitem⋈orders on the fact keys; supplier
    * and customer shrink to keyed nation tags and BROADCAST (so the
    * only corpus-sized shuffles are the fact-fact join's); the
    * two-nation filter prunes both dimension builds before broadcast.
    * Exact DECIMAL volume, cast to double only at the end (q113
    * discipline). */
  def q127TpchQ7(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nat = Tables.load(s, dir, "nation")
      .filter($"n_name".isin("NATION_0", "NATION_1", "NATION_2", "NATION_3"))
      .select($"n_nationkey", $"n_name")
    val supp = Tables.load(s, dir, "supplier")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val cust = Tables.load(s, dir, "customer")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    val ord = Tables.load(s, dir, "orders").select($"o_orderkey", $"o_custkey")
    val li = Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_suppkey", year($"l_shipdate").cast("long").as("l_year"),
        (dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).as("volume"))
    li.join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(sum($"volume").cast("double").as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val q127Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |  AND c_nationkey = n2.n_nationkey
      |  AND n1.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
      |  AND n2.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
      |  AND n1.n_name <> n2.n_name
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q127_tpch_q7" -> (q127TpchQ7 _),
    "q126_skyline" -> (q126Skyline _),
    "q112_tpch_q3" -> (q112TpchQ3 _),
    "q113_tpch_q5" -> (q113TpchQ5 _),
    "q38_ragged_union" -> (q38RaggedUnion _),
    "q39_cube" -> (q39Cube _),
    "q40_window_family" -> (q40WindowFamily _),
    "q45_semi_anti" -> (q45SemiAnti _),
    "q46_json_extract" -> (q46JsonExtract _))

  val oracle: Map[String, String] = Map(
    "q127_tpch_q7" -> q127Sql,
    "q126_skyline" -> q126Sql,
    "q112_tpch_q3" -> q112Sql,
    "q113_tpch_q5" -> q113Sql,
    "q38_ragged_union" -> q38Sql,
    "q39_cube" -> q39Sql,
    "q40_window_family" -> q40Sql,
    "q45_semi_anti" -> q45Sql,
    "q46_json_extract" -> q46Sql)
}
