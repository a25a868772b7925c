package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.ColOps._

/** Wider SQL/analytics surface: explicit grouping sets, exact
  * percentiles, moment statistics (stddev/correlation) with exact
  * decimal sums, edit-distance fuzzy matching, calendar bucketing, and
  * latest-per-key compaction. All DuckDB-oracle hash-verified; doubles
  * only ever come from structurally-mirrored expressions over exact
  * integer/decimal aggregates.
  */
object StatsQueries {

  /** q53: explicit GROUPING SETS ((returnflag), (linestatus)) — the
    * grouping-set family member not covered by q09 ROLLUP / q39 CUBE.
    * One Expand + one shuffle, same as a single group-by. */
  def q53GroupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupingSets(Seq(Seq($"l_returnflag"), Seq($"l_linestatus")),
        $"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(dec($"l_quantity")).as("sum_qty"),
        grouping($"l_returnflag").cast("int").as("g_rf"),
        grouping($"l_linestatus").cast("int").as("g_ls"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"g_rf", $"g_ls", $"n", $"sum_qty")
      .orderBy($"g_rf", $"g_ls", $"returnflag", $"linestatus")
  }

  val q53Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY g_rf, g_ls, returnflag, linestatus""".stripMargin

  /** q54: exact discrete percentiles (p25/p50/p75 of order totals per
    * priority) via rank arithmetic — value at row ceil(q·n) in the
    * (decimal-price, orderkey) order. Engine-portable: no vendor
    * percentile aggregate (Spark interpolates, DuckDB doesn't), just
    * row_number + integer ceil on both sides. One shuffle on the
    * partition key; at scale this is the windowed-rank pattern, not a
    * global sort. */
  def q54Percentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy(dec($"o_totalprice"), $"o_orderkey")
    val cw = Window.partitionBy($"o_orderpriority")
    Tables.load(s, dir, "orders")
      .select($"o_orderpriority", dec($"o_totalprice").as("p"),
        row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(cw).cast("long").as("n"))
      .groupBy($"o_orderpriority")
      .agg(max($"n").as("n_orders"),
        max(when($"rn" === expr("(n*25+99) DIV 100"), $"p")).cast("double").as("p25"),
        max(when($"rn" === expr("(n*50+99) DIV 100"), $"p")).cast("double").as("p50"),
        max(when($"rn" === expr("(n*75+99) DIV 100"), $"p")).cast("double").as("p75"))
      .orderBy($"o_orderpriority")
  }

  val q54Sql: String =
    """WITH ranked AS (
      |  SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(12,2)) AS p,
      |    CAST(row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(o_totalprice AS DECIMAL(12,2)), o_orderkey) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
      |  FROM orders)
      |SELECT o_orderpriority, MAX(n) AS n_orders,
      |  CAST(MAX(CASE WHEN rn = (n*25+99)//100 THEN p END) AS DOUBLE) AS p25,
      |  CAST(MAX(CASE WHEN rn = (n*50+99)//100 THEN p END) AS DOUBLE) AS p50,
      |  CAST(MAX(CASE WHEN rn = (n*75+99)//100 THEN p END) AS DOUBLE) AS p75
      |FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q55: moment statistics — sample stddev and Pearson correlation
    * from exact decimal sums (n, Σx, Σx², Σxy), assembled into doubles
    * with the identical expression structure on both engines. The
    * vendor stddev/corr aggregates stream doubles in engine-specific
    * order and never hash-match; decimal moments are order-independent
    * and exact. One pass, one shuffle. */
  def q55Stats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = dec($"l_quantity"); val p = dec($"l_extendedprice")
    val sums = Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(q).as("sq"), sum(q * q).as("sqq"),
        sum(p).as("sp"), sum(p * p).as("spp"),
        sum(q * p).as("spq"))
    val nD = $"n".cast("double")
    val sqD = $"sq".cast("double"); val sqqD = $"sqq".cast("double")
    val spD = $"sp".cast("double"); val sppD = $"spp".cast("double")
    val spqD = $"spq".cast("double")
    val stdQ = sqrt((sqqD - sqD * sqD / nD) / (nD - 1.0))
    val stdP = sqrt((sppD - spD * spD / nD) / (nD - 1.0))
    val cov = (spqD - sqD * spD / nD) / (nD - 1.0)
    // round to 6 decimals: the Σx² decimals exceed 2^53, and the
    // decimal→double CAST of such values rounds differently between
    // engines (last-ulp); the statistics themselves are far more precise
    sums.select($"l_returnflag", $"n",
        round(stdQ, 6).as("std_qty"), round(stdP, 6).as("std_price"),
        round(cov / (stdQ * stdP), 6).as("corr_qp"))
      .orderBy($"l_returnflag")
  }

  val q55Sql: String =
    """WITH s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sqq,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sp,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS spp,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS spq
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round(sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (CAST(n AS DOUBLE) - 1.0)), 6) AS std_qty,
      |  round(sqrt((CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (CAST(n AS DOUBLE) - 1.0)), 6) AS std_price,
      |  round(((CAST(spq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (CAST(n AS DOUBLE) - 1.0))
      |  / (sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
      |       / (CAST(n AS DOUBLE) - 1.0))
      |     * sqrt((CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))
      |       / (CAST(n AS DOUBLE) - 1.0))), 6) AS corr_qp
      |FROM s ORDER BY l_returnflag""".stripMargin

  /** q56: edit-distance fuzzy self-match over the brand dimension —
    * entity-resolution shape. The scale design is dedupe-then-compare:
    * DISTINCT collapses the fact table to dimension cardinality BEFORE
    * the quadratic pair step, so the pair join runs on the (tiny)
    * dimension; production blocking (q-grams) slots into the join
    * condition. Levenshtein is exact-integer on both engines. */
  def q56FuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val brands = Tables.load(s, dir, "part").select($"p_brand").distinct()
    brands.select($"p_brand".as("brand_a"))
      .join(brands.select($"p_brand".as("brand_b")), $"brand_a" < $"brand_b")
      .withColumn("dist", levenshtein($"brand_a", $"brand_b").cast("long"))
      .filter($"dist" <= 2)
      .orderBy($"brand_a", $"brand_b")
  }

  val q56Sql: String =
    """WITH b AS (SELECT DISTINCT p_brand FROM part)
      |SELECT x.p_brand AS brand_a, y.p_brand AS brand_b,
      |  CAST(levenshtein(x.p_brand, y.p_brand) AS BIGINT) AS dist
      |FROM b x JOIN b y ON x.p_brand < y.p_brand
      |WHERE levenshtein(x.p_brand, y.p_brand) <= 2
      |ORDER BY brand_a, brand_b""".stripMargin

  /** q115: BLOCKED fuzzy matching — q56's scale twin. Deletion-
    * neighborhood blocking (the SymSpell trick): every token keys on
    * itself plus each single-character deletion; any two strings within
    * edit distance 1 provably share a key (substitution → same deletion
    * at the differing position; insertion/deletion → the longer's
    * deletion equals the shorter), so candidates meet in an EQUI-join
    * on the key — never a quadratic all-pairs — and exact levenshtein
    * verifies. The oracle IS the quadratic brute force over the
    * distinct vocabulary: a hash match proves the blocking found every
    * pair (completeness), not just valid ones. */
  def q115BlockedFuzzy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.load(s, dir, "part")
      .select($"p_brand".as("t")).distinct()
      .localCheckpoint(false) // dimension-sized; feeds both join sides
    val keyed = toks.select($"t", explode(concat(array($"t"),
        transform(sequence(lit(1), length($"t")),
          i => concat($"t".substr(lit(1), i - 1),
            $"t".substr(i + 1, length($"t")))))).as("k"))
    keyed.as("a").join(keyed.as("b"), "k")
      .filter($"a.t" < $"b.t")
      .select($"a.t".as("t1"), $"b.t".as("t2"))
      .distinct()
      .withColumn("dist", levenshtein($"t1", $"t2").cast("long"))
      .filter($"dist" <= 1)
      .orderBy($"t1", $"t2")
  }

  val q115Sql: String =
    """WITH tok AS (SELECT DISTINCT p_brand AS t FROM part)
      |SELECT a.t AS t1, b.t AS t2, CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
      |FROM tok a JOIN tok b ON a.t < b.t
      |WHERE levenshtein(a.t, b.t) <= 1
      |ORDER BY t1, t2""".stripMargin

  /** q57: calendar bucketing — orders per (year, month) with revenue
    * and distinct customers. Session timezone is pinned UTC (Verify/
    * Bench builders) so calendar fields match DuckDB's naive-timestamp
    * extraction. */
  def q57DateBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .groupBy(year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"))
      .agg(count(lit(1)).as("n_orders"), dsum(dec($"o_totalprice")).as("revenue"),
        countDistinct($"o_custkey").as("n_customers"))
      .orderBy($"yr", $"mo")
  }

  val q57Sql: String =
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
      |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o_custkey) AS n_customers
      |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin

  /** q58: latest-per-key compaction — each user's most recent event
    * (upsert/SCD "current view" semantics; the incremental-table
    * compaction primitive). Deterministic tie-break on event_id. One
    * shuffle on the key; at scale this is the standard window-rank
    * dedup, and with bucketed storage the shuffle disappears. */
  def q58LatestPerKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us".desc, $"event_id".desc)
    Tables.loadEvents(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id".as("last_event_id"), $"us".as("last_us"),
        $"event_type".as("last_type"))
      .orderBy($"user_id")
  }

  val q58Sql: String =
    """WITH e AS (SELECT *, epoch_us(ts) AS us FROM events),
      |r AS (SELECT *, row_number() OVER
      |  (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn FROM e)
      |SELECT user_id, event_id AS last_event_id, us AS last_us, event_type AS last_type
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q96: corpus drift — total-variation distance histogram between two
    * corpus snapshots (even vs odd doc_id halves, the deterministic
    * stand-in for crawl N vs crawl N+1) keyed by (lang, length bucket).
    * Per-key numerators |n_a·M − m_b·N| are exact longs
    * ([[graft.ext.Drift.histogramDiff]]); TVD = Σ l1_num / (2·N·M) — no
    * float/log in the gated surface, unlike PSI/KL. */
  def q96Drift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", $"lang", expr("CAST(n_chars AS BIGINT) DIV 100").as("len_bucket"))
    graft.ext.Drift.histogramDiff(
        docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1),
        Seq("lang", "len_bucket"))
      .orderBy($"lang", $"len_bucket")
  }

  val q96Sql: String =
    """WITH d AS (SELECT doc_id, lang, n_chars // 100 AS len_bucket FROM documents),
      |ha AS (SELECT lang, len_bucket, COUNT(*) AS n_a FROM d WHERE doc_id % 2 = 0
      |  GROUP BY lang, len_bucket),
      |hb AS (SELECT lang, len_bucket, COUNT(*) AS m_b FROM d WHERE doc_id % 2 = 1
      |  GROUP BY lang, len_bucket),
      |h AS (SELECT COALESCE(ha.lang, hb.lang) AS lang,
      |    COALESCE(ha.len_bucket, hb.len_bucket) AS len_bucket,
      |    COALESCE(n_a, 0) AS n_a, COALESCE(m_b, 0) AS m_b
      |  FROM ha FULL OUTER JOIN hb ON ha.lang = hb.lang AND ha.len_bucket = hb.len_bucket),
      |t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS n_total,
      |    CAST(SUM(m_b) AS BIGINT) AS m_total FROM h)
      |SELECT h.lang, CAST(h.len_bucket AS BIGINT) AS len_bucket,
      |  CAST(h.n_a AS BIGINT) AS n_a, CAST(h.m_b AS BIGINT) AS m_b,
      |  CAST(abs(h.n_a * t.m_total - h.m_b * t.n_total) AS BIGINT) AS l1_num,
      |  t.n_total, t.m_total
      |FROM h CROSS JOIN t ORDER BY lang, len_bucket""".stripMargin

  /** q98: winsorized robust statistics — per event type, clip values to
    * the exact [p05, p95] band (rank-based thresholds, q54's recipe: no
    * vendor percentile, no interpolation) and recompute the mean over
    * the clipped DECIMAL values. The standard outlier-robust cleaning
    * step for heavy-tailed metrics; every number exact until one final
    * cast. Scale shape: windowed rank per group (no global sort), a
    * 5-row threshold table broadcast back, one aggregation. */
  def q98Winsorize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.loadEvents(s, dir)
      .select($"event_type", $"event_id", dec($"value").as("v"))
    val w = Window.partitionBy($"event_type").orderBy($"v", $"event_id")
    val cw = Window.partitionBy($"event_type")
    val ranked = ev.select($"event_type", $"v",
      row_number().over(w).cast("long").as("rn"),
      count(lit(1)).over(cw).cast("long").as("n"))
    val th = ranked.groupBy($"event_type").agg(
      max(when($"rn" === expr("(n*5+99) DIV 100"), $"v")).as("lo"),
      max(when($"rn" === expr("(n*95+99) DIV 100"), $"v")).as("hi"))
    ev.join(broadcast(th), "event_type")
      .select($"event_type", $"v", $"lo", $"hi",
        least(greatest($"v", $"lo"), $"hi").as("c"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        count(when($"v" < $"lo", 1)).as("n_clip_lo"),
        count(when($"v" > $"hi", 1)).as("n_clip_hi"),
        max($"lo").cast("double").as("p05"),
        max($"hi").cast("double").as("p95"),
        // round to 6 decimals: the decimal→double cast of the clipped
        // sum rounds differently between engines in the last ulps
        // (q55's lesson); the statistic is far coarser than 1e-6
        round(sum($"c").cast("double") / count(lit(1)), 6).as("mean_wins"))
      .orderBy($"event_type")
  }

  val q98Sql: String =
    """WITH e AS (SELECT event_type, event_id, CAST(value AS DECIMAL(12,2)) AS v FROM events),
      |ranked AS (SELECT event_type, v,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM e),
      |th AS (SELECT event_type,
      |    MAX(CASE WHEN rn = (n*5+99)//100 THEN v END) AS lo,
      |    MAX(CASE WHEN rn = (n*95+99)//100 THEN v END) AS hi
      |  FROM ranked GROUP BY event_type),
      |c AS (SELECT e.event_type, e.v, th.lo, th.hi,
      |    least(greatest(e.v, th.lo), th.hi) AS c
      |  FROM e JOIN th ON e.event_type = th.event_type)
      |SELECT event_type, COUNT(*) AS n,
      |  COUNT(*) FILTER (v < lo) AS n_clip_lo,
      |  COUNT(*) FILTER (v > hi) AS n_clip_hi,
      |  CAST(MAX(lo) AS DOUBLE) AS p05,
      |  CAST(MAX(hi) AS DOUBLE) AS p95,
      |  round(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) AS mean_wins
      |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_grouping_sets" -> (q53GroupingSets _),
    "q54_percentiles" -> (q54Percentiles _),
    "q55_stats" -> (q55Stats _),
    "q56_fuzzy_match" -> (q56FuzzyMatch _),
    "q115_blocked_fuzzy" -> (q115BlockedFuzzy _),
    "q57_date_buckets" -> (q57DateBuckets _),
    "q58_latest_per_key" -> (q58LatestPerKey _),
    "q96_drift" -> (q96Drift _),
    "q98_winsorize" -> (q98Winsorize _))

  val oracle: Map[String, String] = Map(
    "q53_grouping_sets" -> q53Sql,
    "q54_percentiles" -> q54Sql,
    "q55_stats" -> q55Sql,
    "q56_fuzzy_match" -> q56Sql,
    "q115_blocked_fuzzy" -> q115Sql,
    "q57_date_buckets" -> q57Sql,
    "q58_latest_per_key" -> q58Sql,
    "q96_drift" -> q96Sql,
    "q98_winsorize" -> q98Sql)
}
