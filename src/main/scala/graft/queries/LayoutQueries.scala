package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Scd, ZOrder}

/** Storage-layout / table-management operators: SCD2 history build
  * (q74), Z-order clustering (q75), and min/max data-skipping pruning
  * (q76) — the layer that decides how much of a 100 TB table a query
  * actually reads. All-integer outputs (epoch millis, counts, bit
  * arithmetic), so oracle parity is exact by construction.
  */
object LayoutQueries {

  /** q74: SCD2 build over the orders change log — per customer, the
    * versioned history of o_orderstatus with effective ranges. Runs of
    * unchanged status collapse; windows partition by the key (one
    * shuffle, no global sort). */
  def q74Scd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val log = Tables.load(s, dir, "orders")
      // o_orderdate is TIMESTAMP_NTZ; session tz is pinned UTC, so the
      // cast to instant is identity and epoch_ms matches DuckDB's
      .select($"o_custkey", $"o_orderstatus",
        unix_millis($"o_orderdate".cast("timestamp")).as("ms"), $"o_orderkey")
    Scd.scd2(log, "o_custkey", $"ms", $"o_orderkey", tracked = Seq("o_orderstatus"))
      .select($"o_custkey".as("custkey"), $"o_orderstatus".as("status"),
        $"version", $"eff_from", $"eff_to", $"is_current")
      .orderBy($"custkey", $"version")
  }

  val q74Sql: String =
    """WITH log AS (SELECT o_custkey, o_orderstatus, epoch_ms(o_orderdate) AS ms, o_orderkey
      |  FROM orders),
      |ch AS (SELECT *, lag(o_orderstatus) OVER
      |  (PARTITION BY o_custkey ORDER BY ms, o_orderkey) AS prev FROM log),
      |v AS (SELECT * FROM ch WHERE prev IS NULL OR prev != o_orderstatus),
      |r AS (SELECT o_custkey, o_orderstatus, ms,
      |    CAST(row_number() OVER w AS BIGINT) AS version,
      |    lead(ms) OVER w AS eff_to
      |  FROM v WINDOW w AS (PARTITION BY o_custkey ORDER BY ms, o_orderkey))
      |SELECT o_custkey AS custkey, o_orderstatus AS status, version,
      |  ms AS eff_from, eff_to,
      |  CAST(CASE WHEN eff_to IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
      |FROM r ORDER BY custkey, version""".stripMargin

  /** q75: Z-order locality — Morton-interleave (l_partkey, l_suppkey),
    * bucket by z-range, and show per-bucket min/max of BOTH dimensions:
    * every bucket is a small rectangle in key-space, which is exactly
    * why z-layout lets min/max manifests prune on either column. The
    * interleave is straight-line codegen'd bit arithmetic. */
  def q75Zorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey",
        ZOrder.interleave16($"l_partkey", $"l_suppkey").as("z"))
      .groupBy(expr("z DIV 16384").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min($"l_partkey").as("mn_part"), max($"l_partkey").as("mx_part"),
        min($"l_suppkey").as("mn_supp"), max($"l_suppkey").as("mx_supp"))
      .orderBy($"bucket")
  }

  val q75Sql: String =
    """WITH z AS (SELECT l_partkey, l_suppkey,
      |  CAST(list_sum(list_transform(generate_series(0, 15), b ->
      |    (((l_partkey >> b) & 1) << (2*b)) + (((l_suppkey >> b) & 1) << (2*b+1))))
      |    AS BIGINT) AS z
      |  FROM lineitem)
      |SELECT z // 16384 AS bucket, COUNT(*) AS n,
      |  MIN(l_partkey) AS mn_part, MAX(l_partkey) AS mx_part,
      |  MIN(l_suppkey) AS mn_supp, MAX(l_suppkey) AS mx_supp
      |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin

  /** q76: data-skipping pruning — a month-chunk min/max manifest over
    * l_shipdate, a ship-window predicate, and the pruned scan that
    * reads only overlapping chunks. Output is the manifest with the
    * prune decision and the per-chunk match count; pruned chunks are
    * never scanned (their n_match is 0 by anti-join construction, not
    * by filtering them out). sum(n_match) equals the full-filter count
    * — the invariant LayoutOpsSpec checks on real files too. */
  def q76Skipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lo = lit(857952000000L) // 1997-03-10 UTC
    val hi = lit(866764800000L) // 1997-06-20 UTC
    val li = Tables.load(s, dir, "lineitem")
      .select((year($"l_shipdate") * 100 + month($"l_shipdate")).cast("long").as("chunk"),
        unix_millis($"l_shipdate".cast("timestamp")).as("ms"))
    val man = graft.sources.DataSkipping.manifest(li, $"chunk", $"ms")
      .localCheckpoint(false) // feeds both the output and the prune list
    val matches = graft.sources.DataSkipping
      .prunedScan(li, $"chunk", $"ms", man, lo, hi)
      .groupBy($"chunk").agg(count(lit(1)).as("n_match"))
    man
      .withColumn("kept", ($"mx" >= lo && $"mn" <= hi).cast("int"))
      .join(matches, Seq("chunk"), "left")
      .select($"chunk", $"n_rows", $"mn", $"mx", $"kept",
        coalesce($"n_match", lit(0L)).as("n_match"))
      .orderBy($"chunk")
  }

  val q76Sql: String =
    """WITH li AS (SELECT
      |    CAST(EXTRACT(YEAR FROM l_shipdate)*100 + EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS chunk,
      |    epoch_ms(l_shipdate) AS ms FROM lineitem),
      |man AS (SELECT chunk, COUNT(*) AS n_rows, MIN(ms) AS mn, MAX(ms) AS mx
      |  FROM li GROUP BY chunk),
      |m AS (SELECT chunk, COUNT(*) AS n_match FROM li
      |  WHERE chunk IN (SELECT chunk FROM man WHERE mx >= 857952000000 AND mn <= 866764800000)
      |    AND ms >= 857952000000 AND ms <= 866764800000
      |  GROUP BY chunk)
      |SELECT man.chunk, man.n_rows, man.mn, man.mx,
      |  CAST(CASE WHEN man.mx >= 857952000000 AND man.mn <= 866764800000
      |       THEN 1 ELSE 0 END AS INT) AS kept,
      |  COALESCE(m.n_match, 0) AS n_match
      |FROM man LEFT JOIN m ON man.chunk = m.chunk
      |ORDER BY man.chunk""".stripMargin

  /** q90: INCREMENTAL SCD2 maintenance — build the table from orders
    * before 1998-07-01, then [[Scd.merge]] the strictly-later batch in.
    * The oracle is q74's FULL-REBUILD SQL over the whole log: the merge
    * must be indistinguishable from rebuilding, while having touched
    * only open versions of keys in the batch. */
  def q90Scd2Merge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = 899251200000L // 1998-07-01 UTC
    val log = Tables.load(s, dir, "orders")
      .select($"o_custkey", $"o_orderstatus",
        unix_millis($"o_orderdate".cast("timestamp")).as("ms"), $"o_orderkey")
    val existing = Scd.scd2(log.filter($"ms" < cutoff), "o_custkey",
      $"ms", $"o_orderkey", Seq("o_orderstatus"))
    val batch = log.filter($"ms" >= cutoff)
      .select($"o_custkey", $"o_orderstatus", $"ms".as("ord"), $"o_orderkey".as("tie"))
    Scd.merge(existing, batch, "o_custkey", Seq("o_orderstatus"))
      .select($"o_custkey".as("custkey"), $"o_orderstatus".as("status"),
        $"version", $"eff_from", $"eff_to", $"is_current")
      .orderBy($"custkey", $"version")
  }

  /** q132: bitmap-index audience segmentation — per event type, users
    * pack into 64-bit words (`word = user DIV 64`, `bit = user % 64`,
    * bit_or-aggregated; duplicate events are free because OR is
    * idempotent — no pre-distinct pass). Segment sizes are word
    * popcount sums; pairwise audience intersections are word-AND
    * popcounts — EXACT distinct-user overlaps from ~|users|/64 longs
    * per segment, the roaring-bitmap OLAP recipe in its dense form.
    * The oracle computes the same overlaps from first principles
    * (DISTINCT user-type pairs self-joined), so the hash match proves
    * the bitmap algebra equals the set definition — an independent
    * oracle, not a replay. Scale: words shuffle once per segment
    * (map-side bit_or partials); the pair join keys on word index. */
  def q132BitmapSegments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bm = Tables.loadEvents(s, dir)
      .select($"event_type", expr("user_id DIV 64").as("w"),
        expr("shiftleft(1L, CAST(user_id % 64 AS INT))").as("b"))
      .groupBy($"event_type", $"w").agg(bit_or($"b").as("bits"))
      .localCheckpoint(true) // feeds the size agg and both join sides
    val sizes = bm.groupBy($"event_type")
      .agg(sum(bit_count($"bits")).as("n_users"))
    val pairs = bm.as("a").join(bm.as("b"),
        $"a.w" === $"b.w" && $"a.event_type" < $"b.event_type")
      .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
      .agg(sum(bit_count($"a.bits".bitwiseAND($"b.bits"))).as("n_common"))
    pairs
      .join(sizes.select($"event_type".as("type_a"), $"n_users".as("n_a")), "type_a")
      .join(sizes.select($"event_type".as("type_b"), $"n_users".as("n_b")), "type_b")
      .select($"type_a", $"type_b", $"n_a", $"n_b", $"n_common")
      .orderBy($"type_a", $"type_b")
  }

  val q132Sql: String =
    """WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
      |sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY event_type),
      |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_common
      |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT pr.type_a, pr.type_b, sa.n AS n_a, sb.n AS n_b, pr.n_common
      |FROM pr JOIN sz sa ON pr.type_a = sa.event_type
      |        JOIN sz sb ON pr.type_b = sb.event_type
      |ORDER BY type_a, type_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q74_scd2" -> (q74Scd2 _),
    "q75_zorder" -> (q75Zorder _),
    "q76_skipping" -> (q76Skipping _),
    "q90_scd2_merge" -> (q90Scd2Merge _),
    "q132_bitmap_segments" -> (q132BitmapSegments _))

  val oracle: Map[String, String] = Map(
    "q74_scd2" -> q74Sql,
    "q75_zorder" -> q75Sql,
    "q76_skipping" -> q76Sql,
    // the merge result must equal the full rebuild — same oracle as q74
    "q90_scd2_merge" -> q74Sql,
    "q132_bitmap_segments" -> q132Sql)
}
