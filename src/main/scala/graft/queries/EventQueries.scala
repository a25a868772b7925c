package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.AsOfJoin
import graft.operators.ColOps._

/** Event-stream analytics on the `events` table (q25-q27): tumbling
  * windows, gap-based sessionization, as-of join. Batch twins of the
  * streaming module's operators — same semantics the Structured
  * Streaming path applies with watermarks (graft.streaming).
  * All times handled as unix micros/seconds (bigint) for exact
  * cross-engine parity.
  */
object EventQueries {

  /** q25: 10-minute tumbling window aggregation per event type. One
    * shuffle on (window, type); partial aggregation collapses map-side. */
  def q25TumblingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.loadEvents(s, dir)
      .withColumn("win_start", ($"sec" - pmod($"sec", lit(600L))).cast("long"))
      .groupBy($"win_start", $"event_type")
      .agg(count(lit(1)).as("n"),
        dsum(dec($"value")).as("sum_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"win_start", $"event_type")
  }

  val q25Sql: String =
    """SELECT win_start, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM (SELECT *,
      |  CAST(floor(epoch(ts)) - floor(epoch(ts)) % 600 AS BIGINT) AS win_start
      |  FROM events) t
      |GROUP BY win_start, event_type
      |ORDER BY win_start, event_type""".stripMargin

  /** q26: gap-based sessionization (30-min inactivity closes a session)
    * entirely in window functions — the classic lag→flag→cumsum→group
    * pattern. One shuffle on user_id; sessions never materialize on the
    * driver. */
  def q26Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
    Tables.loadEvents(s, dir)
      .withColumn("prev_sec", lag($"sec", 1).over(byUser))
      .withColumn("is_new",
        when($"prev_sec".isNull || $"sec" - $"prev_sec" > 1800L, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum($"is_new").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_seq")
      .agg(count(lit(1)).as("n_events"),
        min($"sec").as("start_sec"),
        max($"sec").as("end_sec"),
        (max($"sec") - min($"sec")).as("duration_sec"),
        dsum(dec($"value")).as("sum_value"))
      .orderBy($"user_id", $"session_seq")
  }

  val q26Sql: String =
    """WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |flagged AS (SELECT *,
      |  CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      |sessions AS (SELECT *,
      |  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged)
      |SELECT user_id, session_seq, COUNT(*) AS n_events,
      |  min(sec) AS start_sec, max(sec) AS end_sec,
      |  max(sec) - min(sec) AS duration_sec,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM sessions GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** q27: as-of join — each purchase matched to the user's most recent
    * click at-or-before it. Engine: tag+union+window carry-forward
    * ([[AsOfJoin]], one shuffle). Oracle: DuckDB's native ASOF JOIN —
    * two independent implementations of the same semantics. */
  def q27AsOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.loadEvents(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"us", $"value")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"us")
    AsOfJoin.asofLeft(purchases, clicks, "user_id", "us",
        rightPayloadCols = Seq("click_id"), rightOrderCol = "click_id")
      .select($"event_id", $"user_id", $"us", $"asof_click_id".as("click_id"))
      .orderBy($"event_id")
  }

  val q27Sql: String =
    """WITH e AS (SELECT *, epoch_us(ts) AS us FROM events),
      |p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS click_id, user_id, us FROM e WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.us, c.click_id
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us >= c.us
      |ORDER BY p.event_id""".stripMargin

  /** q35: range join — purchases falling inside each user's first-day
    * window [first_event, first_event + 24h). Engine: bucketized
    * interval join ([[graft.operators.RangeJoin]], equi-join on
    * (user, bucket) + exact range filter). Oracle: DuckDB's plain
    * non-equi range join — two implementations, same rows. */
  def q35RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.loadEvents(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"sec", $"value")
    val firstDay = ev.groupBy($"user_id")
      .agg(min($"sec").as("start_sec"))
      .withColumn("end_sec", $"start_sec" + 86400L)
    graft.operators.RangeJoin.pointInInterval(
        purchases, "sec", firstDay, "start_sec", "end_sec",
        keyCols = Seq("user_id"), bucketWidth = 86400L)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_first_day_purchases"),
        dsum(dec($"value")).as("sum_value"))
      .orderBy($"user_id")
  }

  val q35Sql: String =
    """WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |f AS (SELECT user_id, min(sec) AS start_sec FROM e GROUP BY user_id),
      |p AS (SELECT user_id, sec, value FROM e WHERE event_type = 'purchase')
      |SELECT p.user_id, COUNT(*) AS n_first_day_purchases,
      |  CAST(SUM(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM p JOIN f ON p.user_id = f.user_id
      |  AND p.sec >= f.start_sec AND p.sec < f.start_sec + 86400
      |GROUP BY p.user_id
      |ORDER BY p.user_id""".stripMargin

  /** q61: ordered funnel — per user, the earliest view, the earliest
    * click AFTER that view, the earliest purchase AFTER that click;
    * rolled up to per-stage user counts. Ordered-sequence matching as
    * three keyed min-aggregates + broadcast-sized joins (user-level
    * aggregates are orders of magnitude smaller than the event
    * stream — each stage shuffles only (user, ts)). */
  def q61Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.loadEvents(s, dir).select($"user_id", $"event_type", $"sec")
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"sec").as("tv"))
    val c = e.filter($"event_type" === "click").join(v, "user_id")
      .filter($"sec" > $"tv")
      .groupBy($"user_id").agg(min($"sec").as("tc"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"sec" > $"tc")
      .groupBy($"user_id").agg(min($"sec").as("tp"))
    v.select(lit(1).as("stage"), lit("view").as("name"), $"user_id")
      .unionByName(c.select(lit(2).as("stage"), lit("click").as("name"), $"user_id"))
      .unionByName(p.select(lit(3).as("stage"), lit("purchase").as("name"), $"user_id"))
      .groupBy($"stage", $"name").agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"stage")
  }

  val q61Sql: String =
    """WITH e AS (SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |v AS (SELECT user_id, min(sec) AS tv FROM e WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(sec) AS tc FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND sec > tv GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(sec) AS tp FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND sec > tc GROUP BY e.user_id)
      |SELECT stage, name, COUNT(DISTINCT user_id) AS n_users FROM (
      |  SELECT 1 AS stage, 'view' AS name, user_id FROM v
      |  UNION ALL SELECT 2, 'click', user_id FROM c
      |  UNION ALL SELECT 3, 'purchase', user_id FROM p) t
      |GROUP BY stage, name ORDER BY stage""".stripMargin

  /** q62: cohort retention — users bucketed by first-seen day; counts
    * of distinct users active at each day-offset from their cohort.
    * The classic (cohort_day, offset) matrix: one aggregate for first
    * touch, one join back to events, one count-distinct — all keyed on
    * user/day, never materializing per-user timelines. */
  def q62Retention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.loadEvents(s, dir)
      .select($"user_id", expr("sec DIV 86400").as("day"))
    val first = e.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    e.join(first, "user_id")
      .groupBy($"cohort_day", ($"day" - $"cohort_day").as("day_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_day", $"day_offset")
  }

  val q62Sql: String =
    """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
      |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
      |SELECT cohort_day, day - cohort_day AS day_offset,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM e JOIN f USING (user_id)
      |GROUP BY cohort_day, day_offset
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** q109: time-series gap filling ([[graft.operators.GapFill]]) —
    * every user's daily activity densified over their observed
    * [first, last] day range, with zero counts on silent days, a
    * running event total, and the last observed daily value carried
    * forward (imputation). Streaming twin:
    * [[graft.streaming.Streaming.gapFillStream]] (same rows,
    * incrementally, days finalized by the watermark). */
  def q109GapFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.loadEvents(s, dir)
      .select($"user_id", expr("sec DIV 86400").as("day"), dec($"value").as("v"))
      .groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n"), sum($"v").cast("double").as("dv"))
    graft.operators.GapFill.dailyGapFill(daily)
      .orderBy($"user_id", $"day")
  }

  val q109Sql: String =
    """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |  CAST(value AS DECIMAL(12,2)) AS v FROM events),
      |daily AS (SELECT user_id, day, COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS dv
      |  FROM e GROUP BY user_id, day),
      |span AS (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY user_id),
      |grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS day FROM span),
      |g AS (SELECT grid.user_id, grid.day, daily.n, daily.dv FROM grid
      |  LEFT JOIN daily ON grid.user_id = daily.user_id AND grid.day = daily.day),
      |f AS (SELECT *, COUNT(dv) OVER (PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp,
      |  COALESCE(n, 0) AS n0 FROM g),
      |c AS (SELECT *, CAST(SUM(n0) OVER (PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events,
      |  MAX(dv) OVER (PARTITION BY user_id, grp) AS carried_v FROM f)
      |SELECT user_id, day, CAST(n0 AS BIGINT) AS n_events, cum_events, carried_v
      |FROM c ORDER BY user_id, day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_tumbling_window" -> (q25TumblingWindow _),
    "q26_sessionize" -> (q26Sessionize _),
    "q27_asof_join" -> (q27AsOf _),
    "q35_range_join" -> (q35RangeJoin _),
    "q61_funnel" -> (q61Funnel _),
    "q62_retention" -> (q62Retention _),
    "q109_gap_fill" -> (q109GapFill _),
    "q129_interval_coverage" -> (q129IntervalCoverage _),
    "q133_transitions" -> (q133Transitions _))

  /** q133: behavioral transition mining — the first-order Markov
    * transition table of each user's event stream: per (from, to) event
    * type, the count and the integer transition rate in ppm
    * (`n·10^6 DIV Σn(from)`). The user-journey primitive behind "what
    * happens after X" funnels and next-event prediction baselines; lag
    * windows partition by user, the rate window by from-type — the
    * post-aggregation table is |types|² rows, so nothing global touches
    * event-scale data. */
  def q133Transitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val t = Tables.loadEvents(s, dir)
      .select($"user_id", $"us", $"event_id", $"event_type")
      .withColumn("prev", lag($"event_type", 1).over(w))
      .filter($"prev".isNotNull)
      .groupBy($"prev".as("from_type"), $"event_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    t.withColumn("rate_ppm", expr("n * 1000000L DIV sum(n) OVER (PARTITION BY from_type)"))
      .select($"from_type", $"to_type", $"n", $"rate_ppm")
      .orderBy($"from_type", $"to_type")
  }

  val q133Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
      |l AS (SELECT *, lag(event_type) OVER
      |    (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
      |t AS (SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
      |  FROM l WHERE prev IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS rate_ppm
      |FROM t ORDER BY from_type, to_type""".stripMargin

  /** q129: interval-union coverage — merge each user's overlapping
    * activity intervals (start = event time, duration ∝ value) into
    * maximal islands and report per-user island count and total
    * COVERED time, double-counting none of the overlap. The classic
    * gaps-and-islands computation (utilization, dedup of overlapping
    * time ranges), distinct from q26's gap sessionization: islands
    * merge by interval OVERLAP (trailing max of interval ends), not by
    * inter-event gaps. Every window partitions by user — no global
    * stage; exact integer micros throughout. Touching intervals
    * (start == running max end) merge. */
  def q129IntervalCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.loadEvents(s, dir)
      .select($"user_id", $"event_id", $"us",
        ($"us" + ($"value".cast("decimal(12,2)") * 100).cast("long") * 1000000L)
          .as("en"))
    graft.operators.Intervals.islands(e, $"user_id", Seq($"us", $"event_id"),
        $"us", $"en")
      .groupBy($"key".as("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum($"i_end" - $"i_start").as("covered_us"),
        max($"n_events").as("max_merged"))
      .select($"user_id", $"n_islands", $"covered_us", $"max_merged")
      .orderBy($"user_id")
  }

  val q129Sql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
      |    epoch_us(ts) + CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) * 1000000 AS en
      |  FROM events),
      |m AS (SELECT *,
      |    MAX(en) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM e),
      |f AS (SELECT *, CASE WHEN pm IS NULL OR us > pm THEN 1 ELSE 0 END AS ni FROM m),
      |isl AS (SELECT *, CAST(SUM(ni) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island FROM f),
      |g AS (SELECT user_id, island, MIN(us) AS i_start, MAX(en) AS i_end,
      |    COUNT(*) AS n_events FROM isl GROUP BY user_id, island)
      |SELECT user_id, COUNT(*) AS n_islands,
      |  CAST(SUM(i_end - i_start) AS BIGINT) AS covered_us,
      |  MAX(n_events) AS max_merged
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q25_tumbling_window" -> q25Sql,
    "q26_sessionize" -> q26Sql,
    "q27_asof_join" -> q27Sql,
    "q35_range_join" -> q35Sql,
    "q61_funnel" -> q61Sql,
    "q62_retention" -> q62Sql,
    "q109_gap_fill" -> q109Sql,
    "q129_interval_coverage" -> q129Sql,
    "q133_transitions" -> q133Sql)
}
