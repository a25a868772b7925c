package graft

import graft.ext.{Hll, PageRank}
import graft.operators.{AnomalyDetect, PowerHistogram}
import org.apache.spark.sql.functions._

/** Specs for the analytics operators: sliding z-score anomaly
  * detection, HLL join-cardinality estimation, power-of-two quantile
  * histogram, integer PageRank. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sliding z-score flags the spike, not the steady state") {
    // key 1: eight 10.0s, then 100.0 (spike), then 10.0 again
    val rows = ((1 to 8).map(i => (1L, i.toLong, 10.0)) ++
      Seq((1L, 9L, 100.0), (1L, 10L, 10.0))).toDF("k", "t", "v")
    val out = AnomalyDetect.slidingZScore(rows, $"k", Seq($"t"), $"v",
        lookback = 8, minPrev = 4)
      .select($"t", $"z").as[(Long, Option[Double])].collect().toMap
    // constant trailing window -> zero variance -> null z
    assert((1L to 8L).forall(out(_).isEmpty))
    assert(out(9L).isEmpty, "spike's own window is constant -> no z")
    // row 10's window now contains the spike: variance > 0, z defined
    // and small (10.0 is close to the window mean's low side)
    assert(out(10L).isDefined)
  }

  test("sliding z-score needs minPrev trailing events") {
    val rows = Seq((1L, 1L, 1.0), (1L, 2L, 5.0), (1L, 3L, 2.0), (1L, 4L, 9.0),
      (1L, 5L, 3.0)).toDF("k", "t", "v")
    val out = AnomalyDetect.slidingZScore(rows, $"k", Seq($"t"), $"v",
        lookback = 8, minPrev = 4)
      .select($"t", $"n_prev", $"z").as[(Long, Long, Option[Double])].collect()
    out.foreach { case (t, nPrev, z) =>
      assert(nPrev == t - 1)
      if (nPrev < 4) assert(z.isEmpty, s"t=$t must not be scored with $nPrev prior")
    }
  }

  test("hll join-cardinality estimates track the exact sizes (n >> m regime)") {
    // two overlapping 2000-key sets, true intersection 1000 — well
    // above 2.5m so the raw estimate applies without correction
    val a = spark.range(0, 2000).select($"id".as("k"))
    val b = spark.range(1000, 3000).select($"id".as("k"))
    val ra = Hll.registers(a, $"k")
    val rb = Hll.registers(b, $"k")
    val rm = ra.select($"bucket", $"r".as("ra"))
      .join(rb.select($"bucket", $"r".as("rb")), "bucket")
      .select(greatest($"ra", $"rb").as("r"))
    def est(reg: org.apache.spark.sql.DataFrame): Double =
      Hll.sumPow(reg).select(Hll.estExpr($"sum_pow")).as[Double].head()
    val (estA, estB, estU) = (est(ra), est(rb), est(rm))
    assert(math.abs(estA - 2000) / 2000 < 0.26, s"est_a $estA")
    assert(math.abs(estU - 3000) / 3000 < 0.26, s"est_union $estU")
    // inclusion-exclusion compounds three estimates' errors
    val estI = estA + estB - estU
    assert(math.abs(estI - 1000) / 1000 < 0.6, s"est_intersect $estI")
    // and the q82 output row stays internally consistent at sf0.001
    val (qa, qb, qu, _, exact) = graft.queries.AnalyticsQueries.q82JoinCard(spark, sf)
      .as[(Double, Double, Double, Double, Long)].head()
    assert(exact == 150L)
    assert(qu <= qa + qb)
  }

  test("power histogram partitions the value range and marks quantiles") {
    // values 1..1000: bit-length buckets 1..10; p50 target rank 500
    // falls in bucket 9 (256..511), p95 rank 950 in bucket 10
    val df = spark.range(1, 1001).select($"id".as("v"))
    val h = PowerHistogram.bitLenHistogram(df, $"v").orderBy($"bucket")
      .select($"bucket", $"lo", $"hi", $"n", $"cum", $"is_p50", $"is_p95")
      .as[(Long, Long, Long, Long, Long, Int, Int)].collect()
    assert(h.map(_._4).sum == 1000, "counts cover every row")
    h.foreach { case (b, lo, hi, n, _, _, _) =>
      assert(lo == (1L << (b - 1)) && hi == (1L << b) - 1)
      assert(n == math.min(hi, 1000L) - lo + 1, s"bucket $b holds its full range")
    }
    assert(h.filter(_._6 == 1).map(_._1).toSeq == Seq(9L), "p50 in [256,511]")
    assert(h.filter(_._7 == 1).map(_._1).toSeq == Seq(10L), "p95 in [512,1023]")
  }

  test("pagerank ranks the hub of a star above the leaves, deterministically") {
    // star: hub 0 <-> leaves 1..6 (both directions)
    val base = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    val edges = base.unionByName(base.select($"dst".as("src"), $"src".as("dst")))
    val r = PageRank.ranks(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert((1L to 6L).forall(i => r(0L) > r(i)), s"hub must outrank leaves: $r")
    assert((1L to 6L).map(r).distinct.size == 1, "leaves are symmetric")
    val r2 = PageRank.ranks(edges, iters = 2).as[(Long, Long)].collect().toMap
    assert(r === r2, "integer pagerank must be bit-deterministic")
  }

  test("pagerank matches an exact in-memory reference on an irregular graph") {
    def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = vs.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val m = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        edges.foreach { case (s, d) => m(d) += r(s) / deg(s) }
        r = vs.map(v => v -> (150000L + m(v) * 85L / 100L)).toMap
      }
      r
    }
    // irregular digraph with a cycle, a chord, and asymmetric degrees
    val es = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L), (2L, 3L))
    val got = PageRank.ranks(es.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === ref(es, 3))
  }

  test("fixpoint pagerank converges to an exact idempotent fixed point") {
    def ref(edges: Seq[(Long, Long)], r: Map[Long, Long]): Map[Long, Long] = {
      val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val m = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) => m(d) += r(s) / deg(s) }
      vs.map(v => v -> (500000L + m(v) / 2L)).toMap
    }
    val es = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L), (2L, 3L),
      (1L, 0L), (3L, 2L))
    val (df, depth) = PageRank.ranksToFixpoint(es.toDF("src", "dst"))
    val got = df.as[(Long, Long)].collect().toMap
    // one more reference application changes nothing: a TRUE fixed point
    assert(ref(es, got) === got, "returned ranks must be F-idempotent")
    assert(depth >= 2 && depth <= 48, s"implausible convergence depth $depth")
  }

  test("pagerank fixpoint serve gate detects a perturbed artifact") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // the q119 serve path loads persisted ranks and re-verifies
    // idempotency with ONE application; a tampered artifact must fail
    // that gate (node 0's recomputed rank comes from its unchanged
    // predecessors, so any local perturbation is visible immediately)
    val es = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L), (2L, 3L),
      (1L, 0L), (3L, 2L))
    val g = PageRank.prepare(es.toDF("src", "dst"))
    val (r, _) = PageRank.ranksToFixpointOn(g)
    def changedUnderOneApplication(ranks: org.apache.spark.sql.DataFrame): Long = {
      val applied = PageRank.stepPlan(g, ranks,
          lit(PageRank.FixTeleport), "coalesce(m, 0L) DIV 2")
        .select(col("id"), col("rank").as("rank_applied"))
      ranks.join(applied, "id").filter(col("rank") =!= col("rank_applied")).count()
    }
    assert(changedUnderOneApplication(r) == 0L, "true fixed point must pass the gate")
    val tampered = r.withColumn("rank",
      when(col("id") === 0L, col("rank") + 7L).otherwise(col("rank")))
    assert(changedUnderOneApplication(tampered) > 0L,
      "a perturbed artifact must fail the serve gate")
    g.unpersistAll()
  }

  test("multi-source BFS: exact hop distances, frontier stop, unreachable absent") {
    import graft.ext.Bfs
    // path 1→2→3→4, shortcut 0→3, island 9→10; seeds {0, 1, 99}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L), (9L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(0L, 1L, 99L).toDF("id")
    val (d, rounds) = Bfs.distances(edges, seeds)
    val got = d.as[(Long, Long)].collect().toMap
    // 3 is reached at hop 1 via the 0→3 shortcut, not hop 2 via the path
    assert(got === Map(0L -> 0L, 1L -> 0L, 99L -> 0L,
      2L -> 1L, 3L -> 1L, 4L -> 2L))
    assert(rounds === 2)
    // maxRounds below the true depth must THROW, not truncate
    intercept[IllegalStateException] {
      Bfs.distances(edges, seeds, maxRounds = 1)
    }
  }

  test("interval islands merge overlap, touch, and containment; split on gaps") {
    import graft.operators.Intervals
    // A: [0,10]+[5,20] overlap, [20,30] touches -> one island [0,30];
    //    [40,50] with contained [42,45] -> island [40,50]
    // B: [0,5] and [10,15] -> two islands
    val rows = Seq(
      ("A", 1L, 0L, 10L), ("A", 2L, 5L, 20L), ("A", 3L, 20L, 30L),
      ("A", 4L, 40L, 50L), ("A", 5L, 42L, 45L),
      ("B", 6L, 0L, 5L), ("B", 7L, 10L, 15L))
      .toDF("k", "id", "s", "e")
    val got = Intervals.islands(rows, $"k", Seq($"s", $"id"), $"s", $"e")
      .select($"key", $"island", $"i_start", $"i_end", $"n_events")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("A", 1L, 0L, 30L, 3L), ("A", 2L, 40L, 50L, 2L),
      ("B", 1L, 0L, 5L, 1L), ("B", 2L, 10L, 15L, 1L)))
  }

  test("q119 engine convergence depth stays within the oracle's unroll") {
    // the oracle unrolls q119OracleRounds applications; the engine's
    // output is reproduced by depth−1 of them. Capping maxRounds at
    // the unroll+1 makes this spec THROW the moment data growth pushes
    // convergence past the oracle (the q105 recipe).
    import graft.queries.AnalyticsQueries
    val edges = AnalyticsQueries.thinPurchaseGraph(spark, sf)
    val (df, depth) = PageRank.ranksToFixpoint(edges,
      maxRounds = AnalyticsQueries.q119OracleRounds + 1)
    assert(df.count() > 0)
    assert(depth - 1 <= AnalyticsQueries.q119OracleRounds,
      s"oracle unroll ${AnalyticsQueries.q119OracleRounds} no longer covers depth $depth")
  }

  test("CUSUM alarms on a sustained shift, restarts, and matches an independent fold") {
    // user 1: 20 quiet events at 100 cents, then 10 shifted at 400 —
    // the shift accumulates ~+260/event against target+slack and must
    // alarm; user 2: constant series, S stays 0, no alarm ever
    val rows =
      (1 to 20).map(i => (1L, i.toLong, 100L + i, 100L)) ++
        (21 to 30).map(i => (1L, i.toLong, 100L + i, 400L)) ++
        (1 to 10).map(i => (2L, i.toLong, 200L + i, 70L))
    val df = rows.toDF("user_id", "us", "event_id", "cents")
    val out = graft.operators.AnomalyDetect.cusum(df)
      .select($"user_id", $"n_events", $"target_cents", $"n_alarms",
        $"first_alarm_event_id", $"max_s")
      .as[(Long, Long, Long, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> r).toMap
    // independent Scala fold over the same definition
    def fold(xs: Seq[(Long, Long)]): (Long, Long, Option[Long], Long) = {
      val n = xs.size.toLong
      val target = xs.map(_._2).sum / n
      val (slack, h) = (target / 20, target * 2)
      var s = 0L; var maxs = 0L; var nal = 0L; var fid: Option[Long] = None
      for ((eid, c) <- xs) {
        val ns = math.max(0L, s + c - target - slack)
        maxs = math.max(maxs, ns)
        if (ns > h) { nal += 1; if (fid.isEmpty) fid = Some(eid); s = 0L }
        else s = ns
      }
      (target, nal, fid, maxs)
    }
    val u1 = fold(rows.filter(_._1 == 1L).sortBy(_._2).map(r => (r._3, r._4)))
    val u2 = fold(rows.filter(_._1 == 2L).sortBy(_._2).map(r => (r._3, r._4)))
    assert(out(1L) == ((1L, 30L, u1._1, u1._2, u1._3, u1._4)))
    assert(out(2L) == ((2L, 10L, u2._1, u2._2, u2._3, u2._4)))
    assert(u1._2 >= 1 && u1._3.nonEmpty, s"planted shift must alarm: $u1")
    assert(u2._2 == 0 && u2._3.isEmpty && u2._4 == 0, s"steady series must not: $u2")
  }

  test("robustOutliers: exact lower medians, MAD, and the outlier gate") {
    // key a: four 10s and one wild 1000 -> med 10, mad 0, 1 outlier;
    // the mean/stddev z-score would be dragged ~200 cents by the spike
    val rows = Seq(("a", 10L), ("a", 10L), ("a", 10L), ("a", 10L), ("a", 1000L)) ++
      (1 to 7).map(i => ("b", i.toLong))
    val df = rows.toDF("key", "cents")
    val out = graft.operators.AnomalyDetect.robustOutliers(df)
      .select($"key", $"n", $"med_cents", $"mad_cents", $"n_outliers", $"max_dev")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 5L, 10L, 0L, 1L, 990L)))
    // b: 1..7 -> med 4, devs sorted [0,1,1,2,2,3,3] -> mad 2; 5*mad=10 > all
    assert(out("b") == (("b", 7L, 4L, 2L, 0L, 3L)))
  }
}
