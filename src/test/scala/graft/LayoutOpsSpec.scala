package graft

import graft.operators.{Scd, ZOrder}
import graft.sources.DataSkipping
import org.apache.spark.sql.functions._

/** Specs for the storage-layout operators: SCD2 history build, Z-order
  * clustering, and min/max data-skipping pruning. */
class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- SCD2 -------------------------------------------------------

  test("scd2 collapses unchanged runs and versions changes per key") {
    // key 1: A A B A  -> versions A(1,ends 3), B(3,ends 4), A(4,current)
    // key 2: X        -> single current version
    val log = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "A"),
      (2L, 1L, "X"))
      .toDF("k", "ord", "status")
    val out = Scd.scd2(log, "k", $"ord", $"ord", tracked = Seq("status"))
      .orderBy($"k", $"version")
      .as[(Long, String, Long, Long, Option[Long], Int)].collect()
    assert(out === Array(
      (1L, "A", 1L, 1L, Some(3L), 0),
      (1L, "B", 2L, 3L, Some(4L), 0),
      (1L, "A", 3L, 4L, None, 1),
      (2L, "X", 1L, 1L, None, 1)))
  }

  test("scd2 has exactly one current version per key, and ranges tile") {
    val orders = Tables.load(spark, sf, "orders")
      .select($"o_custkey", $"o_orderstatus",
        unix_millis($"o_orderdate".cast("timestamp")).as("ms"), $"o_orderkey")
    val scd = Scd.scd2(orders, "o_custkey", $"ms", $"o_orderkey", Seq("o_orderstatus"))
      .cache()
    val perKey = scd.groupBy($"o_custkey")
      .agg(sum($"is_current").as("n_current"), count(lit(1)).as("n_versions"))
    assert(perKey.filter($"n_current" =!= 1).isEmpty, "exactly one open version per key")
    // each version's eff_to equals the next version's eff_from (tiling)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"version")
    val gaps = scd.withColumn("next_from", lead($"eff_from", 1).over(w))
      .filter($"next_from".isNotNull && $"eff_to" =!= $"next_from")
    assert(gaps.isEmpty, "effective ranges must tile without gaps")
    scd.unpersist()
  }

  test("scd2 merge equals full rebuild and leaves closed history untouched") {
    // key 1: A A | A B  (batch starts with the SAME state A -> boundary
    //   run collapse must absorb it into the open version)
    // key 2: X   | (untouched by the batch)
    // key 3:     | Y Y  (new key arriving only in the batch)
    val log = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 5L, "A"), (1L, 6L, "B"),
      (2L, 1L, "X"),
      (3L, 5L, "Y"), (3L, 6L, "Y"))
      .toDF("k", "ord", "status")
    val full = Scd.scd2(log, "k", $"ord", $"ord", Seq("status"))
    val existing = Scd.scd2(log.filter($"ord" < 5), "k", $"ord", $"ord", Seq("status"))
    val batch = log.filter($"ord" >= 5)
      .select($"k", $"status", $"ord", $"ord".as("tie"))
    val merged = Scd.merge(existing, batch, "k", Seq("status"))
    val cols = Seq("k", "status", "version", "eff_from", "eff_to", "is_current")
    assert(merged.select(cols.map(col): _*).except(full.select(cols.map(col): _*)).isEmpty &&
      full.select(cols.map(col): _*).except(merged.select(cols.map(col): _*)).isEmpty,
      "merge must be indistinguishable from a full rebuild")
    // and key 2's history row is bit-identical to the pre-merge table
    val before = existing.filter($"k" === 2L).collect().toSeq
    val after = merged.filter($"k" === 2L).collect().toSeq
    assert(before === after)
  }

  test("snapshotAt returns exactly one row per key covered at the instant") {
    val log = Seq((1L, 10L, "A"), (1L, 20L, "B"), (2L, 15L, "X"))
      .toDF("k", "ord", "status")
    val scd = Scd.scd2(log, "k", $"ord", $"ord", Seq("status"))
    // at t=12: key 1 is in version A; key 2 not yet born
    val at12 = Scd.snapshotAt(scd, lit(12L)).select($"k", $"status")
      .as[(Long, String)].collect().toSet
    assert(at12 === Set((1L, "A")))
    // at t=25: key 1 moved to B, key 2 at X
    val at25 = Scd.snapshotAt(scd, lit(25L)).select($"k", $"status")
      .as[(Long, String)].collect().toSet
    assert(at25 === Set((1L, "B"), (2L, "X")))
  }

  // ---- Z-order ----------------------------------------------------

  test("interleave16 places bits of x at even and y at odd positions") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L), (5L, 3L))
      .toDF("x", "y")
      .select(ZOrder.interleave16($"x", $"y").as("z"))
      .as[Long].collect()
    // reference: morton(5,3): x=101 -> bits at 0,4; y=011 -> bits at 1,3
    // z = 1 + 2 + 8 + 16 = 27... x bit0=1->pos0, x bit2=1->pos4,
    // y bit0=1->pos1, y bit1=1->pos3: 1+2+8+16 = 27
    assert(rows(0) == 0L)
    assert(rows(1) == 1L)
    assert(rows(2) == 2L)
    assert(rows(3) == 0x55555555L) // all even bits
    assert(rows(4) == 0xAAAAAAAAL) // all odd bits
    assert(rows(5) == 27L)
  }

  test("z-order buckets bound BOTH dimensions (the skipping property)") {
    // a dense 64x64 grid, bucketed into 16 equal z-ranges: every bucket
    // must be a 16x16 rectangle — range 15 in each dim, against 63 for
    // a single-dimension sort's minor key
    val grid = spark.range(64L * 64)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    val spans = grid.select($"x", $"y", ZOrder.interleave16($"x", $"y").as("z"))
      .groupBy(($"z" / 256).cast("long").as("bucket"))
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .agg(max($"sx").as("wx"), max($"sy").as("wy"))
      .as[(Long, Long)].head()
    assert(spans == ((15L, 15L)), s"each z-bucket must be a 16x16 tile, got $spans")
  }

  test("ZOrder.cluster yields disjoint, internally sorted z-ranges per partition") {
    val grid = spark.range(64L * 64)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    val ranges = ZOrder.cluster(grid, "x", "y", numPartitions = 8)
      .select($"z").as[Long]
      .mapPartitions { it =>
        val zs = it.toSeq
        if (zs.isEmpty) Iterator.empty
        else Iterator((zs.head, zs.last, zs.zip(zs.tail).forall(p => p._1 <= p._2)))
      }.collect()
    assert(ranges.nonEmpty && ranges.forall(_._3), "each partition sorted by z")
    val sorted = ranges.sortBy(_._1)
    sorted.zip(sorted.tail).foreach { case ((_, hiA, _), (loB, _, _)) =>
      assert(hiA <= loB, "partition z-ranges must not overlap")
    }
  }

  // ---- data skipping ----------------------------------------------

  test("pruned scan equals full filter on logical chunks") {
    val li = Tables.load(spark, sf, "lineitem")
      .select((year($"l_shipdate") * 100 + month($"l_shipdate")).cast("long").as("chunk"),
        unix_millis($"l_shipdate".cast("timestamp")).as("ms"))
    val man = DataSkipping.manifest(li, $"chunk", $"ms").localCheckpoint(false)
    val lo = lit(857952000000L); val hi = lit(866764800000L)
    val pruned = DataSkipping.prunedScan(li, $"chunk", $"ms", man, lo, hi).count()
    val full = li.filter($"ms" >= lo && $"ms" <= hi).count()
    assert(pruned === full, "pruning must not change the result")
    // and it must actually prune: kept chunks < total chunks
    val total = man.count(); val kept = DataSkipping.keptChunks(man, lo, hi).count()
    assert(kept < total, s"expected pruning, kept $kept of $total chunks")
  }

  test("pruned scan equals full filter on real parquet files") {
    // write lineitem sorted by shipdate across 4 files, then prune by
    // file-level min/max — the table-format manifest shape
    val dir = java.nio.file.Files.createTempDirectory("graft_skip").toString
    try {
      Tables.load(spark, sf, "lineitem")
        .select(unix_millis($"l_shipdate".cast("timestamp")).as("ms"), $"l_orderkey")
        .repartitionByRange(4, $"ms")
        .write.mode("overwrite").parquet(dir)
      val t0 = spark.read.parquet(dir)
      val man = DataSkipping.fileManifest(t0, $"ms").localCheckpoint(false)
      // the scan side materializes input_file_name() as a column too
      // (Catalyst rejects non-deterministic join conditions)
      val t = t0.withColumn("graft_file", input_file_name())
      val lo = lit(857952000000L); val hi = lit(866764800000L)
      val pruned = DataSkipping
        .prunedScan(t, $"graft_file", $"ms", man, lo, hi).count()
      val full = t.filter($"ms" >= lo && $"ms" <= hi).count()
      assert(pruned === full)
      assert(DataSkipping.keptChunks(man, lo, hi).count() < man.count(),
        "range-partitioned files must allow file-level pruning")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
