package graft

import org.apache.spark.sql.functions._

/** The 100 TB skew story has two legs: manual salting (q28/q41,
  * SkewedAgg) and Spark's own AQE skew-join rewrite, which splits an
  * oversized shuffle partition into parallel sub-reads at runtime.
  * This spec proves the AQE leg actually FIRES on a power-law key —
  * one hot key holding most of the rows — so skew resilience doesn't
  * rest on manual salting alone. Thresholds are shrunk to test scale;
  * the rewrite logic exercised is exactly what runs at 100 TB. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed partition of a power-law sort-merge join") {
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // both joins must stay sort-merge: AQE's skew rewrite targets SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // power-law: key 0 carries 50k fat rows, keys 1..40 carry 200 each.
      // The pad must be INCOMPRESSIBLE (per-row sha2, not a constant):
      // AQE sizes partitions by compressed shuffle bytes, and a constant
      // pad deflates the hot partition below any threshold
      def pad(salt: String) = sha2(concat(lit(salt), $"id".cast("string")), 512)
      val left = spark.range(0, 50000).select(lit(0L).as("k"), pad("a").as("pad"))
        .unionByName(spark.range(0, 8000).select(
          (($"id" % 40) + 1).as("k"), pad("b").as("pad")))
      val right = spark.range(0, 41).select($"id".as("k"), ($"id" * 2).as("v"))
        .unionByName(spark.range(0, 41).select($"id".as("k"), ($"id" * 3).as("v")))
      val joined = left.join(right, "k")

      // execute THIS frame (count() would plan its own aggregate query,
      // leaving joined.queryExecution un-executed with isFinalPlan=false)
      val n = joined.collect().length
      assert(n == (50000 + 8000) * 2, s"join produced $n rows")
      // AQE final plan: the hot partition must be marked skew-split
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE skew-join rewrite did not fire:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
