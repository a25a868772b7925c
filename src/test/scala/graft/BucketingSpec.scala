package graft

import graft.operators.Bucketing
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed fact-fact join plans with zero Exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Bucketing.writeBucketed(
        Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
        "li_bucketed", "l_orderkey", buckets = 8)
      Bucketing.writeBucketed(
        Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
        "ord_bucketed", "o_orderkey", buckets = 8)
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "ord_bucketed",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected merge join over buckets:\n$plan")
      // correctness: same row count as the shuffled join
      val expected = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"), $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
