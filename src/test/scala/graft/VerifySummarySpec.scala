package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The round gate's own evidentiary trail: `Verify.run` writes a
  * verify_summary.json that stays COMPLETE when queries throw and
  * visibly turns red — so an empty driver-side correctness artifact is
  * distinguishable from a red gate at a glance. */
class VerifySummarySpec extends SparkSpec {

  private def tmpOut(): String =
    Files.createTempDirectory("graft_verify").toString

  private def summary(outDir: String): String =
    Files.readString(Paths.get(s"$outDir/verify_summary.json"))

  test("a green run writes an ALL-GREEN summary with per-query rows") {
    val out = tmpOut()
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "qa_three_rows" -> ((s, _) => s.range(3).toDF("id")),
      "qb_one_row" -> ((s, _) => s.range(1).toDF("id")))
    val runs = Verify.run(spark, sf, out, qs)
    assert(runs.forall(_.ok))
    assert(runs.map(r => r.name -> r.rows).toMap ==
      Map("qa_three_rows" -> 3L, "qb_one_row" -> 1L))
    val j = summary(out)
    assert(j.contains("\"all_green\": true"))
    assert(j.contains("\"n_ok\": 2") && j.contains("\"n_failed\": 0"))
    assert(j.contains("\"qa_three_rows\": {\"ok\": true, \"rows\": 3"))
  }

  test("a deliberately broken query turns the summary red, not missing") {
    val out = tmpOut()
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "qa_good" -> ((s, _) => s.range(2).toDF("id")),
      "qb_broken" -> ((_, _) => sys.error("injected failure\twith\ncontrol chars")))
    val runs = Verify.run(spark, sf, out, qs)
    assert(runs.count(_.ok) == 1 && runs.count(!_.ok) == 1)
    val j = summary(out)
    assert(j.contains("\"all_green\": false"))
    assert(j.contains("\"n_ok\": 1") && j.contains("\"n_failed\": 1"))
    // the failed query is a RED ROW carrying its error, never absent
    assert(j.contains("\"qb_broken\": {\"ok\": false"))
    assert(j.contains("injected failure\\twith\\ncontrol chars"))
    // the healthy query's result still landed in full
    assert(spark.read.parquet(s"$out/qa_good").count() == 2L)
    // and the summary is machine-readable despite the control chars
    val parsed = spark.read.option("multiLine", true).json(s"$out/verify_summary.json")
    assert(parsed.select("all_green").head.getBoolean(0) == false)
  }
}
