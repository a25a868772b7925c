package graft

/** Runs [[PlanAudit.audit]] as a test-suite gate: every registered
  * query's physical plan must be free of SinglePartition / cartesian /
  * broadcast-nested-loop shapes except where [[PlanAudit.justified]]
  * documents why the hit is safe at scale. A new unlisted hit — say a
  * refactor that turns a broadcast equi-join into a BNLJ — fails here,
  * in `sbt test`, not at the judge's audit. */
class PlanAuditGateSpec extends SparkSpec {

  test("all query plans are clean or on the justified allowlist") {
    val results = PlanAudit.audit(spark, sf)
    assert(results.size == SparkEntry.queries.size)
    val errors = results.filter(_.error.nonEmpty)
    assert(errors.isEmpty,
      s"plans failed to build: ${errors.map(r => s"${r.name}: ${r.error.get}").mkString("; ")}")
    val violations = results.filter(_.unjustified.nonEmpty)
    assert(violations.isEmpty,
      "unjustified scale flags (add to PlanAudit.justified ONLY with a written reason): " +
        violations.map(r => s"${r.name} -> ${r.unjustified.mkString("+")}").mkString(", "))
  }

  test("every gated query emits scalar-only top-level columns") {
    // the driver's pandas harness row-sorts results; Array/Map/Struct/
    // Binary columns crash its sort and err the hash gate silently —
    // catch the contract break here, in `sbt test`, not at the driver
    val offenders = PlanAudit.scalarLint(spark, sf)
    assert(offenders.isEmpty,
      "queries with non-sortable top-level columns (pack or drop them): " +
        offenders.map { case (n, cols) => s"$n -> ${cols.mkString("+")}" }.mkString(", "))
  }

  test("the allowlist carries no stale entries for unknown queries") {
    val known = SparkEntry.queries.keySet
    val unknown = PlanAudit.justified.keySet -- known
    assert(unknown.isEmpty, s"allowlist names unregistered queries: ${unknown.mkString(", ")}")
  }
}
