package graft

/**
 * COVERAGE.md's totals line is a claim about the registry — so derive it
 * from the registry (VERDICT r13 #5: the committed totals sat four rounds
 * stale at "156 registered queries" while the registry grew to 200+).
 * Same discipline as PlanDigestSpec: the doc states exact numbers, the
 * spec recomputes them from `SparkEntry`, drift fails with the fix inline.
 */
class CoverageDocSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("COVERAGE.md totals line matches the SparkEntry registry") {
    val oracled = SparkEntry.queries.size
    val specOnly = SparkEntry.specOnly.size
    val expected =
      s"Totals: **${oracled + specOnly} registered queries — " +
        s"$oracled DuckDB-oracled + $specOnly spec-only**"
    val doc = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")),
      "UTF-8")
    assert(doc.contains(expected),
      s"COVERAGE.md totals are stale — update the totals block to:\n  $expected")
    // every oracled query really has an oracle, and no spec-only entry
    // leaked one (the driver would silently hash-compare a sketch)
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
    assert(SparkEntry.specOnly.keySet.intersect(SparkEntry.queries.keySet).isEmpty)
  }
}
