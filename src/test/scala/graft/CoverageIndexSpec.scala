package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md's query index is the file a new reader trusts — pin it
  * to the code so it cannot drift again (the r12 verdict caught the
  * header count lagging the query map by 12): the header's count must
  * equal `SparkEntry.queries.size`, every gated query must appear in
  * the index section, and the queries/oracle maps must stay aligned. */
class CoverageIndexSpec extends AnyFunSuite {

  private lazy val coverage: String = {
    val p = java.nio.file.Paths.get("COVERAGE.md")
    new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  private lazy val indexSection: String = {
    val start = coverage.indexOf("## Query index")
    assert(start >= 0, "COVERAGE.md lost its '## Query index' section")
    val end = coverage.indexOf("## Scale evidence", start)
    assert(end > start, "COVERAGE.md lost its '## Scale evidence' section")
    coverage.substring(start, end)
  }

  test("the index header count equals SparkEntry.queries.size") {
    val m = raw"## Query index \(all (\d+) driver-gated queries\)".r
      .findFirstMatchIn(coverage)
    assert(m.isDefined, "index header must state the query count")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"COVERAGE.md header says ${m.get.group(1)} but SparkEntry has " +
        s"${SparkEntry.queries.size} queries — update the index")
  }

  test("every gated query appears in the index section") {
    val listed = raw"`([a-z0-9_]+)`".r.findAllMatchIn(indexSection)
      .map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet -- listed
    assert(missing.isEmpty,
      s"queries missing from COVERAGE.md's index: ${missing.toSeq.sorted}")
  }

  test("every oracle key has a query and every query an oracle") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet)
      .isEmpty, "oracle without a query")
    assert((SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
      .isEmpty, "query without an oracle (the driver records a weaker " +
        "rows-only check — this engine gates everything)")
  }
}
