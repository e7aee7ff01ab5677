package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Pins the documentation's claimed coverage numbers to the DERIVED truth
  * (SparkEntry's maps), so they cannot drift again: rounds 3 and 4 both
  * shipped hand-written counts that were stale by commit time. A claim the
  * docs print must be a claim this suite computes.
  */
class CountsSpec extends AnyFunSuite {

  private val nQueries = SparkEntry.queries.size
  private val nOracle = SparkEntry.oracleSql.size
  private val nRowsOnly = nQueries - nOracle

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  test("every oracle key names an implemented query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("README claims exactly the derived query counts") {
    val readme = read("README.md")
    assert(readme.contains(s"**$nQueries driver-checkable queries** " +
      s"($nOracle oracle-exact"),
      s"README must claim $nQueries driver-checkable / $nOracle oracle-exact")
    assert(readme.contains(s"$nRowsOnly rows-only"),
      s"README must claim $nRowsOnly rows-only")
  }

  test("SURVEY §9 claims exactly the derived query counts") {
    val survey = read("SURVEY.md")
    assert(survey.contains(s"**$nOracle oracle-backed + $nRowsOnly rows-only"),
      s"SURVEY §9 must claim $nOracle oracle-backed + $nRowsOnly rows-only")
  }

  test("every Bench headline name resolves to an implemented query") {
    val orphans = Bench.headline.toSet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"headline names without queries: $orphans")
  }

  test("the compact bench line stays inside the driver's 2000-char output tail") {
    // Bench prints a compact summary as its LAST stdout line precisely so
    // a 2000-char tail holds complete JSON; adding headline queries must
    // not silently outgrow that. Worst case per entry: "name":9.9,
    // (4 syntax chars + a 3-char one-decimal value — 10 s for ONE sf0.1
    // query is ~2× the historical per-query max; Bench additionally
    // falls back to whole-second precision at print time if the line
    // ever exceeds 1900 chars, so a freak run degrades precision instead
    // of truncating). The 230-char constant covers the fixed fields,
    // including the two loadavg strings.
    val worst = Bench.headline.map(n => n.length + 7).sum + 230
    assert(worst < 1900,
      s"estimated compact-line worst case $worst chars — trim precision or " +
        "split the headline before the driver tail truncates it again")
  }
}
