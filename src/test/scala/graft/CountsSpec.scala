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
    // a 2000-char tail holds complete JSON. Two layers keep that true as
    // the headline grows: at print time Bench falls back from one-decimal
    // to whole-second per-query values when the line would exceed 1900
    // chars, and THIS assertion pins the fallback's own worst case — every
    // entry at a 2-digit whole-second value ("name":99,) plus 230 chars of
    // fixed fields (including the two loadavg strings) must still fit.
    // One-decimal mode overflowing merely costs precision; the fallback
    // overflowing would truncate the artifact, so that is the hard bound.
    val worstFallback = Bench.headline.map(n => n.length + 6).sum + 230
    assert(worstFallback < 1900,
      s"estimated FALLBACK compact-line worst case $worstFallback chars — " +
        "split the headline before the driver tail truncates it again")
  }
}
