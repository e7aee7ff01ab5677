package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality expectations — the contract-check surface a
  * config-driven ETL loop (pyetl's shape) runs before promoting a load,
  * and the public Deequ/Great-Expectations idea re-expressed Spark-first:
  * a constraint LIST compiles into ONE aggregation pass over the frame
  * (every check is a conditional counter inside the same codegen'd
  * HashAggregate — no per-check scans, no driver loop), then the single
  * result row unpivots into one verdict row per check.
  *
  * Metrics are violation COUNTS, not ratios: counts are exact integers,
  * so the gate entry is oracle-exact (float ratios would hash-diverge on
  * summation order), and a violation budget maps directly onto them —
  * `passed = violations <= budget` (budget 0 = hard constraint). This is
  * the same violation-budget discipline as [[Sinks.auditedPromote]], which
  * gates a WRITE on `Dataset.observe` metrics; `expectations` is the
  * read-side report form a data contract audits with.
  *
  * At 100 TB: one scan, map-side partial aggregation to a single row —
  * the cheapest possible full-table audit; uniqueness adds the one
  * count_distinct (its own partial-agg tree, no extra scan of the rest).
  */
object Expectations {

  /** One row per check: (check, violations, total, passed).
    *
    * @param checks    (name, row-level VIOLATION predicate, budget) — a
    *   row matching the predicate is a violation; the check passes while
    *   violations stay within its budget.
    * @param uniqueKeys (name, key column, budget) — violations = rows in
    *   excess of distinct keys (0 when the key is unique).
    */
  def expectations(df: DataFrame,
      checks: Seq[(String, Column, Long)],
      uniqueKeys: Seq[(String, Column, Long)] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueKeys.nonEmpty,
      "expectations needs at least one check")
    // names become v_<name> aggregate columns: a duplicate (or empty) name
    // would surface only at runtime as an ambiguous-reference
    // AnalysisException that never mentions which config entry collided
    val names = checks.map(_._1) ++ uniqueKeys.map(_._1)
    require(names.forall(_.nonEmpty), "expectations: empty check name")
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"expectations: duplicate check name(s) [${dups.mkString(", ")}] — " +
        "check and uniqueKey names must be distinct")
    // coalesce: sum() over ZERO rows is NULL — an empty batch (the
    // streaming monitor's quiet interval) must report 0 violations /
    // passed, not null verdicts
    val aggs =
      checks.map { case (n, pred, _) =>
        coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(s"v_$n") } ++
      uniqueKeys.map { case (n, key, _) =>
        (count(lit(1)) - count_distinct(key)).as(s"v_$n") }
    val one = df.agg(aggs.head, aggs.tail :+ count(lit(1)).as("total"): _*)
    val verdicts = (checks ++ uniqueKeys.map { case (n, _, b) =>
      (n, lit(true), b) }).map { case (n, _, budget) =>
      struct(lit(n).as("check"), col(s"v_$n").as("violations"),
        col("total").as("total"),
        (col(s"v_$n") <= budget).as("passed"))
    }
    one.select(explode(array(verdicts: _*)).as("r"))
      .select(col("r.check"), col("r.violations"), col("r.total"),
        col("r.passed"))
      .orderBy(col("check"))
  }

  /** Row-level contract routing — the remediation half of the contract
    * story: split a frame into (clean, quarantined) on the SAME
    * violation predicates [[expectations]] reports on, so verdict counts
    * and routed row counts agree wherever a predicate evaluates. The one
    * deliberate divergence: a row where a predicate evaluates to NULL is
    * quarantined (it cannot be certified clean) but is NOT counted by
    * the report, which keeps SQL CASE semantics for oracle parity.
    * Quarantined rows carry a `violated` array naming every failed check
    * (the dead-letter convention: a row is fixed by replaying it after
    * the named checks pass). Both frames are pure map-side filters of
    * one scan — no shuffle, Catalyst shares the scan when both are
    * consumed. Key-uniqueness checks are aggregate-level by nature and
    * stay in [[expectations]]; routing is row-local by design.
    */
  def quarantine(df: DataFrame,
      checks: Seq[(String, Column, Long)]): (DataFrame, DataFrame) = {
    require(checks.nonEmpty, "quarantine needs at least one check")
    // null predicate results count as violations here: a row on which a
    // contract predicate cannot even evaluate does not belong in `clean`
    val flags = checks.map { case (n, pred, _) =>
      when(coalesce(pred, lit(true)), lit(n)) }
    val violated = filter(array(flags: _*), c => c.isNotNull)
    val tagged = df.withColumn("violated", violated)
    (tagged.filter(size(col("violated")) === 0).drop("violated"),
      tagged.filter(size(col("violated")) > 0))
  }

  /** Gate entry: a representative contract over `orders` — completeness,
    * domain membership, a pattern, a range and a bounded-staleness check
    * as row predicates, plus primary-key uniqueness. Every metric is an
    * exact count, so the whole report is oracle-checkable.
    */
  def ordersContract(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir).orders
    expectations(o,
      checks = Seq(
        ("custkey_complete", col("o_custkey").isNull, 0L),
        ("status_in_domain", !col("o_orderstatus").isin("O", "F", "P"), 0L),
        ("priority_pattern", !col("o_orderpriority").rlike("^[1-5]-"), 0L),
        ("totalprice_positive", col("o_totalprice") <= 0, 0L),
        ("orderdate_in_range",
          col("o_orderdate") < to_date(lit("1992-01-01")), 0L)),
      uniqueKeys = Seq(("orderkey_unique", col("o_orderkey"), 0L)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_expectations" -> (ordersContract _))

  val oracles: Map[String, String] = Map(
    "etl_expectations" ->
      """WITH m AS (SELECT
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS custkey_complete,
        |  CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS status_in_domain,
        |  CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT) AS priority_pattern,
        |  CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_positive,
        |  CAST(SUM(CASE WHEN o_orderdate < DATE '1992-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS orderdate_in_range,
        |  COUNT(*) - COUNT(DISTINCT o_orderkey) AS orderkey_unique,
        |  COUNT(*) AS total
        |FROM orders)
        |SELECT check_name AS "check", violations, total, violations <= 0 AS passed
        |FROM (
        |  SELECT 'custkey_complete' AS check_name, custkey_complete AS violations, total FROM m
        |  UNION ALL SELECT 'orderdate_in_range', orderdate_in_range, total FROM m
        |  UNION ALL SELECT 'orderkey_unique', orderkey_unique, total FROM m
        |  UNION ALL SELECT 'priority_pattern', priority_pattern, total FROM m
        |  UNION ALL SELECT 'status_in_domain', status_in_domain, total FROM m
        |  UNION ALL SELECT 'totalprice_positive', totalprice_positive, total FROM m)
        |ORDER BY check_name""".stripMargin)
}
