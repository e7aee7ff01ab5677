package graft

import org.apache.spark.sql.functions.col
import graft.etl.Expectations

class ExpectationsSpec extends SparkSpec {

  test("a dirty frame yields exact violation counts; budgets decide passed") {
    val s2 = spark
    import s2.implicits._
    val df = Seq(
      (1L, Some("a"), 10.0),
      (2L, None, -1.0),
      (2L, Some("c"), 5.0),  // duplicate id
      (3L, None, 0.0)
    ).toDF("id", "name", "amount")
    val got = Expectations.expectations(df,
      checks = Seq(
        ("name_complete", col("name").isNull, 1L),  // 2 nulls > budget 1
        ("amount_positive", col("amount") <= 0, 2L)), // 2 violations = budget
      uniqueKeys = Seq(("id_unique", col("id"), 0L)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got === Seq(
      ("amount_positive", 2L, 4L, true),
      ("id_unique", 1L, 4L, false),
      ("name_complete", 2L, 4L, false)))
  }

  test("an empty frame reports 0 violations / passed, not null verdicts") {
    val s2 = spark
    import s2.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val got = Expectations.expectations(empty,
      checks = Seq(("name_complete", col("name").isNull, 0L)),
      uniqueKeys = Seq(("id_unique", col("id"), 0L))).collect()
    assert(got.length === 2)
    got.foreach { r =>
      assert(r.getAs[Long]("violations") === 0L)
      assert(r.getAs[Long]("total") === 0L)
      assert(r.getAs[Boolean]("passed"))
    }
    intercept[IllegalArgumentException] {
      Expectations.expectations(empty, Nil, Nil)
    }
  }

  test("a clean frame passes every check in the orders contract") {
    val rows = Expectations.ordersContract(spark, sf).collect()
    assert(rows.length === 6)
    assert(rows.forall(_.getAs[Boolean]("passed")),
      s"gate-data contract must be clean: ${rows.mkString(", ")}")
    assert(rows.forall(_.getAs[Long]("violations") === 0L))
  }

  test("colliding or empty check names fail fast, not as an ambiguous-reference error") {
    val s2 = spark
    import s2.implicits._
    val df = Seq((1L, 2.0)).toDF("k", "v")
    val dup = intercept[IllegalArgumentException] {
      Expectations.expectations(df,
        checks = Seq(("k_ok", col("k").isNull, 0L)),
        uniqueKeys = Seq(("k_ok", col("k"), 0L)))
    }
    assert(dup.getMessage.contains("duplicate check name"), dup.getMessage)
    assert(dup.getMessage.contains("k_ok"), dup.getMessage)
    val empty = intercept[IllegalArgumentException] {
      Expectations.expectations(df, checks = Seq(("", col("k").isNull, 0L)))
    }
    assert(empty.getMessage.contains("empty check name"), empty.getMessage)
  }

  test("quarantine routes rows by the same predicates the report counts") {
    val s2 = spark
    import s2.implicits._
    val df = Seq(
      (1L, Some("a"), 10.0),
      (2L, None, -1.0),     // two violations
      (3L, Some("c"), 0.0), // one violation
      (4L, Some("d"), 4.0)
    ).toDF("id", "name", "amount")
    val checks = Seq(
      ("name_complete", col("name").isNull, 0L),
      ("amount_positive", col("amount") <= 0, 0L))
    val (clean, bad) = Expectations.quarantine(df, checks)
    assert(clean.select("id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 4L))
    val tags = bad.select(col("id"), col("violated")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).sorted).toMap
    assert(tags === Map(
      2L -> Seq("amount_positive", "name_complete"),
      3L -> Seq("amount_positive")))
    // routed counts agree with the report's verdict counts per check
    val report = Expectations.expectations(df, checks).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Long]("violations")).toMap
    checks.foreach { case (n, _, _) =>
      assert(report(n) === tags.values.count(_.contains(n)).toLong)
    }
    // a row where a predicate cannot evaluate is NOT clean
    val nullPred = Seq((1L, Option.empty[java.lang.Double]))
      .toDF("id", "x")
    val (c2, b2) = Expectations.quarantine(nullPred,
      Seq(("x_positive", col("x") <= 0, 0L)))
    assert(c2.count() === 0 && b2.count() === 1)
  }

  test("the contract compiles to one aggregation pass (no per-check scans)") {
    val plan = Expectations.ordersContract(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"expected one scan, plan:\n$plan")
  }
}
