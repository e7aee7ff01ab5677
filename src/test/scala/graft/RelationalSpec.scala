package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("approx distinct is within the declared 2% HLL error of exact") {
    val exact = Relational.distinctCount(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_part")).toMap
    Relational.approxDistinct(spark, sf).collect().foreach { r =>
      val (flag, approx) = (r.getString(0), r.getAs[Long]("approx_part"))
      val e = exact(flag).toDouble
      assert(math.abs(approx - e) / e <= 0.05, s"$flag: approx=$approx exact=$e")
    }
  }

  test("approx percentiles track the exact quantiles") {
    val exact = Relational.percentiles(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    Relational.approxPercentiles(spark, sf).collect().foreach { r =>
      val approx = Seq(r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))
      exact(r.getString(0)).zip(approx).foreach { case (e, a) =>
        assert(math.abs(a - e) <= math.max(1.0, e * 0.1), s"exact=$e approx=$a")
      }
    }
  }

  test("q3 pushes the dim filters into the parquet scans") {
    val plan = Relational.q3ShippingPriority(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("c_mktsegment"), "customer filter must reach the scan")
    assert(plan.contains("l_shipdate"), "lineitem filter must reach the scan")
  }

  test("q3 broadcasts the filtered customer dimension") {
    val plan = Relational.q3ShippingPriority(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("scans prune columns to what the query needs") {
    val plan = Relational.topkOrders(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"))
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    val plan = Relational.topkOrders(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("grouping sets: both breakdowns and the grand total agree, in one scan") {
    val out = Relational.groupingSetsAgg(spark, sf).collect()
    val byGrp = out.groupBy(_.getAs[Long]("grp"))
    assert(byGrp.keySet === Set(1L, 2L, 3L))
    val grand = byGrp(3L)
    assert(grand.length === 1)
    val total = grand.head.getAs[Long]("n_orders")
    assert(byGrp(1L).map(_.getAs[Long]("n_orders")).sum === total)
    assert(byGrp(2L).map(_.getAs[Long]("n_orders")).sum === total)
    // one scan, one Expand — not a UNION of three aggregations
    val plan = Relational.groupingSetsAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert(!plan.contains("Union"))
  }

  test("string agg: rosters are sorted, complete, and order-independent") {
    val out = Relational.stringAgg(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val roster = r.getAs[String]("roster").split(",").toSeq
      assert(roster.size.toLong === r.getAs[Long]("n_suppliers"))
      assert(roster === roster.sorted, "roster must be deterministically sorted")
    }
  }

  test("retention: offset-0 diagonal is the cohort size and no cell exceeds it") {
    val out = Relational.retentionCohorts(spark, sf).collect()
    assert(out.nonEmpty)
    val day0 = out.filter(_.getAs[Long]("day_offset") == 0L)
      .map(r => r.getAs[Long]("cohort_day") -> r.getAs[Long]("n_active")).toMap
    out.foreach { r =>
      val cohort = r.getAs[Long]("cohort_day")
      assert(day0.contains(cohort), s"cohort $cohort missing its offset-0 cell")
      assert(r.getAs[Long]("n_active") <= day0(cohort),
        "no offset can retain more users than the cohort started with")
      assert(r.getAs[Long]("day_offset") >= 0L, "first day defines the cohort")
    }
    val nUsers = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(day0.values.sum === nUsers, "cohorts partition the user base")
  }

  test("funnel matches a brute-force per-user recomputation") {
    val events = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"),
        (col("ts") / 1000000000L).cast("long").as("sec"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Long]("sec")))
    val byUser = events.groupBy(_._1)
    val expected = byUser.toSeq.map { case (uid, evs) =>
      def minAfter(tp: String, from: Option[Long]): Option[Long] =
        from.flatMap(f => evs.filter(e => e._2 == tp && e._3 >= f)
          .map(_._3).minOption)
      val tView = evs.filter(_._2 == "view").map(_._3).minOption
      val tClick = minAfter("click", tView)
      val tPurchase = minAfter("purchase", tClick)
      (uid % 10, tView.isDefined, tClick.isDefined, tPurchase.isDefined)
    }.groupBy(_._1).map { case (bucket, us) =>
      bucket -> (us.size.toLong, us.count(_._2).toLong, us.count(_._3).toLong,
        us.count(_._4).toLong)
    }
    val got = Relational.funnelConversion(spark, sf).collect()
      .map(r => r.getAs[Long]("bucket") -> (r.getAs[Long]("n_users"),
        r.getAs[Long]("n_view"), r.getAs[Long]("n_view_click"),
        r.getAs[Long]("n_funnel"))).toMap
    assert(got === expected)
    got.values.foreach { case (u, v, c, p) =>
      assert(u >= v && v >= c && c >= p, "funnel stages only lose users")
    }
  }

  test("ewma satisfies the recursion s_t = 0.5·x_t + 0.5·s_{t-1} exactly, per user") {
    val rows = Relational.ewma(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Double]("value"), r.getAs[Double]("ewma")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, es) =>
      val sorted = es.sortBy(_._2)
      assert(sorted.head._4 === sorted.head._3, "s_0 must equal x_0")
      sorted.sliding(2).foreach {
        case Array((_, _, _, prev), (_, _, x, e)) =>
          assert(e === 0.5 * x + 0.5 * prev, "the recursion must hold bit-exactly")
        case _ =>
      }
    }
    // coverage: every event appears exactly once
    assert(rows.length === spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("order islands match a brute-force gaps-and-islands recomputation") {
    val months = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("m"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("m")))
    val expected = months.groupBy(_._1).toSeq.flatMap { case (cust, ms) =>
      val sorted = ms.map(_._2).distinct.sorted
      sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((s0, e0) :: rest, m) if m == e0 + 1 => (s0, m) :: rest
        case (acc, m) => (m, m) :: acc
      }.map { case (s0, e0) => (cust, s0, e0, e0 - s0 + 1) }
    }.toSet
    val got = Relational.orderIslands(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("start_month"),
        r.getAs[Long]("end_month"), r.getAs[Long]("n_months"))).toSet
    assert(got === expected)
  }
}
