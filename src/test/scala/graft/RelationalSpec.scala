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
}
