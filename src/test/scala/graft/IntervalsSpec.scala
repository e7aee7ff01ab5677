package graft

import org.apache.spark.sql.functions._
import graft.ops.Intervals

class IntervalsSpec extends SparkSpec {

  test("binned interval join equals the naive cross-product filter") {
    import spark.implicits._
    val intervals = Seq((1L, 10L, 20L), (2L, 15L, 30L), (3L, 100L, 101L))
      .toDF("iid", "lo_v", "hi_v")
    val points = Seq((10L, 10L), (11L, 19L), (12L, 20L), (13L, 25L), (14L, 100L), (15L, 101L))
      .toDF("pid", "pt")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pairs(intervals.join(points,
      col("pt") >= col("lo_v") && col("pt") < col("hi_v")))
    // probe several bin widths incl. width 1 and wider-than-any-interval
    Seq(1L, 7L, 64L).foreach { w =>
      val binned = pairs(Intervals.pointInInterval(intervals, points,
        col("lo_v"), col("hi_v"), col("pt"), w))
      assert(binned === naive, s"binWidth=$w")
    }
    // boundary semantics: lo inclusive (10→iid1), hi exclusive (20∉iid1, 101∉iid3)
    assert(naive.contains((1L, 10L)))
    assert(!naive.contains((1L, 12L)))
    assert(!naive.contains((3L, 15L)))
  }

  test("interval join plans as an equi hash join, not a nested loop") {
    val plan = Intervals.shipmentsInWindow(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "binning must turn the range join into an equi join")
  }
}
