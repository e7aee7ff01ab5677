package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf

class AsOfSpec extends SparkSpec {

  test("asof join attaches the nearest earlier right row per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "sec", "tag")
    val right = Seq((1L, 90L, 900L), (1L, 150L, 950L), (2L, 60L, 999L))
      .toDF("k", "sec", "payload")
    val out = AsOf.asofJoin(left, right, "k", "sec", Seq("payload"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("sec"),
        r.getAs[String]("tag"), Option(r.getAs[java.lang.Long]("payload")))).toSet
    assert(out === Set(
      (1L, 100L, "p1", Some(900L)),  // 90 <= 100 < 150
      (1L, 200L, "p2", Some(950L)),  // 150 is latest <= 200
      (2L, 50L, "p3", None)))        // no right row at or before 50
  }

  test("simultaneous right rows are visible to the left row") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p")).toDF("k", "sec", "tag")
    val right = Seq((1L, 100L, 7L)).toDF("k", "sec", "payload")
    val out = AsOf.asofJoin(left, right, "k", "sec", Seq("payload")).head
    assert(out.getAs[Long]("payload") === 7L)
  }

  test("purchase attribution: click always precedes (or ties) the purchase") {
    val out = AsOf.purchaseAttribution(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Option(r.getAs[java.lang.Long]("gap_sec")).foreach(g => assert(g >= 0))
    }
    // every purchase appears exactly once (left-preserving)
    val purchases = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(out.length.toLong === purchases)
  }
}
