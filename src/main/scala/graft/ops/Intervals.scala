package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import graft.Tables

/** Interval (range) joins without an equi key — the case Spark plans as a
  * BroadcastNestedLoopJoin (a cross product) if you write the predicate
  * directly.
  *
  * [[pointInInterval]] is the scalable rewrite: bin the number line into
  * fixed-width buckets, explode each interval to the buckets it overlaps,
  * join points to their single bucket equi-wise, then filter exact
  * containment. Work is |candidates-sharing-a-bucket|, not |L|·|R|, and
  * the join is a plain hash shuffle AQE can balance. Bucket width trades
  * replication (long intervals → many buckets) against candidate density;
  * pick ≈ the median interval length.
  */
object Intervals {

  /** Join `points` rows into `intervals` rows where
    * `lo <= point < hi`. Both sides keep all their columns (names must not
    * collide). `binWidth` in the same units as the bounds.
    */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
      lo: Column, hi: Column, point: Column, binWidth: Long): DataFrame = {
    val loB = floor(lo / binWidth).cast(LongType)
    // hi is exclusive: an interval touching a bucket boundary must not
    // claim the next bucket, hence the (hi-1) upper bin
    val hiB = floor((hi - 1) / binWidth).cast(LongType)
    val binned = intervals
      .withColumn("__lo", lo).withColumn("__hi", hi)
      .withColumn("__bin", explode(sequence(loB, hiB)))
    val pointed = points
      .withColumn("__pt", point)
      .withColumn("__bin", floor(point / binWidth).cast(LongType))
    binned.join(pointed, "__bin")
      .filter(col("__pt") >= col("__lo") && col("__pt") < col("__hi"))
      .drop("__bin", "__lo", "__hi", "__pt")
  }

  /** How many lineitems (any order's) shipped inside each order's first
    * 30 days, summarized by priority — a pure interval join (no shared
    * key), oracle-checked against DuckDB's native range join.
    *
    * The join predicate depends only on DAYS, and both inputs are
    * day-granular — so aggregation is pushed below the join: each side
    * collapses to (day, count) first (≈2.5k rows/side at ANY scale factor,
    * because the calendar doesn't grow with the data), the interval join
    * matches day-count rows, and the pair count is the product of counts.
    * Without this, every 30-day bin's candidate set is |orders_bin|×
    * |points_bin| of RAW rows — ~2×10⁹ at sf0.1 and quadratic in SF; with
    * it, the join cost is constant and only the two scans scale.
    */
  def shipmentsInWindow(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    def sec(c: Column): Column = c.cast(TimestampType).cast(LongType)
    val ord = t.orders
      .groupBy(col("o_orderpriority"), sec(col("o_orderdate")).as("start_sec"))
      .agg(count(lit(1)).as("n_ord"))
    val li = t.lineitem
      .groupBy(sec(col("l_shipdate")).as("ship_sec"))
      .agg(count(lit(1)).as("n_li"))
    pointInInterval(ord, li,
      lo = col("start_sec"), hi = col("start_sec") + lit(30L * 86400),
      point = col("ship_sec"), binWidth = 30L * 86400)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("n_ord") * col("n_li")).as("n_shipments"))
      .orderBy(col("o_orderpriority"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_interval_join" -> (shipmentsInWindow _))

  val oracles: Map[String, String] = Map(
    "q_interval_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_shipments
        |FROM orders JOIN lineitem
        |  ON epoch_ms(l_shipdate)//1000 >= epoch_ms(o_orderdate)//1000
        | AND epoch_ms(l_shipdate)//1000 < epoch_ms(o_orderdate)//1000 + 30*86400
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
