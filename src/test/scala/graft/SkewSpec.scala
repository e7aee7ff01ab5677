package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ordKeyed = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(ordKeyed, "l_orderkey")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(li, ordKeyed, "l_orderkey", salts = 8)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salted two-phase aggregation equals the direct aggregation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), (r.getDecimal(1), r.getLong(2)))).toMap
    val salted = Skew.saltedAgg(li, "l_returnflag", salts = 8,
      partials = Seq(sum(col("l_quantity").cast("decimal(18,2)")).as("ps"),
        count(lit(1)).as("pn")),
      merges = Seq(sum(col("ps")).as("s"), sum(col("pn")).as("n"))).collect()
      .map(r => (r.getString(0), (r.getDecimal(1), r.getLong(2)))).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(direct(k)._1.compareTo(s) === 0)
      assert(direct(k)._2 === n)
    }
  }
}
