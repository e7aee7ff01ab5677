package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Plan-asserted proofs for the remaining built-in scale features
  * (SURVEY §2.H): dynamic partition pruning and runtime Bloom-filter
  * joins. Both are free at 100 TB when the plan is shaped right — these
  * specs pin the shapes that trigger them, because neither fires on an
  * arbitrary join (DPP wants a broadcast dim with a REAL filter joined on
  * the partition column; Bloom injection skips broadcast joins entirely).
  */
class ScaleFeaturesSpec extends SparkSpec {

  private lazy val base = {
    val tmp = Files.createTempDirectory("graft-scalefeat").toString
    val ev = Tables(spark, sf).events
      .withColumn("day", date_format(
        timestamp_seconds((col("ts") / 1000000000L).cast("long")), "yyyy-MM-dd"))
    ev.write.partitionBy("day").mode("overwrite").parquet(s"$tmp/events")
    ev.select(col("day")).distinct()
      .write.mode("overwrite").parquet(s"$tmp/dim")
    tmp
  }

  test("a filtered dim joined on the partition column prunes fact partitions at runtime") {
    val fact = spark.read.parquet(s"$base/events")
    val dimAll = spark.read.parquet(s"$base/dim")
    val firstDay = dimAll.select(min(col("day"))).head.getString(0)
    val j = fact.join(dimAll.filter(col("day") === firstDay), Seq("day"))
      .groupBy(col("day")).count()
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a dynamic partition-pruning subquery:\n${plan.take(1500)}")
  }

  test("a selective shuffle join injects a runtime Bloom filter on the big side") {
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      withConf("spark.sql.optimizer.runtime.bloomFilter.enabled", "true") {
        withConf("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0") {
          val li = spark.read.parquet(s"$sf/lineitem.parquet")
          val ord = spark.read.parquet(s"$sf/orders.parquet")
            .filter(col("o_totalprice") > 100000)
          val b = li.join(ord, col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("l_returnflag")).count()
          b.collect()
          val plan = b.queryExecution.executedPlan.toString
          assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
            s"the lineitem scan must pre-filter through the orders bloom:\n${plan.take(1500)}")
        }
      }
    }
  }
}
