package graft

class GraftSessionSpec extends SparkSpec {

  test("tuned session carries the scale-discipline settings") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt > 0)
    // every test-SF dimension table must fit the broadcast threshold
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold").toLong >= 64L * 1024 * 1024)
  }

  test("cluster partition sizing follows the 2x-total-cores rule") {
    assert(GraftSession.clusterPartitions(executors = 250, coresPerExecutor = 4) === 2000)
    assert(GraftSession.clusterPartitions(1, 4) === 8)
  }
}
