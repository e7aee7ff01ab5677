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

  test("shuffle-heavy operators are output-invariant across partition geometries") {
    // guards the partition-discipline claim against a hardcoded-32
    // assumption. Geometry evidence spans processes: this suite runs the
    // whole surface at local[4]/shuffle=4 (spread = defaultParallelism =
    // 4) and the driver gate re-runs it at local[8]/shuffle=8; a second
    // in-JVM CONTEXT (different core count) is impossible, so what this
    // test varies is the session-scoped shuffle width — every exchange in
    // the plans below re-partitions differently at 16 vs 5, and the
    // results must not move. Chosen ops: minhashLsh (compiled kernel
    // chain + explicit repartitions + band self-join) and the curation
    // funnel (semi/anti joins + iterative components + range packing) —
    // the two most shuffle-shaped composites in the library.
    def pairs(): Set[(Long, Long)] =
      graft.ops.Dedup.minhashLsh(spark, sf).select("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def funnel(): Set[(Long, Long)] =
      graft.ops.Curation.prepareCorpus(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"))).toSet
    var at16: (Set[(Long, Long)], Set[(Long, Long)]) = null
    var at5: (Set[(Long, Long)], Set[(Long, Long)]) = null
    withConf("spark.sql.shuffle.partitions", "16") { at16 = (pairs(), funnel()) }
    withConf("spark.sql.shuffle.partitions", "5") { at5 = (pairs(), funnel()) }
    assert(at16._1.nonEmpty && at16._2.nonEmpty)
    assert(at16 === at5, "shuffle width must never change operator output")
  }
}
