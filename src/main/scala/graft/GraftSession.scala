package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory.
  *
  * Scale-first defaults: AQE on (runtime partition coalescing + skew-join
  * splitting), explicit shuffle-partition discipline (32 on the local test
  * rig; on a real cluster callers pass `2-3 × total executor cores`), UTC
  * session time zone, and a broadcast threshold generous enough that every
  * TPC-H-ish dimension table (region/nation/supplier/part/customer at test
  * SFs) broadcasts instead of shuffling.
  */
object GraftSession {

  /** Apply graft's tuning to an arbitrary builder (used by Verify/Bench and
    * by library users who bring their own master/appName).
    */
  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // some events.parquet generations carry TIMESTAMP(NANOS), which
      // Spark's vectorized reader rejects; read those as nanos-epoch
      // LongType (micros generations read as timestamps and are normalized
      // by Tables.tsToNanos — the two configs together make the ts
      // representation generation-independent).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      // openCostInBytes exists to stop many SMALL files packing into one
      // split; its 4 MB default also FLOORS the split size of a single
      // small file (maxSplitBytes = max(openCost, bytes/minPartitionNum)),
      // which capped the 11 MB test-scale lineitem scan at 3 tasks on 32
      // cores — the percentile/PSI and decimal-sum aggregates ran 10x
      // under-parallel (guide §6.1). 256 KB keeps tiny dimension tables in
      // one task while letting a single mid-size file split to the core
      // count; at production file sizes (128 MB-1 GB) maxPartitionBytes
      // governs and this knob is inert. Values are unchanged by split
      // count: the money aggregates are decimal, percentile is exact.
      .config("spark.sql.files.openCostInBytes", (256L * 1024).toString)
      .config("spark.ui.enabled", "false")

  /** Shuffle-partition count for a real cluster: 2-3× total cores keeps
    * every core busy through stragglers while AQE coalesces the excess.
    * Use with [[tune]]: `tune(builder, clusterPartitions(executors, cores))`.
    */
  def clusterPartitions(executors: Int, coresPerExecutor: Int): Int =
    executors * coresPerExecutor * 2

  /** Local session for tests and ad-hoc runs. */
  def local(cpus: Int = 32, appName: String = "graft"): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cpus]").appName(appName), cpus)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
