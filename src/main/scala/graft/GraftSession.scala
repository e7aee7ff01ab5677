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
      // openCostInBytes stays at the 4 MB DEFAULT. An r13 experiment
      // lowered it to 256 KB so a single mid-size file would split to the
      // core count (the 11 MB lineitem scan runs 3 tasks at 4 MB) — but a
      // 20-query best-of-5 A/B at sf0.1 measured the 256 KB setting a NET
      // REGRESSION (subset total 40.6 s vs 34.3 s): per-task parquet
      // reader setup (footer read, codec init) on ~300 KB splits costs
      // more than the parallelism buys. The once-suggested follow-up —
      // "explicit repartition inside the sketch-state operators whose
      // scans floor at 1-3 tasks" — was profiled in r14 and REFUTED at
      // this SF: the per-slice sketch builds cost 0.12-0.16 task-CPU-s
      // (events.parquet = 2 MB = one split), while those entries' walls
      // are 19-34 tiny jobs of driver latency, so an added exchange per
      // slice only adds jobs (OPTIMIZATION_r14.md). At production file
      // sizes maxPartitionBytes governs split sizing and this knob only
      // guards small-file packing, which is exactly what its default is
      // tuned for.
      .config("spark.sql.files.openCostInBytes", (4L * 1024 * 1024).toString)
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
