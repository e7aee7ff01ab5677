package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sink-side ETL surface (SURVEY §2.B, spec-only entries): multi-sink
  * fan-out, partitioned+rolled writes, tolerant JSON ingest, and schema
  * evolution — the pyetl writer loop re-expressed as Spark write jobs.
  *
  * 100 TB notes: [[partitionedWrite]] bounds both failure modes of big
  * writers — `partitionBy` keeps partition pruning for readers, while
  * `maxRecordsPerFile` rolls files so no partition becomes one giant file;
  * [[multiSink]] reuses one cached parse of the input for all routes
  * instead of re-reading the source per sink (pyetl re-consumes per
  * destination; at scale you pay the parse once).
  */
object Sinks {

  /** Fan one parsed input out to N predicate routes, each its own parquet
    * sink. Returns route → row count. The input is cached once; each route
    * is a pushed-down filter over the cached plan.
    */
  def multiSink(df: DataFrame, routes: Map[String, Column], baseDir: String): Map[String, Long] = {
    val cached = df.cache()
    try
      routes.map { case (name, pred) =>
        val routed = cached.filter(pred)
        routed.write.mode("overwrite").parquet(s"$baseDir/$name")
        name -> routed.count()
      }
    finally cached.unpersist()
  }

  /** Day-partitioned parquet with bounded file sizes (pyetl's partition +
    * roll). `maxRecordsPerFile` is the rolling bound; readers get partition
    * pruning on `day`.
    */
  def partitionedWrite(df: DataFrame, dayCol: Column, outDir: String,
      maxRecordsPerFile: Long = 1000000L): Unit =
    df.withColumn("day", dayCol)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("day")
      .parquet(outDir)

  /** Write-audit-promote: the validation pattern for data too big to
    * validate BEFORE writing. [[Pipeline.run]]'s gate counts violations in
    * a pre-write pass over a cached frame — right for its scale, but at
    * 100 TB caching-for-validation is a second full materialization.
    * Here the metrics ride the write itself via `Dataset.observe`
    * (a CollectMetrics node on the write path — accumulator-backed,
    * exactly one scan, no cache), the data lands in `<outDir>.staging`,
    * and only if every rule's violation count is within budget is the
    * staging dir atomically renamed to `outDir` (a metadata move on
    * HDFS/local; object stores substitute their committer). Over budget:
    * the staging dir is RETAINED for inspection and nothing appears at
    * the published path — readers never see unaudited data.
    *
    * Returns rule → violation count on success; throws (naming rules and
    * counts, like the Pipeline gate) on failure.
    */
  def auditedPromote(df: DataFrame, outDir: String,
      validations: Map[String, Column],
      maxViolations: Long = 0L): Map[String, Long] = {
    require(validations.nonEmpty, "auditedPromote needs at least one rule")
    val staging = s"$outDir.staging"
    val obs = org.apache.spark.sql.Observation()
    val aggs = validations.toSeq.map { case (name, pred) =>
      count(when(pred, 1)).as(name) }
    df.observe(obs, aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(staging)
    val row = obs.get
    val counts = validations.keys.map(n => n -> row(n).asInstanceOf[Long]).toMap
    val bad = counts.toSeq.sortBy(_._1).filter(_._2 > maxViolations)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "audit failed, staging retained at " + staging + ", nothing " +
          "promoted: " + bad.map { case (n, c) =>
            s"rule '$n' has $c violating rows (budget $maxViolations)"
          }.mkString("; "))
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(conf)
    val dst = new org.apache.hadoop.fs.Path(outDir)
    if (fs.exists(dst)) fs.delete(dst, true)
    require(fs.rename(new org.apache.hadoop.fs.Path(staging), dst),
      s"promote rename $staging -> $outDir failed")
    counts
  }

  /** Tolerant JSON-lines ingest: malformed records land in a quarantine
    * column instead of failing the job (pyetl's bad-message handling).
    * Returns (good rows, quarantined rows) DataFrames.
    */
  def tolerantJson(s: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = s.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // PERMISSIVE corrupt-column queries require a materialized plan
    (raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      raw.filter(col("_corrupt_record").isNotNull).select(col("_corrupt_record")))
  }

  /** Schema-evolving reads across parquet generations (`mergeSchema`) —
    * pyetl's "fields may appear over time" reality.
    */
  def mergedRead(s: SparkSession, paths: String*): DataFrame =
    s.read.option("mergeSchema", "true").parquet(paths: _*)

  /** XML sink — Spark 4's built-in XML source (the spark-xml merge), one
    * element per row under `rowTag`. Rolled like every other sink here so
    * no output file outgrows its reader.
    */
  def xmlWrite(df: DataFrame, outDir: String, rowTag: String = "row",
      maxRecordsPerFile: Long = 1000000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("rowTag", rowTag)
      .format("xml").save(outDir)

  /** Tolerant XML ingest — [[tolerantJson]]'s discipline on the other
    * feed format legacy pipelines actually emit: malformed elements land
    * in the quarantine column under PERMISSIVE instead of failing the
    * job. Returns (good rows, quarantined raw records).
    */
  def tolerantXml(s: SparkSession, path: String, rowTag: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = s.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("rowTag", rowTag)
      .format("xml").load(path)
      .cache() // PERMISSIVE corrupt-column queries require a materialized plan
    (raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      raw.filter(col("_corrupt_record").isNotNull).select(col("_corrupt_record")))
  }

  /** JSON-lines sink (pyetl's primary output format), day-partitioned and
    * rolled like [[partitionedWrite]]. gzip keeps the 100 TB text bill sane
    * while staying line-splittable per file for downstream consumers.
    */
  def jsonLinesWrite(df: DataFrame, dayCol: Column, outDir: String,
      maxRecordsPerFile: Long = 1000000L, compression: String = "gzip"): Unit =
    df.withColumn("day", dayCol)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", compression)
      .partitionBy("day")
      .json(outDir)

  /** Keyed-upsert compaction (pyetl's key-value-table destination as a
    * batch merge): union the current snapshot with a delta, keep the
    * latest row per key by (versionCol, then delta-over-snapshot on ties),
    * and return the new snapshot. One shuffle on the key; at 100 TB this
    * is the standard incremental-merge compaction (write the result
    * partitioned, swap atomically at the table layer).
    */
  def mergeSnapshot(snapshot: DataFrame, delta: DataFrame, key: String,
      versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unioned = snapshot.withColumn("__src", lit(0))
      .unionByName(delta.withColumn("__src", lit(1)))
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, col("__src").desc)
    unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** Bucketed table sink: hash-bucket (and sort) the data on the join key
    * at WRITE time, so every later join or aggregation on that key runs
    * with NO exchange — the bucketing metadata proves co-partitioning to
    * the planner. This is the 100 TB answer to "this fact table is joined
    * on the same key by every consumer": pay the shuffle once when landing
    * the data, never again. `option("path", ...)` keeps the table external
    * so the files live with the rest of the lake, not the warehouse dir.
    * SinksSpec proves the no-shuffle join plan.
    */
  def bucketedTable(df: DataFrame, table: String, path: String,
      bucketCol: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** ORC sink, day-partitioned and rolled like [[partitionedWrite]] — the
    * second columnar lake format Spark executes natively (same vectorized
    * reader + pushdown machinery as parquet), for consumers standardized on
    * ORC (Hive/Trino lakes). EtlSpec proves the round-trip keeps partition
    * pruning and file rolling.
    */
  def orcWrite(df: DataFrame, dayCol: Column, outDir: String,
      maxRecordsPerFile: Long = 1000000L): Unit =
    df.withColumn("day", dayCol)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("day")
      .orc(outDir)

  /** CSV sink with header — the RDBMS-load/interchange destination. */
  def csvWrite(df: DataFrame, outDir: String,
      maxRecordsPerFile: Long = 1000000L): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .csv(outDir)

  /** RDBMS sink seam (pyetl's MySQL destination). Spark's JDBC writer is
    * built in — this runs wherever a JDBC driver jar is on the executor
    * classpath; JdbcSinkSpec exercises it end-to-end against the embedded
    * Derby engine Spark itself ships (driver discovery, dialect mapping,
    * create-on-append, read-path predicate pushdown), so only the specific
    * production driver (MySQL et al.) is a deploy-time swap. Append-only by
    * design: pair with [[mergeSnapshot]] upstream for upsert semantics
    * (compact, then load), which keeps the DB-side transaction small and
    * idempotent.
    */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties(),
      numPartitions: Int = 8): Unit =
    df.repartition(numPartitions) // bound concurrent DB connections
      .write.mode("append").jdbc(url, table, props)
}
