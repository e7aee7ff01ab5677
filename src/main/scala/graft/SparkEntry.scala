package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's query + oracle maps; `queries` keys without an
  * `oracleSql` entry are the declared rows-only checks (approximate ops
  * whose exactness is asserted in ScalaTest instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q3ShippingPriority(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.etl.JsonEtl.queries ++
      graft.etl.Expectations.queries ++
      graft.ops.TextAnalysis.queries ++
      graft.ops.Dedup.queries ++
      graft.ops.Similarity.queries ++
      graft.ops.Multimodal.queries ++
      graft.ops.AsOf.queries ++
      graft.ops.Profile.queries ++
      graft.ops.Intervals.queries ++
      graft.ops.Curation.queries ++
      graft.ops.Layout.queries ++
      graft.ops.Bpe.queries ++
      graft.ops.Maintenance.queries ++
      graft.ops.Fsck.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.etl.JsonEtl.oracles ++
      graft.etl.Expectations.oracles ++
      graft.ops.TextAnalysis.oracles ++
      graft.ops.Dedup.oracles ++
      graft.ops.Similarity.oracles ++
      graft.ops.Multimodal.oracles ++
      graft.ops.AsOf.oracles ++
      graft.ops.Profile.oracles ++
      graft.ops.Intervals.oracles ++
      graft.ops.Curation.oracles ++
      graft.ops.Layout.oracles ++
      graft.ops.Bpe.oracles ++
      graft.ops.Maintenance.oracles ++
      graft.ops.Fsck.oracles
}
