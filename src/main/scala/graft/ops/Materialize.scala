package graft.ops

import org.apache.spark.sql.DataFrame

/** Eager intra-query materialization barrier — the one home for the
  * localCheckpoint-vs-reliable-checkpoint decision.
  *
  * Several operators materialize a shared intermediate exactly once so the
  * optimizer cannot re-derive it per consumer (the "planned shared
  * exchange" CollapseRepartition/broadcast planning keeps folding away —
  * see [[Dedup.signedShingleDocs]]). The default mechanism is
  * `localCheckpoint()`: eager, no filesystem round-trip, blocks reaped by
  * the ContextCleaner when the frame is GC'd.
  *
  * The operational trade (guide §5), owned here once: localCheckpoint
  * blocks are EXECUTOR-LOCAL and NON-REPLICATED, and the plan's lineage is
  * truncated — on a cluster, losing an executor that held blocks fails the
  * query with no recompute path. That is acceptable for intra-query
  * materializations (the failed query re-runs from its parquet inputs, and
  * the alternative is recomputing the operator's dominant kernel 3-4× per
  * query), but deployments that would rather pay a filesystem write for
  * recoverable blocks can opt in per session:
  *
  * {{{
  * spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")
  * spark.conf.set("spark.graft.reliableCheckpoint", "true")
  * }}}
  *
  * which routes every barrier through `checkpoint(eager = true)` — same
  * eager semantics, same values (MaterializeSpec pins both paths equal),
  * blocks on the checkpoint filesystem instead of executor storage.
  */
private[graft] object Materialize {

  /** Session conf key: "true" → reliable `checkpoint(eager)` (requires
    * `sparkContext.setCheckpointDir`); anything else → `localCheckpoint`.
    */
  val ConfKey = "spark.graft.reliableCheckpoint"

  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption(ConfKey).exists(_.equalsIgnoreCase("true")))
      df.checkpoint(eager = true)
    else df.localCheckpoint()
}
