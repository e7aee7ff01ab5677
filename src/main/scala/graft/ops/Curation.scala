package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The end-to-end training-corpus preparation funnel — the composition a
  * real data pipeline ships, as one declarative flow (SURVEY §2.E):
  *
  *  1. quality + language gate with exact-dedup canonicals
  *     ([[TextAnalysis.curateCorpus]] semantics)
  *  2. benchmark decontamination — docs sharing any word 5-gram with the
  *     held-out benchmark set are dropped ([[TextAnalysis.decontaminate]])
  *  3. near-dup survivors — MinHash+LSH pairs → connected components →
  *     one canonical per cluster ([[Dedup.nearDupGroups]])
  *  4. deterministic token-budget packing into training shards
  *     ([[TextAnalysis.packSequences]])
  *
  * Scale shape: stages 1-3 each reduce to an id list (the gate passes ids,
  * the contaminated list, the dropped-duplicate list — all tiny relative
  * to the corpus), so the final assembly is semi/anti joins that broadcast
  * their small sides; the corpus body is scanned by the stages themselves,
  * never shuffled whole. Rows-only for the driver (the near-dup stage is
  * hash-dependent); CurationSpec pins every funnel invariant.
  */
object Curation {

  /** @param pairs precomputed near-dup edge list (d1, d2) — e.g. a
    *   materialized [[Dedup.minhashLsh]] output. At 100 TB the pairs are
    *   computed once and every consumer (groups, survivors, this funnel)
    *   reads them; `None` recomputes MinHash+LSH inline, which is the
    *   one-shot convenience form, not the pipeline form.
    */
  def prepareCorpus(s: SparkSession, dir: String,
      numBuckets: Int = 8, budget: Long = 256,
      isBenchmark: org.apache.spark.sql.Column = col("doc_id") % 11 === 0,
      pairs: Option[DataFrame] = None): DataFrame = {
    val curated = TextAnalysis.curateCorpus(s, dir).select(col("doc_id"))
    val clean = TextAnalysis.decontaminate(Tables(s, dir).documents, isBenchmark)
      .filter(col("contaminated") === 0L).select(col("doc_id"))
    // propagateMinLabels returns its labels CACHED and assigns unpersist
    // ownership to the caller (Dedup.scala contract) — so pin only the
    // tiny dropped-id list (non-canonical members of dup clusters, stored
    // once via eager localCheckpoint and reaped by the ContextCleaner when
    // the frame is GC'd) and release the full labels cache immediately.
    val (labels, _) = Dedup.propagateMinLabels(
      pairs.getOrElse(Dedup.minhashLsh(s, dir)))
    val dropped = labels
      .filter(col("canonical_id") =!= col("doc_id")).select(col("doc_id"))
      .localCheckpoint()
    labels.unpersist()
    val kept = Tables(s, dir).documents
      .join(curated, Seq("doc_id"), "left_semi")
      .join(clean, Seq("doc_id"), "left_semi")
      .join(dropped, Seq("doc_id"), "left_anti")
    TextAnalysis.packSequences(kept, numBuckets, budget)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_prepare_corpus" -> ((s: SparkSession, dir: String) => prepareCorpus(s, dir)))

  /** Rows-only: the near-dup stage depends on engine-internal hashes. */
  val oracles: Map[String, String] = Map.empty
}
