package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality profiling + deterministic sampling — the audit utilities a
  * pipeline runs before and after every curation step.
  */
object Profile {

  /** One row per profiled column: nulls, exact distincts, min/max (as
    * strings). A single scan computing every aggregate at once (one
    * map-side pass), then reshaped; no per-column jobs.
    */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    wide.select(explode(array(entries: _*)).as("p"))
      .select(col("p.column"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_value"), col("p.max_value"))
      .orderBy(col("column"))
  }

  /** Profile of the documents table (oracle-backed). */
  def profileDocuments(s: SparkSession, dir: String): DataFrame =
    describe(Tables(s, dir).documents, Seq("doc_id", "lang", "source", "n_chars"))

  /** Deterministic per-stratum hash sampling: keep a row iff
    * bucket(keyCol) mod 1000 < fraction·1000 for its stratum. Unlike
    * rand()-based sampleBy, reruns/retries/backfills select the SAME
    * rows — the property that keeps a 100 TB pipeline idempotent.
    *
    * @param bucket 0-999 bucket per row; defaults to seeded xxhash64 of
    *   keyCol — the right mixing for arbitrary keys, but engine-internal.
    *   Callers with integer keys can pass the Knuth multiplicative bucket
    *   (as [[sampleDocuments]] does) to make the selection cross-engine
    *   reproducible and therefore oracle-checkable.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      fractions: Map[String, Double], seed: Int = 42,
      bucket: Option[Column] = None): DataFrame = {
    val b = bucket.getOrElse(pmod(xxhash64(col(keyCol), lit(seed)), lit(1000L)))
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(stratumCol) === stratum && b < (f * 1000).toLong)
    }
    df.filter(keep)
  }

  /** Stratified documents sample: half the English corpus, 20% of the
    * rest, bucketed by exact integer arithmetic on doc_id (mixtureSample's
    * Knuth hash) — deterministic in BOTH engines, hence oracle-exact.
    */
  def sampleDocuments(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables(s, dir).documents, "lang", "doc_id",
      Map("en" -> 0.5, "fr" -> 0.2, "es" -> 0.2, "de" -> 0.2, "zh" -> 0.2),
      // doc_id reduced before the multiply — see Curation.mixturePredicate's
      // overflow note (raw product wraps past doc_id ≈ 3.47e9)
      bucket = Some(pmod(
        pmod(col("doc_id"), lit(100000007L)) * lit(2654435761L), lit(1000L))))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_documents" -> (profileDocuments _),
    "text_stratified_sample" -> (sampleDocuments _))

  val oracles: Map[String, String] = Map(
    "q_profile_documents" ->
      """SELECT * FROM (
        |  SELECT 'doc_id' AS "column", COUNT(*) FILTER (doc_id IS NULL) AS n_nulls,
        |    COUNT(DISTINCT doc_id) AS n_distinct,
        |    CAST(MIN(doc_id) AS VARCHAR) AS min_value, CAST(MAX(doc_id) AS VARCHAR) AS max_value
        |  FROM documents
        |  UNION ALL
        |  SELECT 'lang', COUNT(*) FILTER (lang IS NULL), COUNT(DISTINCT lang),
        |    MIN(lang), MAX(lang) FROM documents
        |  UNION ALL
        |  SELECT 'source', COUNT(*) FILTER (source IS NULL), COUNT(DISTINCT source),
        |    MIN(source), MAX(source) FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', COUNT(*) FILTER (n_chars IS NULL), COUNT(DISTINCT n_chars),
        |    CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
        |) ORDER BY "column"""".stripMargin,
    "text_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ((doc_id % 100000007) * 2654435761) % 1000 <
        |  CASE lang WHEN 'en' THEN 500 WHEN 'fr' THEN 200 WHEN 'es' THEN 200
        |    WHEN 'de' THEN 200 WHEN 'zh' THEN 200 ELSE -1 END
        |ORDER BY doc_id""".stripMargin)
}
