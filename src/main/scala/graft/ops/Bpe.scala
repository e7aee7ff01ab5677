package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.functions.bpe_encode

/** BPE vocabulary induction + subword tokenization (SURVEY §2.E) — the
  * real version of the "BPE-ish regex" token proxy: learn merge rules from
  * the corpus (Sennrich 2016), then tokenize with them.
  *
  * Split of labor, by data volume:
  *  - **corpus-scale (distributed)**: the word histogram — one scan, one
  *    shuffle on the word. At 100 TB this is the only pass over the data.
  *  - **model-scale (driver)**: greedy merge induction runs on the top-V
  *    word histogram (V·avg_len symbols ≈ a few hundred KB) — the same
  *    driver-side model-state discipline as k-means centroids and PQ
  *    codebooks. Training on the capped histogram is standard practice
  *    (subword-nmt trains on a word-count file, not the corpus).
  *  - **corpus-scale again (distributed)**: encoding. Each DISTINCT word is
  *    encoded once by the compiled [[graft.functions.BpeEncode]] kernel
  *    (the merge table rides in as a plan reference object, no join), then
  *    per-doc token counts come from a hash join back on the word — Zipf
  *    says distinct words ≪ token occurrences, so the kernel runs a small
  *    fraction of N times.
  *
  * Both entries are rows-only at the gate: merge induction is an iterative
  * greedy argmax (not SQL-expressible); BpeSpec pins the classic
  * low/lower/newest/widest merge sequence exactly, the encode identity
  * (concat(encode(w)) == w), and token-count monotonicity in merge count.
  */
object Bpe {

  val DefaultNumMerges = 200
  val DefaultMaxWords = 50000

  private def spread(s: SparkSession): Int = s.sparkContext.defaultParallelism

  /** Top-V word histogram, deterministically ordered (freq desc, word asc —
    * ties must break identically across runs for the merges to be stable).
    */
  def wordHistogram(docs: DataFrame, maxWords: Int = DefaultMaxWords): DataFrame =
    docs
      .select(explode(TextAnalysis.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords)

  /** Greedy merge induction over a (word, freq) histogram — driver-side,
    * on model-scale data. Ties on pair frequency break lexicographically
    * on (left, right), so training is deterministic given the histogram.
    * Returns (rank, left, right, pair_freq) in training order.
    */
  def trainMerges(histogram: Seq[(String, Long)],
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    // each word as its code-point symbol sequence
    var words: Array[(Array[String], Long)] = histogram.map { case (w, f) =>
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        syms += w.substring(i, i + n)
        i += n
      }
      (syms.toArray, f)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val pairFreq = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairFreq.update(k, pairFreq.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (pairFreq.isEmpty) exhausted = true
      else {
        val ((l, r), f) = pairFreq.minBy { case ((a, b), cnt) => (-cnt, a, b) }
        merges += ((rank, l, r, f))
        val merged = l + r
        words = words.map { case (syms, wf) =>
          if (syms.length < 2) (syms, wf)
          else {
            val next = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                next += merged; i += 2
              } else { next += syms(i); i += 1 }
            }
            (next.toArray, wf)
          }
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Train on the documents table; returns the merge table as a DataFrame
    * (rank, left, right, pair_freq) — persist with plain parquet write and
    * feed back via [[ranksOf]]/[[bpeTokens]], the fed-model shape.
    */
  def bpeTrain(s: SparkSession, dir: String,
      numMerges: Int = DefaultNumMerges,
      maxWords: Int = DefaultMaxWords): DataFrame = {
    import s.implicits._
    val hist = wordHistogram(Tables(s, dir).documents, maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainMerges(hist, numMerges)
      .toDF("rank", "left", "right", "pair_freq")
  }

  /** Collect a merge-table DataFrame into the kernel's rank map. */
  def ranksOf(merges: DataFrame): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.select(col("rank").cast(LongType), col("left"), col("right"))
      .collect()
      .foreach(r => m.put(r.getString(1) + " " + r.getString(2),
        Integer.valueOf(r.getLong(0).toInt)))
    m
  }

  /** Per-doc subword token counts under a merge table (trained inline from
    * the same corpus when none is fed). Plan: explode words → encode each
    * DISTINCT word once (compiled kernel, merge table as a plan literal) →
    * hash-join subword counts back on the word → per-doc sum. The join
    * shuffles (doc_id, word) pairs and the distinct-word side; document
    * bodies never re-shuffle.
    */
  def bpeTokens(s: SparkSession, dir: String,
      merges: Option[DataFrame] = None,
      numMerges: Int = DefaultNumMerges): DataFrame = {
    val ranks = ranksOf(merges.getOrElse(bpeTrain(s, dir, numMerges)))
    val exploded = Tables(s, dir).documents
      .repartition(spread(s), col("doc_id"))
      .select(col("doc_id"),
        explode(TextAnalysis.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    val vocab = exploded.select(col("word")).distinct()
      .select(col("word"),
        size(bpe_encode(col("word"), ranks)).cast(LongType).as("n_sub"))
    exploded.join(vocab, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  // =================================================================
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_train" -> ((s: SparkSession, dir: String) => bpeTrain(s, dir)),
    "text_bpe_tokens" -> ((s: SparkSession, dir: String) => bpeTokens(s, dir)))

  /** Both rows-only: greedy merge induction is iterative argmax, not
    * SQL-expressible; BpeSpec pins the algorithm on the classic worked
    * example and the encode/count invariants.
    */
  val oracles: Map[String, String] = Map.empty
}
