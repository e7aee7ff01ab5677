package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query and total wall seconds.
  *
  * Runs the HEADLINE set — the scale-path form of every operator family
  * (agg, join chains, windows, sessionization, upsert, minhash/simhash LSH,
  * embedding dedup, ANN, text analysis, multimodal metadata, JSON ETL).
  * The declared ground-truth-only queries (all-pairs ngram jaccard — O(N²)
  * by construction, used to validate the LSH tier at test SF) are excluded:
  * they are not the operator you'd run at this or any larger scale.
  *
  * Results are forced through a `noop` sink so every projected expression
  * actually evaluates — `.count()` would let Spark prune the projections
  * and time nothing.
  */
object Bench {

  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q_window_running", "q_rank_in_group", "q_range_join", "q_rollup",
    "q_asof_join",
    "etl_json_extract", "etl_latest_by_key", "etl_sessionize",
    "etl_tumbling_window", "etl_sliding_window",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_lsh",
    "dedup_components",
    "ann_bruteforce_topk", "ann_lsh_topk", "ann_ivf_topk",
    "text_quality", "text_fingerprint", "text_lang_id", "text_curate_corpus",
    "mm_binary_meta")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM (codegen compiler, parquet reader, shuffle machinery) so
    // the first measured query isn't charged for one-time JIT costs
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // best-of-N (default 2): single-shot local timings show multi-second
    // GC/scheduler noise; the min is the meaningful cost of the plan.
    // SPARK_GRAFT_BENCH_RUNS=5 is the variance-investigation mode — per-run
    // times go to stderr so noise vs real regression is decidable from one
    // invocation.
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val results = headline.map { name =>
      val runs = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      if (nRuns > 2) System.err.println(
        s"[bench] $name runs: ${runs.map(r => f"$r%.2f").mkString(", ")}")
      name -> runs.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
