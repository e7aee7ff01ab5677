package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("token counts: BPE-ish >= whitespace, both positive") {
    TextAnalysis.tokenCount(spark, sf).collect().foreach { r =>
      val (ws, bpe) = (r.getAs[Long]("n_ws_tokens"), r.getAs[Long]("n_bpe_tokens"))
      assert(ws > 0 && bpe >= ws)
    }
  }

  test("quality ratios stay in [0, 1] and the score is finite") {
    TextAnalysis.quality(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("punct_ratio") >= 0 && r.getAs[Double]("punct_ratio") <= 1)
      assert(r.getAs[Double]("stop_ratio") >= 0 && r.getAs[Double]("stop_ratio") <= 1)
      assert(!r.getAs[Double]("quality_score").isNaN)
    }
  }

  test("language id always predicts a tag from the closed set") {
    val langs = TextAnalysis.langId(spark, sf)
      .select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "fr", "es", "de", "unknown")))
  }

  test("fingerprint is order-sensitive and whitespace-insensitive") {
    import spark.implicits._
    // same words, different order → different fingerprint; extra spaces → same
    val probe = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),
      (3L, "alpha  beta   gamma")).toDF("doc_id", "text")
    probe.createOrReplaceTempView("fp_probe")
    val fps = spark.sql(
      """SELECT doc_id, aggregate(
        |  transform(split(trim(text), '\\s+'), w -> length(w) * 31L + CAST(ascii(w) AS BIGINT)),
        |  0L, (h, v) -> (h * 1000003L + v) % 1099511627776L) AS fp
        |FROM fp_probe""".stripMargin).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) !== fps(2L))
    assert(fps(1L) === fps(3L))
    // and the table-level operator is total
    assert(TextAnalysis.fingerprint(spark, sf).count() ===
      spark.read.parquet(s"$sf/documents.parquet").count())
  }
}
