package graft

import org.apache.spark.sql.functions._
import graft.ops.Profile

class ProfileSpec extends SparkSpec {

  test("describe profiles every requested column in one pass") {
    val out = Profile.profileDocuments(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("doc_id", "lang", "source", "n_chars"))
    assert(out("doc_id").getAs[Long]("n_nulls") === 0L)
    assert(out("doc_id").getAs[Long]("n_distinct") === 500L)
    assert(out("lang").getAs[Long]("n_distinct") === 5L)
  }

  test("stratified sample hits the target rates and is rerun-deterministic") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val strata = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s1 = Profile.sampleDocuments(spark, sf).collect().map(_.getLong(0)).toSeq
    val s2 = Profile.sampleDocuments(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(s1 === s2, "hash sampling must select identical rows on rerun")
    val sampled = Profile.sampleDocuments(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = sampled("en").toDouble / strata("en")
    assert(enRate > 0.35 && enRate < 0.65, s"en rate $enRate should target 0.5")
    Seq("fr", "es", "de", "zh").foreach { l =>
      val rate = sampled.getOrElse(l, 0L).toDouble / strata(l)
      assert(rate < 0.45, s"$l rate $rate should target 0.2")
    }
  }

  test("source sketches: estimates track exact distincts; union never rescans") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val est = Profile.sourceSketchRollup(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est_distinct")).toMap
    val exact = docs.select(col("source"), md5(col("text")).as("h"))
      .groupBy("source").agg(countDistinct(col("h")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = docs.select(md5(col("text"))).distinct().count()
    // lgK=12 HLL: relative standard error ~1.6%; allow 3σ
    exact.foreach { case (src, d) =>
      assert(math.abs(est(src) - d) <= math.max(2.0, 0.05 * d),
        s"$src: est ${est(src)} vs exact $d")
    }
    assert(math.abs(est("__ALL__") - exactAll) <= math.max(2.0, 0.05 * exactAll))
  }

  test("sketch artifacts round-trip: rollup from loaded parquet ≡ inline") {
    val path = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Profile.saveSourceSketches(docs, path)
    val fromDisk = Profile.sourceSketchRollup(
      Profile.loadSourceSketches(spark, path)).collect().toSeq
    val inline = Profile.sourceSketchRollup(spark, sf).collect().toSeq
    assert(fromDisk == inline)
    // the union side of the rollup reads sketch bytes, not documents: its
    // plan over the loaded frame scans only the sketch parquet
    val plan = Profile.sourceSketchRollup(Profile.loadSourceSketches(spark, path))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("documents.parquet"), plan.take(400))
  }
}
