package graft

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {

  test("fake decoder: normalized 16-bin byte histogram") {
    val f = Multimodal.fakeDecode("AAAA".getBytes("UTF-8")) // 0x41 → bin 4
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0) < 1e-12)
    assert(f(4) === 1.0)
  }

  test("feature extraction is partition-parallel and total") {
    val out = Multimodal.featureExtract(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(out.count() === docs.count())
    val row = out.head
    val feats = (0 until Multimodal.FeatureDims).map(i => row.getAs[Double](s"f$i"))
    assert(feats.length === 16)
    assert(math.abs(feats.sum - 1.0) < 1e-9, "histogram is normalized")
    // features must match the decoder applied to the same payload
    val payload = spark.read.parquet(s"$sf/documents.parquet")
      .filter(s"doc_id = ${row.getAs[Long]("doc_id")}")
      .head.getAs[String]("text").getBytes("UTF-8")
    assert(feats === Multimodal.fakeDecode(payload).toSeq)
  }

  test("frame sampling chunks the payload and keeps every stride-th frame") {
    val out = Multimodal.frameSample(spark, sf, frameBytes = 100, stride = 4).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.length === docs.size)
    out.foreach { r =>
      val (id, nFrames, nSampled) =
        (r.getLong(0), r.getAs[Long]("n_frames"), r.getAs[Long]("n_sampled"))
      assert(nFrames === (docs(id) + 99) / 100) // ceil(bytes / frameBytes), ASCII corpus
      assert(nSampled === (nFrames - 1) / 4 + 1) // every 4th, frame 0 always kept
      assert(r.getAs[String]("first_frame_hex").nonEmpty)
    }
  }

  test("resize emits exactly targetBytes per row, truncating or zero-padding") {
    val out = Multimodal.resize(spark, sf, targetBytes = 128).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("new_len") === 128L)
      val orig = r.getAs[Long]("orig_len")
      if (orig < 128 - 4)
        assert(r.getAs[String]("tail_hex") === "00000000", "short payloads zero-pad")
    }
    assert(out.exists(_.getAs[Long]("orig_len") > 128), "corpus has truncation cases")
  }

  test("binary metadata agrees with the raw text byte length") {
    val meta = Multimodal.binaryMeta(spark, sf).collect()
    meta.foreach { r =>
      assert(r.getAs[Long]("byte_len") > 0)
      assert(r.getAs[String]("magic_hex").length === 8) // 4 bytes, ASCII corpus
      assert(r.getAs[String]("sniffed_type") === "unknown") // text, not media
    }
  }

  test("perceptual near-dup: exact precision, high recall vs brute-force L1 truth") {
    val tau = 0.005
    val feats = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Multimodal.fakeDecode(r.getString(1).getBytes("UTF-8")))
      .sortBy(_._1)
    def l1(a: Array[Double], b: Array[Double]): Double =
      (0 until 16).foldLeft(0.0)((acc, i) => acc + math.abs(a(i) - b(i)))
    val truth = (for {
      i <- feats.indices; j <- (i + 1) until feats.length
      if l1(feats(i)._2, feats(j)._2) <= tau
    } yield (feats(i)._1, feats(j)._1)).toSet
    assert(truth.nonEmpty, "corpus should contain planted perceptual twins")
    val out = Multimodal.nearDup(spark, sf, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision is exact by construction: every emitted pair passed the
    // exact L1 verify, so the output must be a subset of the truth
    assert(out.subsetOf(truth))
    val recall = out.size.toDouble / truth.size
    assert(recall >= 0.85, s"recall=$recall (found ${out.size} of ${truth.size})")
  }
}
