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
    assert(row.getAs[Seq[Double]]("features").length === 16)
  }

  test("binary metadata agrees with the raw text byte length") {
    val meta = Multimodal.binaryMeta(spark, sf).collect()
    meta.foreach { r =>
      assert(r.getAs[Long]("byte_len") > 0)
      assert(r.getAs[String]("magic_hex").length === 8) // 4 bytes, ASCII corpus
      assert(r.getAs[String]("sniffed_type") === "unknown") // text, not media
    }
  }
}
