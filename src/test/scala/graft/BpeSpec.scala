package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

class BpeSpec extends SparkSpec {

  test("merge induction reproduces the classic low/lower/newest/widest sequence") {
    // Sennrich 2016's worked example. Pair counts round by round:
    //   r0: (e,s)=9 ties (s,t)=9 → lexicographic → "es"
    //   r1: (es,t)=9 → "est"
    //   r2: (l,o)=7 ties (o,w)=7 → "lo"
    //   r3: (lo,w)=7 → "low"
    val hist = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.trainMerges(hist, 4)
    assert(merges == Seq(
      (0, "e", "s", 9L), (1, "es", "t", 9L),
      (2, "l", "o", 7L), (3, "lo", "w", 7L)))
  }

  test("training exhausts gracefully when every word collapses to one symbol") {
    val merges = Bpe.trainMerges(Seq("ab" -> 3L, "a" -> 1L), 10)
    assert(merges == Seq((0, "a", "b", 3L)))
  }

  test("encode identity: subwords concatenate back to the word; no merges = chars") {
    val merges = Bpe.bpeTrain(spark, sf, numMerges = 100)
    val ranks = Bpe.ranksOf(merges)
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .distinct().limit(200)
      .select(col("word"),
        graft.functions.bpe_encode(col("word"), ranks).as("sub"),
        graft.functions.bpe_encode(col("word"),
          new java.util.HashMap[String, Integer]()).as("chars"))
      .collect()
    assert(words.nonEmpty)
    words.foreach { r =>
      val w = r.getString(0)
      val sub = r.getSeq[String](1)
      assert(sub.mkString == w, s"concat(${sub}) != $w")
      val chars = r.getSeq[String](2)
      assert(chars.mkString == w)
      assert(chars.length >= sub.length, s"merges grew the token count for $w")
    }
  }

  test("token counts: per-doc totals shrink monotonically as merges grow") {
    val m0 = Bpe.bpeTokens(spark, sf, numMerges = 0).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_bpe_tokens")).toMap
    val m200 = Bpe.bpeTokens(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_bpe_tokens")))
    assert(m200.nonEmpty)
    m200.foreach { case (id, nWords, nTok) =>
      assert(nTok <= m0(id), s"doc $id: $nTok tokens under merges > ${m0(id)} chars")
      assert(nTok >= nWords, s"doc $id: fewer tokens than words")
    }
    // merges must actually BITE corpus-wide — this catches a kernel whose
    // lookups silently never hit (per-doc ≤ alone passed when an encode bug
    // made every merge a no-op)
    val total0 = m0.values.sum
    val total200 = m200.map(_._3).sum
    assert(total200 < total0,
      s"200 merges left the corpus token count unchanged ($total0)")
  }

  test("fed merge table gives identical counts to inline training (same corpus)") {
    val merges = Bpe.bpeTrain(spark, sf)
    val fed = Bpe.bpeTokens(spark, sf, merges = Some(merges)).collect().toSeq
    val inline = Bpe.bpeTokens(spark, sf).collect().toSeq
    assert(fed == inline)
  }
}
