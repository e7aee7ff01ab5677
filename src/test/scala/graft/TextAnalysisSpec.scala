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

  test("decontamination counts exactly the shared distinct 5-grams") {
    import spark.implicits._
    val probe = Seq(
      (1L, "a b c d e f g"),                             // shares 2 grams with bench
      (2L, "totally different words over here indeed"),  // shares none
      (3L, "tiny doc"),                                  // < 5 words → no grams
      (100L, "x a b c d e f y")).toDF("doc_id", "text")  // the benchmark doc
    val out = TextAnalysis.decontaminate(probe, col("doc_id") >= 100L, 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // bench grams: {x a b c d, a b c d e, b c d e f, c d e f y};
    // doc 1 grams: {a b c d e, b c d e f, c d e f g} → intersection = 2
    assert(out(1L) === ((2L, 1L)))
    assert(out(2L) === ((0L, 0L)))
    assert(out(3L) === ((0L, 0L)))
    assert(!out.contains(100L), "benchmark docs are excluded from the report")
  }

  test("shard export: lossless, manifest-exact, rolled files, rerun-deterministic") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nShards = 4
    TextAnalysis.exportShards(docs, out, nShards, maxRecordsPerFile = 64L)
    // partition-column inference types `shard` as int — normalize to long
    val back = spark.read.parquet(out)
      .withColumn("shard", col("shard").cast("long"))
    // lossless: every doc exactly once, in its arithmetic shard
    assert(back.count() === docs.count())
    assert(back.select("doc_id").distinct().count() === docs.count())
    assert(back.filter(col("shard") =!= pmod(col("doc_id"), lit(nShards.toLong)))
      .count() === 0L)
    // the manifest beside the data is invisible to data readers and exact
    assert(!back.columns.contains("n_docs"))
    val manifest = spark.read.parquet(s"$out/_manifest").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val actual = back.groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(manifest.keySet === actual.keySet)
    actual.foreach { case (shard, n) => assert(manifest(shard)._1 === n) }
    // files rolled: no shard dir holds more than ceil(rows/64)+1 files
    manifest.foreach { case (shard, (n, _)) =>
      val files = new java.io.File(s"$out/shard=$shard")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(files >= (n / 64).toInt && files <= (n / 64).toInt + 2,
        s"shard $shard: $files files for $n rows at maxRecordsPerFile=64")
    }
    // rerun-deterministic: same shard contents in the same within-shard order
    val order1 = back.withColumn("f", input_file_name()).collect()
    val out2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString + "/exp"
    // a crashed prior attempt's staging dir is swept, and the promote is
    // staged: no outDir ever exists without its manifest inside
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out2 + ".staging"))
    TextAnalysis.exportShards(docs, out2, nShards, maxRecordsPerFile = 64L)
    assert(!new java.io.File(out2 + ".staging").exists(),
      "the promote must consume the staging dir")
    assert(new java.io.File(s"$out2/_manifest").exists())
    // an export over an EXISTING dir promotes through rewriteInPlace
    TextAnalysis.exportShards(docs, out2, nShards, maxRecordsPerFile = 64L)
    def key(dir: String) = spark.read.parquet(dir)
      .select(col("shard").cast("long"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(key(out) === key(out2))
    assert(order1.nonEmpty)
  }

  test("token shards: two-phase prefix sum equals the naive global window at any geometry") {
    import spark.implicits._
    // known token counts: doc i has (i % 7) + 1 tokens
    val docs = (0L until 300L).map { i =>
      (i, Seq.fill((i % 7).toInt + 1)("w").mkString(" "))
    }.toDF("doc_id", "text")
    def key(numRanges: Int) =
      TextAnalysis.tokenShardAssign(docs, budget = 40L, numRanges = numRanges)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
    // numRanges = 1 IS the naive single-partition global window; wider
    // geometries must be bit-identical (the distributed scan changes the
    // plan, never the numbers)
    val naive = key(1)
    assert(key(4) === naive)
    assert(key(17) === naive)
    // the prefix sum is the actual running total
    var cum = 0L
    naive.foreach { case (_, n, c, _) => cum += n; assert(c === cum) }
    // shards are contiguous in doc_id order and token-bounded: each shard's
    // token span fits the budget plus at most one straddling document
    val byShard = naive.groupBy(_._4)
    assert(naive.map(_._4).toSeq === naive.map(_._4).toSeq.sorted,
      "shard ids must be nondecreasing in doc_id order")
    byShard.foreach { case (shard, rows) =>
      val toks = rows.map(_._2).sum
      val lastDoc = rows.map(_._2).max
      assert(toks <= 40L + lastDoc,
        s"shard $shard holds $toks tokens against budget 40")
      if (shard < byShard.keys.max) {
        // every non-final shard actually REACHED the budget boundary:
        // its last doc's running total crosses the shard's end
        val endCum = rows.map(_._3).max
        assert(endCum >= (shard + 1) * 40L,
          s"shard $shard closed early at $endCum")
      }
    }
  }

  test("token shards: clustered id space keeps ranges balanced, output unchanged") {
    import spark.implicits._
    // a snowflake-ish id space: 300 docs crammed into two far-apart
    // clusters — arithmetic max/numRanges ranges would put ~all rows in
    // 2 of 8 ranges; quantile boundaries must spread them
    val docs = (0L until 300L).map { i =>
      val id = if (i < 150L) 7000000000L + i else 9000000000L + (i - 150L) * 3L
      (id, Seq.fill((i % 7).toInt + 1)("w").mkString(" "))
    }.toDF("doc_id", "text")
    def key(numRanges: Int) =
      TextAnalysis.tokenShardAssign(docs, budget = 40L, numRanges = numRanges)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
    // bit-identical to the naive global window (numRanges = 1 IS the
    // naive shape) — boundaries shape the work, never the answer
    val naive = key(1)
    assert(key(8) === naive)
    // and the 8-range bucketing is actually BALANCED on this id space:
    // re-derive the range of each doc the same way the operator does and
    // pin that no range hoards the corpus (arithmetic ranges would put
    // 150 rows in one range here)
    val probs = (1 until 8).map(_.toDouble / 8).toArray
    val bs = docs.agg(percentile_approx(col("doc_id"),
      lit(probs), lit(10000))).head.getSeq[Long](0)
    val perRange = docs.select("doc_id").collect().map(_.getLong(0))
      .groupBy(id => bs.count(b => id > b)).view.mapValues(_.length)
    assert(perRange.size === 8, s"all 8 ranges populated: $perRange")
    perRange.values.foreach(n =>
      assert(n <= 80, s"a range hoards $n of 300 rows: $perRange"))
  }

  test("token-budget shard export: lossless, manifest-exact, token-bounded dirs") {
    import spark.implicits._
    val docs = (0L until 200L).map { i =>
      (i, Seq.fill((i % 5).toInt + 1)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-tokshards")
      .toString + "/exp"
    TextAnalysis.exportShardsByTokens(docs, out, budget = 60L, numRanges = 8)
    val back = spark.read.parquet(out).withColumn("shard", col("shard").cast("long"))
    assert(back.count() === 200L)
    assert(back.select("doc_id").distinct().count() === 200L)
    val manifest = spark.read.parquet(s"$out/_manifest").collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    val assign = TextAnalysis.tokenShardAssign(docs, budget = 60L, numRanges = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // dirs hold exactly the assignment; manifest totals are exact
    back.collect().foreach { r =>
      assert(r.getAs[Long]("shard") === assign(r.getAs[Long]("doc_id")))
    }
    val actual = back.groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(manifest.view.mapValues(_._1).toMap === actual)
    manifest.foreach { case (_, (_, toks)) => assert(toks <= 60L + 5L) }
  }

  test("bloom decontamination: superset of the exact tier, bounded over-flag") {
    val exact = TextAnalysis.decontaminateDocs(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bloom = TextAnalysis.decontaminateBloomDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bloom.length === exact.size, "same corpus-doc universe")
    bloom.foreach { case (id, nFlagged, c) =>
      val (nShared, contaminated) = exact(id)
      // no false negatives: the sketch can only ADD members
      if (contaminated == 1L) assert(c === 1L, s"false negative at doc $id")
      assert(nFlagged >= nShared, s"doc $id flags fewer grams than truly shared")
    }
    val clean = exact.values.count(_._2 == 0L)
    val over = bloom.count { case (id, _, c) => c == 1L && exact(id)._2 == 0L }
    assert(over <= math.max(1, clean / 100),
      s"over-flagged $over of $clean clean docs — fp rate far above design")
  }

  test("bloom decontamination's corpus pass has no explode and no corpus-side shuffle") {
    val df = TextAnalysis.decontaminateBloomDocs(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the bench side collapsed into the plan LITERAL before this frame was
    // built, so the serving plan is scan → project → gate-orderBy only
    assert("Generate".r.findAllIn(plan).isEmpty,
      "the corpus-side decision must not explode grams")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1,
      s"only the gate orderBy may exchange, got $exchanges:\n${plan.take(1500)}")
  }

  test("sequence packing: an independent recomputation agrees, shards respect the budget") {
    val rows = TextAnalysis.packSequencesDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length ===
      spark.read.parquet(s"$sf/documents.parquet").count())
    rows.groupBy(_._3).foreach { case (bucket, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (docId, n, b, cumOut, shard) =>
        assert(b === docId % 8)
        val expectShard = bucket * 1000000L + (cum / 256L)
        cum += n
        assert(cumOut === cum, s"doc $docId cumulative")
        assert(shard === expectShard, s"doc $docId shard")
      }
    }
    // contiguous fill: the tokens BEFORE each doc within its shard < budget
    rows.foreach { case (_, n, b, cum, shard) =>
      val localShard = shard - b * 1000000L
      assert(cum - n - localShard * 256L < 256L)
    }
  }

  test("repetition metrics agree with a brute-force recomputation") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextAnalysis.repetition(spark, sf).collect()
    assert(out.length === texts.size)
    out.foreach { r =>
      val ws = texts(r.getLong(0)).trim.split("\\s+").toSeq
      val counts = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (topWord, topN) = counts.toSeq.sortBy { case (w, n) => (-n, w) }.head
      assert(r.getAs[Long]("n_words") === ws.size.toLong)
      assert(r.getAs[Long]("n_distinct") === counts.size.toLong)
      assert(r.getAs[String]("top_word") === topWord)
      assert(r.getAs[Long]("top_n") === topN)
      assert(r.getAs[Long]("n_adjacent") ===
        ws.zip(ws.tail).count { case (a, b) => a == b }.toLong)
      assert(r.getAs[Long]("repetitive") ===
        (if (topN.toDouble / ws.size > 0.2) 1L else 0L))
    }
  }

  test("repetition reuses one corpus scan across its stats/top branches at runtime") {
    val df = TextAnalysis.repetition(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(plan.contains("ReusedExchange") || scans <= 1,
      s"expected exchange reuse or a single scan, got $scans scans:\n${plan.take(2000)}")
  }

  test("decontamination shingles each doc exactly once (disjoint filtered branches)") {
    val df = TextAnalysis.decontaminateDocs(spark, sf)
    df.collect()
    // AQE prints "== Initial Plan ==" after the final plan — count only the
    // final section, or every node doubles
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // each Generate (gram explode) must sit ABOVE a branch whose filter was
    // applied below it — i.e. no branch shingles the full corpus, and no
    // inferred size()>0 filter re-inlines the gram chain into a scan
    val generates = "Generate".r.findAllIn(plan).length
    assert(generates === 2, s"expected one explode per disjoint branch, got $generates")
    assert(!plan.contains("Filter (size("),
      "gram chain must not be inlined into a pushed filter")
  }

  test("tf-idf explodes the corpus once: consumers read the materialized tf") {
    val df = TextAnalysis.tfIdf(spark, sf)
    df.collect()
    // r13 form of the explode-once pin: tf is materialized
    // (localCheckpoint), so the consuming plan reads ExistingRDD and
    // contains no explode/generate at all (the pre-r13 ReusedExchange pin
    // was weaker and in fact did not hold — each branch re-derived the
    // explode chain)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      s"df and the scoring join must read the materialized tf:\n${plan.take(2000)}")
    assert(!plan.contains("Generate"),
      s"no consumer may re-explode the corpus:\n${plan.take(2000)}")
  }

  test("heavy hitters (sketch + recount) equal the exact full-vocabulary top-k") {
    val exact = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("word").count()
      .orderBy(col("count").desc, col("word")).limit(25)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val approx = TextAnalysis.heavyHitters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(approx === exact,
      "on a closed vocabulary the sketch candidates must cover the true top-k")
  }

  test("budget selection: exact tier honors the budget and takes best-first") {
    val budget = 10000L
    val sel = TextAnalysis.selectBudget(spark, sf, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(sel.nonEmpty)
    // every selected doc STARTS within budget (the packSequences rule)
    sel.foreach { case (id, n, _, cum) =>
      assert(cum - n < budget, s"doc $id starts at ${cum - n}")
    }
    // best-first: no unselected doc outscores a selected one beyond the
    // boundary rule — i.e. the selection is a prefix of the (score desc,
    // doc_id) ranking
    val all = TextAnalysis.quality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(6))).toMap
    val ranked = all.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1)
    val selIds = sel.map(_._1).toSet
    assert(ranked.take(selIds.size).toSet === selIds,
      "exact selection must be the top prefix of the quality ranking")
  }

  test("budget selection: threshold tier selects a subset of the exact tier") {
    val budget = 10000L
    val exactIds = TextAnalysis.selectBudget(spark, sf, budget).collect()
      .map(_.getLong(0)).toSet
    val th = TextAnalysis.selectBudgetThreshold(spark, sf, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(th.nonEmpty)
    assert(th.map(_._1).toSet.subsetOf(exactIds),
      "bands kept whole are a prefix of the exact ranking, so the " +
        "threshold tier never selects a doc the exact tier rejects")
    assert(th.map(_._2).sum <= budget,
      "whole-band selection cannot overshoot the budget")
  }

  test("chunking covers every token, overlaps by window-stride, clips the tail") {
    import spark.implicits._
    val probe = Seq(
      (1L, (1 to 130).map(i => s"w$i").mkString(" ")), // 130 tokens: 3 chunks
      (2L, (1 to 50).map(i => s"w$i").mkString(" ")),  // exactly one window
      (3L, (1 to 51).map(i => s"w$i").mkString(" ")),  // one token past: 2 chunks
      (4L, "single"),                                   // tiny doc: 1 chunk
      (5L, "")).toDF("doc_id", "text")                  // empty: split -> [""], 1 chunk
    val out = TextAnalysis.chunkDocuments(probe, window = 50, stride = 40)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).length === 3 && byDoc(2L).length === 1
      && byDoc(3L).length === 2 && byDoc(4L).length === 1 && byDoc(5L).length === 1)
    byDoc.values.foreach { chunks =>
      val sorted = chunks.sortBy(_._2)
      assert(sorted.head._3 === 0L, "first chunk starts at token 0")
      sorted.foreach { case (_, _, s0, e0, n) =>
        assert(n === e0 - s0 && n > 0 && n <= 50) }
      sorted.sliding(2).foreach {
        case Array((_, i1, s1, e1, _), (_, i2, s2, _, _)) =>
          assert(i2 === i1 + 1 && s2 === s1 + 40 && s2 < e1,
            "consecutive chunks advance by stride and overlap")
        case _ =>
      }
    }
    // doc 1: 130 tokens -> last chunk must end exactly at 130
    assert(byDoc(1L).map(_._4).max === 130L)
  }

  test("span dedup matches a brute-force 8-gram recomputation and shingles once") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val gramSets = texts.map { case (id, t) =>
      id -> t.trim.split("\\s+").sliding(8).filter(_.length == 8)
        .map(_.mkString(" ")).toSet
    }.toMap
    val df = gramSets.values.flatten
      .groupBy(identity).map { case (g, os) => g -> os.size }
    val expected = gramSets.map { case (id, gs) =>
      id -> (gs.size.toLong, gs.count(g => df(g) >= 2).toLong)
    }
    val out = TextAnalysis.spanDedupDocs(spark, sf)
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, (n, sh)) =>
      val (gn, gsh, ratio) = got(id)
      assert(gn === n && gsh === sh, s"doc $id: expected ($n,$sh) got ($gn,$gsh)")
      if (n > 0) assert(ratio === sh.toDouble / n.toDouble)
    }
    // shingle-once pin, r13 form: the pairs frame is materialized once
    // (localCheckpoint) and every consumer reads its blocks — so the
    // consuming plan must read ExistingRDD and contain NO gram-producing
    // expression at all (the pre-r13 ReusedExchange pin was weaker AND
    // false: the exchange was in fact re-derived per consumer branch)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      s"consumers must read the materialized pairs:\n${plan.take(2000)}")
    assert(!plan.toLowerCase.contains("ngrams"),
      s"no consumer may re-shingle:\n${plan.take(2000)}")
  }

  test("radius edit join equals the unpruned brute force (q-gram filter is lossless)") {
    // the q-gram count filter may only OVER-generate candidates; this pins
    // completeness by comparing against the direct band² scan at spec SF
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"))
    val brute = d.as("a").join(d.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.len") - col("b.len")) <= 25)
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.text"), col("b.text")).cast("long").as("dist"))
      .filter(col("dist") <= 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pruned = TextAnalysis.editDistRadius(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pruned === brute)
    // and at a radius where short docs fall ENTIRELY below the q-gram
    // threshold, the length-band fallback path must still find their pairs
    val wide = TextAnalysis.editDistRadius(spark, sf, radius = 120)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bruteWide = d.as("a").join(d.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.len") - col("b.len")) <= 120)
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.text"), col("b.text")).cast("long").as("dist"))
      .filter(col("dist") <= 120)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(wide === bruteWide)
    // LSH-fed candidates — the 100 TB composition (the gram join is
    // corpus-alphabet-bound; LSH is not): pure verification of a fed pair
    // set. Exact-within-candidates by construction; on this corpus's dup
    // structure the (deterministic, seeded) LSH candidates cover every
    // radius pair, so the composed output equals brute force outright.
    val fed = TextAnalysis.editDistRadius(spark, sf,
        candidates = Some(graft.ops.Dedup.minhashLsh(spark, sf)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fed === brute)
  }

  test("quality classifier: fed weights move the boundary; cut is monotone") {
    import graft.ops.TextAnalysis.QualityWeights
    val out = TextAnalysis.qualityClassifier(spark, sf).collect()
    val kept = out.count(_.getAs[Long]("keep") == 1L)
    // default cut sits near the margin median — both classes must appear
    assert(kept > 0 && kept < out.length, s"kept $kept of ${out.length}")
    // keep ⟺ margin ≥ cut, row by row
    out.foreach { r =>
      assert((r.getAs[Double]("margin") >= -0.42) == (r.getAs[Long]("keep") == 1L))
    }
    // raising the cut can only shrink the kept set (margins are unchanged —
    // same weights, only the threshold moves)
    val stricter = TextAnalysis.qualityClassifier(spark, sf,
      QualityWeights(cut = -0.3)).collect()
    val keptStrict = stricter.map(r => r.getLong(0) ->
      r.getAs[Long]("keep")).toMap
    val keptLoose = out.map(r => r.getLong(0) -> r.getAs[Long]("keep")).toMap
    assert(keptStrict.count(_._2 == 1L) <= kept)
    keptStrict.foreach { case (id, k) => if (k == 1L) assert(keptLoose(id) == 1L) }
    // a degenerate cut keeps everything — the filter is the threshold, not
    // a hidden feature gate
    val all = TextAnalysis.qualityClassifier(spark, sf,
      QualityWeights(cut = -1e9)).collect()
    assert(all.forall(_.getAs[Long]("keep") == 1L))
  }

  test("surprisal matches an exact unigram-model recomputation") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val counts = texts.flatMap(_._2).groupBy(identity)
      .map { case (w, os) => w -> os.size.toLong }
    val total = counts.values.sum.toDouble
    val expected = texts.map { case (id, ws) =>
      id -> (ws.size.toLong,
        -ws.map(w => math.log(counts(w) / total)).sum / ws.size)
    }.toMap
    val got = TextAnalysis.surprisal(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, (n, s0)) =>
      val (gn, gs) = got(id)
      assert(gn === n)
      assert(math.abs(gs - s0) < 1e-9, s"doc $id: expected $s0 got $gs")
      assert(gs > 0.0, "negative mean log-prob is positive surprisal")
    }
  }

  test("bigram perplexity matches an exact add-k recomputation; order sensitivity holds") {
    val k = 0.1
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    def bigrams(ws: Seq[String]) = ws.zip(ws.drop(1))
    val c12 = texts.flatMap(t => bigrams(t._2)).groupBy(identity)
      .map { case (bg, os) => bg -> os.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val v = c12.keySet.map(_._2).size.toDouble
    val expected = texts.collect { case (id, ws) if bigrams(ws).nonEmpty =>
      val bgs = bigrams(ws)
      id -> (bgs.size.toLong, -bgs.map { bg =>
        math.log((c12(bg) + k) / (c1(bg._1) + k * v))
      }.sum / bgs.size)
    }.toMap
    val got = TextAnalysis.bigramPerplexity(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, (n, s0)) =>
      val (gn, gs) = got(id)
      assert(gn === n)
      assert(math.abs(gs - s0) < 1e-9, s"doc $id: expected $s0 got $gs")
      assert(gs > 0.0)
    }
    // order sensitivity — what the unigram score cannot see: a corpus of
    // repeated in-order sentences scores its members LOW, and a document
    // whose words are the same multiset but order-scrambled scores
    // strictly higher under the same model
    val s2 = spark
    import s2.implicits._
    val sent = "the quick brown fox jumps over the lazy dog"
    val scrambled = "dog the over quick lazy fox brown jumps the"
    val dir = java.nio.file.Files.createTempDirectory("graft_bigram").toString
    ((0L until 20L).map(i => (i, sent)) :+ (99L, scrambled))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sc = TextAnalysis.bigramPerplexity(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sc(99L) > sc(0L) + 0.5,
      s"scrambled ${sc(99L)} must score well above fluent ${sc(0L)}")
  }
}
