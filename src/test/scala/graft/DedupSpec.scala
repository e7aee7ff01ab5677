package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

class DedupSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact dedup: canonical is the min doc_id of each hash group") {
    val out = Dedup.exact(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("canonical_id") <= r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("group_size") >= 1L)
    }
  }

  test("normalized dedup groups are a coarsening of exact groups") {
    val exact = Dedup.exact(spark, sf)
      .groupBy("text_md5").count().count()
    val norm = Dedup.normalized(spark, sf)
      .groupBy("text_md5").count().count()
    assert(norm <= exact)
  }

  test("minhash LSH recovers high-jaccard ground-truth pairs (recall)") {
    val truth = pairSet(Dedup.ngramJaccard(spark, sf).filter(col("jaccard") >= 0.9))
    assert(truth.nonEmpty, "test data should contain planted near-dups")
    val found = pairSet(Dedup.minhashLsh(spark, sf))
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.8, s"recall=$recall, truth=${truth.size}, found=${found.size}")
    // precision side: every reported pair passed the exact-jaccard verify
    Dedup.minhashLsh(spark, sf).collect()
      .foreach(r => assert(r.getAs[Double]("jaccard") >= 0.7))
  }

  test("minhash geometry is a runtime knob: more bands → recall holds or improves") {
    val truth = pairSet(Dedup.ngramJaccard(spark, sf).filter(col("jaccard") >= 0.9))
    // 32 bands × 2 rows drops the s-curve threshold to ~0.18 — a looser
    // candidate net; the 0.7 verify cut keeps precision, so recall can only
    // benefit. This is the knob a 100 TB run turns, as an argument.
    val found = pairSet(Dedup.minhashLsh(spark, sf, numHashes = 64, bands = 32))
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.8, s"recall=$recall at 32 bands")
    Dedup.minhashLsh(spark, sf, 64, 32).collect()
      .foreach(r => assert(r.getAs[Double]("jaccard") >= 0.7))
  }

  test("nearDupGroups does not accumulate cached frames across iterations") {
    // count CACHES only: localCheckpoint blocks (the shared shingle+sig
    // materialization) are ContextCleaner-owned — they linger until their
    // frame is GC'd, so counting them races the GC and says nothing about
    // the per-iteration cache leak this test pins
    def caches(): Int = spark.sparkContext.getPersistentRDDs.values
      .count(r => !r.isCheckpointed)
    val before = caches()
    Dedup.nearDupGroups(spark, sf).collect()
    val after = caches()
    // only the final materialized labels frame may remain cached
    assert(after - before <= 1, s"cached RDDs grew $before → $after")
  }

  test("simhash finds near-dup pairs and honors the hamming bound") {
    val rows = Dedup.simhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 3L))
    // simhash pairs should heavily overlap the jaccard-top pairs
    val truth = pairSet(Dedup.ngramJaccard(spark, sf).filter(col("jaccard") >= 0.9))
    val found = rows.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(found.intersect(truth).nonEmpty)
  }

  test("LSH-bucketed embedding dedup recovers the all-pairs ground truth pairs") {
    val truth = Dedup.embedding(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val found = Dedup.embeddingLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision is exact by construction (candidates are cosine-verified)
    assert(found.subsetOf(truth))
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.3, s"recall=$recall (near-random embeddings are LSH's worst case)")
  }

  test("embedding-LSH shuffle exchanges carry id pairs, never vectors") {
    // the id→embedding re-join must broadcast for this plan shape to hold;
    // pin the threshold so the assertion tests the code, not session drift
    withConf("spark.sql.autoBroadcastJoinThreshold", "10485760b") {
      val fmt = Dedup.embeddingLsh(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val shuffleBlocks = fmt.split("\n\n").filter(b =>
        b.linesIterator.nextOption.exists(_.matches("""\(\d+\) Exchange.*"""))
          && b.contains("hashpartitioning"))
      assert(shuffleBlocks.nonEmpty)
      shuffleBlocks.foreach { b =>
        val input = b.linesIterator.find(_.startsWith("Input")).getOrElse("")
        assert("""\b(embedding|e1|e2)#""".r.findFirstIn(input).isEmpty,
          s"a shuffle carries vectors:\n$b")
      }
    }
  }

  test("connected components assign one canonical per near-dup group") {
    val labels = Dedup.nearDupGroups(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty)
    // canonical is the component minimum: label <= member, label is a member
    labels.foreach { case (d, l) => assert(l <= d); assert(labels(l) === l) }
    // every LSH pair must land in the same component
    Dedup.minhashLsh(spark, sf).collect().foreach { r =>
      assert(labels(r.getLong(0)) === labels(r.getLong(1)))
    }
  }

  test("near-dup survivors keep exactly one representative per component") {
    val survivors = Dedup.nearDupSurvivors(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    val labels = Dedup.nearDupGroups(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dropped = labels.count { case (d, l) => l != d }
    assert(survivors.size.toLong === total - dropped)
    // at most one member of every near-dup pair survives, and each
    // component's canonical does survive
    Dedup.minhashLsh(spark, sf).collect().foreach { r =>
      val (d1, d2) = (r.getLong(0), r.getLong(1))
      assert(!(survivors.contains(d1) && survivors.contains(d2)),
        s"pair ($d1,$d2) both survived")
    }
    labels.values.toSet.foreach((c: Long) => assert(survivors.contains(c)))
  }

  test("precomputed-pairs overloads compose identically to the wrapped forms") {
    val pairs = Dedup.minhashLsh(spark, sf).select(col("d1"), col("d2")).cache()
    try {
      val (groups, rounds) = Dedup.propagateMinLabels(pairs)
      assert(rounds >= 1)
      val composed = groups.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val wrapped = Dedup.nearDupGroups(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(composed === wrapped)
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val composedSurvivors = Dedup.nearDupSurvivors(docs, groups).collect()
        .map(_.getLong(0)).toSet
      val wrappedSurvivors = Dedup.nearDupSurvivors(spark, sf).collect()
        .map(_.getLong(0)).toSet
      assert(composedSurvivors === wrappedSurvivors)
      groups.unpersist() // caller-owned, per the propagateMinLabels contract
    } finally pairs.unpersist()
  }

  test("components converge in O(log diameter): a 40-hop chain resolves within 8 rounds") {
    // path-shaped components are min-label propagation's pathological
    // case — hop-only propagation moves the minimum ONE edge per round,
    // so a 40-edge chain would exhaust maxIter=10 and return a silently
    // unconverged labeling. Pointer jumping doubles the horizon per
    // round: the chain must fully resolve to label 0, well within budget.
    val s2 = spark
    import s2.implicits._
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("d1", "d2")
    val (labels, rounds) = Dedup.propagateMinLabels(chain)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    labels.unpersist()
    assert(got.size === 41)
    assert(got.values.forall(_ === 0L),
      s"every chain vertex must resolve to component min 0: $got")
    assert(rounds <= 8, s"pointer jumping must converge a 40-hop chain " +
      s"in O(log d) rounds, took $rounds")
    // a star (the clique-like easy case) still converges immediately
    val star = (1L to 20L).map(i => (0L, i)).toDF("d1", "d2")
    val (sl, sr) = Dedup.propagateMinLabels(star)
    assert(sl.collect().forall(_.getLong(1) === 0L))
    sl.unpersist()
    assert(sr <= 3)
  }

  test("incremental components: fold ≡ full recompute, bridges and new docs included") {
    val s2 = spark
    import s2.implicits._
    // old graph: component A = chain 0-1-2-3, component B = {10, 11},
    // component C = {20, 21}
    val p1 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("d1", "d2")
    val labels1 = Dedup.nearDupGroups(p1)
    // batch: a BRIDGE merging A and B (3-10: B's canonical must fall to
    // 0), an extension of C (21-22), and a brand-new component {30, 31}
    val p2 = Seq((3L, 10L), (21L, 22L), (30L, 31L)).toDF("d1", "d2")
    val inc = Dedup.nearDupGroupsIncremental(labels1, p2)
    val full = Dedup.nearDupGroups(p1.unionByName(p2))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val (gi, gf) = (toMap(inc), toMap(full))
    inc.unpersist(); full.unpersist(); labels1.unpersist()
    assert(gi === gf, "incremental fold must equal the full recompute exactly")
    assert(gi(11L) === 0L, "the bridged component must take the merged min")
    assert(gi(22L) === 20L && gi(31L) === 30L)
  }

  test("incremental components: the contracted old graph converges in batch rounds, not corpus diameter") {
    val s2 = spark
    import s2.implicits._
    // the 40-hop chain needs ~8 pointer-jump rounds from scratch; once
    // contracted to a labeling (a star), folding a batch bridge must
    // converge in the rounds the NEW edge demands — the incremental claim
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("d1", "d2")
    val labels = Dedup.nearDupGroups(chain)
    val labelEdges = labels
      .select(col("doc_id").as("d1"), col("canonical_id").as("d2"))
    val bridge = Seq((40L, 100L), (100L, 101L)).toDF("d1", "d2")
    // same lineage truncation nearDupGroupsIncremental applies at its
    // fold seam (this test reaches for propagateMinLabels directly only
    // to read the rounds counter)
    val (incLabels, rounds) =
      Dedup.propagateMinLabels(
        labelEdges.unionByName(bridge).localCheckpoint())
    val got = incLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    incLabels.unpersist(); labels.unpersist()
    assert(got(101L) === 0L, "the new docs must join the chain's component")
    assert(got.size === 43)
    assert(rounds <= 3,
      s"folding a batch into a contracted labeling must converge in " +
        s"batch-bridge rounds, took $rounds")
  }

  test("incremental components gate entry ≡ full-corpus recompute") {
    val inc = Dedup.dedupComponentsIncremental(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.nearDupGroups(spark, sf)
    val gf = full.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    full.unpersist()
    assert(inc === gf)
    assert(inc.nonEmpty)
  }

  test("incremental dedup agrees with a brute-force recomputation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def normMd5(t: String): String = {
      val n = t.replaceAll("\\s+", " ").trim.toLowerCase
      java.security.MessageDigest.getInstance("MD5").digest(n.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val corpusHashes = docs.filter(_._2 != "src19").map(d => normMd5(d._3)).toSet
    val batch = docs.filter(_._2 == "src19").sortBy(_._1)
    assert(batch.nonEmpty, "fixture should contain the src19 batch")
    val seen = collection.mutable.Set[String]()
    val expected = batch.map { case (id, _, t) =>
      val h = normMd5(t)
      val inCorpus = corpusHashes.contains(h)
      val inBatch = seen.contains(h)
      seen += h
      id -> (if (inCorpus) 1L else 0L, if (inBatch) 1L else 0L,
        if (!inCorpus && !inBatch) 1L else 0L)
    }.toMap
    val out = Dedup.incremental(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out === expected)
  }

  test("minhash incremental ≡ full-corpus LSH restricted to pairs touching the batch") {
    // the gate form: batch = doc_id % 4 == 0 signed inline, corpus = the
    // other 3/4 read back from the persisted signature index. Buckets and
    // verification must agree bit-for-bit with one full-corpus run.
    val inc = Dedup.minhashIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      .filter { case ((d1, d2), _) => d1 % 4 == 0 || d2 % 4 == 0 }
    assert(inc.nonEmpty, "batch slice should cross planted near-dup pairs")
    assert(inc == full,
      s"incremental=${inc.keySet.toList.sorted} full-restricted=${full.keySet.toList.sorted}")
  }

  test("minhash signature index round-trips through parquet") {
    val path = java.nio.file.Files.createTempDirectory("graft_mh_idx").toString
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 4 =!= 0)
    Dedup.saveMinhashIndex(spark, corpus, path)
    val idx = Dedup.loadMinhashIndex(spark, path)
    assert(idx.columns.toSeq == Seq("doc_id", "hs", "sig"))
    // every ≥2-word corpus doc is indexed, none of the batch slice is
    val expected = corpus.filter(size(split(trim(col("text")), "\\s+")) >= 2).count()
    assert(idx.count() == expected)
    assert(idx.filter(col("doc_id") % 4 === 0).count() == 0)
  }

  test("minhash index append: day-2 batch sees day-1 docs without any rebuild") {
    val path = java.nio.file.Files.createTempDirectory("graft_mh_append").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // day 0 corpus: doc_id % 4 ∈ {2, 3}; day 1 batch: % 4 == 1; day 2: % 4 == 0
    Dedup.saveMinhashIndex(spark, docs.filter(col("doc_id") % 4 >= 2), path)
    val day1 = docs.filter(col("doc_id") % 4 === 1)
    Dedup.appendToMinhashIndex(spark, day1, path)
    val idx = Dedup.loadMinhashIndex(spark, path)
    val day2 = docs.filter(col("doc_id") % 4 === 0)
    val pairs = Dedup.minhashIncremental(spark, day2, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ≡ the full-corpus run restricted to pairs touching day 2 — the same
    // parity as the gate-form test, but with the index grown by append
    val full = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (d1, d2) => d1 % 4 == 0 || d2 % 4 == 0 }.toSet
    assert(pairs == full)
    // and day-1 docs are genuinely in the appended index
    assert(idx.filter(col("doc_id") % 4 === 1).count() > 0)
  }

  test("embedding near-dup cosine matches an independent recomputation") {
    val out = Dedup.embedding(spark, sf).limit(5).collect()
    assert(out.nonEmpty)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    out.foreach { r =>
      val (v1, v2, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (a, b) = (emb(v1), emb(v2))
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val (x, y) = (a(i).toDouble, b(i).toDouble)
        dot += x * y; na += x * x; nb += y * y
      }
      val expect = dot / (math.sqrt(na) * math.sqrt(nb))
      assert(c === expect, s"pair ($v1,$v2)")
      assert(c >= 0.4)
    }
  }

  test("embedding incremental ≡ full-corpus LSH restricted to pairs touching the batch") {
    val inc = Dedup.embeddingIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = Dedup.embeddingLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      .filter { case ((v1, v2), _) => v1 % 4 == 0 || v2 % 4 == 0 }
    assert(inc.nonEmpty, "batch slice should cross near-dup vector pairs")
    assert(inc == full,
      s"incremental=${inc.keySet.toList.sorted} full-restricted=${full.keySet.toList.sorted}")
  }

  test("embedding index append: a later batch sees appended vectors without rebuild") {
    val path = java.nio.file.Files.createTempDirectory("graft_emb_append").toString
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    Dedup.saveEmbeddingIndex(spark, e.filter(col("vec_id") % 4 >= 2), path)
    Dedup.appendToEmbeddingIndex(spark, e.filter(col("vec_id") % 4 === 1), path)
    val (vecs, buckets) = Dedup.loadEmbeddingIndex(spark, path)
    val inc = Dedup.embeddingIncremental(spark,
        e.filter(col("vec_id") % 4 === 0), vecs, buckets).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.embeddingLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (v1, v2) => v1 % 4 == 0 || v2 % 4 == 0 }.toSet
    assert(inc === full)
  }

  test("fuzzy decontamination: cross-corpus recall, exact-verified scores, no train×train") {
    val isBench = (id: Long) => id % 11 == 0
    // ground truth: exact word-bigram jaccard restricted to cross-corpus
    // pairs — the same shingle definition the operator hashes
    val cross = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Double]("jaccard")))
      .filter { case (d1, d2, _) => isBench(d1) ^ isBench(d2) }
      .map { case (d1, d2, j) => (if (isBench(d1)) (d2, d1) else (d1, d2), j) }
    val truthTrain = cross.filter(_._2 >= 0.9).map(_._1._1).toSet
    val crossJ = cross.toMap
    val out = Dedup.decontaminateFuzzy(spark, sf).collect()
      .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("bench_id"),
        r.getAs[Double]("jaccard"), r.getAs[Long]("n_matches")))
    val flagged = out.map(_._1).toSet
    // recall: every train doc with a ≥0.9 exact cross match is flagged
    // (0.9 truth vs the 0.7 verify cut = the same LSH margin the
    // full-corpus recall test uses)
    val recall = truthTrain.count(flagged.contains).toDouble / truthTrain.size
    assert(truthTrain.nonEmpty, "split must cross planted near-dup pairs")
    assert(recall >= 0.8, s"recall=$recall, truth=${truthTrain.size}")
    out.foreach { case (t, b, j, n) =>
      assert(!isBench(t) && isBench(b), "every reported pair is cross-corpus")
      assert(j >= 0.7, "verify cut holds")
      assert(n >= 1L)
      // reported jaccard agrees with the exact string-gram recomputation
      // (hashed sets differ only on xxhash64 collisions)
      assert(math.abs(crossJ((t, b)) - j) < 1e-6,
        s"($t,$b): exact=${crossJ((t, b))} reported=$j")
    }
  }

  test("semantic (SemDeDup) dedup: exact precision, high recall, two geometries") {
    val exact = Dedup.embedding(spark, sf)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    Seq(128 -> 2, 256 -> 2).foreach { case (targetCluster, nprobe) =>
      val got = Dedup.semantic(spark, sf, targetCluster = targetCluster, nprobe = nprobe)
        .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.subsetOf(exact),
        s"tc=$targetCluster: every emitted pair passed exact cosine, so precision is 1")
      val recall = got.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.9,
        s"tc=$targetCluster nprobe=$nprobe recall=$recall (multi-probe membership " +
          "exists precisely to catch pairs split by a cell boundary)")
    }
  }

  test("semantic two-level membership: recall parity with the flat scorer, two geometries") {
    // the √k coarse layer must not cost recall: pairs found via two-level
    // membership ⊆ exact truth (precision 1 by construction, same as flat)
    // and recover ≥90% of what the flat N·k scorer finds, at two
    // geometries — the contract that makes the scale tier a drop-in
    val exact = Dedup.embedding(spark, sf)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(128 -> 2, 256 -> 2).foreach { case (targetCluster, nprobe) =>
      val flat = Dedup.semantic(spark, sf, targetCluster = targetCluster,
        nprobe = nprobe)
        .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val two = Dedup.semantic(spark, sf, targetCluster = targetCluster,
        nprobe = nprobe, coarseProbe = 2)
        .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(two.subsetOf(exact),
        s"tc=$targetCluster: two-level pairs still pass exact cosine")
      val parity = two.intersect(flat).size.toDouble / flat.size
      assert(parity >= 0.9,
        s"tc=$targetCluster nprobe=$nprobe two-level/flat parity=$parity " +
          "(coarse probing must not lose the cells the flat scorer ranks)")
    }
  }

  test("semantic auto-cutover: flat below AutoTwoLevelK, two-level (cprobe=3) at it") {
    // the resolver is the entire auto policy — pin its edges directly
    assert(Dedup.resolveCoarseProbe(-1, 1500, 1500) === 3)
    assert(Dedup.resolveCoarseProbe(-1, 1499, 1500) === 0)
    assert(Dedup.resolveCoarseProbe(0, 1000000, 1500) === 0, "0 forces flat")
    assert(Dedup.resolveCoarseProbe(2, 2, 1500) === 2, ">0 forces two-level")
    // gate geometry (k = 500/128 → 3): the default path is EXACTLY the
    // flat path — auto must not change gate output
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Dedup.semantic(spark, sf))
      === pairs(Dedup.semantic(spark, sf, coarseProbe = 0)))
    // large-k geometry (threshold lowered to what 500 vectors can reach:
    // k = 500/4 = 125 ≥ 100): the default path must EXACTLY equal the
    // forced two-level cprobe=3 path — exact equality proves the cutover
    // engaged, since flat-vs-two-level only agree approximately (~0.9
    // parity), never identically, on this corpus
    assert(pairs(Dedup.semantic(spark, sf, targetCluster = 4, autoTwoLevelK = 100))
      === pairs(Dedup.semantic(spark, sf, targetCluster = 4, coarseProbe = 3)))
  }

  test("containment dominates jaccard and catches subset pairs at full score") {
    // greatest(|∩|/|A|, |∩|/|B|) = |∩|/min(|A|,|B|) ≥ |∩|/|A∪B| for every
    // pair — containment can only reveal MORE similarity than jaccard
    val cont = Dedup.containment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(cont.nonEmpty)
    cont.values.foreach(c => assert(c > 0.0 && c <= 1.0))
    val jac = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val shared = cont.keySet.intersect(jac.keySet)
    assert(shared.nonEmpty)
    shared.foreach(p => assert(cont(p) >= jac(p) - 1e-12,
      s"pair $p: containment ${cont(p)} < jaccard ${jac(p)}"))
  }

  test("semantic membership is computed once at runtime (exchange reuse)") {
    // the membership subplan (N·k cell scoring + window) feeds BOTH sides
    // of the candidate self-join; with shuffle joins AQE must reuse its
    // exchange, not score N·k twice. Broadcast is disabled because at test
    // SF every join broadcasts and there is no exchange to reuse (at real
    // scale the cell self-join is a shuffle join — this is that shape).
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val df = Dedup.semantic(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(plan.contains("ReusedExchange"),
        s"membership must be computed once:\n${plan.take(1500)}")
    }
  }

  test("minhash index delete: tombstone hides the doc everywhere; compaction makes it physical") {
    val spark2 = spark
    import spark2.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_mh_del").toString + "/idx"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Dedup.saveMinhashIndex(spark, docs.filter(col("doc_id") % 4 =!= 0), path)
    // victim: a corpus-side doc that actually pairs with the batch slice —
    // deleting it must change real candidate traffic, not a bystander
    val cross = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (d1, d2) => (d1 % 4 == 0) != (d2 % 4 == 0) }
    val victim = cross.map { case (d1, d2) => if (d1 % 4 == 0) d2 else d1 }.min
    Dedup.removeFromMinhashIndex(spark, path, Seq(victim).toDF("doc_id"))
    val idx = Dedup.loadMinhashIndex(spark, path)
    assert(idx.filter(col("doc_id") === victim).count() == 0,
      "tombstoned doc must not load")
    // the takedown contract: the removed doc never appears in candidates
    val pairs = pairSet(Dedup.minhashIncremental(spark,
      docs.filter(col("doc_id") % 4 === 0), idx))
    assert(!pairs.exists(p => p._1 == victim || p._2 == victim))
    // tombstoned index ≡ index rebuilt without the doc (signatures are
    // per-doc content functions)
    val path2 = java.nio.file.Files.createTempDirectory("graft_mh_del2").toString + "/idx"
    Dedup.saveMinhashIndex(spark,
      docs.filter(col("doc_id") % 4 =!= 0 && col("doc_id") =!= victim), path2)
    def sigs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.select("doc_id", "sig").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // materialized before compaction: loaded frames are lazy views over
    // the index files (including the tombstone file compaction deletes) —
    // maintenance invalidates them, consumers re-load after, by contract
    val tombstonedSigs = sigs(idx)
    assert(tombstonedSigs == sigs(Dedup.loadMinhashIndex(spark, path2)))
    // compaction folds the tombstone into the files: the PHYSICAL table no
    // longer contains the doc, the tombstone file is gone, reads unchanged
    Dedup.compactMinhashIndex(spark, path)
    assert(spark.read.parquet(path).filter(col("doc_id") === victim).count() == 0,
      "compaction must physically remove tombstoned rows")
    assert(!new java.io.File(path + "_tombstones").exists())
    assert(sigs(Dedup.loadMinhashIndex(spark, path)) == tombstonedSigs)
  }

  test("weighted survivors: mass conserved, survivor set matches, unlabeled docs carry 1") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Dedup.nearDupSurvivorsWeightedQ(spark, sf).collect()
    // every dropped near-twin's mass lands on its canonical: copies and
    // characters both sum back to the whole corpus
    assert(out.map(_.getAs[Long]("n_copies")).sum === docs.count())
    assert(out.map(_.getAs[Long]("cluster_chars")).sum
      === docs.agg(sum(col("n_chars"))).head.getLong(0))
    assert(out.map(_.getLong(0)).toSet
      === Dedup.nearDupSurvivors(spark, sf).collect().map(_.getLong(0)).toSet,
      "weighting must not change WHO survives")
    assert(out.exists(_.getAs[Long]("n_copies") > 1L),
      "the dup-dense corpus must produce real multiplicities")
    val groups = Dedup.nearDupGroups(spark, sf)
    val labeled = groups.collect().map(_.getLong(0)).toSet
    groups.unpersist()
    out.filterNot(r => labeled(r.getLong(0))).foreach { r =>
      assert(r.getAs[Long]("n_copies") === 1L)
      assert(r.getAs[Long]("cluster_chars") === r.getAs[Long]("n_chars"))
    }
  }

  test("deletion contract: a removed bridge doc splits its component after the maintenance rebuild") {
    val spark2 = spark
    import spark2.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_mh_bridge")
      .toString + "/idx"
    val toks = (1 to 40).map(i => f"tok$i%02d")
    def doc(lo: Int, hi: Int) = toks.slice(lo - 1, hi).mkString(" ")
    // bigram jaccard: (1,2) and (2,3) ≈ 0.81 ≥ 0.7; (1,3) ≈ 0.66 < 0.7 —
    // doc 2 is the only bridge between 1 and 3
    val docs = Seq(
      (1L, doc(1, 30)), (2L, doc(4, 33)), (3L, doc(7, 36)),
      (10L, (50 to 80).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    Dedup.saveMinhashIndex(spark, docs, path)
    Dedup.saveComponentLabels(spark, path)
    def labels() = spark.read.parquet(Dedup.componentLabelsPath(path))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels() === Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "the bridge doc connects 1-2-3 into one component")
    // nothing tombstoned → the rebuild declines (it scans the index)
    assert(Dedup.maybeRebuildComponents(spark, path) === ((false, 0L)))
    // takedown of the bridge: the addition-only labeling is now stale —
    // fsck surfaces exactly that, nothing else flips
    Dedup.removeFromMinhashIndex(spark, path, Seq(2L).toDF("doc_id"))
    val fscked = graft.ops.Fsck.fsckMinhashIndex(spark, path).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[String]("status")).toMap
    assert(fscked("tombstoned_labels") === "warn")
    assert(fscked("one_row_per_doc") === "ok")
    // the decision fires on the one label row naming the tombstoned doc,
    // and the rebuilt labeling no longer claims 1~3 (the only path ran
    // through the deleted bridge)
    val (rebuilt, affected) = Dedup.maybeRebuildComponents(spark, path)
    assert(rebuilt && affected === 1L)
    assert(labels() === Map.empty,
      "no near-dup claim may survive the bridge removal")
    assert(Dedup.maybeRebuildComponents(spark, path) === ((false, 0L)),
      "a second pass has nothing left to fix")

    // the orchestrated path sequences the decision BEFORE compaction
    // folds the tombstone file away
    val path2 = java.nio.file.Files.createTempDirectory("graft_mh_bridge2")
      .toString + "/idx"
    Dedup.saveMinhashIndex(spark, docs, path2)
    Dedup.saveComponentLabels(spark, path2)
    Dedup.removeFromMinhashIndex(spark, path2, Seq(2L).toDF("doc_id"))
    val report = graft.ops.Maintenance.runAll(spark,
      Seq(graft.ops.Maintenance.Target("minhash_index", path2))).head
    assert(report.getAs[Boolean]("retrain_checked")
      && report.getAs[Boolean]("retrain_fired"))
    assert(spark.read.parquet(Dedup.componentLabelsPath(path2)).count() === 0L)
    assert(!new java.io.File(path2 + "_tombstones").exists(),
      "compaction still folded the tombstone after the decision")
  }

  test("re-adding a tombstoned doc via append resurfaces it (takedown is reversible)") {
    val spark2 = spark
    import spark2.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_mh_readd").toString + "/idx"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Dedup.saveMinhashIndex(spark, docs.filter(col("doc_id") < 100), path)
    val victim = 7L
    Dedup.removeFromMinhashIndex(spark, path, Seq(victim).toDF("doc_id"))
    assert(Dedup.loadMinhashIndex(spark, path)
      .filter(col("doc_id") === victim).count() == 0)
    // an unrelated append leaves the tombstone in force…
    Dedup.appendToMinhashIndex(spark, docs.filter(col("doc_id") === 150), path)
    assert(Dedup.loadMinhashIndex(spark, path)
      .filter(col("doc_id") === victim).count() == 0)
    // …but re-ingesting the doc itself clears it: the re-added signature
    // loads, and is not double-counted with the (still physically
    // present) original row beyond the duplicate compaction removes
    Dedup.appendToMinhashIndex(spark, docs.filter(col("doc_id") === victim), path)
    assert(Dedup.loadMinhashIndex(spark, path)
      .filter(col("doc_id") === victim).count() >= 1)
    Dedup.compactMinhashIndex(spark, path)
    assert(Dedup.loadMinhashIndex(spark, path)
      .filter(col("doc_id") === victim).count() == 1)
    // embedding twin
    val epath = java.nio.file.Files.createTempDirectory("graft_emb_readd").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    Dedup.saveEmbeddingIndex(spark, emb.filter(col("vec_id") < 100), epath)
    Dedup.removeFromEmbeddingIndex(spark, epath, Seq(victim).toDF("vec_id"))
    assert(Dedup.loadEmbeddingIndex(spark, epath)._1
      .filter(col("vec_id") === victim).count() == 0)
    Dedup.appendToEmbeddingIndex(spark, emb.filter(col("vec_id") === victim), epath)
    assert(Dedup.loadEmbeddingIndex(spark, epath)._1
      .filter(col("vec_id") === victim).count() >= 1)
  }

  test("index compaction: 30 daily appends collapse to a bounded file count, content preserved") {
    val path = java.nio.file.Files.createTempDirectory("graft_mh_comp").toString + "/idx"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Dedup.saveMinhashIndex(spark, docs.filter(col("doc_id") % 40 === 39), path)
    // 30 nightly folds, each a small batch — every append leaves one file
    // per writer task, the growth pattern compaction exists to bound
    (0 until 30).foreach { day =>
      Dedup.appendToMinhashIndex(spark, docs.filter(col("doc_id") % 40 === day), path)
    }
    def files(): Long = new java.io.File(path).listFiles
      .count(f => f.isFile && f.getName.endsWith(".parquet")).toLong
    val grown = files()
    assert(grown >= 30, s"30 appends should leave >=30 files, saw $grown")
    val before = Dedup.loadMinhashIndex(spark, path)
      .select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val (fb, fa, rows) = Dedup.compactMinhashIndex(spark, path)
    assert(fb == grown && fa == files())
    assert(fa <= 4, s"compaction should collapse $grown files to a handful, left $fa")
    assert(rows == before.size)
    val after = Dedup.loadMinhashIndex(spark, path)
      .select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(after == before, "compaction must not change index content")
  }

  test("embedding index delete: tombstone hides the vector from candidates and verification") {
    val spark2 = spark
    import spark2.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_emb_del").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    Dedup.saveEmbeddingIndex(spark, emb.filter(col("vec_id") % 4 =!= 0), path)
    val cross = Dedup.embeddingLsh(spark, sf, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (v1, v2) => (v1 % 4 == 0) != (v2 % 4 == 0) }
    val victim = cross.map { case (v1, v2) => if (v1 % 4 == 0) v2 else v1 }.min
    Dedup.removeFromEmbeddingIndex(spark, path, Seq(victim).toDF("vec_id"))
    val (vecs, buckets) = Dedup.loadEmbeddingIndex(spark, path)
    assert(vecs.filter(col("vec_id") === victim).count() == 0)
    assert(buckets.filter(col("vec_id") === victim).count() == 0)
    val pairs = Dedup.embeddingIncremental(spark,
      emb.filter(col("vec_id") % 4 === 0), vecs, buckets).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross.exists(p => p._1 == victim || p._2 == victim),
      "victim must have been a real candidate before deletion")
    assert(!pairs.exists(p => p._1 == victim || p._2 == victim))
    // compaction: both tables rewritten minus the tombstone, file drops
    val ((_, _, nv), (_, _, nb)) = Dedup.compactEmbeddingIndex(spark, path)
    assert(spark.read.parquet(s"$path/vectors")
      .filter(col("vec_id") === victim).count() == 0)
    assert(spark.read.parquet(s"$path/buckets")
      .filter(col("vec_id") === victim).count() == 0)
    assert(!new java.io.File(s"$path/tombstones.parquet").exists())
    assert(nv > 0 && nb > 0)
  }

  test("bucket audit measures candidate economics; wider bits cut the rate; bits formula is monotone") {
    import graft.ops.Similarity
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    def audit(bits: Int) =
      Dedup.bucketAudit(Similarity.lshBuckets(e, 64, 4, bits)).collect()
        .map(r => r.getAs[Int]("tbl") -> (r.getAs[Long]("n_rows"),
          r.getAs[Long]("candidate_pairs"), r.getAs[Double]("candidate_rate")))
        .toMap
    val (narrow, wide) = (audit(4), audit(8))
    assert(narrow.keySet === Set(0, 1, 2, 3))
    narrow.keySet.foreach { t =>
      assert(narrow(t)._1 === n, "every vector appears once per table")
      assert(narrow(t)._3 > 0 && narrow(t)._3 <= 1.0)
      // the audit is Σ|b|(|b|−1)/2 over that table's buckets — the same
      // comparisons the candidate equi-join schedules; wider bits must
      // thin every table
      assert(wide(t)._2 < narrow(t)._2,
        s"table $t: 8-bit pairs ${wide(t)._2} !< 4-bit ${narrow(t)._2}")
    }
    // the remedy formula: flat at small N (the default floor), then one
    // bit per corpus doubling past targetBucket·2^DefaultBits
    assert(Dedup.recommendedBits(1000) === Similarity.DefaultBits)
    assert(Dedup.recommendedBits(1L << 20) === 13) // 1M/128 = 8192 = 2^13
    assert(Dedup.recommendedBits(1L << 21) === 14)
    // the gate form audits the persisted index (tombstone-aware load)
    val gate = Dedup.indexBucketAudit(spark, sf).collect()
    assert(gate.length === Similarity.DefaultTables)
    val idxN = e.filter(col("vec_id") % 4 =!= 0).count()
    gate.foreach(r => assert(r.getAs[Long]("n_rows") === idxN))
  }

  test("index inventory tracks the append → takedown → compact lifecycle on both families") {
    val spark2 = spark
    import spark2.implicits._
    case class Inv(live: Long, tomb: Long, files: Long, wm: Long, open: Long)
    def inv(df: org.apache.spark.sql.DataFrame): Inv = {
      val r = df.collect().head
      Inv(r.getAs[Long]("live_ids"), r.getAs[Long]("tombstoned"),
        r.getAs[Long]("data_files"), r.getAs[Long]("batch_watermark"),
        r.getAs[Long]("open_markers"))
    }
    // ---- minhash family
    val mp = java.nio.file.Files.createTempDirectory("graft_mh_inv").toString + "/idx"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Dedup.saveMinhashIndex(spark, docs.filter(col("doc_id") < 80), mp)
    val built = inv(Dedup.describeMinhashIndex(spark, mp))
    val n0 = Dedup.loadMinhashIndex(spark, mp).count()
    assert(built.live === n0 && built.tomb === 0 && built.wm === -1L
      && built.open === 0)
    // appends grow the file count (the compaction signal the inventory
    // surfaces) and the live count
    (0 until 5).foreach { d =>
      Dedup.appendToMinhashIndex(spark,
        docs.filter(col("doc_id") === 100 + d), mp)
    }
    val grown = inv(Dedup.describeMinhashIndex(spark, mp))
    assert(grown.live === built.live + 5)
    assert(grown.files > built.files, "appends must show up as file growth")
    // a takedown moves ids from live to tombstoned without touching files
    Dedup.removeFromMinhashIndex(spark, mp, Seq(100L, 101L).toDF("doc_id"))
    val taken = inv(Dedup.describeMinhashIndex(spark, mp))
    assert(taken.live === grown.live - 2 && taken.tomb === 2)
    // compaction folds tombstones physical and bounds files
    Dedup.compactMinhashIndex(spark, mp)
    val compacted = inv(Dedup.describeMinhashIndex(spark, mp))
    assert(compacted.live === taken.live && compacted.tomb === 0)
    assert(compacted.files < grown.files)
    // ---- embedding family (data_files spans vectors + buckets)
    val ep = java.nio.file.Files.createTempDirectory("graft_emb_inv").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    Dedup.saveEmbeddingIndex(spark, emb.filter(col("vec_id") < 80), ep)
    val eb = inv(Dedup.describeEmbeddingIndex(spark, ep))
    assert(eb.live === 80 && eb.tomb === 0)
    Dedup.appendToEmbeddingIndex(spark, emb.filter(col("vec_id") === 100), ep)
    Dedup.removeFromEmbeddingIndex(spark, ep, Seq(100L).toDF("vec_id"))
    val et = inv(Dedup.describeEmbeddingIndex(spark, ep))
    assert(et.live === 80 && et.tomb === 1)
    assert(et.files > eb.files)
    Dedup.compactEmbeddingIndex(spark, ep)
    val ec = inv(Dedup.describeEmbeddingIndex(spark, ep))
    assert(ec.live === 80 && ec.tomb === 0 && ec.files <= eb.files)
    // the gate form unions one row per family, deterministically ordered
    val gateInv = Dedup.dedupIndexReport(spark, sf).collect()
    assert(gateInv.map(_.getAs[String]("family")).toSeq
      === Seq("embedding", "minhash"))
    val docN = docs.filter(col("doc_id") % 4 =!= 0)
      .filter(size(split(trim(col("text")), "\\s+")) >= 2).count()
    assert(gateInv.find(_.getAs[String]("family") == "minhash").get
      .getAs[Long]("live_ids") === docN)
    assert(gateInv.find(_.getAs[String]("family") == "embedding").get
      .getAs[Long]("live_ids")
      === emb.filter(col("vec_id") % 4 =!= 0).count())
  }

  // ---------------------------------------------------- banding auto-tune

  test("banding auto-tune: escalation trace, S-curve closed form, recall arithmetic") {
    val rep = Dedup.tuneBands(spark, Tables(spark, sf).documents,
      tau = 0.7, targetRecall = 0.9).collect()
    assert(rep.nonEmpty)
    // ascending bands, evaluation order preserved
    val bands = rep.map(_.getAs[Int]("bands")).toSeq
    assert(bands == bands.sorted, s"trace must ascend: $bands")
    // every non-last row failed the target (or the ladder wouldn't have
    // escalated past it); the last row is the decision
    rep.dropRight(1).foreach { r =>
      assert(!r.getAs[Boolean]("target_met"))
      assert(r.getAs[Double]("measured_recall") < 0.9)
    }
    rep.foreach { r =>
      val b = r.getAs[Int]("bands")
      val rpb = r.getAs[Int]("rows_per_band")
      assert(b * rpb === 64, "geometry must exhaust the hash budget")
      // the analytic S-curve threshold (1/b)^(1/r)
      assert(math.abs(r.getAs[Double]("s_curve_tau")
        - math.pow(1.0 / b, 1.0 / rpb)) < 1e-12)
      // recall IS found/truth — the report's arithmetic, re-done by hand
      val truth = r.getAs[Long]("truth_pairs")
      val found = r.getAs[Long]("found_pairs")
      assert(found <= truth, "verified pairs are a subset of the truth")
      assert(math.abs(r.getAs[Double]("measured_recall")
        - found.toDouble / truth) < 1e-12)
      assert(r.getAs[Double]("target") === 0.9)
    }
  }

  test("banding auto-tune: a generous target stops the ladder at the cheapest geometry") {
    val rep = Dedup.tuneBands(spark, Tables(spark, sf).documents,
      tau = 0.7, targetRecall = 0.02).collect()
    // candidates past the winner never ran: the trace is exactly one row
    assert(rep.length === 1, s"expected one evaluated geometry, got ${rep.length}")
    assert(rep.head.getAs[Int]("bands") === 4)
    assert(rep.head.getAs[Boolean]("target_met"))
  }

  test("banding auto-tune: mid-similarity pairs escalate past coarse bands to the default geometry") {
    import spark.implicits._
    // 20 planted pairs at jaccard = 33/45 ≈ 0.733 — just above the 0.7
    // verify cut, where the S-curve separates the ladder hard: per-pair
    // collision ≈ 3% at 4 bands (r=16), ≈ 50% at 8 (r=8), ≈ 99.6% at 16
    // (r=4). Vocabulary is disjoint across pairs so no accidental truth.
    val docs = (0 until 20).flatMap { p =>
      val base = (0 until 40).map(w => s"p${p}_w$w")
      val twin = base.take(34) ++ (0 until 6).map(w => s"p${p}_x$w")
      Seq((p.toLong * 2, base.mkString(" ")), (p.toLong * 2 + 1, twin.mkString(" ")))
    }.toDF("doc_id", "text")
    val strict = Dedup.tuneBands(spark, docs, tau = 0.7, targetRecall = 0.9)
      .collect()
    assert(strict.head.getAs[Long]("truth_pairs") === 20L,
      "every planted pair sits above tau, nothing else does")
    val winner = strict.last
    assert(winner.getAs[Boolean]("target_met"))
    assert(winner.getAs[Int]("bands") === 16,
      "0.9 recall at tau 0.7 lands on the library's default 16x4 geometry")
    assert(strict.length === 3, "the 4- and 8-band rungs were evaluated and failed")
    // a lax target on the same corpus stops earlier — the dial moves the
    // decision, cheaper geometry for the caller who tolerates misses
    val lax = Dedup.tuneBands(spark, docs, tau = 0.7, targetRecall = 0.15)
      .collect()
    assert(lax.length < strict.length)
    assert(lax.last.getAs[Boolean]("target_met"))
  }

  test("embedding-geometry auto-tune: cheapest-first, Charikar closed form, recall arithmetic") {
    val rep = Dedup.tuneEmbeddingLsh(spark, Tables(spark, sf).embeddings,
      tau = 0.4, targetRecall = 0.05).collect()
    // the gate corpus's planted dups sit near cosine 1 — even the cheapest
    // geometry catches a few, so a generous target stops the ladder at
    // exactly one evaluated row: the candidate-economics-cheapest (2,6)
    assert(rep.length === 1)
    assert(rep.head.getAs[Int]("tables") === 2 && rep.head.getAs[Int]("bits") === 6)
    assert(rep.head.getAs[Boolean]("target_met"))
    // closed form + arithmetic on the evaluated row
    val pBit = 1.0 - math.acos(0.4) / math.Pi
    assert(math.abs(rep.head.getAs[Double]("collision_at_tau")
      - (1.0 - math.pow(1.0 - math.pow(pBit, 6), 2))) < 1e-12)
    val (tr, fo) = (rep.head.getAs[Long]("truth_pairs"),
      rep.head.getAs[Long]("found_pairs"))
    assert(fo <= tr)
    assert(math.abs(rep.head.getAs[Double]("measured_recall")
      - fo.toDouble / tr) < 1e-12)
  }

  test("embedding-geometry auto-tune: just-above-threshold pairs escalate as the collision curve predicts") {
    import spark.implicits._
    // 20 planted pairs at cosine EXACTLY 0.45 (each pair in its own
    // 2-dim subspace, so cross-pair cosine is exactly 0 and truth is
    // exactly the 20 planted pairs): collision at 0.45 is ~14% for
    // (2,6), ~54% for (4,4), ~62% for (6,3), ~99% for (8,2) — a strict
    // target must walk the whole ladder, a lax one stops early
    val c = 0.45f
    val sOrth = math.sqrt(1.0 - c * c).toFloat
    val vecs = (0 until 20).flatMap { p =>
      val u = Array.tabulate(64)(d => if (d == 3 * p) 1.0f else 0.0f)
      val v = Array.tabulate(64)(d =>
        if (d == 3 * p) c else if (d == 3 * p + 1) sOrth else 0.0f)
      Seq((p.toLong * 2, u), (p.toLong * 2 + 1, v))
    }.toDF("vec_id", "embedding")
    val strict = Dedup.tuneEmbeddingLsh(spark, vecs,
      tau = 0.4, targetRecall = 0.9).collect()
    assert(strict.head.getAs[Long]("truth_pairs") === 20L,
      "the subspace construction pins truth to exactly the planted pairs")
    // ascending candidate-economics cost, strictly
    val costs = strict.map(r =>
      r.getAs[Int]("tables").toDouble / (1L << r.getAs[Int]("bits"))).toSeq
    assert(costs == costs.sorted)
    strict.dropRight(1).foreach(r => assert(!r.getAs[Boolean]("target_met")))
    val winner = strict.last
    assert(winner.getAs[Boolean]("target_met"))
    assert((winner.getAs[Int]("tables"), winner.getAs[Int]("bits")) === ((8, 2)),
      "0.9 recall on just-above-threshold pairs needs the many-tables geometry")
    val lax = Dedup.tuneEmbeddingLsh(spark, vecs,
      tau = 0.4, targetRecall = 0.3).collect()
    assert(lax.length < strict.length)
    assert(lax.last.getAs[Boolean]("target_met"))
  }

  test("embedding index geometry is artifact-declared: appends bucket with the stored width, not a caller guess") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_emb_geom").toString + "/idx"
    Dedup.saveEmbeddingIndex(spark, emb.filter(col("vec_id") < 100), path,
      numTables = 3, bits = 7)
    assert(Dedup.embeddingIndexGeometry(spark, path) === ((3, 7)))
    val batch = emb.filter(col("vec_id") >= 100 && col("vec_id") < 140)
    Dedup.appendToEmbeddingIndex(spark, batch, path)
    // the appended rows' buckets are EXACTLY the stored geometry's —
    // no caller parameter existed to mistype
    def bset(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "tbl", "bucket").collect()
        .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString)).toSet
    val stored = bset(spark.read.parquet(s"$path/buckets")
      .filter(col("vec_id") >= 100))
    assert(stored === bset(graft.ops.Similarity.lshBuckets(batch, 64, 3, 7)))
    // a fresh append-only path (the streaming bootstrap shape) stamps the
    // defaults on first touch, making the artifact self-describing
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_emb_geom2").toString + "/idx"
    Dedup.appendToEmbeddingIndex(spark, batch, fresh)
    assert(Dedup.embeddingIndexGeometry(spark, fresh) ===
      ((graft.ops.Similarity.DefaultTables, graft.ops.Similarity.DefaultBits)))
  }

  test("embedding index regeometry: fires when the corpus outgrows the built width, folds tombstones, keeps protocol state") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_emb_regeom").toString + "/idx"
    // the 500-vector corpus at 1 bit: recommendedBits(~500) = 4 > 1 → outgrown
    Dedup.saveEmbeddingIndex(spark, emb, path, numTables = 2, bits = 1)
    Dedup.removeFromEmbeddingIndex(spark, path, Seq(5L).toDF("vec_id"))
    // streaming protocol state must SURVIVE the in-place regeometry (the
    // retrainIndex argument — the live stream continues its checkpoint)
    val mb = new org.apache.hadoop.fs.Path(s"${path}_batches/7")
    val fs = mb.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(mb.getParent); fs.create(mb, true).close()
    assert(Dedup.maybeRebuildEmbeddingIndex(spark, path),
      "an outgrown geometry must fire the rebucket")
    assert(Dedup.embeddingIndexGeometry(spark, path) === ((2, 4)))
    // buckets are exactly a fresh bucketing of the live (tombstone-folded)
    // vectors at the recommended width; the tombstoned id is physically gone
    val liveIds = spark.read.parquet(s"$path/vectors")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!liveIds.contains(5L) && liveIds.size === 499)
    assert(spark.read.parquet(s"$path/buckets")
      .filter(col("vec_id") === 5L).isEmpty)
    assert(graft.streaming.Streams.isBatchCommitted(spark, path, 7L),
      "regeometry must not clear the replay-protocol state")
    // a right-sized index declines and changes nothing
    assert(!Dedup.maybeRebuildEmbeddingIndex(spark, path))
    assert(Dedup.embeddingIndexGeometry(spark, path) === ((2, 4)))
  }

  test("regeometry crash window self-heals: stale stamp re-fires and repairs mixed-width appends") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_emb_crash").toString + "/idx"
    Dedup.saveEmbeddingIndex(spark, emb.filter(col("vec_id") < 400), path,
      numTables = 2, bits = 1)
    assert(Dedup.maybeRebuildEmbeddingIndex(spark, path))
    // simulate the crash BETWEEN the buckets rewrite and the geometry
    // stamp: buckets sit at the recommended width, the stamp still says
    // the old one. The stamp-last order is deliberate — this window must
    // RE-FIRE at the next maintenance pass (stamp-first would read as
    // right-sized and leave the table mixed forever).
    val gp = new org.apache.hadoop.fs.Path(s"$path/_geometry")
    val fs = gp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(gp, true); out.write("2 1".getBytes("UTF-8")); out.close()
    // an append in the window buckets at the STALE width — a mixed table
    Dedup.appendToEmbeddingIndex(spark,
      emb.filter(col("vec_id") >= 400), path)
    // next maintenance pass: rec(500) = 4 > stamped 1 → re-fires, and the
    // full rebucket of the live vectors REPAIRS the mixed-width rows
    assert(Dedup.maybeRebuildEmbeddingIndex(spark, path),
      "the stale stamp must re-fire the regeometry")
    assert(Dedup.embeddingIndexGeometry(spark, path) === ((2, 4)))
    def bset(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "tbl", "bucket").collect()
        .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString)).toSet
    val live = spark.read.parquet(s"$path/vectors")
    assert(live.count() === 500)
    assert(bset(spark.read.parquet(s"$path/buckets")) ===
      bset(graft.ops.Similarity.lshBuckets(live, 64, 2, 4)),
      "after the re-fire every bucket row is the recommended width")
  }

  test("index savers clear stale replay-protocol state (fresh checkpoint ids must not be fenced)") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_save_slate").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 50)
    val docs = Tables(spark, sf).documents.limit(50)
    Seq(s"$base/emb", s"$base/mh").foreach { p =>
      val m = new org.apache.hadoop.fs.Path(s"${p}_batches/0")
      val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(m.getParent); fs.create(m, true).close()
    }
    Dedup.saveEmbeddingIndex(spark, emb, s"$base/emb")
    Dedup.saveMinhashIndex(spark, docs, s"$base/mh")
    // a rebuild is a NEW generation: batch id 0 of the next checkpoint
    // must not read as already committed
    assert(!graft.streaming.Streams.isBatchCommitted(spark, s"$base/emb", 0L))
    assert(!graft.streaming.Streams.isBatchCommitted(spark, s"$base/mh", 0L))
  }

  test("tuner hash-cut sampler: the keep slice stays proportional at caps past the Long-overflow point") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("doc_id")
    // cap = 2^24 > the 2^23 overflow point of a naive cap * 2^40 Long
    // product; with n = 2·cap the cut must keep ~half the ring — the
    // wrapped-negative arithmetic this pins against kept ~n/2^40 ≈ none
    val kept = Dedup.hashCutSample(df, col("doc_id"),
      cap = 1L << 24, n = 1L << 25).count()
    assert(kept > 350 && kept < 650,
      s"a half-ring cut of 1000 rows must keep ~500, kept $kept")
    // and the identity path below the cap
    assert(Dedup.hashCutSample(df, col("doc_id"), cap = 2000L, n = 1000L)
      .count() === 1000L)
  }

  test("banding auto-tune: truth tier agrees with the exhaustive 64-band recount") {
    // at 64 bands x 1 row every >= tau pair collides with probability
    // 1 - (1-tau)^64 (~1 - 1e-33 at 0.7): the detector IS the exact tier,
    // so the tuner's truth count must match its output
    val rep = Dedup.tuneBands(spark, Tables(spark, sf).documents,
      tau = 0.7, targetRecall = 0.9).collect()
    val exhaustive = Dedup.minhashLsh(spark, sf, numHashes = 64, bands = 64)
      .count()
    assert(rep.head.getAs[Long]("truth_pairs") === exhaustive)
  }
}
