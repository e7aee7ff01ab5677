package graft

import org.apache.spark.sql.SparkSessionExtensions

class FunctionsSpec extends SparkSpec {

  test("runtime registration exposes the custom expressions to SQL") {
    GraftExtensions.register(spark)
    val cos = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-15)
    val sig = spark.sql(
      "SELECT minhash_sig(array(5L, 17L), 4, 4294967311L) AS s").head.getSeq[Long](0)
    assert(sig.length === 4)
    // hand-check permutation 0: a=1, b=0 → min(5, 17) = 5
    assert(sig.head === 5L)
    val chunks = spark.sql("SELECT simhash_chunks(array(0L)) AS c").head.getSeq[Long](0)
    // a single all-zero hash votes every bit negative → all chunks 0
    assert(chunks === Seq(0L, 0L, 0L, 0L))
    val dot = spark.sql(
      "SELECT dot_long(array(2L, 3L), array(5L, 7L)) AS d").head.getLong(0)
    assert(dot === 31L) // 2·5 + 3·7 — exact integer
    // one table × one bit over dim 2: plane (1, -1); (1, 0)·(1, -1) > 0 →
    // sign bit set → bucket 1
    val buckets = spark.sql(
      "SELECT hyperplane_buckets(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(1.0D, -1.0D), 1, 1, 2) AS b").head.getSeq[Int](0)
    assert(buckets === Seq(1))
    // bloom_count over a hex-literal sketch holding exactly {42}: the
    // member always hits (no false negatives), the distant value at the
    // designed fp rate (64 bits for 1 item → ~0)
    val bloomBytes = spark.range(1)
      .select(graft.functions.bloom_agg(
        org.apache.spark.sql.functions.lit(42L), 1L, 64L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val hex = bloomBytes.map("%02X".format(_)).mkString
    val bc = spark.sql(
      s"SELECT bloom_count(array(42L, 981273409L), X'$hex') AS c").head.getLong(0)
    assert(bc === 1L)
  }

  test("registered views give pure-SQL users the whole table surface") {
    Tables(spark, sf).registerViews()
    val n = spark.sql(
      "SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head.getLong(0)
    assert(n > 0)
  }

  test("sketch expressions execute inside WholeStageCodegen when fed a materialized array") {
    import org.apache.spark.sql.functions._
    // a projection containing a HOF is excluded from WSCG wholesale — the
    // sketch expression must sit in its own (pure) projection, fed across
    // an exchange, to codegen. This mirrors how Dedup stages its pipeline.
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), transform(split(col("text"), "\\s+"), w => xxhash64(w)).as("wh"))
      .repartition(2, col("doc_id"))
      .select(graft.functions.simhash_chunks(col("wh")).as("c"))
    df.collect() // finalize THIS query's adaptive plan (count() would plan
                 // a separate pruned query and never finalize this one)
    val plan = df.queryExecution.executedPlan.toString
    // the simhash projection's WSCG span: "*(n) Project [simhashchunks..."
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[simhashchunks.*"), plan.take(800))
  }

  test("config-time extensions class wires the same builders") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e) // must not throw; builders are injected
    assert(GraftExtensions.builders.keySet ===
      Set("cosine_sim", "minhash_sig", "simhash_chunks", "hashed_ngrams",
        "string_ngrams", "count_in", "adjacent_repeats", "jaccard_hashed",
        "dot_long", "hyperplane_buckets", "mat_vec", "bpe_encode",
        "bloom_count", "ewma_fold"))
  }

  test("bpe_encode: SQL form, codegen/interpreted parity, merge semantics") {
    GraftExtensions.register(spark)
    // merges in rank order: (l,o) → lo, (lo,w) → low
    val sub = spark.sql(
      "SELECT bpe_encode('lower', array('l o', 'lo w')) AS s").head.getSeq[String](0)
    assert(sub === Seq("low", "e", "r"))
    // no applicable merge → plain characters
    val chars = spark.sql(
      "SELECT bpe_encode('ab', array('x y')) AS s").head.getSeq[String](0)
    assert(chars === Seq("a", "b"))
    val factoryMode = "spark.sql.codegen.factoryMode"
    val prior = spark.conf.getOption(factoryMode)
    def run(): Seq[String] = spark.sql(
      "SELECT bpe_encode('newest', array('e s', 'es t', 'n e')) AS s")
      .head.getSeq[String](0)
    try {
      spark.conf.set(factoryMode, "CODEGEN_ONLY")
      val gen = run()
      spark.conf.set(factoryMode, "NO_CODEGEN")
      assert(gen === run())
      assert(gen === Seq("ne", "w", "est"))
    } finally prior match {
      case Some(v) => spark.conf.set(factoryMode, v)
      case None => spark.conf.unset(factoryMode)
    }
  }

  test("custom expressions: codegen and interpreted paths agree bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Array(0.3f, -1.2f, 4.7f), Array(2.2f, 0.0f, -3.3f)))
      .toDF("a", "b")
      .withColumn("hs", expr("array(12345678901L, 987654321L, 42L)"))
    def run(): (Double, Seq[Long], Seq[Long]) = {
      val r = df.select(
        graft.functions.cosine_sim(col("a"), col("b")).as("c"),
        graft.functions.minhash_sig(col("hs"), 8, 4294967311L).as("m"),
        graft.functions.simhash_chunks(col("hs")).as("s")).head
      (r.getDouble(0), r.getSeq[Long](1), r.getSeq[Long](2))
    }
    val factoryMode = "spark.sql.codegen.factoryMode"
    val prior = spark.conf.getOption(factoryMode)
    try {
      spark.conf.set(factoryMode, "CODEGEN_ONLY")
      val gen = run()
      spark.conf.set(factoryMode, "NO_CODEGEN")
      val interp = run()
      assert(gen === interp)
    } finally prior match {
      case Some(v) => spark.conf.set(factoryMode, v)
      case None => spark.conf.unset(factoryMode)
    }
  }

  test("bloom_any_of: per-row bloom column probed by constant hashes, codegen and interpreted, no false negatives") {
    import org.apache.spark.sql.functions._
    // per-GROUP blooms (one row per bloom — the manifest shape): group
    // doc ids by mod 4, bloom each group over xxhash64(doc_id), then ask
    // "might any of {3, 57, absent} be in this group" — a group holding a
    // probed id must ALWAYS say yes (no false negatives); others may
    // false-positive at the design rate but here are sized far below it
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), (col("doc_id") % 4).as("g")).limit(400)
    val m = docs.groupBy(col("g"))
      .agg(graft.functions.bloom_agg(xxhash64(col("doc_id")), 4096L, 1L << 16)
        .as("bloom"))
    val probes = Seq(3L, 57L)
    val hashes = spark.range(1)
      .select(probes.map(v => xxhash64(lit(v))): _*)
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    def run(): Map[Long, Boolean] = m
      .select(col("g"),
        graft.functions.bloom_any_of(col("bloom"), hashes).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val factoryMode = "spark.sql.codegen.factoryMode"
    val prior = spark.conf.getOption(factoryMode)
    try {
      spark.conf.set(factoryMode, "CODEGEN_ONLY")
      val gen = run()
      spark.conf.set(factoryMode, "NO_CODEGEN")
      val interp = run()
      assert(gen === interp, "codegen and interpreted paths must agree")
      // groups that actually HOLD a probed id must hit (3 % 4 = 3, 57 % 4 = 1)
      assert(gen(3L) && gen(1L), "no false negatives by the Bloom contract")
      // an absent-everywhere probe set may only false-positive, never throw
      val absent = spark.range(1)
        .select(xxhash64(lit(987654321L))).head().getLong(0)
      val misses = m.filter(
        !graft.functions.bloom_any_of(col("bloom"), Array(absent))).count()
      assert(misses >= 1L, "a far-absent probe should miss most groups")
    } finally prior match {
      case Some(v) => spark.conf.set(factoryMode, v)
      case None => spark.conf.unset(factoryMode)
    }
  }

  test("bloom_count equals the HOF might_contain formulation, codegen and interpreted") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val bloom = graft.ops.TextAnalysis.buildBenchmarkBloom(
      docs.filter(col("doc_id") % 7 === 0))
    val w = split(trim(col("text")), "\\s+")
    val hashed = graft.functions.hashed_ngrams(w, 5, distinct = true)
    def run(): Seq[(Long, Long, Long)] = docs
      .select(col("doc_id"),
        graft.functions.bloom_count(hashed, bloom).as("kc"),
        size(filter(hashed, h =>
          graft.functions.bloom_might_contain(lit(bloom), h)))
          .cast("long").as("hc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val factoryMode = "spark.sql.codegen.factoryMode"
    val prior = spark.conf.getOption(factoryMode)
    try {
      spark.conf.set(factoryMode, "CODEGEN_ONLY")
      val gen = run()
      spark.conf.set(factoryMode, "NO_CODEGEN")
      val interp = run()
      assert(gen === interp, "codegen and interpreted paths must agree")
      gen.foreach { case (id, kernel, hof) =>
        assert(kernel === hof, s"doc $id: kernel $kernel vs HOF $hof") }
      assert(gen.exists(_._2 > 0), "some doc must actually hit the sketch")
    } finally prior match {
      case Some(v) => spark.conf.set(factoryMode, v)
      case None => spark.conf.unset(factoryMode)
    }
  }

  test("hashed_ngrams reproduces the HOF shingle+hash chain bit-for-bit") {
    import org.apache.spark.sql.functions._
    val P = 4294967311L
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val w = split(trim(col("text")), "\\s+")
    // the exact formulation minhash used before the kernel existed
    val hofShingles = when(size(w) >= 2,
      array_distinct(zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => concat(a, lit(" "), b))))
      .otherwise(array().cast("array<string>"))
    val rows = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(hofShingles,
        sh => pmod(xxhash64(sh), lit(P))))).as("hof2"),
      array_sort(graft.functions.hashed_ngrams(w, 2, P, distinct = true)).as("ker2"),
      transform(w, x => xxhash64(x)).as("hof1"),
      graft.functions.hashed_ngrams(w, 1).as("ker1"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: shingle-hash sets differ")
      assert(r.getSeq[Long](3) === r.getSeq[Long](4),
        s"doc ${r.getLong(0)}: word hashes differ (order and duplicates included)")
    }
    // codegen vs interpreted
    val factoryMode = "spark.sql.codegen.factoryMode"
    val prior = spark.conf.getOption(factoryMode)
    def one(): Seq[Long] = docs.orderBy("doc_id")
      .select(array_sort(graft.functions.hashed_ngrams(w, 2, P, distinct = true)))
      .head.getSeq[Long](0)
    try {
      spark.conf.set(factoryMode, "CODEGEN_ONLY")
      val gen = one()
      spark.conf.set(factoryMode, "NO_CODEGEN")
      assert(gen === one())
    } finally prior match {
      case Some(v) => spark.conf.set(factoryMode, v)
      case None => spark.conf.unset(factoryMode)
    }
  }

  test("string_ngrams reproduces the HOF k-gram chain value-for-value") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val w = split(trim(col("text")), "\\s+")
    // the exact zip_with-over-shifted-slices formulation ngramsK used
    // before the kernel existed (k = 8 and k = 5 — the two gate shapes)
    def hofK(k: Int) = {
      val cnt = size(w) - (k - 1)
      val grams = (1 to k).map(i => slice(w, lit(i), cnt))
        .reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
      when(size(w) >= k, array_distinct(grams))
        .otherwise(array().cast("array<string>"))
    }
    val rows = docs.select(col("doc_id"),
      hofK(8).as("hof8"),
      graft.functions.string_ngrams(w, 8, distinct = true).as("ker8"),
      hofK(5).as("hof5"),
      graft.functions.string_ngrams(w, 5, distinct = true).as("ker5"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"doc ${r.getLong(0)}: 8-gram arrays differ (order included)")
      assert(r.getSeq[String](3) === r.getSeq[String](4),
        s"doc ${r.getLong(0)}: 5-gram arrays differ (order included)")
    }
    // codegen vs interpreted parity
    val factoryMode = "spark.sql.codegen.factoryMode"
    val prior = spark.conf.getOption(factoryMode)
    def one(): Seq[String] = docs.orderBy("doc_id")
      .select(graft.functions.string_ngrams(w, 8, distinct = true))
      .head.getSeq[String](0)
    try {
      spark.conf.set(factoryMode, "CODEGEN_ONLY")
      val gen = one()
      spark.conf.set(factoryMode, "NO_CODEGEN")
      assert(gen === one())
    } finally prior match {
      case Some(v) => spark.conf.set(factoryMode, v)
      case None => spark.conf.unset(factoryMode)
    }
  }

  test("count_in equals the filter+isInCollection HOF on real text") {
    import org.apache.spark.sql.functions._
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val w = split(trim(col("text")), "\\s+")
    val rows = docs.select(col("doc_id"),
      size(filter(w, x => x.isInCollection(stop))).cast("long").as("hof"),
      graft.functions.count_in(w, stop).as("ker"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"doc ${r.getLong(0)}: stopword counts differ"))
    // codegen vs interpreted parity
    val factoryMode = "spark.sql.codegen.factoryMode"
    val prior = spark.conf.getOption(factoryMode)
    def one(): Long = docs.orderBy("doc_id")
      .select(graft.functions.count_in(w, stop)).head.getLong(0)
    try {
      spark.conf.set(factoryMode, "CODEGEN_ONLY")
      val gen = one()
      spark.conf.set(factoryMode, "NO_CODEGEN")
      assert(gen === one())
    } finally prior match {
      case Some(v) => spark.conf.set(factoryMode, v)
      case None => spark.conf.unset(factoryMode)
    }
  }

  test("adjacent_repeats equals the slice+zip_with HOF chain on real text") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val w = split(trim(col("text")), "\\s+")
    val hof = size(filter(zip_with(
      slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
      (a, b) => a === b), x => x)).cast("long")
    val rows = docs.select(col("doc_id"), hof.as("hof"),
      graft.functions.adjacent_repeats(w).as("ker")).collect()
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"doc ${r.getLong(0)}: adjacent-repeat counts differ"))
    // synthetic edges: repeats, null elements (never count), len < 2
    GraftExtensions.register(spark)
    val edge = spark.sql(
      """SELECT adjacent_repeats(array('a','a','a','b','b',NULL,NULL,'c')) AS a,
        |       adjacent_repeats(array('x')) AS b,
        |       adjacent_repeats(CAST(array() AS array<string>)) AS c""".stripMargin)
    val e = edge.head()
    assert(e.getLong(0) === 3L) // aa, aa, bb; null-null does not count
    assert(e.getLong(1) === 0L)
    assert(e.getLong(2) === 0L)
    // codegen vs interpreted parity
    val factoryMode = "spark.sql.codegen.factoryMode"
    val prior = spark.conf.getOption(factoryMode)
    def one(): Long = docs.orderBy("doc_id")
      .select(graft.functions.adjacent_repeats(w)).head.getLong(0)
    try {
      spark.conf.set(factoryMode, "CODEGEN_ONLY")
      val gen = one()
      spark.conf.set(factoryMode, "NO_CODEGEN")
      assert(gen === one())
    } finally prior match {
      case Some(v) => spark.conf.set(factoryMode, v)
      case None => spark.conf.unset(factoryMode)
    }
  }

  test("jaccard_hashed equals the array_intersect formulation on real shingle sets") {
    import org.apache.spark.sql.functions._
    val P = 4294967311L
    val w = split(trim(col("text")), "\\s+")
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(60)
      .select(col("doc_id"), graft.functions.hashed_ngrams(w, 2, P, distinct = true).as("hs"))
    val pairs = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.hs").as("s1"), col("b.hs").as("s2"))
    val rows = pairs.select(
      graft.functions.jaccard_hashed(col("s1"), col("s2")).as("merge"),
      size(array_intersect(col("s1"), col("s2"))).cast("double").as("inter"),
      size(array_union(col("s1"), col("s2"))).cast("double").as("uni"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = if (r.getDouble(2) == 0.0) 0.0 else r.getDouble(1) / r.getDouble(2)
      assert(r.getDouble(0) === expect)
    }
    // sortedness precondition holds at the source: HashedNgrams(distinct)
    docs.select(col("hs")).collect().foreach { r =>
      val s0 = r.getSeq[Long](0)
      assert(s0 === s0.sorted && s0 === s0.distinct)
    }
    // codegen vs interpreted
    val factoryMode = "spark.sql.codegen.factoryMode"
    val prior = spark.conf.getOption(factoryMode)
    def one(): Double = pairs.limit(50)
      .select(graft.functions.jaccard_hashed(col("s1"), col("s2")))
      .collect().map(_.getDouble(0)).sum
    try {
      spark.conf.set(factoryMode, "CODEGEN_ONLY")
      val gen = one()
      spark.conf.set(factoryMode, "NO_CODEGEN")
      assert(gen === one())
    } finally prior match {
      case Some(v) => spark.conf.set(factoryMode, v)
      case None => spark.conf.unset(factoryMode)
    }
  }

  test("hyperplane_buckets matches an independent sign-bit recomputation") {
    import org.apache.spark.sql.functions._
    val (numTables, bits, dim) = (4, 4, 64)
    // the same splitmix64 hyperplane stream Similarity derives (pinned here
    // independently so a drift in either derivation fails)
    def splitmix(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def plane(t: Int, j: Int): Array[Double] = Array.tabulate(dim) { d =>
      val h = splitmix((t.toLong << 32) | (j.toLong << 16) | d.toLong)
      (h >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val planes = Array.tabulate(numTables * bits * dim) { i =>
      plane(i / (dim * bits), (i / dim) % bits)(i % dim)
    }
    val rows = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
      .select(col("vec_id"), col("embedding"),
        graft.functions.hyperplane_buckets(col("embedding"), planes,
          numTables, bits, dim).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val emb = r.getSeq[Float](1)
      val got = r.getSeq[Int](2)
      val expect = (0 until numTables).map { t =>
        (0 until bits).map { j =>
          val p = plane(t, j)
          var dot = 0.0
          var d = 0
          while (d < dim) { dot += emb(d).toDouble * p(d); d += 1 }
          if (dot > 0) 1 << j else 0
        }.sum
      }
      assert(got === expect, s"vec ${r.getLong(0)}")
    }
  }

  test("mat_vec equals the interpreted HOF fold bit-for-bit (the formulation it replaces)") {
    import org.apache.spark.sql.functions._
    val signs = graft.ops.Similarity.ProjSigns
    val k = signs.length
    val rows = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
      .select(col("vec_id"),
        graft.functions.mat_vec(col("embedding"), signs.flatten, k, 64,
          math.sqrt(k.toDouble)).as("kernel"),
        array(graft.ops.Similarity.projExprsHof: _*).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // === on doubles: BIT-exact agreement, not epsilon — the kernel's
      // claim is that it is the same in-order fold, merely compiled
      assert(r.getSeq[Double](1) === r.getSeq[Double](2),
        s"vec ${r.getLong(0)}")
    }
  }

  test("ewma_fold equals the interpreted aggregate() fold bit-for-bit (the formulation it replaces)") {
    import org.apache.spark.sql.functions._
    // the real per-user value sequences, in the gate entry's fold order
    val packed = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("event_id"), col("value"))))
        .as("xs"))
      .withColumn("vs", col("xs.value"))
    val hof = aggregate(
      col("vs"),
      expr("CAST(array() AS ARRAY<DOUBLE>)"),
      (acc, x) => {
        val prev = element_at(acc, -1)
        concat(acc, array(when(size(acc) === 0, x)
          .otherwise(lit(0.5) * x + lit(0.5) * prev)))
      })
    val rows = packed
      .select(col("user_id"),
        graft.functions.ewma_fold(col("vs"), 0.5).as("kernel"),
        hof.as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // === on doubles: BIT-exact, not epsilon — same FP op sequence,
      // merely compiled (and O(n) instead of the concat-copy O(n²))
      assert(r.getSeq[Double](1) === r.getSeq[Double](2),
        s"user ${r.getLong(0)}")
    }
    // SQL registration serves the same kernel
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT ewma_fold(array(1.0D, 3.0D, 2.0D), 0.5D) AS e").head.getSeq[Double](0)
    assert(viaSql === Seq(1.0, 0.5 * 3.0 + 0.5 * 1.0, 0.5 * 2.0 + 0.5 * 2.0))
  }

  test("cosine_sim agrees between SQL, Column API, and codegen/interpreted paths") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b")
    val viaColumn = df.select(graft.functions.cosine_sim(col("a"), col("b"))).head.getDouble(0)
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("fx")
    val viaSql = spark.sql("SELECT cosine_sim(a, b) FROM fx").head.getDouble(0)
    val expect = (3.0 + 4.0 + 3.0) / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(viaColumn === viaSql)
    assert(math.abs(viaColumn - expect) < 1e-15)
  }
}
