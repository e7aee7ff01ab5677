package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (SURVEY §2.G): treat media as opaque `binary`
  * columns + typed metadata, with partition-parallel feature extraction.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic fake ([[fakeDecode]]); everything around it
  * — binary column handling, magic-byte sniffing, the mapPartitions batch
  * shape, the feature schema — is the real 100 TB plumbing: this is the one
  * place graft drops to per-partition imperative code, because a decoder is
  * genuinely imperative. Rows flow partition-at-a-time (no collect, no
  * per-row JVM↔native churn at scale — a real decoder would batch here).
  *
  * The driver tables carry no binary column; [[withBinary]] derives one
  * deterministically from `documents.text` (UTF-8 bytes) so the pipeline is
  * test-driven end-to-end.
  */
object Multimodal {

  /** documents + a derived binary payload column (UTF-8 bytes of text). */
  private[ops] def withBinary(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  // ------------------------------------------------------------ metadata
  /** Typed metadata extraction over a binary column: byte length, leading
    * "magic" bytes (hex), and a sniffed type tag. Pure codegen expressions —
    * a metadata pass over 100 TB of media never leaves the scan stage.
    */
  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    // magic bytes from the first 4 *characters* re-encoded, because the
    // DuckDB oracle can't substring a BLOB; identical for any input since
    // both engines take the same chars then the same UTF-8 bytes.
    val magic = hex(encode(substring(col("text"), 1, 4), "UTF-8"))
    val magic3 = hex(encode(substring(col("text"), 1, 3), "UTF-8"))
    Tables(s, dir).documents
      .select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast(LongType).as("byte_len"),
        magic.as("magic_hex"),
        when(magic === "89504E47", "png")
          .when(magic3 === "FFD8FF", "jpeg")
          .when(magic === "52494646", "riff")
          .otherwise("unknown").as("sniffed_type"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------ features
  /** STUB DECODER — deterministic fake standing in for an image/audio
    * codec (none ship in this container). Emits a 16-bin byte histogram,
    * normalized; a real deployment swaps this single function for e.g. a
    * JNI decoder without touching the surrounding plan.
    */
  private[graft] def fakeDecode(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1.0; i += 1 }
    val n = math.max(1, payload.length).toDouble
    hist.map(_ / n)
  }

  private[graft] val FeatureDims = 16

  // features land as f0..f15 scalar doubles, not one array<double> — the
  // driver's gate hashes cells through pandas, which can't hash arrays, and
  // a fixed-width feature vector is exactly a fixed set of columns anyway
  private val featureSchema = StructType(
    StructField("doc_id", LongType, nullable = false) +:
    StructField("byte_len", LongType, nullable = false) +:
    (0 until FeatureDims).map(i => StructField(s"f$i", DoubleType, nullable = false)))

  /** Unordered feature frame — shared by [[featureExtract]] (adds the
    * driver-determinism sort) and [[nearDup]] (adds the signature join).
    */
  private def features(s: SparkSession, dir: String): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    withBinary(s, dir)
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val feats = fakeDecode(payload)
          Row.fromSeq(r.getAs[Long]("doc_id") +: payload.length.toLong +: feats.toSeq)
        }
      }(enc)
  }

  /** Partition-parallel feature extraction: binary → fixed-width feature
    * vector via mapPartitions (the imperative seam). Rows-only for the
    * driver; MultimodalSpec pins the histogram math.
    */
  def featureExtract(s: SparkSession, dir: String): DataFrame =
    features(s, dir).orderBy(col("doc_id"))

  // ------------------------------------------------------------ near-dup
  /** Deterministic Cauchy projection vector + offset for p-stable L1 LSH
    * (Datar et al.): a_d = tan(π(u-½)) with u from splitmix64 of a fixed
    * per-(table, k, dim) seed, so every run — and the spec's brute-force
    * mirror — sees identical cells. Returns (a, b01) with b01 ∈ [0, 1);
    * callers scale b01 by the cell width r.
    */
  private[graft] def cauchyProj(table: Int, k: Int, dim: Int): (Array[Double], Double) = {
    def u01(seed: Long): Double = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble
    }
    val a = Array.tabulate(dim) { d =>
      math.tan(math.Pi * (u01((table.toLong << 32) | (k.toLong << 16) | d.toLong) - 0.5))
    }
    (a, u01((table.toLong << 32) | (k.toLong << 16) | 0xFFFFL))
  }

  /** Concatenated projections per table — the K of (T, K, r) p-stable
    * geometry. 2 keeps random-pair collisions ≈ 6% on this corpus while a
    * single projection admits 35% (measured; see the tuning note below).
    */
  private[graft] val NearDupK = 2

  /** Perceptual near-dup over the extracted features — the image-dedup
    * shape of a multimodal pipeline, as p-stable (Cauchy) L1 LSH: each of
    * [[numTables]] tables hashes a feature vector to a cell via
    * [[NearDupK]] concatenated `floor((a·f + b)/r)` projections; pairs
    * sharing a cell in ≥1 table are candidates, and only candidates pay
    * the exact L1 ≤ [[tau]] verification. A fixed threshold signature was
    * measured useless here (every doc of this corpus landed in ONE bucket
    * — an all-pairs join in disguise); the Cauchy geometry at (T=8, K=2,
    * r=0.01) gives 95% recall with 6% candidate rate and max bucket 43 of
    * 500 at sf0.01. Work is Σ|bucket|² per table, never N²; projections
    * and the L1 sum are scalar-column arithmetic (codegen'd, no HOFs);
    * candidate dedup is id-only. Rows-only (features come from the stubbed
    * decoder); MultimodalSpec pins precision (exact) and recall vs the
    * brute-force truth.
    */
  def nearDup(s: SparkSession, dir: String, tau: Double = 0.005,
      numTables: Int = 8, r: Double = 0.01): DataFrame = {
    val (f, b) = nearDupBuckets(s, dir, numTables, r)
    val cand = b.as("a").join(b.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.c1") === col("b.c1")
          && col("a.c2") === col("b.c2") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val l1 = (0 until FeatureDims)
      .map(i => abs(col(s"a.f$i") - col(s"b.f$i")))
      .reduce(_ + _)
    cand
      .join(f.as("a"), col("d1") === col("a.doc_id"))
      .join(f.as("b"), col("d2") === col("b.doc_id"))
      .select(col("d1"), col("d2"), l1.as("l1_dist"))
      .filter(col("l1_dist") <= tau)
      .orderBy(col("d1"), col("d2"))
  }

  /** The (features, per-table bucket assignment) frames [[nearDup]] joins —
    * factored out so the candidate-economics probe shares the exact
    * geometry it is auditing.
    */
  private def nearDupBuckets(s: SparkSession, dir: String,
      numTables: Int, r: Double): (DataFrame, DataFrame) = {
    val f = features(s, dir)
      .select(col("doc_id") +: (0 until FeatureDims).map(i => col(s"f$i")): _*)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    def cell(t: Int, k: Int): Column = {
      val (a, b01) = cauchyProj(t, k, FeatureDims)
      val dot = (0 until FeatureDims).map(i => lit(a(i)) * col(s"f$i")).reduce(_ + _)
      floor((dot + lit(b01 * r)) / lit(r)).cast(LongType)
    }
    val tables = array((0 until numTables).map { t =>
      struct(lit(t).as("tbl"), cell(t, 0).as("c1"), cell(t, 1).as("c2"))
    }: _*)
    val b = f.select(col("doc_id"), explode(tables).as("tc"))
      .select(col("doc_id"), col("tc.tbl").as("tbl"),
        col("tc.c1").as("c1"), col("tc.c2").as("c2"))
    (f, b)
  }

  /** Candidate economics of [[nearDup]] WITHOUT generating a single pair:
    * the per-table bucket histogram gives Σ|b|·(|b|−1)/2 — the exact number
    * of comparisons the candidate self-join performs (pre-distinct,
    * pre-verify) — plus the max bucket size, for one aggregation over N·T
    * bucket-assignment rows. This is the quantity that must stay ~linear in
    * N for the Σ|bucket|² contract, and the probe-able form at any scale:
    * on a dup-dense corpus the TRUE pair count grows ∝ N², so timing pair
    * materialization past 20× measures output size, not the operator.
    *
    * @return (nDocs, candidateComparisons, maxBucket, candidateRate) where
    *         candidateRate = comparisons / (N·(N−1)/2 · numTables) — the
    *         fraction of all-pairs work actually paid, per table.
    */
  def nearDupCandidateStats(s: SparkSession, dir: String,
      numTables: Int = 8, r: Double = 0.01): (Long, Long, Long, Double) = {
    val (f, b) = nearDupBuckets(s, dir, numTables, r)
    // coalesce: an empty/degenerate corpus aggregates zero buckets, where
    // sum()/max() are null and a bare getLong would NPE the probe
    val row = b.groupBy(col("tbl"), col("c1"), col("c2"))
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") * (col("n") - lit(1L))), lit(0L)).as("twice_cand"),
        coalesce(max(col("n")), lit(0L)).as("max_bucket"))
      .head()
    val nDocs = f.count()
    val cand = row.getLong(0) / 2
    val allPairs = nDocs * (nDocs - 1) / 2
    val rate = if (allPairs == 0) 0.0
      else cand.toDouble / (allPairs.toDouble * numTables)
    (nDocs, cand, row.getLong(1), rate)
  }

  // ------------------------------------------------------------ frames
  /** Frame sampling over a binary payload: chunk the bytes into fixed-size
    * "frames" and keep every `stride`-th — the video-keyframe access
    * pattern with the codec stubbed to byte-chunking. The sampling is pure
    * array math on the binary column (codegen'd substring/sequence), so at
    * 100 TB the dropped frames are never materialized downstream.
    */
  def frameSample(s: SparkSession, dir: String, frameBytes: Int = 256,
      stride: Int = 4): DataFrame = {
    val payload = col("payload")
    val nFrames = ceil(octet_length(payload).cast(LongType) / lit(frameBytes.toDouble))
      .cast(LongType)
    withBinary(s, dir)
      .select(col("doc_id"), nFrames.as("n_frames"),
        transform(
          sequence(lit(0L), greatest(nFrames - 1, lit(0L)), lit(stride.toLong)),
          i => substring(payload, (i * frameBytes + 1).cast("int"), lit(frameBytes)))
          .as("frames"))
      .select(col("doc_id"), col("n_frames"),
        size(col("frames")).cast(LongType).as("n_sampled"),
        hex(element_at(col("frames"), 1)).as("first_frame_hex"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------ resize
  /** Resize a binary payload to exactly `targetBytes`: truncate long
    * payloads, zero-pad short ones (the fixed-shape batching step before a
    * tensor-consuming stage — every row leaves with an identical byte
    * width). Pure codegen'd byte ops.
    */
  def resize(s: SparkSession, dir: String, targetBytes: Int = 128): DataFrame = {
    val zeros = lit(Array.fill[Byte](targetBytes)(0))
    withBinary(s, dir)
      .select(col("doc_id"),
        octet_length(col("payload")).cast(LongType).as("orig_len"),
        substring(concat(col("payload"), zeros), 1, targetBytes).as("resized"))
      .select(col("doc_id"), col("orig_len"),
        octet_length(col("resized")).cast(LongType).as("new_len"),
        hex(substring(col("resized"), targetBytes - 3, 4)).as("tail_hex"))
      .orderBy(col("doc_id"))
  }

  // =================================================================
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta"     -> (binaryMeta _),
    "mm_feature_extract" -> (featureExtract _),
    "mm_frame_sample"    -> ((s: SparkSession, dir: String) => frameSample(s, dir)),
    "mm_resize"          -> ((s: SparkSession, dir: String) => resize(s, dir)),
    "mm_near_dup"        -> ((s: SparkSession, dir: String) => nearDup(s, dir)))

  /** mm_feature_extract is rows-only (mapPartitions output; spec-pinned). */
  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  hex(encode(substring(text, 1, 4))) AS magic_hex,
        |  CASE WHEN hex(encode(substring(text, 1, 4))) = '89504E47' THEN 'png'
        |       WHEN hex(encode(substring(text, 1, 3))) = 'FFD8FF' THEN 'jpeg'
        |       WHEN hex(encode(substring(text, 1, 4))) = '52494646' THEN 'riff'
        |       ELSE 'unknown' END AS sniffed_type
        |FROM documents ORDER BY doc_id""".stripMargin)
}
