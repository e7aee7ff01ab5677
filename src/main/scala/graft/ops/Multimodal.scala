package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  /** Perceptual near-dup over the extracted features — the image-dedup
    * shape of a multimodal pipeline: a 16-bit threshold signature (one bit
    * per feature bin: above/below the uniform-histogram expectation 1/16)
    * buckets the corpus; only same-signature pairs are verified with the
    * exact L1 distance ≤ [[tau]]. Work is Σ|bucket|², never N²; the
    * signature and the L1 sum are plain scalar-column arithmetic
    * (codegen'd, no HOFs), and the self-join pre-partitions on the
    * signature so both sides share one exchange. Rows-only (features come
    * from the stubbed decoder); MultimodalSpec pins the output against a
    * brute-force recomputation.
    */
  def nearDup(s: SparkSession, dir: String, tau: Double = 0.05): DataFrame = {
    val sigExpr = (0 until FeatureDims)
      .map(i => when(col(s"f$i") > 1.0 / FeatureDims, 1 << i).otherwise(0))
      .reduce(_ + _)
    val sigs = features(s, dir)
      .select(Seq(col("doc_id"), sigExpr.as("sig")) ++
        (0 until FeatureDims).map(i => col(s"f$i")): _*)
      .repartition(s.sparkContext.defaultParallelism, col("sig"))
    val l1 = (0 until FeatureDims)
      .map(i => abs(col(s"a.f$i") - col(s"b.f$i")))
      .reduce(_ + _)
    sigs.as("a").join(sigs.as("b"),
        col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"), l1.as("l1_dist"))
      .filter(col("l1_dist") <= tau)
      .orderBy(col("d1"), col("d2"))
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
