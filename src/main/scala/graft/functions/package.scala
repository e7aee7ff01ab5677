package graft

import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Column-level entry points for graft's custom Catalyst expressions. */
package object functions {

  /** Cosine similarity of two `array<float>` columns — codegen'd native
    * expression (see [[CosineSim]]), not a UDF.
    */
  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** MinHash signature (array<bigint>) over pre-hashed shingles — codegen'd
    * tight loop (see [[MinHashSig]]).
    */
  def minhash_sig(hashedShingles: Column, numHashes: Int, prime: Long): Column =
    GraftSqlBridge.column(
      MinHashSig(GraftSqlBridge.expression(hashedShingles), numHashes, prime))

  /** 64-bit SimHash as 4×16-bit chunks over word hashes (see
    * [[SimHashChunks]]).
    */
  def simhash_chunks(wordHashes: Column): Column =
    GraftSqlBridge.column(SimHashChunks(GraftSqlBridge.expression(wordHashes)))

  /** Hashed word n-grams (array<string> tokens → array<long>) in one
    * compiled loop — see [[HashedNgrams]].
    */
  def hashed_ngrams(tokens: Column, n: Int, prime: Long = 0L,
      distinct: Boolean = false): Column =
    GraftSqlBridge.column(
      HashedNgrams(GraftSqlBridge.expression(tokens), n, prime, distinct))

  /** String word n-grams (array<string> tokens → array<string> of
    * space-joined grams) in one compiled loop — see [[StringNgrams]].
    */
  def string_ngrams(tokens: Column, n: Int, distinct: Boolean = false): Column =
    GraftSqlBridge.column(
      StringNgrams(GraftSqlBridge.expression(tokens), n, distinct))

  /** Count of array<string> elements in a literal word set, compiled —
    * see [[CountIn]].
    */
  def count_in(tokens: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(CountIn(GraftSqlBridge.expression(tokens), words))

  /** Count of adjacent equal pairs in an array<string>, compiled — see
    * [[AdjacentRepeats]].
    */
  def adjacent_repeats(tokens: Column): Column =
    GraftSqlBridge.column(AdjacentRepeats(GraftSqlBridge.expression(tokens)))

  /** Merge-based Jaccard of two sorted distinct array<long> sets — see
    * [[JaccardHashed]].
    */
  def jaccard_hashed(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaccardHashed(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Exact integer dot product of two array<long> vectors — see
    * [[DotLong]].
    */
  def dot_long(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotLong(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** All LSH hyperplane bucket signatures (array<int>, one per table) of an
    * embedding in one compiled pass — see [[HyperplaneBuckets]].
    */
  def hyperplane_buckets(emb: Column, planes: Array[Double],
      numTables: Int, bits: Int, dim: Int): Column =
    GraftSqlBridge.column(HyperplaneBuckets(
      GraftSqlBridge.expression(emb), planes, numTables, bits, dim))

  /** Dense k×dim matrix–vector product (array<double> of k in-order-fold
    * sums, each divided by `divisor`) in one compiled pass — see
    * [[MatVec]].
    */
  def mat_vec(emb: Column, matrix: Array[Double], k: Int, dim: Int,
      divisor: Double): Column =
    GraftSqlBridge.column(MatVec(
      GraftSqlBridge.expression(emb), matrix, k, dim, divisor))

  /** BPE-encode a word with a learned merge table (rank map keyed
    * "left right") — see [[BpeEncode]].
    */
  def bpe_encode(word: Column, ranks: java.util.HashMap[String, Integer]): Column =
    GraftSqlBridge.column(BpeEncode(GraftSqlBridge.expression(word), ranks))

  /** Aggregate pre-hashed longs into a serialized Bloom filter (binary) —
    * Spark's own `BloomFilterAggregate`, the expression the runtime
    * bloom-filter join rewrite plants; surfaced here so set-membership
    * sketches (e.g. benchmark-gram decontamination) can be built
    * explicitly. Pair with [[bloom_might_contain]] — both sides must feed
    * the SAME hash of the raw value (xxhash64 here).
    */
  def bloom_agg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    GraftSqlBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        GraftSqlBridge.expression(hashed),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  /** Probabilistic membership of a pre-hashed long in a serialized Bloom
    * filter: false positives at the sketch's design rate, NO false
    * negatives — Spark's `BloomFilterMightContain`. The filter side must
    * be a constant (a `lit(bytes)` from a collected [[bloom_agg]]).
    */
  def bloom_might_contain(bloom: Column, hashed: Column): Column =
    GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(hashed)))

  /** All prefix EWMAs (s_0 = x_0; s_i = α·x_i + (1−α)·s_{i−1}) of an
    * in-order `array<double>` in one compiled O(n) pass — see
    * [[EwmaFold]].
    */
  def ewma_fold(values: Column, alpha: Double): Column =
    GraftSqlBridge.column(EwmaFold(GraftSqlBridge.expression(values), alpha))

  /** Count of an `array<long>` hash set's members hitting a serialized
    * Bloom filter, one compiled loop — see [[BloomCount]]. The whole-row
    * decontamination decision when composed with [[hashed_ngrams]].
    */
  def bloom_count(hashed: Column, bloomBytes: Array[Byte]): Column =
    GraftSqlBridge.column(
      BloomCount(GraftSqlBridge.expression(hashed), bloomBytes))

  /** Does ANY constant probe hash hit the row's serialized Bloom column —
    * the transposed [[bloom_might_contain]] (per-ROW bloom, constant
    * values) the point-lookup manifest probe needs; see
    * [[BloomMightContainAny]].
    */
  def bloom_any_of(bloom: Column, hashes: Array[Long]): Column =
    GraftSqlBridge.column(
      BloomMightContainAny(GraftSqlBridge.expression(bloom),
        hashes.toIndexedSeq))
}
