package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomCount, CosineSim, DotLong, HashedNgrams,
  HyperplaneBuckets, JaccardHashed, MinHashSig, SimHashChunks}

/** SQL surface for graft's custom Catalyst expressions.
  *
  * Two ways in:
  *  - config-time: `spark.sql.extensions=graft.GraftExtensions` (cluster
  *    deployments; works on every session of the application), or
  *  - runtime: `GraftExtensions.register(spark)` on a live session.
  *
  * After either, `SELECT cosine_sim(a, b)`, `minhash_sig(hs, 64, p)` and
  * `simhash_chunks(wh)` work from plain SQL, so pure-SQL users of the
  * library get the codegen'd hot paths too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, (info, builder)) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }
  private def longArg(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].longValue()
  }

  private[graft] val builders: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] =
    Map(
      "cosine_sim" -> (
        new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "cosine_sim(a, b) takes 2 arguments")
          CosineSim(args(0), args(1))
        }),
      "minhash_sig" -> (
        new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
        (args: Seq[Expression]) => {
          require(args.length == 3, "minhash_sig(hashes, numHashes, prime) takes 3 arguments")
          MinHashSig(args(0), intArg(args(1), "numHashes"), longArg(args(2), "prime"))
        }),
      "simhash_chunks" -> (
        new ExpressionInfo(classOf[SimHashChunks].getName, "simhash_chunks"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "simhash_chunks(hashes) takes 1 argument")
          SimHashChunks(args(0))
        }),
      "hashed_ngrams" -> (
        new ExpressionInfo(classOf[HashedNgrams].getName, "hashed_ngrams"),
        (args: Seq[Expression]) => {
          require(args.length == 4,
            "hashed_ngrams(tokens, n, prime, distinct) takes 4 arguments")
          require(args(3).foldable, "distinct must be a literal")
          HashedNgrams(args(0), intArg(args(1), "n"), longArg(args(2), "prime"),
            args(3).eval().asInstanceOf[Boolean])
        }),
      "string_ngrams" -> (
        new ExpressionInfo(classOf[graft.functions.StringNgrams].getName,
          "string_ngrams"),
        (args: Seq[Expression]) => {
          require(args.length == 3,
            "string_ngrams(tokens, n, distinct) takes 3 arguments")
          require(args(2).foldable, "distinct must be a literal")
          graft.functions.StringNgrams(args(0), intArg(args(1), "n"),
            args(2).eval().asInstanceOf[Boolean])
        }),
      "count_in" -> (
        new ExpressionInfo(classOf[graft.functions.CountIn].getName,
          "count_in"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            "count_in(tokens, words) takes 2 arguments")
          require(args(1).foldable, "words must be a literal array<string>")
          val words = args(1).eval() match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
            case other => throw new IllegalArgumentException(
              s"words must be array<string>, got $other")
          }
          graft.functions.CountIn(args(0), words)
        }),
      "adjacent_repeats" -> (
        new ExpressionInfo(classOf[graft.functions.AdjacentRepeats].getName,
          "adjacent_repeats"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "adjacent_repeats(tokens) takes 1 argument")
          graft.functions.AdjacentRepeats(args(0))
        }),
      "jaccard_hashed" -> (
        new ExpressionInfo(classOf[JaccardHashed].getName, "jaccard_hashed"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "jaccard_hashed(a, b) takes 2 arguments")
          JaccardHashed(args(0), args(1))
        }),
      "dot_long" -> (
        new ExpressionInfo(classOf[DotLong].getName, "dot_long"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "dot_long(a, b) takes 2 arguments")
          DotLong(args(0), args(1))
        }),
      "bloom_count" -> (
        new ExpressionInfo(classOf[BloomCount].getName, "bloom_count"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            "bloom_count(hashes, bloomBytes) takes 2 arguments")
          require(args(1).foldable, "bloomBytes must be a literal binary")
          BloomCount(args(0), args(1).eval() match {
            case b: Array[Byte] => b
            case other => throw new IllegalArgumentException(
              s"bloomBytes must be binary, got $other")
          })
        }),
      "hyperplane_buckets" -> (
        new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
        (args: Seq[Expression]) => {
          require(args.length == 5,
            "hyperplane_buckets(emb, planes, numTables, bits, dim) takes 5 arguments")
          require(args(1).foldable, "planes must be a literal array<double>")
          val planes = args(1).eval() match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toDoubleArray()
            case other => throw new IllegalArgumentException(
              s"planes must be array<double>, got $other")
          }
          HyperplaneBuckets(args(0), planes,
            intArg(args(2), "numTables"), intArg(args(3), "bits"),
            intArg(args(4), "dim"))
        }),
      "mat_vec" -> (
        new ExpressionInfo(classOf[graft.functions.MatVec].getName, "mat_vec"),
        (args: Seq[Expression]) => {
          require(args.length == 5,
            "mat_vec(emb, matrix, k, dim, divisor) takes 5 arguments")
          require(args(1).foldable, "matrix must be a literal array<double>")
          val matrix = args(1).eval() match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toDoubleArray()
            case other => throw new IllegalArgumentException(
              s"matrix must be array<double>, got $other")
          }
          require(args(4).foldable, "divisor must be a literal")
          graft.functions.MatVec(args(0), matrix,
            intArg(args(2), "k"), intArg(args(3), "dim"),
            args(4).eval() match {
              case d: Double => d
              case other => throw new IllegalArgumentException(
                s"divisor must be double, got $other")
            })
        }),
      "ewma_fold" -> (
        new ExpressionInfo(classOf[graft.functions.EwmaFold].getName, "ewma_fold"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "ewma_fold(values, alpha) takes 2 arguments")
          require(args(1).foldable, "alpha must be a literal double")
          graft.functions.EwmaFold(args(0), args(1).eval() match {
            case d: Double => d
            case other => throw new IllegalArgumentException(
              s"alpha must be double, got $other")
          })
        }),
      "bpe_encode" -> (
        new ExpressionInfo(classOf[graft.functions.BpeEncode].getName, "bpe_encode"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            "bpe_encode(word, merges) takes 2 arguments (merges: array<string> " +
              "of 'left right' pairs in rank order)")
          require(args(1).foldable, "merges must be a literal array<string>")
          val ranks = new java.util.HashMap[String, Integer]()
          args(1).eval() match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              var i = 0
              while (i < a.numElements()) {
                ranks.put(a.getUTF8String(i).toString, Integer.valueOf(i))
                i += 1
              }
            case other => throw new IllegalArgumentException(
              s"merges must be array<string>, got $other")
          }
          graft.functions.BpeEncode(args(0), ranks)
        }))

  /** Register graft's SQL functions on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, (info, builder)) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
