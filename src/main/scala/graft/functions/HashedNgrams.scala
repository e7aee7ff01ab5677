package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word n-grams in one compiled loop: `array<string>` tokens →
  * `array<long>` of xxhash64(n-gram) values (space-joined grams, seed 42 —
  * bit-identical to `xxhash64(concat_ws(" ", ...))`), optionally reduced
  * mod `prime` (pmod semantics) and optionally first-occurrence-distinct.
  *
  * Replaces the interpreted HOF chain the dedup scale tier was paying per
  * row (`zip_with(slice, slice, concat)` → `transform(xxhash64)` →
  * `array_distinct`): higher-order-function lambdas evaluate as per-element
  * expression-tree walks with boxing. Measured: minhash_lsh 51.0 → 42.5 s
  * end-to-end at the 100× dup-dense probe, where pair verification (not
  * shingling) dominates — the kernel's relative win grows where
  * duplication is sparse and shingling IS the dominant stage. Both eval
  * paths call one static kernel, so codegen/interpreted parity is
  * structural (FunctionsSpec pins it anyway, plus equality against the
  * HOF formulation).
  *
  * n = 1 with prime = 0, distinct = false is the word-hash shape simhash
  * feeds its bit-vote (duplicates must keep voting); n = 2 with prime = P,
  * distinct = true is minhash's shingle set. distinct = true also SORTS
  * the output (no consumer of a hashed set is order-sensitive, and sorted
  * sets let [[JaccardHashed]] verify candidates by merge instead of
  * per-pair hash-set builds).
  */
case class HashedNgrams(child: Expression, n: Int, prime: Long, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_ngrams expects array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashedNgrams.compute(input.asInstanceOf[ArrayData], n, prime, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |${ev.value} = graft.functions.HashedNgrams.compute(
         |  $arr, $n, ${prime}L, $distinct);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): HashedNgrams =
    copy(child = newChild)
}

object HashedNgrams {

  private val Space = UTF8String.fromString(" ")

  /** The shared kernel (called from both eval and generated code): one pass
    * over the token array, no per-element expression dispatch, no boxing on
    * the hash path. A null token (possible under `containsNull` input
    * types) contributes no gram. For n>1 this matches the null-propagating
    * HOF chain it replaced; for n=1 it diverges from the replaced
    * `transform(xxhash64)`, which maps a null element to the seed (42)
    * instead of dropping it — unreachable via `split()` (never emits
    * nulls), but a containsNull caller would see the drop semantics here.
    */
  def compute(tokens: ArrayData, n: Int, prime: Long, distinct: Boolean): ArrayData = {
    val len = tokens.numElements()
    val nGrams = len - n + 1
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nGrams)
    var m = 0
    val seen = if (distinct) new java.util.HashSet[java.lang.Long](nGrams * 2) else null
    val parts = if (n > 1) new Array[UTF8String](n) else null
    var i = 0
    while (i < nGrams) {
      var gram: UTF8String = null
      if (n == 1) {
        gram = tokens.getUTF8String(i)
      } else {
        var j = 0
        var ok = true
        while (j < n) {
          val t = tokens.getUTF8String(i + j)
          if (t == null) ok = false else parts(j) = t
          j += 1
        }
        if (ok) gram = UTF8String.concatWs(Space, parts: _*)
      }
      if (gram != null) {
        var h = XxHash64Function.hash(gram, StringType, 42L)
        if (prime > 0) h = ((h % prime) + prime) % prime
        if (seen == null || seen.add(h)) { out(m) = h; m += 1 }
      }
      i += 1
    }
    if (seen != null) java.util.Arrays.sort(out, 0, m)
    if (m == nGrams) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}
