package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams as STRINGS in one compiled loop: `array<string>` tokens →
  * `array<string>` of space-joined n-grams, optionally first-occurrence
  * distinct — the exact values of the interpreted HOF chain it replaces
  * (`(1 to k).map(slice).reduce(zip_with(concat(" ")))` →
  * `array_distinct`), including `array_distinct`'s keep-first order.
  *
  * [[HashedNgrams]]'s string-typed sibling, for the operators whose gate
  * output is ORACLE-EXACT over gram counts (span dedup, benchmark
  * decontamination): hashing the grams would trade a hash-collision error
  * into an exact count, so the grams must stay strings — but nothing says
  * they must be built by per-element lambda walks. The r13 profile put the
  * HOF chain at ~44 s CPU per corpus pass (k = 8, sf0.1); the compiled
  * loop is one `UTF8String.concatWs` per gram position. Both eval paths
  * call one static kernel, so codegen/interpreted parity is structural;
  * FunctionsSpec pins equality against the HOF formulation.
  */
case class StringNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"string_ngrams expects array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    StringNgrams.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |${ev.value} = graft.functions.StringNgrams.compute(
         |  $arr, $n, $distinct);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): StringNgrams =
    copy(child = newChild)
}

object StringNgrams {

  private val Space = UTF8String.fromString(" ")

  /** Shared kernel (eval + generated code). A null token contributes no
    * gram (unreachable via `split()`, which never emits nulls — same note
    * as [[HashedNgrams.compute]]); `distinct` keeps the FIRST occurrence
    * of each gram, matching `array_distinct`.
    */
  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = tokens.numElements()
    val nGrams = len - n + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nGrams)
    var m = 0
    val seen = if (distinct) new java.util.HashSet[UTF8String](nGrams * 2) else null
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
      if (gram != null && (seen == null || seen.add(gram))) {
        out(m) = gram; m += 1
      }
      i += 1
    }
    if (m == nGrams) new GenericArrayData(out)
    else new GenericArrayData(
      java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], m)
        .asInstanceOf[Array[Any]])
  }
}
