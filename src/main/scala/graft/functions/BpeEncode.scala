package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encode one word with a learned merge table (Sennrich 2016):
  * start from the character sequence, repeatedly merge the adjacent pair
  * with the LOWEST merge rank until no adjacent pair is mergeable, return
  * the surviving subword strings. Deterministic: rank order is total (it
  * is the training order), and equal-rank occurrences merge left-to-right
  * within one pass.
  *
  * The merge table rides into the expression as a reference object (a
  * rank map keyed "left right"), the [[MatVec]] discipline for model
  * tensors — broadcast once per task via the serialized plan, no
  * per-row join. Encoding is per WORD, so the intended plan encodes each
  * DISTINCT word once and joins counts back (Zipf: distinct words ≪ token
  * occurrences); the kernel itself is cheap enough for per-token use too.
  */
case class BpeEncode(child: Expression, ranks: java.util.HashMap[String, Integer])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, word =>
      s"${ev.value} = graft.functions.BpeEncode.compute($word, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  // content-based equality so CSE unifies equal merge tables and never
  // unifies different ones (same reasoning as MatVec/HyperplaneBuckets)
  override def equals(other: Any): Boolean = other match {
    case b: BpeEncode => b.child == child && b.ranks == ranks
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child, ranks)
}

object BpeEncode {

  /** Shared kernel (eval + generated code). */
  def compute(word: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = word.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    // start as code-point-wise characters
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(s.substring(i, i + n))
      i += n
    }
    // repeatedly apply the lowest-rank pair present; within one pass, merge
    // its occurrences left-to-right (the subword-nmt application order)
    var done = syms.size() <= 1
    while (!done) {
      var best = Int.MaxValue
      var bestKey: String = null
      var j = 0
      while (j < syms.size() - 1) {
        val key = syms.get(j) + " " + syms.get(j + 1)
        val r = ranks.get(key)
        if (r != null && r.intValue() < best) { best = r.intValue(); bestKey = key }
        j += 1
      }
      if (bestKey == null) done = true
      else {
        val next = new java.util.ArrayList[String](syms.size())
        var k = 0
        while (k < syms.size()) {
          if (k < syms.size() - 1 &&
              (syms.get(k) + " " + syms.get(k + 1)) == bestKey) {
            next.add(syms.get(k) + syms.get(k + 1))
            k += 2
          } else {
            next.add(syms.get(k))
            k += 1
          }
        }
        syms = next
        done = syms.size() <= 1
      }
    }
    val out = new Array[Any](syms.size())
    var m = 0
    while (m < syms.size()) {
      out(m) = UTF8String.fromString(syms.get(m))
      m += 1
    }
    new GenericArrayData(out)
  }
}
