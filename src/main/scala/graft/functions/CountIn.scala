package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array<string> elements contained in a literal word set, in one
  * compiled loop — value-identical to the
  * `size(filter(tokens, w => w.isInCollection(set)))` HOF chain it
  * replaces (null elements match nothing, exactly like `isInCollection`'s
  * null propagation under `filter`). The stopword-ratio features
  * (quality gate, language id — which evaluates FOUR lists per row —
  * corpus curation) all reduce to this shape, and the HOF form walks an
  * expression tree per token.
  */
case class CountIn(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_in expects array<string>, got ${t.simpleString}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    CountIn.compute(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("countInSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.CountIn.compute($arr, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountIn =
    copy(child = newChild)
}

object CountIn {
  def compute(tokens: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val len = tokens.numElements()
    var n = 0L
    var i = 0
    while (i < len) {
      val t = tokens.getUTF8String(i)
      if (t != null && set.contains(t)) n += 1L
      i += 1
    }
    n
  }
}
