package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of adjacent equal element pairs in an array<string>, one compiled
  * O(n) pass — value-identical to the
  * `size(filter(zip_with(slice(w, 1, n−1), slice(w, 2, n−1), (a, b) =>
  * a === b), x => x))` HOF chain it replaces: EqualTo yields null when
  * either element is null and `filter` drops non-true, so null elements
  * never count; arrays of length < 2 count 0. The HOF form materializes
  * two slice arrays plus a zipped boolean array per row and walks an
  * interpreted expression tree per element — measured 64 task-CPU-seconds
  * per text_repetition pass at sf0.1, ~95% of the operator's compute.
  */
case class AdjacentRepeats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"adjacent_repeats expects array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    AdjacentRepeats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.AdjacentRepeats.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): AdjacentRepeats =
    copy(child = newChild)
}

object AdjacentRepeats {
  def compute(tokens: ArrayData): Long = {
    val len = tokens.numElements()
    if (len < 2) return 0L
    var n = 0L
    var prev = tokens.getUTF8String(0)
    var i = 1
    while (i < len) {
      val cur = tokens.getUTF8String(i)
      if (cur != null && prev != null && cur.equals(prev)) n += 1L
      prev = cur
      i += 1
    }
    n
  }
}
