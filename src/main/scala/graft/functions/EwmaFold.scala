package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** All prefix EWMAs of an in-order `array<double>` in one compiled pass:
  * out(0) = x(0); out(i) = α·x(i) + (1−α)·out(i−1) — the order-SENSITIVE
  * recursive window no plain frame can express. This replaces the
  * interpreted `aggregate(..., concat(acc, array(...)))` fold, whose
  * accumulator-concat copies O(n²) array cells per group (the one hot-path
  * HOF left after the MatVec/HyperplaneBuckets sweeps); the kernel is O(n)
  * and stays inside whole-stage codegen.
  *
  * FP sequence per element is exactly the interpreted form's with α an
  * exact binary fraction: two multiplies then one add, left-to-right —
  * `α·x + (1−α)·prev` where `1−α` folds to a constant — so results are
  * bit-identical to the aggregate() formulation (FunctionsSpec pins it)
  * and to a DuckDB oracle replaying the same sequence.
  *
  * Precondition: no null elements (the producers here build the array from
  * a non-null value column).
  */
case class EwmaFold(child: Expression, alpha: Double) extends UnaryExpression {

  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ewma_fold expects array<double>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    EwmaFold.compute(input.asInstanceOf[ArrayData], alpha)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |${ev.value} = graft.functions.EwmaFold.compute($arr, $alpha);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): EwmaFold =
    copy(child = newChild)
}

object EwmaFold {

  /** Shared kernel (eval + generated code). */
  def compute(xs: ArrayData, alpha: Double): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Double](n)
    val beta = 1.0 - alpha
    var prev = 0.0
    var i = 0
    while (i < n) {
      val x = xs.getDouble(i)
      val e = if (i == 0) x else alpha * x + beta * prev
      out(i) = e
      prev = e
      i += 1
    }
    new GenericArrayData(out)
  }
}
