package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard similarity of two SORTED distinct `array<long>` sets (the shape
  * [[HashedNgrams]] emits with distinct = true) by linear merge:
  * |∩| / (n1 + n2 − |∩|) with zero per-pair allocation.
  *
  * This is the candidate-verification kernel of the minhash tier. The
  * `array_intersect` formulation it replaces builds a hash set PER
  * CANDIDATE PAIR and materializes the intersection array just to take its
  * size — at the 100× dup-dense probe that is 27M pairs × ~150-element
  * sets, and verification dominates the operator's wall. Sortedness is a
  * precondition, not checked per row (a check would cost what the merge
  * saves); DedupSpec verifies end-to-end equality against the
  * array_intersect formulation on real documents.
  *
  * Returns 0.0 when both sides are empty (no evidence of similarity — and
  * the minhash pipeline filters empty-shingle docs upstream anyway).
  */
case class JaccardHashed(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_hashed expects two array<bigint>, got ${l.simpleString} / ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardHashed.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardHashed.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardHashed =
    copy(left = newLeft, right = newRight)
}

object JaccardHashed {

  /** Shared merge kernel (eval + generated code): both inputs sorted and
    * distinct.
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val (n1, n2) = (a.numElements(), b.numElements())
    if (n1 == 0 && n2 == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < n1 && j < n2) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (n1 + n2 - inter).toDouble
  }
}
