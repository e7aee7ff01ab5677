package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dense matrix × float-vector in one compiled pass:
  * out[j] = (Σ_i emb[i]·m[j][i]) / divisor, accumulated left-to-right in
  * double — the exact in-order fold the interpreted
  * `aggregate(zip_with(...))` formulation performs per output row, so
  * results are bit-identical to it (and to a DuckDB `list_reduce` oracle
  * folding in index order). One kernel call replaces k interpreted
  * per-element folds (k·dim boxed lambda evaluations per vector) — the
  * same expression-layer win [[HyperplaneBuckets]] measured ~1000× on the
  * LSH path, here applied to the JL projection (the hot stage of a
  * project-once-per-corpus-build job).
  *
  * `matrix` is the flattened [k][dim] tensor. Precondition: no null
  * elements in the embedding (driver data has none).
  */
case class MatVec(child: Expression, matrix: Array[Double],
    k: Int, dim: Int, divisor: Double) extends UnaryExpression {

  require(matrix.length == k * dim, s"matrix length ${matrix.length} != $k*$dim")
  require(divisor != 0.0, "divisor must be non-zero")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mat_vec expects array<float>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MatVec.compute(input.asInstanceOf[ArrayData], matrix, k, dim, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("matrix", matrix, "double[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |${ev.value} = graft.functions.MatVec.compute(
         |  $arr, $matRef, $k, $dim, $divisor);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)

  // content-based equality, for the same canonicalization reasons as
  // HyperplaneBuckets: CSE must unify equal tensors and must NOT unify
  // different ones
  override def equals(other: Any): Boolean = other match {
    case m: MatVec => m.child == child && m.k == k && m.dim == dim &&
      m.divisor == divisor && java.util.Arrays.equals(m.matrix, matrix)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child, Int.box(k),
    Int.box(dim), Double.box(divisor),
    Int.box(java.util.Arrays.hashCode(matrix)))
}

object MatVec {

  /** Shared kernel (eval + generated code). */
  def compute(emb: ArrayData, matrix: Array[Double],
      k: Int, dim: Int, divisor: Double): ArrayData = {
    val n = math.min(dim, emb.numElements())
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val base = j * dim
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += emb.getFloat(i).toDouble * matrix(base + i)
        i += 1
      }
      out(j) = acc / divisor
      j += 1
    }
    new GenericArrayData(out)
  }
}
