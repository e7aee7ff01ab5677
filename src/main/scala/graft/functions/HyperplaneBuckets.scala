package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All random-hyperplane LSH bucket signatures of one embedding in a single
  * compiled pass: table t's bucket is the `bits` sign bits of
  * dot(embedding, plane(t, j)) — bit j set iff the dot is positive.
  *
  * `planes` is the flattened [numTables][bits][dim] hyperplane tensor (the
  * caller derives it from the same splitmix64 stream as before, so buckets
  * are bit-identical to the HOF formulation this replaces:
  * `aggregate(zip_with(emb, plane, multiply), 0.0, add)` per (table, bit) —
  * an INTERPRETED per-element fold despite living in a projection, costing
  * numTables × bits × dim boxed lambda evaluations per vector. Dot products
  * here accumulate left-to-right in double, matching the fold's order, so
  * every sign decision is identical. Precondition: no null elements in the
  * embedding (driver data has none; the HOF formulation would null-poison
  * the dot and clear the bit instead).
  */
case class HyperplaneBuckets(child: Expression, planes: Array[Double],
    numTables: Int, bits: Int, dim: Int) extends UnaryExpression {

  require(planes.length == numTables * bits * dim,
    s"planes length ${planes.length} != $numTables*$bits*$dim")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets expects array<float>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(
      input.asInstanceOf[ArrayData], planes, numTables, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |${ev.value} = graft.functions.HyperplaneBuckets.compute(
         |  $arr, $planesRef, $numTables, $bits, $dim);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  // Array[Double] equality is reference-based in case-class equals, which
  // would make canonicalization (CSE, exchange reuse) treat equal-content
  // plane tensors as distinct — so equality compares CONTENT. It must
  // include the tensor: keying on dims alone would let Catalyst substitute
  // one bucket computation for a differently-seeded one silently.
  override def equals(other: Any): Boolean = other match {
    case h: HyperplaneBuckets => h.child == child && h.numTables == numTables &&
      h.bits == bits && h.dim == dim && java.util.Arrays.equals(h.planes, planes)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Int.box(numTables), Int.box(bits), Int.box(dim),
    Int.box(java.util.Arrays.hashCode(planes)))
}

object HyperplaneBuckets {

  /** Shared kernel (eval + generated code). */
  def compute(emb: ArrayData, planes: Array[Double],
      numTables: Int, bits: Int, dim: Int): ArrayData = {
    val n = math.min(dim, emb.numElements())
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var dot = 0.0
        var d = 0
        while (d < n) {
          dot += emb.getFloat(d).toDouble * planes(base + d)
          d += 1
        }
        if (dot > 0) bucket |= 1 << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
