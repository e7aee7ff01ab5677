package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count of a hashed-gram set's members that hit a serialized Bloom filter,
  * in one compiled loop — the corpus-side decontamination decision
  * ([[graft.ops.TextAnalysis.decontaminateBloom]]) as a single expression.
  *
  * Replaces the interpreted HOF formulation
  * (`size(filter(grams, g → might_contain(lit(bytes), xxhash64(g))))`),
  * which walks an expression tree per gram with boxing AND rebuilds the
  * gram STRINGS per row through the zip_with chain; composed with
  * [[HashedNgrams]] the whole per-doc decision is two kernel calls inside
  * whole-stage codegen. The filter deserializes once per expression
  * instance (transient lazy), not per row — the discipline Spark's own
  * `BloomFilterMightContain` uses. Both eval paths call the same instance
  * method, so codegen/interpreted parity is structural (FunctionsSpec pins
  * equality against the HOF formulation it replaces anyway).
  *
  * Feed it hashes built the same way the sketch was built — here both
  * sides are `hashed_ngrams` / `xxhash64(gram)` longs, which
  * [[HashedNgrams]] guarantees are bit-identical.
  */
case class BloomCount(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_count expects array<long>, got ${t.simpleString}")
  }

  @transient private lazy val bf =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  /** Shared by eval and generated code. Null elements (possible under a
    * containsNull input type) contribute no hit, matching the HOF chain's
    * null-propagating `might_contain` returning null → filtered out.
    */
  def count(arr: ArrayData): Long = {
    val n = arr.numElements()
    var i = 0
    var c = 0L
    while (i < n) {
      if (!arr.isNullAt(i) && bf.mightContainLong(arr.getLong(i))) c += 1
      i += 1
    }
    c
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomCount", this,
      classOf[BloomCount].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $self.count($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomCount =
    copy(child = newChild)
}
