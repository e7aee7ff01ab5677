package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Does ANY of a constant probe-hash set hit the row's serialized Bloom
  * filter? The executor-side manifest probe behind
  * [[graft.ops.Layout.readPrunedPoint]]: the point-lookup manifest holds
  * ONE Bloom PER FILE, so the lookup must evaluate "might any probed id
  * be in this file" against every manifest row — and Spark's own
  * `BloomFilterMightContain` can't serve it (that expression requires
  * the BLOOM side to be a constant; here the bloom is the per-row column
  * and the VALUES are the constants). Collecting every file's Bloom to
  * the driver instead — the shape this expression replaces — is
  * O(files × bloomBytes) driver memory + deserialization per lookup
  * (~800 MB at the 100k-file table the operator targets); through this
  * expression the manifest frame is filtered where it lives and only
  * surviving file NAMES reach the driver.
  *
  * The probe hashes ride in as a reference object (the [[MatVec]]
  * discipline — ≤k longs, broadcast once per task via the serialized
  * plan). Deserializing the Bloom per ROW is inherent here, not waste:
  * every row IS a different filter, evaluated exactly once. Both eval
  * paths call the same instance method, so codegen/interpreted parity is
  * structural.
  */
case class BloomMightContainAny(child: Expression, hashes: Seq[Long])
    extends UnaryExpression {

  // Probe hashes as Seq, not Array: case-class equality over an Array is
  // reference-based, which made two identical probe expressions never
  // compare equal — semanticEquals / canonicalization / subexpression
  // elimination silently skipped deduping them. The hot loop iterates a
  // pre-materialized array so the per-row cost is unchanged.
  private val hashArr: Array[Long] = hashes.toArray

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_any_of expects a binary bloom column, got ${t.simpleString}")
  }

  /** Shared by eval and generated code. */
  def hit(bytes: Array[Byte]): Boolean = {
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    var i = 0
    while (i < hashArr.length) {
      if (bf.mightContainLong(hashArr(i))) return true
      i += 1
    }
    false
  }

  override protected def nullSafeEval(input: Any): Any =
    hit(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomAnyOf", this,
      classOf[BloomMightContainAny].getName)
    nullSafeCodeGen(ctx, ev, bytes => s"${ev.value} = $self.hit($bytes);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainAny =
    copy(child = newChild)
}
