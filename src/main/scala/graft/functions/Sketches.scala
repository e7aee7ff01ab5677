package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd sketch signatures for the dedup scale tier.
  *
  * Spark's higher-order functions (`transform`/`aggregate`) evaluate their
  * lambdas interpreted — per-element expression-tree walks with boxing. A
  * MinHash signature is numHashes × |shingles| lambda evals per row (~25M
  * per 5k docs), which measured in *tens of seconds*; these expressions
  * compile to tight primitive loops inside WholeStageCodegen and do the
  * same work in milliseconds. Same asymptotics at 100 TB — this is pure
  * constant-factor, but a ~1000× constant.
  */

/** MinHash signature over pre-hashed shingles (array<long>, values in
  * [0, prime)): sig_i = min over h of (a_i·h + b_i) mod prime, with
  * a_i = 2i+1 (odd) and b_i = (i·2654435761) mod prime — the same
  * universal-hash family the HOF formulation used, bit-for-bit.
  */
case class MinHashSig(child: Expression, numHashes: Int, prime: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = 2L * i + 1
      val b = (i * 2654435761L) % prime
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * hs.getLong(j) + b) % prime
        if (v < min) min = v
        j += 1
      }
      sig(i) = if (n == 0) 0L else min
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val (sig, i, j, n, min, a, b) = (ctx.freshName("sig"), ctx.freshName("i"),
        ctx.freshName("j"), ctx.freshName("n"), ctx.freshName("min"),
        ctx.freshName("a"), ctx.freshName("b"))
      s"""
         |int $n = $hs.numElements();
         |long[] $sig = new long[$numHashes];
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  long $a = 2L * $i + 1;
         |  long $b = ($i * 2654435761L) % ${prime}L;
         |  long $min = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long v = ($a * $hs.getLong($j) + $b) % ${prime}L;
         |    if (v < $min) $min = v;
         |  }
         |  $sig[$i] = ($n == 0) ? 0L : $min;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash over word hashes (array<long>), emitted as 4 × 16-bit
  * chunks (ANSI-safe — no sign-bit packing): bit k of the signature is 1
  * iff Σ_h (±1 per bit k of h) > 0; chunk c packs bits [16c, 16c+16)
  * MSB-first: acc = acc·2 + bit(16c + j) for j = 0..15.
  */
case class SimHashChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_chunks expects array<bigint>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var k = 0
      while (k < 64) {
        if (((h >> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      i += 1
    }
    val chunks = new Array[Long](4)
    var c = 0
    while (c < 4) {
      var acc = 0L
      var j = 0
      while (j < 16) {
        acc = acc * 2 + (if (counts(c * 16 + j) > 0) 1L else 0L)
        j += 1
      }
      chunks(c) = acc
      c += 1
    }
    new GenericArrayData(chunks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val (counts, chunks, i, k, c, j, acc, n) = (ctx.freshName("counts"),
        ctx.freshName("chunks"), ctx.freshName("i"), ctx.freshName("k"),
        ctx.freshName("c"), ctx.freshName("j"), ctx.freshName("acc"),
        ctx.freshName("n"))
      s"""
         |int $n = $hs.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long h = $hs.getLong($i);
         |  for (int $k = 0; $k < 64; $k++) {
         |    if (((h >> $k) & 1L) == 1L) $counts[$k]++; else $counts[$k]--;
         |  }
         |}
         |long[] $chunks = new long[4];
         |for (int $c = 0; $c < 4; $c++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < 16; $j++) {
         |    $acc = $acc * 2 + (($counts[$c * 16 + $j] > 0) ? 1L : 0L);
         |  }
         |  $chunks[$c] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($chunks);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashChunks =
    copy(child = newChild)
}
