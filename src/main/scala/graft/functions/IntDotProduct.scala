package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: integer dot product of two long arrays
  * in one fused codegen loop — the scoring kernel for int8-quantized
  * embeddings ([[graft.pipeline.Similarity.quantizeInt8]]), where the
  * whole point of quantization is that candidate scoring becomes exact
  * integer arithmetic (no float summation order, SIMD-friendly on real
  * hardware). Exact and order-independent, so results are bit-identical
  * on any engine/partitioning.
  *
  * Null if either side is null, lengths differ, or any element is null
  * (SQL semantics: x·NULL = NULL poisons the sum). Values are expected
  * int8-range; a 64-dim int8 dot is ≤ 64·127² ≪ Long.MaxValue, so no
  * overflow handling is needed at quantized magnitudes.
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - integer dot product of two array<bigint> " +
    "vectors. Intended for int8-quantized embeddings: the multiply-" +
    "accumulate is plain 64-bit arithmetic with NO overflow check, so " +
    "elements must stay small enough that sum(|a_i*b_i|) < 2^63 " +
    "(any length at int8 magnitudes; ~2^23 elements at int16). " +
    "Larger inputs wrap silently.")
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_int_dot expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  // length-mismatched inputs produce null even when children are
  // non-nullable (same reasoning as CosineSimilarity.nullable)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        dot += x.getLong(i) * y.getLong(i)
        i += 1
      }
      dot
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $dot += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}
