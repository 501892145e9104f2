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
  * Null if either side is null, lengths differ, any element is null
  * (SQL semantics: x·NULL = NULL poisons the sum), or the multiply-
  * accumulate overflows int64. At the intended int8-quantized
  * magnitudes overflow is unreachable (a 64-dim int8 dot is
  * ≤ 64·127² ≪ Long.MaxValue) and the exact-arithmetic intrinsics
  * (`Math.multiplyExact`/`addExact`) JIT to the same mul/add plus a
  * branch-on-overflow-flag — but as a GENERIC SQL function
  * (`graft_int_dot`) it accepts arbitrary bigints, and a silent wrap
  * would return a confidently wrong score. Null is the SQL-shaped
  * "can't represent" answer, consistent with the other null cases.
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - integer dot product of two array<bigint> " +
    "vectors. Intended for int8-quantized embeddings, where the " +
    "multiply-accumulate is exact 64-bit arithmetic. Inputs whose " +
    "dot product overflows int64 return NULL rather than wrapping.")
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
      try {
        var dot = 0L
        var i = 0
        while (i < n) {
          if (x.isNullAt(i) || y.isNullAt(i)) return null
          dot = Math.addExact(dot,
            Math.multiplyExact(x.getLong(i), y.getLong(i)))
          i += 1
        }
        dot
      } catch { case _: ArithmeticException => null }
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
         |  try {
         |    for (int $i = 0; $i < $n; $i++) {
         |      if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |        ${ev.isNull} = true; break;
         |      }
         |      $dot = java.lang.Math.addExact($dot,
         |        java.lang.Math.multiplyExact(
         |          $a.getLong($i), $b.getLong($i)));
         |    }
         |  } catch (java.lang.ArithmeticException e) {
         |    ${ev.isNull} = true;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}
