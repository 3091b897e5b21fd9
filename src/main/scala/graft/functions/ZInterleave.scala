package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * `z_interleave(a, b, bits)`: the Morton Z-value — the low `bits` bits of
 * `a` on even positions interleaved with the low `bits` bits of `b` on
 * odd positions ([[graft.ext.Layout.zValue]]'s kernel).
 *
 * Why a custom Catalyst expression: the declarative spelling is an
 * `aggregate(sequence(0, bits-1), ...)` lambda fold — per-bit boxed
 * arithmetic outside whole-stage codegen, materializing a `bits`-element
 * array per ROW. A Z-ORDER layout job evaluates this once per row of the
 * entire table right before its range exchange, so the clustering write's
 * map stage is exactly the hot path codegen exists for. This generates a
 * primitive shift-or loop (interpreted twin identical); bit semantics
 * match the fold exactly — only the low `bits` bits participate, via the
 * same arithmetic `>>` on any input, so the two spellings are
 * bit-compatible on every int64 including negatives and overflow.
 */
case class ZInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        if (bits >= 1 && bits <= 31) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"z_interleave bits must be in [1, 31], got $bits")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"z_interleave requires two bigint arguments, got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "z_interleave"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i);
         |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
