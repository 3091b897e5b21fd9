package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * `float_dot(a, b)`: dot product of two `array<float>` columns, accumulated
 * left-to-right in double precision.
 *
 * Why a custom Catalyst expression (SURVEY.md §4.3's "only if hot" clause —
 * it is hot): the declarative spelling
 * `aggregate(zip_with(a, b, (x,y) -> ...), 0d, (acc,v) -> acc+v)` evaluates
 * the lambda per element with boxed Doubles and cannot be whole-stage
 * codegen'd, which measured ~300 s for 4M pairs × 64 dims at sf0.1. This
 * expression generates a primitive `for` loop inside whole-stage codegen
 * (and has a matching interpreted path), with identical arithmetic:
 * each product is (double)a_i * (double)b_i, exactly-rounded IEEE, summed
 * in array order — so results are bit-identical to the HOF spelling and
 * reproducible in the DuckDB oracle. One deliberate divergence: arrays of
 * different lengths raise (the HOF spelling nulls the zip tail) — a
 * dimension mismatch is corrupt input and must surface, not truncate.
 */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"float_dot requires two array<float> arguments, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // A dimension mismatch is corrupt input; truncating to the shorter
    // array would return a plausible-looking wrong answer (ADVICE r2).
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"float_dot: dimension mismatch (${x.numElements()} vs ${y.numElements()})")
    }
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "float_dot: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Runtime registration of graft's custom SQL functions into a session. */
object GraftFunctions {

  /** `z_interleave`'s builder — `bits` must be a foldable int literal
    * (it shapes the generated loop, so it cannot vary per row). */
  private[graft] def buildZInterleave(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"z_interleave takes 3 arguments (a, b, bits), got ${exprs.length}")
    require(exprs(2).foldable, "z_interleave bits must be a literal")
    val bits = exprs(2).eval().asInstanceOf[Number].intValue()
    ZInterleave(exprs.head, exprs(1), bits)
  }

  /** Idempotently register graft's custom SQL functions (`float_dot`,
    * `sparse_dot`, `z_interleave`) so their `expr(...)` spellings resolve. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val fd = FunctionIdentifier("float_dot")
    if (!registry.functionExists(fd)) {
      registry.registerFunction(
        fd,
        new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, s"float_dot takes 2 arguments, got ${exprs.length}")
          FloatDot(exprs.head, exprs(1))
        })
    }
    val sd = FunctionIdentifier("sparse_dot")
    if (!registry.functionExists(sd)) {
      registry.registerFunction(
        sd,
        new ExpressionInfo(classOf[SparseDot].getName, "sparse_dot"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, s"sparse_dot takes 2 arguments, got ${exprs.length}")
          SparseDot(exprs.head, exprs(1))
        })
    }
    val zi = FunctionIdentifier("z_interleave")
    if (!registry.functionExists(zi)) {
      registry.registerFunction(
        zi,
        new ExpressionInfo(classOf[ZInterleave].getName, "z_interleave"),
        buildZInterleave(_))
    }
  }
}
