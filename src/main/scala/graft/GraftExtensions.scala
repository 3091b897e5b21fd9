package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.FloatDot

/**
 * Spark extensions entry point: registers graft's custom Catalyst
 * functions at session build time — the idiomatic packaging for a library
 * shipping native expressions:
 *
 * {{{
 *   SparkSession.builder()
 *     .config("spark.sql.extensions", "graft.GraftExtensions")
 *     ...
 * }}}
 *
 * (The runtime alternative, [[graft.functions.GraftFunctions.register]],
 * covers sessions that already exist; both paths register the same
 * expressions.)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"float_dot takes 2 arguments, got ${exprs.length}")
        FloatDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("z_interleave"),
      new ExpressionInfo(classOf[graft.functions.ZInterleave].getName, "z_interleave"),
      graft.functions.GraftFunctions.buildZInterleave(_)))
  }
}
