package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, Int8QuantStats, L2Norm}

/** Session extension registering graft's native expressions with the SQL
  * function registry, so `SELECT dot_product(a, b)` works from pure SQL:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * (Scala callers can use graft.functions.VectorFunctions directly.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(arrA, arrB)")
        DotProduct(args.head, args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("l2_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "l2_norm"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "l2_norm(arr)")
        L2Norm(args.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("int8_quant_stats"),
      new ExpressionInfo(classOf[Int8QuantStats].getName, "int8_quant_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "int8_quant_stats(arr)")
        Int8QuantStats(args.head)
      }))
  }
}
