package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{FloatDotProduct, RewriteHofDotProduct}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `SELECT float_dot(a, b)`
  * works in plain spark.sql too (the DataFrame API binds the
  * expression directly via ExpressionUtils and does not need this),
  * and injects the optimizer rule that rewrites the declarative HOF
  * dot-product chain into the codegen'd expression (bitwise-exact —
  * see RewriteHofDotProduct).
  *
  * Activate with spark.sql.extensions=graft.GraftExtensions
  * (GraftSession does).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDotProduct(children.head, children(1))))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
