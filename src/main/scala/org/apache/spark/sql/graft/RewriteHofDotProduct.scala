package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS
  *   DOUBLE)), 0.0d, (acc, e) -> acc + e)
  *
  * over two array<float> columns into the codegen'd
  * [[FloatDotProduct]] — so a user who writes the idiomatic
  * functions-API formulation gets the tight primitive loop the
  * engine's own operators use, without knowing float_dot exists.
  *
  * The rewrite is BITWISE exact, which is what earns it a place in
  * the optimizer: both forms accumulate double left-to-right over
  * double-widened float products, return null for a null array, a
  * null element, or a length mismatch (zip_with pads the shorter side
  * with null), and +0.0 for empty arrays. The lambda match is strict
  * — both operands cast to double (a float*float product rounds to
  * FLOAT first and is NOT the same sum), init exactly +0.0 (a -0.0
  * init differs on empty input), merge a plain Add of the two lambda
  * variables (commuted operand orders accepted: IEEE * and + are
  * commutative), identity finish. Anything else is left alone.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def castToDoubleOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast => c.dataType == DoubleType && sameVar(c.child, v)
    case _ => false
  }

  private def isProductLambda(lf: Expression): Boolean = lf match {
    case LambdaFunction(Multiply(l, r, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (castToDoubleOf(l, x) && castToDoubleOf(r, y)) ||
        (castToDoubleOf(l, y) && castToDoubleOf(r, x))
    case _ => false
  }

  private def isAddLambda(lf: Expression): Boolean = lf match {
    case LambdaFunction(Add(l, r, _),
        Seq(acc: NamedLambdaVariable, e: NamedLambdaVariable), _) =>
      (sameVar(l, acc) && sameVar(r, e)) || (sameVar(l, e) && sameVar(r, acc))
    case _ => false
  }

  private def isIdentityFinish(lf: Expression): Boolean = lf match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) => sameVar(body, v)
    case _ => false
  }

  private def isPosZero(l: Literal): Boolean = l match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, mult), zero: Literal, merge, finish)
          if isFloatArray(a) && isFloatArray(b) && isPosZero(zero) &&
            isProductLambda(mult) && isAddLambda(merge) &&
            isIdentityFinish(finish) =>
        FloatDotProduct(a, b)
    }
}
