package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two array<float> columns, accumulating
  * in DOUBLE in index order.
  *
  * Why a custom Expression (SURVEY.md §7 watchlist b): the
  * higher-order-function formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)`
  * is interpreted per element (lambda dispatch + boxing) and is the
  * hot inner loop of every ANN/near-dup operator. This expression
  * emits a tight primitive loop inside whole-stage codegen.
  *
  * Semantics are IDENTICAL to the fold (same IEEE operation order:
  * ((0+p1)+p2)+...), so DuckDB-oracle parity is preserved bit for
  * bit. A null array, a null element, or a LENGTH MISMATCH yields
  * null — exactly the HOF chain's behavior (zip_with pads the shorter
  * side with nulls), which is what lets RewriteHofDotProduct swap the
  * chain for this expression without any semantic delta.
  */
case class FloatDotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  /** A null ELEMENT or a length mismatch also yields null, so the
    * expression is always nullable — BinaryExpression's default
    * (left.nullable || right.nullable) would declare non-nullable for
    * non-nullable array columns and let codegen assign to a literal
    * `false`. */
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // nullable is constant-true, so ev.isNull is a real variable and
      // the null-element / length-mismatch assignments always compile.
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  final int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column <-> Expression bridge. Custom Catalyst expressions need
  * `private[sql]` surface (AbstractDataType, ExpressionUtils), which
  * is why this file lives under org.apache.spark.sql — the standard
  * pattern for third-party Catalyst extensions.
  */
object GraftBridge {
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)
}
