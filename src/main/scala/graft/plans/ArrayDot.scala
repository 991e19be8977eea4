package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot-product kernel over Catalyst ArrayData (no per-row boxed array
  * allocation).
  */
object ArrayDotKernel {
  /** Strict left-to-right summation — bit-identical to
    * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,v) => acc+v)`,
    * which also folds sequentially. Engine-portable under round(…, 6).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

/** Custom codegen expression: dot product of two `array<double>`
  * columns. The hot kernel of every cosine-similarity query (near-dup,
  * brute-force/IVF ANN, k-NN join): replaces `zip_with` + `aggregate`
  * higher-order functions, which materialize an intermediate array per
  * row; this loops the unsafe array data directly inside whole-stage
  * codegen.
  */
case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.ArrayDotKernel.dot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  def array_dot(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
