package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted and codegen'd paths. */
object CleanLenKernel {
  /** Number of characters of `s` in the class [a-z0-9 ] — numerically
    * identical to `length(regexp_replace(s, '[^a-z0-9 ]', ''))` (the
    * regex drops everything outside the class; this counts what it
    * keeps) but a single byte scan instead of a Matcher alloc + match
    * loop + StringBuffer rebuild per row.
    *
    * Byte iteration is correct for character counts here: the class is
    * pure ASCII, each ASCII char is one UTF-8 byte, and non-ASCII
    * continuation/lead bytes all have the high bit set so they can
    * never match the class — multi-byte code points contribute 0
    * either way, exactly like the regex.
    */
  def cleanLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == ' ') n += 1
      i += 1
    }
    n
  }
}

/** Custom Catalyst expression: count of [a-z0-9 ] characters. The hot
  * inner loop of quality scoring (`TextFunctions.qualityScore`) — on
  * punctuation-heavy corpora the regexp_replace form costs tens of
  * microseconds per row (Matcher + StringBuffer churn, measured in the
  * 30x soak); this kernel is one branchy byte scan and stays inside
  * whole-stage codegen. The DuckDB oracle keeps the regexp_replace
  * spelling — both count the same characters.
  */
case class CleanAlnumLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    CleanLenKernel.cleanLen(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CleanLenKernel.cleanLen($c)")
  override protected def withNewChildInternal(newChild: Expression): CleanAlnumLen =
    copy(child = newChild)
}

object CleanAlnumLen {
  def cleanLen(c: Column): Column =
    GraftBridge.column(CleanAlnumLen(GraftBridge.expression(c)))
}
