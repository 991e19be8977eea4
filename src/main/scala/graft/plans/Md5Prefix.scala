package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernel shared by interpreted and codegen'd paths. */
object Md5Hash {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 4 digest bytes big-endian as unsigned 32-bit — numerically
    * identical to `conv(substring(md5(s),1,8),16,10)` / DuckDB's
    * `('0x'||substr(md5(s),1,8))::BIGINT`, without materializing the
    * hex string.
    */
  def hash(s: UTF8String): Long = {
    val md = tl.get(); md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** Custom Catalyst expression: unsigned 32-bit md5 prefix of a string.
  * The base hash for minhash/simhash/LSH (SURVEY.md §7.2's "custom
  * Expression" tier): one digest, no hex-string intermediate, stays
  * inside whole-stage codegen via a static kernel call. Engine-portable
  * because md5 is standardized — the DuckDB oracle computes the same
  * value from the hex form.
  */
case class Md5Prefix32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Md5Hash.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Hash.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)
}

object Md5Prefix32 {
  def md5prefix32(c: Column): Column =
    GraftBridge.column(Md5Prefix32(GraftBridge.expression(c)))
}
