package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Merge-scan kernel over SORTED long arrays (no per-call hash set). */
object SortedArrayKernel {
  /** |a ∩ b| for ascending-sorted, duplicate-free `array<long>` inputs:
    * one two-pointer pass, O(|a| + |b|), zero allocation. Spark's
    * `array_intersect` builds an OpenHashSet per evaluation — per PAIR
    * in a near-dup verify join, which is the hot loop of every blocked
    * Jaccard scan. Inputs that are unsorted or carry duplicates produce
    * an undercount; callers sort once per document (`sort_array` /
    * `array_sort` after `array_distinct`/`collect_set`), amortizing the
    * sort over every pair the document participates in.
    */
  def intersectCount(a: ArrayData, b: ArrayData): Long =
    intersectCount(a, b, false, false)

  /** Typed variant: `aInt`/`bInt` say whether each input is
    * `array<int>` (the 31-bit hash sets — §2.3 narrower types: an int
    * set column halves the dominant verify-attach shuffle) or
    * `array<long>`. The flags are baked as literals at codegen, so the
    * JIT specializes each call site; mixed widths compare exactly
    * (31-bit values are lossless in both), which keeps a long-typed
    * at-rest index probe-compatible with an int-typed batch side.
    */
  def intersectCount(a: ArrayData, b: ArrayData, aInt: Boolean, bInt: Boolean): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = if (aInt) a.getInt(i).toLong else a.getLong(i)
      val y = if (bInt) b.getInt(j).toLong else b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** Custom codegen expression: intersection size of two sorted
  * `array<long>` set columns. With set semantics the full Jaccard
  * needs nothing else: |A ∪ B| = |A| + |B| - |A ∩ B|, so the verify
  * step of every near-dup pipeline (blocked exact, MinHash/LSH, token
  * LSH) becomes one merge scan per pair instead of two hash-set
  * constructions (`array_intersect` + `array_union`).
  */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  private def isIntArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
    case _ => false
  }
  private lazy val aInt = isIntArray(left)
  private lazy val bInt = isIntArray(right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedArrayKernel.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aInt, bInt)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.SortedArrayKernel.intersectCount($a, $b, $aInt, $bInt)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}
