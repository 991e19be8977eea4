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
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
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
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedArrayKernel.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.SortedArrayKernel.intersectCount($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}
