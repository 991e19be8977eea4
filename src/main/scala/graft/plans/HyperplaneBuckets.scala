package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bucket kernel for multi-table hyperplane LSH: all `tables` sign-bit
  * buckets of one embedding in one loop over a flattened weight
  * matrix. Exists because the expression-tree form (an `array(...)` of
  * tables x planes ArrayDotProduct+round+shift trees) grows the
  * generated method PAST JANINO'S 64 KB LIMIT at contract-advisor
  * geometries (q269's (23, 57) = 1,311 projections), silently dropping
  * the whole stage to interpreted eval — measured 12.7 s for a scan
  * whose arithmetic is ~1 GFLOP. This kernel keeps generated code
  * CONSTANT-SIZE regardless of geometry (one static call; weights ride
  * a codegen reference object, not inline constants).
  */
object HyperplaneKernel {
  /** Sign of Spark's `round(x, 9) > 0`, bit-identical to the
    * expression form: any x > 1e-8 survives 9-decimal rounding and
    * any x <= 0 cannot become positive, so only the razor-thin
    * (0, 1e-8] band pays the exact decimal-string rounding Spark's
    * Round applies to doubles.
    */
  def roundPos9(x: Double): Boolean =
    if (x <= 0.0) false
    else if (x > 1e-8) true
    else new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(9, java.math.RoundingMode.HALF_UP).signum() > 0

  /** Buckets for tables k = 0..tables-1: bit p of bucket k is the
    * rounded sign of e . w[(k*planes + p)*dim ..+dim] — the same
    * plane order, sequential-fold dot product, and round-9 sign rule
    * as the lshBucketAt expression tree, so buckets are bit-identical
    * and the DuckDB oracle replays unchanged.
    */
  def buckets(e: ArrayData, w: Array[Double], dim: Int, planes: Int, tables: Int): ArrayData = {
    val out = new Array[Long](tables)
    val n = math.min(e.numElements(), dim)
    var k = 0
    while (k < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val row = (k * planes + p) * dim
        var acc = 0.0
        var d = 0
        while (d < n) { acc += e.getDouble(d) * w(row + d); d += 1 }
        if (roundPos9(acc)) bucket |= 1L << p
        p += 1
      }
      out(k) = bucket
      k += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** `array<long>` of per-table LSH buckets for an `array<double>`
  * embedding column. `weights` is the flattened (tables*planes) x dim
  * plane matrix (plane-major), fixed per query plan.
  *
  * `weights` is an IndexedSeq, NOT a raw array: a case-class field of
  * type Array gets reference equals/hashCode, so two semantically
  * identical expressions built from separately tabulated weight
  * arrays would never compare equal — breaking Catalyst
  * canonicalization, subexpression elimination, and CacheManager
  * `sameResult` matching across independently built frames. The
  * IndexedSeq compares element-wise; the hot path still runs on a raw
  * `double[]` materialized once per plan (lazily for eval, via
  * `addReferenceObj` for codegen).
  */
case class HyperplaneBuckets(child: Expression, weights: IndexedSeq[Double],
    dim: Int, planes: Int, tables: Int) extends UnaryExpression {
  require(weights.length == tables * planes * dim,
    s"weights must be tables*planes*dim = ${tables * planes * dim} doubles, got ${weights.length}")
  @transient private lazy val wArr: Array[Double] = weights.toArray
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(e: Any): Any =
    HyperplaneKernel.buckets(e.asInstanceOf[ArrayData], wArr, dim, planes, tables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hyperplaneWeights", wArr, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.HyperplaneKernel.buckets($c, $wRef, $dim, $planes, $tables)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  def buckets(e: Column, weights: Array[Double], dim: Int, planes: Int, tables: Int): Column =
    GraftBridge.column(HyperplaneBuckets(GraftBridge.expression(e),
      weights.toIndexedSeq, dim, planes, tables))
}
