package graft.plans

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` installer exposing the custom codegen
  * kernels to the SQL surface (SURVEY.md §7.2's extension tier):
  *
  *   graft_md5prefix32(str)      -> bigint  (shared LSH base hash)
  *   graft_array_dot(a, b)       -> double  (embedding dot product)
  *   graft_clean_len(str)        -> int     (count of [a-z0-9 ] chars)
  *   graft_sorted_intersect(a, b)-> bigint  (|a ∩ b| of sorted long sets)
  *
  * Wire-up: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * at session build, or [[GraftExtensions.install]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftExtensions {
  private def arity(name: String, n: Int)(build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument(s), got ${args.length}")
      build(args)
    }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_md5prefix32" -> arity("graft_md5prefix32", 1)(args => Md5Prefix32(args.head)),
    "graft_array_dot" -> arity("graft_array_dot", 2)(args => ArrayDotProduct(args(0), args(1))),
    "graft_clean_len" -> arity("graft_clean_len", 1)(args => CleanAlnumLen(args.head)),
    "graft_sorted_intersect" -> arity("graft_sorted_intersect", 2)(args => SortedIntersectCount(args(0), args(1))))

  /** Register the functions on an already-built session. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      GraftBridge.registerTempFunction(spark, name, builder)
    }
}
