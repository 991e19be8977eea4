package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — absent from the reference (SURVEY.md
  * §2.4 "theta/range/as-of/interval joins: absent") and from Spark's
  * built-ins. Composed Spark-first (preference (a) of the custom-op
  * ladder) instead of a custom SparkPlan: tag both sides, union,
  * and carry the latest right row forward with an
  * unbounded-preceding `last(ignoreNulls)` window.
  *
  * Scale: ONE hash shuffle on the `by` keys + per-partition sort —
  * same cost as any windowed aggregate; never materializes the
  * O(left x right) range-candidate set a naive range join would.
  * Skewed `by` keys can pre-salt via [[Skew]].
  */
object AsOf {

  /** For each left row, the single right row with the greatest
    * `tsCol` <= left's `tsCol`, matched within `by` groups. Inner
    * semantics: left rows with no prior right row are dropped.
    *
    * Column contract: output = `by` + left `tsCol` + `leftId` +
    * `rightId` (the matched right row's id column, renamed
    * `matched_<rightId>`).
    */
  def asofJoin(left: DataFrame, right: DataFrame, by: Seq[String], tsCol: String,
      leftId: String, rightId: String): DataFrame = {
    val byCols = by.map(col)
    val l = left.select(byCols :+ col(tsCol) :+ col(leftId).as("_lid") :+
      lit(null).cast("long").as("_rid") :+ lit(1).as("_tag"): _*)
    val r = right.select(byCols :+ col(tsCol) :+ lit(null).cast("long").as("_lid") :+
      col(rightId).as("_rid") :+ lit(0).as("_tag"): _*)
    // right sorts before left at equal ts (_tag 0 < 1) -> inclusive <=
    val w = Window.partitionBy(byCols: _*).orderBy(col(tsCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_matched", last(col("_rid"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1 && col("_matched").isNotNull)
      .select(byCols :+ col(tsCol) :+ col("_lid").as(leftId) :+
        col("_matched").as(s"matched_$rightId"): _*)
  }
}
