package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for 100 TB-scale shuffles. AQE's skew-join
  * splitting covers sort-merge joins automatically; these cover the
  * cases it doesn't: heavily skewed aggregations and broadcast-able
  * skew keys in arbitrary join shapes.
  *
  * Pattern: salt the hot keys with a random suffix so one reducer's
  * worth of work fans out over `saltFactor` reducers, then re-combine.
  * Correct for any associative aggregate (two-phase aggregation).
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(keys + salt) partial →
    * groupBy(keys) final. Use when one key holds a disproportionate
    * share of rows and the partial-aggregate reduction factor is low
    * (e.g. collect-heavy aggs); for plain sums Spark's map-side partial
    * aggregation already handles skew.
    *
    * `partials`: aggregates for phase 1; `finals`: how to merge the
    * phase-1 column (by name) in phase 2.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("_salt")): _*).agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(finals.head, finals.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side against a small-ish right
    * side: left keys get a random salt in [0, saltFactor), the right
    * side is exploded `saltFactor`x so every (key, salt) bucket finds
    * its match. Shuffle load of the hot key spreads over saltFactor
    * reducers. Right side grows saltFactor-fold — use for dimension
    * tables too big to broadcast but far smaller than the fact side.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(pmod(hash(col(key), spark_partition_id(), monotonically_increasing_id()), lit(saltFactor)) + saltFactor, lit(saltFactor)))
    val explodedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(explodedRight, Seq(key, "_salt")).drop("_salt")
  }
}
