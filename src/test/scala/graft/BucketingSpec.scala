package graft

import org.apache.spark.sql.functions._

/** Bucketing = the pre-partitioned co-located join story for repeated
  * large-x-large joins at scale (SURVEY §4: the reference has only
  * hash-partitioned shuffles; Spark buckets persist the partitioning).
  * Asserts the join of two tables bucketed on the key plans with NO
  * shuffle exchange.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // warehouse dir is a temp dir set statically in TestSession
    val orders = Q(spark, "orders")
    val customer = Q(spark, "customer")
    orders.write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    customer.write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() === orders.count()) // every order has a customer
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  private def Q(s: org.apache.spark.sql.SparkSession, n: String) =
    graft.queries.Q.t(s, sf001, n)
}
