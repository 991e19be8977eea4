package graft.queries

import org.apache.spark.sql.functions._
import Q._

/** Join pack (SURVEY.md §2.4): inner/left/semi/anti/full equi-joins,
  * cogroup-shaped grouped join, broadcast cross joins, theta join.
  * Small dimension sides are explicitly `broadcast()` — at 100 TB the
  * fact side never shuffles for these.
  */
object JoinQueries {

  val queries: Map[String, QFn] = Map(
    // inner equi-join + aggregate (`PJoin.reduce`,
    // /root/reference/dampr/dampr.py:780-802). customer is the small
    // side → broadcast hash join, no shuffle of orders.
    "q20_join_inner" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(cents(col("o_totalprice"))).as("revenue_cents"), count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    // left outer join (`PJoin.left_reduce`, dampr/dampr.py:804-820):
    // count customers per nation, keeping empty nations.
    "q21_join_left" -> ((s, dir) => {
      val n = t(s, dir, "nation"); val c = t(s, dir, "customer")
      n.join(c, n("n_nationkey") === c("c_nationkey"), "left_outer")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"))
        .orderBy(col("n_name"))
    }),

    // left-semi join — the reference composes this as
    // `filter_by_count` (dampr/utils/common.py:2-15); Spark has it as a
    // first-class join type that never materializes right columns.
    "q22_join_semi" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // left-anti join — the reference's idiom is left_reduce + filter
    // empty right (tests/test_dampr.py:118-130).
    "q23_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // full outer join — correct implementation of what the reference
    // left dead and buggy (`OuterJoin`, dampr/base.py:337-371).
    "q24_join_full" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("n_cust"))
      val su = t(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("n_supp"))
      c.join(su, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }),

    // cogroup-shaped join (`PJoin.reduce` receives (key, leftIt,
    // rightIt) — SURVEY.md §2.4 "many=False"): typed cogroup over
    // customer/orders; SQL-checkable because the per-key fold is
    // aggregate-shaped.
    "q25_cogroup" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal")).as[(Long, Double)]
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), cents(col("o_totalprice"))).as[(Long, Long)]
      val joined = c.groupByKey(_._1).cogroup(o.groupByKey(_._1)) { (k, cs, os) =>
        val cl = cs.toArray
        if (cl.isEmpty) Iterator.empty
        else {
          var n = 0L; var tot = 0L
          os.foreach { r => n += 1; tot += r._2 }
          if (n > 0) Iterator.single((k, n, tot)) else Iterator.empty
        }
      }
      joined.toDF("c_custkey", "n_orders", "total_cents").orderBy(col("c_custkey"))
    }),

    // broadcast cross join (`cross_left(memory=True)`,
    // dampr/dampr.py:541-588): map-side nested loop, zero shuffle.
    "q26_cross_broadcast" -> ((s, dir) => {
      val r = t(s, dir, "region"); val n = t(s, dir, "nation")
      r.crossJoin(broadcast(n))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // cross_set (dampr/dampr.py:590-619): whole aggregated right side
    // broadcast to every left row.
    "q27_cross_set" -> ((s, dir) => {
      val su = t(s, dir, "supplier")
      val nAgg = t(s, dir, "nation").agg(count(lit(1)).as("n_nations"))
      su.crossJoin(broadcast(nAgg))
        .select(col("s_suppkey"), col("s_name"), col("n_nations"))
        .orderBy(col("s_suppkey"))
    }),

    // theta join (beyond the reference, SURVEY.md §2.4 "absent"):
    // equi-key on nation + range residual on balances — Spark plans the
    // equi part as a hash join and applies the residual streaming.
    "q28_theta_join" -> ((s, dir) => {
      val su = t(s, dir, "supplier"); val c = t(s, dir, "customer")
      su.join(c, su("s_nationkey") === c("c_nationkey") &&
          abs(su("s_acctbal") - c("c_acctbal")) < 100)
        .select(col("s_suppkey"), col("c_custkey"))
        .orderBy(col("s_suppkey"), col("c_custkey"))
    }),

    // PURE range join (no equi-key): suppliers whose balance falls in
    // each customer's ±50 window. Declared naively Spark must plan a
    // BroadcastNestedLoopJoin (O(n·m) compares, one side held whole in
    // memory); RangeJoin.pointInInterval rewrites it into a
    // bin-bucketed EQUI join + residual filter — same rows (the oracle
    // is the naive BETWEEN join), scalable plan (pinned in PlanSpec).
    "q128_range_join" -> ((s, dir) => {
      val su = t(s, dir, "supplier").select(col("s_suppkey"), col("s_acctbal"))
      val iv = t(s, dir, "customer").select(col("c_custkey"),
        (col("c_acctbal") - 50).as("lo"), (col("c_acctbal") + 50).as("hi"))
      graft.operators.RangeJoin.pointInInterval(su, "s_acctbal", iv, "lo", "hi", 100.0)
        .select(col("s_suppkey"), col("c_custkey"))
        .orderBy(col("s_suppkey"), col("c_custkey"))
    }),

    // salted skew join: results are the PLAIN join's (the oracle is a
    // plain SQL join — salt is pure partitioning mechanics and must not
    // leak into results). q73's salted aggregation's join-shaped twin.
    "q114_salted_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      graft.operators.Relational.saltedJoin(l, o, "l_orderkey", "o_orderkey", 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
          cents(col("l_extendedprice")).as("price_cents"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q20_join_inner" ->
      """SELECT c_mktsegment,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q21_join_left" ->
      """SELECT n_name, count(c_custkey) AS n_cust
         FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q22_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders) ORDER BY c_custkey""",
    "q23_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) ORDER BY c_custkey""",
    "q24_join_full" ->
      """SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
         coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
         FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) s
         USING (nationkey) ORDER BY nationkey""",
    "q25_cogroup" ->
      """SELECT c_custkey, count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
         FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q26_cross_broadcast" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",
    "q27_cross_set" ->
      """SELECT s_suppkey, s_name, (SELECT count(*) FROM nation) AS n_nations
         FROM supplier ORDER BY s_suppkey""",
    "q28_theta_join" ->
      """SELECT s_suppkey, c_custkey FROM supplier JOIN customer
         ON s_nationkey = c_nationkey AND abs(s_acctbal - c_acctbal) < 100
         ORDER BY s_suppkey, c_custkey""",
    "q114_salted_join" ->
      """SELECT l_orderkey, l_linenumber, o_custkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         ORDER BY l_orderkey, l_linenumber""",
    // the bucketed rewrite must reproduce the naive range join exactly
    "q128_range_join" ->
      """SELECT s_suppkey, c_custkey FROM supplier JOIN customer
         ON s_acctbal BETWEEN c_acctbal - 50 AND c_acctbal + 50
         ORDER BY s_suppkey, c_custkey""")
}
