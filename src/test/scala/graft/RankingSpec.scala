package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranking
import graft.operators.Ranking.Key

/** Equivalence laws for the scale-safe global ranking pack: under a
  * strict total order (unique tie-break key), [[Ranking.globalNtile]]
  * and [[Ranking.globalRankCumsum]] must be VALUE-IDENTICAL to the
  * partition-less window forms they replace — that identity is what
  * keeps the DuckDB oracles of q140/q188/q197/q198/q212 unchanged.
  * Inputs are crafted with heavy value ties (broken only by id),
  * descending keys, n < k, and empty frames.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  // 40 rows, values with many ties (mod 7), unique id tie-break
  private def tied: DataFrame =
    (0L until 40L).map(i => (i, (i * 13 % 7), s"u${100 - i}"))
      .toDF("id", "v", "name")

  private def collectSorted(df: DataFrame, cols: String*): Seq[Seq[Any]] =
    df.orderBy(cols.map(col): _*).collect().toSeq.map(_.toSeq)

  test("globalNtile == ntile window under a strict total order (ties on v, asc)") {
    for (k <- Seq(1, 3, 4, 10)) {
      val got = Ranking.globalNtile(tied, Seq(Key(col("v")), Key(col("id"))), k, "b")
      val want = tied.withColumn("b",
        ntile(k).over(Window.orderBy(col("v"), col("id"))))
      assert(collectSorted(got, "id") === collectSorted(want, "id"), s"k=$k")
    }
  }

  test("globalNtile == ntile window with a DESC leading key") {
    val got = Ranking.globalNtile(tied,
      Seq(Key(col("v"), asc = false), Key(col("id"))), 3, "b")
    val want = tied.withColumn("b",
      ntile(3).over(Window.orderBy(col("v").desc, col("id"))))
    assert(collectSorted(got, "id") === collectSorted(want, "id"))
  }

  test("globalNtile == ntile window on a STRING total order") {
    val got = Ranking.globalNtile(tied, Seq(Key(col("name"))), 4, "b")
    val want = tied.withColumn("b", ntile(4).over(Window.orderBy(col("name"))))
    assert(collectSorted(got, "id") === collectSorted(want, "id"))
  }

  test("globalNtile: n < k degenerates to bucket == rank (both engines' ntile rule)") {
    val small = Seq((1L, 5L), (2L, 5L), (3L, 1L)).toDF("id", "v")
    val got = Ranking.globalNtile(small, Seq(Key(col("v")), Key(col("id"))), 10, "b")
    val want = small.withColumn("b",
      ntile(10).over(Window.orderBy(col("v"), col("id"))))
    assert(collectSorted(got, "id") === collectSorted(want, "id"))
    // and the empty frame yields an empty frame with the column present
    val empty = Ranking.globalNtile(small.filter(col("id") < 0),
      Seq(Key(col("v")), Key(col("id"))), 3, "b")
    assert(empty.columns.contains("b") && empty.count() === 0)
  }

  test("globalRankCumsum == row_number + running LONG sum windows") {
    val got = Ranking.globalRankCumsum(tied,
      Seq(Key(col("v"), asc = false), Key(col("id"))),
      "rk", cumsumOf = Some("v"), cumCol = "cum")
    val want = tied
      .withColumn("rk",
        row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .withColumn("cum", sum(col("v")).over(Window.orderBy(col("v").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(collectSorted(got, "id") === collectSorted(want, "id"))
    // ranks are a permutation of 1..n
    assert(got.select("rk").as[Long].collect().sorted.toSeq === (1L to 40L))
  }

  test("globalRankCumsum without a sum column emits only the rank") {
    val got = Ranking.globalRankCumsum(tied, Seq(Key(col("id"))), "rk")
    assert(got.columns.toSeq === Seq("id", "v", "name", "rk"))
    assert(got.filter(col("rk") =!= col("id") + 1).count() === 0)
  }

  test("cumsumAtRanks == full running sum read at the selected ranks") {
    val keys = Seq(Key(col("v"), asc = false), Key(col("id")))
    val full = Ranking.globalRankCumsum(tied, keys, "rk",
      cumsumOf = Some("v"), cumCol = "cum")
      .select("rk", "cum").as[(Long, Long)].collect().toMap
    val (n, total, at) = Ranking.cumsumAtRanks(tied, keys, "v",
      n => Seq(1L, 7L, 23L, n, n + 5 /* ignored */, -2L /* ignored */))
    assert(n === 40L)
    assert(total === (0L until 40L).map(i => i * 13 % 7).sum)
    assert(at.keySet === Set(1L, 7L, 23L, 40L))
    at.foreach { case (r, c) => assert(c === full(r), s"rank $r") }
    assert(at(40L) === total)
    // empty frame: totals zero, no ranks served
    val (n0, t0, a0) = Ranking.cumsumAtRanks(tied.filter(col("id") < 0), keys, "v", _ => Seq(1L))
    assert(n0 === 0L && t0 === 0L && a0.isEmpty)
  }

  test("globalNtile refuses NULL sort keys instead of silently undercounting buckets") {
    val d = Seq((Some(1L), 1L), (None, 2L), (Some(3L), 3L)).toDF("v", "id")
    val e = intercept[IllegalArgumentException] {
      Ranking.globalNtile(d, Seq(Key(col("v")), Key(col("id"))), 2, "b").collect()
    }
    assert(e.getMessage.contains("NULL sort key"))
  }

  test("globalRankCumsum refuses non-LONG running-sum columns") {
    val d = Seq((1L, 1.5)).toDF("id", "x")
    val e = intercept[IllegalArgumentException] {
      Ranking.globalRankCumsum(d, Seq(Key(col("id"))), "rk", cumsumOf = Some("x"))
    }
    assert(e.getMessage.contains("LONG-only"))
  }

  test("neither shape plans a partition-less WindowExec") {
    import org.apache.spark.sql.execution.window.WindowExec
    val a = Ranking.globalNtile(tied, Seq(Key(col("v")), Key(col("id"))), 4, "b")
    val b = Ranking.globalRankCumsum(tied, Seq(Key(col("v")), Key(col("id"))), "rk",
      cumsumOf = Some("v"))
    for (df <- Seq(a, b)) {
      val w = df.queryExecution.executedPlan.collect {
        case x: WindowExec if x.partitionSpec.isEmpty => x
      }
      assert(w.isEmpty, df.queryExecution.executedPlan.toString.take(1500))
    }
  }
}
