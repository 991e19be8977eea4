package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k as a typed bounded-heap AGGREGATE — the 100 TB
  * shape of "best k per group". The ranking-window form
  * ([[Relational.topKPerGroup]]) shuffles and SORTS every row of every
  * group before the rank filter drops all but k; this aggregator keeps
  * a k-entry sorted buffer per group (fixed bytes in the hash-agg map),
  * combines map-side like any aggregate, and only k rows per group
  * ever cross the shuffle. Same trade as global
  * `orderBy.limit` → `TakeOrderedAndProject`, applied per group —
  * reach for the window form only when you need full ranks, not a cut.
  *
  * Reference surface: the by-hand block-reducer top-k idiom
  * (`/root/reference/tests/test_dampr.py:239-311`) — here as the §2.8
  * typed-Aggregator custom surface with exact (score desc, id asc)
  * ordering so results are engine-deterministic under ties.
  */
object TopK {

  /** Keeps the k largest (score, id) pairs under (score desc, id asc).
    * The buffer is a sorted bounded Seq — k is small by contract, so
    * linear insertion beats heap constants and the buffer encodes as a
    * plain array of two-long structs.
    */
  final class TopKByScore(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    require(k >= 1, s"TopKByScore: k >= 1, got $k")
    override def zero: Seq[(Long, Long)] = Nil
    // "a ranks strictly before b"
    private def before(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def insert(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
      if (b.size >= k && before(b.last, a)) b // cannot displace anything
      else {
        val (pre, post) = b.span(e => before(e, a))
        ((pre :+ a) ++ post).take(k)
      }
    override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
      insert(b, a)
    override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
      y.foldLeft(x)(insert)
    override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  }

  /** DataFrame face: top `k` rows per `groupCol` by (`scoreCol` desc,
    * `idCol` asc), returned as (group, rank, score, id) rows. One
    * hash aggregation, k rows per group shuffled, no per-group sort.
    */
  def topKPerGroupAgg(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val ds = df.select(col(groupCol).cast("string"), col(scoreCol).cast("long"),
      col(idCol).cast("long")).as[(String, Long, Long)]
    ds.groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(new TopKByScore(k).toColumn.name("top"))
      .toDF("grp", "top")
      .select(col("grp"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("grp").as(groupCol), (col("pos") + 1).cast("int").as("rank"),
        col("e._1").as(scoreCol), col("e._2").as(idCol))
  }
}
