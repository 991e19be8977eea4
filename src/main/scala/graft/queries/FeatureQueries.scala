package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Features, Relational}
import graft.functions.TextFunctions
import Q._

/** ML-observability / feature-engineering pack (q180-q186): the layer
  * between a curated corpus and a trained or monitored model —
  * sweep-line concurrency, PSI distribution drift, smoothed target
  * encoding, the hashing trick, exact tie-aware AUC, Welch A/B, and
  * per-doc TF-IDF keywords. All integer-unit deterministic
  * ([[Q]] rules); ln/sqrt are the only floats and arrive round-6.
  */
object FeatureQueries {

  val queries: Map[String, QFn] = Map(
    // Max concurrent 5-minute event intervals per type: the sweep-line
    // (+1/-1 running sum) pattern — capacity planning over the event
    // log. Half-open [t, t+300s): ends sort before starts at equal t.
    "q180_concurrency" -> ((s, dir) =>
      Features.maxConcurrency(Q.events(s, dir), col("event_type"), col("ts"), 300)
        .withColumnRenamed("grp", "event_type")
        .orderBy(col("event_type"))),

    // PSI drift of purchase value between the first and second half of
    // the event window: 10 ref-bounded equal-width buckets, Laplace
    // smoothing, per-bucket (p-q)ln(p/q) round-6.
    "q181_psi_drift" -> ((s, dir) => {
      val e = Q.events(s, dir)
        .select(col("ts").cast("date").as("day"),
          round(col("value") * 1000000).cast("long").as("vm"))
      val mid = e.agg(date_add(min(col("day")), 15).as("mid"))
      val tagged = e.crossJoin(broadcast(mid))
      Features.psiDrift(
        tagged.filter(col("day") < col("mid")),
        tagged.filter(col("day") >= col("mid")),
        col("vm"))
    }),

    // Smoothed per-user mean purchase encoding (m = 20 pseudo-counts
    // toward the global mean): top 50 users by encoded value. With
    // ~13 purchases/user the smoothing term dominates — exactly the
    // regime where unsmoothed target encoding memorizes noise.
    "q182_target_encoding" -> ((s, dir) =>
      Features.targetEncode(
          Q.events(s, dir).filter(col("event_type") === "purchase"),
          col("user_id"), round(col("value") * 1000000).cast("long"), m = 20)
        .withColumnRenamed("key", "user_id")
        .orderBy(col("enc_micro").desc, col("user_id")).limit(50)),

    // Hashing-trick bucket audit: every document token routed to one
    // of 64 features by the engine-shared md5 hash; per-bucket token
    // load, distinct-term collision load, doc reach.
    "q183_feature_hash" -> ((s, dir) =>
      Features.featureHashStats(t(s, dir, "documents"),
          col("doc_id"), col("text"), 64)
        .orderBy(col("bucket"))),

    // Exact tie-aware ROC AUC of a deliberately tied score
    // (n_chars mod 50) against the lang='en' label — the rank-sum
    // identity in pure integer arithmetic.
    "q184_auc" -> ((s, dir) =>
      Features.aucExact(t(s, dir, "documents"),
        col("lang") === "en", col("n_chars") % 50)),

    // Welch two-sample z on purchase cents: even user_ids (A) vs odd
    // (B) — the A/B readout over exact integer sums.
    "q185_ab_test" -> ((s, dir) =>
      Features.welchAB(
        Q.events(s, dir).filter(col("event_type") === "purchase"),
        col("user_id") % 2 === 0, Q.cents(col("value")))),

    // Per-doc top-3 keyword shingles by integer TF-IDF lift
    // (tf * floor(1e6 * n_docs / df)); ranking-window per doc with
    // full (score desc, term asc) tie-break.
    "q186_keywords" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
        explode(TextFunctions.shingles(TextFunctions.tokenize(col("text")), 3)).as("term"))
      val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nd = docs.agg(count_distinct(col("doc_id")).as("nd"))
      val scored = tf.join(dfreq, "term").crossJoin(broadcast(nd))
        .select(col("doc_id"), col("term"),
          (col("tf") * expr("(1000000 * nd) div df")).as("score"))
      Relational.topKPerGroup(scored, 3, Seq(col("doc_id")),
          Seq(col("score").desc, col("term").asc))
        .select(col("doc_id"), col("term"), col("score"))
        .orderBy(col("doc_id"), col("score").desc, col("term"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q180_concurrency" ->
      s"""WITH pts AS (
            SELECT event_type, ts AS t, 1 AS delta FROM events
            UNION ALL
            SELECT event_type, ts + INTERVAL 300 SECONDS, -1 FROM events),
          sw AS (SELECT event_type,
              sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
            FROM pts)
          SELECT event_type, CAST(count(*) / 2 AS BIGINT) AS n_intervals,
            CAST(max(conc) AS INT) AS max_conc
          FROM sw GROUP BY 1 ORDER BY 1""",

    "q181_psi_drift" ->
      s"""WITH e AS (SELECT CAST(ts AS DATE) AS day,
              CAST(round(value * 1000000) AS BIGINT) AS vm FROM events),
          m AS (SELECT min(day) + INTERVAL 15 DAYS AS mid FROM e),
          r AS (SELECT vm FROM e CROSS JOIN m WHERE day < mid),
          c AS (SELECT vm FROM e CROSS JOIN m WHERE day >= mid),
          b AS (SELECT min(vm) AS mn, max(vm) AS mx FROM r),
          rb AS (SELECT greatest(0, least(9,
              CAST(((vm - mn) * 10) // (mx - mn + 1) AS INT))) AS bucket
            FROM r CROSS JOIN b),
          cb AS (SELECT greatest(0, least(9,
              CAST(((vm - mn) * 10) // (mx - mn + 1) AS INT))) AS bucket
            FROM c CROSS JOIN b),
          spine AS (SELECT unnest(generate_series(0, 9)) AS bucket),
          rn AS (SELECT bucket, count(*) AS ref_n FROM rb GROUP BY 1),
          cn AS (SELECT bucket, count(*) AS cur_n FROM cb GROUP BY 1),
          j AS (SELECT CAST(spine.bucket AS INT) AS bucket,
              coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
            FROM spine LEFT JOIN rn ON spine.bucket = rn.bucket
              LEFT JOIN cn ON spine.bucket = cn.bucket),
          tt AS (SELECT sum(ref_n) AS rt, sum(cur_n) AS ct FROM j)
          SELECT bucket, CAST(ref_n AS BIGINT) AS ref_n,
            CAST(cur_n AS BIGINT) AS cur_n,
            round(((ref_n + 1) / (rt + 10) - (cur_n + 1) / (ct + 10)) *
              ln(((ref_n + 1) / (rt + 10)) / ((cur_n + 1) / (ct + 10))), 6)
              AS psi_r6
          FROM j CROSS JOIN tt ORDER BY bucket""",

    "q182_target_encoding" ->
      s"""WITH p AS (SELECT user_id,
              CAST(round(value * 1000000) AS BIGINT) AS vm
            FROM events WHERE event_type = 'purchase'),
          per AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n,
              sum(vm) AS sum_micro FROM p GROUP BY 1),
          g AS (SELECT sum(sum_micro) AS ts, sum(n) AS tn FROM per)
          SELECT key AS user_id, n, CAST(sum_micro AS BIGINT) AS sum_micro,
            CAST((sum_micro + (ts // tn) * 20) // (n + 20) AS BIGINT)
              AS enc_micro
          FROM per CROSS JOIN g
          ORDER BY enc_micro DESC, user_id LIMIT 50""",

    "q183_feature_hash" ->
      s"""WITH tok AS (SELECT doc_id AS id,
              unnest(string_split(lower(text), ' ')) AS token FROM $DocsPq),
          t2 AS (SELECT id, token,
              CAST(${Q.sqlTokenHash("'fh_' || token")} % 64 AS INT) AS bucket
            FROM tok WHERE token <> '')
          SELECT bucket, CAST(count(*) AS BIGINT) AS n_tok,
            CAST(count(DISTINCT token) AS BIGINT) AS n_terms,
            CAST(count(DISTINCT id) AS BIGINT) AS n_docs
          FROM t2 GROUP BY 1 ORDER BY 1""",

    "q184_auc" ->
      s"""WITH s AS (SELECT n_chars % 50 AS s,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM $DocsPq),
          g AS (SELECT s, count(*) AS n, sum(y) AS p FROM s GROUP BY 1),
          r AS (SELECT p, n,
              coalesce(sum(n) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
            FROM g),
          a AS (SELECT sum(p * (cum * 2 + n + 1)) AS r2, sum(p) AS n_pos,
              sum(n - p) AS n_neg FROM r)
          SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
            CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
            CAST(((r2 - n_pos * (n_pos + 1)) * 1000000)
              // (2 * n_pos * n_neg) AS BIGINT) AS auc_micro
          FROM a""",

    "q185_ab_test" ->
      s"""WITH p AS (SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g,
              CAST(round(value * 100) AS BIGINT) AS c
            FROM events WHERE event_type = 'purchase'),
          a AS (SELECT
              sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n_a,
              sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS n_b,
              sum(CASE WHEN g = 1 THEN c ELSE 0 END) AS sum_a_cents,
              sum(CASE WHEN g = 0 THEN c ELSE 0 END) AS sum_b_cents,
              sum(CASE WHEN g = 1 THEN c * c ELSE 0 END) AS qa,
              sum(CASE WHEN g = 0 THEN c * c ELSE 0 END) AS qb
            FROM p)
          SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
            CAST(sum_a_cents AS BIGINT) AS sum_a_cents,
            CAST(sum_b_cents AS BIGINT) AS sum_b_cents,
            round(sum_a_cents / n_a - sum_b_cents / n_b, 6) AS dmean_cents_r6,
            round((sum_a_cents / n_a - sum_b_cents / n_b) /
              sqrt((qa - sum_a_cents * sum_a_cents / n_a) / (n_a - 1) / n_a +
                   (qb - sum_b_cents * sum_b_cents / n_b) / (n_b - 1) / n_b), 6)
              AS z_r6
          FROM a""",

    "q186_keywords" ->
      s"""WITH tk AS (SELECT doc_id,
              list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
            FROM $DocsPq),
          sh AS (SELECT doc_id,
              tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS term
            FROM tk, unnest(generate_series(1, len(tk) - 2)) AS u(i)
            WHERE len(tk) >= 3),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM sh GROUP BY 1, 2),
          dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          nd AS (SELECT count(DISTINCT doc_id) AS nd FROM $DocsPq),
          sc AS (SELECT doc_id, term,
              tf * ((1000000 * nd) // df) AS score
            FROM tf JOIN dfreq USING (term) CROSS JOIN nd),
          rk AS (SELECT doc_id, term, score,
              row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, term) AS rn FROM sc)
          SELECT doc_id, term, CAST(score AS BIGINT) AS score
          FROM rk WHERE rn <= 3 ORDER BY doc_id, score DESC, term"""
  )
}
