package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import Q._

/** Text-analysis + multimodal-plumbing pack (beyond-reference,
  * BASELINE.json north star): token stats, language ID, quality
  * scoring, fingerprinting, binary-column metadata.
  */
object TextQueries {

  private val SqlToks =
    s"SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks FROM $DocsPq"

  private def sqlMarkers(ms: Seq[String]) = ms.map(m => s"'$m'").mkString("(", ", ", ")")
  private val langs = TextFunctions.langMarkers
  private val allMarkers = langs.flatMap(_._2).distinct

  /** CTE chain replaying [[TextFunctions.qualityScore]] exactly —
    * `qual` yields (doc_id, quality). Shared by the q62 oracle and the
    * cluster keep-best oracle (q116) so the quality replay cannot
    * drift between them. Names are kb-prefixed to avoid colliding with
    * the dedup pair CTEs when composed.
    */
  private[queries] val sqlQualityCtes: String =
    s"""kb_base AS (SELECT doc_id, lower(text) AS lt,
          list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks FROM $DocsPq),
        kb_m AS (SELECT doc_id,
          len(toks)::DOUBLE AS n_tok,
          len(list_filter(toks, t -> t IN ${sqlMarkers(allMarkers)}))::DOUBLE AS n_stop,
          len(lt) AS n_ch,
          len(regexp_replace(lt, '[^a-z0-9 ]', '', 'g')) AS n_clean FROM kb_base),
        qual AS (SELECT doc_id,
          round(0.4 * least(n_tok / 50.0, 1.0)
            + 0.4 * (1.0 - (n_ch - n_clean)::DOUBLE / greatest(n_ch, 1)::DOUBLE)
            + 0.2 * least(n_stop / greatest(n_tok, 1.0) * 5.0, 1.0), 6) AS quality
          FROM kb_m)"""

  /** docs left-joined to the codegen'd per-doc token aggregates (the
    * fast corpus-scoring path; see TextFunctions.tokenAggregates).
    */
  private def withAggs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = t(s, dir, "documents")
    docs.join(TextFunctions.tokenAggregates(docs, "doc_id", "text"), Seq("doc_id"), "left_outer")
  }

  val queries: Map[String, QFn] = Map(
    // token counting: total, distinct, mean token length.
    "q60_token_stats" -> ((s, dir) =>
      withAggs(s, dir)
        .select(col("doc_id"),
          coalesce(col("n_tok"), lit(0L)).cast("int").as("n_tokens"),
          coalesce(col("n_uniq"), lit(0L)).cast("int").as("n_uniq"),
          r6(coalesce(col("sum_tok_len"), lit(0L)).cast("double") /
            greatest(coalesce(col("n_tok"), lit(0L)), lit(1L)).cast("double")).as("avg_tok_len"))
        .orderBy(col("doc_id"))),

    // BPE-ish regex token counting (subword-piece proxy): alnum runs +
    // single punctuation pieces, total and distinct per doc.
    "q74_regex_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(TextFunctions.bpePieces(col("text"))).as("n_pieces"),
          size(array_distinct(TextFunctions.bpePieces(col("text")))).as("n_uniq_pieces"))
        .orderBy(col("doc_id"))),

    // marker-word language ID (n-gram-heuristic shape).
    "q61_lang_id" -> ((s, dir) =>
      withAggs(s, dir)
        .select(col("doc_id"), TextFunctions.langIdFromScores.as("lang_pred"))
        .orderBy(col("doc_id"))),

    // C4/Gopher-style quality score.
    "q62_quality" -> ((s, dir) =>
      withAggs(s, dir)
        .select(col("doc_id"), TextFunctions.qualityFromScores(col("text")).as("quality"))
        .orderBy(col("doc_id"))),

    // normalized md5 fingerprint per document.
    "q63_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    // winnowed rolling-hash fingerprint set (k=3 shingles, window 4) —
    // the partial-overlap dedup fingerprint (md5 whole-doc fingerprints
    // only catch exact dups). Docs shorter than k tokens are dropped on
    // both sides.
    // typed O(n) winnowing path — values identical to the Column form
    // (pinned in OperatorsSpec); the HOF form is ~13 ms/doc when the
    // fingerprint column is actually materialized
    "q75_winnow_fingerprint" -> ((s, dir) =>
      TextFunctions.winnowedFingerprintSets(t(s, dir, "documents"), "doc_id", "text", 3, 4)
        .select(col("doc_id"),
          array_join(col("fps").cast("array<string>"), ",").as("fp_set"),
          size(col("fps")).as("n_fp"))
        .orderBy(col("doc_id"))),

    // multimodal plumbing: opaque binary payload column + typed
    // metadata extraction (byte length + content digest). The
    // decode-side (image/audio) runs through
    // graft.multimodal.Multimodal with a stubbed codec; this query
    // checks the binary schema path end to end.
    "q64_binary_meta" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("text"))
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          md5(col("text")).as("digest"))
        .orderBy(col("doc_id"))))

  val oracleSql: Map[String, String] = Map(
    "q60_token_stats" ->
      s"""SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
          CAST(len(list_distinct(toks)) AS INT) AS n_uniq,
          round(list_sum(list_transform(toks, t -> len(t)))::DOUBLE /
            greatest(len(toks), 1)::DOUBLE, 6) AS avg_tok_len
          FROM ($SqlToks) ORDER BY doc_id""",
    "q74_regex_tokens" ->
      s"""SELECT doc_id,
          CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS INT) AS n_pieces,
          CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))) AS INT) AS n_uniq_pieces
          FROM $DocsPq ORDER BY doc_id""",
    "q61_lang_id" -> {
      val scoreExprs = langs.map { case (l, ms) =>
        s"len(list_filter(toks, t -> t IN ${sqlMarkers(ms)})) AS s_$l"
      }.mkString(", ")
      val caseArms = langs.map { case (l, _) =>
        s"WHEN s_$l = gm AND gm > 0 THEN '$l'"
      }.mkString(" ")
      s"""WITH sc AS (SELECT doc_id, $scoreExprs FROM ($SqlToks)),
          g AS (SELECT *, greatest(${langs.map("s_" + _._1).mkString(", ")}) AS gm FROM sc)
          SELECT doc_id, CASE $caseArms ELSE 'und' END AS lang_pred FROM g ORDER BY doc_id"""
    },
    "q62_quality" ->
      s"WITH $sqlQualityCtes SELECT doc_id, quality FROM qual ORDER BY doc_id",
    "q63_fingerprint" ->
      s"""SELECT doc_id, md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fp
          FROM $DocsPq ORDER BY doc_id""",
    "q64_binary_meta" ->
      s"""SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, md5(text) AS digest
          FROM $DocsPq ORDER BY doc_id""",
    "q75_winnow_fingerprint" ->
      s"""WITH tk AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk FROM $DocsPq),
          hs AS (SELECT doc_id,
              list(((('0x' || substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]), 1, 8))::BIGINT) % 2147483647) ORDER BY i) AS hs
            FROM tk, unnest(generate_series(1, len(tk) - 2)) AS u(i) GROUP BY doc_id),
          win AS (SELECT doc_id,
              CASE WHEN len(hs) >= 4
                THEN list_sort(list_distinct(list_transform(generate_series(1, len(hs) - 3), i -> list_min(hs[i:i+3]))))
                ELSE list_sort(list_distinct(hs)) END AS fps
            FROM hs)
          SELECT doc_id, array_to_string(fps, ',') AS fp_set, CAST(len(fps) AS INT) AS n_fp
          FROM win ORDER BY doc_id""")
}
