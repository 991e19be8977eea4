package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query packs (each file maps SURVEY.md §2 rows to oracle-checked
  * queries):
  *  - [[CoreQueries]]    — scans, row-level ops, aggregations (§2.1-2.3)
  *  - [[JoinQueries]]    — equi/semi/anti/full/cross/theta joins (§2.4)
  *  - [[SortSetQueries]] — sort/top-k/set ops/utilities/windows (§2.5-2.6, §2.9)
  *  - [[DedupQueries]]   — exact/MinHash/SimHash/Jaccard dedup + ANN
  *  - [[TextQueries]]    — token stats, lang-ID, quality, fingerprints
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q01_agg_lineitem")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ JoinQueries.queries ++ SortSetQueries.queries ++
      DedupQueries.queries ++ TextQueries.queries ++ AnalyticsQueries.queries ++
      CurationQueries.queries ++ ScaleQueries.queries ++ FeatureQueries.queries ++ QualityQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (non-SQL-expressible ops)
    * get the driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ JoinQueries.oracleSql ++ SortSetQueries.oracleSql ++
      DedupQueries.oracleSql ++ TextQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      CurationQueries.oracleSql ++ ScaleQueries.oracleSql ++ FeatureQueries.oracleSql ++ QualityQueries.oracleSql
}
