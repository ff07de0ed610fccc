package graft

import graft.queries.{AnalyticsQueries, CdcQueries, EmbQueries, EngineE2EQueries, QueryDef, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked surface: batch analogs of every
  * reference dataflow operator (cdc_...), relational analytics (q...),
  * text-pipeline operators (doc_..., mm_...), and similarity search
  * (emb_...). The streaming CDC engine itself
  * (graft.streaming.CdcEngine) is exercised by the ScalaTest suite;
  * its per-key merge, quorum and checkpoint semantics are what the
  * cdc_ queries express in oracle-checkable form.
  */
object SparkEntry {

  val defs: Seq[QueryDef] =
    CdcQueries.all ++ AnalyticsQueries.all ++ TextQueries.all ++
      EmbQueries.all ++ EngineE2EQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_regional_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
