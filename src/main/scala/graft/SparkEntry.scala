package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5-shaped multi-way join + aggregate (Q7). */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_join_multi")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Declared.queries ++ graft.queries.LlmQueries.queries ++
      graft.queries.StreamQueries.queries ++ graft.queries.FormatQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Declared.oracleSql ++ graft.queries.LlmQueries.oracleSql ++
      graft.queries.StreamQueries.oracleSql ++ graft.queries.FormatQueries.oracleSql
}
