package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's oracle surface: one entry per implemented
  * operator family from SURVEY.md §2 (see each module's `covers` field for
  * the exact operator IDs). `oracleSql` carries the DuckDB-equivalent SQL;
  * entries absent there are declared stochastic / not SQL-expressible and get
  * the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary (scan → filter → hash agg). */
  def entry(spark: SparkSession): DataFrame =
    QueryDef.all.find(_.name == "q13_pricing_summary").get
      .build(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryDef.all.flatMap(q => q.oracle.map(sql => q.name -> normalize(sql))).toMap

  /** Collapse the triple-quoted indentation to a single line of SQL.
    * `--` comment lines are dropped first — collapsing would otherwise
    * swallow the rest of the statement into the comment. */
  private def normalize(sql: String): String =
    sql.trim.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("--"))
      .mkString(" ")
}
