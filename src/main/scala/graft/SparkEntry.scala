package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's query surface is assembled from per-module catalogs
  * (graft.queries.*); each [[QueryDef]] carries the Spark plan and, when
  * SQL-expressible, the DuckDB oracle the driver hash-compares against.
  */
object SparkEntry {

  /** Full catalog (order: reference surface → relational breadth →
    * pipeline extensions). */
  def catalog: Seq[QueryDef] =
    graft.queries.Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline queries for Bench (sf0.1): excludes driver-loop /
    * correctness-only exemplars. */
  def benchQueries: Seq[String] = catalog.filter(_.bench).map(_.name)
}
