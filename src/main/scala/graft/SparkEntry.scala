package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All query registries, concatenated. Later registries may not reuse
    * names — enforced by the RegistrySpec test.
    */
  def allQueries: Seq[QueryDef] =
    queries_registry

  private def queries_registry: Seq[QueryDef] =
    graft.queries.Relational.queries ++
      graft.queries.Relational2.queries ++
      graft.queries.Relational3.queries ++
      graft.queries.Relational4.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Events.queries ++
      graft.queries.Ext2.queries ++
      graft.queries.Ext3.queries ++
      graft.queries.Ext4.queries ++
      graft.queries.Ext5.queries ++
      graft.queries.Ext6.queries ++
      graft.queries.Ext7.queries ++
      graft.queries.Ext8.queries ++
      graft.queries.Ext9.queries ++
      graft.queries.Curation.queries ++
      graft.queries.Framework.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "q03_revenue_per_nation").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
