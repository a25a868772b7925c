package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory gate: one entry per implemented
  * operator from SURVEY.md §2 (+ the north-star extensions). Each entry
  * with an `oracleSql` twin is hash-compared against DuckDB by the
  * driver; entries without one get a rows-only check.
  */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference's full EP2 pipeline — index → row-groups → template →
    * enrichment via mapPartitions → assembly → order restore. */
  def entry(spark: SparkSession): DataFrame =
    queries("q14_pipeline")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Reference.queries ++
      graft.queries.TextQueries.queries ++ graft.queries.HashDedupQueries.queries ++
      graft.queries.EmbeddingQueries.queries ++ graft.queries.EventQueries.queries ++
      graft.queries.MiscQueries.queries ++ graft.queries.ExtraQueries.queries ++
      graft.queries.CorpusQueries.queries ++ graft.queries.MoreRelational.queries ++
      graft.queries.ScaleQueries.queries ++ graft.queries.StatsQueries.queries ++
      graft.queries.CurationQueries.queries ++ graft.queries.LayoutQueries.queries ++
      graft.queries.SketchQueries.queries ++ graft.queries.AnalyticsQueries.queries ++
      graft.queries.MiningQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.Reference.oracle ++
      graft.queries.TextQueries.oracle ++ graft.queries.HashDedupQueries.oracle ++
      graft.queries.EmbeddingQueries.oracle ++ graft.queries.EventQueries.oracle ++
      graft.queries.MiscQueries.oracle ++ graft.queries.ExtraQueries.oracle ++
      graft.queries.CorpusQueries.oracle ++ graft.queries.MoreRelational.oracle ++
      graft.queries.ScaleQueries.oracle ++ graft.queries.StatsQueries.oracle ++
      graft.queries.CurationQueries.oracle ++ graft.queries.LayoutQueries.oracle ++
      graft.queries.SketchQueries.oracle ++ graft.queries.AnalyticsQueries.oracle ++
      graft.queries.MiningQueries.oracle
}
