package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5StarJoin(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Etl.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimOps.queries ++ MultimodalOps.queries ++
      AsOfJoin.queries ++ RangeJoin.queries ++ ScaleJoins.queries ++
      CorpusPipeline.queries ++ graft.streaming.StreamOps.queries ++
      StatsOps.queries ++ AnalyticsOps.queries ++ SeriesOps.queries ++
      SketchOps.queries ++ MatchRecognize.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Etl.oracles ++ TextOps.oracles ++
      DedupOps.oracles ++ SimOps.oracles ++ AsOfJoin.oracles ++
      RangeJoin.oracles ++ ScaleJoins.oracles ++ CorpusPipeline.oracles ++
      graft.streaming.StreamOps.oracles ++ MultimodalOps.oracles ++
      StatsOps.oracles ++ AnalyticsOps.oracles ++ SeriesOps.oracles ++
      SketchOps.oracles ++ MatchRecognize.oracles
}
