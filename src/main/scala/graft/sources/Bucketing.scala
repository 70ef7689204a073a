package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle a fact table once at write
  * time so every subsequent join/aggregation on the bucket key runs
  * exchange-free. At 100 TB this converts the recurring O(data)
  * shuffle of lineitem⨝orders into a one-time layout cost — the
  * canonical co-located join strategy when the same key joins repeat
  * (as every per-table extract in a migration pipeline does).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String,
      bucketCol: String, numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
