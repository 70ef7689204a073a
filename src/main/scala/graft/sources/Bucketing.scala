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
      bucketCol: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // managed-table files survive a previous JVM while the in-memory
    // catalog does not — a stale location blocks CREATE, so clear both
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
