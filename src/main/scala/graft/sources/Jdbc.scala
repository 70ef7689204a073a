package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink configuration — the reference's pymysql full-table
  * cursor scan (/root/reference/libs/MysqlParser.py:104-137) becomes a
  * range-partitioned parallel read; psycopg2 \copy becomes
  * DataFrameWriter.jdbc with rewriteBatchedStatements.
  *
  * No database runs in this container, so connectivity is exercised
  * through the option-building layer (unit-tested) while the read/
  * write calls are thin one-liners over Spark's built-in JDBC source.
  */
object Jdbc {

  case class ConnInfo(url: String, user: String, password: String,
      driver: String = "org.postgresql.Driver")

  /** Partitioned-scan options: `numPartitions` concurrent range reads
    * over the PK, derived from its min/max stats — each executor
    * fetches an even PK slice instead of one cursor streaming the
    * whole table through the driver. */
  def partitionedReadOptions(conn: ConnInfo, table: String,
      pkColumn: String, pkMin: Long, pkMax: Long,
      numPartitions: Int): Map[String, String] = Map(
    "url" -> conn.url,
    "user" -> conn.user,
    "password" -> conn.password,
    "driver" -> conn.driver,
    "dbtable" -> table,
    "partitionColumn" -> pkColumn,
    "lowerBound" -> pkMin.toString,
    "upperBound" -> (pkMax + 1).toString,
    "numPartitions" -> numPartitions.toString,
    "fetchsize" -> "10000")

  /** Where Spark's stride-based ranges don't fit (string/composite
    * PKs), explicit per-partition predicates: mod-ranges over a hash
    * so every row lands in exactly one partition. */
  def hashPredicates(pkColumn: String, numPartitions: Int): Array[String] =
    (0 until numPartitions).map(i =>
      s"mod(abs(crc32($pkColumn)), $numPartitions) = $i").toArray

  def read(spark: SparkSession, conn: ConnInfo, table: String,
      pkColumn: String, pkMin: Long, pkMax: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .options(partitionedReadOptions(conn, table, pkColumn, pkMin, pkMax,
        numPartitions))
      .load()

  /** Batched parallel insert: each partition opens one connection and
    * writes `batchsize` rows per round trip. */
  def writeOptions(conn: ConnInfo, table: String): Map[String, String] = Map(
    "url" -> conn.url,
    "user" -> conn.user,
    "password" -> conn.password,
    "driver" -> conn.driver,
    "dbtable" -> table,
    "batchsize" -> "10000",
    "isolationLevel" -> "READ_COMMITTED")

  def write(df: DataFrame, conn: ConnInfo, table: String): Unit =
    df.write.format("jdbc").options(writeOptions(conn, table))
      .mode(SaveMode.Append).save()
}
