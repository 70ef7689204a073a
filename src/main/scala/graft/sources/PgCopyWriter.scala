package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.TableDef

/** PG `\copy`-compatible CSV dump of a DataFrame — the distributed
  * twin of the reference's per-row CSV writer
  * (/root/reference/libs/PsqlParser.py:135-146 plus _supaFilta):
  * FORMAT CSV, QUOTE '', DELIMITER ',', NULL 'NULL', booleans as
  * true/false.
  *
  * Spark's csv sink renders each partition in parallel — the
  * reference's single cursor loop becomes N writers; the \copy
  * statement (PgSqlGen.copyStatement) can then point at the whole
  * output directory since psql \copy accepts a program/cat glob.
  */
object PgCopyWriter {

  /** Pre-render columns the way _supaFilta does where the CSV layer
    * can't (booleans -> true/false literals; everything else is
    * handled by csv options). */
  def normalized(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case BooleanType =>
          when(col(f.name).isNull, lit(null).cast(StringType))
            .otherwise(when(col(f.name), "true").otherwise("false")).as(f.name)
        case TimestampType =>
          date_format(col(f.name), "yyyy-MM-dd HH:mm:ss").as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  def write(df: DataFrame, path: String): Unit =
    normalized(df).write
      .mode("overwrite")
      .option("quote", "'")
      .option("escape", "'") // '' doubling, the QUOTE '''' dialect
      .option("nullValue", "NULL")
      .option("delimiter", ",")
      .option("emptyValue", "''")
      .csv(path)
}
