package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column value conversions, the reference's dumperAuxFuncs.py
  * re-expressed as codegen'd Column transforms (no UDFs — every rule
  * is a Catalyst expression tree, so it runs inside whole-stage
  * codegen and distributes with the scan).
  *
  * Dispatch mirrors rules/mysql_raw_dump.json: by mapped type
  * (boolean->convertStrBoolean, bytea->makeItEmpty, TIME->makeItTime),
  * by fullType (datetime/date -> zero-date fixes), by reference
  * presence (refToNullable).
  */
object ValueRules {

  /** dumperAuxFuncs.convertStrBoolean: None/0/'0' -> false, any other
    * int-ish value -> true. */
  def convertStrBoolean(c: Column): Column =
    when(c.isNull, lit(false))
      .otherwise(coalesce(c.cast(IntegerType), lit(1)) =!= 0)

  /** dumperAuxFuncs.defaultDate/notNullableDate: zero-dates
    * ('0000-...') and NULL -> NULL when nullable else '1900-01-01'.
    * Operates on the string form, as the reference does (it disables
    * pymysql date decoding precisely to see the raw '0000-00-00'). */
  def notNullableDate(c: Column, nullable: Boolean): Column = {
    val isZero = c.isNull || substring(c, 1, 4) === "0000"
    if (nullable) when(isZero, lit(null).cast(StringType)).otherwise(c)
    else when(isZero, lit("1900-01-01")).otherwise(c)
  }

  /** Same semantics for datetimes (dumperAuxFuncs.notNullableDatetime;
    * the reference returns the bare '1900-01-01' default here too). */
  def notNullableDatetime(c: Column, nullable: Boolean): Column =
    notNullableDate(c, nullable)

  /** dumperAuxFuncs.refToNullable: FK value 0 -> NULL when the column
    * is nullable (MySQL uses 0 where PG wants NULL for "no parent"). */
  def refToNullable(c: Column, nullable: Boolean): Column =
    if (nullable) nullif(c, lit(0)) else c

  /** dumperAuxFuncs.makeItEmpty: bytea payloads are not migrated —
    * NULL when nullable, empty otherwise. */
  def makeItEmpty(c: Column, nullable: Boolean): Column =
    if (nullable) lit(null).cast(StringType) else lit("")

  /** dumperAuxFuncs.makeItTime: keep values matching dd:dd, else NULL
    * or '00:00'. */
  def makeItTime(c: Column, nullable: Boolean): Column = {
    val valid = c.isNotNull && c.rlike("^\\d\\d:\\d\\d")
    if (nullable) when(valid, c).otherwise(lit(null).cast(StringType))
    else when(valid, c).otherwise(lit("00:00"))
  }

  /** PsqlParser._supaFilta: render a cell for the PG \copy CSV dump —
    * NULL literal for nulls, true/false for booleans, single-quoted
    * with '' escaping for strings. */
  def pgEscapeString(c: Column): Column =
    when(c.isNull, lit("NULL"))
      .otherwise(concat(lit("'"), regexp_replace(c, "'", "''"), lit("'")))

  def pgEscapeBoolean(c: Column): Column =
    when(c.isNull, lit("NULL")).otherwise(when(c, "true").otherwise("false"))

  /** The rules/mysql_raw_dump.json dispatch
    * (PsqlParser._get_table_raw_dump_rules): pick each column's value
    * conversion from its post-rules schema attributes — mapped type
    * (boolean/bytea/time), declared fullType (datetime/date on string
    * payloads), FK reference presence — and apply them as one
    * projection over the extracted frame. */
  def applyRawDump(df: org.apache.spark.sql.DataFrame,
      td: graft.schema.TableDef): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val byName = td.liveColumns.map(c => c.name -> c).toMap
    val cols = df.columns.toSeq.map { name =>
      byName.get(name) match {
        case None => col(name)
        case Some(cd) =>
          val base = col(name)
          val converted = cd.dataType match {
            case "boolean" => convertStrBoolean(base)
            case "bytea" => makeItEmpty(base, cd.nullable)
            case "time" | "TIME" => makeItTime(base, cd.nullable)
            case _ if cd.fullType.startsWith("datetime") &&
              df.schema(name).dataType == StringType =>
              notNullableDatetime(base, cd.nullable)
            case _ if cd.fullType.startsWith("date") &&
              df.schema(name).dataType == StringType =>
              notNullableDate(base, cd.nullable)
            case _ if cd.reference.isDefined => refToNullable(base, cd.nullable)
            case _ => base
          }
          converted.as(name)
      }
    }
    df.select(cols: _*)
  }
}
