package graft.rules

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema._

/** The Spark-side "extract" step: turns a source DataFrame plus its
  * TableChange into the projected/filtered/joined frame the reference
  * builds as a SELECT per table
  * (/root/reference/libs/MysqlParser.py:104-137: SELECT live columns,
  * optional INNER `_JOIN_`s, optional `_WHERE_`).
  *
  * Declarative on purpose: renames are aliases, `_WHERE_` is a SQL
  * string handed to Catalyst (so filters reach the parquet scan as
  * PushedFilters), `_JOIN_`s are inner joins that only keep the base
  * table's columns (join-as-filter, exactly the reference semantics).
  */
object Projector {

  /** Project a table per its change-set: skip columns, rename the
    * rest, optionally cast to rule-mapped types. */
  def project(df: DataFrame, original: TableDef, ch: TableChange,
      node: Option[NodeRules] = None): DataFrame = {
    val projected = original.columns.filterNot { c =>
      c.skip || ch.columns.get(c.name).exists(_.skip)
    }.map { c =>
      val cc = ch.columns.get(c.name)
      val outName = cc.flatMap(_.rename).getOrElse(c.name)
      val mapped = cc.flatMap(_.dataType)
        .orElse(node.map(n => n.mapType(c).dataType).filter(_ != c.dataType))
      mapped match {
        case Some(t) => col(c.name).cast(Introspect.sparkType(t)).as(outName)
        case None => col(c.name).as(outName)
      }
    }
    df.select(projected: _*)
  }

  /** Full extract: pre-SQL ops (orphan drops, UTC shift) + joins (as
    * filters) + where + projection. `loadTable` resolves a `_JOIN_`/
    * orphan rule's target table to a DataFrame. */
  def extract(df: DataFrame, original: TableDef, ch: TableChange,
      loadTable: String => DataFrame,
      node: Option[NodeRules] = None,
      skipPreSql: Boolean = false): DataFrame = {
    val preApplied =
      if (skipPreSql) df
      else {
        val orphansDropped = ch.dropOrphans.foldLeft(df) { (acc, o) =>
          dropFkOrphans(acc, o.fkCol, loadTable(o.parentTable), o.parentKey)
        }
        ch.utcShiftHours.fold(orphansDropped)(h =>
          utcShift(orphansDropped, original, h))
      }
    val joined = ch.joins.foldLeft(preApplied) { (acc, j) =>
      // INNER JOIN <table> ON (base.col = joined.col_ref); only base
      // columns survive (MysqlParser.py:113-124 selects t.* only).
      val right = loadTable(j.table).select(col(j.colRef).as(s"__ref_${j.colRef}"))
      acc.join(right, acc(j.col) === col(s"__ref_${j.colRef}"), "inner")
        .drop(s"__ref_${j.colRef}")
    }
    val filtered = ch.where.map(w => joined.filter(expr(w))).getOrElse(joined)
    project(filtered, original, ch, node)
  }

  /** Pre-SQL orphan delete re-expressed: the reference issues
    * `DELETE FROM child WHERE fk NOT IN (SELECT pk FROM parent)`
    * (rules/schema_changes.json `_PRE_SQL_`); in Spark the surviving
    * frame is a left_semi join and the deleted rows a left_anti. */
  def dropFkOrphans(child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.join(parent.select(col(pk)), child(fk) === col(pk), "left_semi")

  def fkOrphans(child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.join(parent.select(col(pk)), child(fk) === col(pk), "left_anti")

  /** UTC shift pre-SQL: `SET ts = ts - INTERVAL 2 HOUR WHERE ts IS NOT
    * NULL` over every datetime/timestamp column
    * (MysqlParser.py:88-92). NULLs pass through untouched (the
    * arithmetic is NULL-safe, matching the WHERE guard). */
  def utcShift(df: DataFrame, original: TableDef, hours: Int = 2): DataFrame =
    original.columns.filter(c =>
      c.dataType == "datetime" || c.dataType == "timestamp")
      .foldLeft(df) { (acc, c) =>
        acc.withColumn(c.name, col(c.name) - expr(s"INTERVAL $hours HOURS"))
      }
}
