package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.rules._
import graft.schema._
import graft.sources.PgCopyWriter
import graft.sqlgen.PgSqlGen

/** End-to-end migration orchestration — the reference's main.py flow
  * (introspect → rules → pre-SQL → extract → convert → artifacts)
  * over Spark. Where the reference forks a multiprocessing pool per
  * database (/root/reference/main.py:124-189), here each table is an
  * independent lazy plan and Spark schedules all partitions across
  * the cluster; the driver-side loop only submits jobs.
  */
object Pipeline {

  /** Output sink for extracted tables: the reference's PG \copy CSV
    * dialect, or a partitioned parquet lake (the modern migration
    * target — partition columns become directory pruning keys for
    * every downstream scan). */
  sealed trait Sink
  case object PgCsv extends Sink
  case class ParquetLake(partitionBy: Map[String, Seq[String]] = Map.empty)
      extends Sink

  case class TableResult(originalName: String, outputName: String,
      rows: Long, ddl: String, copySql: String)

  case class MigrationResult(tables: Seq[TableResult],
      schemaSql: String, constraintsSql: String, viewsSql: String)

  /** The per-table extract+convert plan migrate dumps: rules-driven
    * extraction (where/joins/renames/casts) followed by the raw-dump
    * value conversions. Factored out so the etl_pipeline_dump oracle
    * key can compare the dump bytes against EXACTLY the frame that
    * rendered them — any drift between this plan and what migrate
    * writes would be a correctness bug, so they share the code. */
  def convertedFrame(spark: SparkSession, sfDir: String, table: String,
      changes: SchemaChanges,
      node: NodeRules = NodeRules.mysqlToPg,
      skipPreSql: Boolean = false): DataFrame = {
    val src = Tables.load(spark, sfDir, table)
    val orig = Introspect.fromSpark(src, table)
    val td = SchemaRules.applyTable(orig, changes)
      .map(SchemaRules.applyNode(_, node))
      .getOrElse(throw new IllegalArgumentException(
        s"table $table is skipped by the change-set"))
    val extracted = Projector.extract(src, orig, changes.forTable(table),
      t => Tables.load(spark, sfDir, t), Some(node), skipPreSql)
    ValueRules.applyRawDump(extracted, td)
  }

  /** Migrate a set of parquet-backed tables: apply schema rules,
    * extract per rules (where/joins/renames/casts), write PG-dialect
    * CSV dumps, and emit the full DDL bundle (create tables + FKs +
    * indexes + setvals + v1-compat views). */
  def migrate(spark: SparkSession, sfDir: String, outDir: String,
      tables: Seq[String], changes: SchemaChanges,
      node: NodeRules = NodeRules.mysqlToPg,
      pks: Map[String, Seq[String]] = Map.empty,
      skipPreSql: Boolean = false,
      sink: Sink = PgCsv,
      indexes: Map[String, Seq[IndexDef]] = Map.empty): MigrationResult = {

    val originals = tables.map { t =>
      Introspect.fromSpark(Tables.load(spark, sfDir, t), t,
        pk = pks.getOrElse(t, Nil), indexes = indexes.getOrElse(t, Nil))
    }
    val changed = SchemaRules(originals, changes, node)
    val changedByOriginal = originals.flatMap { o =>
      SchemaRules.applyTable(o, changes).map(SchemaRules.applyNode(_, node))
        .map(o -> _)
    }

    // the reference forks a multiprocessing pool per table
    // (main.py:124-189); here each table's write is an independent
    // Spark job submitted concurrently — partitions of all tables
    // interleave across the cluster, so small tables don't serialize
    // behind big ones
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    // the pool MUST be shut down before returning: its threads are
    // non-daemon, and a leaked pool keeps the whole JVM alive after
    // main() returns (a hung Verify/Bench process, found the hard way)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(1, changedByOriginal.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results = try {
      val futures = changedByOriginal.map { case (orig, td) => Future {
        // extraction + per-column raw-dump value conversions
        // (boolean/bytea/time/zero-date/FK-zero), as the reference does
        // between extraction and CSV rendering
        val converted = convertedFrame(spark, sfDir, orig.name, changes,
          node, skipPreSql)
        val outPath = s"$outDir/${td.name}"
        val rows = sink match {
          case PgCsv =>
            PgCopyWriter.write(converted, outPath)
            // count the frame, not the dump's lines: a string cell with
            // an embedded newline is one row but two file lines
            converted.count()
          case ParquetLake(partitionBy) =>
            val w = converted.write.mode("overwrite")
            partitionBy.get(orig.name).filter(_.nonEmpty)
              .fold(w)(cols => w.partitionBy(cols: _*))
              .parquet(outPath)
            spark.read.parquet(outPath).count()
        }
        TableResult(orig.name, td.name,
          rows = rows,
          ddl = PgSqlGen.dropTable(td) + "\n" + PgSqlGen.createTable(td),
          copySql = PgSqlGen.copyStatement(td, outPath))
      } }
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()

    val constraints = changed.map(td =>
      PgSqlGen.setval(td) + PgSqlGen.foreignKeys(td) + PgSqlGen.indexes(td))
      .mkString("\n")
    val views = changedByOriginal.map { case (orig, td) =>
      PgSqlGen.compatView(orig, td, "v1", "public")
    }.mkString("\n")

    MigrationResult(results,
      schemaSql = PgSqlGen.schemaPreamble("public") +
        results.map(_.ddl).mkString("\n\n"),
      constraintsSql = constraints,
      viewsSql = views)
  }

  /** The `all-databases` analog (main.py:168-189): migrate several
    * source directories ("databases") concurrently, optionally
    * filtered by a name prefix, each into its own output dir. */
  def migrateAll(spark: SparkSession, dbDirs: Map[String, String],
      outRoot: String, tables: Seq[String], changes: SchemaChanges,
      prefix: String = "",
      pks: Map[String, Seq[String]] = Map.empty): Map[String, MigrationResult] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val selected = dbDirs.filter { case (db, _) => db.startsWith(prefix) }
    // non-daemon pool: shut down before returning (see migrate)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(4, math.max(1, selected.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = selected.toSeq.map { case (db, dir) =>
        Future(db -> migrate(spark, dir, s"$outRoot/$db", tables, changes,
          pks = pks))
      }
      Await.result(Future.sequence(futures), Duration.Inf).toMap
    } finally pool.shutdown()
  }

  /** Write the reference's per-database artifact bundle
    * (main.py:52-112: mysql_schema.json, mysql_schema_v2.json,
    * psql_schema.json, psql_tables.sql, psql_data.sql,
    * psql_index_fk.sql, psql_views.sql) alongside the per-table CSV
    * dumps migrate() already produced under `outDir`. The three
    * schema JSONs are distinct stages, as in main.py:54-69:
    * raw introspection → user changes applied (still mysql types) →
    * node type-map applied (PG types). */
  def writeArtifacts(spark: SparkSession, sfDir: String, outDir: String,
      tables: Seq[String], changes: SchemaChanges,
      result: MigrationResult,
      node: NodeRules = NodeRules.mysqlToPg,
      pks: Map[String, Seq[String]] = Map.empty,
      indexes: Map[String, Seq[IndexDef]] = Map.empty): Unit = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    def write(name: String, content: String): Unit =
      Files.writeString(dir.resolve(name), content)
    val originals = tables.map(t =>
      Introspect.fromSpark(Tables.load(spark, sfDir, t), t,
        pk = pks.getOrElse(t, Nil), indexes = indexes.getOrElse(t, Nil)))
    // v2 = user changes only (mysql-flavoured types, RuleHandler
    // .obtain_modified_schema); psql = v2 + the mysql_to_psql node map
    // (PsqlParser.get_schema_from_mysql:38-41)
    val v2 = originals.flatMap(SchemaRules.applyTable(_, changes))
    val psql = v2.map(SchemaRules.applyNode(_, node))
    write("mysql_schema.json", PgSqlGen.schemaJson(originals))
    write("mysql_schema_v2.json", PgSqlGen.schemaJson(v2))
    write("psql_schema.json", PgSqlGen.schemaJson(psql))
    write("psql_tables.sql", result.schemaSql)
    write("psql_data.sql",
      PgSqlGen.dumpInitial +
        result.tables.map(_.copySql).mkString("\n") + "\n" +
        PgSqlGen.dumpFinal)
    write("psql_index_fk.sql",
      "SET client_min_messages TO ERROR;\nSET SCHEMA 'public';\n\n" +
        result.constraintsSql)
    write("psql_views.sql",
      "SET client_min_messages TO ERROR;\n" +
        "DROP SCHEMA IF EXISTS v1 CASCADE;\nCREATE SCHEMA IF NOT EXISTS v1;\n\n" +
        result.viewsSql)
  }

  /** Distributed twin of the reference's file-level mysqldump INSERT
    * conversion (PsqlParser.generate_dump_from_mysql_dump:73-100):
    * read a dump, rewrite each INSERT line per the change-set (value
    * fixes, table/column renames, skip-table filtering), write the PG
    * dump. One narrow map over a text scan — at 100 TB of dump files
    * every partition converts independently. */
  def convertMysqlDump(spark: SparkSession, changes: SchemaChanges,
      dumpPath: String, outPath: String): Long = {
    import spark.implicits._
    val converted = spark.read.textFile(dumpPath)
      .flatMap(line => PgSqlGen.convertInsert(changes, line))
    converted.write.mode("overwrite").text(outPath)
    spark.read.textFile(outPath).count()
  }
}
