package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.rules.{NodeRules, SchemaRules}
import graft.schema.{ColumnDef, TableDef}
import graft.sqlgen.PgSqlGen

/** Property-based checks over the pure (driver-side) layers. */
object GraftProps extends Properties("graft") {

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('\'', ' ', ',', '\\')))
      .map(_.mkString)

  property("escapeCell round-trips any string") = forAll(asciiText) { s =>
    val cell = PgSqlGen.escapeCell(s)
    val back = cell.stripPrefix("'").stripSuffix("'").replace("''", "'")
    cell.startsWith("'") && cell.endsWith("'") && back == s
  }

  property("escapeCell cells never contain a bare quote") =
    forAll(asciiText) { s =>
      val inner = PgSqlGen.escapeCell(s).stripPrefix("'").stripSuffix("'")
      // every quote in the payload is doubled
      !inner.replace("''", "").contains("'")
    }

  property("fixInsertLine is idempotent") = forAll(asciiText) { s =>
    val once = PgSqlGen.fixInsertLine(s)
    PgSqlGen.fixInsertLine(once) == once
  }

  private val colGen: Gen[ColumnDef] = for {
    name <- Gen.identifier.map(_.take(10)).suchThat(_.nonEmpty)
    tpe <- Gen.oneOf("int", "tinyint", "varchar", "datetime", "double",
      "longtext", "blob", "mediumint", "enum")
    full <- Gen.oneOf(tpe, s"$tpe(1)", s"$tpe(11)")
    nullable <- Gen.oneOf(true, false)
    dflt <- Gen.oneOf(Gen.const(None), Gen.const(Some("CURRENT_TIMESTAMP")),
      Gen.const(Some("0")))
  } yield ColumnDef(name, tpe, nullable = nullable, default = dflt,
    fullType = full)

  private val tableGen: Gen[TableDef] = for {
    name <- Gen.identifier.map(_.take(10)).suchThat(_.nonEmpty)
    cols <- Gen.listOfN(5, colGen)
    engine <- Gen.oneOf("INNODB", "MyISAM")
  } yield TableDef(name, cols, engine = engine)

  property("node rules are idempotent (applying twice = once)") =
    forAll(tableGen) { td =>
      val once = SchemaRules.applyNode(td, NodeRules.mysqlToPg)
      SchemaRules.applyNode(once, NodeRules.mysqlToPg) == once
    }

  property("node rules never emit mysql-only types") =
    forAll(tableGen) { td =>
      val mapped = SchemaRules.applyNode(td, NodeRules.mysqlToPg)
      mapped.columns.forall(c =>
        !Set("datetime", "mediumint", "longtext", "blob", "enum")
          .contains(c.dataType)) &&
        mapped.engine != "MyISAM"
    }

  property("createTable quotes every live column exactly once") =
    forAll(tableGen) { td =>
      val sql = PgSqlGen.createTable(td)
      td.liveColumns.forall(c => sql.contains(s""""${c.name}""""))
    }
}
