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

  // --- Misra-Gries sketch guarantees under ARBITRARY merge trees ---
  // (functions/MisraGries.scala, the q_heavy_hitters kernel): for any
  // stream, any partitioning of it, and any k, the merged sketch must
  // (1) never overcount, (2) undercount by at most n/(k+1), and
  // (3) retain every item with true frequency > n/(k+1). This is the
  // mergeable-summaries contract Spark's partial/final aggregation
  // relies on — randomized far beyond the fixture's one skew shape.
  private val streamGen: Gen[(List[Int], Int, Int)] = for {
    n <- Gen.choose(1, 400)
    // small alphabet → real heavy hitters; big → tail-only streams
    alpha <- Gen.choose(2, 40)
    xs <- Gen.listOfN(n, Gen.choose(0, alpha - 1))
    k <- Gen.choose(2, 12)
    cuts <- Gen.choose(1, 6)
  } yield (xs, k, cuts)

  property("Misra-Gries merged sketch honors both error guarantees") =
    forAll(streamGen) { case (xs, k, cuts) =>
      import graft.functions.MisraGries
      val items = xs.map(_.toString)
      // partition the stream into `cuts` chunks, sketch each like a
      // partition-local partial, then merge left-to-right
      val chunkSize = math.max(1, items.length / cuts)
      val partials = items.grouped(chunkSize).toList
        .map(_.foldLeft(Map.empty[String, Long])((m, x) =>
          MisraGries.reduce(m, x, k)))
      val merged = partials.reduce((a, b) => MisraGries.merge(a, b, k))
      val exact = items.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val bound = items.length.toLong / (k + 1)
      val noOver = merged.forall { case (x, est) => est <= exact(x) }
      val bounded = merged.forall { case (x, est) => exact(x) - est <= bound }
      val complete = exact.filter(_._2 > bound).keySet.subsetOf(merged.keySet)
      noOver && bounded && complete && merged.size <= k
    }
}
