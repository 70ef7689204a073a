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

  // pure model of etl_reshard_plan's placement: the exact PolyHash
  // fold over "shard|id", squared mod p, packed with the shard id
  private def hrwWinner(id: Long, shards: Range): Int = {
    val p = 1000000007L
    def h(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c) % p)
    (shards.map { sh =>
      val hh = h(s"$sh|$id")
      (hh * hh % p) * 16 + sh
    }.max % 16).toInt
  }

  property("rendezvous placement: growing the shard set only moves docs TO the new shard") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1000000L)),
      Gen.choose(2, 12)) { (ids, k) =>
      ids.forall { id =>
        val before = hrwWinner(id, 0 until k)
        val after = hrwWinner(id, 0 until (k + 1))
        // the HRW law: adding a candidate never reshuffles among the
        // old ones — a doc keeps its winner unless the NEW shard wins
        after == before || after == k
      }
    }

  private val waveRows: Gen[List[(Int, Int, Long)]] =
    Gen.nonEmptyListOf(for {
      key <- Gen.choose(0, 5)
      wave <- Gen.choose(0, 3)
      v <- Gen.choose(0L, 1000L)
    } yield (key, wave, v))

  property("stream_mv_maintain's wave-partial merge: any delivery order + redelivery = one-shot aggregate") =
    forAll(waveRows, Gen.choose(0L, 999L)) { (rows, seed) =>
      type P = (Long, Long, Long, Long) // sum, cnt, min, max
      def partials(ws: List[(Int, Int, Long)]): Map[(Int, Int), P] =
        ws.groupBy(r => (r._1, r._2)).map { case (kw, g) =>
          kw -> ((g.map(_._3).sum, g.length.toLong,
            g.map(_._3).min, g.map(_._3).max))
        }
      // a wave's partial rows are a pure function of the wave's data,
      // so redelivery re-derives IDENTICAL rows and the (key, wave)
      // struct-max dedupe is an overwrite — model merge as map union
      val waves = rows.groupBy(_._2).values.toList
      val rnd = new scala.util.Random(seed)
      val delivery = rnd.shuffle(waves ++ waves.take(1 + (seed % 2).toInt))
      val store = delivery.foldLeft(Map.empty[(Int, Int), P])(
        (st, w) => st ++ partials(w))
      val rollup = store.groupBy(_._1._1).map { case (k, g) =>
        val ps = g.values
        k -> ((ps.map(_._1).sum, ps.map(_._2).sum,
          ps.map(_._3).min, ps.map(_._4).max))
      }
      val direct = rows.groupBy(_._1).map { case (k, g) =>
        k -> ((g.map(_._3).sum, g.length.toLong,
          g.map(_._3).min, g.map(_._3).max))
      }
      rollup == direct
    }
}
