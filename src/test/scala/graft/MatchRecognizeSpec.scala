package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.MatchRecognize

class MatchRecognizeSpec extends AnyFunSuite {
  import TestSpark._

  /** Row-automaton replay of PATTERN (DOWN{3,} UP{3,}) over one
    * ordered series: walk the rows once, tracking maximal runs, and
    * emit every (down-run, up-run) adjacency meeting the quantifiers
    * — the semantics the set-based compilation must equal. */
  private def nfaMatches(series: Seq[(Date, Long)])
      : Seq[(Date, Date, Date, Long, Long, Long, Long)] =
    runsOf(series).sliding(2).collect {
      case Seq(a, b) if a.dir == -1 && b.dir == 1 &&
          a.n >= MatchRecognize.minRun && b.n >= MatchRecognize.minRun =>
        (a.d0, a.d1, b.d1, a.n.toLong, b.n.toLong,
          a.startPrevV - a.endV, b.endV - a.endV)
    }.toSeq

  /** Maximal-run decomposition of one ordered series — the shared
    * front half of both replays. */
  private case class Run(dir: Int, d0: Date, d1: Date, n: Int,
    startPrevV: Long, endV: Long)
  private def runsOf(series: Seq[(Date, Long)]): Seq[Run] = {
    val runs = scala.collection.mutable.ArrayBuffer[Run]()
    series.sliding(2).filter(_.size == 2).foreach { case Seq((_, pv), (d, v)) =>
      val dir = java.lang.Long.compare(v, pv)
      if (runs.nonEmpty && runs.last.dir == dir) {
        val l = runs.last
        runs(runs.size - 1) = l.copy(d1 = d, n = l.n + 1, endV = v)
      } else runs += Run(dir, d, d, 1, pv, v)
    }
    runs.toSeq
  }

  /** Row-automaton replay of PATTERN (D1 U1 D2 U2) with quantifiers
    * {m,}/{n,} and AFTER MATCH SKIP TO FIRST D2 — the greedy scan
    * with that skip rule emits exactly every aligned run quadruple
    * (see wRuns scaladoc for why mid-run starts can never add or
    * shadow a match), so the replay is sliding(4) over maximal runs.
    * Overlap is REQUIRED behavior here: consecutive W's share their
    * middle V. */
  private def wNfaMatches(series: Seq[(Date, Long)], m: Int, n: Int)
      : Seq[(Date, Date, Date, Date, Date, Long, Long, Long, Long, Long, Long, Long)] =
    runsOf(series).sliding(4).collect {
      case Seq(a, b, c, d) if a.dir == -1 && b.dir == 1 &&
          c.dir == -1 && d.dir == 1 &&
          a.n >= m && b.n >= n && c.n >= m && d.n >= n =>
        (a.d0, a.d1, b.d1, c.d1, d.d1,
          a.n.toLong, b.n.toLong, c.n.toLong, d.n.toLong,
          a.startPrevV - a.endV, b.endV - c.endV, d.endV - c.endV)
    }.toSeq

  test("q_match_recognize equals the row-automaton replay per series") {
    val got = MatchRecognize.qMatchRecognize(spark, sf).collect()
      .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // rebuild every daily series driver-side, exact cents
    val daily = Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderpriority").as("grp"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr(
        "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)")).as("v"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (grp, rows) =>
      grp -> nfaMatches(rows.sortBy(_._2.getTime).map(t => (t._2, t._3)).toSeq)
        .toSet
    }
    assert(got.values.map(_.size).sum > 0, "fixture must produce matches")
    expected.foreach { case (grp, exp) =>
      assert(got.getOrElse(grp, Set.empty) == exp, s"series $grp diverged")
    }
    // pattern invariants: strict quantifiers, positive drawdown and
    // recovery, trough strictly inside the match
    got.values.flatten.foreach { case (d0, dt, d1, dn, un, depth, rec) =>
      assert(dn >= 3 && un >= 3)
      assert(depth > 0 && rec > 0)
      assert(!d0.after(dt) && dt.before(d1))
    }
    // matches never overlap within a series (maximal runs can't)
    got.foreach { case (_, ms) =>
      val sorted = ms.toSeq.sortBy(_._1.getTime)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3.getTime <= b._1.getTime,
          "overlapping matches")
        case _ =>
      }
    }
  }

  test("q_match_w equals the overlap-permitting automaton replay per series") {
    val m = MatchRecognize.wMinRun
    val got = MatchRecognize.qMatchW(spark, sf).collect()
      .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
        r.getDate(4), r.getDate(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9), r.getLong(10), r.getLong(11), r.getLong(12))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val daily = Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderpriority").as("grp"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr(
        "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)")).as("v"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (grp, rows) =>
      grp -> wNfaMatches(
        rows.sortBy(_._2.getTime).map(t => (t._2, t._3)).toSeq, m, m).toSet
    }
    assert(got.values.map(_.size).sum > 0, "fixture must produce W matches")
    expected.foreach { case (grp, exp) =>
      assert(got.getOrElse(grp, Set.empty) == exp, s"series $grp diverged")
    }
    // W invariants: quantifiers, both drawdowns and the final
    // recovery strictly positive, day boundaries strictly ordered
    got.values.flatten.foreach {
      case (d0, t1, mid, t2, d1, dn1, un1, dn2, un2, dep1, dep2, rec) =>
        assert(dn1 >= m && un1 >= m && dn2 >= m && un2 >= m)
        assert(dep1 > 0 && dep2 > 0 && rec > 0)
        assert(!d0.after(t1) && t1.before(mid) && mid.before(t2) &&
          t2.before(d1))
    }
    // the skip rule's signature: where quadruples chain, matches
    // OVERLAP (consecutive matches share their middle V) — assert at
    // least structural consistency: any two matches in a series
    // either are disjoint or overlap exactly at a shared run boundary
    // (start of one == a day within the other), never identical
    got.foreach { case (_, ms) =>
      val starts = ms.toSeq.map(_._1.getTime)
      assert(starts.distinct.size == starts.size,
        "aligned quadruples must have distinct starts")
    }
  }

  test("randomized series: the compilation equals the NFA replay on " +
    "adversarial shapes (flats, saw-tooths, singletons, long runs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = Date.valueOf("2020-01-01")
    def day(i: Int): Date = new Date(base.getTime + i * 86400000L)
    (1 to 8).foreach { trial =>
      // mixed generators: pure random walks produce few flats or long
      // runs, so bias half the steps toward repeats and monotone runs
      val series = (0 until 4).map { g =>
        val n = 2 + rnd.nextInt(40)
        var v = 1000L
        s"g$g" -> (0 until n).map { i =>
          v += (rnd.nextInt(4) match {
            case 0 => 0 // flat step: dir = 0 must break runs
            case 1 => rnd.nextInt(5).toLong + 1
            case 2 => -(rnd.nextInt(5).toLong + 1)
            case _ => if (i % 7 < 4) 3L else -3L // long-ish runs
          })
          (day(i), v)
        }
      }
      val df = series.flatMap { case (g, pts) =>
        pts.map(p => (g, p._1, p._2))
      }.toDF("grp", "day", "v")
      val got = graft.operators.MatchRecognize.matchRuns(df).collect()
        .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = nfaMatches(pts).toSet
        assert(got.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g diverged from the NFA replay")
      }
      // same adversarial series through the W compilation, at tight
      // quantifiers ({2,}) so quadruples actually occur in 40 steps
      val gotW = graft.operators.MatchRecognize.wRuns(df, 2, 2).collect()
        .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
          r.getDate(4), r.getDate(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getLong(9), r.getLong(10), r.getLong(11),
          r.getLong(12))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = wNfaMatches(pts, 2, 2).toSet
        assert(gotW.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g diverged from the W replay")
      }
    }
  }
}
