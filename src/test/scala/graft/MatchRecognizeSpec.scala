package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.MatchRecognize

class MatchRecognizeSpec extends AnyFunSuite {
  import TestSpark._

  /** One consumed step segment of a match: its direction, first/last
    * day, row count, the value just before its first row, and the
    * value at its last row. */
  private case class Run(dir: Int, d0: Date, d1: Date, n: Int,
    startPrevV: Long, endV: Long)

  /** GENUINE row-level greedy automaton — MATCH_RECOGNIZE semantics
    * implemented directly on rows, NOT on the maximal-run
    * decomposition the SQL compiles to (r12 ADVICE: a replay built on
    * the same decomposition embeds, rather than tests, the claim that
    * run-aligned emission equals the automaton). Scan row positions
    * left to right; at each position attempt the declared pattern
    * greedily (each step consumes the MAXIMAL run of its direction —
    * adjacent steps alternate direction, so greedy needs no
    * backtracking); on success emit the consumed segments and resume
    * at the declared skip point (past the last row, or the first row
    * of step j for SKIP TO FIRST); on failure advance one row. Every
    * equality the compiler's scaladoc argues — aligned starts
    * dominate mid-run starts, the W skip emits every aligned
    * quadruple, the HS greedy orbit — is FALSIFIABLE here. */
  private def rowNfa(series: Seq[(Date, Long)], steps: Seq[(Int, Int)],
      skipToStep: Option[Int]): Seq[IndexedSeq[Run]] = {
    val rows = series.sliding(2).filter(_.size == 2).map {
      case Seq((_, pv), (d, v)) => (d, v, pv, java.lang.Long.compare(v, pv))
    }.toIndexedSeq
    val out = scala.collection.mutable.Buffer[IndexedSeq[Run]]()
    var i = 0
    while (i < rows.length) {
      var pos = i
      var ok = true
      val segs = scala.collection.mutable.ArrayBuffer[(Int, Run)]()
      for ((dir, minRun) <- steps if ok) {
        val start = pos
        while (pos < rows.length && rows(pos)._4 == dir) pos += 1
        if (pos - start < minRun) ok = false
        else segs += start -> Run(dir, rows(start)._1, rows(pos - 1)._1,
          pos - start, rows(start)._3, rows(pos - 1)._2)
      }
      if (ok) {
        out += segs.map(_._2).toIndexedSeq
        i = skipToStep match {
          case Some(j) => segs(j)._1 // FIRST row of step j's segment
          case None => pos // past the match's last row
        }
      } else i += 1
    }
    out.toSeq
  }

  private val vSteps = Seq(-1 -> MatchRecognize.minRun,
    1 -> MatchRecognize.minRun)
  private def wSteps(m: Int, n: Int) = Seq(-1 -> m, 1 -> n, -1 -> m, 1 -> n)
  private val hsSteps = Seq(-1 -> 2, 1 -> 1, -1 -> 1, 1 -> 2)

  /** Measure tuples matching the declared patterns' outputs. */
  private def vTuple(r: IndexedSeq[Run]) =
    (r(0).d0, r(0).d1, r(1).d1, r(0).n.toLong, r(1).n.toLong,
      r(0).startPrevV - r(0).endV, r(1).endV - r(0).endV)
  private def quadTuple(r: IndexedSeq[Run]) =
    (r(0).d0, r(0).d1, r(1).d1, r(2).d1, r(3).d1,
      r(0).n.toLong, r(1).n.toLong, r(2).n.toLong, r(3).n.toLong,
      r(0).startPrevV - r(0).endV, r(1).endV - r(2).endV,
      r(3).endV - r(2).endV)

  private def dailySeries(): Map[String, Seq[(Date, Long)]] =
    Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderpriority").as("grp"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr(
        "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)")).as("v"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.getTime).map(t => (t._2, t._3)).toSeq).toMap

  test("q_match_recognize equals the row-automaton replay per series") {
    val got = MatchRecognize.qMatchRecognize(spark, sf).collect()
      .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = dailySeries().map { case (grp, pts) =>
      grp -> rowNfa(pts, vSteps, None).map(vTuple).toSet
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
    val expected = dailySeries().map { case (grp, pts) =>
      grp -> rowNfa(pts, wSteps(m, m), Some(2)).map(quadTuple).toSet
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
    got.foreach { case (_, ms) =>
      val starts = ms.toSeq.map(_._1.getTime)
      assert(starts.distinct.size == starts.size,
        "aligned quadruples must have distinct starts")
    }
  }

  test("q_match_hs equals the greedy SKIP PAST LAST ROW automaton per series") {
    val got = MatchRecognize.qMatchHs(spark, sf).collect()
      .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
        r.getDate(4), r.getDate(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9), r.getLong(10), r.getLong(11), r.getLong(12))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = dailySeries().map { case (grp, pts) =>
      grp -> rowNfa(pts, hsSteps, None).map(quadTuple).toSet
    }
    assert(got.values.map(_.size).sum > 0, "fixture must produce HS matches")
    expected.foreach { case (grp, exp) =>
      assert(got.getOrElse(grp, Set.empty) == exp, s"series $grp diverged")
    }
    // the skip rule's signature, dual to W's: matches NEVER overlap —
    // each match's last day strictly precedes the next match's start
    // (greedy thinning did real work: without it aligned candidates
    // two runs apart would both emit)
    got.foreach { case (_, ms) =>
      ms.toSeq.sortBy(_._1.getTime).sliding(2).foreach {
        case Seq(a, b) => assert(a._5.getTime <= b._1.getTime,
          "SKIP PAST LAST ROW must forbid overlapping matches")
        case _ =>
      }
    }
    // quantifier asymmetry: the short middle steps really admit
    // 1-length runs somewhere on the fixture (else the key degenerates
    // to the W shape and tests nothing new)
    assert(got.values.flatten.exists(t => t._7 == 1 || t._8 == 1),
      "fixture should exercise the {1,} quantifiers")
  }

  test("a NEVER-SHIPPED pattern declared inline compiles correctly (new pattern = pure data)") {
    // the compiler's core claim: adding a pattern is a declaration,
    // not code. Declare a blow-off-top (UP{3,} DOWN{2,} with SKIP
    // PAST LAST ROW — starts RISING, unlike every shipped key, so
    // this also exercises the dir=+1-first compile path) plus a
    // 3-step greedy pattern (UP{1,} DOWN{1,} UP{1,}, odd k with
    // conflicts possible at offset 2), and check both against the
    // independent row NFA on randomized adversarial series
    import spark.implicits._
    import MatchRecognize.{PatternSpec, RunStep, SkipPastLastRow}
    val top = PatternSpec(
      steps = Seq(RunStep(1, 3), RunStep(-1, 2)),
      skip = SkipPastLastRow,
      measures = Seq(
        "start_day" -> (s => s.d0(0)),
        "peak_day" -> (s => s.d1(0)),
        "end_day" -> (s => s.d1(1)),
        "runup_cents" -> (s => s.endV(0) - s.startPrevV(0)),
        "crack_cents" -> (s => s.endV(0) - s.endV(1))))
    val zig = PatternSpec(
      steps = Seq(RunStep(1, 1), RunStep(-1, 1), RunStep(1, 1)),
      skip = SkipPastLastRow,
      measures = Seq(
        "start_day" -> (s => s.d0(0)),
        "end_day" -> (s => s.d1(2)),
        "len" -> (s => s.n(0) + s.n(1) + s.n(2))))
    assert(!MatchRecognize.conflictsPossible(top.steps))
    assert(MatchRecognize.conflictsPossible(zig.steps))
    val rnd = new scala.util.Random(7)
    val base = Date.valueOf("2021-01-01")
    def day(i: Int): Date = new Date(base.getTime + i * 86400000L)
    (1 to 4).foreach { trial =>
      val series = (0 until 3).map { g =>
        val n = 5 + rnd.nextInt(40)
        var v = 1000L
        s"g$g" -> (0 until n).map { i =>
          v += (rnd.nextInt(4) match {
            case 0 => 0
            case 1 => rnd.nextInt(5).toLong + 1
            case 2 => -(rnd.nextInt(5).toLong + 1)
            case _ => if (i % 9 < 5) 2L else -2L
          })
          (day(i), v)
        }
      }
      val df = series.flatMap { case (g, pts) =>
        pts.map(p => (g, p._1, p._2))
      }.toDF("grp", "day", "v")
      val gotTop = MatchRecognize.compilePattern(df, top).collect()
        .map(r => (r.getString(0), (r.getDate(1), r.getDate(2),
          r.getDate(3), r.getLong(4), r.getLong(5))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = rowNfa(pts, Seq(1 -> 3, -1 -> 2), None).map(r =>
          (r(0).d0, r(0).d1, r(1).d1,
            r(0).endV - r(0).startPrevV, r(0).endV - r(1).endV)).toSet
        assert(gotTop.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g: blow-off-top diverged from the NFA")
      }
      val gotZig = MatchRecognize.compilePattern(df, zig).collect()
        .map(r => (r.getString(0), (r.getDate(1), r.getDate(2),
          r.getLong(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = rowNfa(pts, Seq(1 -> 1, -1 -> 1, 1 -> 1), None).map(r =>
          (r(0).d0, r(2).d1,
            (r(0).n + r(1).n + r(2).n).toLong)).toSet
        assert(gotZig.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g: greedy zigzag diverged from the NFA")
      }
    }
  }

  test("randomized series: all three compilations equal the row NFA on " +
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
      val got = MatchRecognize.matchRuns(df).collect()
        .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = rowNfa(pts, vSteps, None).map(vTuple).toSet
        assert(got.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g diverged from the V row NFA")
      }
      def quadOf(r: org.apache.spark.sql.Row) =
        (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
          r.getDate(4), r.getDate(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getLong(9), r.getLong(10), r.getLong(11),
          r.getLong(12)))
      // same adversarial series through the W compilation, at tight
      // quantifiers ({2,}) so quadruples actually occur in 40 steps —
      // the SKIP TO FIRST D2 equivalence claim is now checked against
      // the independent row-level automaton
      val gotW = MatchRecognize.wRuns(df, 2, 2).collect().map(quadOf)
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = rowNfa(pts, wSteps(2, 2), Some(2)).map(quadTuple).toSet
        assert(gotW.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g diverged from the W row NFA")
      }
      // and through the HS compilation: the pointer-doubling greedy
      // orbit must equal the sequential row-level greedy scan
      val gotHs = MatchRecognize.hsRuns(df).collect().map(quadOf)
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = rowNfa(pts, hsSteps, None).map(quadTuple).toSet
        assert(gotHs.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g diverged from the HS row NFA")
      }
    }
  }
}
