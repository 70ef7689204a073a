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
    * left to right; at each position attempt each alternative in
    * declaration order (single-pattern calls pass one); an attempt
    * consumes, per step, the maximal run of its direction CAPPED at
    * the step's upper bound, checks the minimum, and finally
    * evaluates every DEFINE predicate on the consumed segments; on
    * success emit the consumed segments and resume at the declared
    * skip point (past the last CONSUMED row — mid-run when a bounded
    * last step capped — or the first row of step j for SKIP TO
    * FIRST); on failure advance ONE ROW (which is what makes
    * non-suffix-monotone DEFINEs land on mid-run starts the compiler
    * must rescue). Every equality the compiler's scaladoc argues —
    * aligned starts dominate mid-run starts, the W skip emits every
    * aligned quadruple, the HS aggregate-fold greedy selection, the
    * define rescue offsets, the bounded suffix/prefix consumption,
    * the alternation preference — is FALSIFIABLE here. */
  private type NfaStep = (Int, Int, Option[Int]) // dir, min, max
  private def rowNfaAlt(series: Seq[(Date, Long)],
      alts: Seq[(Seq[NfaStep], Seq[IndexedSeq[Run] => Boolean])],
      skipToStep: Option[Int]): Seq[(Int, IndexedSeq[Run])] = {
    val rows = series.sliding(2).filter(_.size == 2).map {
      case Seq((_, pv), (d, v)) => (d, v, pv, java.lang.Long.compare(v, pv))
    }.toIndexedSeq
    def attempt(steps: Seq[NfaStep],
        defines: Seq[IndexedSeq[Run] => Boolean], at: Int)
        : Option[(IndexedSeq[(Int, Run)], Int)] = {
      var pos = at
      val segs = scala.collection.mutable.ArrayBuffer[(Int, Run)]()
      for ((dir, minRun, maxRun) <- steps) {
        val start = pos
        val cap = maxRun.map(m => start.toLong + m).getOrElse(Long.MaxValue)
        while (pos < rows.length && pos < cap && rows(pos)._4 == dir) pos += 1
        if (pos - start < minRun) return None
        segs += start -> Run(dir, rows(start)._1, rows(pos - 1)._1,
          pos - start, rows(start)._3, rows(pos - 1)._2)
      }
      val runs = segs.map(_._2).toIndexedSeq
      if (defines.forall(_(runs))) Some((segs.toIndexedSeq, pos)) else None
    }
    val out = scala.collection.mutable.Buffer[(Int, IndexedSeq[Run])]()
    var i = 0
    while (i < rows.length) {
      alts.zipWithIndex.iterator
        .map { case ((st, df), ai) => attempt(st, df, i).map(r => (ai, r)) }
        .collectFirst { case Some(x) => x } match {
        case Some((ai, (segs, end))) =>
          out += ai -> segs.map(_._2).toIndexedSeq
          i = skipToStep match {
            case Some(j) => segs(j)._1 // FIRST row of step j's segment
            case None => end
          }
        case None => i += 1
      }
    }
    out.toSeq
  }

  private def rowNfa(series: Seq[(Date, Long)], steps: Seq[NfaStep],
      skipToStep: Option[Int],
      defines: Seq[IndexedSeq[Run] => Boolean] = Nil): Seq[IndexedSeq[Run]] =
    rowNfaAlt(series, Seq((steps, defines)), skipToStep).map(_._2)

  private val vSteps: Seq[NfaStep] = Seq((-1, MatchRecognize.minRun, None),
    (1, MatchRecognize.minRun, None))
  private def wSteps(m: Int, n: Int): Seq[NfaStep] =
    Seq((-1, m, None), (1, n, None), (-1, m, None), (1, n, None))
  private val hsSteps: Seq[NfaStep] =
    Seq((-1, 2, None), (1, 1, None), (-1, 1, None), (1, 2, None))
  private val quantSteps: Seq[NfaStep] =
    Seq((-1, 2, Some(3)), (1, 1, Some(2)))
  private val defineVSteps: Seq[NfaStep] = Seq((-1, 2, None), (1, 2, None))
  /** The q_match_define DEFINEs, mirrored row-side: fall ≥5% of its
    * local peak; rebound recovers ≥ half the measured fall. */
  private val defineDefs: Seq[IndexedSeq[Run] => Boolean] = Seq(
    r => (r(0).startPrevV - r(0).endV) * 20 >= r(0).startPrevV,
    r => (r(1).endV - r(0).endV) * 2 >= r(0).startPrevV - r(0).endV)
  private val altNfa: Seq[(Seq[NfaStep], Seq[IndexedSeq[Run] => Boolean])] =
    Seq((Seq((-1, 3, None), (1, 3, None)), Nil),
      (Seq((-1, 5, None), (1, 1, None)), Nil))

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

  private def collectV(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("q_match_recognize equals the row-automaton replay per series") {
    val got = collectV(MatchRecognize.qMatchRecognize(spark, sf))
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

  test("q_match_define equals the automaton with DEFINE predicates per series") {
    val got = collectV(MatchRecognize.qMatchDefine(spark, sf))
    val expected = dailySeries().map { case (grp, pts) =>
      grp -> rowNfa(pts, defineVSteps, None, defineDefs).map(vTuple).toSet
    }
    assert(got.values.map(_.size).sum > 0,
      "fixture must produce DEFINE matches")
    expected.foreach { case (grp, exp) =>
      assert(got.getOrElse(grp, Set.empty) == exp, s"series $grp diverged")
    }
    // the DEFINEs hold on every emitted match (depth ≥5% of the
    // implied peak; recovery ≥ half depth) — peak reconstructed from
    // depth + trough value is not in the output, so check the exact
    // integer forms the declaration uses via depth/recovery alone
    got.values.flatten.foreach { case (_, _, _, dn, un, depth, rec) =>
      assert(dn >= 2 && un >= 2)
      assert(depth > 0 && rec * 2 >= depth,
        "UP define must hold on every match")
    }
  }

  test("the DEFINE rescue lands on the automaton's mid-run start (non-suffix-monotone define)") {
    // deterministic shape where the ALIGNED start fails the UP define
    // (fall too deep for the rebound) but a mid-run start passes:
    // run-aligned emission would wrongly drop the match entirely
    import spark.implicits._
    val base = Date.valueOf("2022-01-01")
    def day(i: Int): Date = new Date(base.getTime + i * 86400000L)
    val vals = Seq(10000L, 9000L, 5000L, 4000L, 3900L, 4600L, 5300L)
    val pts = vals.zipWithIndex.map { case (v, i) => (day(i), v) }
    val df = pts.map(p => ("g", p._1, p._2)).toDF("grp", "day", "v")
    val exp = rowNfa(pts, defineVSteps, None, defineDefs).map(vTuple).toSet
    // aligned depth = 10000−3900 = 6100 but recovery = 1400·2 < 6100 →
    // the automaton's first success is the SUFFIX start at day 3
    // (depth 5000−3900 = 1100, 2·1400 ≥ 1100)
    assert(exp == Set((day(3), day(4), day(6), 2L, 2L, 1100L, 1400L)),
      "NFA fixture sanity: the match starts mid-run at day 3")
    val got = MatchRecognize.compilePattern(df, MatchRecognize.definePattern)
      .collect().map(r => (r.getDate(1), r.getDate(2), r.getDate(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == exp, "compiler must rescue the mid-run start exactly")
  }

  test("q_match_quant equals the automaton with bounded quantifiers per series") {
    val got = collectV(MatchRecognize.qMatchQuant(spark, sf))
    val expected = dailySeries().map { case (grp, pts) =>
      grp -> rowNfa(pts, quantSteps, None).map(vTuple).toSet
    }
    assert(got.values.map(_.size).sum > 0,
      "fixture must produce bounded-quantifier matches")
    expected.foreach { case (grp, exp) =>
      assert(got.getOrElse(grp, Set.empty) == exp, s"series $grp diverged")
    }
    // {m,n} invariants: consumed lengths inside the declared bounds
    got.values.flatten.foreach { case (d0, dt, d1, dn, un, depth, rec) =>
      assert(dn >= 2 && dn <= 3, s"down_len $dn outside {2,3}")
      assert(un >= 1 && un <= 2, s"up_len $un outside {1,2}")
      assert(depth > 0 && rec > 0)
      assert(!d0.after(dt) && dt.before(d1))
    }
  }

  test("bounded consumption caps both ends: suffix start and mid-run end") {
    // one long fall (5 rows) into one long rebound (4 rows): the
    // bounded first step must consume the fall's last 3 rows only
    // (start day 3) and the bounded last step the rebound's first 2
    import spark.implicits._
    val base = Date.valueOf("2022-03-01")
    def day(i: Int): Date = new Date(base.getTime + i * 86400000L)
    val vals = Seq(9000L, 8000L, 7000L, 6000L, 5000L, 4000L,
      4500L, 5000L, 5500L, 6000L)
    val pts = vals.zipWithIndex.map { case (v, i) => (day(i), v) }
    val df = pts.map(p => ("g", p._1, p._2)).toDF("grp", "day", "v")
    val exp = rowNfa(pts, quantSteps, None).map(vTuple).toSet
    assert(exp == Set((day(3), day(5), day(7), 3L, 2L, 3000L, 1000L)),
      "NFA fixture sanity: suffix start at day 3, prefix end at day 7")
    val got = MatchRecognize.compilePattern(df, MatchRecognize.quantPattern)
      .collect().map(r => (r.getDate(1), r.getDate(2), r.getDate(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == exp)
  }

  test("q_match_alt equals the alternation automaton (declaration-order preference)") {
    val got = MatchRecognize.qMatchAlt(spark, sf).collect()
      .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getString(8))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val labels = Seq("deep_v", "cliff")
    val expected = dailySeries().map { case (grp, pts) =>
      grp -> rowNfaAlt(pts, altNfa, None).map { case (ai, r) =>
        val t = vTuple(r)
        (t._1, t._2, t._3, t._4, t._5, t._6, t._7, labels(ai))
      }.toSet
    }
    assert(got.values.map(_.size).sum > 0, "fixture must produce alt matches")
    expected.foreach { case (grp, exp) =>
      assert(got.getOrElse(grp, Set.empty) == exp, s"series $grp diverged")
    }
    // preference: any start that satisfies BOTH alternatives
    // (down_len ≥ 5 and up_len ≥ 3) must classify as the first one
    got.values.flatten.foreach { case (_, _, _, dn, un, _, _, cls) =>
      if (dn >= 5 && un >= 3) assert(cls == "deep_v",
        "overlapping starts must take the first alternative")
      assert(cls == "deep_v" || cls == "cliff")
      if (cls == "deep_v") assert(dn >= 3 && un >= 3)
      else assert(dn >= 5 && un >= 1)
    }
  }

  test("alternation overlap: both branches fire, and a both-match start classifies first") {
    // deterministic series with all three regions: A-only (fall 3,
    // rebound 3), B-only (fall 5, rebound 1 then flat), and overlap
    // (fall 5, rebound 3) — the overlap start must classify deep_v
    import spark.implicits._
    val base = Date.valueOf("2022-06-01")
    def day(i: Int): Date = new Date(base.getTime + i * 86400000L)
    def walk(start: Long, deltas: Seq[Long]): Seq[Long] =
      deltas.scanLeft(start)(_ + _)
    val deltas =
      Seq(-10L, -10, -10, 5, 5, 5) ++ // A-only V
        Seq(0L) ++ // flat separator
        Seq(-10L, -10, -10, -10, -10, 7, 0) ++ // B-only cliff
        Seq(-10L, -10, -10, -10, -10, 6, 6, 6) // overlap → deep_v
    val vals = walk(10000L, deltas)
    val pts = vals.zipWithIndex.map { case (v, i) => (day(i), v) }
    val df = pts.map(p => ("g", p._1, p._2)).toDF("grp", "day", "v")
    val exp = rowNfaAlt(pts, altNfa, None).map { case (ai, r) =>
      (Seq("deep_v", "cliff")(ai), r(0).n, r(1).n)
    }
    assert(exp.map(_._1).toSet == Set("deep_v", "cliff"),
      "fixture sanity: both alternatives must fire")
    assert(exp.exists { case (cls, dn, un) => cls == "deep_v" && dn >= 5 },
      "fixture sanity: an overlap start must classify deep_v")
    val got = MatchRecognize
      .compileAlternation(df, MatchRecognize.altPatterns)
      .collect().map(r => (r.getString(8), r.getLong(4), r.getLong(5))).toSeq
    assert(got.sortBy(_._2) == exp.map(t => (t._1, t._2.toLong, t._3.toLong))
      .sortBy(_._2))
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
        val exp = rowNfa(pts, Seq((1, 3, None), (-1, 2, None)), None).map(r =>
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
        val exp = rowNfa(pts,
          Seq((1, 1, None), (-1, 1, None), (1, 1, None)), None).map(r =>
          (r(0).d0, r(2).d1,
            (r(0).n + r(1).n + r(2).n).toLong)).toSet
        assert(gotZig.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g: greedy zigzag diverged from the NFA")
      }
    }
  }

  test("never-shipped BOUNDED and DEFINE declarations equal the NFA on adversarial series") {
    // bounds and defines as pure declarations, on shapes no key
    // ships: an interior-bounded 3-step greedy pattern (bounds + the
    // aggregate-fold selection composing), a bounded-FIRST 2-step
    // pattern (suffix alignment alone), and an inline DEFINE with a
    // different non-suffix-monotone predicate (recovery*3 ≥ depth)
    import spark.implicits._
    import MatchRecognize.{PatternSpec, RunStep, SkipPastLastRow}
    val interior = PatternSpec(
      steps = Seq(RunStep(1, 1), RunStep(-1, 1, Some(2)), RunStep(1, 1)),
      skip = SkipPastLastRow,
      measures = Seq(
        "start_day" -> (s => s.d0(0)),
        "end_day" -> (s => s.d1(2)),
        "dip_len" -> (s => s.n(1))))
    val boundedFirst = PatternSpec(
      steps = Seq(RunStep(-1, 1, Some(2)), RunStep(1, 1)),
      skip = SkipPastLastRow,
      measures = Seq(
        "start_day" -> (s => s.d0(0)),
        "end_day" -> (s => s.d1(1)),
        "down_len" -> (s => s.n(0)),
        "depth" -> (s => s.startPrevV(0) - s.endV(0))))
    val inlineDefine = PatternSpec(
      steps = Seq(RunStep(-1, 1), RunStep(1, 1)),
      skip = SkipPastLastRow,
      measures = Seq(
        "start_day" -> (s => s.d0(0)),
        "end_day" -> (s => s.d1(1)),
        "depth" -> (s => s.startPrevV(0) - s.endV(0)),
        "rec" -> (s => s.endV(1) - s.endV(0))),
      defines = Seq(
        s => (s.endV(1) - s.endV(0)) * 3 >= s.startPrevV(0) - s.endV(0)))
    val inlineDefineDefs: Seq[IndexedSeq[Run] => Boolean] = Seq(
      r => (r(1).endV - r(0).endV) * 3 >= r(0).startPrevV - r(0).endV)
    val rnd = new scala.util.Random(23)
    val base = Date.valueOf("2023-01-01")
    def day(i: Int): Date = new Date(base.getTime + i * 86400000L)
    (1 to 6).foreach { trial =>
      val series = (0 until 3).map { g =>
        val n = 4 + rnd.nextInt(40)
        var v = 1000L
        s"g$g" -> (0 until n).map { i =>
          v += (rnd.nextInt(5) match {
            case 0 => 0
            case 1 => rnd.nextInt(6).toLong + 1
            case 2 => -(rnd.nextInt(6).toLong + 1)
            case 3 => if (i % 8 < 5) -3L else 2L // long falls
            case _ => if (i % 6 < 4) 4L else -1L // long rises
          })
          (day(i), v)
        }
      }
      val df = series.flatMap { case (g, pts) =>
        pts.map(p => (g, p._1, p._2))
      }.toDF("grp", "day", "v")
      val gotInterior = MatchRecognize.compilePattern(df, interior).collect()
        .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getLong(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = rowNfa(pts,
          Seq((1, 1, None), (-1, 1, Some(2)), (1, 1, None)), None)
          .map(r => (r(0).d0, r(2).d1, r(1).n.toLong)).toSet
        assert(gotInterior.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g: interior-bounded greedy diverged")
      }
      val gotBf = MatchRecognize.compilePattern(df, boundedFirst).collect()
        .map(r => (r.getString(0),
          (r.getDate(1), r.getDate(2), r.getLong(3), r.getLong(4))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = rowNfa(pts, Seq((-1, 1, Some(2)), (1, 1, None)), None)
          .map(r => (r(0).d0, r(1).d1, r(0).n.toLong,
            r(0).startPrevV - r(0).endV)).toSet
        assert(gotBf.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g: bounded-first diverged")
      }
      val gotDef = MatchRecognize.compilePattern(df, inlineDefine).collect()
        .map(r => (r.getString(0),
          (r.getDate(1), r.getDate(2), r.getLong(3), r.getLong(4))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = rowNfa(pts, Seq((-1, 1, None), (1, 1, None)), None,
          inlineDefineDefs)
          .map(r => (r(0).d0, r(1).d1, r(0).startPrevV - r(0).endV,
            r(1).endV - r(0).endV)).toSet
        assert(gotDef.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g: inline define diverged")
      }
    }
  }

  test("randomized series: all compilations equal the row NFA on " +
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
      // and through the HS compilation: the per-group aggregate-fold
      // greedy selection must equal the sequential row-level scan
      val gotHs = MatchRecognize.hsRuns(df).collect().map(quadOf)
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = rowNfa(pts, hsSteps, None).map(quadTuple).toSet
        assert(gotHs.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g diverged from the HS row NFA")
      }
      // r14 compile paths on the same adversarial series: defines
      // (mid-run rescue), bounded quantifiers (both caps), alternation
      // (declaration-order preference)
      val gotDef = MatchRecognize
        .compilePattern(df, MatchRecognize.definePattern).collect()
        .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = rowNfa(pts, defineVSteps, None, defineDefs)
          .map(vTuple).toSet
        assert(gotDef.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g diverged from the DEFINE row NFA")
      }
      val gotQ = MatchRecognize
        .compilePattern(df, MatchRecognize.quantPattern).collect()
        .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = rowNfa(pts, quantSteps, None).map(vTuple).toSet
        assert(gotQ.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g diverged from the bounded row NFA")
      }
      val gotAlt = MatchRecognize
        .compileAlternation(df, MatchRecognize.altPatterns).collect()
        .map(r => (r.getString(0), (r.getDate(1), r.getDate(2), r.getDate(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getString(8))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      series.foreach { case (g, pts) =>
        val exp = rowNfaAlt(pts, altNfa, None).map { case (ai, r) =>
          val t = vTuple(r)
          (t._1, t._2, t._3, t._4, t._5, t._6, t._7,
            Seq("deep_v", "cliff")(ai))
        }.toSet
        assert(gotAlt.getOrElse(g, Set.empty) == exp,
          s"trial $trial series $g diverged from the alternation row NFA")
      }
    }
  }
}
