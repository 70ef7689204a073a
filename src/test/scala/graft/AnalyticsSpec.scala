package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.AnalyticsOps

class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("q_bitmap_distinct equals exact countDistinct per group") {
    val got = AnalyticsOps.qBitmapDistinct(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3))).toMap
    val exact = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("u"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == exact,
      "bitmap popcount must equal exact COUNT(DISTINCT) on every group")
  }

  test("q_bitmap_distinct partials merge across segments without raw rows") {
    // the re-aggregation property the layout exists for: build hourly
    // bitmap partials for two disjoint hour ranges, bit_or-merge the
    // WORDS (never re-reading events), and land on the same distinct
    // count the whole-table query reports
    val ev = Tables.load(spark, sf, "events")
    def partial(pred: org.apache.spark.sql.Column) = ev.filter(pred)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("user_id div 60").as("bucket"),
        expr("shiftleft(1L, cast(user_id % 60 as int))").as("mask"))
      .groupBy("event_type", "day", "bucket")
      .agg(expr("bit_or(mask)").as("bm"))
    val merged = partial(hour(col("ts")) < 12)
      .union(partial(hour(col("ts")) >= 12))
      .groupBy("event_type", "day", "bucket")
      .agg(expr("bit_or(bm)").as("bm"))
      .groupBy("event_type", "day")
      .agg(expr("cast(sum(bit_count(bm)) as bigint)").as("n_users"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2))
      .toMap
    val whole = AnalyticsOps.qBitmapDistinct(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2))
      .toMap
    assert(merged == whole,
      "bit_or of segment partials must reproduce the whole-table count")
  }

  test("q_event_pattern counts match a driver-side regex replay") {
    val got = AnalyticsOps.qEventPattern(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.nonEmpty)
    // at least one user must actually convert, or the fixture isn't
    // exercising the pattern
    assert(got.values.exists(_._2 > 0), "no user matched the episode")
    val raw = Tables.load(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), substring(col("event_type"), 1, 1).as("c"))
      .collect()
      .groupBy(_.getLong(0))
    raw.foreach { case (uid, rows) =>
      val path = rows.sortBy(r => (r.getLong(1), r.getLong(2)))
        .map(_.getString(3)).mkString
      val conv = AnalyticsOps.convPattern.r.findAllIn(path).size.toLong
      val direct = "vp".r.findAllIn(path).size.toLong
      assert(got(uid) == ((path.length.toLong, conv, direct)),
        s"user $uid: got ${got(uid)}, replay (${path.length}, $conv, $direct)")
    }
  }

  test("q_skyline equals the brute-force dominance replay") {
    val got = AnalyticsOps.qSkyline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val all = Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def dominated(x: (Long, Int, Double)) = all.exists(y =>
      y._2 <= x._2 && y._3 >= x._3 && (y._2 < x._2 || y._3 > x._3))
    val expected = all.filterNot(dominated).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // the frontier must be strictly increasing in price as size grows
    val bySize = got.toSeq.sortBy(_._2)
    bySize.sliding(2).foreach {
      case Seq(a, b) if a._2 < b._2 =>
        assert(a._3 < b._3, s"frontier not strictly improving: $a vs $b")
      case _ => ()
    }
  }

  test("q_concurrency equals a driver-side global scanline replay") {
    val got = AnalyticsOps.qConcurrency(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("t"),
        col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the fixture must actually span multiple scanline buckets, or
    // the bucket decomposition isn't exercised
    val days = ev.map(_._2 / (86400L * 1000000L)).distinct
    assert(days.length > 1, "fixture spans a single scanline bucket")
    val replay = ev.groupBy(_._1).map { case (tpe, rows) =>
      val pts = rows.flatMap { case (_, t, id) =>
        Seq((t, 1L), (t + (id % 7 + 1) * 60000000L, -1L)) }
        .sortBy(identity)
      var cum = 0L; var peak = 0L; var peakAt = 0L
      pts.foreach { case (t, d) =>
        cum += d
        if (cum > peak) { peak = cum; peakAt = t }
      }
      tpe -> ((peak, peakAt))
    }
    assert(got == replay, s"got $got, replay $replay")
  }

  test("q_geo_join equals brute force, once per pair, across cell borders") {
    val got = AnalyticsOps.qGeoJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // each qualifying pair surfaces exactly once despite the 3x3 probe
    assert(got.length == got.distinct.length, "duplicate pairs emitted")
    def pt(k: Long, dx: Long, dy: Long) =
      ((k * 48271 + dx) % 1000, (k * 69621 + dy) % 1000)
    val cs = Tables.load(spark, sf, "customer").select("c_custkey")
      .collect().map(_.getLong(0)).map(k => k -> pt(k, 0, 0))
    val ss = Tables.load(spark, sf, "supplier").select("s_suppkey")
      .collect().map(_.getLong(0)).map(k => k -> pt(k, 7, 13))
    val expected = for {
      (c, (cx, cy)) <- cs
      (sid, (sx, sy)) <- ss
      if math.abs(cx - sx) <= 50 && math.abs(cy - sy) <= 50
    } yield (c, sid, math.max(math.abs(cx - sx), math.abs(cy - sy)))
    assert(got.toSet == expected.toSet)
    assert(got.nonEmpty)
    // the fixture must exercise cross-cell matches, or the neighbor
    // probe is untested
    val crossCell = expected.exists { case (c, sid, _) =>
      val (cx, cy) = cs.toMap.apply(c); val (sx, sy) = ss.toMap.apply(sid)
      cx / 50 != sx / 50 || cy / 50 != sy / 50
    }
    assert(crossCell, "no pair spans a cell border")
  }

  test("q_cum_distinct ends at the exact distinct total and is monotone") {
    val rows = AnalyticsOps.qCumDistinct(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val totals = Tables.load(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (tpe, seq) =>
      // cum is the running sum of news and ends at the distinct total
      seq.foldLeft(0L) { (acc, r) =>
        assert(r._4 == acc + r._3, s"$tpe ${r._2}: cum breaks")
        r._4
      }
      assert(seq.last._4 == totals(tpe), s"$tpe final cum != distinct total")
      // spot-check an interior day against a direct distinct-to-date
      val mid = seq(seq.length / 2)
      val direct = Tables.load(spark, sf, "events")
        .filter(col("event_type") === tpe &&
          to_date(col("ts")) <= lit(java.sql.Date.valueOf(mid._2)))
        .agg(countDistinct(col("user_id"))).head().getLong(0)
      assert(mid._4 == direct, s"$tpe ${mid._2}: cum != distinct-to-date")
    }
  }

  test("q_decay_score equals an exact driver-side replay and merges") {
    val got = AnalyticsOps.qDecayScore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val asof = ev.map(_._2).max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val replay = ev.groupBy(_._1).view.mapValues { rs =>
      val score = rs.map { case (_, d) =>
        val age = java.time.temporal.ChronoUnit.DAYS.between(d, asof)
        if (age <= 30) 1L << (30 - age).toInt else 0L
      }.sum
      (score, rs.length.toLong)
    }.toMap
    assert(got == replay)
    // decay is real: somebody's score must exceed their raw count
    // scaled by the oldest weight and fall below count * 2^30
    assert(got.values.exists { case (s, n) => s > 0 && s < n * (1L << 30) },
      "no user shows a mixed-age (actually decayed) score")
  }

  test("q_pareto_share is the minimal deterministic 80% covering prefix") {
    val got = AnalyticsOps.qParetoShare(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (-t._2, t._1))
    assert(got.nonEmpty)
    val all = Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"),
        expr("cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)")
          .as("c"))
      .groupBy("l_partkey").agg(sum(col("c")).as("rev")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(t => (-t._2, t._1))
    val total = all.map(_._2).sum
    // replay: walk the ranked list, include while cum_before < 80%
    var cum = 0L
    val expected = all.takeWhile { case (_, rev) =>
      val in = 5 * cum < 4 * total; cum += rev; in
    }
    assert(got.map(t => (t._1, t._2)).toSeq == expected.toSeq)
    // cum column reconciles and the set is minimal: dropping the last
    // member would fall below 80%
    got.foldLeft(0L) { (acc, r) => assert(r._3 == acc + r._2); r._3 }
    val withoutLast = got.init.map(_._2).sum
    assert(5 * withoutLast < 4 * total, "covering set is not minimal")
    // and the full set really covers: last cum_before was still short,
    // but the set itself reaches at least 80%... unless the table is
    // so skewed one part exceeds it — covered by construction
    assert(got.length < all.length, "80% cut did not prune anything")
  }

  test("q_transition_matrix mass balances against event counts") {
    val got = AnalyticsOps.qTransitionMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    // total transitions = events - users (each user's first event has
    // no predecessor)
    val nEvents = Tables.load(spark, sf, "events").count()
    val nUsers = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(got.map(_._3).sum == nEvents - nUsers)
    // replay one user's chain
    val u = Tables.load(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val replay = u.values.flatMap { rows =>
      val chain = rows.sortBy(r => (r._2, r._3)).map(_._4)
      chain.zip(chain.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map(t => (t._1, t._2) -> t._3).toMap == replay)
  }

  test("q_basket_pairs supports reconcile with brute-force counting") {
    val got = AnalyticsOps.qBasketPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairCounts = byOrder.values.flatMap(ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val freq = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = pairCounts.filter(_._2 >= AnalyticsOps.basketMinSupport)
      .map { case ((a, b), n) => (a, b, n, freq(a), freq(b)) }.toSet
    assert(got.toSet == expected)
  }

  test("q_attribution conserves credit exactly and replays per purchase") {
    val got = AnalyticsOps.qAttribution(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = ev.filter(_._3 == "purchase")
    // books balance: total credit is exactly 10000 bp per purchase
    assert(got.values.map(_._1).sum == 10000L * purchases.length)
    // replay the full split
    val win = 7L * 86400L * 1000000L
    val credit = scala.collection.mutable.Map.empty[String, (Long, Long)]
      .withDefaultValue((0L, 0L))
    purchases.foreach { case (u, _, _, pus) =>
      val touches = ev.filter(t => t._1 == u && t._3 != "purchase" &&
          t._4 < pus && t._4 >= pus - win)
        .sortBy(t => (-t._4, -t._2))
      if (touches.isEmpty) {
        val (b, c) = credit("direct"); credit("direct") = (b + 10000L, c + 1)
      } else {
        val n = touches.length
        touches.zipWithIndex.foreach { case (t, i) =>
          val bp = 10000L / n + (if (i + 1 <= 10000 % n) 1L else 0L)
          val (b, c) = credit(t._3); credit(t._3) = (b + bp, c + 1)
        }
      }
    }
    assert(got == credit.toMap, s"got $got, replay ${credit.toMap}")
    // the fixture exercises both regimes
    assert(got.contains("direct") && got.size > 1)
  }

  test("q_hopping_window: every event lands in exactly 4 windows") {
    val got = AnalyticsOps.qHoppingWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val nEvents = Tables.load(spark, sf, "events").count()
    // the 4x replication is exact: window-count mass = 4 * events
    assert(got.map(_._3).sum == 4 * nEvents)
    // windows overlap: consecutive starts are 15 min apart and each
    // hour-long window's count equals the sum of its 4 quarter slices
    // computed from a tumbling 15-min replay
    val quarter = Tables.load(spark, sf, "events")
      .groupBy(expr("(unix_micros(ts) div 900000000) * 900000000").as("q"),
        col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    got.foreach { case (ws, tpe, n, _) =>
      val expected = (0 until 4)
        .map(i => quarter.getOrElse((ws + i * 900000000L, tpe), 0L)).sum
      assert(n == expected, s"window $ws/$tpe: $n != $expected")
    }
  }

  test("q_rolling_median equals a driver-side sliding replay") {
    val got = AnalyticsOps.qRollingMedian(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        expr("cast(round(value * 100) as bigint)")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.size == ev.length)
    ev.groupBy(_._2).values.foreach { rows =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 4), i + 1).map(_._4)
        val med = frame.sorted.apply((frame.length + 1) / 2 - 1)
        val r = ordered(i)
        assert(got(r._1) == ((r._2, r._4, med)),
          s"event ${r._1}: got ${got(r._1)}, expected med $med")
      }
    }
  }

  test("q_yoy equals a driver-side lag replay, trunc-division on drops") {
    val got = AnalyticsOps.qYoy(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(6)) None else Some(r.getLong(6)))).toMap
    val yearly = Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderpriority"), year(col("o_orderdate")))
      .agg(expr("cast(sum(cast(o_totalprice as decimal(14,2)) * 100) as bigint)"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.size == yearly.size)
    var sawDrop = false
    yearly.foreach { case ((p, y), rev) =>
      val prev = yearly.get((p, y - 1))
      // Scala Long division truncates toward zero — the shared law
      val bp = prev.map(pc => (rev - pc) * 10000L / pc)
      if (bp.exists(_ < 0)) sawDrop = true
      assert(got((p, y)) == ((rev, prev, bp)), s"($p,$y)")
    }
    assert(sawDrop, "fixture must exercise negative growth (2001 partial)")
  }

  test("q_benford digits replay exactly and shares sum near 10^6") {
    val got = AnalyticsOps.qBenford(spark, sf).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val cents = Tables.load(spark, sf, "orders")
      .select(expr("cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)"))
      .collect().map(_.getLong(0))
    val exp = cents.groupBy(_.toString.head.asDigit)
      .view.mapValues(_.size.toLong).toMap
    val total = cents.length.toLong
    val ppm = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    assert(got.keySet == exp.keySet)
    exp.foreach { case (d, n) =>
      val share = n * 1000000L / total
      assert(got(d) == ((n, share, ppm(d - 1), share - ppm(d - 1))), s"d=$d")
    }
    // truncating div loses < 9 ppm total
    val s6 = got.values.map(_._2).sum
    assert(s6 > 999991L && s6 <= 1000000L, s"share sum $s6")
  }

  test("q_debounce partitions every event into exactly one burst") {
    val got = AnalyticsOps.qDebounce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // burst replay
    val gapUs = 86400L * 1000000L
    val exp = ev.groupBy(e => (e._1, e._2)).flatMap { case ((u, t), es) =>
      val ordered = es.sortBy(e => (e._3, e._4))
      var burst = 0L
      var prev = Long.MinValue / 4
      val tagged = ordered.map { e =>
        if (e._3 - prev > gapUs) burst += 1
        prev = e._3
        (burst, e)
      }
      tagged.groupBy(_._1).map { case (b, bes) =>
        val times = bes.map(_._2._3)
        (u, t, b, bes.minBy(x => (x._2._3, x._2._4))._2._4,
          times.min, times.max - times.min, bes.size.toLong)
      }
    }.toSet
    assert(got.toSet == exp)
    // conservation: collapsed counts sum to the event count
    assert(got.map(_._7).sum == ev.length.toLong)
    // the gap must actually collapse something
    assert(got.exists(_._7 > 1L), "no burst collapsed >1 event")
  }

  test("q_streaks equals a driver-side consecutive-day replay") {
    val got = AnalyticsOps.qStreaks(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDate(4).toLocalDate.toEpochDay)).toMap
    val days = Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .distinct
    val exp = days.groupBy(_._1).map { case (u, ds) =>
      val sorted = ds.map(_._2).sorted
      val streaks = sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((start, len) :: rest, d) if d == start + len =>
          (start, len + 1) :: rest
        case (acc, d) => (d, 1L) :: acc
      }.reverse
      val longest = streaks.maxBy { case (st, len) =>
        len * 10000000000L - st
      }
      u -> (sorted.length.toLong, streaks.length.toLong, longest._2,
        longest._1)
    }
    assert(got == exp)
    // the fixture must contain a real multi-day streak
    assert(got.values.exists(_._3 > 1), "no streak longer than one day")
  }

  test("q_mad equals a driver-side robust-statistics replay") {
    val got = AnalyticsOps.qMad(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("cast(round(value * 100) as bigint)")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def medInterp(xs: Seq[Long]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2).toDouble
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val cents = rows.map(_._2).toSeq
      val med = medInterp(cents)
      val devs = cents.map(c => math.abs(c - med))
      val mad = {
        val s = devs.sorted
        if (s.length % 2 == 1) s(s.length / 2)
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
      }
      val out = devs.count(_ > 3 * mad).toLong
      assert(got(t) == ((cents.length.toLong, med, mad, out)), s"type $t")
    }
    // MAD must be resistant: for each type it is far below the range
    got.foreach { case (t, (_, _, mad, nOut)) =>
      assert(mad >= 0.0)
      assert(nOut > 0, s"$t: no robust outliers flagged — vacuous fixture")
    }
  }

  test("q_audience_overlap equals exact set intersections") {
    val got = AnalyticsOps.qAudienceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val sets = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    val expPairs = for {
      a <- types; b <- types if a < b
      both = (sets(a) & sets(b)).size.toLong if both > 0
    } yield (a, b) -> (sets(a).size.toLong, sets(b).size.toLong, both,
      both * 1000000L / (sets(a).size + sets(b).size - both))
    assert(got == expPairs.toMap)
    // every pair overlaps in this fixture (small user pool); the
    // meaningful invariants are the bounds and inclusion-exclusion
    got.values.foreach { case (na, nb, both, j) =>
      assert(both <= math.min(na, nb))
      assert(j > 0 && j <= 1000000L)
    }
    assert(got.nonEmpty)
  }

  test("q_equidepth_hist buckets cover the sorted corpus exactly") {
    val got = AnalyticsOps.qEquidepthHist(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val cents = Tables.load(spark, sf, "orders")
      .select(
        expr("cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)"),
        col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).map(_._1)
    val n = cents.length
    assert(got.map(_._1).toSeq == (1 to 8))
    // counts sum to n and differ by at most one
    assert(got.map(_._4).sum == n.toLong)
    assert(got.map(_._4).max - got.map(_._4).min <= 1)
    // boundary values are the exact order statistics
    got.foreach { case (i, lo, hi, cnt) =>
      val loRank = n.toLong * (i - 1) / 8 + 1
      val hiRank = n.toLong * i / 8
      assert(lo == cents((loRank - 1).toInt), s"bucket $i lo")
      assert(hi == cents((hiRank - 1).toInt), s"bucket $i hi")
      assert(cnt == hiRank - loRank + 1)
      assert(lo <= hi)
    }
    // monotone non-decreasing across buckets
    got.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._2) }
  }

  test("q_cohort_ltv conserves revenue and accumulates monotonically") {
    val got = AnalyticsOps.qCohortLtv(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val ords = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"),
        expr("year(o_orderdate) * 12 + month(o_orderdate) - 1"),
        expr("cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)"))
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue(),
        r.getLong(2)))
    // total revenue is conserved across the whole cohort grid
    assert(got.map(_._4).sum == ords.map(_._3).sum)
    // cum is a running sum per cohort, monotone, ending at cohort total
    got.groupBy(r => (r._1, r._2)).foreach { case (coh, rows) =>
      val seq = rows.sortBy(_._3)
      seq.foldLeft(0L) { (acc, r) =>
        assert(r._5 == acc + r._4, s"cohort $coh offset ${r._3}")
        r._5
      }
    }
    // replay one cohort fully driver-side
    val first = ords.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val coh0 = first.values.min
    val exp0 = ords.filter(o => first(o._1) == coh0)
      .groupBy(o => o._2 - coh0).view
      .mapValues(os => (os.map(_._3).sum, os.map(_._1).distinct.size.toLong))
      .toMap
    val got0 = got.filter(r => r._1 * 12L + r._2 - 1 == coh0)
      .map(r => r._3.toLong -> (r._4, r._6)).toMap
    assert(got0 == exp0.map { case (k, v) => k -> v })
  }

  test("q_dau_mau equals exact trailing-30-day distinct counts") {
    val got = AnalyticsOps.qDauMau(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.load(spark, sf, "events")
      .select(to_date(col("ts")), col("user_id")).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
    val byDay = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == byDay.keySet)
    byDay.foreach { case (d, todays) =>
      val mauSet = byDay.filter { case (d2, _) =>
        d2 >= d - 29 && d2 <= d
      }.values.flatten.toSet
      val exp = (todays.size.toLong, mauSet.size.toLong,
        todays.size.toLong * 1000000L / mauSet.size)
      assert(got(d) == exp, s"day $d")
      // DAU can never exceed MAU
      assert(got(d)._1 <= got(d)._2)
    }
    // a real corpus has days where MAU > DAU (stickiness < 1)
    assert(got.values.exists(v => v._2 > v._1))
  }

  test("q_forecast_backtest aligns m-12 exactly and scores errors") {
    val got = AnalyticsOps.qForecastBacktest(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7))).toMap
    val g = Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderpriority"),
        expr("year(o_orderdate) * 12 + month(o_orderdate) - 1"))
      .agg(expr(
        "cast(sum(cast(o_totalprice as decimal(14,2)) * 100) as bigint)"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue()) ->
        r.getLong(2)).toMap
    val exp = g.flatMap { case ((p, m), cents) =>
      g.get((p, m - 12)).map { f =>
        (p, (m / 12).toInt, (m % 12 + 1).toInt) ->
          (cents, f, cents - f, math.abs(cents - f),
            (cents - f) * 10000L / f)
      }
    }
    assert(got == exp)
    assert(got.nonEmpty)
    // the backtest must contain both over- and under-forecasts
    assert(got.values.exists(_._3 > 0) && got.values.exists(_._3 < 0))
  }

  test("q_growth_accounting balances the user-state ledger") {
    val got = AnalyticsOps.qGrowthAccounting(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val uw = Tables.load(spark, sf, "events")
      .select(col("user_id"),
        expr("datediff(cast(ts as date), date'1970-01-01') div 7"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt)).distinct
    val byUser = uw.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val weeks = uw.map(_._2).distinct.sorted
    val exp = weeks.map { w =>
      var nw = 0L; var ret = 0L; var res = 0L
      byUser.values.foreach { ws =>
        if (ws.contains(w)) {
          val prev = ws.filter(_ < w)
          if (prev.isEmpty) nw += 1
          else if (prev.max == w - 1) ret += 1
          else res += 1
        }
      }
      val active = nw + ret + res
      w -> (active, nw, ret, res)
    }.toMap
    assert(got.view.mapValues(v => (v._1, v._2, v._3, v._4)).toMap == exp)
    // every state decomposes actives; churn equals the identity
    weeks.sliding(2).foreach {
      case Array(a, b) if b == a + 1 =>
        assert(got(b)._5 == got(a)._1 - got(b)._3, s"churn at $b")
      case _ => ()
    }
    // the fixture must exercise new + retained at minimum
    assert(got.values.exists(_._2 > 0) && got.values.exists(_._3 > 0))
  }

  test("q_revenue_bridge components reconcile to the total change") {
    val got = AnalyticsOps.qRevenueBridge(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val perCust = Tables.load(spark, sf, "orders")
      .filter(expr("year(o_orderdate) in (1999, 2000)"))
      .groupBy(col("o_custkey"))
      .agg(
        expr("cast(sum(case when year(o_orderdate) = 1999 then " +
          "cast(o_totalprice as decimal(14,2)) * 100 else 0 end) as bigint)"),
        expr("cast(sum(case when year(o_orderdate) = 2000 then " +
          "cast(o_totalprice as decimal(14,2)) * 100 else 0 end) as bigint)"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def comp(r1: Long, r2: Long) =
      if (r1 == 0) "new" else if (r2 == 0) "churned"
      else if (r2 > r1) "expansion" else "contraction"
    val exp = perCust.groupBy { case (a, b) => comp(a, b) }.map {
      case (c, rs) => c -> (rs.length.toLong, rs.map(r => r._2 - r._1).sum)
    }
    exp.foreach { case (c, v) => assert(got(c) == v, s"component $c") }
    // reconciliation identity: components sum to the total row
    val compsOnly = got - "total_change"
    assert(compsOnly.values.map(_._2).sum == got("total_change")._2)
    assert(compsOnly.values.map(_._1).sum == got("total_change")._1)
    // all four components must be live in the fixture
    assert(compsOnly.keySet ==
      Set("new", "churned", "expansion", "contraction"))
  }

  test("q_assoc_rules scores both directions of every pair") {
    val got = AnalyticsOps.qAssocRules(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val pairs = AnalyticsOps.qBasketPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val nB = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey")).distinct().count()
    assert(got.size == pairs.length * 2)
    pairs.foreach { case (a, b, nab, na, nb2) =>
      assert(got((a, b)) == ((nab, nab * 1000000L / nB,
        nab * 1000000L / na, nab * nB * 1000L / (na * nb2))), s"$a->$b")
      assert(got((b, a)) == ((nab, nab * 1000000L / nB,
        nab * 1000000L / nb2, nab * nB * 1000L / (na * nb2))), s"$b->$a")
    }
    // lift must be symmetric for a pair and both >1 and <=1 cases
    // need not both exist, but some rule must show real lift
    assert(got.values.exists(_._4 > 1000L), "no rule lifts above chance")
  }

  test("q_order_intervals equals a driver-side gap replay") {
    val got = AnalyticsOps.qOrderIntervals(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getLong(6)))
      .toMap
    val ords = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")),
        col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
    val segs = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def interp(xs: Seq[Long], p: Double): Double = {
      val sorted = xs.sorted
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      if (lo == sorted.length - 1) sorted(lo).toDouble
      else sorted(lo) + (pos - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val gaps = ords.groupBy(_._1).toSeq.flatMap { case (c, os) =>
      val sorted = os.sortBy(o => (o._2, o._3))
      sorted.sliding(2).collect { case Array(a, b) =>
        (segs(c), c, b._2 - a._2)
      }
    }
    val exp = gaps.groupBy(_._1).map { case (seg, gs) =>
      val vals = gs.map(_._3)
      seg -> (vals.size.toLong, gs.map(_._2).distinct.size.toLong,
        interp(vals, 0.5), interp(vals, 0.9), vals.min, vals.max)
    }
    assert(got == exp)
    // same-day repeat orders and long gaps must both exist
    assert(got.values.exists(_._5 == 0L) || got.values.exists(_._5 < 5L))
    assert(got.values.forall(v => v._3 <= v._4))
  }

  test("q_concentration HHI replays and stays within uniform bounds") {
    val got = AnalyticsOps.qConcentration(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    val g = Tables.load(spark, sf, "orders")
      .groupBy(year(col("o_orderdate")), col("o_orderpriority"))
      .agg(expr(
        "cast(sum(cast(o_totalprice as decimal(14,2)) * 100) as bigint)"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    g.groupBy(_._1).foreach { case (yr, rows) =>
      val total = rows.map(_._3).sum
      val shares = rows.map(r => (r._2, r._3 * 1000000L / total))
      val hhi = shares.map(s => s._2 * s._2).sum / 1000000L
      val top = shares.maxBy(s => (s._2, s._1))
      assert(got(yr) == ((rows.length.toLong, hhi, top._2, top._1)),
        s"year $yr")
      // HHI bounds: uniform 1/k floor (ppm, minus quantization),
      // monopoly 10^6 ceiling
      assert(hhi <= 1000000L && hhi >= 1000000L / rows.length - 2)
    }
    assert(got.nonEmpty)
  }

  test("q_fulfillment_lag equals a driver-side join replay") {
    val got = AnalyticsOps.qFulfillmentLag(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val ords = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate"))).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getDate(2).toLocalDate.toEpochDay)).toMap
    val lags = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), to_date(col("l_shipdate"))).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .flatMap { case (ok, sd) =>
        ords.get(ok).map { case (p, od) => (p, sd - od) }
      }
    def interp(xs: Seq[Long]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = pos.toInt
      if (lo == s.length - 1) s(lo).toDouble
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val exp = lags.groupBy(_._1).map { case (p, ls) =>
      val vs = ls.map(_._2).toSeq
      p -> (vs.size.toLong, interp(vs),
        vs.count(_ <= 30).toLong * 1000000L / vs.size, vs.min, vs.max)
    }
    assert(got == exp)
    // the SLA split must be informative: neither 0 nor 100 percent
    assert(got.values.exists(v => v._3 > 0 && v._3 < 1000000L))
  }

  test("q_top_movers ranks replay and movement is priced from full ranks") {
    val got = AnalyticsOps.qTopMovers(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))
      .toMap
    val g = Tables.load(spark, sf, "lineitem")
      .groupBy(expr("year(l_shipdate) * 12 + month(l_shipdate) - 1"),
        col("l_partkey"))
      .agg(expr(
        "cast(sum(cast(l_extendedprice as decimal(14,2)) * 100) as bigint)"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getLong(1),
        r.getLong(2)))
    val ranks = g.groupBy(_._1).map { case (m, rows) =>
      m -> rows.sortBy(r => (-r._3, r._2)).zipWithIndex
        .map { case (r, i) => r._2 -> (i + 1L, r._3) }.toMap
    }
    assert(got.nonEmpty)
    got.foreach { case ((yr, mon, p), (rev, rk, prevRk, gain)) =>
      val m = yr * 12L + mon - 1
      val (expRk, expRev) = ranks(m)(p)
      assert(rk == expRk && rev == expRev && rk <= 3, s"($yr,$mon,$p)")
      val expPrev = ranks.get(m - 1).flatMap(_.get(p).map(_._1))
      assert(prevRk == expPrev, s"($yr,$mon,$p) prev")
      assert(gain == expPrev.map(_ - rk), s"($yr,$mon,$p) gain")
    }
    // movement must be priced from OUTSIDE the top-3 somewhere
    assert(got.values.exists(_._3.exists(_ > 3)),
      "no mover climbed from beyond the top-3 — full ranking untested")
  }

  test("q_promo_lift bands replay and the baseline lifts zero") {
    val got = AnalyticsOps.qPromoLift(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val li = Tables.load(spark, sf, "lineitem")
      .select(expr("cast(round(l_discount * 100) as int)"),
        expr("cast(cast(l_quantity as decimal(12,2)) * 100 as bigint)"),
        expr("cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)"),
        expr("cast(l_extendedprice as decimal(14,2))" +
          " * cast(l_discount as decimal(4,2)) * 100"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        BigDecimal(r.getDecimal(3))))
    val bands = li.groupBy(_._1).view.mapValues { rows =>
      (rows.length.toLong, rows.map(_._2).sum, rows.map(_._3).sum,
        rows.map(_._4).sum.setScale(0, BigDecimal.RoundingMode.FLOOR)
          .toLong)
    }.toMap
    val (bl, bq) = (bands(0)._1, bands(0)._2)
    assert(got.keySet == bands.keySet)
    bands.foreach { case (d, (n, q, rev, cost)) =>
      val lift = (q / n) * 1000000L / (bq / bl) - 1000000L
      assert((got(d)._1, got(d)._2, got(d)._3, got(d)._4) ==
        ((n, q, rev, cost)), s"band $d")
      assert(got(d)._5 == lift, s"band $d lift")
    }
    // the zero band lifts exactly zero; discounted bands cost money
    assert(got(0)._5 == 0L)
    assert(got.filter(_._1 > 0).values.forall(_._4 > 0L))
  }

  test("q_ab_bucketing is sticky, replayable, and audits SRM exactly") {
    val got = AnalyticsOps.qAbBucketing(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val users = Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    def variant(u: Long): String =
      if ((u * 2654435761L + 12345L) % 4294967296L / 429496730L < 9)
        "control" else "treatment"
    val byV = users.groupBy(variant).view.mapValues(_.length.toLong)
    val total = users.length.toLong
    assert(got.keySet == byV.keySet.toSet)
    byV.foreach { case (v, n) =>
      val w = if (v == "control") 9L else 1L
      val expd = total * w / 10
      val dev = (n - expd) * 1000000L / expd
      val chi2 = (n - expd) * (n - expd) * 1000000L / expd
      assert(got(v) == ((n, expd, dev, chi2)), s"variant $v")
    }
    // allocation accounting: variants partition the population
    assert(got.values.map(_._1).sum == total)
    // the hash split must land near 90/10 — within 4 binomial sigmas
    // of the declared rate at this population size (n=150 at sf0.001
    // makes a fixed percentage bound meaningless)
    val c = got("control")
    val sigmaPpm = math.sqrt(0.1 / (0.9 * total)) * 1000000L
    assert(math.abs(c._3) < 4 * sigmaPpm,
      s"control off by ${c._3} ppm > 4σ (${4 * sigmaPpm}) — slicing broken")
  }

  test("q_winsorize clips exactly at the selected rank bounds") {
    val got = AnalyticsOps.qWinsorize(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("event_id"),
        expr("cast(round(value * 100) as bigint)")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.length.toLong
      val lo = sorted((math.max(1L, 5 * n / 100) - 1).toInt)
      val hi = sorted((math.min(n, (95 * n + 99) / 100) - 1).toInt)
      val exp = (n, lo, hi,
        sorted.count(_ < lo).toLong, sorted.count(_ > hi).toLong,
        sorted.sum, sorted.map(c => math.max(lo, math.min(hi, c))).sum)
      assert(got(t) == exp, s"type $t")
      // winsorization must actually clip both tails here
      assert(exp._4 > 0 && exp._5 > 0, s"type $t clipped nothing")
    }
  }

  test("q_rfm quintiles equal a driver-side NTILE replay") {
    val got = AnalyticsOps.qRfm(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7))).toMap
    val m = Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(org.apache.spark.sql.functions.max(col("o_orderdate"))
          .as("last_d"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("freq"),
        expr("cast(sum(cast(o_totalprice as decimal(14,2)) * 100) as bigint)")
          .as("cents"))
      .collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)), r.getLong(2),
        r.getLong(3)))
    val n = m.length
    // reference NTILE: first n%5 buckets take ceil(n/5) rows
    def ntile(rank: Int): Int = {
      val q = n / 5; val rem = n % 5
      val r0 = rank - 1
      if (r0 < rem * (q + 1)) r0 / (q + 1) + 1
      else rem + (r0 - rem * (q + 1)) / q + 1
    }
    def scores[K: Ordering](key: ((Long, String, Long, Long)) => K)
        : Map[Long, Int] =
      m.sortBy(r => (key(r), r._1))(
          Ordering.Tuple2(Ordering[K].reverse, Ordering.Long))
        .zipWithIndex.map { case (r, i) => r._1 -> ntile(i + 1) }.toMap
    // each dimension orders metric DESC, custkey ASC
    val rS = scores(r => r._2) // ISO date strings sort chronologically
    val fS = scores(r => r._3)
    val mS = scores(r => r._4)
    assert(got.size == n)
    m.foreach { r =>
      val exp = (rS(r._1), fS(r._1), mS(r._1),
        rS(r._1) * 100 + fS(r._1) * 10 + mS(r._1))
      assert(got(r._1) == exp, s"cust ${r._1}: got ${got(r._1)}, exp $exp")
    }
    // quintile sizing: bucket sizes differ by at most one per dimension
    Seq(4, 5, 6).foreach { c =>
      val sizes = got.values.groupBy {
        case t => c match {
          case 4 => t._1; case 5 => t._2; case _ => t._3
        }
      }.values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"col $c sizes $sizes")
    }
  }

  test("q_gini replays the exact rank-formula Gini and Lorenz bounds") {
    val got = AnalyticsOps.qGini(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val cust = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rev = Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(expr(
        "cast(sum(cast(o_totalprice as decimal(14,2)) * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rev.groupBy(r => cust(r._1)).foreach { case (seg, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1)).map(_._2)
      val n = sorted.length.toLong
      val tot = sorted.map(BigInt(_)).sum
      val iwx = sorted.zipWithIndex
        .map { case (x, i0) => BigInt(i0 + 1) * x }.sum
      val gini = ((iwx * 2 - (BigInt(n) + 1) * tot) * 1000000) /
        (BigInt(n) * tot)
      val topRev = sorted.drop((n - n / 10).toInt).map(BigInt(_)).sum
      val topPpm = topRev * 1000000 / tot
      assert(got(seg) ==
        ((n, tot.toLong, gini.toLong, topPpm.toLong)), s"seg $seg")
      // Lorenz sanity: Gini in [0, 1e6); the top decile holds at
      // least its population share (sorted cut, minus ppm rounding)
      assert(gini >= 0 && gini < 1000000L, s"seg $seg gini $gini")
      assert(topPpm + 1 >= (n / 10) * 1000000 / n, s"seg $seg top $topPpm")
    }
    assert(got.nonEmpty)
  }

  test("q_changepoint replays the integer CUSUM argmax per nation") {
    val got = AnalyticsOps.qChangepoint(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDate(3).toString, r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val daily = spark.sql(
      s"""SELECT n_name, to_date(o_orderdate) AS day,
         |  cast(sum(cast(o_totalprice as decimal(14,2)) * 100) as bigint)
         |    AS x
         |FROM parquet.`$sf/orders.parquet`
         |JOIN parquet.`$sf/customer.parquet` ON o_custkey = c_custkey
         |JOIN parquet.`$sf/nation.parquet` ON c_nationkey = n_nationkey
         |GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (nation, rows) =>
      val series = rows.sortBy(_._2).map(_._3)
      val n = series.length
      if (n >= 2) {
        val tot = series.map(BigInt(_)).sum
        val prefix = series.scanLeft(BigInt(0))(_ + _).tail
        val devs = (1 until n).map(i =>
          (BigInt(n) * prefix(i - 1) - BigInt(i) * tot).abs)
        val bestI = devs.zipWithIndex.maxBy {
          case (d, i0) => (d, -i0) // max dev, earliest day on ties
        }._2 + 1
        val s = prefix(bestI - 1)
        val exp = (n.toLong, tot.toLong,
          rows.sortBy(_._2).map(_._2).apply(bestI - 1),
          (devs(bestI - 1) / n).toLong,
          (s / bestI).toLong, ((tot - s) / (n - bestI)).toLong)
        assert(got(nation) == exp, s"nation $nation")
      }
    }
    assert(got.nonEmpty)
  }

  test("q_survival replays the censored life table per segment") {
    val rows = AnalyticsOps.qSurvival(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val spans = spark.sql(
      s"""SELECT c_mktsegment AS seg, min(to_date(o_orderdate)) AS f,
         |  max(to_date(o_orderdate)) AS l
         |FROM parquet.`$sf/orders.parquet`
         |JOIN parquet.`$sf/customer.parquet` ON o_custkey = c_custkey
         |GROUP BY c_mktsegment, o_custkey""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDate(1), r.getDate(2)))
    val m = spans.map(_._3.toLocalDate).max
    def days(a: java.time.LocalDate, b: java.time.LocalDate): Long =
      java.time.temporal.ChronoUnit.DAYS.between(a, b)
    val exp = spans.map { case (seg, f, l) =>
      val churned = days(l.toLocalDate, m) > 90
      val t = (if (churned) days(f.toLocalDate, l.toLocalDate)
               else days(f.toLocalDate, m)) / 30
      (seg, t, churned)
    }
    // per-bucket event/censor counts match
    val gotMap = rows.map(r => (r._1, r._2) -> (r._4, r._5)).toMap
    exp.groupBy(e => (e._1, e._2)).foreach { case (k, es) =>
      val ev = es.count(_._3).toLong
      assert(gotMap(k) == ((ev, es.length - ev)), s"bucket $k")
    }
    assert(gotMap.keySet == exp.map(e => (e._1, e._2)).toSet)
    // life-table identities: at_risk telescopes by events+censored,
    // and the first bucket's at-risk is the segment's customer count
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      val o = rs.sortBy(_._2)
      o.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 - a._4 - a._5 == b._3, s"$seg telescoping at ${a._2}")
        case _ =>
      }
      assert(o.head._3 == exp.count(_._1 == seg), s"$seg head at_risk")
      assert(o.last._3 == o.last._4 + o.last._5, s"$seg tail at_risk")
    }
    assert(rows.nonEmpty)
  }

  test("q_stock_ledger matches the naive sequential clamp recurrence") {
    val got = AnalyticsOps.qStockLedger(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val mv = spark.sql(
      s"""SELECT l_partkey, to_date(l_shipdate) AS day,
         |  cast(sum(case when l_returnflag = 'R'
         |    then cast(cast(l_quantity as decimal(12,2)) as bigint)
         |    else -cast(cast(l_quantity as decimal(12,2)) as bigint)
         |    end) as bigint) AS x
         |FROM parquet.`$sf/lineitem.parquet` GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    mv.groupBy(_._1).foreach { case (part, rows) =>
      // the semantics the identity must reproduce: day by day,
      // balance = max(0, balance + movement), losses accumulate
      var bal = 0L
      var maxBal = 0L
      var stockouts = 0L
      var lost = 0L
      rows.sortBy(_._2).foreach { case (_, _, x) =>
        val raw = bal + x
        if (raw < 0) { stockouts += 1; lost += -raw }
        bal = math.max(0L, raw)
        maxBal = math.max(maxBal, bal)
      }
      assert(got(part) ==
        ((rows.size.toLong, bal, maxBal, stockouts, lost)), s"part $part")
    }
    assert(got.nonEmpty)
  }

  test("q_top_paths replays 3-gram path mining with deterministic ties") {
    val got = AnalyticsOps.qTopPaths(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val counts = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).sliding(3)
        .filter(_.size == 3).map(_.mkString(" > "))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exp = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
      .zipWithIndex.map { case ((p, n), i) => (i + 1L, p, n) }
    assert(got.toSeq == exp)
  }

  test("q_fifo_cogs matches a sequential FIFO layer matcher") {
    val got = AnalyticsOps.qFifoCogs(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val li = spark.sql(
      s"""SELECT l_partkey, to_date(l_shipdate) AS day, l_orderkey,
         |  l_linenumber,
         |  cast(cast(l_quantity as decimal(12,2)) as bigint) AS qty,
         |  cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)
         |    AS cents,
         |  l_returnflag
         |FROM parquet.`$sf/lineitem.parquet`""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getInt(3), r.getLong(4), r.getLong(5), r.getString(6)))
    li.groupBy(_._1).foreach { case (part, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3, r._4))
      // the semantics the band join must reproduce: consume receipt
      // layers oldest-first until shipped demand is exhausted
      val layers = ordered.filter(_._7 == "R").map(r => (r._5, r._6 / r._5))
      val shipped = ordered.filter(_._7 != "R").map(_._5).sum
      var shipLeft = shipped
      var matched = 0L
      var cogs = 0L
      layers.foreach { case (q, unit) =>
        val take = math.min(q, shipLeft)
        matched += take
        cogs += take * unit
        shipLeft -= take
      }
      val receipts = layers.map(_._1).sum
      assert(got(part) ==
        ((receipts, shipped, matched, cogs, shipped - matched)),
        s"part $part")
    }
    assert(got.nonEmpty)
  }

  test("q_twab replays duration-weighted balances over the clamp scan") {
    val got = AnalyticsOps.qTwab(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val mv = spark.sql(
      s"""SELECT l_partkey, to_date(l_shipdate) AS day,
         |  cast(sum(case when l_returnflag = 'R'
         |    then cast(cast(l_quantity as decimal(12,2)) as bigint)
         |    else -cast(cast(l_quantity as decimal(12,2)) as bigint)
         |    end) as bigint) AS x
         |FROM parquet.`$sf/lineitem.parquet` GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getLong(2)))
    mv.groupBy(_._1).foreach { case (part, rows) =>
      val o = rows.sortBy(_._2)
      var bal = 0L
      var wSum = 0L
      var wx = BigInt(0)
      var zero = 0L
      o.zipWithIndex.foreach { case ((_, d, x), i) =>
        bal = math.max(0L, bal + x)
        val w = if (i + 1 < o.length)
          java.time.temporal.ChronoUnit.DAYS.between(d, o(i + 1)._2)
        else 1L
        wSum += w
        wx += BigInt(bal) * w
        if (bal == 0L) zero += w
      }
      assert(got(part) ==
        ((o.length.toLong, wSum, (wx * 1000 / wSum).toLong, zero)),
        s"part $part")
    }
    assert(got.nonEmpty)
  }

  test("q_weighted_percentile replays cumulative-weight crossings") {
    val got = AnalyticsOps.qWeightedPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val li = spark.sql(
      s"""SELECT l_returnflag,
         |  cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint),
         |  cast(cast(l_quantity as decimal(12,2)) as bigint),
         |  l_orderkey, l_linenumber
         |FROM parquet.`$sf/lineitem.parquet`""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    li.groupBy(_._1).foreach { case (flag, rows) =>
      val o = rows.sortBy(r => (r._2, r._4, r._5))
      val tot = o.map(_._3).sum
      var cumw = 0L
      var med = Option.empty[Long]
      var p90 = Option.empty[Long]
      o.foreach { case (_, price, w, _, _) =>
        cumw += w
        if (med.isEmpty && cumw * 2 >= tot) med = Some(price)
        if (p90.isEmpty && cumw * 10 >= tot * 9) p90 = Some(price)
      }
      assert(got(flag) == ((o.length.toLong, tot, med.get, p90.get)),
        s"flag $flag")
      assert(med.get <= p90.get)
      // the weighting moves the statistic: the weighted median must
      // differ from treating every line as weight 1 for SOME flag —
      // checked globally below
    }
    val unweighted = li.groupBy(_._1).map { case (f, rows) =>
      val o = rows.sortBy(r => (r._2, r._4, r._5)).map(_._2)
      f -> o((o.length - 1) / 2)
    }
    assert(got.exists { case (f, v) => unweighted(f) != v._3 },
      "weighting never changed the median — vacuous fixture")
  }

  test("q_anomaly_bands replays trailing-window 3-sigma breakouts") {
    val got = AnalyticsOps.qAnomalyBands(spark, sf).collect()
      .map { r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2),
          Option(r.getDate(3)).map(_.toString),
          Option(r.getDate(4)).map(_.toString))
      }.toMap
    val daily = spark.sql(
      s"""SELECT n_name, to_date(o_orderdate) AS day,
         |  cast(sum(cast(o_totalprice as decimal(14,2)) * 100) as bigint)
         |    AS x
         |FROM parquet.`$sf/orders.parquet`
         |JOIN parquet.`$sf/customer.parquet` ON o_custkey = c_custkey
         |JOIN parquet.`$sf/nation.parquet` ON c_nationkey = n_nationkey
         |GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (nation, rows) =>
      val o = rows.sortBy(_._2)
      val evald = (5 until o.length).map { i =>
        val win = o.slice(i - 5, i).map(r => BigInt(r._3))
        val x = BigInt(o(i)._3)
        val s = win.sum
        val q = win.map(v => v * v).sum
        val breakout = (x * 5 - s).pow(2) > 9 * (q * 5 - s * s)
        (o(i)._2, breakout)
      }
      val exp = (evald.length.toLong, evald.count(_._2).toLong,
        evald.find(_._2).map(_._1), evald.reverse.find(_._2).map(_._1))
      assert(got(nation) == exp, s"nation $nation")
    }
    // breakouts exist somewhere — the band test is not vacuous
    assert(got.values.exists(_._2 > 0))
    assert(got.values.exists(v => v._1 > v._2), "every day a breakout")
  }

  test("q_dataset_drift replays TVD against the base year exactly") {
    val got = AnalyticsOps.qDatasetDrift(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    val rows = spark.sql(
      s"""SELECT year(o_orderdate), o_orderpriority
         |FROM parquet.`$sf/orders.parquet`""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val byYear = rows.groupBy(_._1)
    def shares(yr: Int): Map[String, Long] = {
      val g = byYear(yr); val n = g.size.toLong
      g.groupBy(_._2).map { case (p, xs) =>
        p -> xs.size.toLong * 1000000L / n }
    }
    val baseYr = byYear.keys.min
    val q = shares(baseYr)
    val exp = byYear.keys.map { yr =>
      val p = shares(yr)
      // inner-join semantics: categories present in BOTH the year
      // and the base contribute (mirrors the engine and the oracle)
      val keys = p.keySet & q.keySet
      val devs = keys.map(k => k -> (p(k) - q(k)).abs).toMap
      val top = devs.toSeq.map { case (k, d) => (d, k) }.max
      val n = devs.values.sum
      yr -> (byYear(yr).size.toLong, n / 2, top._2)
    }.toMap
    assert(got == exp)
    // the base year drifts zero against itself; some year drifts
    assert(got(baseYr)._2 == 0L)
    assert(got.values.exists(_._2 > 0L))
  }

  test("q_trigram_search equals the naive LIKE scan, and pruning is real") {
    val got = AnalyticsOps.qTrigramSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val names = Tables.load(spark, sf, "part")
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val pat = AnalyticsOps.trigramPattern
    val exp = names.filter(_._2.contains(pat)).sortBy(_._1)
    assert(got.toSeq == exp.toSeq)
    assert(exp.nonEmpty && exp.size < names.length,
      "pattern must select a strict non-empty subset")
    // prefilter power: the all-trigrams candidate set is a superset
    // of the matches and excludes most of the corpus (on this
    // adjective×noun vocabulary trigram containment happens to imply
    // substring containment, so the verify step has nothing left to
    // prune — its correctness is covered by the LIKE-equality above)
    val qg = pat.sliding(3).toSet
    val cands = names.filter { case (_, n) => qg.subsetOf(n.sliding(3).toSet) }
    assert(exp.map(_._1).toSet.subsetOf(cands.map(_._1).toSet))
    assert(cands.size < names.length / 2,
      "the posting prefilter must exclude most of the corpus")
  }

  test("q_discount_scenarios reprices the book exactly per scenario") {
    val got = AnalyticsOps.qDiscountScenarios(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val lines = spark.sql(
      s"""SELECT cast(cast(l_extendedprice as decimal(14,2)) * 100
         |    as bigint) AS cents,
         |  cast(cast(l_discount as decimal(6,4)) * 10000 as bigint)
         |    AS d_bp
         |FROM parquet.`$sf/lineitem.parquet`""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exp = AnalyticsOps.scenarioDeltasBp.map { d =>
      val rev = lines.map { case (c, bp) =>
        val eff = math.max(0L, math.min(10000L, bp + d))
        (BigInt(c) * (10000 - eff) / 10000).toLong
      }.sum
      d -> rev
    }.toMap
    got.foreach { case (d, (rev, delta)) =>
      assert(rev == exp(d), s"scenario $d")
      assert(delta == rev - exp(0L))
    }
    // deeper discounts lose revenue, shallower ones gain it
    assert(got(-500L)._1 > got(0L)._1 && got(500L)._1 < got(0L)._1)
  }

  test("q_double_billing flags exactly the multi-order customer-days") {
    val got = AnalyticsOps.qDoubleBilling(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    val orders = spark.sql(
      s"""SELECT o_custkey, to_date(o_orderdate) AS day,
         |  cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)
         |FROM parquet.`$sf/orders.parquet`""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    val exp = orders.groupBy(o => (o._1, o._2))
      .filter(_._2.size >= 2)
      .map { case (k, os) =>
        val cs = os.map(_._3)
        k -> (os.size.toLong, cs.sum, cs.min, cs.max, cs.max - cs.min)
      }
    assert(got == exp)
    assert(got.nonEmpty, "fixture must contain same-day multi-orders")
    // flagged groups are strictly a subset of customers, not everyone
    assert(got.size < orders.map(_._1).distinct.length)
  }

  test("q_degree_dist is a true histogram of per-supplier fan-out") {
    val got = AnalyticsOps.qDegreeDist(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Tables.load(spark, sf, "lineitem")
      .select("l_suppkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exp = edges.groupBy(_._1).values
      .map(_.map(_._2).distinct.size.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == exp)
    // conservation: histogram masses sum to the supplier count
    assert(got.values.sum == edges.map(_._1).distinct.length.toLong)
    assert(got.size > 1, "fixture fan-out must not be constant")
  }

  test("q_adoption replays first-month adoption and conserves adopters") {
    val got = AnalyticsOps.qAdoption(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3))).toMap
    val rows = spark.sql(
      s"""SELECT p_brand, o_custkey, trunc(to_date(o_orderdate), 'month') AS m
         |FROM parquet.`$sf/lineitem.parquet`
         |JOIN parquet.`$sf/part.parquet` ON l_partkey = p_partkey
         |JOIN parquet.`$sf/orders.parquet` ON l_orderkey = o_orderkey
         |""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString))
    val firsts = rows.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      k -> rs.map(_._3).min
    }
    val monthly = firsts.toSeq.groupBy { case ((b, _), m) => (b, m) }
      .view.mapValues(_.size.toLong).toMap
    // cumulative replay per brand
    val exp = monthly.keys.groupBy(_._1).flatMap { case (b, ks) =>
      var cum = 0L
      ks.toSeq.sortBy(_._2).map { k =>
        cum += monthly(k); k -> (monthly(k), cum)
      }
    }
    assert(got == exp)
    // conservation: final cumulative == distinct (brand, cust) pairs
    val finals = got.groupBy(_._1._1).values
      .map(_.maxBy(_._1._2)._2._2).sum
    assert(finals == firsts.size.toLong)
  }

  test("q_price_index replays the matched-sample Laspeyres in BigInt") {
    val got = AnalyticsOps.qPriceIndex(spark, sf).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2)))
      .toMap
    val pm = spark.sql(
      s"""SELECT l_partkey, trunc(to_date(l_shipdate), 'month') AS m,
         |  cast(sum(cast(cast(l_quantity as decimal(12,2)) as bigint))
         |    as bigint) AS q,
         |  cast(sum(cast(cast(l_extendedprice as decimal(14,2)) * 100
         |    as bigint)) as bigint) AS c
         |FROM parquet.`$sf/lineitem.parquet` GROUP BY 1, 2""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3)))
    val withP = pm.map { case (part, m, q, c) => (part, m, q, c / q) }
    val base = withP.groupBy(_._1).map { case (part, rs) =>
      val b = rs.minBy(_._2)
      part -> (b._4, b._3) // (p0, w)
    }
    val exp = withP.groupBy(_._2).map { case (m, rs) =>
      val num = rs.map(r => BigInt(r._4) * BigInt(base(r._1)._2)).sum
      val den = rs.map(r => BigInt(base(r._1)._1) * BigInt(base(r._1)._2)).sum
      m -> (rs.size.toLong, (num * 1000000 / den).toLong)
    }
    assert(got == exp)
    // the index genuinely moves off 1.0 somewhere
    assert(got.values.exists(_._2 != 1000000L))
    // and the base month itself indexes to exactly parity for parts
    // present there — sanity on at least one month equal to 10^6 ppm
    // is not required (matched sample), but num==den must hold when
    // every part is in its own base month
  }

  test("q_tax_brackets allocates every cent exactly once at marginal rates") {
    val rows = AnalyticsOps.qTaxBrackets(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == 4)
    val cents = Tables.load(spark, sf, "orders")
      .select(expr("cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)"))
      .collect().map(_.getLong(0))
    // driver replay per bracket in BigInt
    val brackets = Seq(("b1_to_100k", 0L, 10000000L, 200L),
      ("b2_to_200k", 10000000L, 20000000L, 350L),
      ("b3_to_300k", 20000000L, 30000000L, 500L),
      ("b4_above_300k", 30000000L, 10000000000L, 800L))
    brackets.zip(rows.sortBy(_._1)).foreach {
      case ((id, lo, hi, bp), (gid, n, taxable, tax, effBp)) =>
        assert(gid == id)
        val slices = cents.map(v => (v.min(hi) - lo).max(0L))
        assert(n == cents.count(_ > lo).toLong)
        assert(taxable == slices.map(BigInt(_)).sum)
        assert(tax == slices.map(s => BigInt(s * bp / 10000)).sum)
        assert(effBp == tax * 10000L / taxable)
        // per-order rounding makes the effective rate sit AT or just
        // under the marginal rate, never above
        assert(effBp <= bp && effBp >= bp - 1)
    }
    // conservation: the bracket slices partition every order total
    assert(rows.map(r => BigInt(r._3)).sum == cents.map(BigInt(_)).sum,
      "bracket taxable bases must sum to total cents")
    // participation shrinks up the schedule
    assert(rows.sortBy(_._1).map(_._2).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q_decile_lift conserves the population and replays the ranking") {
    import graft.operators.AnalyticsOps
    val rows = AnalyticsOps.qDecileLift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    // population conservation + near-equal decile depths
    val li = Tables.load(spark, sf, "lineitem").select(
      expr("cast(cast(l_discount as decimal(12,3)) * 1000 as bigint)"),
      expr("case when l_returnflag = 'R' then 1 else 0 end"),
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2),
        r.getInt(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._2).sum == li.length.toLong)
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1,
      "equal-depth deciles differ by at most one row")
    // driver replay: same total order, same integer cut
    val sorted = li.sortBy(t => (-t._1, t._3, t._4, t._5, t._6))
    val n = sorted.length.toLong
    val exp = sorted.zipWithIndex.groupBy { case (_, i) =>
      i.toLong * 10 / n + 1
    }.view.mapValues { g =>
      (g.length.toLong, g.map(_._1._2).sum)
    }.toMap
    val totPos = li.map(_._2).sum
    val basePpm = totPos * 1000000L / n
    var cumPos = 0L; var cumRows = 0L
    rows.foreach { case (dec, nr, pos, rate, cumRate, lift) =>
      val (en, ep) = exp(dec)
      assert(nr == en && pos == ep, s"decile $dec census")
      assert(rate == pos * 1000000L / nr)
      cumPos += pos; cumRows += nr
      assert(cumRate == cumPos * 1000000L / cumRows)
      assert(lift == rate * 1000L / basePpm)
    }
    // a signal-free score shows lift ~1.000 — THAT is the finding on
    // this fixture (discount does not predict returns); the statistic
    // must be near-flat, not degenerate
    assert(rows.forall(r => r._6 > 800 && r._6 < 1200),
      "lift far from 1.0 would mean the replay or fixture changed")
  }
}
