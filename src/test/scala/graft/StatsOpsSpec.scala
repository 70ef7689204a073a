package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.StatsOps

class StatsOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q_stats_funcs statistics are well-formed and match a driver-side replay") {
    val rows = StatsOps.qStatsFuncs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val corr = r.getAs[Double]("corr_qp")
      assert(corr >= -1.0 && corr <= 1.0, s"corr out of range: $corr")
      assert(r.getAs[Double]("std_qty") > 0.0)
      assert(r.getAs[Double]("std_price") > 0.0)
    }
    // replay one group's correlation from raw rows with exact INTEGER
    // CENT sums (the operator's r10 domain — every conversion to
    // double is a single correctly-rounded cast of an exact integer)
    // — the operator must agree bitwise, not approximately
    val flag = rows.head.getString(0)
    val raw = Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag") === flag)
      .select(col("l_quantity"), col("l_extendedprice")).collect()
      .map(r => (
        (BigDecimal(r.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toBigInt,
        (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toBigInt))
    val n = raw.length.toDouble
    // product sums surface via the split hi·1e9 + lo (the operator's
    // sub-2^63 discipline) — the replay mirrors it exactly
    def split(x: BigInt): Double =
      (x / 1000000000).toDouble * 1e9 + (x % 1000000000).toDouble
    val sq = raw.map(_._1).sum.toDouble
    val sp = raw.map(_._2).sum.toDouble
    val sqq = split(raw.map(t => t._1 * t._1).sum)
    val spp = split(raw.map(t => t._2 * t._2).sum)
    val sqp = split(raw.map(t => t._1 * t._2).sum)
    val expected = (n * sqp - sq * sp) /
      (math.sqrt(n * sqq - sq * sq) * math.sqrt(n * spp - sp * sp))
    assert(rows.head.getAs[Double]("corr_qp") == expected,
      "corr must equal the exact-sufficient-statistics replay bitwise")
  }

  test("q_chi2 grid is complete, deviations telescope, terms replay bitwise") {
    val rows = StatsOps.qChi2(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val langs = rows.map(_._1).distinct.length
    val sources = rows.map(_._2).distinct.length
    // the grid is the FULL margins cross product, zero cells included
    assert(rows.length == langs * sources)
    // per-row (and per-column) deviations telescope to exactly zero
    rows.groupBy(_._1).values.foreach(g => assert(g.map(_._6).sum == 0L))
    rows.groupBy(_._2).values.foreach(g => assert(g.map(_._6).sum == 0L))
    // bitwise replay of the term from the integer cells
    val n = Tables.load(spark, sf, "documents").count()
    rows.foreach { case (_, _, obs, rt, ct, dev, term) =>
      assert(dev == obs * n - rt * ct)
      val expected = dev.toDouble * dev.toDouble /
        (n.toDouble * rt.toDouble * ct.toDouble)
      assert(term == expected, "chi2 term must replay bitwise")
    }
  }

  test("q_fuzzy_join pairs are ordered, in-band, and within the edit threshold") {
    val rows = StatsOps.qFuzzyJoin(spark, sf).collect()
    assert(rows.nonEmpty, "near-dup names exist inside blocks at sf0.001")
    rows.foreach { r =>
      assert(r.getAs[Long]("a_key") < r.getAs[Long]("b_key"))
      assert(r.getAs[Int]("dist") <= StatsOps.fuzzyMaxDist)
    }
    // completeness: a driver-side exhaustive walk over EVERY
    // (brand, size) block must find exactly the operator's pairs —
    // the banding must lose nothing the blocks contain
    val part = Tables.load(spark, sf, "part")
      .select("p_partkey", "p_name", "p_brand", "p_size").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3) / 10))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    var inBandPairs = 0
    val expected = part.groupBy(p => (p._3, p._4)).values.flatMap { blk =>
      val b = blk.sortBy(_._1)
      for {
        i <- b.indices; j <- (i + 1) until b.length
        _ = { inBandPairs += 1 }
        if lev(b(i)._2, b(j)._2) <= StatsOps.fuzzyMaxDist
      } yield (b(i)._1, b(j)._1)
    }.toSet
    assert(inBandPairs > 0, "fixture must produce candidate blocks to verify")
    val got = rows.map(r =>
      (r.getAs[Long]("a_key"), r.getAs[Long]("b_key"))).toSet
    assert(got == expected, "pairs must match the exhaustive driver walk")
  }

  test("q_triangle_count wedges bound triangles and match a driver-side count") {
    val rows = StatsOps.qTriangleCount(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_triangles") >= 0L)
      assert(r.getAs[Long]("n_triangles") <= r.getAs[Long]("n_wedges"),
        "every triangle is a closed wedge")
    }
    // driver-side replay of the whole motif count at sf0.001
    val li = Tables.load(spark, sf, "lineitem")
      .filter(col("l_partkey") % StatsOps.triModulus === 0)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val out = edges.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    val expected = out.map { case (a, bs) =>
      val wedges = for (b <- bs; c <- out.getOrElse(b, Set.empty)) yield (b, c)
      val tris = wedges.count { case (_, c) => bs.contains(c) }
      (a, wedges.size.toLong, tris.toLong)
    }.filter(_._2 > 0).toSet
    val got = rows.map(r => (r.getAs[Long]("p_partkey"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"))).toSet
    assert(got == expected, "motif counts must match the driver replay")
  }

  test("q_moments replays skew/kurtosis from exact power sums") {
    val got = StatsOps.qMoments(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val xs = spark.sql(
      s"""SELECT l_returnflag,
         |  cast(cast(l_quantity as decimal(12,2)) as bigint) AS x
         |FROM parquet.`$sf/lineitem.parquet`""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exp = xs.groupBy(_._1).map { case (f, rs) =>
      val n = rs.size.toDouble
      def p(k: Int) =
        rs.map(r => BigInt(r._2).pow(k)).sum.toDouble
      val (s1, s2, s3, s4) = (p(1), p(2), p(3), p(4))
      val m = s1 / n
      val v = s2 / n - m * m
      val skew = (s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m) /
        (v * math.sqrt(v))
      val kurt = (s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n) -
        3.0 * m * m * m * m) / (v * v) - 3.0
      f -> (rs.size.toLong, m, skew, kurt)
    }
    assert(got.keySet == exp.keySet)
    exp.foreach { case (f, (n, m, sk, ku)) =>
      assert(got(f)._1 == n)
      assert(got(f)._2 == m, s"$f mean (bitwise)")
      assert(got(f)._3 == sk, s"$f skewness (bitwise)")
      assert(got(f)._4 == ku, s"$f kurtosis (bitwise)")
    }
    // a uniform-ish quantity distribution is platykurtic — the
    // statistic must actually see that shape, not return 0
    assert(got.values.forall(_._4 < 0))
  }

  test("q_cov_matrix replays all 10 pairs and is diagonally consistent") {
    val got = StatsOps.qCovMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.size == 10)
    val rows = spark.sql(
      s"""SELECT cast(cast(l_quantity as decimal(12,2)) as bigint),
         |  cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)
         |    div 100,
         |  cast(cast(l_discount as decimal(6,4)) * 10000 as bigint),
         |  cast(cast(l_tax as decimal(6,4)) * 10000 as bigint)
         |FROM parquet.`$sf/lineitem.parquet`""".stripMargin)
      .collect().map(r => Array(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val vars = Seq("q", "p", "d", "t")
    val n = rows.length.toDouble
    def s1(i: Int) = rows.map(r => BigInt(r(i))).sum.toDouble
    def s2(i: Int, j: Int) =
      rows.map(r => BigInt(r(i)) * BigInt(r(j))).sum.toDouble
    for { i <- vars.indices; j <- i until vars.size } {
      val (sx, sy, sxy) = (s1(i), s1(j), s2(i, j))
      val cov = (n * sxy - sx * sy) / (n * (n - 1.0))
      val corr = (n * sxy - sx * sy) /
        (math.sqrt(n * s2(i, i) - sx * sx) *
          math.sqrt(n * s2(j, j) - sy * sy))
      val g = got((vars(i), vars(j)))
      assert(g._1 == rows.length.toLong)
      assert(g._2 == cov, s"cov ${vars(i)}${vars(j)} (bitwise)")
      assert(g._3 == corr, s"corr ${vars(i)}${vars(j)} (bitwise)")
    }
    // diagonals are r = 1 up to the sqrt(v)*sqrt(v) rounding step
    // (the formula is shared text, so both engines carry the same
    // last-ulp excursion) and cov = sample variance > 0
    vars.foreach { v =>
      assert(math.abs(got((v, v))._3 - 1.0) < 1e-12)
      assert(got((v, v))._2 > 0.0)
    }
    // off-diagonals are real correlations: inside [-1, 1], not NaN,
    // and not identically zero (the synthetic measures are
    // independent draws, so they're small — but never exactly 0)
    val off = got.filter { case ((a, b), _) => a != b }.values
    off.foreach { case (_, _, c) =>
      assert(!c.isNaN && math.abs(c) <= 1.0)
    }
    assert(off.exists(_._3 != 0.0))
  }

  test("q_return_rates Wilson bound is sane and replay-exact") {
    val got = StatsOps.qReturnRates(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val rows = spark.sql(
      s"""SELECT p_brand, l_returnflag
         |FROM parquet.`$sf/lineitem.parquet`
         |JOIN parquet.`$sf/part.parquet` ON l_partkey = p_partkey
         |""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val z = 1.96
    val exp = rows.groupBy(_._1).map { case (b, rs) =>
      val n = rs.size.toLong
      val r = rs.count(_._2 == "R").toLong
      val (nd, rd) = (n.toDouble, r.toDouble)
      val ph = rd / nd
      val wl = 1000000.0 * ((ph + z * z / (2.0 * nd) -
        z * math.sqrt((ph * (1.0 - ph) + z * z / (4.0 * nd)) / nd)) /
        (1.0 + z * z / nd))
      b -> (n, r, r * 1000000L / n, wl)
    }
    assert(got.keySet == exp.keySet)
    exp.foreach { case (b, (n, r, ppm, wl)) =>
      assert(got(b)._1 == n && got(b)._2 == r && got(b)._3 == ppm)
      assert(got(b)._4 == wl, s"$b wilson (bitwise)")
    }
    // the bound is strictly below the point rate (r>0 everywhere on
    // the fixture) and never negative
    got.values.foreach { case (_, r, ppm, wl) =>
      if (r > 0) assert(wl < ppm.toDouble && wl > 0.0)
    }
  }

  test("q_cramers_v replays the integer chi2 and normalizes into [0,1]") {
    val r = StatsOps.qCramersV(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val raw = Tables.load(spark, sf, "documents")
      .select("lang", "source").collect()
      .map(x => (x.getString(0), x.getString(1)))
    val n = raw.length.toLong
    val rt = raw.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    val ct = raw.groupBy(_._2).map { case (k, g) => k -> g.size.toLong }
    val obs = raw.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    // keys.toSeq: a Set-typed comprehension would DEDUP equal cell
    // values and silently undercount the sum
    val chi2Micro = (for { l <- rt.keys.toSeq; s0 <- ct.keys.toSeq } yield {
      val dev = BigInt(obs.getOrElse((l, s0), 0L)) * n -
        BigInt(rt(l)) * ct(s0)
      (dev * dev * 1000000 / (BigInt(n) * rt(l) * ct(s0))).toLong
    }).sum
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("n_langs") == rt.size.toLong)
    assert(row.getAs[Long]("n_sources") == ct.size.toLong)
    assert(row.getAs[Long]("chi2_micro") == chi2Micro)
    val v = math.sqrt(chi2Micro.toDouble / (1000000.0 * n.toDouble *
      math.min(rt.size - 1, ct.size - 1).toDouble))
    assert(row.getAs[Double]("cramers_v") == v, "V (bitwise)")
    // near-independent synthetic mix: V must be small but nonzero
    assert(v > 0.0 && v < 0.5)
  }

  test("q_proportion_test replays both proportions and the pooled z") {
    val r = StatsOps.qProportionTest(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val raw = Tables.load(spark, sf, "lineitem")
      .select("l_discount", "l_returnflag").collect()
      .map(x => (x.getDouble(0) > 0.05, x.getString(1) == "R"))
    val n1 = raw.count(_._1).toLong
    val x1 = raw.count(t => t._1 && t._2).toLong
    val n2 = raw.length - n1
    val x2 = raw.count(t => !t._1 && t._2).toLong
    assert(row.getAs[Long]("n1") == n1 && row.getAs[Long]("x1") == x1)
    assert(row.getAs[Long]("n2") == n2 && row.getAs[Long]("x2") == x2)
    assert(row.getAs[Long]("diff_ppm") ==
      x1 * 1000000L / n1 - x2 * 1000000L / n2)
    val p = (x1 + x2).toDouble / (n1 + n2).toDouble
    val z = (x1.toDouble / n1.toDouble - x2.toDouble / n2.toDouble) /
      math.sqrt(p * (1.0 - p) * (1.0 / n1.toDouble + 1.0 / n2.toDouble))
    assert(row.getAs[Double]("z") == z, "z (bitwise)")
    // both groups populated; return flags independent of discount on
    // the fixture, so the diff is small relative to the rates
    assert(n1 > 0 && n2 > 0 && x1 > 0 && x2 > 0)
  }

  test("q_bfs_reach labels minimal hops exactly like a driver-side BFS") {
    val got = StatsOps.qBfsReach(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // driver-side graph + BFS replay
    val li = Tables.load(spark, sf, "lineitem")
      .filter(col("l_partkey") % StatsOps.triModulus === 0)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = li.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.distinct.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    val sources = Tables.load(spark, sf, "part")
      .filter(col("p_partkey") % StatsOps.bfsSourceModulus === 0)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    var visited = sources.map(_ -> 0L).toMap
    var frontier = sources
    (1 to StatsOps.bfsMaxHops).foreach { h =>
      val next = frontier.flatMap(p => adj.getOrElse(p, Seq.empty))
        .diff(visited.keySet)
      visited = visited ++ next.map(_ -> h.toLong)
      frontier = next
    }
    assert(got == visited, "min-hop labels must match the driver BFS")
    // every source is present at hop 0 and the frontier advanced
    assert(sources.forall(sp => got(sp) == 0L))
    // the sf0.001 co-purchase graph is near-small-world: everything
    // reachable is within 2 hops, so the horizon itself stays empty —
    // require real multi-hop expansion, not the full horizon
    assert(got.values.exists(_ >= 2L),
      "the frontier must advance beyond direct neighbors")
  }

  test("q_shortest_path labels match a driver-side Bellman-Ford replay") {
    val got = StatsOps.qShortestPath(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // driver-side weighted graph + bounded relaxation replay
    val li = Tables.load(spark, sf, "lineitem")
      .filter(col("l_partkey") % StatsOps.triModulus === 0)
      .select(col("l_orderkey"), col("l_partkey"),
        expr("cast(cast(l_quantity as decimal(12,2)) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w = li.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(t => (t._2, t._3)).toSeq
      for ((a, qa) <- ps; (b, qb) <- ps if a != b) yield ((a, b), qa + qb)
    }.groupBy(_._1).map { case (ab, es) => ab -> es.map(_._2).min }
    val adj = w.toSeq.map { case ((a, b), c) => (a, b, c) }
      .groupBy(_._1).map { case (a, es) => a -> es.map(t => (t._2, t._3)) }
    val sources = Tables.load(spark, sf, "part")
      .filter(col("p_partkey") % StatsOps.bfsSourceModulus === 0)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    var dist = sources.map(_ -> 0L).toMap
    (1 to StatsOps.bfsMaxHops).foreach { _ =>
      val relaxed = dist.toSeq.flatMap { case (p, c) =>
        adj.getOrElse(p, Seq.empty).map { case (b, ew) => b -> (c + ew) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (p, cs) => p -> cs.map(_._2).min }
    }
    assert(got == dist, "cost labels must match the driver Bellman-Ford")
    assert(sources.forall(sp => got(sp) == 0L), "seeds label 0")
    // non-vacuity: relaxation found real multi-edge routes (some node
    // is cheapest via a path, not a direct edge from a seed)
    val oneHop = sources.flatMap(p =>
      adj.getOrElse(p, Seq.empty).map(_._1)) ++ sources
    assert(got.keySet.diff(oneHop).nonEmpty,
      "some node must be reached only through an intermediate")
  }

  test("q_multireg betas solve the normal equations bitwise per group") {
    val rows = StatsOps.qMultireg(spark, sf).collect()
    assert(rows.nonEmpty)
    val flag = rows.head.getString(0)
    val raw = Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag") === flag)
      .select(
        expr("cast(cast(l_quantity as decimal(12,2)) as bigint)"),
        expr("cast(cast(l_discount as decimal(12,3)) * 1000 as bigint)"),
        expr("cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)"
          + " div 100"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = raw.length.toLong
    val (s1, s2, sy) = (raw.map(_._1).sum, raw.map(_._2).sum,
      raw.map(_._3).sum)
    val s11 = raw.map(t => t._1 * t._1).sum
    val s22 = raw.map(t => t._2 * t._2).sum
    val s12 = raw.map(t => t._1 * t._2).sum
    val s1y = raw.map(t => t._1 * t._3).sum
    val s2y = raw.map(t => t._2 * t._3).sum
    val syy = raw.map(t => t._3 * t._3).sum
    val a11 = s11.toDouble - s1.toDouble * s1.toDouble / n.toDouble
    val a12 = s12.toDouble - s1.toDouble * s2.toDouble / n.toDouble
    val a22 = s22.toDouble - s2.toDouble * s2.toDouble / n.toDouble
    val b1v = s1y.toDouble - s1.toDouble * sy.toDouble / n.toDouble
    val b2v = s2y.toDouble - s2.toDouble * sy.toDouble / n.toDouble
    val det = a11 * a22 - a12 * a12
    val beta1 = (a22 * b1v - a12 * b2v) / det
    val beta2 = (a11 * b2v - a12 * b1v) / det
    val icpt = sy.toDouble / n.toDouble -
      ((a22 * b1v - a12 * b2v) / det) * (s1.toDouble / n.toDouble) -
      ((a11 * b2v - a12 * b1v) / det) * (s2.toDouble / n.toDouble)
    val r2 = (((a22 * b1v - a12 * b2v) / det) * b1v +
      ((a11 * b2v - a12 * b1v) / det) * b2v) /
      (syy.toDouble - sy.toDouble * sy.toDouble / n.toDouble)
    val r0 = rows.head
    assert(r0.getAs[Long]("n") == n)
    assert(r0.getAs[Double]("beta_qty") == beta1, "beta_qty (bitwise)")
    assert(r0.getAs[Double]("beta_disc") == beta2, "beta_disc (bitwise)")
    assert(r0.getAs[Double]("intercept") == icpt, "intercept (bitwise)")
    assert(r0.getAs[Double]("r2") == r2, "r2 (bitwise)")
    // sanity: a real (non-degenerate) system was solved — prices on
    // the fixture are random draws, so only structure is asserted,
    // not a direction
    assert(det != 0.0 && !det.isNaN)
    assert(!beta1.isNaN && !beta2.isNaN && (beta1 != 0.0 || beta2 != 0.0))
    assert(r2 >= 0.0 && r2 <= 1.0)
    // residual check: gradient of SSE at the solution is ~0 relative
    // to its natural scale (the normal equations actually hold)
    val g1 = a11 * beta1 + a12 * beta2 - b1v
    val g2 = a12 * beta1 + a22 * beta2 - b2v
    assert(math.abs(g1) / (math.abs(b1v) + 1.0) < 1e-9)
    assert(math.abs(g2) / (math.abs(b2v) + 1.0) < 1e-9)
  }

  test("q_link_predict scores exactly the non-adjacent shared-neighbor pairs") {
    val rows = StatsOps.qLinkPredict(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver-side graph replay
    val li = Tables.load(spark, sf, "lineitem")
      .filter(col("l_partkey") % StatsOps.triModulus === 0)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    val nbr = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val exp = (for {
      (a, na) <- nbr.toSeq; (b, nb) <- nbr.toSeq
      if a < b && !edges((a, b))
      cnv = (na & nb).size.toLong if cnv >= StatsOps.linkMinCommon
    } yield (a, b) -> ((cnv, na.size.toLong, nb.size.toLong,
      cnv * 1000000L / (na.size + nb.size - cnv)))).toMap
    val got = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == exp, "candidate set + scores must replay exactly")
    // non-vacuity: predictions exist and scores discriminate
    assert(got.values.map(_._4).toSeq.distinct.length > 1)
    // no predicted pair is an existing edge
    assert(got.keys.forall { case (a, b) => !edges((a, b)) })
  }

  test("q_welch_ttest replays t and df bitwise from raw quantities") {
    val row = StatsOps.qWelchTtest(spark, sf).collect().head
    val raw = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag") === "R",
        expr("cast(cast(l_quantity as decimal(12,2)) as bigint)"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    def stats(g: Array[Long]) =
      (g.length.toLong, g.sum, g.map(x => x * x).sum)
    val (n1, sx1, sxx1) = stats(raw.filter(_._1).map(_._2))
    val (n2, sx2, sxx2) = stats(raw.filterNot(_._1).map(_._2))
    assert(row.getAs[Long]("n1") == n1 && row.getAs[Long]("n2") == n2)
    assert(row.getAs[Long]("mean1_milli") == sx1 * 1000 / n1)
    assert(row.getAs[Long]("mean2_milli") == sx2 * 1000 / n2)
    val m1 = sx1.toDouble / n1.toDouble
    val m2 = sx2.toDouble / n2.toDouble
    val v1 = (sxx1.toDouble - sx1.toDouble * sx1.toDouble / n1.toDouble) /
      (n1.toDouble - 1.0)
    val v2 = (sxx2.toDouble - sx2.toDouble * sx2.toDouble / n2.toDouble) /
      (n2.toDouble - 1.0)
    val se2 = v1 / n1.toDouble + v2 / n2.toDouble
    val t = (m1 - m2) / math.sqrt(se2)
    val df = (se2 * se2) /
      ((v1 / n1.toDouble) * (v1 / n1.toDouble) / (n1.toDouble - 1.0) +
        (v2 / n2.toDouble) * (v2 / n2.toDouble) / (n2.toDouble - 1.0))
    assert(row.getAs[Double]("t") == t, "t (bitwise)")
    assert(row.getAs[Double]("df") == df, "df (bitwise)")
    // both groups populated; df between min(n)-1 and n1+n2-2
    assert(n1 > 1 && n2 > 1)
    assert(df >= math.min(n1, n2).toDouble - 1.0 - 1e-9 &&
      df <= (n1 + n2).toDouble - 2.0 + 1e-9)
  }

  test("q_kendall_tau pair counts conserve and replay bitwise") {
    val rows = StatsOps.qKendallTau(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val n0 = n * (n - 1) / 2
      val counted = r.getAs[Long]("conc") + r.getAs[Long]("disc") +
        r.getAs[Long]("tie_x") + r.getAs[Long]("tie_y") +
        r.getAs[Long]("tie_xy")
      assert(counted == n0, s"pair counts must cover all $n0 pairs")
      val tau = r.getAs[Double]("tau")
      assert(tau >= -1.0 && tau <= 1.0, s"tau out of range: $tau")
    }
    // driver-side replay of one supplier's counts + tau, bitwise
    val skTarget = rows.head.getAs[Long]("l_suppkey")
    val raw = Tables.load(spark, sf, "lineitem")
      .filter(col("l_linenumber") === 1 && col("l_suppkey") === skTarget)
      .select(col("l_orderkey"), col("l_partkey"),
        expr("cast(cast(l_quantity as decimal(12,2)) as bigint)"),
        expr("cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ps = for {
      x <- raw; y <- raw
      if x._1 < y._1 || (x._1 == y._1 && x._2 < y._2)
    } yield ((x._3 - y._3) * (x._4 - y._4), x._3 == y._3, x._4 == y._4)
    val conc = ps.count(_._1 > 0).toLong
    val disc = ps.count(_._1 < 0).toLong
    val n1 = ps.count(_._2).toLong
    val n2 = ps.count(_._3).toLong
    val n0 = raw.length.toLong * (raw.length - 1) / 2
    val tau = (conc.toDouble - disc.toDouble) /
      math.sqrt((n0.toDouble - n1.toDouble) * (n0.toDouble - n2.toDouble))
    val r0 = rows.head
    assert(r0.getAs[Long]("conc") == conc && r0.getAs[Long]("disc") == disc)
    assert(r0.getAs[Long]("tie_x") + r0.getAs[Long]("tie_xy") == n1)
    assert(r0.getAs[Long]("tie_y") + r0.getAs[Long]("tie_xy") == n2)
    assert(r0.getAs[Double]("tau") == tau, "tau (bitwise)")
    // non-vacuity: quantity ties exist on the fixture (50 levels)
    assert(rows.exists(_.getAs[Long]("tie_x") > 0L))
  }

  /** Driver-side doubled average ranks (2·avgrank) of a value
    * sequence — the exact-integer tie convention q_spearman and
    * q_mannwhitney are built on. */
  private def doubledAvgRanks(vs: Seq[Long]): Seq[Long] = {
    val sorted = vs.sorted
    val firstIdx = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> g.map(_._2).min }
    val cnt = vs.groupBy(identity).map { case (v, g) => v -> g.size }
    vs.map(v => 2L * (firstIdx(v) + 1) + cnt(v) - 1)
  }

  test("q_spearman replays rho from driver-side average ranks") {
    val rows = StatsOps.qSpearman(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho = r.getAs[Double]("rho")
      assert(rho >= -1.0 && rho <= 1.0, s"rho out of range: $rho")
    }
    // bitwise replay for every supplier at sf0.001
    val raw = spark.sql(
      s"""SELECT l_suppkey,
         |  cast(cast(l_quantity as decimal(12,2)) as bigint) AS q,
         |  cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)
         |    AS p
         |FROM parquet.`$sf/lineitem.parquet`""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = raw.groupBy(_._1).map { case (sk, g) =>
      val rx = doubledAvgRanks(g.map(_._2).toSeq)
      val ry = doubledAvgRanks(g.map(_._3).toSeq)
      val n = g.size.toDouble
      def d(s: Seq[BigInt]) = s.sum.toDouble
      val (sx, sy) = (d(rx.map(BigInt(_))), d(ry.map(BigInt(_))))
      val sxx = d(rx.map(v => BigInt(v) * v))
      val syy = d(ry.map(v => BigInt(v) * v))
      val sxy = d(rx.zip(ry).map { case (a, b) => BigInt(a) * b })
      sk -> ((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
    }
    val got = rows.map(r =>
      r.getAs[Long]("l_suppkey") -> r.getAs[Double]("rho")).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (sk, rho) =>
      assert(got(sk) == rho, s"supplier $sk rho (bitwise)")
    }
    // ranks must actually vary: at least one supplier's rho is
    // neither 0 nor ±1 (a degenerate rank mapping would collapse)
    assert(got.values.exists(r => r != 0.0 && math.abs(r) != 1.0))
  }

  test("q_ks_test replays the ECDF max gap exactly") {
    val r = StatsOps.qKsTest(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val raw = spark.sql(
      s"""SELECT cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)
         |    AS v,
         |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
         |FROM parquet.`$sf/orders.parquet`""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val n1 = raw.count(_._2 == 1).toLong
    val n2 = raw.length - n1
    // walk the ECDF over sorted distinct values
    var (f1, f2, best, bestV) = (0L, 0L, -1L, 0L)
    raw.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (v, g) =>
      f1 += g.count(_._2 == 1); f2 += g.count(_._2 == 0)
      val gap = math.abs(f1 * n2 - f2 * n1)
      if (gap > best) { best = gap; bestV = v }
    }
    assert(row.getAs[Long]("n1") == n1 && row.getAs[Long]("n2") == n2)
    assert(row.getAs[Long]("d_num") == best)
    assert(row.getAs[Long]("at_cents") == bestV)
    assert(row.getAs[Double]("ks_d") ==
      best.toDouble / (n1.toDouble * n2.toDouble), "ks_d (bitwise)")
    // the two priority classes draw prices from the same synthetic
    // distribution: D must be small but the numerator nonzero
    assert(best > 0L && row.getAs[Double]("ks_d") < 0.5)
  }

  test("q_mannwhitney replays U and z from driver-side ranks") {
    val r = StatsOps.qMannWhitney(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val raw = spark.sql(
      s"""SELECT cast(cast(l_quantity as decimal(12,2)) as bigint) AS v,
         |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g
         |FROM parquet.`$sf/lineitem.parquet`""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val n1 = raw.count(_._2 == 1).toLong
    val n2 = raw.length - n1
    val r2 = doubledAvgRanks(raw.map(_._1).toSeq)
    val r1x2 = raw.zip(r2).filter(_._1._2 == 1).map(_._2).sum
    val u1x2 = 2L * n1 * n2 + n1 * (n1 + 1) - r1x2
    val cnt = raw.groupBy(_._1).map(_._2.size.toLong)
    val ties = cnt.map(t => t * t * t - t).sum
    assert(row.getAs[Long]("n1") == n1 && row.getAs[Long]("n2") == n2)
    assert(row.getAs[Long]("r1_x2") == r1x2)
    assert(row.getAs[Long]("u1_x2") == u1x2)
    assert(row.getAs[Long]("tie_cubes") == ties)
    val nd1 = n1.toDouble; val nd2 = n2.toDouble
    val z = (u1x2.toDouble / 2.0 - nd1 * nd2 / 2.0) /
      math.sqrt(nd1 * nd2 / 12.0 * (nd1 + nd2 + 1.0 -
        ties.toDouble / ((nd1 + nd2) * (nd1 + nd2 - 1.0))))
    assert(row.getAs[Double]("z") == z, "z (bitwise)")
    // return flags are independent of quantity on the fixture: |z|
    // must be finite and the tie correction nonzero (50 fat ties)
    assert(!row.getAs[Double]("z").isNaN && ties > 0L)
  }

  test("q_diversity replays Simpson per source and orders sources") {
    val rows = StatsOps.qDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables.load(spark, sf, "documents")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val exp = raw.groupBy(_._1).map { case (src, g) =>
      val per = g.groupBy(_._2).map(_._2.size.toLong)
      val n = g.size.toLong
      val num = per.map(c => c * (c - 1)).sum
      src -> ((n, per.size.toLong, num,
        num.toDouble / (n.toDouble * (n.toDouble - 1.0))))
    }
    val got = rows.map(r => r.getString(0) -> ((r.getLong(1),
      r.getLong(2), r.getLong(3), r.getAs[Double]("simpson")))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (src, (n, langs, num, simpson)) =>
      val g = got(src)
      assert(g._1 == n && g._2 == langs && g._3 == num)
      assert(g._4 == simpson, s"$src simpson (bitwise)")
      assert(got(src)._4 >= 0.0 && got(src)._4 <= 1.0)
    }
    // gini_simpson is the exact complement under the shared tree
    rows.foreach { r =>
      assert(r.getAs[Double]("gini_simpson") ==
        1.0 - r.getAs[Double]("simpson"))
    }
  }

  test("q_dbscan_grid equals a brute-force O(n²) DBSCAN replay — the " +
    "grid join is blocking-complete and labels are exact") {
    val got = StatsOps.qDbscanGrid(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toMap
    assert(got.nonEmpty)
    // replay the planted cloud from the formulas
    def off(pid: Long, m: Long): Long =
      if (pid % 20 == 13) m * 50 else if (pid % 20 == 7) m * 3 else m
    val pts = got.keys.toSeq.sorted.map { pid =>
      val x = 10000 + ((pid / 20) * 9176) % 100000 +
        off(pid, (pid * 37) % 101 - 50)
      val y = 10000 + ((pid / 20) * 5351) % 100000 +
        off(pid, (pid * 53) % 101 - 50)
      (pid, x, y)
    }
    pts.foreach { case (pid, x, y) =>
      assert((got(pid)._1, got(pid)._2) == ((x, y)), s"point $pid moved") }
    // brute-force neighbors (NO grid): proves the 9-cell join missed
    // no pair — the blocking-completeness claim
    val nbrs = pts.map { case (pid, x, y) =>
      pid -> pts.filter { case (_, bx, by) =>
        (x - bx) * (x - bx) + (y - by) * (y - by) <= StatsOps.dbscanEps2
      }.map(_._1)
    }.toMap
    val cores = nbrs.filter(_._2.size >= StatsOps.dbscanMinPts).keySet
    // union-find over core-core eps-edges
    val parent = scala.collection.mutable.Map(
      cores.toSeq.map(c => c -> c): _*)
    def find(p: Long): Long = {
      var r = p; while (parent(r) != r) r = parent(r)
      r
    }
    cores.foreach(c => nbrs(c).filter(b => b != c && cores(b)).foreach { b =>
      val (ra, rb) = (find(c), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    })
    val cluster = cores.map(c => c -> cores.filter(o => find(o) == find(c)).min)
      .toMap
    pts.foreach { case (pid, _, _) =>
      val (_, _, nN, role, cl) = got(pid)
      assert(nN == nbrs(pid).size, s"$pid neighbor count")
      if (cores(pid)) {
        assert(role == "core" && cl.contains(cluster(pid)), s"$pid core")
      } else {
        val coreNbrs = nbrs(pid).filter(b => b != pid && cores(b))
        if (coreNbrs.nonEmpty)
          assert(role == "border" &&
            cl.contains(coreNbrs.map(cluster).min), s"$pid border")
        else assert(role == "noise" && cl.isEmpty, s"$pid noise")
      }
    }
    // every classification branch is really exercised by the fixture
    Seq("core", "border", "noise").foreach(r =>
      assert(got.values.exists(_._4 == r), s"no $r points in fixture"))
  }
}
