package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SketchOps

class SketchOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def hash(x: Long): Long = (742938285L * x + 11213L) % SketchOps.kmvP

  test("portable hashes stay in range for NEGATIVE keys (floorMod contract)") {
    // r10 ADVICE: plain % keeps the dividend's sign, so a negative key
    // would land outside [0, p) (KMV) / outside {-1,+1} (AMS sign) —
    // guard the floorMod fix on both families
    Seq(-1L, -12345L, -2100000000L, 0L, 7L).foreach { k =>
      val h = SketchOps.kmvHash(k)
      assert(h >= 0 && h < SketchOps.kmvP, s"kmvHash($k) = $h out of range")
      (0 until 4).foreach { j =>
        val s = graft.functions.AmsSketch.sign(j, k)
        assert(s == 1L || s == -1L, s"sign($j, $k) = $s not in {-1,+1}")
      }
    }
    // and the positive-key values are UNCHANGED by the floorMod switch
    // (the oracle parity the board already proved)
    assert(SketchOps.kmvHash(7L) == hash(7L))
  }

  test("q_kmv_distinct: sketch replays driver-side, exact-when-small, " +
    "estimate bounded, union row merges exactly") {
    val rows = SketchOps.qKmvDistinct(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(rows.nonEmpty)
    val byGrp = rows.map(t => t._1 -> t).toMap
    assert(byGrp.contains("ALL"))

    // ground truth per group from the raw table
    val raw = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_custkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val perGrp = raw.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val globalKeys = raw.map(_._2).toSet

    rows.foreach { case (grp, nExact, nKept, kth, est) =>
      val keys = if (grp == "ALL") globalKeys else perGrp(grp)
      assert(nExact == keys.size, s"$grp n_exact")
      // replay the sketch: bottom-K distinct hashes
      val hs = keys.toSeq.map(hash).distinct.sorted
      val kept = hs.take(SketchOps.kmvK)
      assert(nKept == kept.size, s"$grp n_kept")
      assert(kth == kept.max, s"$grp kth_hash must replay exactly")
      if (nKept < SketchOps.kmvK)
        assert(est == nKept.toDouble, s"$grp small sketches are exact")
      else {
        // replay the estimator bitwise and bound its error
        val expected =
          (SketchOps.kmvK - 1).toDouble * SketchOps.kmvP.toDouble /
            (kth.toDouble + 1.0)
        assert(est == expected, s"$grp estimate must replay bitwise")
        assert(math.abs(est - nExact) <= 0.3 * nExact,
          s"$grp estimate off by >30%: est=$est exact=$nExact")
      }
    }

    // mergeability: the ALL row (computed from the per-group sketches
    // alone) must equal the DIRECT global bottom-K sketch
    val directKth = globalKeys.toSeq.map(hash).distinct.sorted
      .take(SketchOps.kmvK).max
    assert(byGrp("ALL")._4 == directKth,
      "union-of-sketches must equal the direct global sketch")
  }

  test("q_kmv_jaccard: pairwise estimates replay from the kept sets " +
    "alone and track the exact overlap") {
    val rows = SketchOps.qKmvJaccard(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getDouble(9)))
    val raw = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_custkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sets = raw.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val grps = sets.keys.toSeq.sorted
    // the full upper-triangle pair grid is present
    assert(rows.length == grps.size * (grps.size - 1) / 2)
    rows.foreach { case (a, b, nA, nB, nInt, kInt, jEst, jExact, uEst, iEst) =>
      assert(a < b)
      val (sa, sb) = (sets(a), sets(b))
      assert(nA == sa.size && nB == sb.size)
      assert(nInt == (sa & sb).size)
      assert(jExact ==
        nInt.toDouble / (nA + nB - nInt).toDouble)
      // replay the sketch path: merged bottom-K of the union from the
      // two groups' kept sets ALONE (the mergeability contract)
      val keptA = sa.toSeq.map(hash).distinct.sorted.take(SketchOps.kmvK)
      val keptB = sb.toSeq.map(hash).distinct.sorted.take(SketchOps.kmvK)
      val merged = (keptA ++ keptB).distinct.sorted.take(SketchOps.kmvK)
      val expInt = merged.count(h => keptA.contains(h) && keptB.contains(h))
      assert(kInt == expInt, s"($a,$b) k_int")
      assert(jEst == kInt.toDouble / merged.size.toDouble)
      assert(iEst == jEst * uEst)
      // accuracy: the K=64 Jaccard estimator should land within 0.25
      // absolute of truth on the fixture (3 sigma is ~0.19 at J=0.5)
      assert(math.abs(jEst - jExact) <= 0.25,
        s"($a,$b) jaccard est $jEst vs exact $jExact")
    }
  }

  test("q_kmv_quantile: sample is the bottom-K distinct hashes, every " +
    "estimate replays by exact rank selection, and tracks the exact quantile") {
    val out = SketchOps.qKmvQuantile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        (3 to 8).map(i => r.getLong(i)))).toMap
    assert(out.nonEmpty)
    val raw = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def rank(m: Int, n: Long): Int = ((m * n + 999) / 1000).toInt
    raw.groupBy(_._1).foreach { case (grp, rows) =>
      val (nRows, nSample, cells) = out(grp)
      assert(nRows == rows.length, s"$grp n_rows")
      // replay the sketch: hash each key, resolve collisions by MIN
      // value, keep the bottom-K hashes, rank-select on (v, h)
      val byH = rows.groupBy(t => SketchOps.kmvHash(t._2))
        .view.mapValues(_.map(_._3).min).toSeq
      val kept = byH.sortBy(_._1).take(SketchOps.quantK)
      assert(nSample == kept.size, s"$grp n_sample")
      val sampleSorted = kept.map { case (h, v) => (v, h) }.sorted.map(_._1)
      val exactSorted = rows.map(_._3).sorted
      SketchOps.quantMilles.zipWithIndex.foreach { case (m, i) =>
        val est = cells(i)
        val exact = cells(i + SketchOps.quantMilles.size)
        assert(est == sampleSorted(rank(m, nSample) - 1),
          s"$grp p$m est must replay by rank selection")
        assert(exact == exactSorted(rank(m, nRows) - 1),
          s"$grp p$m exact must replay by rank selection")
        // accuracy: a K=256 uniform sample's rank error is ~1/√K of
        // the group — on the smooth totalprice distribution the VALUE
        // at the estimated rank stays within 25% of the true quantile
        assert(math.abs(est - exact).toDouble <= 0.25 * exact,
          s"$grp p$m est $est vs exact $exact out of band")
      }
    }
  }

  test("q_join_cardest: every AMS counter replays, sketches merge by " +
    "addition, and the median-of-means tracks the exact F2") {
    val p = SketchOps.kmvP
    def signFor(j: Int, k: Long): Long = {
      val c = (0 until 4).map(i =>
        ((j.toLong * 4 + i) * 2654435761L + 777 + i * 7919) % p)
      1 - 2 * (((((c(3) * k) % p + c(2)) * k % p + c(1)) * k % p + c(0))
        % p % 2)
    }
    val rows = SketchOps.qJoinCardest(spark, sf).collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getDouble(2)))
    val keys = Tables.load(spark, sf, "orders")
      .select("o_custkey").collect().map(_.getLong(0))
    val exact = keys.groupBy(identity).values
      .map(g => g.length.toLong * g.length).sum
    // every counter replays from the shared sign polynomial...
    val byId = rows.map(t => t._1 -> t).toMap
    val zs = (0 until SketchOps.amsEstimators).map { j =>
      val z = keys.map(signFor(j, _)).sum
      val (_, gotZ, gotEst) = byId(j)
      assert(gotZ.contains(z), s"estimator $j counter")
      assert(gotEst == (z * z).toDouble, s"estimator $j estimate")
      z
    }
    // ...and the counters are MERGEABLE: the sign sum over any split
    // of the stream adds (the partial-aggregation contract)
    val (l, r) = keys.splitAt(keys.length / 2)
    assert(l.map(signFor(7, _)).sum + r.map(signFor(7, _)).sum == zs(7))
    // summary rows: median-of-means and exact ride along
    val perG = SketchOps.amsEstimators / SketchOps.amsGroups
    val means = zs.map(z => (z * z).toDouble).grouped(perG)
      .map(g => g.sum / perG).toSeq.sorted
    val med = (means(SketchOps.amsGroups / 2 - 1) +
      means(SketchOps.amsGroups / 2)) / 2
    assert(byId(-1)._3 == med, "median-of-means replay")
    assert(byId(-2)._3 == exact.toDouble, "exact F2 row")
    // the estimator is fit for planning: within 2x of truth here
    assert(byId(-1)._3 >= exact * 0.5 && byId(-1)._3 <= exact * 2.0,
      s"AMS estimate ${byId(-1)._3} vs exact $exact out of band")
  }
}
