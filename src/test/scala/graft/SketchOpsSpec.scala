package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SketchOps

class SketchOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def hash(x: Long): Long = (742938285L * x + 11213L) % SketchOps.kmvP

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
