package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ROW_NUMBER / prefix sums without the one-reducer sort.
  *
  * A global `row_number() OVER (ORDER BY …)` (or a global running
  * SUM) funnels the whole frame through a single partition — the
  * classic scale trap. This helper is the factored form of the
  * decomposition several keys proved out inline (text_pack_sequences'
  * token prefix scan, pipeline_curriculum's difficulty rank,
  * q_pareto_share's revenue cumsum):
  *
  *   1. `repartitionByRange` on the order key → contiguous key ranges,
  *      one per shuffle partition, all partitions working in parallel;
  *   2. bucket-local window per partition (no extra exchange beyond
  *      the pid-grain window shuffle);
  *   3. per-partition totals (O(partitions) rows) prefix-summed
  *      DRIVER-side into offsets added back to the local values.
  *
  * The driver-side collect is O(shuffle partitions) — thousands of
  * longs at cluster scale, never data — and `localCheckpoint` pins the
  * partition layout so the offsets and the scan cannot see two
  * different shuffles of the same nondeterministic-ordered input.
  *
  * The order key must be TOTAL (append a unique id as the last column)
  * or values within a tie are partition-order-dependent.
  */
object GlobalRank {

  /** The shared scan core, multi-value form: ONE range partition +
    * ONE localCheckpoint + ONE pid-grain window yield the exclusive
    * prefix sum of EVERY column in `values` simultaneously (in `keys`
    * order), plus each value's grand total. The per-partition totals
    * frame stays O(partitions) rows no matter how many values ride
    * the scan, so a two-statistic consumer (the KS test's two ECDFs)
    * pays exactly one corpus pass, like a one-statistic consumer —
    * and the returned totals mean callers never pay a separate
    * corpus count/sum the scan already holds. */
  def withExclusiveSums(s: SparkSession, df: DataFrame, keys: Seq[Column],
      values: Seq[Column], outs: Seq[String]): (DataFrame, Seq[Long]) = {
    require(values.nonEmpty && values.length == outs.length,
      "one output name per scanned value")
    val nRange = s.conf.get("spark.sql.shuffle.partitions").toInt
    val vCols = values.indices.map(i => s"__v$i")
    val parts = values.indices.foldLeft(
        df.repartitionByRange(nRange, keys: _*)) { (d, i) =>
        d.withColumn(vCols(i), values(i).cast("long"))
      }
      .withColumn("__pid", spark_partition_id())
      // LAZY pin (r14): the totals collect right below aggregates
      // EVERY partition, so the checkpoint materializes inside that
      // job — the layout is pinned by the cached blocks exactly as
      // with eager, one fewer job per scan. offsets + scan still see
      // one layout.
      .localCheckpoint(eager = false)
    val totals = parts.groupBy("__pid").agg(
        sum(col(vCols.head)).as("t0"),
        vCols.tail.zipWithIndex.map { case (c, i) =>
          sum(col(c)).as(s"t${i + 1}") }: _*)
      .collect()
      // an all-NULL partition sums to NULL — treat as contributing 0
      // to the running offsets instead of NPE-ing the driver
      .map(r => r.getInt(0) -> values.indices.map(i =>
        if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)))
      .toMap
    val nParts = (totals.keySet + (-1)).max + 1
    val offsets = values.indices.map(_ => new Array[Long](nParts + 1))
    (1 to nParts).foreach { p =>
      val t = totals.get(p - 1)
      values.indices.foreach(i =>
        offsets(i)(p) = offsets(i)(p - 1) + t.map(_(i)).getOrElse(0L))
    }
    val w = Window.partitionBy(col("__pid")).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scanned = values.indices.foldLeft(parts) { (d, i) =>
      d.withColumn(outs(i),
        sum(col(vCols(i))).over(w) - col(vCols(i)) +
          element_at(typedlit(offsets(i).take(nParts).toSeq),
            col("__pid") + 1))
    }.drop("__pid" +: vCols: _*)
    (scanned, values.indices.map(i => offsets(i)(nParts)))
  }

  /** Single-value convenience over [[withExclusiveSums]]: `df` plus
    * `out` = exclusive prefix sum of `value` in `keys` order, and the
    * grand total. `value = 1` makes `out + 1` an exact global rank; a
    * token/byte count makes it the packing scan. */
  def withExclusiveSum(s: SparkSession, df: DataFrame, keys: Seq[Column],
      value: Column, out: String): (DataFrame, Long) = {
    val (scanned, ts) =
      withExclusiveSums(s, df, keys, Seq(value), Seq(out))
    (scanned, ts.head)
  }

  /** Segmented dense numbering: `out` = 0-based rank within `segment`
    * (an INT column in [0, nSeg), small — aspect buckets, phases) in
    * `keys` order, plus each segment's total count. Same decomposition
    * with the segment joined into both the range key and the window
    * key; the driver-side offset table is O(partitions × nSeg) longs —
    * model-sized, never data. */
  def withSegmentedCount(s: SparkSession, df: DataFrame, segment: Column,
      nSeg: Int, keys: Seq[Column], out: String): (DataFrame, Seq[Long]) = {
    require(nSeg > 0, "at least one segment")
    val nRange = s.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = df.repartitionByRange(nRange, segment +: keys: _*)
      .withColumn("__seg", segment.cast("int"))
      .withColumn("__pid", spark_partition_id())
      // LAZY pin — same rationale as withExclusiveSums above.
      .localCheckpoint(eager = false)
    val perPart = parts.groupBy("__pid", "__seg").count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val nParts = (perPart.keySet.map(_._1) + 0).max + 1
    // exclusive prefix per segment across pid order, flattened to a
    // lookup array indexed pid·nSeg + seg
    val offsets = new Array[Long](nParts * nSeg)
    (0 until nSeg).foreach { b =>
      var acc = 0L
      (0 until nParts).foreach { p =>
        offsets(p * nSeg + b) = acc
        acc += perPart.getOrElse((p, b), 0L)
      }
    }
    val segTotals = (0 until nSeg).map(b =>
      perPart.collect { case ((_, bb), c) if bb == b => c }.sum)
    val w = Window.partitionBy(col("__pid"), col("__seg"))
      .orderBy(keys: _*)
    val scanned = parts.withColumn(out,
        row_number().over(w).cast("long") - 1L +
          element_at(typedlit(offsets.toSeq),
            col("__pid") * nSeg + col("__seg") + 1))
      .drop("__pid", "__seg")
    (scanned, segTotals)
  }

  /** `df` plus a 1-based exact global rank over `keys`, named `out`,
    * and the total row count (already computed by the scan — callers
    * that need n must not pay another corpus pass). */
  def withRankAndTotal(s: SparkSession, df: DataFrame, keys: Seq[Column],
      out: String): (DataFrame, Long) = {
    val (scanned, n) = withExclusiveSum(s, df, keys, lit(1L), out)
    (scanned.withColumn(out, col(out) + 1L), n)
  }

  /** `df` plus a 1-based exact global rank over `keys`, named `out`. */
  def withRank(s: SparkSession, df: DataFrame, keys: Seq[Column],
      out: String): DataFrame =
    withRankAndTotal(s, df, keys, out)._1
}
