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

  /** The shared scan core: `df` plus `out` = exclusive prefix sum of
    * `value` in `keys` order, and the grand total. `value = 1` makes
    * `out + 1` an exact global rank; a token/byte count makes it the
    * packing scan. */
  def withExclusiveSum(s: SparkSession, df: DataFrame, keys: Seq[Column],
      value: Column, out: String): (DataFrame, Long) = {
    val nRange = s.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = df.repartitionByRange(nRange, keys: _*)
      .withColumn("__v", value.cast("long"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin pid: offsets + scan must see one layout
    val totals = parts.groupBy("__pid").agg(sum(col("__v")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = (totals.keySet + (-1)).max + 1
    val offsets = new Array[Long](nParts + 1)
    (1 to nParts).foreach(i =>
      offsets(i) = offsets(i - 1) + totals.getOrElse(i - 1, 0L))
    val w = Window.partitionBy(col("__pid")).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scanned = parts.withColumn(out,
        sum(col("__v")).over(w) - col("__v") +
          element_at(typedlit(offsets.take(nParts).toSeq), col("__pid") + 1))
      .drop("__pid", "__v")
    (scanned, offsets(nParts))
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
