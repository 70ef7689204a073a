package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Oracle-checkable distinct sketches: KMV (k-minimum-values) bottom-k
  * summaries over a PORTABLE integer hash.
  *
  * The engine's other sketches (HLL `q_approx_distinct`, quantile
  * digest `q_approx_percentile`, Misra-Gries `q_heavy_hitters`) are
  * [T]-by-design: their internals are engine-specific, so the oracle
  * can only bound them. KMV closes that gap: the sketch IS k order
  * statistics of a hash both engines can compute exactly — here the
  * universal-family linear hash `(742938285·x + 11213) mod (2^31−1)`
  * in BIGINT arithmetic (no wraparound tricks: DuckDB errors on
  * BIGINT overflow where Spark wraps, so every intermediate stays
  * < 2^63 by construction — the product is ≤ 7.4e8·x, safe through
  * x ~ 1.2e10) — which makes the whole summary, its estimate
  * included, hash-exact against DuckDB ([O], not [T]). The
  * multiplier is L'Ecuyer's full-period MLCG constant for 2^31−1:
  * a SMALL multiplier (e.g. MINSTD's 48271) never wraps the modulus
  * for realistic key ranges, leaving the bottom of the hash space
  * empty and biasing the estimator ~30× high (measured); a
  * full-period multiplier this size wraps for every x ≥ 3 and
  * equidistributes (measured ≤ 11% error at every fixture SF, right
  * at the K=64 theoretical rsd).
  *
  * Estimator: distinct ≈ (K−1)·p / (h_(K)+1) with h_(K) the K-th
  * smallest distinct hash (Bar-Yossef et al. 2002; Beyer et al.,
  * SIGMOD'07 "On synopses for distinct-value estimation under
  * multiset operations"). When a group holds fewer than K distinct
  * values the sketch holds all of them and the estimate is exact.
  *
  * Why KMV at 100 TB when HLL exists: KMV summaries compose under
  * SET OPERATIONS — the bottom-K of a UNION is computable from the
  * operands' bottom-Ks alone (any global bottom-K hash is in its
  * group's bottom-K), and intersections/Jaccard fall out the same
  * way, which HLL registers cannot do. The ALL row below is computed
  * the MERGEABLE way — from the per-group sketches, never re-reading
  * the corpus — and the spec proves it equals the direct global
  * sketch.
  *
  * Scale shape: one partial-deduped distinct shuffle at (group, key)
  * grain, then the bounded-heap TopKPerKey operator keeps K rows per
  * group (only K survivors cross the second exchange); the union
  * merge sees O(groups·K) rows. Nothing downstream of the first
  * distinct is corpus-sized.
  *
  * Reference tie-in: the reference migrates row counts blind
  * (mysql2psql main.py:124-189 copies tables with no profiling);
  * distinct-key profiling at lake scale is the first statistic a
  * migration plans shard counts from — [[Etl.etlReshardPlan]] uses
  * exact counts, this is its constant-memory form.
  */
object SketchOps {

  /** Sketch size K: 64 keeps the expected relative error near
    * 1/√(K−2) ≈ 13% while the summary stays 64 longs. */
  val kmvK = 64

  /** Mersenne prime 2^31−1: the hash universe. */
  val kmvP = 2147483647L

  private val hashSql = s"(742938285 * k + 11213) % $kmvP"

  /** Per-priority distinct-customer KMV sketches plus the mergeable
    * ALL union row: (grp, n_exact, n_kept, kth_hash, est_distinct).
    * n_exact rides along so the artifact shows its own error. */
  def qKmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "orders")
      .select(col("o_orderpriority").as("grp"), col("o_custkey").as("k"))
      .distinct()
    val withH = d.withColumn("h", expr(hashSql))
    // bottom-K per group: the bounded-heap operator — only K rows per
    // group survive into the final aggregate
    val kept = graft.plans.TopKPerKey.topK(
      withH.select(col("grp"), col("h")), Seq("grp"), Seq(col("h")), kmvK)
    val sk = kept.groupBy("grp")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
    val ne = d.groupBy("grp").agg(count(lit(1)).as("n_exact"))
    val per = ne.join(sk, "grp")
      .select(col("grp"), col("n_exact"), col("n_kept"), col("kth_hash"))
    // ALL row, computed the MERGEABLE way: union the per-group kept
    // hashes (O(groups·K) rows), dedupe (one key can live in several
    // groups), take the global bottom-K — the corpus is never re-read
    val merged = kept.select(col("h")).dropDuplicates("h")
      .orderBy(col("h")).limit(kmvK)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
    val ga = d.select(col("k")).dropDuplicates("k")
      .agg(count(lit(1)).as("n_exact"))
    val allRow = ga.crossJoin(merged)
      .select(lit("ALL").as("grp"), col("n_exact"), col("n_kept"),
        col("kth_hash"))
    per.union(allRow).withColumn("est_distinct", expr(
      s"case when n_kept < $kmvK then cast(n_kept as double)" +
        s" else cast(${kmvK - 1} as double) * cast($kmvP as double)" +
        " / (cast(kth_hash as double) + 1.0d) end"))
  }

  val qKmvDistinctSql: String =
    s"""WITH d AS (SELECT DISTINCT o_orderpriority AS grp, o_custkey AS k FROM orders),
       |h AS (SELECT grp, k, $hashSql AS h FROM d),
       |r AS (SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn FROM h),
       |kept AS (SELECT grp, h FROM r WHERE rn <= $kmvK),
       |sk AS (SELECT grp, COUNT(*) AS n_kept, MAX(h) AS kth_hash FROM kept GROUP BY grp),
       |ne AS (SELECT grp, COUNT(*) AS n_exact FROM d GROUP BY grp),
       |per AS (SELECT ne.grp, ne.n_exact, sk.n_kept, sk.kth_hash
       |        FROM ne JOIN sk USING (grp)),
       |mh AS (SELECT DISTINCT h FROM kept),
       |mr AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM mh),
       |mk AS (SELECT COUNT(*) AS n_kept, MAX(h) AS kth_hash FROM mr WHERE rn <= $kmvK),
       |ga AS (SELECT COUNT(DISTINCT k) AS n_exact FROM d),
       |u AS (SELECT * FROM per
       |      UNION ALL
       |      SELECT 'ALL' AS grp, ga.n_exact, mk.n_kept, mk.kth_hash FROM ga, mk)
       |SELECT grp, n_exact, n_kept, kth_hash,
       |  CASE WHEN n_kept < $kmvK THEN CAST(n_kept AS DOUBLE)
       |       ELSE CAST(${kmvK - 1} AS DOUBLE) * CAST($kmvP AS DOUBLE)
       |            / (CAST(kth_hash AS DOUBLE) + 1.0) END AS est_distinct
       |FROM u""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmv_distinct" -> (qKmvDistinct _))

  val oracles: Map[String, String] = Map(
    "q_kmv_distinct" -> qKmvDistinctSql)
}
