package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Second-wave analytic keys: exact re-aggregatable distinct
  * counting, sequential pattern matching (batch CEP), Pareto
  * frontiers, and deterministic weighted sampling.
  *
  * Reference analog: the migration tool's per-table introspection
  * before transfer (/root/reference/libs/MysqlParser.py:41-258) is
  * "understand the table before acting"; these keys extend that to
  * the distributed-analytics questions a 100 TB store gets asked —
  * how many distinct entities per segment (and can segment partials
  * be merged without re-scanning?), which event sequences convert,
  * which rows are Pareto-optimal, which sample respects weights
  * reproducibly.
  */
object AnalyticsOps {

  /** Bitmap bucket width: 60 id-slots per 64-bit word. 60 (not 64)
    * keeps the shift strictly below the sign bit so the SAME mask
    * expression is legal in every engine (DuckDB raises on
    * `1::BIGINT << 63`); the 6% density loss is irrelevant — the
    * point of the layout is the merge algebra, not packing ratio. */
  private val bmSlot = 60L

  /** Exact distinct users per (event_type, day) via re-aggregatable
    * bitmap partials — the exact-COUNT(DISTINCT) shape that survives
    * re-aggregation. COUNT(DISTINCT) at corpus scale forces either a
    * full shuffle of raw (group, user) pairs per query, or an
    * APPROXIMATE sketch (q_approx_distinct's HLL). A bitmap partial
    * is the third option: user ids pack into per-bucket 64-bit words
    * (`bit_or` of single-bit masks), and those words merge with
    * `bit_or` across ANY further grouping — so hourly segment
    * partials roll up to days, days to months, shards to global,
    * without touching raw rows again, and the count stays EXACT.
    * This query materializes the algebra in its own plan: hour-grain
    * partials → `bit_or`-merged day grain → popcount sum.
    *
    * Scale shape: every level is a hash aggregate with map-side
    * partial combine; the per-group state is O(id-range/64) words —
    * for a 10M-entity dimension that is ~160 KB per group worst case,
    * and sparse groups only materialize buckets they saw (roaring-
    * style containers are the production refinement of exactly this
    * layout). Raw events collapse to bitmap words at the FIRST
    * aggregate — the wide table crosses the wire once, as bits. */
  def qBitmapDistinct(s: SparkSession, dir: String): DataFrame = {
    val seg = Tables.load(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        hour(col("ts")).as("hr"),
        expr(s"user_id div $bmSlot").as("bucket"),
        expr(s"shiftleft(1L, cast(user_id % $bmSlot as int))").as("mask"))
      .groupBy("event_type", "day", "hr", "bucket")
      .agg(expr("bit_or(mask)").as("bm"), count(lit(1)).as("n"))
    val merged = seg.groupBy("event_type", "day", "bucket")
      .agg(expr("bit_or(bm)").as("bm"), sum(col("n")).as("n"))
    merged.groupBy("event_type", "day")
      .agg(expr("cast(sum(bit_count(bm)) as bigint)").as("n_users"),
        sum(col("n")).as("n_events"))
  }

  val qBitmapDistinctSql: String =
    s"""WITH seg AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    EXTRACT(hour FROM ts) AS hr, user_id // $bmSlot AS bucket,
       |    bit_or(1::BIGINT << CAST(user_id % $bmSlot AS INT)) AS bm,
       |    COUNT(*) AS n
       |  FROM events GROUP BY 1, 2, 3, 4),
       |mrg AS (
       |  SELECT event_type, day, bucket, bit_or(bm) AS bm, SUM(n) AS n
       |  FROM seg GROUP BY 1, 2, 3)
       |SELECT event_type, day,
       |  CAST(SUM(bit_count(bm)) AS BIGINT) AS n_users,
       |  CAST(SUM(n) AS BIGINT) AS n_events
       |FROM mrg GROUP BY 1, 2""".stripMargin

  /** Conversion episode: a view, any run of clicks, then a purchase —
    * matched non-overlapping left-to-right (identical find semantics
    * in java.util.regex and RE2, so the count is engine-portable). */
  private[graft] val convPattern = "vc*p"

  /** Sequential pattern matching over per-user event paths — the
    * batch form of CEP (Flink's MATCH_RECOGNIZE / pattern API), which
    * Spark has no operator for: how many times did each user run the
    * view→clicks→purchase episode, and how many purchases followed a
    * view directly? The per-user event sequence collapses to a
    * character path (one initial per event type — the fixture's five
    * types have distinct initials) ordered by (ts, event_id), and
    * episodes become regex matches over the path — the classic
    * strings-as-sequences encoding that turns any regular-language
    * episode query into one aggregate plus one codegen'd regexp.
    *
    * Scale shape: ONE user-grain shuffle; collect_list partials
    * combine map-side, and per-user state is that user's event count
    * — the same bounded-key-state contract every CEP engine imposes
    * (production refinement: window the path by time to cap state for
    * immortal keys). The regex runs over O(users) strings, not the
    * event table. */
  def qEventPattern(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("t"), col("event_id").as("id"),
          substring(col("event_type"), 1, 1).as("c")).as("e"))
    ev.groupBy("user_id")
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .select(col("user_id"),
        expr("array_join(transform(es, x -> x.c), '')").as("path"))
      .select(col("user_id"),
        length(col("path")).cast(LongType).as("n_events"),
        expr(s"cast(regexp_count(path, '$convPattern') as bigint)")
          .as("n_conversions"),
        expr("cast(regexp_count(path, 'vp') as bigint)").as("n_direct"))
  }

  val qEventPatternSql: String =
    s"""WITH p AS (
       |  SELECT user_id,
       |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
       |      AS path
       |  FROM events GROUP BY user_id)
       |SELECT user_id, CAST(length(path) AS BIGINT) AS n_events,
       |  CAST(len(regexp_extract_all(path, '$convPattern')) AS BIGINT)
       |    AS n_conversions,
       |  CAST(len(regexp_extract_all(path, 'vp')) AS BIGINT) AS n_direct
       |FROM p""".stripMargin

  /** Size-range bucket width for the skyline scan (TPC-H part sizes
    * span 1..50 → a handful of buckets at fixture scale; at corpus
    * scale width tracks the dimension's range / desired parallelism). */
  private val skyBucket = 10

  /** 2-D skyline (Pareto frontier) of parts: minimize p_size,
    * maximize p_retailprice — "no other part is at least as small AND
    * at least as expensive, strictly better in one". The selection
    * shape behind best-tradeoff queries (cost/latency, quality/size)
    * that plain ORDER BY cannot express.
    *
    * The naive formulation is an O(n²) dominance self-join; the sorted
    * formulation needs a GLOBAL running max over the size order — one
    * reducer for the whole table. This scan bucket-decomposes it the
    * way etl_id_gaps decomposes its sequence scan: size-range buckets
    * run the strictly-smaller-size running max bucket-locally
    * (parallelism = buckets), cross-bucket state reduces to ONE max
    * per bucket whose prefix-max frame is O(buckets) — model-sized at
    * any data size — and a per-size partition handles equal-size
    * domination. Dominance tests compare raw stored doubles
    * (selections, never arithmetic), so the frontier is hash-exact. */
  def qSkyline(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .withColumn("b", expr(s"p_size div $skyBucket"))
    val bounds = p.groupBy("b").agg(max(col("p_retailprice")).as("bmax"))
    // the bounds frame is O(buckets): its global window is model-sized
    val prefix = bounds.withColumn("prev_max",
      max(col("bmax")).over(Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)))
    val local = Window.partitionBy(col("b")).orderBy(col("p_size"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val perSize = Window.partitionBy(col("p_size"))
    p.join(broadcast(prefix.select(col("b"), col("prev_max"))), Seq("b"))
      .withColumn("m1", greatest(
        coalesce(max(col("p_retailprice")).over(local),
          lit(Double.NegativeInfinity)),
        coalesce(col("prev_max"), lit(Double.NegativeInfinity))))
      .withColumn("m2", max(col("p_retailprice")).over(perSize))
      .filter(col("m1") < col("p_retailprice") &&
        !(col("m2") > col("p_retailprice")))
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
  }

  val qSkylineSql: String =
    """SELECT a.p_partkey, a.p_size, a.p_retailprice FROM part a
      |WHERE NOT EXISTS (SELECT 1 FROM part b
      |  WHERE b.p_size <= a.p_size
      |    AND b.p_retailprice >= a.p_retailprice
      |    AND (b.p_size < a.p_size OR b.p_retailprice > a.p_retailprice))
      |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bitmap_distinct" -> (qBitmapDistinct _),
    "q_event_pattern" -> (qEventPattern _),
    "q_skyline" -> (qSkyline _))

  val oracles: Map[String, String] = Map(
    "q_bitmap_distinct" -> qBitmapDistinctSql,
    "q_event_pattern" -> qEventPatternSql,
    "q_skyline" -> qSkylineSql)
}
