package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Row-pattern matching — the SQL:2016 MATCH_RECOGNIZE capability
  * Spark has no native operator for (and DuckDB doesn't either, so
  * the oracle is the same relational compilation executed by an
  * independent engine, with the semantics replayed row-by-row in the
  * spec).
  *
  * The pattern here is the classic V-shape over an ordered series —
  * `PATTERN (DOWN{3,} UP{3,})` with DOWN: v < PREV(v), UP:
  * v > PREV(v) — over per-priority daily revenue: a maximal run of
  * ≥3 strictly-falling days immediately followed by a maximal run of
  * ≥3 strictly-rising days (a flat day breaks both quantifiers, as
  * the strict definitions demand). Measures are MATCH_RECOGNIZE's
  * FIRST/LAST idiom: match start/trough/end days, run lengths, and
  * the exact drawdown/recovery in cents. `AFTER MATCH SKIP PAST LAST
  * ROW` is vacuous for this pattern (maximal runs cannot overlap),
  * which is what makes the set-based compilation below EQUAL to the
  * row-automaton semantics — the spec proves it against a driver-side
  * NFA-style replay.
  *
  * Compilation (the standard run-length encoding):
  *   1. classify each row against its predecessor: dir ∈ {-1, 0, +1},
  *   2. number maximal constant-dir runs with a change-flag cumsum,
  *   3. collapse to run grain (first/last day, length, boundary
  *      values),
  *   4. pair each DOWN run with the run that follows it and keep
  *      (DOWN, UP) pairs meeting the quantifiers.
  *
  * Scale shape: the corpus collapses to the daily grain at the FIRST
  * aggregate; both window passes and the run collapse ride one
  * priority-keyed exchange over the model-sized daily frame; the
  * run-pair join is runs-to-runs (tiny) on (grp, seg). All arithmetic
  * is exact BIGINT cents — no float crosses an engine boundary.
  *
  * Reference tie-in: the reference's closest surface is row-ordered
  * scanning during extraction (mysql2psql MysqlParser.py
  * get_table_raw_data:121-150); pattern detection over ordered rows
  * is what a monitoring pipeline runs on the migrated series.
  */
object MatchRecognize {

  /** Minimum run length for each quantifier (DOWN{3,} UP{3,}). */
  val minRun = 3

  def qMatchRecognize(s: SparkSession, dir: String): DataFrame =
    matchRuns(Tables.load(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("grp"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)"))
        .as("v")))

  /** The pattern compilation over ANY (grp, day, v) series frame —
    * factored from the query key so the randomized spec can drive it
    * with arbitrary synthetic series (flat runs, single points,
    * alternating saw-tooths) against the row-automaton replay. */
  private[graft] def matchRuns(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("grp").orderBy("day")
    val cls = daily
      .withColumn("pv", lag(col("v"), 1).over(w))
      .withColumn("dir", expr(
        "case when v > pv then 1 when v < pv then -1 else 0 end"))
      .filter(col("pv").isNotNull)
    val seg = cls
      .withColumn("chg", expr("case when lag(dir) over " +
        "(partition by grp order by day) is null or dir != lag(dir) over " +
        "(partition by grp order by day) then 1 else 0 end"))
      .withColumn("seg", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = seg.groupBy("grp", "seg")
      .agg(min(col("dir")).as("dir"), min(col("day")).as("d0"),
        max(col("day")).as("d1"), count(lit(1)).as("n"),
        min_by(col("pv"), col("day")).as("start_prev_v"),
        max_by(col("v"), col("day")).as("end_v"))
    val a = runs.as("a")
    val b = runs.as("b")
    a.join(b, col("a.grp") === col("b.grp") &&
        col("b.seg") === col("a.seg") + 1)
      .filter(col("a.dir") === -1 && col("b.dir") === 1 &&
        col("a.n") >= minRun && col("b.n") >= minRun)
      .select(col("a.grp").as("grp"),
        col("a.d0").as("start_day"), col("a.d1").as("trough_day"),
        col("b.d1").as("end_day"),
        col("a.n").as("down_len"), col("b.n").as("up_len"),
        (col("a.start_prev_v") - col("a.end_v")).as("depth_cents"),
        (col("b.end_v") - col("a.end_v")).as("recovery_cents"))
      // (grp, start_day) is a match key (maximal runs cannot share a
      // start), so this is a TOTAL order — pinned because the driver's
      // correctness hash is row-order-sensitive and the runs-to-runs
      // join is the one place the two engines' output orders diverge.
      .orderBy("grp", "start_day")
  }

  val qMatchRecognizeSql: String =
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS day,
       |         SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS v
       |  FROM orders GROUP BY 1, 2),
       |cls AS (
       |  SELECT grp, day, v,
       |    LAG(v) OVER w AS pv,
       |    CASE WHEN v > LAG(v) OVER w THEN 1
       |         WHEN v < LAG(v) OVER w THEN -1 ELSE 0 END AS dir
       |  FROM daily WINDOW w AS (PARTITION BY grp ORDER BY day)),
       |marked AS (
       |  SELECT grp, day, v, pv, dir,
       |    CASE WHEN LAG(dir) OVER w IS NULL OR dir <> LAG(dir) OVER w
       |         THEN 1 ELSE 0 END AS chg
       |  FROM cls WHERE pv IS NOT NULL
       |  WINDOW w AS (PARTITION BY grp ORDER BY day)),
       |seg AS (
       |  SELECT grp, day, v, pv, dir,
       |    SUM(chg) OVER (PARTITION BY grp ORDER BY day
       |                   ROWS UNBOUNDED PRECEDING) AS seg
       |  FROM marked),
       |runs AS (
       |  SELECT grp, seg, MIN(dir) AS dir, MIN(day) AS d0, MAX(day) AS d1,
       |    COUNT(*) AS n, MIN_BY(pv, day) AS start_prev_v,
       |    MAX_BY(v, day) AS end_v
       |  FROM seg GROUP BY grp, seg)
       |SELECT a.grp, a.d0 AS start_day, a.d1 AS trough_day, b.d1 AS end_day,
       |  a.n AS down_len, b.n AS up_len,
       |  a.start_prev_v - a.end_v AS depth_cents,
       |  b.end_v - a.end_v AS recovery_cents
       |FROM runs a JOIN runs b ON a.grp = b.grp AND b.seg = a.seg + 1
       |WHERE a.dir = -1 AND b.dir = 1
       |  AND a.n >= $minRun AND b.n >= $minRun
       |ORDER BY a.grp, start_day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_match_recognize" -> (qMatchRecognize _))

  val oracles: Map[String, String] = Map(
    "q_match_recognize" -> qMatchRecognizeSql)
}
