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

  /** Minimum run length for the W-pattern's quantifiers
    * (DOWN{2,} UP{2,} DOWN{2,} UP{2,}) — looser than the V so the
    * 4-run shape still occurs in the fixture series. */
  val wMinRun = 2

  private def dailyFrame(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("grp"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)"))
        .as("v"))

  def qMatchRecognize(s: SparkSession, dir: String): DataFrame =
    matchRuns(dailyFrame(s, dir))

  def qMatchW(s: SparkSession, dir: String): DataFrame =
    wRuns(dailyFrame(s, dir), wMinRun, wMinRun)

  /** Steps 1–3 of the compilation: classify, segment, collapse to the
    * run grain — shared by every pattern over the same series. Segs
    * are CONSECUTIVE integers per grp (a cumsum of change flags), so
    * run adjacency is seg+1 / window-lead positional adjacency. */
  private[graft] def runGrain(daily: DataFrame): DataFrame = {
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
    seg.groupBy("grp", "seg")
      .agg(min(col("dir")).as("dir"), min(col("day")).as("d0"),
        max(col("day")).as("d1"), count(lit(1)).as("n"),
        min_by(col("pv"), col("day")).as("start_prev_v"),
        max_by(col("v"), col("day")).as("end_v"))
  }

  /** The V-pattern compilation over ANY (grp, day, v) series frame —
    * factored from the query key so the randomized spec can drive it
    * with arbitrary synthetic series (flat runs, single points,
    * alternating saw-tooths) against the row-automaton replay. */
  private[graft] def matchRuns(daily: DataFrame): DataFrame = {
    val runs = runGrain(daily)
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

  /** The W-pattern (double-V) compilation:
    * `PATTERN (D1 U1 D2 U2)` with D: v < PREV(v) {m,}, U: v > PREV(v)
    * {n,}, and — the semantics the V key cannot show — `AFTER MATCH
    * SKIP TO FIRST D2`: consecutive W's OVERLAP, sharing their middle
    * V. Under maximal-run classification that skip rule equals
    * "emit every aligned run quadruple (down,up,down,up) meeting the
    * quantifiers": matches can only start at run starts (a mid-run
    * start has the same following runs and a shorter D1, so it
    * matches only where the aligned start already matched and the
    * greedy scan emits the aligned one first), and the resume point
    * (first row of D2) IS the next aligned quadruple's start, so the
    * greedy chain skips nothing. The spec replays the automaton
    * with exactly that skip rule and asserts equality.
    *
    * Compilation: window-lead over the run grain (one exchange on
    * grp, model-sized frame) instead of a 4-way self-join. */
  private[graft] def wRuns(daily: DataFrame, m: Int, n: Int): DataFrame = {
    val w = Window.partitionBy("grp").orderBy("seg")
    runGrain(daily)
      .withColumn("dir1", lead(col("dir"), 1).over(w))
      .withColumn("n1", lead(col("n"), 1).over(w))
      .withColumn("mid_d1", lead(col("d1"), 1).over(w))
      .withColumn("mid_v", lead(col("end_v"), 1).over(w))
      .withColumn("dir2", lead(col("dir"), 2).over(w))
      .withColumn("n2", lead(col("n"), 2).over(w))
      .withColumn("t2_d1", lead(col("d1"), 2).over(w))
      .withColumn("t2_v", lead(col("end_v"), 2).over(w))
      .withColumn("dir3", lead(col("dir"), 3).over(w))
      .withColumn("n3", lead(col("n"), 3).over(w))
      .withColumn("e_d1", lead(col("d1"), 3).over(w))
      .withColumn("e_v", lead(col("end_v"), 3).over(w))
      .filter(col("dir") === -1 && col("dir1") === 1 &&
        col("dir2") === -1 && col("dir3") === 1 &&
        col("n") >= m && col("n1") >= n &&
        col("n2") >= m && col("n3") >= n)
      .select(col("grp"), col("d0").as("start_day"),
        col("d1").as("trough1_day"), col("mid_d1").as("mid_day"),
        col("t2_d1").as("trough2_day"), col("e_d1").as("end_day"),
        col("n").as("down1_len"), col("n1").as("up1_len"),
        col("n2").as("down2_len"), col("n3").as("up2_len"),
        (col("start_prev_v") - col("end_v")).as("depth1_cents"),
        (col("mid_v") - col("t2_v")).as("depth2_cents"),
        (col("e_v") - col("t2_v")).as("recovery_cents"))
      // (grp, start_day) is a match key: aligned quadruples share a
      // start only if they share the whole first run — total order
      .orderBy("grp", "start_day")
  }

  /** The shared CTE chain down to the run grain — ONE copy of the
    * classification text so the V and W oracles can never diverge on
    * what a run is (the §4 mirrored-tree discipline). */
  private val runsCte: String =
    """WITH daily AS (
      |  SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS v
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
      |  FROM seg GROUP BY grp, seg)""".stripMargin

  val qMatchRecognizeSql: String =
    s"""$runsCte
       |SELECT a.grp, a.d0 AS start_day, a.d1 AS trough_day, b.d1 AS end_day,
       |  a.n AS down_len, b.n AS up_len,
       |  a.start_prev_v - a.end_v AS depth_cents,
       |  b.end_v - a.end_v AS recovery_cents
       |FROM runs a JOIN runs b ON a.grp = b.grp AND b.seg = a.seg + 1
       |WHERE a.dir = -1 AND b.dir = 1
       |  AND a.n >= $minRun AND b.n >= $minRun
       |ORDER BY a.grp, start_day""".stripMargin

  val qMatchWSql: String =
    s"""$runsCte,
       |sel AS (
       |  SELECT grp, seg, dir, d0, d1, n, start_prev_v, end_v,
       |    LEAD(dir, 1) OVER w AS dir1, LEAD(n, 1) OVER w AS n1,
       |    LEAD(d1, 1) OVER w AS mid_d1, LEAD(end_v, 1) OVER w AS mid_v,
       |    LEAD(dir, 2) OVER w AS dir2, LEAD(n, 2) OVER w AS n2,
       |    LEAD(d1, 2) OVER w AS t2_d1, LEAD(end_v, 2) OVER w AS t2_v,
       |    LEAD(dir, 3) OVER w AS dir3, LEAD(n, 3) OVER w AS n3,
       |    LEAD(d1, 3) OVER w AS e_d1, LEAD(end_v, 3) OVER w AS e_v
       |  FROM runs WINDOW w AS (PARTITION BY grp ORDER BY seg))
       |SELECT grp, d0 AS start_day, d1 AS trough1_day, mid_d1 AS mid_day,
       |  t2_d1 AS trough2_day, e_d1 AS end_day,
       |  n AS down1_len, n1 AS up1_len, n2 AS down2_len, n3 AS up2_len,
       |  start_prev_v - end_v AS depth1_cents,
       |  mid_v - t2_v AS depth2_cents,
       |  e_v - t2_v AS recovery_cents
       |FROM sel
       |WHERE dir = -1 AND dir1 = 1 AND dir2 = -1 AND dir3 = 1
       |  AND n >= $wMinRun AND n1 >= $wMinRun
       |  AND n2 >= $wMinRun AND n3 >= $wMinRun
       |ORDER BY grp, start_day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_match_recognize" -> (qMatchRecognize _),
    "q_match_w" -> (qMatchW _))

  val oracles: Map[String, String] = Map(
    "q_match_recognize" -> qMatchRecognizeSql,
    "q_match_w" -> qMatchWSql)
}
