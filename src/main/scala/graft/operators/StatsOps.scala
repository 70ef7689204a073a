package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Statistical / similarity-analysis query keys.
  *
  * Three shapes an analytics engine needs beyond plain aggregates:
  * bivariate statistics (correlation / regression — the profiling
  * step before any model touches the data), banded fuzzy matching
  * (edit-distance join under a blocking key — entity resolution's
  * workhorse), and graph motif counting (triangles over a
  * co-occurrence graph — the structural signal behind community
  * detection and spam/bot filtering on interaction data).
  *
  * Reference analog: the migration tool's closest relative is its
  * per-table row/value introspection before transfer
  * (/root/reference/libs/MysqlParser.py:41-258) — these keys are the
  * analytical extension of "understand the table before you act on
  * it" to second moments, near-matches, and link structure.
  *
  * Correctness discipline for the float outputs (SURVEY §4): every
  * statistic is computed from EXACT decimal sufficient statistics
  * (n, Σx, Σy, Σx², Σy², Σxy — decimal sums are exact in both
  * engines), converted to double once, then combined with the SAME
  * IEEE expression tree in Spark and DuckDB. Identical double inputs
  * + identical correctly-rounded ops (+,-,*,/,sqrt) = bitwise-equal
  * results, so the driver's bitwise float comparison passes without
  * any epsilon.
  */
object StatsOps {

  /** Per-group bivariate statistics over lineitem (quantity vs
    * extended price): sample stddevs, Pearson correlation, and the
    * least-squares slope/intercept of price on quantity. ONE pass,
    * map-side partial aggregation of the sufficient statistics
    * (n, Σx, Σy, Σx², Σy², Σxy) per group; the closed-form
    * combination runs on the 4-row aggregate — the textbook
    * distributed-statistics design at any table size.
    *
    * Exactness (r10, twice-hardened): statistics accumulate in
    * INTEGER CENTS, and each product sum is SPLIT as
    * Σ(x div 10⁹) and Σ(x mod 10⁹) so that every surfaced sum stays
    * below 2⁶³ by construction through ~sf1000 — the regime where
    * BOTH engines' int→double casts are correctly rounded. The two
    * failed alternatives are documented history: scale-2 decimal
    * sums hit DuckDB's scaled-decimal→double double-rounding past
    * 2^53 unscaled (caught at sf0.001), and DECIMAL(38,0)↔HUGEINT
    * sums hit DuckDB's hugeint→double mis-rounding past 2^64
    * (~5% of values off by 1 ulp — caught by the second review
    * pass; the sf1 green was luck of three group values). The split
    * recombines as hi·10⁹ + lo in mirrored double text — identical
    * inputs, identical IEEE ops, bitwise-equal outputs. */
  def qStatsFuncs(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    // mirrored split-sum surfacing: both partial sums fit BIGINT, so
    // the casts are correctly rounded in both engines
    def splitSum(u: String): String =
      s"(cast(sum($u div 1000000000) as double) * 1000000000.0d" +
        s" + cast(sum($u % 1000000000) as double))"
    val sums = li
      .select(col("l_returnflag"),
        expr("cast(cast(l_quantity as decimal(12,2)) * 100 as bigint)")
          .as("qc"),
        expr("cast(cast(l_extendedprice as decimal(12,2)) * 100 as bigint)")
          .as("pc"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("qc")).cast(DoubleType).as("sq"),
        sum(col("pc")).cast(DoubleType).as("sp"),
        // per-row products fit long (pc² ≤ 1.3e14); the split keeps
        // the surfaced SUMS under 2^63 through ~sf1000
        expr(splitSum("qc * qc")).as("sqq"),
        expr(splitSum("pc * pc")).as("spp"),
        expr(splitSum("qc * pc")).as("sqp"))
    // the double expression trees below are textually mirrored in the
    // oracle SQL — do not re-associate them; the /100.0d rescales the
    // cents-domain statistics back to unit-domain outputs
    sums.select(
      col("l_returnflag"),
      col("n"),
      expr("sqrt((cast(n as double) * sqq - sq * sq) / (cast(n as double) * (cast(n as double) - 1.0))) / 100.0d").as("std_qty"),
      expr("sqrt((cast(n as double) * spp - sp * sp) / (cast(n as double) * (cast(n as double) - 1.0))) / 100.0d").as("std_price"),
      expr("(cast(n as double) * sqp - sq * sp) / (sqrt(cast(n as double) * sqq - sq * sq) * sqrt(cast(n as double) * spp - sp * sp))").as("corr_qp"),
      expr("(cast(n as double) * sqp - sq * sp) / (cast(n as double) * sqq - sq * sq)").as("slope_pq"),
      expr("((sp - ((cast(n as double) * sqp - sq * sp) / (cast(n as double) * sqq - sq * sq)) * sq) / cast(n as double)) / 100.0d").as("icept_pq"))
  }

  val qStatsFuncsSql: String =
    """WITH s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(CAST(SUM(qc) AS BIGINT) AS DOUBLE) AS sq,
      |    CAST(CAST(SUM(pc) AS BIGINT) AS DOUBLE) AS sp,
      |    (CAST(CAST(SUM((qc * qc) // 1000000000) AS BIGINT) AS DOUBLE) * 1000000000.0::DOUBLE
      |      + CAST(CAST(SUM((qc * qc) % 1000000000) AS BIGINT) AS DOUBLE)) AS sqq,
      |    (CAST(CAST(SUM((pc * pc) // 1000000000) AS BIGINT) AS DOUBLE) * 1000000000.0::DOUBLE
      |      + CAST(CAST(SUM((pc * pc) % 1000000000) AS BIGINT) AS DOUBLE)) AS spp,
      |    (CAST(CAST(SUM((qc * pc) // 1000000000) AS BIGINT) AS DOUBLE) * 1000000000.0::DOUBLE
      |      + CAST(CAST(SUM((qc * pc) % 1000000000) AS BIGINT) AS DOUBLE)) AS sqp
      |  FROM (SELECT l_returnflag,
      |          CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qc,
      |          CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc
      |        FROM lineitem)
      |  GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  sqrt((CAST(n AS DOUBLE) * sqq - sq * sq) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0::DOUBLE AS std_qty,
      |  sqrt((CAST(n AS DOUBLE) * spp - sp * sp) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0::DOUBLE AS std_price,
      |  (CAST(n AS DOUBLE) * sqp - sq * sp) / (sqrt(CAST(n AS DOUBLE) * sqq - sq * sq) * sqrt(CAST(n AS DOUBLE) * spp - sp * sp)) AS corr_qp,
      |  (CAST(n AS DOUBLE) * sqp - sq * sp) / (CAST(n AS DOUBLE) * sqq - sq * sq) AS slope_pq,
      |  ((sp - ((CAST(n AS DOUBLE) * sqp - sq * sp) / (CAST(n AS DOUBLE) * sqq - sq * sq)) * sq) / CAST(n AS DOUBLE)) / 100.0::DOUBLE AS icept_pq
      |FROM s""".stripMargin

  /** Edit-distance threshold for q_fuzzy_join: the fixture's
    * two-word part names put true near-variants ("small ring" vs
    * "small rings") within 3 edits while unrelated names in the same
    * band sit at 4+. */
  val fuzzyMaxDist = 3

  /** Banded fuzzy self-join: part pairs in the same
    * (brand, size-decade) block whose names are within
    * [[fuzzyMaxDist]] edits — the entity-resolution shape (candidate
    * blocking + expensive verify). The block key's coarseness is the
    * recall/cost dial: (brand, exact size) would miss near-dups
    * listed one size apart; brand alone quadruples the verify volume.
    *
    * Scale shape: the levenshtein verify — O(|a|·|b|) per pair — runs
    * ONLY inside blocks, so pair volume is Σ(block²), bounded by the
    * blocking key's selectivity, never n². Both sides are the full
    * corpus at production scale, so the block join is pinned to
    * shuffle (broadcasting a 100 TB side is the classic fuzzy-join
    * OOM); levenshtein itself is a codegen'd built-in, no UDF. */
  def qFuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        expr("p_size div 10").as("size_band"))
    val a = p.toDF("a_key", "a_name", "p_brand", "size_band")
    val b = p.toDF("b_key", "b_name", "p_brand", "size_band")
    a.join(b.hint("shuffle_hash"), Seq("p_brand", "size_band"))
      .filter(col("a_key") < col("b_key"))
      // LOSSLESS pre-filter before the O(|a|·|b|) verify:
      // levenshtein(a,b) >= |len(a)-len(b)|, so pairs whose lengths
      // differ by more than the threshold can never pass — the
      // length check is O(1) and short-circuits the DP for most of
      // the block's pair volume (the PPJoin length-filter discipline;
      // r14 measurement: the verify dominated this key). Output is
      // bit-identical — the bound is exact, never approximate.
      .filter(abs(length(col("a_name")) - length(col("b_name")))
        <= fuzzyMaxDist)
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= fuzzyMaxDist)
      .select("p_brand", "size_band", "a_key", "b_key", "dist")
  }

  val qFuzzyJoinSql: String =
    s"""SELECT a.p_brand, CAST(a.p_size // 10 AS BIGINT) AS size_band,
       |  a.p_partkey AS a_key, b.p_partkey AS b_key,
       |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
       |FROM part a JOIN part b
       |  ON a.p_brand = b.p_brand AND a.p_size // 10 = b.p_size // 10
       |  AND a.p_partkey < b.p_partkey
       |WHERE levenshtein(a.p_name, b.p_name) <= $fuzzyMaxDist""".stripMargin

  /** Keep every 10th part in the co-purchase graph: triangle cost is
    * Σdeg² (wedge volume), and co-occurrence degree grows linearly
    * with data at fixed catalog size — the modulus keeps the fixture
    * honest about the SHAPE while bounding the motif-join volume the
    * way a production run would bound it (degree cap / sampling). */
  val triModulus = 10

  /** Sampled co-purchase lines (order, part) — the shared base of
    * every graph key (% [[triModulus]] keeps the fixture graph
    * readable; production would sample or degree-cap instead). */
  private def coPurchaseLines(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_partkey") % triModulus === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))

  private def edgeJoin(li: DataFrame, cond: Column => Column): DataFrame =
    li.as("x")
      .join(li.as("y").hint("shuffle_hash"), col("x.o") === col("y.o"))
      .filter(cond(col("x.p")))
      .select(col("x.p").as("a"), col("y.p").as("b"))
      .distinct()

  /** Symmetric distinct co-purchase edges (a,b), a ≠ b — shared by
    * q_bfs_reach and q_link_predict (and, weighted, by
    * q_shortest_path). One definition, one place to change. */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    edgeJoin(coPurchaseLines(s, dir), _ =!= col("y.p"))

  /** Oriented distinct edges a < b — q_triangle_count's variant. */
  private def coPurchaseEdgesOriented(s: SparkSession,
      dir: String): DataFrame =
    edgeJoin(coPurchaseLines(s, dir), _ < col("y.p"))

  /** The matching oracle CTE fragments, shared by the graph keys'
    * SQL strings so the graph definition can never diverge between
    * keys. */
  private val liSampleSql: String =
    s"""li AS (
       |  SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
       |  WHERE l_partkey % $triModulus = 0)""".stripMargin
  private val symEdgeSql: String =
    """e AS (
      |  SELECT DISTINCT x.p AS a, y.p AS b
      |  FROM li x JOIN li y ON x.o = y.o AND x.p <> y.p)""".stripMargin
  private val oriEdgeSql: String =
    """e AS (
      |  SELECT DISTINCT x.p AS a, y.p AS b
      |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p)""".stripMargin

  /** Triangle counting over the part co-purchase graph (parts that
    * share an order are linked). Emits per-anchor wedge and triangle
    * counts — the local clustering signal.
    *
    * Built as the textbook distributed motif join: (1) distinct
    * oriented edges a<b from the order-grain self-join; (2) wedges
    * a→b→c from edges⋈edges on the middle vertex; (3) triangles by
    * probing the closing edge (a,c). Every join is a shuffle
    * hash-join on a key (order id, vertex id, edge pair) — no
    * cartesian anywhere. Production hardening is degree-ordering the
    * orientation so hub vertices don't own Σdeg² wedges; the fixture
    * graph's degrees are near-uniform so id-ordering is equivalent
    * here (noted, not needed). */
  def qTriangleCount(s: SparkSession, dir: String): DataFrame = {
    val e = coPurchaseEdgesOriented(s, dir)
    val wedges = e.as("ab")
      .join(e.as("bc").hint("shuffle_hash"), col("ab.b") === col("bc.a"))
      .select(col("ab.a").as("a"), col("ab.b").as("b"), col("bc.b").as("c"))
    val nWedges = wedges.groupBy("a").agg(count(lit(1)).as("n_wedges"))
    val nTris = wedges.as("w")
      .join(e.as("ac").hint("shuffle_hash"),
        col("w.a") === col("ac.a") && col("w.c") === col("ac.b"))
      .groupBy(col("w.a").as("a")).agg(count(lit(1)).as("n_triangles"))
    nWedges.join(nTris, Seq("a"), "left")
      .select(col("a").as("p_partkey"), col("n_wedges"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  val qTriangleCountSql: String =
    s"""WITH $liSampleSql,
       |$oriEdgeSql,
       |w AS (
       |  SELECT ab.a, ab.b, bc.b AS c
       |  FROM e ab JOIN e bc ON ab.b = bc.a),
       |nw AS (SELECT a, COUNT(*) AS n_wedges FROM w GROUP BY a),
       |nt AS (
       |  SELECT w.a, COUNT(*) AS n_triangles
       |  FROM w JOIN e ac ON w.a = ac.a AND w.c = ac.b
       |  GROUP BY w.a)
       |SELECT nw.a AS p_partkey, nw.n_wedges,
       |  COALESCE(nt.n_triangles, 0) AS n_triangles
       |FROM nw LEFT JOIN nt ON nw.a = nt.a""".stripMargin

  /** χ² association between two categoricals (documents' lang ×
    * source): the full contingency grid with per-cell deviation and
    * χ² term — the categorical-feature screening step (is the source
    * mix independent of language?) beside q_stats_funcs' numeric
    * moments. Zero cells are REAL cells (a (lang, source) pair that
    * never co-occurs is evidence, not absence), so the grid is the
    * margins' cross product, not just observed pairs.
    *
    * Correctness: per-cell dev = obs·n − rowΣ·colΣ is EXACT integer
    * (margins here stay < 2^26 so products fit longs; at larger
    * cardinalities this lifts to decimal unchanged), and its per-row
    * sum telescopes to exactly zero — the spec's invariant. The χ²
    * term is a single mirrored IEEE expression over exact-in-double
    * integers (§4 / q_stats_funcs discipline): bitwise equality, no
    * epsilon. Scale shape: three map-side-combined aggregates over
    * one source; the grid itself is dimension-sized (margins cross
    * product), where a broadcast nested-loop is the RIGHT join — the
    * corpus never crosses it. */
  def qChi2(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select("lang", "source")
    val obs = d.groupBy("lang", "source").agg(count(lit(1)).as("obs"))
    val rt = d.groupBy("lang").agg(count(lit(1)).as("row_total"))
    val ct = d.groupBy("source").agg(count(lit(1)).as("col_total"))
    val n = d.count() // model-sized scalar (one long), the SimOps rule
    rt.crossJoin(broadcast(ct))
      .join(obs, Seq("lang", "source"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .withColumn("dev",
        col("obs") * lit(n) - col("row_total") * col("col_total"))
      .select(col("lang"), col("source"), col("obs"), col("row_total"),
        col("col_total"), col("dev"),
        (col("dev").cast(DoubleType) * col("dev").cast(DoubleType) /
          (lit(n).cast(DoubleType) * col("row_total").cast(DoubleType) *
            col("col_total").cast(DoubleType))).as("chi2_term"))
  }

  val qChi2Sql: String =
    """WITH d AS (SELECT lang, source FROM documents),
      |o AS (SELECT lang, source, COUNT(*) AS obs FROM d GROUP BY 1, 2),
      |r AS (SELECT lang, COUNT(*) AS row_total FROM d GROUP BY 1),
      |c AS (SELECT source, COUNT(*) AS col_total FROM d GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS n FROM d),
      |g AS (
      |  SELECT r.lang, c.source, r.row_total, c.col_total,
      |    CAST(COALESCE(o.obs, 0) AS BIGINT) AS obs, nn.n
      |  FROM r CROSS JOIN c CROSS JOIN nn
      |  LEFT JOIN o ON o.lang = r.lang AND o.source = c.source),
      |g2 AS (
      |  SELECT lang, source, obs, row_total, col_total, n,
      |    obs * n - row_total * col_total AS dev
      |  FROM g)
      |SELECT lang, source, obs, CAST(row_total AS BIGINT) AS row_total,
      |  CAST(col_total AS BIGINT) AS col_total, CAST(dev AS BIGINT) AS dev,
      |  CAST(dev AS DOUBLE) * CAST(dev AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(row_total AS DOUBLE)
      |       * CAST(col_total AS DOUBLE)) AS chi2_term
      |FROM g2""".stripMargin

  /** Higher-moment shape statistics — population skewness and excess
    * kurtosis of line quantities per return flag (the distribution-
    * shape profile q_stats_funcs' second moments can't see: skew
    * says the tail's direction, kurtosis says whether outliers or
    * shoulders carry the variance — the first screen before choosing
    * robust vs classical monitors).
    *
    * Float discipline (SURVEY §4): raw power sums Σx..Σx⁴ are EXACT
    * decimal integers (quantities are integral), converted to double
    * once; the moment combinations use only +,-,*,/ and sqrt — all
    * correctly rounded, so identical inputs give bitwise-equal
    * results. x^1.5 is spelled v*sqrt(v), never pow() (libm pow is
    * not correctly rounded and may differ across engines).
    *
    * Scale shape: ONE map-side-combined aggregate of five sums per
    * group — q1_agg's shape at any corpus size; the closed-form
    * combination runs on the 3-row aggregate. */
  def qMoments(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("cast(cast(l_quantity as decimal(12,2)) as bigint)").as("x"))
    // per-row powers stay in LONG (x⁴ < 2⁶³ holds for any physical
    // line quantity below ~55k units — the q_discount_scenarios
    // lesson); the corpus SUMs run in DECIMAL(38,0), where overflow
    // actually lives
    val sums = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 0))).cast(DoubleType).as("s1"),
        sum(expr("cast(x * x as decimal(38,0))")).cast(DoubleType).as("s2"),
        sum(expr("cast(x * x * x as decimal(38,0))")).cast(DoubleType)
          .as("s3"),
        sum(expr("cast(x * x * x * x as decimal(38,0))")).cast(DoubleType)
          .as("s4"))
    // the double trees below are textually mirrored in the oracle —
    // do not re-associate; ^1.5 and ^2 are spelled via * and sqrt
    sums.select(col("l_returnflag"), col("n"),
        expr("s1 / cast(n as double)").as("mean_qty"),
        expr("""(s3 / cast(n as double)
          |  - 3.0 * (s1 / cast(n as double)) * (s2 / cast(n as double))
          |  + 2.0 * (s1 / cast(n as double)) * (s1 / cast(n as double)) * (s1 / cast(n as double)))
          | / ((s2 / cast(n as double) - (s1 / cast(n as double)) * (s1 / cast(n as double)))
          |    * sqrt(s2 / cast(n as double) - (s1 / cast(n as double)) * (s1 / cast(n as double))))"""
          .stripMargin).as("skewness"),
        expr("""(s4 / cast(n as double)
          |  - 4.0 * (s1 / cast(n as double)) * (s3 / cast(n as double))
          |  + 6.0 * (s1 / cast(n as double)) * (s1 / cast(n as double)) * (s2 / cast(n as double))
          |  - 3.0 * (s1 / cast(n as double)) * (s1 / cast(n as double)) * (s1 / cast(n as double)) * (s1 / cast(n as double)))
          | / ((s2 / cast(n as double) - (s1 / cast(n as double)) * (s1 / cast(n as double)))
          |    * (s2 / cast(n as double) - (s1 / cast(n as double)) * (s1 / cast(n as double)))) - 3.0"""
          .stripMargin).as("kurtosis_excess"))
      .orderBy("l_returnflag")
  }

  val qMomentsSql: String =
    """WITH s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS s2,
      |    CAST(SUM(CAST(x AS HUGEINT) * x * x) AS DOUBLE) AS s3,
      |    CAST(SUM(CAST(x AS HUGEINT) * x * x * x) AS DOUBLE) AS s4
      |  FROM (SELECT l_returnflag,
      |          CAST(FLOOR(l_quantity) AS BIGINT) AS x FROM lineitem)
      |  GROUP BY 1)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  s1 / CAST(n AS DOUBLE) AS mean_qty,
      |  (s3 / CAST(n AS DOUBLE)
      |   - 3.0 * (s1 / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE))
      |   + 2.0 * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
      |  / ((s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
      |     * sqrt(s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))))
      |    AS skewness,
      |  (s4 / CAST(n AS DOUBLE)
      |   - 4.0 * (s1 / CAST(n AS DOUBLE)) * (s3 / CAST(n AS DOUBLE))
      |   + 6.0 * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE))
      |   - 3.0 * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
      |  / ((s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
      |     * (s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))) - 3.0
      |    AS kurtosis_excess
      |FROM s ORDER BY l_returnflag""".stripMargin

  /** The four cov-matrix measures, each an exact integer projection
    * of a lineitem column (quantity units, price cents, discount and
    * tax in basis points). */
  private val covVars = Seq("q", "p", "d", "t")
  private val covPairs =
    for { i <- covVars.indices; j <- i until covVars.size }
      yield (covVars(i), covVars(j))

  /** ONE formula text per statistic, fed verbatim to BOTH Spark's
    * SQL parser and DuckDB — the §4 mirrored-IEEE-tree discipline
    * made structural: the two engines cannot drift because they
    * parse the same string. */
  private def covTree(sx: String, sy: String, sxy: String): String =
    s"(CAST(n AS DOUBLE) * $sxy - $sx * $sy) / " +
      "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))"
  private def corrTree(sx: String, sy: String, sxx: String, syy: String,
      sxy: String): String =
    s"(CAST(n AS DOUBLE) * $sxy - $sx * $sy) / " +
      s"(sqrt(CAST(n AS DOUBLE) * $sxx - $sx * $sx) * " +
      s"sqrt(CAST(n AS DOUBLE) * $syy - $sy * $sy))"

  /** Full pairwise covariance/correlation matrix over four lineitem
    * measures (quantity, price, discount, tax) — the multi-column
    * profiling pass feature selection and anomaly models start from
    * (q_stats_funcs profiles ONE pair; the matrix is what correlation
    * heatmaps and PCA preprocessing actually consume). 10 rows: the
    * upper triangle incl. diagonals, sample covariance + Pearson r.
    *
    * Scale shape: ONE map-side-combined aggregate of 14 exact
    * DECIMAL(38,0) sums (4 firsts + 10 pair products) collapses the
    * corpus to a single row; the matrix rows are a stack projection
    * of that row. The agg state is O(measures²) per task — the
    * textbook one-pass covariance-matrix layout. */
  def qCovMatrix(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "lineitem").select(
      expr("cast(cast(l_quantity as decimal(12,2)) as bigint)").as("q"),
      expr("cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)"
        + " div 100").as("p"),
      expr("cast(cast(l_discount as decimal(6,4)) * 10000 as bigint)")
        .as("d"),
      expr("cast(cast(l_tax as decimal(6,4)) * 10000 as bigint)").as("t"))
    // per-row pair products stay in LONG — the largest is p·p ≤
    // (10⁹ cents)² = 10¹⁸ < 2⁶³, bounded by the money domain (the
    // q_discount_scenarios lesson: per-row decimal multiplication
    // multiplies scan cost ~8×); only the corpus SUMs run in
    // DECIMAL(38,0), where overflow actually lives
    // sums surface DECIMAL → LONG → DOUBLE: long→double is correctly
    // rounded in BOTH engines, hugeint/decimal→double is not — at
    // sf0.1 one pair sum crosses 2^53 and the direct conversions
    // disagreed by 1 ulp. Price is priced in whole DOLLARS so the
    // largest sum (Σp²) stays under 2^63 through sf100 (the
    // q_multireg rule).
    val firstSums = covVars.map(v =>
      sum(col(v).cast(DecimalType(38, 0))).cast(LongType)
        .cast(DoubleType).as(s"s_$v"))
    val pairSums = covPairs.map { case (a, b) =>
      sum(expr(s"cast($a * $b as decimal(38,0))")).cast(LongType)
        .cast(DoubleType).as(s"s_$a$b")
    }
    val sums = base.agg(count(lit(1)).as("n"),
      (firstSums ++ pairSums): _*)
    val withStats = covPairs.foldLeft(sums) { case (df, (a, b)) =>
      df.withColumn(s"cov_$a$b", expr(covTree(s"s_$a", s"s_$b", s"s_$a$b")))
        .withColumn(s"corr_$a$b",
          expr(corrTree(s"s_$a", s"s_$b", s"s_$a$a", s"s_$b$b", s"s_$a$b")))
    }
    val stackArgs = covPairs
      .map { case (a, b) => s"'$a', '$b', cov_$a$b, corr_$a$b" }
      .mkString(", ")
    withStats.select(col("n"), expr(
        s"stack(${covPairs.size}, $stackArgs) as (var_a, var_b, cov, corr)"))
      .select(col("var_a"), col("var_b"), col("n"), col("cov"), col("corr"))
      .orderBy("var_a", "var_b")
  }

  val qCovMatrixSql: String = {
    val pairSums = covPairs.map { case (a, b) =>
      s"CAST(CAST(SUM(CAST($a AS HUGEINT) * $b) AS BIGINT) AS DOUBLE) AS s_$a$b"
    }.mkString(",\n      |    ")
    val firstSums = covVars.map(v =>
      s"CAST(CAST(SUM(CAST($v AS HUGEINT)) AS BIGINT) AS DOUBLE) AS s_$v")
      .mkString(",\n      |    ")
    val arms = covPairs.map { case (a, b) =>
      s"SELECT '$a' AS var_a, '$b' AS var_b, CAST(n AS BIGINT) AS n, " +
        s"${covTree(s"s_$a", s"s_$b", s"s_$a$b")} AS cov, " +
        s"${corrTree(s"s_$a", s"s_$b", s"s_$a$a", s"s_$b$b", s"s_$a$b")} AS corr FROM s"
    }.mkString("\n      |UNION ALL ")
    s"""WITH b AS (
       |  SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS q,
       |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
       |      // 100 AS p,
       |    CAST(CAST(l_discount AS DECIMAL(6,4)) * 10000 AS BIGINT) AS d,
       |    CAST(CAST(l_tax AS DECIMAL(6,4)) * 10000 AS BIGINT) AS t
       |  FROM lineitem),
       |s AS (
       |  SELECT COUNT(*) AS n,
       |    $firstSums,
       |    $pairSums
       |  FROM b)
       |SELECT * FROM (
       |$arms
       |) ORDER BY var_a, var_b""".stripMargin
  }

  /** Wilson z for the 95% lower bound — shipped as a shared literal
    * so neither engine evaluates an inverse-normal. */
  private val wilsonZ = "1.96"

  /** Return-rate QC with a Wilson lower confidence bound per brand —
    * the defect-ranking read a naive rate gets WRONG on small
    * samples (1 return of 2 lines "beats" 40 of 100; the Wilson
    * lower bound is the standard small-n-honest ranking key used by
    * every review-scoring system). Per brand: lines, returns, exact
    * rate in ppm, and the 95% Wilson lower bound.
    *
    * Float discipline: counts exact; the bound uses only
    * +,-,*,/,sqrt on (r/n, z) with z a shared literal — bitwise
    * parity, no inverse-normal evaluated in either engine.
    *
    * Scale shape: lineitem⨝part shuffle-pinned (part only
    * broadcastable at fixture scale); ONE brand-grain aggregate with
    * map-side combine; the bound is a projection on the 25-row
    * brand frame. */
  def qReturnRates(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_returnflag"))
    li.join(part.hint("shuffle_hash"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      .withColumn("rate_ppm", expr("(r * 1000000) div n"))
      .withColumn("wilson_low_ppm", expr(wilsonLowTree))
      .orderBy("brand")
  }

  /** The Wilson lower-bound tree, parsed by both engines verbatim
    * (values in ppm to match rate_ppm's scale; still a double). */
  private def wilsonLowTree: String =
    s"""1000000.0 * (
       | (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
       |   + $wilsonZ * $wilsonZ / (2.0 * CAST(n AS DOUBLE))
       |   - $wilsonZ * sqrt(
       |       (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
       |         * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
       |         + $wilsonZ * $wilsonZ / (4.0 * CAST(n AS DOUBLE)))
       |       / CAST(n AS DOUBLE)))
       | / (1.0 + $wilsonZ * $wilsonZ / CAST(n AS DOUBLE)))""".stripMargin

  val qReturnRatesSql: String =
    s"""WITH g AS (
       |  SELECT p_brand AS brand, COUNT(*) AS n,
       |    SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1)
       |SELECT brand, CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
       |  CAST((r * 1000000) // n AS BIGINT) AS rate_ppm,
       |  $wilsonLowTree AS wilson_low_ppm
       |FROM g ORDER BY brand""".stripMargin

  /** BFS source sampling: parts with key % 100 = 0 (a subset of the
    * % [[triModulus]] sampled graph's id space; sources not present
    * in any order are legitimately isolated at hop 0). */
  val bfsSourceModulus = 100

  /** Bounded reach horizon — the "within N hops" product question. */
  val bfsMaxHops = 3

  /** Bounded multi-hop reachability (BFS with min-hop labels) over
    * the part co-purchase graph — the graph-traversal read beside
    * q_triangle_count's motifs and q_pagerank's scores: "everything
    * within 3 hops of these seed parts" is the recall/influence/
    * recommendation-candidate set every graph product feature starts
    * from (q_bom_explosion walks a DAG of containment; this walks a
    * CYCLIC similarity graph, where min-hop + visited-set semantics
    * are the point).
    *
    * Built as textbook distributed BFS: per round, frontier ⨝ edges
    * (keyed shuffle joins, never cartesian) → dedup → anti-join the
    * visited set → label with the round number; localCheckpoint pins
    * each round (the dedup_clusters iterative discipline — lineage
    * stays O(1) per round). The first label IS the minimal hop, so
    * the result equals the oracle's recursive-CTE MIN(hop) exactly.
    *
    * Scale shape: every round's work is frontier-sized, the edge
    * list shuffles once per round on the join key (at production
    * scale the edge frame is partition-pinned once and reused);
    * rounds are bounded by the hop horizon, not the graph. */
  def qBfsReach(s: SparkSession, dir: String): DataFrame = {
    // LAZY checkpoints throughout (r14): the hop horizon is a
    // CONSTANT (3), no convergence count interleaves the rounds, so
    // eager checkpoints bought nothing but one scheduling job per
    // frame (7 jobs total). Lazy keeps the per-round plan truncation
    // (planning stays O(1) per round); the single final action
    // materializes each marked RDD (concurrent stages of that job MAY
    // recompute a partition before its cache blocks land — harmless
    // here: every consumer is set-semantic over deterministic
    // content, and the JobStats task counts dropped, not rose).
    val e = coPurchaseEdges(s, dir).localCheckpoint(eager = false)
    val src = Tables.load(s, dir, "part")
      .filter(col("p_partkey") % bfsSourceModulus === 0)
      .select(col("p_partkey").as("p")).withColumn("hop", lit(0))
    var visited = src.localCheckpoint(eager = false)
    var frontier = visited.select("p")
    (1 to bfsMaxHops).foreach { h =>
      val next = frontier
        .join(e.hint("shuffle_hash"), col("p") === col("a"))
        .select(col("b").as("p")).distinct()
        .join(visited.select("p").hint("shuffle_hash"), Seq("p"),
          "left_anti")
        .withColumn("hop", lit(h))
        .localCheckpoint(eager = false)
      visited = visited.union(next).localCheckpoint(eager = false)
      frontier = next.select("p")
    }
    visited.select(col("p").as("p_partkey"),
      col("hop").cast(LongType).as("hops")).orderBy("p_partkey")
  }

  val qBfsReachSql: String =
    s"""WITH RECURSIVE $liSampleSql,
       |$symEdgeSql,
       |walk(p, hop) AS (
       |  SELECT p_partkey, 0 FROM part
       |  WHERE p_partkey % $bfsSourceModulus = 0
       |  UNION
       |  SELECT e.b, w.hop + 1 FROM walk w JOIN e ON w.p = e.a
       |  WHERE w.hop < $bfsMaxHops)
       |SELECT p AS p_partkey, CAST(MIN(hop) AS BIGINT) AS hops
       |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin

  /** Weighted cheapest-path labels (bounded Bellman-Ford) over the
    * part co-purchase graph — the COST companion to q_bfs_reach's
    * hop counts: with edge cost = the lightest co-purchase the pair
    * was ever seen in (min of the two line quantities summed), the
    * question becomes "what is the cheapest ≤3-edge route from any
    * seed part to every reachable part" — the substitution-cost /
    * routing read behind recommendation re-ranking, where hop count
    * alone over-values heavily-bundled hub parts.
    *
    * Built as textbook distributed Bellman-Ford: per round,
    * dist ⨝ edges relaxes every frontier label (keyed shuffle joins,
    * never cartesian), then ONE min-agg collapses candidates; after
    * round k every label is the exact minimum over ≤k-edge walks
    * (the optimal ≤k+1-edge walk extends an optimal ≤k-edge walk, so
    * per-round min-collapse loses nothing). localCheckpoint pins
    * each round — the dedup_clusters iterative discipline, lineage
    * O(1) per round.
    *
    * Scale shape: edge weights come from ONE map-side-combined
    * min-agg over the co-purchase self-join (thin integer rows);
    * every relaxation round shuffles only the label frame (nodes,
    * not edges — the edge frame is checkpoint-pinned once and
    * reused); rounds are bounded by the hop horizon, not the graph
    * diameter. */
  def qShortestPath(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_partkey") % triModulus === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"),
        expr("cast(cast(l_quantity as decimal(12,2)) as bigint)").as("q"))
    val e = li.as("x")
      .join(li.as("y").hint("shuffle_hash"), col("x.o") === col("y.o"))
      .filter(col("x.p") =!= col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"),
        (col("x.q") + col("y.q")).as("qq"))
      .groupBy("a", "b").agg(min("qq").as("w"))
      // LAZY checkpoints: fixed-horizon loop with no interleaved
      // driver action — same rationale as qBfsReach above.
      .localCheckpoint(eager = false)
    val src = Tables.load(s, dir, "part")
      .filter(col("p_partkey") % bfsSourceModulus === 0)
      .select(col("p_partkey").as("p")).withColumn("cost", lit(0L))
    var dist = src.localCheckpoint(eager = false)
    (1 to bfsMaxHops).foreach { _ =>
      val relax = dist
        .join(e.hint("shuffle_hash"), col("p") === col("a"))
        .select(col("b").as("p"), (col("cost") + col("w")).as("cost"))
      dist = dist.union(relax)
        .groupBy("p").agg(min("cost").as("cost"))
        .localCheckpoint(eager = false)
    }
    dist.select(col("p").as("p_partkey"), col("cost")).orderBy("p_partkey")
  }

  val qShortestPathSql: String =
    s"""WITH RECURSIVE li AS (
       |  SELECT l_orderkey AS o, l_partkey AS p,
       |    CAST(FLOOR(l_quantity) AS BIGINT) AS q
       |  FROM lineitem WHERE l_partkey % $triModulus = 0),
       |e AS (
       |  SELECT x.p AS a, y.p AS b, MIN(x.q + y.q) AS w
       |  FROM li x JOIN li y ON x.o = y.o AND x.p <> y.p
       |  GROUP BY 1, 2),
       |walk(p, hop, cost) AS (
       |  SELECT p_partkey, 0, CAST(0 AS BIGINT) FROM part
       |  WHERE p_partkey % $bfsSourceModulus = 0
       |  UNION
       |  SELECT e.b, w.hop + 1, w.cost + e.w
       |  FROM walk w JOIN e ON w.p = e.a
       |  WHERE w.hop < $bfsMaxHops)
       |SELECT p AS p_partkey, CAST(MIN(cost) AS BIGINT) AS cost
       |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin

  /** Centered second-moment trees for the 2-feature normal
    * equations, shared verbatim by both engines. */
  private val multiregMoments: Seq[(String, String)] = Seq(
    "a11" -> """CAST(s11 AS DOUBLE)
               | - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
               |   / CAST(n AS DOUBLE)""".stripMargin,
    "a12" -> """CAST(s12 AS DOUBLE)
               | - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
               |   / CAST(n AS DOUBLE)""".stripMargin,
    "a22" -> """CAST(s22 AS DOUBLE)
               | - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
               |   / CAST(n AS DOUBLE)""".stripMargin,
    "b1v" -> """CAST(s1y AS DOUBLE)
               | - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE)
               |   / CAST(n AS DOUBLE)""".stripMargin,
    "b2v" -> """CAST(s2y AS DOUBLE)
               | - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE)
               |   / CAST(n AS DOUBLE)""".stripMargin,
    "det" -> "a11 * a22 - a12 * a12")

  private val multiregBeta1 = "(a22 * b1v - a12 * b2v) / det"
  private val multiregBeta2 = "(a11 * b2v - a12 * b1v) / det"
  private val multiregIntercept: String =
    """CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      | - ((a22 * b1v - a12 * b2v) / det)
      |   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      | - ((a11 * b2v - a12 * b1v) / det)
      |   * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))""".stripMargin
  private val multiregR2: String =
    """(((a22 * b1v - a12 * b2v) / det) * b1v
      |  + ((a11 * b2v - a12 * b1v) / det) * b2v)
      | / (CAST(syy AS DOUBLE)
      |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
      |      / CAST(n AS DOUBLE))""".stripMargin

  /** Two-feature least squares in ONE pass — price explained by
    * quantity AND discount per return-flag group: the closed-form
    * normal equations (2×2 inverse) over exact sufficient statistics,
    * i.e. the multivariate extension of q_trend_slope/q_stats_funcs'
    * single-feature fits, and the workhorse "controlled-for" read
    * ("does discount still predict price once quantity is held
    * fixed?") every pricing/elasticity dashboard runs before a model
    * is trained.
    *
    * Exactness: all nine sufficient statistics (n, Σx₁, Σx₂, Σy and
    * the five second moments) are exact DECIMAL sums of bounded long
    * per-row products; every double combination — centered moments,
    * determinant, the two betas, intercept, R² — is a tree string
    * shared verbatim with the oracle.
    *
    * Scale shape: q1_agg's — ONE map-side-combined aggregate per
    * group, closed-form math on the group-count-sized frame; nothing
    * downstream is data-sized and no iteration anywhere. */
  def qMultireg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_returnflag"),
      expr("cast(cast(l_quantity as decimal(12,2)) as bigint)").as("x1"),
      expr("cast(cast(l_discount as decimal(12,3)) * 1000 as bigint)")
        .as("x2"),
      expr("cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)"
        + " div 100").as("y"))
    // sums exact in DECIMAL, surfaced as long for the bitwise-shared
    // double trees (long→double is correctly rounded in both engines;
    // hugeint/decimal→double is not guaranteed to be). The largest
    // sum (Σy² in cents²) stays under 2^63 through sf0.1; a 100 TB
    // deployment keeps the decimal sums and converts once on the
    // group-sized frame — a 16th-digit ULP is immaterial to a fit,
    // only to this oracle's bitwise gate. The response is priced in
    // whole DOLLARS (truncated cents, mirrored in both engines):
    // cents² sums overflow long at sf1, dollars² fit through sf100,
    // and a regression is insensitive to sub-dollar quantization.
    def dsum(e: String) =
      sum(expr(s"cast($e as decimal(38,0))")).cast(LongType)
    val sums = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      dsum("x1").as("s1"), dsum("x2").as("s2"), dsum("y").as("sy"),
      dsum("x1 * x1").as("s11"), dsum("x2 * x2").as("s22"),
      dsum("x1 * x2").as("s12"), dsum("x1 * y").as("s1y"),
      dsum("x2 * y").as("s2y"), dsum("y * y").as("syy"))
    multiregMoments.foldLeft(sums) { case (df, (name, tree)) =>
      df.withColumn(name, expr(tree))
    }
      .select(col("l_returnflag"), col("n"),
        expr(multiregBeta1).as("beta_qty"),
        expr(multiregBeta2).as("beta_disc"),
        expr(multiregIntercept).as("intercept"),
        expr(multiregR2).as("r2"))
      .orderBy("l_returnflag")
  }

  val qMultiregSql: String = {
    val moments = multiregMoments.map { case (n, t) => s"$t AS $n" }
      .mkString(",\n    ")
    s"""WITH b AS (
       |  SELECT l_returnflag,
       |    CAST(FLOOR(l_quantity) AS BIGINT) AS x1,
       |    CAST(CAST(l_discount AS DECIMAL(12,3)) * 1000 AS BIGINT)
       |      AS x2,
       |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
       |      // 100 AS y
       |  FROM lineitem),
       |a AS (
       |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(x1) AS BIGINT) AS s1,
       |    CAST(SUM(x2) AS BIGINT) AS s2,
       |    CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x1 * x1) AS BIGINT) AS s11,
       |    CAST(SUM(x2 * x2) AS BIGINT) AS s22,
       |    CAST(SUM(x1 * x2) AS BIGINT) AS s12,
       |    CAST(SUM(x1 * y) AS BIGINT) AS s1y,
       |    CAST(SUM(x2 * y) AS BIGINT) AS s2y,
       |    CAST(SUM(y * y) AS BIGINT) AS syy
       |  FROM b GROUP BY 1),
       |m AS (
       |  SELECT *,
       |    $moments
       |  FROM a)
       |SELECT l_returnflag, n,
       |  $multiregBeta1 AS beta_qty,
       |  $multiregBeta2 AS beta_disc,
       |  $multiregIntercept AS intercept,
       |  $multiregR2 AS r2
       |FROM m ORDER BY 1""".stripMargin
  }

  /** Minimum shared neighbors for a predicted link — the candidate
    * cut every production link predictor applies before scoring. */
  val linkMinCommon = 2

  /** Common-neighbor link prediction over the part co-purchase
    * graph — the third graph read beside q_triangle_count's motif
    * census and q_bfs_reach/q_shortest_path's traversals: score
    * NON-adjacent part pairs by how many neighbors they share
    * (plus neighborhood Jaccard), the classic "customers who bought
    * these also bought..." candidate generator and the baseline
    * every fancier graph-ML link model is benchmarked against.
    *
    * Scale shape: wedges enumerate via ONE keyed self-join on the
    * shared endpoint (Σdeg² thin rows — the same budget as
    * q_triangle_count; a production run caps hub degree first),
    * collapse map-side into per-pair counts, then existing edges
    * leave via an anti-join and the node-sized degree frame joins
    * back in SHUFFLED (node count is unbounded at scale — never a
    * broadcast). The [[linkMinCommon]] cut bounds
    * the output to genuinely-supported candidates. Integer ppm, no
    * doubles. */
  def qLinkPredict(s: SparkSession, dir: String): DataFrame = {
    val e = coPurchaseEdges(s, dir)
      // symmetric edge list, reused 3×; LAZY (r15 A/B: eager 1.13 s
      // vs lazy 1.07 s best-of-4 interleaved, tasks 71→66)
      .localCheckpoint(eager = false)
    val deg = e.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    val cn = e.as("u")
      .join(e.as("v").hint("shuffle_hash"), col("u.a") === col("v.a"))
      .filter(col("u.b") < col("v.b"))
      .groupBy(col("u.b").as("pa"), col("v.b").as("pb"))
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= linkMinCommon)
      .join(e.hint("shuffle_hash"),
        col("pa") === col("a") && col("pb") === col("b"), "left_anti")
    cn.join(deg.withColumnRenamed("node", "pa")
        .withColumnRenamed("deg", "deg_a").hint("shuffle_hash"),
        Seq("pa"))
      .join(deg.withColumnRenamed("node", "pb")
        .withColumnRenamed("deg", "deg_b").hint("shuffle_hash"),
        Seq("pb"))
      .select(col("pa"), col("pb"), col("cn"), col("deg_a"),
        col("deg_b"),
        expr("(cn * 1000000) div (deg_a + deg_b - cn)")
          .as("jaccard_ppm"))
      .orderBy("pa", "pb")
  }

  val qLinkPredictSql: String =
    s"""WITH $liSampleSql,
       |$symEdgeSql,
       |deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
       |        FROM e GROUP BY 1),
       |cn AS (
       |  SELECT u.b AS pa, v.b AS pb, CAST(COUNT(*) AS BIGINT) AS cn
       |  FROM e u JOIN e v ON u.a = v.a AND u.b < v.b
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $linkMinCommon),
       |cand AS (
       |  SELECT cn.* FROM cn
       |  ANTI JOIN e ON cn.pa = e.a AND cn.pb = e.b)
       |SELECT pa, pb, cn, da.deg AS deg_a, db.deg AS deg_b,
       |  CAST((cn * 1000000) // (da.deg + db.deg - cn) AS BIGINT)
       |    AS jaccard_ppm
       |FROM cand
       |JOIN deg da ON da.node = cand.pa
       |JOIN deg db ON db.node = cand.pb
       |ORDER BY 1, 2""".stripMargin

  /** The tau-b combination tree, parsed by both engines verbatim:
    * (C − D) / sqrt((n0 − n1)(n0 − n2)) over the exact integer pair
    * counts. */
  private val kendallTauTree: String =
    """(CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
      | / sqrt((CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))
      |   * (CAST(n0 AS DOUBLE) - CAST(n2 AS DOUBLE)))""".stripMargin

  /** Kendall tau-b of quantity vs extended price per supplier — the
    * third rank-association read beside Pearson (q_stats_funcs) and
    * Spearman (q_spearman): tau counts pairwise ORDER AGREEMENTS, so
    * it is the statistic with the direct probabilistic reading
    * ("a randomly drawn pair of this supplier's lines is concordant
    * with probability (1+tau)/2") and the standard robust check when
    * Spearman and Pearson disagree.
    *
    * Exactness: every sufficient statistic is an exact integer pair
    * count — concordant, discordant, x-only / y-only / both-tied —
    * and tau-b's denominator uses n1 = pairs tied in x, n2 = pairs
    * tied in y (each including both-tied); the single double
    * combination is [[kendallTauTree]] shared textually with the
    * oracle. Groups where every pair ties in one variable (tau-b
    * undefined, 0/0) are dropped in both engines.
    *
    * Scale shape: pair counting is O(n²) per group, so the group is
    * kept catalog-bound by sampling ONE line per order
    * (l_linenumber = 1; per-supplier group size is a TPC-H constant
    * ~60 independent of SF, suppliers GROW with SF) — total pair work
    * is O(corpus × group), a keyed shuffle-hash self-join on the
    * supplier key, never cartesian; counts collapse map-side. */
  def qKendallTau(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique on the fixture — only
    // +partkey+suppkey is — so the strict pair order needs l_partkey
    // as a tiebreaker or equal-orderkey pairs vanish silently.
    val base = Tables.load(s, dir, "lineitem")
      .filter(col("l_linenumber") === 1)
      .select(col("l_suppkey").as("sk"), col("l_orderkey").as("ok"),
        col("l_partkey").as("pk"),
        expr("cast(cast(l_quantity as decimal(12,2)) as bigint)").as("q"),
        expr("cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)")
          .as("p"))
    val n = base.groupBy("sk").agg(count(lit(1)).as("n"))
    val pairs = base.as("x")
      .join(base.as("y").hint("shuffle_hash"),
        col("x.sk") === col("y.sk") &&
          (col("x.ok") < col("y.ok") ||
            (col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))))
      .select(col("x.sk").as("sk"),
        ((col("x.q") - col("y.q")) * (col("x.p") - col("y.p"))).as("s"),
        (col("x.q") === col("y.q")).as("tx"),
        (col("x.p") === col("y.p")).as("ty"))
      .groupBy("sk").agg(
        sum(when(col("s") > 0, 1L).otherwise(0L)).as("conc"),
        sum(when(col("s") < 0, 1L).otherwise(0L)).as("disc"),
        sum(when(col("tx") && !col("ty"), 1L).otherwise(0L)).as("tie_x"),
        sum(when(col("ty") && !col("tx"), 1L).otherwise(0L)).as("tie_y"),
        sum(when(col("tx") && col("ty"), 1L).otherwise(0L)).as("tie_xy"))
    n.filter(col("n") >= 2)
      .join(pairs.hint("shuffle_hash"), Seq("sk"))
      .withColumn("n0", expr("(n * (n - 1)) div 2"))
      .withColumn("n1", col("tie_x") + col("tie_xy"))
      .withColumn("n2", col("tie_y") + col("tie_xy"))
      // tau-b is undefined when EVERY pair ties in one variable
      // (n0 = n1 or n0 = n2 → 0/0); drop the degenerate groups in
      // both engines rather than emit a NaN
      .filter(col("n0") > col("n1") && col("n0") > col("n2"))
      .select(col("sk").as("l_suppkey"), col("n"), col("conc"),
        col("disc"), col("tie_x"), col("tie_y"), col("tie_xy"),
        expr(kendallTauTree).as("tau"))
      .orderBy("l_suppkey")
  }

  val qKendallTauSql: String =
    s"""WITH b AS (
       |  SELECT l_suppkey AS sk, l_orderkey AS ok, l_partkey AS pk,
       |    CAST(FLOOR(l_quantity) AS BIGINT) AS q,
       |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
       |      AS p
       |  FROM lineitem WHERE l_linenumber = 1),
       |cnt AS (
       |  SELECT sk, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
       |pr AS (
       |  SELECT x.sk,
       |    CAST(SUM(CASE WHEN (x.q - y.q) * (x.p - y.p) > 0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS conc,
       |    CAST(SUM(CASE WHEN (x.q - y.q) * (x.p - y.p) < 0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS disc,
       |    CAST(SUM(CASE WHEN x.q = y.q AND x.p <> y.p
       |      THEN 1 ELSE 0 END) AS BIGINT) AS tie_x,
       |    CAST(SUM(CASE WHEN x.p = y.p AND x.q <> y.q
       |      THEN 1 ELSE 0 END) AS BIGINT) AS tie_y,
       |    CAST(SUM(CASE WHEN x.q = y.q AND x.p = y.p
       |      THEN 1 ELSE 0 END) AS BIGINT) AS tie_xy
       |  FROM b x JOIN b y ON x.sk = y.sk
       |    AND (x.ok < y.ok OR (x.ok = y.ok AND x.pk < y.pk))
       |  GROUP BY 1),
       |j AS (
       |  SELECT cnt.sk, cnt.n, pr.conc, pr.disc,
       |    pr.tie_x, pr.tie_y, pr.tie_xy,
       |    (cnt.n * (cnt.n - 1)) // 2 AS n0,
       |    pr.tie_x + pr.tie_xy AS n1,
       |    pr.tie_y + pr.tie_xy AS n2
       |  FROM cnt JOIN pr ON cnt.sk = pr.sk
       |  WHERE cnt.n >= 2)
       |SELECT sk AS l_suppkey, n, conc, disc, tie_x, tie_y, tie_xy,
       |  $kendallTauTree AS tau
       |FROM j WHERE n0 > n1 AND n0 > n2 ORDER BY 1""".stripMargin

  /** Spearman rank correlation of quantity vs extended price per
    * SUPPLIER — the monotone-association read Pearson (q_stats_funcs)
    * misses when the relation is nonlinear or outlier-laden; per
    * supplier it answers "does this supplier's line price actually
    * track order size?" as a robust profiling signal.
    *
    * Exactness: ties use the classical average-rank convention kept
    * in INTEGER half-units — 2·avgrank = 2·rank() + ties − 1 — so
    * the sufficient statistics are exact integer sums (Pearson is
    * scale-invariant, so rho(2rx, 2ry) = rho(rx, ry)); the single
    * double combination reuses [[corrTree]] verbatim in both engines.
    *
    * Scale shape: the rank windows partition by supplier — a key
    * whose cardinality GROWS with the corpus (TPC-H suppliers scale
    * with SF), so the two sorts are honestly parallel range sorts,
    * never a handful-of-reducers window; per-group rank products fit
    * long at any SF because per-supplier group size is catalog-bound,
    * and the corpus SUMs run in DECIMAL(38,0). */
  def qSpearman(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_suppkey").as("sk"),
      expr("cast(cast(l_quantity as decimal(12,2)) as bigint)").as("q"),
      expr("cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)")
        .as("p"))
    val ranked = li.select(col("sk"),
      expr("""cast(2 * rank() over (partition by sk order by q)
        | + count(*) over (partition by sk, q) - 1 as bigint)"""
        .stripMargin).as("rx"),
      expr("""cast(2 * rank() over (partition by sk order by p)
        | + count(*) over (partition by sk, p) - 1 as bigint)"""
        .stripMargin).as("ry"))
    val sums = ranked.groupBy("sk").agg(
      count(lit(1)).as("n"),
      sum(col("rx").cast(DecimalType(38, 0))).cast(DoubleType).as("sx"),
      sum(col("ry").cast(DecimalType(38, 0))).cast(DoubleType).as("sy"),
      sum(expr("cast(rx * rx as decimal(38,0))")).cast(DoubleType).as("sxx"),
      sum(expr("cast(ry * ry as decimal(38,0))")).cast(DoubleType).as("syy"),
      sum(expr("cast(rx * ry as decimal(38,0))")).cast(DoubleType).as("sxy"))
    sums.select(col("sk").as("l_suppkey"), col("n"),
        expr(corrTree("sx", "sy", "sxx", "syy", "sxy")).as("rho"))
      .orderBy("l_suppkey")
  }

  val qSpearmanSql: String =
    s"""WITH b AS (
       |  SELECT l_suppkey AS sk,
       |    CAST(FLOOR(l_quantity) AS BIGINT) AS q,
       |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
       |      AS p
       |  FROM lineitem),
       |r AS (
       |  SELECT sk,
       |    CAST(2 * RANK() OVER (PARTITION BY sk ORDER BY q)
       |      + COUNT(*) OVER (PARTITION BY sk, q) - 1 AS BIGINT) AS rx,
       |    CAST(2 * RANK() OVER (PARTITION BY sk ORDER BY p)
       |      + COUNT(*) OVER (PARTITION BY sk, p) - 1 AS BIGINT) AS ry
       |  FROM b),
       |s AS (
       |  SELECT sk, COUNT(*) AS n,
       |    CAST(SUM(CAST(rx AS HUGEINT)) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(ry AS HUGEINT)) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(rx AS HUGEINT) * rx) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(ry AS HUGEINT) * ry) AS DOUBLE) AS syy,
       |    CAST(SUM(CAST(rx AS HUGEINT) * ry) AS DOUBLE) AS sxy
       |  FROM r GROUP BY 1)
       |SELECT sk AS l_suppkey, CAST(n AS BIGINT) AS n,
       |  ${corrTree("sx", "sy", "sxx", "syy", "sxy")} AS rho
       |FROM s ORDER BY l_suppkey""".stripMargin

  /** Two-sample Kolmogorov–Smirnov distance between the total-price
    * distributions of urgent vs non-urgent orders — the standard
    * "did the distribution shift?" gate (release monitoring, cohort
    * drift, A/B sanity) that mean-based tests miss when shape, not
    * center, moves.
    *
    * Exactness: D = max_v |F1(v) − F2(v)| is computed as an INTEGER
    * cross-multiplied numerator max|f1·n2 − f2·n1| (no per-point
    * division), so the max and its location are exact; the one
    * division to a double happens once on the final row. The argmax
    * price is tie-broken to the smallest (struct-max on (gap, −v)).
    *
    * Scale shape: the corpus collapses to the price-grain frame
    * first (one agg), then BOTH ECDF prefix-sums ride ONE
    * [[graft.plans.GlobalRank.withExclusiveSums]] scan (range
    * partition by value, per-partition window, driver-side offsets —
    * model-sized: one long pair per partition), which also returns
    * n1/n2 so no separate count pass exists. The cross-products fit
    * long up to ~3e9 orders per side; past that the numerator lifts
    * to decimal unchanged. */
  def qKsTest(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select(
      expr("cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)")
        .as("v"),
      when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
        .as("g1"))
    val per = o.groupBy("v").agg(sum(col("g1")).as("c1"),
      (count(lit(1)) - sum(col("g1"))).as("c2"))
    val (scanned, ts) = graft.plans.GlobalRank.withExclusiveSums(
      s, per, Seq(col("v")), Seq(col("c1"), col("c2")), Seq("e1", "e2"))
    val n1 = ts(0)
    val n2 = ts(1)
    val cum = scanned
      .withColumn("f1", col("e1") + col("c1"))
      .withColumn("f2", col("e2") + col("c2"))
    cum.select(col("v"),
        abs(col("f1") * lit(n2) - col("f2") * lit(n1)).as("gap"))
      .agg(max(struct(col("gap"), (-col("v")).as("nv"))).as("b"))
      .select(lit(n1).as("n1"), lit(n2).as("n2"),
        col("b.gap").as("d_num"), (-col("b.nv")).as("at_cents"),
        (col("b.gap").cast(DoubleType) /
          (lit(n1.toDouble) * lit(n2.toDouble))).as("ks_d"))
  }

  val qKsTestSql: String =
    """WITH o AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      AS v,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
      |  FROM orders),
      |n AS (SELECT SUM(g1) AS n1, COUNT(*) - SUM(g1) AS n2 FROM o),
      |per AS (
      |  SELECT v, SUM(g1) AS c1, COUNT(*) - SUM(g1) AS c2
      |  FROM o GROUP BY 1),
      |cum AS (
      |  SELECT v,
      |    SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f1,
      |    SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f2
      |  FROM per),
      |gap AS (
      |  SELECT v, ABS(f1 * n.n2 - f2 * n.n1) AS gap FROM cum, n)
      |SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
      |  CAST(gap AS BIGINT) AS d_num, v AS at_cents,
      |  CAST(gap AS DOUBLE)
      |    / (CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)) AS ks_d
      |FROM gap, n ORDER BY gap DESC, v ASC LIMIT 1""".stripMargin

  /** Mann–Whitney U (Wilcoxon rank-sum) comparing line quantities of
    * returned ('R') vs kept lines — the nonparametric "is one group
    * stochastically larger?" test, the robust companion to a means
    * test when the distribution is discrete and skewed (quantities
    * are 1..50 integers: exactly the tie-heavy regime where the
    * rank-sum with tie-corrected variance is the defensible test).
    *
    * Exactness: the corpus collapses to the ~50-row quantity-grain
    * frame FIRST (one map-side-combined agg); ranks in integer
    * half-units (2·avgrank(v) = 2·cumAll(v) − cnt(v) + 1), so
    * R1, U1, and the tie-cube correction ΣT(t³−t) are exact integer
    * sums; z is one mirrored double tree at the end.
    *
    * Scale shape: ONE aggregate over the corpus, then all rank and
    * test arithmetic runs on the value-domain frame (50 rows at any
    * SF) — the single-partition window is over 50 rows by
    * construction, not corpus-sized. Per-value c1·r2 products fit
    * long to ~2e9 rows per value; the SUMs run in DECIMAL(38,0). */
  def qMannWhitney(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      expr("cast(cast(l_quantity as decimal(12,2)) as bigint)").as("v"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("g1"))
    val per = li.groupBy("v").agg(sum(col("g1")).as("c1"),
      (count(lit(1)) - sum(col("g1"))).as("c2"))
    // value-domain frame: |quantities| rows, window cost is O(50)
    val cum = per.select(col("v"), col("c1"), col("c2"),
      (col("c1") + col("c2")).as("cnt"),
      expr("""sum(c1 + c2) over (order by v
        | rows between unbounded preceding and current row)"""
        .stripMargin).as("cum_all"))
    val r2 = cum.withColumn("r2",
      lit(2L) * col("cum_all") - col("cnt") + lit(1L))
    val agg = r2.agg(
      sum(col("c1")).as("n1"),
      sum(col("c2")).as("n2"),
      sum(expr("cast(c1 * r2 as decimal(38,0))")).cast(LongType)
        .as("r1_x2"),
      sum(expr("cast(cnt * cnt * cnt - cnt as decimal(38,0))"))
        .cast(LongType).as("tie_cubes"))
    agg
      .withColumn("u1_x2",
        lit(2L) * col("n1") * col("n2") +
          col("n1") * (col("n1") + lit(1L)) - col("r1_x2"))
      .withColumn("z", expr(mannWhitneyZTree))
      .select("n1", "n2", "r1_x2", "u1_x2", "tie_cubes", "z")
  }

  /** The tie-corrected z tree, parsed verbatim by both engines:
    * z = (U1 − n1·n2/2) / sqrt(n1·n2/12 · (N+1 − ΣT/(N·(N−1)))). */
  private def mannWhitneyZTree: String =
    """(CAST(u1_x2 AS DOUBLE) / 2.0
      |  - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
      | / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
      |   * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0
      |      - CAST(tie_cubes AS DOUBLE)
      |        / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
      |           * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))))"""
      .stripMargin

  val qMannWhitneySql: String =
    s"""WITH b AS (
       |  SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS v,
       |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g1
       |  FROM lineitem),
       |per AS (
       |  SELECT v, SUM(g1) AS c1, COUNT(*) - SUM(g1) AS c2
       |  FROM b GROUP BY 1),
       |cum AS (
       |  SELECT v, c1, c2, c1 + c2 AS cnt,
       |    SUM(c1 + c2) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
       |  FROM per),
       |r AS (SELECT *, 2 * cum_all - cnt + 1 AS r2 FROM cum),
       |a AS (
       |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
       |    CAST(SUM(c2) AS BIGINT) AS n2,
       |    CAST(SUM(CAST(c1 AS HUGEINT) * r2) AS BIGINT) AS r1_x2,
       |    CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS BIGINT)
       |      AS tie_cubes
       |  FROM r),
       |u AS (
       |  SELECT *, 2 * n1 * n2 + n1 * (n1 + 1) - r1_x2 AS u1_x2 FROM a)
       |SELECT n1, n2, r1_x2, CAST(u1_x2 AS BIGINT) AS u1_x2, tie_cubes,
       |  $mannWhitneyZTree AS z
       |FROM u""".stripMargin

  /** Ecological-diversity profile of the language mix per document
    * source — Simpson's index (probability two random docs share a
    * language), its Gini-Simpson complement, and language richness:
    * the corpus-composition read a training-data curator checks
    * before fixing a sampling mix (q_chi2 tests independence; this
    * SUMMARIZES concentration per source in one interpretable number).
    *
    * Exactness: Simpson's numerator Σnᵢ(nᵢ−1) and denominator
    * N(N−1) are exact integers; ONE division to double per output
    * column, mirrored textually.
    *
    * Scale shape: two chained map-side-combined aggregates —
    * (source, lang) grain then source grain; per-row products fit
    * long up to ~3e9 docs per (source, lang) cell, with the SUM in
    * DECIMAL(38,0) past that (documented, matching q_chi2's rule). */
  def qDiversity(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(s, dir, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
    per.groupBy("source").agg(
        sum(col("c")).as("n_docs"),
        count(lit(1)).as("n_langs"),
        sum(expr("c * (c - 1)")).as("simpson_num"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        col("simpson_num"),
        expr("""cast(simpson_num as double)
          | / (cast(n_docs as double) * (cast(n_docs as double) - 1.0))"""
          .stripMargin).as("simpson"),
        expr("""1.0 - cast(simpson_num as double)
          | / (cast(n_docs as double) * (cast(n_docs as double) - 1.0))"""
          .stripMargin).as("gini_simpson"))
      .orderBy("source")
  }

  val qDiversitySql: String =
    """WITH per AS (
      |  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2),
      |a AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
      |    COUNT(*) AS n_langs,
      |    CAST(SUM(c * (c - 1)) AS BIGINT) AS simpson_num
      |  FROM per GROUP BY 1)
      |SELECT source, n_docs, CAST(n_langs AS BIGINT) AS n_langs,
      |  simpson_num,
      |  CAST(simpson_num AS DOUBLE)
      | / (CAST(n_docs AS DOUBLE) * (CAST(n_docs AS DOUBLE) - 1.0))
      |    AS simpson,
      |  1.0 - CAST(simpson_num AS DOUBLE)
      | / (CAST(n_docs AS DOUBLE) * (CAST(n_docs AS DOUBLE) - 1.0))
      |    AS gini_simpson
      |FROM a ORDER BY source""".stripMargin

  /** Cramér's V — the EFFECT SIZE q_chi2's per-cell terms don't
    * summarize (χ² grows with n, so "is it big?" needs the
    * normalized V ∈ [0,1]): one row for the lang × source grid with
    * χ² in exact micro-units and V.
    *
    * Exactness: summing q_chi2's per-cell DOUBLE terms would be
    * order-dependent across engines; instead each cell contributes
    * an exact INTEGER — (dev²·10⁶) div (n·rowΣ·colΣ) in
    * DECIMAL(38,0)/HUGEINT arithmetic (dev² reaches ~10²³ at sf1,
    * far past long) — whose sum is order-free (the q_benford
    * shipped-integer-ppm discipline applied to χ²); V is one
    * mirrored sqrt tree over that integer. The grid is
    * dimension-sized, so per-cell decimal math costs nothing (the
    * q_discount_scenarios lesson is about CORPUS scans, not
    * 20-row grids).
    *
    * Scale shape: identical to q_chi2 — three map-side aggregates,
    * broadcast margin cross, corpus never crosses the grid join. */
  def qCramersV(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select("lang", "source")
    val obs = d.groupBy("lang", "source").agg(count(lit(1)).as("obs"))
    val rt = d.groupBy("lang").agg(count(lit(1)).as("row_total"))
    val ct = d.groupBy("source").agg(count(lit(1)).as("col_total"))
    val n = d.count() // model-sized scalar, the q_chi2 rule
    val cells = rt.crossJoin(broadcast(ct))
      .join(obs, Seq("lang", "source"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .withColumn("dev",
        col("obs") * lit(n) - col("row_total") * col("col_total"))
      .withColumn("chi2_micro_cell", expr(
        s"""cast((cast(dev as decimal(38,0)) * cast(dev as decimal(38,0))
           | * 1000000)
           | div (cast($n as decimal(38,0)) * row_total * col_total)
           | as bigint)""".stripMargin))
    cells.agg(
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("chi2_micro_cell")).as("chi2_micro"))
      .select(lit(n).as("n"), col("n_langs"), col("n_sources"),
        col("chi2_micro"),
        expr(s"""sqrt(cast(chi2_micro as double) / (1000000.0
          | * cast($n as double)
          | * cast(least(n_langs - 1, n_sources - 1) as double)))"""
          .stripMargin).as("cramers_v"))
  }

  val qCramersVSql: String =
    """WITH d AS (SELECT lang, source FROM documents),
      |o AS (SELECT lang, source, COUNT(*) AS obs FROM d GROUP BY 1, 2),
      |r AS (SELECT lang, COUNT(*) AS row_total FROM d GROUP BY 1),
      |c AS (SELECT source, COUNT(*) AS col_total FROM d GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS n FROM d),
      |g AS (
      |  SELECT r.lang, c.source, r.row_total, c.col_total,
      |    CAST(COALESCE(o.obs, 0) AS BIGINT) AS obs, nn.n
      |  FROM r CROSS JOIN c CROSS JOIN nn
      |  LEFT JOIN o ON o.lang = r.lang AND o.source = c.source),
      |g2 AS (
      |  SELECT lang, source, n,
      |    obs * n - row_total * col_total AS dev, row_total, col_total
      |  FROM g),
      |cells AS (
      |  SELECT lang, source, n,
      |    CAST((CAST(dev AS HUGEINT) * dev * 1000000)
      |      // (CAST(n AS HUGEINT) * row_total * col_total) AS BIGINT)
      |      AS chi2_micro_cell
      |  FROM g2),
      |a AS (
      |  SELECT MAX(n) AS n,
      |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      |    CAST(SUM(chi2_micro_cell) AS BIGINT) AS chi2_micro
      |  FROM cells)
      |SELECT CAST(n AS BIGINT) AS n, n_langs, n_sources, chi2_micro,
      |  sqrt(CAST(chi2_micro AS DOUBLE) / (1000000.0
      | * CAST(n AS DOUBLE)
      | * CAST(LEAST(n_langs - 1, n_sources - 1) AS DOUBLE)))
      |    AS cramers_v
      |FROM a""".stripMargin

  /** Two-sample proportion z-test — "do discounted lines return
    * more?": the return share of high-discount (>5%) vs low-discount
    * lines, with the pooled-variance z every A/B dashboard computes
    * before celebrating a delta (q_return_rates bounds ONE rate;
    * this COMPARES two).
    *
    * Exactness: all four counts from ONE conditional-sum pass; the
    * difference is exact ppm via long div; z is one mirrored double
    * tree over exact-in-double counts.
    *
    * Scale shape: ONE map-side-combined single-row aggregate —
    * q_discount_scenarios' shape; nothing downstream is data-sized. */
  def qProportionTest(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      (col("l_discount") > 0.05).cast("int").as("hi"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
    li.agg(
        sum(when(col("hi") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("hi") === 1, col("ret")).otherwise(0L)).as("x1"),
        sum(when(col("hi") === 0, 1L).otherwise(0L)).as("n2"),
        sum(when(col("hi") === 0, col("ret")).otherwise(0L)).as("x2"))
      .withColumn("diff_ppm",
        expr("(x1 * 1000000) div n1 - (x2 * 1000000) div n2"))
      .withColumn("z", expr(proportionZTree))
  }

  /** Pooled two-proportion z tree, parsed verbatim by both engines:
    * z = (p1 − p2) / sqrt(p̂(1−p̂)(1/n1 + 1/n2)). */
  private def proportionZTree: String =
    """(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |  - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
      | / sqrt((CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE))
      |   / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
      |   * (1.0 - (CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE))
      |     / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
      |   * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))"""
      .stripMargin

  val qProportionTestSql: String =
    s"""WITH b AS (
       |  SELECT CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS hi,
       |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
       |  FROM lineitem),
       |a AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN hi = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(SUM(CASE WHEN hi = 1 THEN ret ELSE 0 END) AS BIGINT)
       |      AS x1,
       |    CAST(SUM(CASE WHEN hi = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(SUM(CASE WHEN hi = 0 THEN ret ELSE 0 END) AS BIGINT)
       |      AS x2
       |  FROM b)
       |SELECT n1, x1, n2, x2,
       |  (x1 * 1000000) // n1 - (x2 * 1000000) // n2 AS diff_ppm,
       |  $proportionZTree AS z
       |FROM a""".stripMargin

  /** Per-group sample mean and variance from the integer sums,
    * shared verbatim by both engines (suffix picks the group). */
  private def welchMean(i: Int): String =
    s"CAST(sx$i AS DOUBLE) / CAST(n$i AS DOUBLE)"
  private def welchVar(i: Int): String =
    s"""(CAST(sxx$i AS DOUBLE)
       |  - CAST(sx$i AS DOUBLE) * CAST(sx$i AS DOUBLE)
       |    / CAST(n$i AS DOUBLE))
       | / (CAST(n$i AS DOUBLE) - 1.0)""".stripMargin

  /** Welch t from the materialized means/variances — no pooled
    * variance, the unequal-variance form. */
  private val welchTTree: String =
    """(m1 - m2) / sqrt(v1 / CAST(n1 AS DOUBLE)
      |  + v2 / CAST(n2 AS DOUBLE))""".stripMargin

  /** Welch–Satterthwaite effective degrees of freedom. */
  private val welchDfTree: String =
    """((v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))
      |  * (v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)))
      | / ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
      |     / (CAST(n1 AS DOUBLE) - 1.0)
      |   + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE))
      |     / (CAST(n2 AS DOUBLE) - 1.0))""".stripMargin

  /** Welch two-sample t-test on line quantity, returned vs kept
    * lines — the A/B read for MEANS beside q_proportion_test's rates
    * ("do returned lines skew larger?"): Welch's unequal-variance
    * form is the default every experimentation platform runs, with
    * the Welch–Satterthwaite effective df reported alongside t.
    *
    * Exactness: sufficient statistics (n, Σx, Σx²) per group come
    * from ONE map-side-combined conditional-sum pass in DECIMAL
    * (per-row x² stays long — quantity is ≤ 50); the group means are
    * also emitted as exact integer milli-units; t and df are double
    * trees built from materialized m/v columns, every tree string
    * shared verbatim with the oracle.
    *
    * Scale shape: q_proportion_test's — nothing downstream is
    * data-sized; the single aggregate row carries the whole test. */
  def qWelchTtest(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      (col("l_returnflag") === "R").as("ret"),
      expr("cast(cast(l_quantity as decimal(12,2)) as bigint)").as("q"))
    li.agg(
        sum(when(col("ret"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("ret"), col("q")).otherwise(0L)
          .cast(DecimalType(38, 0))).cast(LongType).as("sx1"),
        sum(when(col("ret"), col("q") * col("q")).otherwise(0L)
          .cast(DecimalType(38, 0))).cast(LongType).as("sxx1"),
        sum(when(!col("ret"), 1L).otherwise(0L)).as("n2"),
        sum(when(!col("ret"), col("q")).otherwise(0L)
          .cast(DecimalType(38, 0))).cast(LongType).as("sx2"),
        sum(when(!col("ret"), col("q") * col("q")).otherwise(0L)
          .cast(DecimalType(38, 0))).cast(LongType).as("sxx2"))
      .withColumn("mean1_milli", expr("(sx1 * 1000) div n1"))
      .withColumn("mean2_milli", expr("(sx2 * 1000) div n2"))
      .withColumn("m1", expr(welchMean(1)))
      .withColumn("m2", expr(welchMean(2)))
      .withColumn("v1", expr(welchVar(1)))
      .withColumn("v2", expr(welchVar(2)))
      .select(col("n1"), col("n2"), col("mean1_milli"),
        col("mean2_milli"),
        expr(welchTTree).as("t"), expr(welchDfTree).as("df"))
  }

  val qWelchTtestSql: String =
    s"""WITH b AS (
       |  SELECT l_returnflag = 'R' AS ret,
       |    CAST(FLOOR(l_quantity) AS BIGINT) AS q
       |  FROM lineitem),
       |a AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN ret THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(SUM(CASE WHEN ret THEN q ELSE 0 END) AS BIGINT) AS sx1,
       |    CAST(SUM(CASE WHEN ret THEN q * q ELSE 0 END) AS BIGINT)
       |      AS sxx1,
       |    CAST(SUM(CASE WHEN NOT ret THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n2,
       |    CAST(SUM(CASE WHEN NOT ret THEN q ELSE 0 END) AS BIGINT)
       |      AS sx2,
       |    CAST(SUM(CASE WHEN NOT ret THEN q * q ELSE 0 END) AS BIGINT)
       |      AS sxx2
       |  FROM b),
       |m AS (
       |  SELECT *,
       |    ${welchMean(1)} AS m1, ${welchMean(2)} AS m2,
       |    ${welchVar(1)} AS v1, ${welchVar(2)} AS v2
       |  FROM a)
       |SELECT n1, n2,
       |  (sx1 * 1000) // n1 AS mean1_milli,
       |  (sx2 * 1000) // n2 AS mean2_milli,
       |  $welchTTree AS t, $welchDfTree AS df
       |FROM m""".stripMargin

  // ---- q_dbscan_grid: density-based clustering, grid-bucketed ----

  /** DBSCAN parameters: eps-ball radius (squared, exact integers) and
    * the core-point density threshold (neighbor count INCLUDING the
    * point itself, the textbook |N_eps(p)| ≥ minPts). */
  val dbscanEps = 120L
  val dbscanEps2: Long = dbscanEps * dbscanEps
  val dbscanMinPts = 4L

  /** Planted 2-D point cloud over the customer id domain (all-integer
    * coordinates, shared verbatim with the oracle): consecutive ids
    * form 20-point blobs around deterministic centers; every 20th id
    * scatters 50× wider (the noise material) and one more sits at 3×
    * the blob radius (the edge material — close enough to reach some
    * blob points, usually too sparse to be core itself: the border
    * class). Fixed blob SIZE
    * (not count) keeps density, and the oracle's reachability-flood
    * row volume, SF-invariant: corpus growth adds blobs, it never
    * inflates one component. Coordinates are strictly positive so
    * integer division (grid cells) agrees across engines' negative
    * semantics. */
  private def dbscanOffset(mult: String): String =
    s"(case when pid % 20 = 13 then ($mult) * 50" +
      s" when pid % 20 = 7 then ($mult) * 3 else $mult end)"

  private val dbscanPointSql: Seq[String] = Seq(
    "10000 + ((pid div 20) * 9176) % 100000 + " +
      dbscanOffset("(pid * 37) % 101 - 50"),
    "10000 + ((pid div 20) * 5351) % 100000 + " +
      dbscanOffset("(pid * 53) % 101 - 50"))

  /** Grid-bucketed DBSCAN (Ester et al., KDD'96) — density clustering
    * with the quadratic eps-join REPLACED by the 9-cell grid join
    * every spatial engine uses: each point probes its own and the 8
    * adjacent eps-sized cells, so candidate pairs are O(points ×
    * local density) and the corpus is never crossed with itself (the
    * blocking-key discipline of q_fuzzy_join applied to geometry; at
    * 100 TB the cell id is the shuffle key and skewed cells salt like
    * any other hot key).
    *
    * Pipeline: exact integer eps²-filter → per-point neighbor count →
    * core points → connected components over core-core edges via the
    * star-contraction machinery (DedupOps.clusterLabels —
    * O(log diameter) rounds) → border points adopt the smallest
    * neighboring core's cluster; everything else is noise. Output is
    * the full per-point classification.
    *
    * Oracle: same grid join in SQL, components re-derived by a
    * recursive reachability flood (bounded because blob size is
    * fixed), border/noise by the same deterministic min rules —
    * hash-exact end to end, label propagation included. */
  def qDbscanGrid(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("pid"))
      .withColumn("x", expr(dbscanPointSql(0)))
      .withColumn("y", expr(dbscanPointSql(1)))
      .withColumn("cx", expr(s"x div $dbscanEps"))
      .withColumn("cy", expr(s"y div $dbscanEps"))
    val probes = pts.select(col("pid"), col("x"), col("y"),
        explode(expr("array(-1, 0, 1)")).as("dx"), col("cx"), col("cy"))
      .select(col("pid"), col("x"), col("y"),
        (col("cx") + col("dx")).as("px"),
        explode(expr("array(-1, 0, 1)")).as("dy"), col("cy"))
      .select(col("pid"), col("x"), col("y"), col("px"),
        (col("cy") + col("dy")).as("py"))
    val nbr = probes.toDF("a", "ax", "ay", "px", "py")
      .join(pts.select(col("pid").as("b"), col("x").as("bx"),
        col("y").as("by"), col("cx"), col("cy")),
        col("px") === col("cx") && col("py") === col("cy"))
      .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")) <= dbscanEps2)
      .select(col("a"), col("b"))
      // LAZY (r14): feeds counts, core edges AND border adoption, but
      // the FIRST consumer to run is clusterLabels' eager initial edge
      // checkpoint, whose job shuffles every partition of nbr/cores —
      // both materialize fully inside it; the eager versions were two
      // extra scheduling jobs.
      .localCheckpoint(eager = false)
    val cnt = nbr.groupBy(col("a").as("pid"))
      .agg(count(lit(1)).as("n_neighbors"))
    val cores = cnt.filter(col("n_neighbors") >= dbscanMinPts)
      .select("pid").localCheckpoint(eager = false)
    val coreEdges = nbr
      .join(cores.toDF("a"), "a").join(cores.toDF("b"), "b")
      .filter(col("a") < col("b"))
    val labels = DedupOps.clusterLabels(
        cores.toDF("doc_id"), coreEdges.select("a", "b"))
      .toDF("pid", "cluster")
    val border = nbr.filter(col("a") =!= col("b"))
      .join(cores.toDF("b"), "b")
      .join(labels.toDF("b", "bcluster"), "b")
      .join(cores.toDF("a"), Seq("a"), "left_anti")
      .groupBy(col("a").as("pid"))
      .agg(min(col("bcluster")).as("cluster"))
    val roles = cnt
      .join(labels.withColumn("role", lit("core")), Seq("pid"), "left")
      .join(border.toDF("pid", "bc"), Seq("pid"), "left")
      .select(col("pid"), col("n_neighbors"),
        coalesce(col("role"),
          when(col("bc").isNotNull, lit("border")).otherwise(lit("noise")))
          .as("role"),
        coalesce(col("cluster"), col("bc")).as("cluster"))
    pts.select(col("pid"), col("x"), col("y")).join(roles, "pid")
  }

  val qDbscanGridSql: String = {
    val xSql = dbscanPointSql(0).replace(" div ", " // ")
    val ySql = dbscanPointSql(1).replace(" div ", " // ")
    s"""WITH RECURSIVE
       |ids AS (SELECT c_custkey AS pid FROM customer),
       |pts AS (SELECT pid, $xSql AS x, $ySql AS y FROM ids),
       |cells AS (SELECT pid, x, y, x // $dbscanEps AS cx,
       |          y // $dbscanEps AS cy FROM pts),
       |probe AS (SELECT pid, x, y, cx + dx.d AS px, cy + dy.d AS py
       |          FROM cells, (VALUES (-1), (0), (1)) dx(d),
       |               (VALUES (-1), (0), (1)) dy(d)),
       |nbr AS (SELECT p.pid AS a, c.pid AS b
       |        FROM probe p JOIN cells c ON p.px = c.cx AND p.py = c.cy
       |        WHERE (p.x - c.x) * (p.x - c.x)
       |            + (p.y - c.y) * (p.y - c.y) <= $dbscanEps2),
       |cnt AS (SELECT a AS pid, COUNT(*) AS n_neighbors FROM nbr GROUP BY 1),
       |cores AS (SELECT pid FROM cnt WHERE n_neighbors >= $dbscanMinPts),
       |ce AS (SELECT n.a AS u, n.b AS v FROM nbr n
       |       JOIN cores ca ON ca.pid = n.a JOIN cores cb ON cb.pid = n.b
       |       WHERE n.a <> n.b),
       |reach(u, lbl) AS (
       |  SELECT pid, pid FROM cores
       |  UNION
       |  SELECT e.u, r.lbl FROM ce e JOIN reach r ON r.u = e.v),
       |lab AS (SELECT u AS pid, MIN(lbl) AS cluster FROM reach GROUP BY 1),
       |brd AS (SELECT n.a AS pid, MIN(lab.cluster) AS cluster
       |        FROM nbr n JOIN cores c ON c.pid = n.b
       |        JOIN lab ON lab.pid = n.b
       |        WHERE n.a <> n.b
       |          AND n.a NOT IN (SELECT pid FROM cores)
       |        GROUP BY 1)
       |SELECT p.pid, p.x, p.y, cnt.n_neighbors,
       |  CASE WHEN lab.pid IS NOT NULL THEN 'core'
       |       WHEN brd.pid IS NOT NULL THEN 'border'
       |       ELSE 'noise' END AS role,
       |  COALESCE(lab.cluster, brd.cluster) AS cluster
       |FROM pts p JOIN cnt ON cnt.pid = p.pid
       |LEFT JOIN lab ON lab.pid = p.pid
       |LEFT JOIN brd ON brd.pid = p.pid""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dbscan_grid" -> (qDbscanGrid _),
    "q_welch_ttest" -> (qWelchTtest _),
    "q_cramers_v" -> (qCramersV _),
    "q_proportion_test" -> (qProportionTest _),
    "q_bfs_reach" -> (qBfsReach _),
    "q_shortest_path" -> (qShortestPath _),
    "q_link_predict" -> (qLinkPredict _),
    "q_multireg" -> (qMultireg _),
    "q_spearman" -> (qSpearman _),
    "q_kendall_tau" -> (qKendallTau _),
    "q_ks_test" -> (qKsTest _),
    "q_mannwhitney" -> (qMannWhitney _),
    "q_diversity" -> (qDiversity _),
    "q_cov_matrix" -> (qCovMatrix _),
    "q_return_rates" -> (qReturnRates _),
    "q_moments" -> (qMoments _),
    "q_stats_funcs" -> (qStatsFuncs _),
    "q_fuzzy_join" -> (qFuzzyJoin _),
    "q_triangle_count" -> (qTriangleCount _),
    "q_chi2" -> (qChi2 _))

  val oracles: Map[String, String] = Map(
    "q_dbscan_grid" -> qDbscanGridSql,
    "q_welch_ttest" -> qWelchTtestSql,
    "q_cramers_v" -> qCramersVSql,
    "q_proportion_test" -> qProportionTestSql,
    "q_bfs_reach" -> qBfsReachSql,
    "q_shortest_path" -> qShortestPathSql,
    "q_link_predict" -> qLinkPredictSql,
    "q_multireg" -> qMultiregSql,
    "q_spearman" -> qSpearmanSql,
    "q_kendall_tau" -> qKendallTauSql,
    "q_ks_test" -> qKsTestSql,
    "q_mannwhitney" -> qMannWhitneySql,
    "q_diversity" -> qDiversitySql,
    "q_cov_matrix" -> qCovMatrixSql,
    "q_return_rates" -> qReturnRatesSql,
    "q_moments" -> qMomentsSql,
    "q_stats_funcs" -> qStatsFuncsSql,
    "q_fuzzy_join" -> qFuzzyJoinSql,
    "q_triangle_count" -> qTriangleCountSql,
    "q_chi2" -> qChi2Sql)
}
