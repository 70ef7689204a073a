package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** Core relational query surface — the engine capability every ETL
  * migration implicitly relies on (the reference runs arbitrary
  * SELECT/JOIN/WHERE per table; cf /root/reference/libs/MysqlParser.py:121-150).
  *
  * Oracle-parity rules (SURVEY.md §4): no sum(double) ever — cast to
  * exact decimal before aggregation and to double only on the final
  * output; deterministic total ordering with unique tie-breaks.
  */
object Relational {

  /** Exact money: 2-decimal doubles -> decimal(12,2) (values < 1e6). */
  private def d2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Exact percentage (discount/tax in [0,1], 2 decimals). */
  private def pct(c: Column): Column = c.cast(DecimalType(4, 2))
  private val one = lit(1).cast(DecimalType(4, 2))

  /** TPC-H Q1 in exact integer units (r10, twice-hardened): each
    * decimal product is exact at its natural scale (price in cents,
    * disc-price in 1e-4 units, charge in 1e-6 units); the big unit
    * sums surface via the SPLIT Σ(x div 10⁹)·10⁹ + Σ(x mod 10⁹), so
    * every surfaced sum stays below 2⁶³ by construction through
    * ~sf1000 — the regime where BOTH engines' int→double casts are
    * correctly rounded. History: the original scale-4/6 decimal sums
    * crossed 2^53 unscaled at sf1, where DuckDB's
    * scaled-decimal→double cast double-rounds (sf1-sweep catch);
    * the intermediate DECIMAL(38,0)↔HUGEINT fix would itself
    * mis-round past 2^64 (DuckDB's hugeint→double, ~5% of values —
    * second-review catch), a line sum_charge crosses near sf80. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    def splitSum(u: String): String =
      s"(cast(sum($u div 1000000000) as double) * 1000000000.0d" +
        s" + cast(sum($u % 1000000000) as double))"
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("cast(cast(l_quantity as decimal(12,2)) * 100 as bigint)")
          .as("qc"),
        expr("cast(cast(l_extendedprice as decimal(12,2)) * 100 as bigint)")
          .as("pc"),
        expr("cast(cast(l_discount as decimal(4,2)) * 100 as bigint)")
          .as("dc"),
        expr("cast(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(4,2)) - cast(l_discount as decimal(4,2))) * 10000 as bigint)")
          .as("dp4"),
        expr("cast(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(4,2)) - cast(l_discount as decimal(4,2))) * (cast(1 as decimal(4,2)) + cast(l_tax as decimal(4,2))) * 1000000 as bigint)")
          .as("ch6"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        expr("cast(sum(qc) as double) / 100.0d").as("sum_qty"),
        expr("cast(sum(pc) as double) / 100.0d").as("sum_base_price"),
        expr(s"${splitSum("dp4")} / 10000.0d").as("sum_disc_price"),
        expr(s"${splitSum("ch6")} / 1000000.0d").as("sum_charge"),
        expr("cast(sum(qc) as double) / 100.0d / count(1)").as("avg_qty"),
        expr("cast(sum(pc) as double) / 100.0d / count(1)").as("avg_price"),
        expr("cast(sum(dc) as double) / 100.0d / count(1)").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(qc) AS BIGINT) AS DOUBLE) / 100.0::DOUBLE AS sum_qty,
      |  CAST(CAST(SUM(pc) AS BIGINT) AS DOUBLE) / 100.0::DOUBLE AS sum_base_price,
      |  (CAST(CAST(SUM(dp4 // 1000000000) AS BIGINT) AS DOUBLE) * 1000000000.0::DOUBLE
      |    + CAST(CAST(SUM(dp4 % 1000000000) AS BIGINT) AS DOUBLE)) / 10000.0::DOUBLE AS sum_disc_price,
      |  (CAST(CAST(SUM(ch6 // 1000000000) AS BIGINT) AS DOUBLE) * 1000000000.0::DOUBLE
      |    + CAST(CAST(SUM(ch6 % 1000000000) AS BIGINT) AS DOUBLE)) / 1000000.0::DOUBLE AS sum_charge,
      |  CAST(CAST(SUM(qc) AS BIGINT) AS DOUBLE) / 100.0::DOUBLE / COUNT(*) AS avg_qty,
      |  CAST(CAST(SUM(pc) AS BIGINT) AS DOUBLE) / 100.0::DOUBLE / COUNT(*) AS avg_price,
      |  CAST(CAST(SUM(dc) AS BIGINT) AS DOUBLE) / 100.0::DOUBLE / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM (SELECT l_returnflag, l_linestatus,
      |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qc,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc,
      |    CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS dc,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT) AS dp4,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) * 1000000 AS BIGINT) AS ch6
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: top-10 unshipped orders by revenue for one
    * segment. customer is small relative to lineitem -> broadcast.
    */
  def q3TopkJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-03-15").cast(TimestampType))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-03-15").cast(TimestampType))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // customer scales with SF (1.5e9 rows at SF10k) so it gets NO
    // explicit broadcast hint — a forced broadcast would bypass
    // autoBroadcastJoinThreshold and OOM at scale. AQE upgrades both
    // joins to broadcast at small SF on its own.
    li.join(ord.join(cust, ord("o_custkey") === cust("c_custkey")),
        li("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(d2(col("l_extendedprice")) * (one - pct(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3TopkJoinSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style star join: revenue by customer nation within one
    * region and date range. region/nation/customer broadcast up the
    * chain; lineitem is the only big side -> single shuffle for agg.
    */
  def q5StarJoin(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables.load(s, dir, "nation")
    val cust = Tables.load(s, dir, "customer")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
    val li = Tables.load(s, dir, "lineitem")
    val dims = cust
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "n_name")
    // region/nation are true fixed-size dims → broadcast hints above;
    // dims is customer-derived (scales with SF) so NO hint on it.
    // Join order matters more than hints: orders⨝dims first (the two
    // smaller inputs — date filter × region filter shrink it to ~6% of
    // orders), lineitem last. The biggest table then never shuffles at
    // small SF (AQE broadcasts the reduced ord⨝dims into the lineitem
    // scan), and at 100 TB the orderkey shuffle moves 0.06×|orders|
    // instead of the full li⨝ord product being re-shuffled on custkey.
    li.join(ord.join(dims, ord("o_custkey") === dims("c_custkey")),
        li("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"))
      .agg(sum(d2(col("l_extendedprice")) * (one - pct(col("l_discount"))))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5StarJoinSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Running revenue per supplier over ship time (window op; the
    * order-by key set is unique so the frame is deterministic).
    */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    li.select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).as("rn"),
        sum(d2(col("l_quantity")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_qty"))
      .filter(col("rn") <= 100)
      .orderBy(col("l_suppkey"), col("rn"))
  }

  val qWindowRunningSql: String =
    """SELECT * FROM (
      |  SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
      |    CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
      |      PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
      |) t WHERE rn <= 100
      |ORDER BY l_suppkey, rn""".stripMargin

  /** Full analytic window-function surface: lag/lead, rank/dense_rank
    * over a TIE-able ordering (orderdate ties make rank vs dense_rank
    * actually diverge), ntile quartiles, and an explicit-frame
    * first_value — all in one pass per window (Catalyst groups same-
    * window functions into a single Window exec). */
  def qWindowFuncs(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    // (priority, year) not bare priority: a 5-value partition key
    // would funnel the whole table through 5 window reducers at scale;
    // the year component keeps the key's cardinality growing with the
    // data while o_orderdate ties within a year still make rank vs
    // dense_rank diverge
    val byPrio = Window.partitionBy(col("o_orderpriority"),
        year(col("o_orderdate")))
      .orderBy(col("o_orderdate")) // date ties -> rank gaps
    ord.select(col("o_orderkey"), col("o_custkey"),
        lag(col("o_totalprice"), 1).over(byCust).as("prev_price"),
        lead(col("o_totalprice"), 1).over(byCust).as("next_price"),
        ntile(4).over(byCust).as("quartile"),
        first(col("o_totalprice")).over(
          byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_price"),
        rank().over(byPrio).as("rnk"),
        dense_rank().over(byPrio).as("drnk"))
      .orderBy("o_orderkey")
  }

  val qWindowFuncsSql: String =
    """SELECT o_orderkey, o_custkey,
      |  LAG(o_totalprice, 1) OVER wc AS prev_price,
      |  LEAD(o_totalprice, 1) OVER wc AS next_price,
      |  CAST(NTILE(4) OVER wc AS INTEGER) AS quartile,
      |  FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
      |  CAST(RANK() OVER wp AS INTEGER) AS rnk,
      |  CAST(DENSE_RANK() OVER wp AS INTEGER) AS drnk
      |FROM orders
      |WINDOW wc AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |       wp AS (PARTITION BY o_orderpriority, YEAR(o_orderdate)
      |              ORDER BY o_orderdate)
      |ORDER BY o_orderkey""".stripMargin

  /** Native pivot operator (columns per status value; explicit value
    * list keeps the schema static so no extra distinct-values job
    * runs). The conditional-agg q_case_agg covers the same semantics
    * hand-built; this exercises the dedicated API. */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(d2(col("o_totalprice"))).cast(DoubleType))
      .orderBy("o_orderpriority")

  val qPivotSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS F,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS O,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Array function surface over synthetic per-order arrays (array
    * outputs flatten through array_join — the compare harness hashes
    * scalar cells). Mirrors DuckDB's list_* family 1:1. */
  def qArrayFuncs(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    val arr = array((col("o_orderkey") % 7).cast(IntegerType),
      (col("o_orderkey") % 5).cast(IntegerType),
      (col("o_orderkey") % 3).cast(IntegerType))
    ord.select(col("o_orderkey"),
      array_join(array_sort(arr), ",").as("sorted"),
      size(array_distinct(arr)).as("n_uniq"),
      array_contains(arr, 2).as("has2"),
      array_max(arr).as("mx"),
      array_position(arr, array_max(arr)).as("mx_pos"),
      array_join(slice(arr, 1, 2), ",").as("first2"))
      .orderBy("o_orderkey")
  }

  val qArrayFuncsSql: String =
    """WITH t AS (
      |  SELECT o_orderkey,
      |    [CAST(o_orderkey % 7 AS INT), CAST(o_orderkey % 5 AS INT),
      |     CAST(o_orderkey % 3 AS INT)] AS arr
      |  FROM orders)
      |SELECT o_orderkey,
      |  array_to_string(list_sort(arr), ',') AS sorted,
      |  CAST(len(list_distinct(arr)) AS INTEGER) AS n_uniq,
      |  list_contains(arr, 2) AS has2,
      |  list_max(arr) AS mx,
      |  CAST(list_position(arr, list_max(arr)) AS BIGINT) AS mx_pos,
      |  array_to_string(arr[1:2], ',') AS first2
      |FROM t ORDER BY o_orderkey""".stripMargin

  /** JSON extraction surface: events.props carries real JSON; the
    * payload field is pulled with get_json_object and aggregated —
    * the reference migrates TEXT columns holding JSON the same way
    * (opaque in, queryable out). */
  def qJsonFuncs(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val k = get_json_object(col("props"), "$.k").cast(IntegerType)
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(k).as("sum_k"),
        max(k).as("max_k"),
        min(k).as("min_k"))
      .orderBy("event_type")
  }

  val qJsonFuncsSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k,
      |  MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Map + struct nested-type function surface — completes the
    * nested-type family beside q_array_funcs (array) and q_json_funcs
    * (json): map_from_arrays / element_at / map_keys / map_values /
    * map_contains_key / map_concat, and named_struct construction with
    * field access. The reference migrates MySQL SET/ENUM and packed
    * key-value text columns into queryable shapes the same way —
    * opaque in, structured out. Outputs are SCALARS extracted from the
    * nested values (the compare harness hashes scalar cells), so the
    * DuckDB oracle states the same values directly off the base
    * columns — parity is on the extracted results, which is exactly
    * what makes a wrong element_at/map_concat visible. All of these
    * are codegen'd expressions (no lambda higher-order functions), so
    * the projection fuses with the scan. */
  def qMapFuncs(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    val m = map_from_arrays(
      array(lit("mod7"), lit("mod5")),
      array(col("o_orderkey") % 7, col("o_orderkey") % 5))
    val extra = map_from_arrays(array(lit("mod3")), array(col("o_orderkey") % 3))
    val merged = map_concat(m, extra)
    val st = struct(col("o_orderstatus").as("status"),
      (col("o_totalprice") > 150000.0).as("big"))
    ord.select(col("o_orderkey"),
      element_at(m, "mod7").as("v7"),
      element_at(merged, "mod3").as("v3"),
      size(merged).as("n_entries"),
      array_join(map_keys(merged), ",").as("keys"),
      element_at(map_values(merged), 2).as("second_val"),
      map_contains_key(m, "mod5").as("has5"),
      map_contains_key(m, "mod9").as("has9"),
      st.getField("status").as("st_status"),
      st.getField("big").as("st_big"))
      .orderBy("o_orderkey")
  }

  val qMapFuncsSql: String =
    """SELECT o_orderkey,
      |  o_orderkey % 7 AS v7,
      |  o_orderkey % 3 AS v3,
      |  3 AS n_entries,
      |  'mod7,mod5,mod3' AS keys,
      |  o_orderkey % 5 AS second_val,
      |  TRUE AS has5,
      |  FALSE AS has9,
      |  o_orderstatus AS st_status,
      |  o_totalprice > 150000.0 AS st_big
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** JSON_TABLE-style shredding: parse a semi-structured TEXT column
    * ONCE per row into a full typed shape — nested object, string
    * array, int array — then project typed columns out of it. This is
    * the schema-on-read step q_json_funcs (per-path get_json_object)
    * doesn't cover: one from_json parse feeds every projected field,
    * where N path extractions would re-parse the payload N times —
    * the difference between one and N parses IS the operator at
    * 100 TB, where event-prop shredding dominates ingest CPU. Missing
    * keys surface as typed NULLs (every 7th payload omits the nested
    * geo object), which is the contract that lets downstream columns
    * stay nullable instead of failing ingest.
    *
    * The enriched payload is CONSTRUCTED deterministically from base
    * columns (the fixture's props carries only {"k":int}) with plain
    * string concat — identically expressible in DuckDB, so the oracle
    * builds the same bytes and shreds them with its own JSON engine:
    * parity covers construction AND extraction. Plan shape: a single
    * scan-side projection — no shuffle, no join; chunking parallelism
    * is the scan's. */
  def qJsonTable(s: SparkSession, dir: String): DataFrame = {
    // parse-bound over a possibly single-row-group source: spread
    // first (no-op on wide sources; see Tables.spread)
    val ev = Tables.spread(s, Tables.load(s, dir, "events"))
    val str = (c: Column) => c.cast(StringType)
    val k = get_json_object(col("props"), "$.k").cast(IntegerType)
    val payload = concat(
      lit("{\"k\":"), str(k),
      lit(",\"user\":"), str(col("user_id")),
      lit(",\"tags\":[\"t"), str(col("event_id") % 3),
      lit("\",\"t"), str(col("event_id") % 5), lit("\"]"),
      when(col("event_id") % 7 === 0, lit(""))
        .otherwise(concat(
          lit(",\"geo\":{\"zone\":"), str(col("event_id") % 10),
          lit(",\"grid\":["), str(col("event_id") % 4),
          lit(","), str(col("event_id") % 6), lit("]}"))),
      lit(",\"type\":\""), col("event_type"), lit("\"}"))
    val shape = StructType(Seq(
      StructField("k", IntegerType),
      StructField("user", LongType),
      StructField("tags", ArrayType(StringType)),
      StructField("geo", StructType(Seq(
        StructField("zone", IntegerType),
        StructField("grid", ArrayType(IntegerType))))),
      StructField("type", StringType)))
    // ONE parse per row, structurally guaranteed: the parsed struct is
    // let-bound (ExprUtils.bind) inside a single generator expression —
    // 8 naked projections of from_json would re-parse 8× once
    // CollapseProject inlines them (measured 7.5 s vs ~1 s at sf0.1).
    // inline(array(struct)) turns the bound struct's fields into
    // top-level columns without a materialization barrier. (A Spark 4
    // parse_json/variant_get variant measured ~1.4× SLOWER than one
    // schema-directed from_json here — 8 variant navigations beat one
    // parse only when the payload is far wider than the projection.)
    val shredded = graft.functions.ExprUtils.bind(
      from_json(payload, shape)) { j =>
      struct(
        j.getField("k").as("k"),
        j.getField("user").as("juser"),
        size(j.getField("tags")).as("n_tags"),
        element_at(j.getField("tags"), 1).as("tag0"),
        j.getField("geo").getField("zone").as("zone"),
        element_at(j.getField("geo").getField("grid"), 2).as("grid1"),
        j.getField("type").as("jtype"),
        j.getField("geo").isNull.as("geo_missing"))
    }
    // no terminal orderBy (mm_decode's rule): the compare harness
    // sorts rows canonically, and a global orderBy here is a range
    // exchange whose bounds-sampling pass re-executes the child — the
    // parse would run TWICE (measured 33 s vs 13 s at sf1 before the
    // sort was lifted; dropping it entirely removes the exchange too)
    ev.select(col("event_id"), inline(array(shredded)))
  }

  val qJsonTableSql: String =
    """WITH p AS (
      |  SELECT event_id,
      |    '{"k":' || CAST(json_extract(props,'$.k') AS INT) ||
      |    ',"user":' || user_id ||
      |    ',"tags":["t' || (event_id%3) || '","t' || (event_id%5) || '"]' ||
      |    CASE WHEN event_id%7=0 THEN '' ELSE
      |      ',"geo":{"zone":' || (event_id%10) ||
      |      ',"grid":[' || (event_id%4) || ',' || (event_id%6) || ']}' END ||
      |    ',"type":"' || event_type || '"}' AS payload
      |  FROM events)
      |SELECT event_id,
      |  CAST(json_extract(payload,'$.k') AS INT) AS k,
      |  CAST(json_extract(payload,'$.user') AS BIGINT) AS juser,
      |  CAST(json_array_length(payload,'$.tags') AS INT) AS n_tags,
      |  json_extract_string(payload,'$.tags[0]') AS tag0,
      |  CAST(json_extract(payload,'$.geo.zone') AS INT) AS zone,
      |  CAST(json_extract(payload,'$.geo.grid[1]') AS INT) AS grid1,
      |  json_extract_string(payload,'$.type') AS jtype,
      |  json_extract(payload,'$.geo') IS NULL AS geo_missing
      |FROM p ORDER BY event_id""".stripMargin

  /** Latest image per key — THE read primitive over any CDC/event log
    * (the newest order per customer here). At scale this must be ONE
    * HashAggregate with a struct max: lexicographic max over
    * (o_orderdate, o_orderkey, payload) combines map-side and holds
    * O(keys) state — never sort + row_number()=1, which is a full
    * corpus sort per key and holds every row until the window ranks
    * it (the oracle states that form; Spark runs the agg form; parity
    * proves them equivalent). The unique o_orderkey tie-break makes
    * the max deterministic; payload fields ride behind the tie-break
    * so they never drive comparison. */
  def qLatestPerKey(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    ord.groupBy(col("o_custkey"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"))).as("m"))
      .select(col("o_custkey"),
        col("m.o_orderkey").as("last_orderkey"),
        col("m.o_orderdate").as("last_orderdate"),
        col("m.o_totalprice").as("last_price"))
      .orderBy("o_custkey")
  }

  val qLatestPerKeySql: String =
    """SELECT o_custkey, o_orderkey AS last_orderkey,
      |  o_orderdate AS last_orderdate, o_totalprice AS last_price
      |FROM orders
      |QUALIFY row_number() OVER (PARTITION BY o_custkey
      |  ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
      |ORDER BY o_custkey""".stripMargin

  /** Fixed-width numeric histogram — the profiling/monitoring scan
    * every ingest dashboard runs: one pass, one groupBy on the
    * computed bucket (map-side combined, O(buckets) state). Bucket
    * arithmetic is floor(x / width) in both engines — IEEE division
    * + floor is bit-identical cross-engine where width_bucket /
    * round() variants are not. Money sums follow the decimal
    * discipline (SURVEY §4). */
  def qHistogram(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    val bucket = floor(col("o_totalprice") / 25000.0)
    ord.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(d2(col("o_totalprice"))).cast(DoubleType).as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("bucket")
  }

  val qHistogramSql: String =
    """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  MIN(o_totalprice) AS min_price,
      |  MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Distinct customers per order status (map-side partial distinct). */
  def qDistinct(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    ord.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))
  }

  val qDistinctSql: String =
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** EXISTS / NOT EXISTS as left_semi / left_anti joins. */
  def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val ord = Tables.load(s, dir, "orders").select("o_custkey")
    val withOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
    val withoutOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("without_orders").as("kind"), col("n"))
    withOrders.unionAll(withoutOrders).orderBy(col("kind"))
  }

  val qSemiAntiSql: String =
    """SELECT 'with_orders' AS kind, COUNT(*) AS n FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT 'without_orders' AS kind, COUNT(*) AS n FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY kind""".stripMargin

  /** Time-bucketed event aggregation (batch twin of the streaming op). */
  def qEventsWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    ev.groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(d2(col("value"))).cast(DoubleType).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("day"), col("event_type"))
  }

  val qEventsWindowSql: String =
    """SELECT date_trunc('day', ts) AS day, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** ROLLUP hierarchy totals with grouping_id disambiguation (NULL
    * group markers alone can't distinguish subtotal rows from NULL
    * data). Partial aggregation handles each level map-side. */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(d2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n,
      |  GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  /** LEFT OUTER join preserving customers without orders (count of
    * matches, 0 for the unmatched side). */
  def qOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val ord = Tables.load(s, dir, "orders").select("o_custkey", "o_orderkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  val qOuterJoinSql: String =
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** INTERSECT / EXCEPT set operations between two key sets. */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val withOrders = Tables.load(s, dir, "orders")
      .select(col("o_custkey").as("k")).distinct()
    val richCust = Tables.load(s, dir, "customer")
      .filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
    val both = withOrders.intersect(richCust)
      .agg(count(lit(1)).as("n")).select(lit("rich_with_orders").as("op"), col("n"))
    val richOnly = richCust.except(withOrders)
      .agg(count(lit(1)).as("n")).select(lit("rich_no_orders").as("op"), col("n"))
    both.unionAll(richOnly).orderBy("op")
  }

  val qSetOpsSql: String =
    """SELECT 'rich_with_orders' AS op, COUNT(*) AS n FROM (
      |  SELECT DISTINCT o_custkey AS k FROM orders
      |  INTERSECT
      |  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
      |UNION ALL
      |SELECT 'rich_no_orders' AS op, COUNT(*) AS n FROM (
      |  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
      |  EXCEPT
      |  SELECT DISTINCT o_custkey AS k FROM orders)
      |ORDER BY op""".stripMargin

  /** Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL next
    * to q_setops' distinct forms: on fact data, MULTIPLICITY is the
    * signal ("how many returned line items have an accepted twin"
    * counts pairs, not part ids), and the ALL forms keep it where
    * DISTINCT collapses it. Both engines implement SQL:2003 bag
    * semantics (min multiplicity for intersect, saturating difference
    * for except); the key emits all four variants side by side so the
    * distinct/all gap is itself asserted data.
    *
    * Scale shape: Catalyst lowers the ALL forms to per-key count
    * aggregates + a replicate generate — shuffles carry (key, count)
    * pairs, never row-duplicated payloads. */
  def qSetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val r = li.filter(col("l_returnflag") === "R")
      .select(col("l_partkey").as("k"))
    val a = li.filter(col("l_returnflag") === "A")
      .select(col("l_partkey").as("k"))
    Seq(
      ("intersect_all", r.intersectAll(a)),
      ("intersect_distinct", r.intersect(a)),
      ("except_all", r.exceptAll(a)),
      ("except_distinct", r.except(a)))
      .map { case (op, df) =>
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      }
      .reduce(_.unionAll(_))
  }

  val qSetOpsAllSql: String =
    """WITH r AS (SELECT l_partkey AS k FROM lineitem
      |           WHERE l_returnflag = 'R'),
      |a AS (SELECT l_partkey AS k FROM lineitem
      |      WHERE l_returnflag = 'A')
      |SELECT 'intersect_all' AS op, COUNT(*) AS n
      |  FROM (SELECT k FROM r INTERSECT ALL SELECT k FROM a)
      |UNION ALL
      |SELECT 'intersect_distinct', COUNT(*)
      |  FROM (SELECT k FROM r INTERSECT SELECT k FROM a)
      |UNION ALL
      |SELECT 'except_all', COUNT(*)
      |  FROM (SELECT k FROM r EXCEPT ALL SELECT k FROM a)
      |UNION ALL
      |SELECT 'except_distinct', COUNT(*)
      |  FROM (SELECT k FROM r EXCEPT SELECT k FROM a)""".stripMargin

  /** Conditional (pivot-style) aggregation: per priority, order counts
    * and decimal-exact revenue split by status via CASE. */
  def qCaseAgg(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    def cnt(status: String): Column =
      sum(when(col("o_orderstatus") === status, 1L).otherwise(0L))
    def rev(status: String): Column =
      sum(when(col("o_orderstatus") === status, d2(col("o_totalprice")))
        .otherwise(lit(0).cast(DecimalType(12, 2)))).cast(DoubleType)
    ord.groupBy(col("o_orderpriority"))
      .agg(cnt("F").as("n_f"), cnt("O").as("n_o"), cnt("P").as("n_p"),
        rev("F").as("rev_f"), rev("O").as("rev_o"))
      .orderBy(col("o_orderpriority"))
  }

  val qCaseAggSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS rev_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS rev_o
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Grouped top-k via the custom TopKPerKey operator (logical plan +
    * strategy + bounded-heap physical exec, graft.plans.TopKPerKey):
    * shuffles only surviving candidates instead of sorting every row
    * per key as the window form would. Hash-verified against DuckDB's
    * QUALIFY — a custom physical operator under the same correctness
    * gate as everything else. */
  def qTopkPerKey(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    graft.plans.TopKPerKey.topK(ord,
        keyCols = Seq("o_orderpriority"),
        orderBy = Seq(col("o_totalprice").desc, col("o_orderkey")),
        k = 3)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
  }

  val qTopkPerKeySql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice
      |FROM orders
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |  ORDER BY o_totalprice DESC, o_orderkey) <= 3
      |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin

  /** String-function surface parity (the reference rewrites string
    * payloads constantly; these are the building blocks). */
  def qStringFuncs(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    cust.select(col("c_custkey"),
      upper(col("c_name")).as("up"),
      lower(col("c_mktsegment")).as("lo"),
      substring(col("c_name"), 10, 5).as("sub"),
      lpad(col("c_custkey").cast(StringType), 8, "0").as("padded"),
      regexp_replace(col("c_name"), "#", "-").as("repl"),
      reverse(col("c_mktsegment")).as("rev"),
      length(col("c_name")).as("len"),
      instr(col("c_name"), "00").as("pos"),
      concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"))
  }

  val qStringFuncsSql: String =
    """SELECT c_custkey,
      |  upper(c_name) AS up, lower(c_mktsegment) AS lo,
      |  substr(c_name, 10, 5) AS sub,
      |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
      |  replace(c_name, '#', '-') AS repl,
      |  reverse(c_mktsegment) AS rev,
      |  CAST(length(c_name) AS INTEGER) AS len,
      |  CAST(instr(c_name, '00') AS INTEGER) AS pos,
      |  concat_ws('|', c_mktsegment, c_name) AS joined
      |FROM customer""".stripMargin

  /** Date/time-function surface parity on explicit DATE casts (both
    * engines agree on date arithmetic once off timestamps). */
  def qDateFuncs(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    val d = to_date(col("o_orderdate"))
    ord.select(col("o_orderkey"),
      year(d).as("y"), month(d).as("m"), dayofmonth(d).as("d"),
      date_add(d, 31).as("plus31"),
      datediff(d, lit("1996-01-01").cast(DateType)).as("dd"),
      date_format(d, "yyyy-MM").as("ym"),
      last_day(d).as("eom"))
  }

  val qDateFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS y,
      |  CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER) AS m,
      |  CAST(day(CAST(o_orderdate AS DATE)) AS INTEGER) AS d,
      |  CAST(o_orderdate AS DATE) + 31 AS plus31,
      |  CAST(date_diff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS dd,
      |  strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
      |  last_day(CAST(o_orderdate AS DATE)) AS eom
      |FROM orders""".stripMargin

  /** Exact interpolated percentiles per group (Spark `percentile` and
    * DuckDB `quantile_cont` both use linear interpolation over the
    * sorted set → bit-comparable). */
  def qPercentile(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    ord.groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.75)").as("p75"))
      .orderBy(col("o_orderstatus"))
  }

  val qPercentileSql: String =
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.25) AS p25,
      |  quantile_cont(o_totalprice, 0.75) AS p75
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Gap-based sessionization: a new session starts after >30 min of
    * user inactivity; session bounds/sizes via windowed cumsum — the
    * batch form of streaming sessionization, all within two window
    * passes over one shuffle by user. */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // exact integer microseconds on both engines (cast-to-seconds
    // truncation semantics differ between Spark and DuckDB)
    val gap = unix_micros(col("ts")) -
      lag(unix_micros(col("ts")), 1).over(byUser)
    val isNew = when(gap.isNull || gap > 1800L * 1000000, 1L).otherwise(0L)
    val sessionId = sum(isNew)
      .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ev.select(col("user_id"), col("ts"), col("event_id"),
        sessionId.as("session_id"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val qSessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) IS NULL
      |           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Gaps-and-islands interval union — merge overlapping (or
    * touching) per-key intervals into maximal islands, the other
    * classic event-log reduction beside gap sessionization
    * (q_sessionize cuts on inactivity GAPS; this merges on interval
    * OVERLAP — a row's reach can swallow later rows entirely, which
    * lag-based gap logic cannot see; hence the running max-end).
    * Each event carries a deterministic duration derived from its id
    * so the oracle rebuilds identical intervals. A new island starts
    * exactly when a start lies strictly past the max end of ALL
    * earlier intervals of that key (running max over the preceding
    * frame); islands then aggregate per (key, island). One shuffle to
    * the user grain carries both window passes AND the aggregate
    * (HashPartitioning(user_id) already clusters (user_id, island));
    * exact integer microseconds end to end (SURVEY §4). */
  def qIntervalMerge(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val iv = ev.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"),
      (unix_micros(col("ts")) +
        (col("event_id") % 7 + 1) * 60000000L).as("ev_end"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val prevMaxEnd = max(col("ev_end"))
      .over(byUser.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(prevMaxEnd.isNull || col("us") > prevMaxEnd, 1L)
      .otherwise(0L)
    val islandId = sum(isNew)
      .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    iv.select(col("user_id"), col("us"), col("ev_end"),
        islandId.as("island_id"))
      .groupBy(col("user_id"), col("island_id"))
      .agg(min(col("us")).as("start_us"),
        max(col("ev_end")).as("end_us"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("island_id"))
  }

  val qIntervalMergeSql: String =
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS ev_end
      |  FROM events),
      |mk AS (
      |  SELECT user_id, us, ev_end,
      |    CASE WHEN MAX(ev_end) OVER wprev IS NULL
      |           OR us > MAX(ev_end) OVER wprev
      |         THEN 1 ELSE 0 END AS is_new, event_id
      |  FROM iv
      |  WINDOW wprev AS (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |isl AS (
      |  SELECT user_id, us, ev_end,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS island_id
      |  FROM mk)
      |SELECT user_id, island_id, MIN(us) AS start_us, MAX(ev_end) AS end_us,
      |  COUNT(*) AS n_events
      |FROM isl GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Linear-interpolation resampling — the numeric sibling of
    * q_gap_fill's LOCF: missing days in each user's daily series get
    * values interpolated between the surrounding observations
    * (metrics dashboards, sensor series, feature backfills — LOCF
    * answers "what was last known", interpolation answers "what was
    * it probably BETWEEN knowns"). Same scale shape as gap_fill
    * (per-user spine via sequence+explode at the user grain, pinned
    * shuffled join back to the daily aggregate); the neighbor lookup
    * is four window expressions over ONE user-grain sort — prev/next
    * observation day and value via last/first ignoreNulls over the
    * past/future frames. Exactness discipline: sums are decimal
    * before the one cast to double, and the interpolation formula
    * `pv + (nv - pv) * (d - pd) / (nd - pd)` is the same
    * left-associated IEEE expression in both engines, over exact
    * integer day numbers. Spine endpoints are observed days, so
    * every interior gap has both neighbors — `value` is never null. */
  def qAsofInterpolate(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val daily = ev
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("value").cast(DecimalType(18, 2)))
        .cast(DoubleType).as("v"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"),
        explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val j = spine.join(daily.hint("shuffle_hash"), Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        unix_date(col("day").cast(DateType)).as("d"), col("v"))
    val past = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pd = last(when(col("v").isNotNull, col("d")), ignoreNulls = true).over(past)
    val pv = last(col("v"), ignoreNulls = true).over(past)
    val nd = first(when(col("v").isNotNull, col("d")), ignoreNulls = true).over(future)
    val nv = first(col("v"), ignoreNulls = true).over(future)
    j.select(col("user_id"), col("day").cast(DateType).as("day"),
        col("v").isNotNull.as("observed"),
        when(col("v").isNotNull, col("v"))
          .otherwise(pv + (nv - pv) * (col("d") - pd) / (nd - pd))
          .as("value"))
      .orderBy(col("user_id"), col("day"))
  }

  val qAsofInterpolateSql: String =
    """WITH daily AS (
      |  SELECT user_id, date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |  FROM (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
      |        FROM daily GROUP BY 1)),
      |j AS (
      |  SELECT sp.user_id, sp.day,
      |    date_diff('day', DATE '1970-01-01', CAST(sp.day AS DATE)) AS d,
      |    dd.v
      |  FROM spine sp LEFT JOIN daily dd
      |    ON sp.user_id = dd.user_id AND sp.day = dd.day),
      |w AS (
      |  SELECT user_id, day, d, v,
      |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
      |      OVER past AS pd,
      |    LAST_VALUE(v IGNORE NULLS) OVER past AS pv,
      |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
      |      OVER fut AS nd,
      |    FIRST_VALUE(v IGNORE NULLS) OVER fut AS nv
      |  FROM j
      |  WINDOW past AS (PARTITION BY user_id ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  fut AS (PARTITION BY user_id ORDER BY d
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, CAST(day AS DATE) AS day,
      |  v IS NOT NULL AS observed,
      |  CASE WHEN v IS NOT NULL THEN v
      |       ELSE pv + (nv - pv) * (d - pd) / (nd - pd) END AS value
      |FROM w ORDER BY user_id, day""".stripMargin

  /** Fixed-point scale and iteration count for q_pagerank. */
  private val prScale = 1000000000000L
  private val prIters = 3

  /** Iterative link-analysis centrality (PageRank recurrence) in
    * EXACT integer fixed-point — the iterative-numeric sibling of
    * q_hierarchy's iterative-pointer walk: ranks carry 12 fixed
    * decimal digits as longs, damping is `(r · 85) div 100`, so
    * every iteration is bit-reproducible across engines and across
    * partitionings (float PageRank is neither: double summation
    * order changes the low bits every run — the same discipline
    * that bans sum(double) in §4, applied to an ITERATIVE kernel).
    * Graph: the q_hierarchy parent forest (every node contributes
    * its full damped rank to its parent; out-degree 1, so no
    * division by out-degree complicates exactness). Three rounds of
    * contribution-aggregate + rank rebuild — the general iterative
    * shape (join on edges, aggregate to the target grain, rebuild)
    * that any fixed-point graph metric runs at 100 TB, with every
    * corpus-sized join side shuffle-pinned. The oracle unrolls the
    * SAME three rounds as plain CTEs — every intermediate rank
    * table is implicitly verified by the final hash. No terminal
    * sort: a range sort's bounds sampling would re-execute the
    * 3-round lineage (§8e's terminal-sort rule). */
  def qPagerank(s: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.load(s, dir, "orders").select(col("o_orderkey").as("k"))
    val edges = nodes.filter(col("k") > 0)
      .select(col("k").as("c"), ((col("k") * 48271L % 8191L) % col("k")).as("p"))
    var ranks = nodes.select(col("k"), lit(prScale).as("r"))
    (1 to prIters).foreach { _ =>
      val contrib = ranks.join(edges.hint("shuffle_hash"), col("k") === col("c"))
        .groupBy(col("p")).agg(sum(col("r")).as("cs"))
      ranks = nodes.join(contrib.hint("shuffle_hash"),
          nodes("k") === contrib("p"), "left")
        .select(col("k"),
          expr(s"${prScale * 15 / 100}L + (coalesce(cs, 0L) * 85) div 100")
            .as("r"))
    }
    ranks.select(col("k").as("o_orderkey"), col("r").as("rank"))
  }

  val qPagerankSql: String = {
    def round(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT n.k, ${prScale * 15 / 100} + (COALESCE(s.cs, 0) * 85) // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.p, SUM($prev.r) AS cs
         |    FROM $prev JOIN edges e ON $prev.k = e.c GROUP BY e.p) s
         |  ON n.k = s.p)""".stripMargin
    s"""WITH nodes AS (SELECT o_orderkey AS k FROM orders),
       |edges AS (SELECT k AS c, (k * 48271 % 8191) % k AS p
       |          FROM nodes WHERE k > 0),
       |r0 AS (SELECT k, CAST($prScale AS BIGINT) AS r FROM nodes),
       |${round("r0", "r1")},
       |${round("r1", "r2")},
       |${round("r2", "r3")}
       |SELECT k AS o_orderkey, CAST(r AS BIGINT) AS rank FROM r3""".stripMargin
  }

  /** Counter budget for the Misra-Gries heavy-hitter sketch. */
  val heavyK = 16

  /** Frequent-items profile under constant memory — the third sketch
    * beside HLL distinct (q_approx_distinct) and the quantile digest
    * (q_approx_percentile): a Misra-Gries summary of a deliberately
    * skewed key stream (half the fact table collapses onto 3 hot
    * keys; the rest is a near-unique tail). Guarantees, not
    * estimates-by-vibes: every key above n/(k+1) frequency MUST
    * survive and every kept count undercounts by ≤ n/(k+1) — the
    * spec asserts both against exact counts. Partial/final
    * aggregation IS the mergeable-summaries merge tree, so only
    * k-entry maps shuffle; at 100 TB this is the affordable skew
    * probe run BEFORE choosing a join strategy (the salting decision
    * q_skew_join demonstrates needs exactly this signal). [T] by
    * design like the other sketches: counter internals are
    * merge-order-dependent within the error bound, so no SQL engine
    * reproduces them bit-for-bit. */
  def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keys = Tables.load(s, dir, "lineitem").select(
      when(col("l_orderkey") % 4 < 2,
          concat(lit("hot_"), (col("l_orderkey") % 3).cast(StringType)))
        .otherwise(col("l_orderkey").cast(StringType)).as("k")).as[String]
    keys.select(graft.functions.MisraGries.sketch(heavyK).toColumn)
      .flatMap(identity)
      .toDF("item", "est_count")
      .orderBy(col("est_count").desc, col("item"))
  }

  /** Recursive hierarchy walk — the WITH RECURSIVE capability Spark
    * has no native operator for (org charts, bill-of-materials,
    * category trees: every warehouse has one). Each order key gets a
    * deterministic parent STRICTLY below it (MINSTD hash mod k, so
    * the graph is an acyclic forest rooted at 0 with no closed form
    * for ancestry — the walk must actually iterate); the key computes
    * every node's depth to the root. Naive iteration is O(depth)
    * joins; this is POINTER DOUBLING (dedup_clusters' machinery on a
    * tree): each round follows the current pointer's pointer and adds
    * its distance, so after r rounds every pointer has advanced 2^r
    * steps — O(log depth) rounds of thin (k, ptr, dist) frames, with
    * one localCheckpoint per round cutting lineage. The convergence
    * count rides the same materialization. All-integer arithmetic:
    * bit-exact against DuckDB's native WITH RECURSIVE replay of the
    * same parent formula. */
  def qHierarchy(s: SparkSession, dir: String): DataFrame = {
    def parentOf(c: Column): Column =
      when(c > 0, (c * 48271L % 8191L) % c).otherwise(lit(0L))
    // LAZY checkpoints (r14): the convergence count that follows each
    // round is the action that materializes the round's blocks, so
    // the eager checkpoint's own separate job disappears — one job
    // per round instead of two. Safe because the count runs BEFORE
    // the next round's join reads the blocks (no intra-job recompute
    // race — contrast qBfsReach, where the checkpointed edge frame is
    // consumed by several stages of one job and stays eager).
    var t = Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("k"),
        parentOf(col("o_orderkey")).as("ptr"),
        when(col("o_orderkey") > 0, 1L).otherwise(0L).as("dist"))
      .localCheckpoint(eager = false)
    var open = t.filter(col("ptr") =!= 0).count()
    var rounds = 0
    while (open > 0) {
      rounds += 1
      require(rounds <= 40, s"pointer doubling failed to converge")
      val t2 = t.select(col("k").as("j_k"), col("ptr").as("j_ptr"),
        col("dist").as("j_dist"))
      t = t.join(t2.hint("shuffle_hash"), col("ptr") === col("j_k"))
        .select(col("k"), col("j_ptr").as("ptr"),
          (col("dist") + col("j_dist")).as("dist"))
        .localCheckpoint(eager = false)
      open = t.filter(col("ptr") =!= 0).count()
    }
    t.select(col("k").as("o_orderkey"), col("dist").as("depth"))
      .orderBy("o_orderkey")
  }

  val qHierarchySql: String =
    """WITH RECURSIVE walk AS (
      |  SELECT o_orderkey AS k, o_orderkey AS cur, 0 AS depth FROM orders
      |  UNION ALL
      |  SELECT k, CASE WHEN cur > 0
      |                 THEN (cur * 48271 % 8191) % cur ELSE 0 END,
      |         depth + 1
      |  FROM walk WHERE cur > 0)
      |SELECT k AS o_orderkey, CAST(MAX(depth) AS BIGINT) AS depth
      |FROM walk GROUP BY k ORDER BY k""".stripMargin

  /** Correlated scalar subquery (orders above their own customer's
    * average) — Catalyst de-correlates it into an aggregate + join;
    * the inner average is decimal-exact so the comparison is
    * bit-stable. */
  def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders_sq")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders_sq o
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders_sq i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val qScalarSubquerySql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > (
      |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      |  FROM orders i WHERE i.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Explicit GROUPING SETS: simultaneous aggregation grains in one
    * pass (by-status, by-priority, grand total). */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    ord.createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n,
        |  GROUPING__ID AS gid
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin

  /** UNPIVOT — the inverse of q_pivot: a wide per-status aggregate
    * melts back to (priority, status_col, n) long form via the native
    * unpivot operator (columns become rows; no shuffle beyond the
    * feeding aggregate). */
  def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables.load(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(when(col("o_orderstatus") === "F", 1)).as("f_n"),
        count(when(col("o_orderstatus") === "O", 1)).as("o_n"),
        count(when(col("o_orderstatus") === "P", 1)).as("p_n"))
    wide.unpivot(Array(col("o_orderpriority")),
        Array(col("f_n"), col("o_n"), col("p_n")), "status_col", "n")
      .orderBy("o_orderpriority", "status_col")
  }

  val qUnpivotSql: String =
    """WITH wide AS (
      |  SELECT o_orderpriority,
      |    COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_n,
      |    COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_n,
      |    COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_n
      |  FROM orders GROUP BY 1)
      |SELECT o_orderpriority, status_col, n
      |FROM wide UNPIVOT (n FOR status_col IN (f_n, o_n, p_n))
      |ORDER BY o_orderpriority, status_col""".stripMargin

  /** FULL OUTER join with unmatched rows on BOTH sides (filters carve
    * disjoint nation ranges so each side has keys the other lacks) —
    * completing the join-type family alongside left-outer, semi/anti
    * and the inner variants. */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_nationkey") >= 5)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    val p = Tables.load(s, dir, "supplier")
      .filter(col("s_nationkey") < 15)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    c.join(p, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        col("n_cust"), col("n_supp"))
      .orderBy("nationkey")
  }

  val qFullOuterSql: String =
    """WITH c AS (
      |  SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
      |  WHERE c_nationkey >= 5 GROUP BY 1),
      |p AS (
      |  SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
      |  WHERE s_nationkey < 15 GROUP BY 1)
      |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey, n_cust, n_supp
      |FROM c FULL OUTER JOIN p ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin

  /** CUBE over (returnflag, linestatus): all four aggregation grains
    * in ONE pass — both keys, each alone, grand total — completing
    * the multi-grain family (rollup = hierarchy, grouping sets =
    * explicit list, cube = powerset). Same partial-agg map-side
    * expansion as rollup. */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(d2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n,
      |  GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  /** RANGE-frame window: per-user trailing-one-hour event-value sum.
    * Frame bounds live in VALUE space (event-time micros), not row
    * space — the complementary frame type to q_window_running's rows
    * frame, and the exact-sliding-window shape q_events_window's
    * fixed buckets approximate. Peers (equal timestamps) aggregate
    * together in both engines, so ties stay deterministic. */
  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600L * 1000000L, 0L)
    ev.select(col("event_id"), col("user_id"), col("us"),
        sum(d2(col("value"))).over(w).cast(DoubleType).as("hour_sum"),
        count(lit(1)).over(w).as("n_1h"))
      .orderBy(col("event_id"))
  }

  val qWindowRangeSql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS us,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS hour_sum,
      |  COUNT(*) OVER w AS n_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Lateral explode (LATERAL VIEW / unnest WITH ORDINALITY): each
    * document fans out to (doc, position, token) rows via posexplode
    * — the row-generating operator the ETL surface lacks elsewhere —
    * then re-aggregates to corpus top-20 tokens with first-occurrence
    * position, proving the ordinal survives the pipeline. */
  def qExplodeLateral(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    d.select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), x => x =!= ""))
          .as(Seq("pos", "tok")))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id") * 100000L + col("pos")).as("first_seen"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)
  }

  val qExplodeLateralSql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |t AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(toks) + 1),
      |      i -> struct_pack(pos := i - 1, tok := toks[i]))) AS u
      |  FROM tok)
      |SELECT u.tok AS tok, COUNT(*) AS n,
      |  COUNT(DISTINCT doc_id) AS n_docs,
      |  MIN(doc_id * 100000 + u.pos) AS first_seen
      |FROM t GROUP BY u.tok
      |ORDER BY n DESC, tok LIMIT 20""".stripMargin

  /** HyperLogLog distinct-count sketches [T]: the constant-memory
    * path for distincts at 100 TB, where exact countDistinct keeps
    * per-key hash sets. rsd=0.02 → ~1.5 KB sketch per group
    * regardless of cardinality. Sketch internals differ per engine,
    * so the contract (relative error) is spec-checked, not
    * hash-checked. */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** approx_percentile beside the exact percentile: the
    * constant-memory quantile at 100 TB. The exact form keeps the
    * whole sorted group; the approximate one keeps a fixed-size
    * KLL/GK-style summary per group (accuracy parameter = 10000 →
    * rank error ≤ 1/10000) and merges map-side. Sketch internals
    * differ per engine by design, so like q_approx_distinct the
    * contract is spec-checked (bounded error vs the exact key), not
    * hash-checked. */
  def qApproxPercentile(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    ord.groupBy(col("o_orderstatus"))
      .agg(expr("approx_percentile(o_totalprice, 0.5, 10000)").as("ap50"),
        expr("approx_percentile(o_totalprice, 0.25, 10000)").as("ap25"),
        expr("approx_percentile(o_totalprice, 0.75, 10000)").as("ap75"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("o_orderstatus"))
  }

  /** Time-series gap filling + LOCF — the resample step every
    * metrics/feature pipeline runs before a model sees the series
    * (missing days must be explicit zeros, and slowly-changing values
    * carry forward). Per-user daily spine between the user's first
    * and last active day via sequence()+explode — the spine is
    * generated WHERE THE USER'S ROWS ALREADY ARE (one shuffle to the
    * per-user grain, then generation is a projection), never a
    * driver-side calendar loop or a global cross join. LOCF is
    * last(ignoreNulls) over the per-user ordered window: the same
    * single user-partitioned sort the daily aggregate already
    * produced. Scale: output is O(users × active-span-days); no
    * operator holds more than one user's span. */
  def qGapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val daily = ev
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).as("s"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"),
        explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily.hint("shuffle_hash"), Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day").cast(DateType).as("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("s"), ignoreNulls = true).over(byUser)
          .cast(DoubleType).as("filled_value"))
      .orderBy(col("user_id"), col("day"))
  }

  val qGapFillSql: String =
    """WITH daily AS (
      |  SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS s
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |  FROM (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
      |        FROM daily GROUP BY 1))
      |SELECT sp.user_id, CAST(sp.day AS DATE) AS day,
      |  COALESCE(d.n, 0) AS n_events,
      |  CAST(LAST_VALUE(d.s IGNORE NULLS) OVER (
      |    PARTITION BY sp.user_id ORDER BY sp.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS filled_value
      |FROM spine sp LEFT JOIN daily d
      |  ON sp.user_id = d.user_id AND sp.day = d.day
      |ORDER BY sp.user_id, day""".stripMargin

  /** Cohort retention — the canonical product-analytics rollup: users
    * bucketed by first-active week, distinct-user counts per (cohort,
    * week offset). Both the cohort assignment and the activity grid
    * reduce to per-user/per-week grains BEFORE the join, so the join
    * input is O(users·weeks), never O(events); the offset arithmetic
    * is exact integer day-diff / 7 (both sides week-truncated, so the
    * division is always exact). countDistinct(user) is the one
    * genuinely expensive agg — at 100 TB swap approx_count_distinct
    * (q_approx_distinct's sketch) without changing the plan shape. */
  def qRetentionCohort(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val first = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
    val act = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    act.join(first.hint("shuffle_hash"), Seq("user_id"))
      .groupBy(col("cohort").cast(DateType).as("cohort_week"),
        (datediff(col("wk").cast(DateType), col("cohort").cast(DateType)) / 7)
          .cast(IntegerType).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val qRetentionCohortSql: String =
    """WITH first AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      |  FROM events GROUP BY 1),
      |act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
      |        FROM events)
      |SELECT CAST(cohort AS DATE) AS cohort_week,
      |  CAST(date_diff('day', CAST(cohort AS DATE), CAST(wk AS DATE)) / 7
      |       AS INT) AS week_offset,
      |  COUNT(DISTINCT a.user_id) AS n_users
      |FROM act a JOIN first f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** GROUP_CONCAT re-expressed — the MySQL aggregate every migrating
    * schema leans on (the reference's users write it daily; PG calls
    * it string_agg): per nation, the sorted distinct market segments
    * its customers span, as one delimited string.
    *
    * Determinism is the whole trick: collect_set has NO order, so the
    * engine sorts the set before joining (array_sort ∘ collect_set)
    * and the oracle mirrors with string_agg(DISTINCT … ORDER BY …) —
    * an unordered GROUP_CONCAT is unreproducible in ANY engine and
    * hash-flakes across partitionings. One agg-grain shuffle with
    * map-side partial sets; state per group is bounded by segment
    * cardinality, not row count. */
  def qGroupConcat(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    c.groupBy(col("c_nationkey"))
      .agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",")
          .as("segments"),
        countDistinct(col("c_mktsegment")).as("n_segments"),
        count(lit(1)).as("n_cust"))
      .orderBy("c_nationkey")
  }

  val qGroupConcatSql: String =
    """SELECT c_nationkey,
      |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
      |    AS segments,
      |  COUNT(DISTINCT c_mktsegment) AS n_segments,
      |  COUNT(*) AS n_cust
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** The distribution-window functions q_window_funcs doesn't cover:
    * percent_rank, cume_dist, nth_value. Partitioned by customer (key
    * cardinality grows with the data — never a 3-value partition key
    * that funnels the table through 3 reducers) with a unique
    * (price, orderkey) ordering so ties can't make cross-engine frame
    * semantics diverge; nth_value over an explicit full-partition ROWS
    * frame (the default RANGE frame's peer handling is the classic
    * cross-engine trap). percent_rank/cume_dist are single IEEE
    * divisions of exact ranks — bit-identical. */
  def qWindowDistFuncs(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    ord.select(col("o_orderkey"), col("o_custkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_cheapest"))
      .orderBy("o_orderkey")
  }

  val qWindowDistFuncsSql: String =
    """SELECT o_orderkey, o_custkey,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd,
      |  NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |    AS second_cheapest
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Six-hour OHLC bars per event type — the time-series summary
    * finance and metrics pipelines run continuously (candlesticks,
    * SLO rollups): per bar, the opening value, high, low, closing
    * value and volume. Float-safe BY CONSTRUCTION: open/high/low/
    * close are SELECTIONS of existing doubles (min_by/max_by/min/
    * max), never arithmetic, so there is nothing to round — the only
    * computed column is the exact integer bar id.
    *
    * Determinism: open/close pick by a zero-padded (epoch, event_id)
    * string key, so timestamp ties cannot make the pick
    * engine-dependent (a bare min_by(ts) tie is unspecified in BOTH
    * engines). One agg-grain shuffle with map-side combine — state
    * per bar is five scalars, q1_agg's scale shape. */
  def qOhlcBars(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .withColumn("bar_id", expr("unix_micros(ts) div 21600000000"))
      .withColumn("pick_key",
        expr("concat(lpad(cast(unix_micros(ts) as string), 20, '0'), " +
          "lpad(cast(event_id as string), 12, '0'))"))
    ev.groupBy(col("event_type"), col("bar_id"))
      .agg(
        min_by(col("value"), col("pick_key")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("pick_key")).as("close"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type", "bar_id")
  }

  val qOhlcBarsSql: String =
    """SELECT event_type,
      |  epoch_us(ts) // 21600000000 AS bar_id,
      |  arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
      |    || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS open,
      |  MAX(value) AS high,
      |  MIN(value) AS low,
      |  arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
      |    || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Batch funnel: view → click → purchase per user, each step's
    * timestamp the FIRST occurrence STRICTLY AFTER the previous step
    * (the product-analytics sequencing rule stream_funnel_timeout
    * enforces live; this is its offline twin over the full history).
    * Times as exact epoch micros; non-converting users carry NULLs.
    *
    * Scale shape: three filtered scans reduce to user-grain minima
    * (map-side combine), then user-keyed joins of THIN frames — the
    * corpus never joins itself; every step's frame is O(users). The
    * strictly-after condition rides the join filter, so a step-2
    * event before step 1 can never count. */
  def qFunnelSteps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    def firstOf(t: String): DataFrame = ev
      .filter(col("event_type") === t)
      .groupBy("user_id").agg(min(col("us")).as(s"${t}_us"))
    val s1 = firstOf("view")
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("us") > col("view_us"))
      .groupBy("user_id").agg(min(col("us")).as("click_us"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("us") > col("click_us"))
      .groupBy("user_id").agg(min(col("us")).as("purchase_us"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .orderBy("user_id")
  }

  val qFunnelStepsSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s1 AS (SELECT user_id, MIN(us) AS view_us FROM ev
      |       WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT ev.user_id, MIN(us) AS click_us
      |       FROM ev JOIN s1 ON ev.user_id = s1.user_id
      |       WHERE event_type = 'click' AND us > s1.view_us
      |       GROUP BY ev.user_id),
      |s3 AS (SELECT ev.user_id, MIN(us) AS purchase_us
      |       FROM ev JOIN s2 ON ev.user_id = s2.user_id
      |       WHERE event_type = 'purchase' AND us > s2.click_us
      |       GROUP BY ev.user_id)
      |SELECT s1.user_id, s1.view_us, s2.click_us, s3.purchase_us
      |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
      |LEFT JOIN s3 ON s1.user_id = s3.user_id
      |ORDER BY s1.user_id""".stripMargin

  /** Exact proportional money allocation (the penny problem): spread
    * each order's total across its line items proportionally to
    * quantity so the parts sum EXACTLY to the whole — naive
    * round(share·total) drifts by ±cents per order and books don't
    * balance. Largest-remainder method in pure integer cents:
    * base = (total_cents · qty) div qty_sum, then the leftover cents
    * go one each to the largest remainders (ties → lowest line
    * number, then lowest qty — the fixture's duplicate line numbers
    * can collide on remainder with DIFFERENT quantities, and an
    * under-specified tie there hands the penny to an engine-arbitrary
    * row with a different base: the sf1 sweep caught exactly that;
    * rows still tied after qty have identical bases, so the output
    * multiset is deterministic). The reference's value-conversion
    * layer rounds per cell (dumperAuxFuncs.py) and would hit exactly
    * this drift on any derived allocation.
    *
    * Scale shape: ONE order-grain shuffle carries the qty-sum window,
    * the base-sum window, and the remainder rank (all share the
    * partition key), plus the keyed orders join — no global
    * operation anywhere; integer arithmetic end to end. */
  def qPennyAllocation(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
    val rankW = w.orderBy(col("rem").desc, col("l_linenumber"), col("qty"))
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(LongType).as("qty"))
    val ord = Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
          .cast(LongType).as("total_cents"))
    li.join(ord, "l_orderkey")
      .withColumn("qty_sum", sum(col("qty")).over(w))
      .withColumn("base", expr("(total_cents * qty) div qty_sum"))
      .withColumn("rem", expr("(total_cents * qty) % qty_sum"))
      .withColumn("leftover", col("total_cents") - sum(col("base")).over(w))
      .withColumn("rnk", row_number().over(rankW))
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("base") + when(col("rnk") <= col("leftover"), 1L)
          .otherwise(0L)).as("alloc_cents"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val qPennyAllocationSql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_linenumber, CAST(FLOOR(l_quantity) AS BIGINT) AS qty
      |  FROM lineitem),
      |j AS (
      |  SELECT li.*, CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |    AS BIGINT) AS total_cents
      |  FROM li JOIN orders ON l_orderkey = o_orderkey),
      |x AS (
      |  SELECT *, CAST(SUM(qty) OVER (PARTITION BY l_orderkey) AS BIGINT)
      |    AS qty_sum
      |  FROM j),
      |y AS (
      |  SELECT *, (total_cents * qty) // qty_sum AS base,
      |    (total_cents * qty) % qty_sum AS rem
      |  FROM x),
      |z AS (
      |  SELECT *,
      |    total_cents - CAST(SUM(base) OVER (PARTITION BY l_orderkey)
      |      AS BIGINT) AS leftover,
      |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |      ORDER BY rem DESC, l_linenumber, qty) AS rnk
      |  FROM y)
      |SELECT l_orderkey, l_linenumber,
      |  CAST(base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT)
      |    AS alloc_cents
      |FROM z ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Exact per-group MODE with a deterministic tie-break — the
    * most-frequent-value aggregate (top category per segment, modal
    * status per queue) that Spark's built-in `mode()` gets WRONG for
    * reproducibility: on tied frequencies it returns an arbitrary
    * survivor, so reruns and different partitionings disagree. Here:
    * per market segment, the modal customer nation, its count, and
    * its exact ppm share of the segment.
    *
    * Scale shape: two map-side-combined aggregations — (seg, value)
    * counts, then ONE struct-max per segment over (count, -value,
    * value) so equal counts resolve to the SMALLEST value under any
    * partitioning; the exchange carries value-grain counts, never
    * rows, and no window ever sorts a group. Share is integer ppm
    * via `div` — no percentage float. */
  def qMode(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(s, dir, "customer")
      .groupBy(col("c_mktsegment").as("seg"), col("c_nationkey").as("v"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy("seg")
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_values"),
        max(struct(col("n"), (-col("v")).as("nv"), col("v"))).as("m"))
      .select(col("seg").as("c_mktsegment"), col("n_rows"),
        col("n_values"), col("m.v").as("mode_val"), col("m.n").as("mode_n"))
      .withColumn("mode_ppm",
        expr("cast((mode_n * 1000000) div n_rows as bigint)"))
      .orderBy("c_mktsegment")
  }

  val qModeSql: String =
    """WITH c AS (
      |  SELECT c_mktsegment AS seg, c_nationkey AS v, COUNT(*) AS n
      |  FROM customer GROUP BY 1, 2),
      |t AS (SELECT seg, SUM(n) AS n_rows, COUNT(*) AS n_values
      |      FROM c GROUP BY 1),
      |r AS (SELECT seg, v, n,
      |        ROW_NUMBER() OVER (PARTITION BY seg ORDER BY n DESC, v)
      |          AS rk
      |      FROM c)
      |SELECT r.seg AS c_mktsegment, CAST(t.n_rows AS BIGINT) AS n_rows,
      |  CAST(t.n_values AS BIGINT) AS n_values, r.v AS mode_val,
      |  CAST(r.n AS BIGINT) AS mode_n,
      |  CAST(r.n * 1000000 // t.n_rows AS BIGINT) AS mode_ppm
      |FROM r JOIN t USING (seg) WHERE rk = 1
      |ORDER BY c_mktsegment""".stripMargin

  /** Bill-of-materials explosion — the manufacturing rollup
    * q_hierarchy's additive walk can't express: each part feeds its
    * parent assembly with a per-edge QUANTITY, and a part's effective
    * quantity in its top-level assembly is the PRODUCT of edge
    * quantities along the path to the root (the (×, Σ) semiring
    * where q_hierarchy runs (+1, min-hop) and q_pagerank runs
    * damped-Σ). Per root assembly: component count, total effective
    * quantity, and fully-exploded cost.
    *
    * The part forest is synthetic (parent = (k·48271 mod 8191) mod k,
    * qty(edge k→parent) = 1 + k mod 3) — the same public-LCG
    * convention as q_hierarchy so the oracle can walk the identical
    * edges; a real deployment reads the edge table from storage and
    * nothing in the plan changes.
    *
    * Scale shape: pointer-doubling path composition — each round
    * joins every node's walked segment onto the segment starting
    * where it ended (position, accumulated product), so path length
    * covered doubles per round: O(log depth) shuffle-pinned
    * self-joins, localCheckpoint truncating lineage per round
    * (dedup_clusters' regime), instead of O(depth) sequential steps.
    * Root-absorbed rows ride along unchanged. The path product `q`
    * itself rides in DECIMAL(38,0) from the first edge — effective
    * quantities grow GEOMETRICALLY with depth, and a long product
    * would wrap silently on deep BOMs while the oracle's HUGEINT
    * stays exact; decimal overflow surfaces as null (and the oracle
    * errors on its BIGINT cast), never as silent garbage. Rollup
    * sums stay decimal, cast to long only at the output edge. */
  def qBomExplosion(s: SparkSession, dir: String): DataFrame = {
    def parentOf(c: Column): Column =
      when(c > 0, (c * 48271L % 8191L) % c).otherwise(lit(0L))
    def qtyOf(c: Column): Column = lit(1L) + pmod(c, lit(3L))
    val parts = Tables.load(s, dir, "part")
      .select(col("p_partkey").as("k"),
        expr("cast(cast(p_retailprice as decimal(12,2)) * 100 as bigint)")
          .as("cents"))
    // LAZY checkpoints fused with the convergence count, exactly as
    // in qHierarchy (r14): one job per composition round, not two.
    var t = parts
      .select(col("k"),
        when(parentOf(col("k")) === 0, col("k")).as("root"),
        parentOf(col("k")).as("ptr"),
        when(parentOf(col("k")) === 0, lit(1L))
          .otherwise(qtyOf(col("k"))).cast("decimal(38,0)").as("q"))
      .localCheckpoint(eager = false)
    var open = t.filter(col("root").isNull).count()
    var rounds = 0
    while (open > 0) {
      rounds += 1
      require(rounds <= 40, "BOM path composition failed to converge")
      val j = t.select(col("k").as("j_k"), col("root").as("j_root"),
        col("ptr").as("j_ptr"), col("q").as("j_q"))
      t = t.filter(col("root").isNull)
        .join(j.hint("shuffle_hash"), col("ptr") === col("j_k"))
        .select(col("k"), col("j_root").as("root"),
          col("j_ptr").as("ptr"), (col("q") * col("j_q")).as("q"))
        .unionByName(t.filter(col("root").isNotNull))
        .localCheckpoint(eager = false)
      open = t.filter(col("root").isNull).count()
    }
    t.join(parts.hint("shuffle_hash"), Seq("k"))
      .groupBy(col("root").as("root_part"))
      .agg(count(lit(1)).as("n_parts"),
        expr("cast(sum(q) as bigint)").as("total_qty"),
        expr("cast(sum(q * cents) as bigint)").as("total_cost_cents"))
      .orderBy("root_part")
  }

  val qBomExplosionSql: String =
    """WITH RECURSIVE w AS (
      |  SELECT p_partkey AS k, p_partkey AS cur, CAST(1 AS HUGEINT) AS q
      |  FROM part
      |  UNION ALL
      |  SELECT k, (cur * 48271 % 8191) % cur AS cur,
      |    q * (1 + cur % 3) AS q
      |  FROM w WHERE CASE WHEN cur > 0
      |    THEN (cur * 48271 % 8191) % cur ELSE 0 END <> 0),
      |r AS (
      |  SELECT k, cur AS root, q FROM w
      |  WHERE CASE WHEN cur > 0
      |    THEN (cur * 48271 % 8191) % cur ELSE 0 END = 0),
      |c AS (
      |  SELECT k, CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
      |    AS BIGINT) AS cents
      |  FROM part JOIN r ON p_partkey = k)
      |SELECT r.root AS root_part, COUNT(*) AS n_parts,
      |  CAST(SUM(r.q) AS BIGINT) AS total_qty,
      |  CAST(SUM(r.q * c.cents) AS BIGINT) AS total_cost_cents
      |FROM r JOIN c ON r.k = c.k
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** GROUPS window frames — the third SQL frame mode (ROWS counts
    * rows, RANGE bounds values, GROUPS counts PEER GROUPS) that
    * Spark does not implement: per supplier, each line item's
    * revenue summed over its own ship-day peer group plus the two
    * preceding distinct ship days. ROWS can't express it (peer
    * counts vary), RANGE can't either (days are gapped — "2
    * preceding days that EXIST" ≠ "day − 2").
    *
    * Emulation is exact and three steps: (1) dense_rank gives each
    * row its group ordinal g, (2) revenue collapses to (supplier, g)
    * grain where a ROWS 2-PRECEDING sliding sum IS the groups frame
    * (one row per group by construction), (3) the group sums join
    * back to row grain. The oracle engine does not implement GROUPS
    * frames either, so the oracle is an INDEPENDENT restatement —
    * an explicit band join over group ordinals (g' ∈ [g−2, g])
    * aggregated per group — not an echo of the sliding-window plan.
    *
    * Scale shape: both windows and the final join partition by
    * supplier — the rank window's exchange is reused by the
    * group-grain agg and the join (shuffle-pinned on the row-grain
    * side); revenue is exact integer cents. */
  def qWindowGroups(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_suppkey").as("supp"), col("l_orderkey").as("ok"),
        col("l_linenumber").as("ln"),
        to_date(col("l_shipdate")).as("day"),
        expr("cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)")
          .as("cents"))
    val grouped = li.groupBy("supp", "day").agg(sum(col("cents")).as("gsum"))
    val wDay = Window.partitionBy("supp").orderBy("day")
    val slid = grouped.withColumn("frame_sum",
      sum(col("gsum")).over(wDay.rowsBetween(-2, 0)))
    li.join(slid.select(col("supp"), col("day"), col("frame_sum"))
          .hint("shuffle_hash"),
        Seq("supp", "day"))
      .select(col("supp"), col("ok"), col("ln"), col("day"),
        col("cents"), col("frame_sum"))
      .orderBy("supp", "day", "ok", "ln")
  }

  val qWindowGroupsSql: String =
    """WITH li AS (
      |  SELECT l_suppkey AS supp, l_orderkey AS ok, l_linenumber AS ln,
      |    CAST(l_shipdate AS DATE) AS day,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem),
      |d AS (SELECT DISTINCT supp, day FROM li),
      |r AS (
      |  SELECT supp, day,
      |    DENSE_RANK() OVER (PARTITION BY supp ORDER BY day) AS g
      |  FROM d),
      |f AS (
      |  SELECT a.supp, a.day, CAST(SUM(x.cents) AS BIGINT) AS frame_sum
      |  FROM r a
      |  JOIN r b ON a.supp = b.supp AND b.g BETWEEN a.g - 2 AND a.g
      |  JOIN li x ON x.supp = b.supp AND x.day = b.day
      |  GROUP BY 1, 2)
      |SELECT li.supp, li.ok, li.ln, li.day, li.cents, f.frame_sum
      |FROM li JOIN f ON li.supp = f.supp AND li.day = f.day
      |ORDER BY li.supp, li.day, li.ok, li.ln""".stripMargin

  /** Window frame EXCLUDE clause — the second frame feature Spark
    * lacks (q_window_groups covers the GROUPS mode): standard SQL
    * lets a frame drop the current row, its whole peer group, or
    * just its ties (EXCLUDE CURRENT ROW / GROUP / TIES) — the
    * "everyone else's total" shape behind leave-one-out baselines
    * and self-excluding comparisons. Per line item, over a 3-day
    * trailing RANGE frame by supplier: the full frame sum and all
    * three EXCLUDE variants of nearby revenue.
    *
    * Emulation is algebra over two window sums: with F = frame sum,
    * G = the current row's peer-group sum (its ship-day total —
    * always fully inside a trailing range frame that ends at the
    * current day) and x = the row's own value,
    * EXCLUDE CURRENT ROW = F − x, EXCLUDE GROUP = F − G,
    * EXCLUDE TIES = F − G + x. SQL defines an emptied frame as NULL
    * (sum over no rows), and revenue cents are strictly positive, so
    * nullif(·, 0) reproduces that exactly — a zero difference can
    * only mean the exclusion emptied the frame. The oracle runs
    * DuckDB's NATIVE EXCLUDE clause against this plan — the
    * emulation is checked against the real feature.
    *
    * Scale shape: the range frame orders by integer epoch-day within
    * supplier; the peer-group sum is a second window on (supplier,
    * day) — both share the supplier exchange; no joins. */
  def qWindowExclude(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_suppkey").as("supp"), col("l_orderkey").as("ok"),
        col("l_linenumber").as("ln"),
        to_date(col("l_shipdate")).as("day"),
        expr("cast(cast(l_extendedprice as decimal(14,2)) * 100 as bigint)")
          .as("cents"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")).cast("long"))
    val frame = Window.partitionBy("supp").orderBy("day_num")
      .rangeBetween(-3, 0)
    val peer = Window.partitionBy("supp", "day")
    li.withColumn("f", sum(col("cents")).over(frame))
      .withColumn("g", sum(col("cents")).over(peer))
      .select(col("supp"), col("ok"), col("ln"), col("day"), col("cents"),
        col("f").as("full_sum"),
        nullif(col("f") - col("cents"), lit(0L)).as("exc_current"),
        nullif(col("f") - col("g"), lit(0L)).as("exc_group"),
        (col("f") - col("g") + col("cents")).as("exc_ties"))
      .orderBy("supp", "day", "ok", "ln")
  }

  val qWindowExcludeSql: String =
    """WITH li AS (
      |  SELECT l_suppkey AS supp, l_orderkey AS ok, l_linenumber AS ln,
      |    CAST(l_shipdate AS DATE) AS day,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      AS cents,
      |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
      |      AS day_num
      |  FROM lineitem)
      |SELECT supp, ok, ln, day, cents,
      |  CAST(SUM(cents) OVER w AS BIGINT) AS full_sum,
      |  CAST(SUM(cents) OVER (PARTITION BY supp ORDER BY day_num
      |    RANGE BETWEEN 3 PRECEDING AND CURRENT ROW
      |    EXCLUDE CURRENT ROW) AS BIGINT) AS exc_current,
      |  CAST(SUM(cents) OVER (PARTITION BY supp ORDER BY day_num
      |    RANGE BETWEEN 3 PRECEDING AND CURRENT ROW
      |    EXCLUDE GROUP) AS BIGINT) AS exc_group,
      |  CAST(SUM(cents) OVER (PARTITION BY supp ORDER BY day_num
      |    RANGE BETWEEN 3 PRECEDING AND CURRENT ROW
      |    EXCLUDE TIES) AS BIGINT) AS exc_ties
      |FROM li
      |WINDOW w AS (PARTITION BY supp ORDER BY day_num
      |  RANGE BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY supp, day, ok, ln""".stripMargin

  /** Forward-fill via IGNORE NULLS — the last-observation-carried-
    * forward read every event pipeline needs without a time grid
    * (q_gap_fill fills a CALENDAR; this carries state along the raw
    * event sequence): at every event, the user's last purchase value
    * and how many purchases precede it.
    *
    * Exactness: pure SELECTION — the carried value is the stored
    * double, never arithmetic, so parity is definitional; the
    * running purchase count is an integer conditional sum; (ts,
    * event_id) makes the order total, so fills are deterministic
    * under same-timestamp events.
    *
    * Scale shape: ONE user-grain window exchange feeds both the
    * ignore-nulls last and the running count (shared window spec —
    * one shuffle, one sort); partition cardinality (users) grows
    * with the corpus. */
  def qWindowIgnoreNulls(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events").select(
      col("event_id"), col("user_id"), col("event_type"), col("ts"),
      when(col("event_type") === "purchase", col("value")).as("paid"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(col("event_id"), col("user_id"), col("event_type"),
        last(col("paid"), ignoreNulls = true).over(w).as("last_paid"),
        sum(when(col("paid").isNotNull, 1L).otherwise(0L)).over(w)
          .as("purchases_so_far"))
      .orderBy("event_id")
  }

  val qWindowIgnoreNullsSql: String =
    """SELECT event_id, user_id, event_type,
      |  LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
      |      IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS last_paid,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS purchases_so_far
      |FROM events ORDER BY event_id""".stripMargin

  /** TPC-H Q21's multi-level EXISTS / NOT EXISTS shape — suppliers
    * who alone held up a multi-supplier order: count each supplier's
    * anomalous lines (shipped-before-ordered, the fixture's signed
    * ship lag) in orders where ANOTHER supplier participated but NO
    * other supplier's line was anomalous. q_semi_anti exercises one
    * semi and one anti join in isolation; this is the correlated
    * double-quantifier blame analysis — the hardest of the classic
    * TPC-H decision-support patterns — run as two keyed joins.
    *
    * Scale shape: both quantifiers decorrelate into orderkey-keyed
    * semi/anti self-joins (never per-row subqueries): participation
    * is a DISTINCT (order, supplier) frame, the anomalous set is
    * checkpoint-pinned and reused for both its own grain and the
    * NOT-EXISTS side; the supplier dim joins shuffled (it GROWS with
    * SF — not broadcast); counts collapse map-side. */
  def q21Waiting(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val ord = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    val f = li.join(ord.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") < col("o_orderdate"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      // anomalous lines, reused at two grains. EAGER, measured (r15
      // A/B: eager 2.02 s vs lazy 2.17 s best-of-4 interleaved) — f
      // feeds two concurrent stages of the waited job (the semi side
      // and fd's distinct), which under lazy race to compute it
      // before its blocks land
      .localCheckpoint()
    val base = li.select(col("l_orderkey").as("bok"),
      col("l_suppkey").as("bsk")).distinct()
    val fd = f.select(col("ok").as("xok"), col("sk").as("xsk")).distinct()
    val waited = f
      .join(base.hint("shuffle_hash"),
        col("ok") === col("bok") && col("sk") =!= col("bsk"),
        "left_semi")
      .join(fd.hint("shuffle_hash"),
        col("ok") === col("xok") && col("sk") =!= col("xsk"),
        "left_anti")
    waited.groupBy("sk").agg(count(lit(1)).as("numwait"))
      .join(Tables.load(s, dir, "supplier").hint("shuffle_hash"),
        col("sk") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val q21WaitingSql: String =
    """WITH f AS (
      |  SELECT l_orderkey AS ok, l_suppkey AS sk
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_shipdate < o_orderdate),
      |base AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
      |         FROM lineitem),
      |fd AS (SELECT DISTINCT ok, sk FROM f),
      |w AS (
      |  SELECT f.sk FROM f
      |  WHERE EXISTS (SELECT 1 FROM base b
      |                WHERE b.ok = f.ok AND b.sk <> f.sk)
      |    AND NOT EXISTS (SELECT 1 FROM fd x
      |                    WHERE x.ok = f.ok AND x.sk <> f.sk))
      |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM w JOIN supplier ON s_suppkey = w.sk
      |GROUP BY 1 ORDER BY numwait DESC, s_name""".stripMargin

  /** Recency cutoff for the lapse predicate (fixture orders span
    * 1995-01..2001-08; ~9% of sf0.01 customers are quiet after it). */
  val q22Cutoff = "2000-01-01"

  /** TPC-H Q22's shape — wealthy customers gone QUIET: a global
    * aggregate threshold (above the positive-balance average) feeding
    * an anti join against recent fact activity (every fixture
    * customer has SOME order, so "never ordered" is vacuous here —
    * "no order since [[q22Cutoff]]" is the honest lapse predicate),
    * grouped by geography. The classic "win-back list" read combining
    * three decorrelation problems in one query: a scalar aggregate
    * subquery, a NOT EXISTS, and a post-filter aggregate.
    *
    * Exactness: the average threshold never divides — candidates
    * satisfy bal·n > Σbal by integer cross-multiplication (exact
    * cents, no double average anywhere); group balances are DECIMAL
    * sums surfaced as exact cents.
    *
    * Scale shape: the threshold is ONE map-side-combined scalar
    * aggregate broadcast as a 1-row frame; the NOT EXISTS is an
    * orderkey-side DISTINCT + custkey-keyed anti join (never a
    * per-row subquery); the final rollup collapses map-side. */
  def q22Prospects(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").select(
      col("c_custkey"), col("c_nationkey"),
      expr("cast(cast(c_acctbal as decimal(12,2)) * 100 as bigint)")
        .as("bal"))
    val thr = c.filter(col("bal") > 0).agg(
      sum(col("bal").cast(DecimalType(38, 0))).cast(LongType).as("s"),
      count(lit(1)).as("n"))
    val buyers = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(q22Cutoff).cast("timestamp"))
      .select(col("o_custkey")).distinct()
    c.crossJoin(broadcast(thr))
      .filter(col("bal") * col("n") > col("s"))
      .join(buyers.hint("shuffle_hash"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal").cast(DecimalType(38, 0))).cast(LongType)
          .as("totbal_cents"))
      .orderBy("c_nationkey")
  }

  val q22ProspectsSql: String =
    s"""WITH c AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal
      |  FROM customer),
      |t AS (SELECT CAST(SUM(bal) AS BIGINT) AS s,
      |             CAST(COUNT(*) AS BIGINT) AS n
      |      FROM c WHERE bal > 0),
      |cand AS (
      |  SELECT c.* FROM c CROSS JOIN t
      |  WHERE c.bal * t.n > t.s
      |    AND NOT EXISTS (SELECT 1 FROM orders o
      |                    WHERE o.o_custkey = c.c_custkey
      |                      AND o.o_orderdate >= TIMESTAMP '$q22Cutoff'))
      |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(bal) AS BIGINT) AS totbal_cents
      |FROM cand GROUP BY 1 ORDER BY 1""".stripMargin

  /** The five quantifier variants over a NULL-bearing subquery —
    * single SQL text for both engines (table names substituted), so
    * parity pins Spark's null-aware anti join to ANSI three-valued
    * logic. */
  private def nullSemanticsBody(c: String, o: String): String =
    s"""WITH sub AS (
       |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
       |              ELSE o_custkey END AS k
       |  FROM $o WHERE o_orderstatus = 'F'),
       |v AS (
       |  SELECT 'not_in' AS variant, COUNT(*) AS n FROM $c
       |  WHERE c_custkey NOT IN (SELECT k FROM sub)
       |  UNION ALL
       |  SELECT 'not_exists' AS variant, COUNT(*) AS n FROM $c
       |  WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = c_custkey)
       |  UNION ALL
       |  SELECT 'not_in_null_filtered' AS variant, COUNT(*) AS n FROM $c
       |  WHERE c_custkey NOT IN (SELECT k FROM sub WHERE k IS NOT NULL)
       |  UNION ALL
       |  SELECT 'in' AS variant, COUNT(*) AS n FROM $c
       |  WHERE c_custkey IN (SELECT k FROM sub)
       |  UNION ALL
       |  SELECT 'exists' AS variant, COUNT(*) AS n FROM $c
       |  WHERE EXISTS (SELECT 1 FROM sub WHERE sub.k = c_custkey))
       |SELECT variant, n FROM v""".stripMargin

  /** Three-valued logic at the quantifier boundary — the classic
    * production data-loss trap: `NOT IN` against a subquery holding
    * even ONE NULL returns ZERO rows (x <> NULL is UNKNOWN, and the
    * conjunction over the list never becomes TRUE), while the
    * intuitive-equivalent `NOT EXISTS` returns the real complement.
    * All five quantifier forms run side by side so the artifact IS
    * the lesson: not_in = 0, not_exists = not_in_null_filtered,
    * in = exists, and in + not_exists partitions the table.
    *
    * Engine note: ANSI NOT IN forces a NULL-AWARE anti join, which
    * Spark can only execute broadcast-side (every row must see the
    * whole list to decide UNKNOWN) — the plan this key pins is WHY
    * NOT IN is the 100 TB anti-pattern and the null-filtered/EXISTS
    * forms (plain shuffled anti joins) are the rewrite every
    * production query should run. */
  def qNullSemantics(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer_ns")
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders_ns")
    s.sql(nullSemanticsBody("customer_ns", "orders_ns"))
  }

  val qNullSemanticsSql: String = nullSemanticsBody("customer", "orders")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_null_semantics" -> (qNullSemantics _),
    "q22_prospects" -> (q22Prospects _),
    "q21_waiting" -> (q21Waiting _),
    "q_window_ignore_nulls" -> (qWindowIgnoreNulls _),
    "q_mode" -> (qMode _),
    "q_penny_allocation" -> (qPennyAllocation _),
    "q_funnel_steps" -> (qFunnelSteps _),
    "q_ohlc_bars" -> (qOhlcBars _),
    "q_group_concat" -> (qGroupConcat _),
    "q_window_dist_funcs" -> (qWindowDistFuncs _),
    "q_gap_fill" -> (qGapFill _),
    "q_retention_cohort" -> (qRetentionCohort _),
    "q1_agg" -> (q1Agg _),
    "q3_topk_join" -> (q3TopkJoin _),
    "q5_star_join" -> (q5StarJoin _),
    "q_window_running" -> (qWindowRunning _),
    "q_window_funcs" -> (qWindowFuncs _),
    "q_pivot" -> (qPivot _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_map_funcs" -> (qMapFuncs _),
    "q_json_funcs" -> (qJsonFuncs _),
    "q_json_table" -> (qJsonTable _),
    "q_latest_per_key" -> (qLatestPerKey _),
    "q_histogram" -> (qHistogram _),
    "q_distinct" -> (qDistinct _),
    "q_semi_anti" -> (qSemiAnti _),
    "q_events_window" -> (qEventsWindow _),
    "q_rollup" -> (qRollup _),
    "q_outer_join" -> (qOuterJoin _),
    "q_setops" -> (qSetOps _),
    "q_setops_all" -> (qSetOpsAll _),
    "q_case_agg" -> (qCaseAgg _),
    "q_topk_per_key" -> (qTopkPerKey _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_percentile" -> (qPercentile _),
    "q_sessionize" -> (qSessionize _),
    "q_interval_merge" -> (qIntervalMerge _),
    "q_asof_interpolate" -> (qAsofInterpolate _),
    "q_hierarchy" -> (qHierarchy _),
    "q_bom_explosion" -> (qBomExplosion _),
    "q_window_groups" -> (qWindowGroups _),
    "q_window_exclude" -> (qWindowExclude _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_pagerank" -> (qPagerank _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_cube" -> (qCube _),
    "q_window_range" -> (qWindowRange _),
    "q_explode_lateral" -> (qExplodeLateral _),
    "q_unpivot" -> (qUnpivot _),
    "q_full_outer" -> (qFullOuter _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_approx_percentile" -> (qApproxPercentile _))

  val oracles: Map[String, String] = Map(
    "q_null_semantics" -> qNullSemanticsSql,
    "q_window_ignore_nulls" -> qWindowIgnoreNullsSql,
    "q_penny_allocation" -> qPennyAllocationSql,
    "q_funnel_steps" -> qFunnelStepsSql,
    "q_ohlc_bars" -> qOhlcBarsSql,
    "q_group_concat" -> qGroupConcatSql,
    "q_window_dist_funcs" -> qWindowDistFuncsSql,
    "q_gap_fill" -> qGapFillSql,
    "q_retention_cohort" -> qRetentionCohortSql,
    "q1_agg" -> q1AggSql,
    "q3_topk_join" -> q3TopkJoinSql,
    "q5_star_join" -> q5StarJoinSql,
    "q_window_running" -> qWindowRunningSql,
    "q_window_funcs" -> qWindowFuncsSql,
    "q_pivot" -> qPivotSql,
    "q_array_funcs" -> qArrayFuncsSql,
    "q_map_funcs" -> qMapFuncsSql,
    "q_json_funcs" -> qJsonFuncsSql,
    "q21_waiting" -> q21WaitingSql,
    "q22_prospects" -> q22ProspectsSql,
    "q_json_table" -> qJsonTableSql,
    "q_latest_per_key" -> qLatestPerKeySql,
    "q_histogram" -> qHistogramSql,
    "q_distinct" -> qDistinctSql,
    "q_semi_anti" -> qSemiAntiSql,
    "q_events_window" -> qEventsWindowSql,
    "q_rollup" -> qRollupSql,
    "q_outer_join" -> qOuterJoinSql,
    "q_setops" -> qSetOpsSql,
    "q_setops_all" -> qSetOpsAllSql,
    "q_case_agg" -> qCaseAggSql,
    "q_topk_per_key" -> qTopkPerKeySql,
    "q_string_funcs" -> qStringFuncsSql,
    "q_date_funcs" -> qDateFuncsSql,
    "q_percentile" -> qPercentileSql,
    "q_mode" -> qModeSql,
    "q_sessionize" -> qSessionizeSql,
    "q_interval_merge" -> qIntervalMergeSql,
    "q_asof_interpolate" -> qAsofInterpolateSql,
    "q_hierarchy" -> qHierarchySql,
    "q_bom_explosion" -> qBomExplosionSql,
    "q_window_groups" -> qWindowGroupsSql,
    "q_window_exclude" -> qWindowExcludeSql,
    "q_pagerank" -> qPagerankSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_scalar_subquery" -> qScalarSubquerySql,
    "q_cube" -> qCubeSql,
    "q_window_range" -> qWindowRangeSql,
    "q_explode_lateral" -> qExplodeLateralSql,
    "q_unpivot" -> qUnpivotSql,
    "q_full_outer" -> qFullOuterSql)
}
