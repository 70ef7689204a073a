package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (point-in-time) join: for every left row, the right row with
  * the greatest timestamp ≤ the left timestamp within the same key —
  * the canonical enrichment join for event streams against
  * slowly-changing facts.
  *
  * Spark has no native ASOF join; per the extension preference order
  * this composes built-ins (option a): union both sides tagged,
  * sort-once per key by (ts, right-first), and carry the latest right
  * payload forward with last(_, ignoreNulls) over a running frame.
  * One shuffle + one sort over |L|+|R| — the same cost profile as a
  * sort-merge join, no per-row probing, no custom exec needed.
  * Right rows at exactly the left ts order first, giving the ≤
  * (inclusive) semantics DuckDB's ASOF JOIN uses.
  */
object AsOfJoin {

  /** Generic as-of left join.
    * @param left      left frame
    * @param right     right frame; duplicate (key, ts) rows resolve
    *                  deterministically to the greatest payload
    *                  struct — the tie-break both variants share
    * @param key       join key column name present in both
    * @param leftTs    left timestamp column
    * @param rightTs   right timestamp column
    * @param payload   right columns to carry (become nullable)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // the payload travels as ONE struct carried by ONE last(ignoreNulls)
    // window: enrichment is all-or-nothing per right row. Independent
    // per-column windows would back-fill a NULL payload column from an
    // OLDER right row, silently mixing columns of different right rows
    // (and cost |payload| window passes instead of one).
    val pType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
    val unioned = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_right", lit(0))
      .select(Seq(col(key), col("__ts"), col("__is_right")) ++
        leftCols.filter(_ != key).map(col) :+
        lit(null).cast(pType).as("__p"): _*)
      .unionByName(right
        // a NULL-ts right row can never be the as-of match (ts >= NULL
        // is not true in SQL ASOF); unfiltered it would sort first and
        // back-fill pre-history left rows
        .filter(col(rightTs).isNotNull)
        .withColumn("__ts", col(rightTs))
        .withColumn("__is_right", lit(1))
        .select(Seq(col(key), col("__ts"), col("__is_right")) ++
          leftCols.filter(_ != key).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(payload.map(col): _*).as("__p"): _*))
    // trailing __p sort key: right rows sharing a timestamp order by
    // payload struct, so last() deterministically keeps the GREATEST
    // payload among ts-ties — the same rule the broadcast variant gets
    // from sort_array + greatest-index binary search (AsOfPick). Left
    // rows have NULL __p and are unaffected. Without this, ties
    // resolved by arrival order and the two variants could disagree.
    val scan = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__is_right").desc, col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(scan))
      .filter(col("__is_right") === 0)
      .select(leftCols.map(col) ++
        payload.map(c => col("__p").getField(c).as(c)): _*)
  }

  /** Sort-free broadcast as-of variant — the skewed-left-key shape.
    * The right side packs into ONE sorted struct array per key
    * (sort_array orders by the leading ts field), broadcasts, and
    * each left row binary-searches its match in generated code
    * (functions.AsOfPick). The left fact is never shuffled or sorted
    * — with a hot key, the union+window form must sort that key's
    * entire |L|+|R| partition, while this stays O(|L| log |R_key|)
    * map-side. Use when the packed right fits a broadcast (the
    * dims-like enrichment case); asOf() remains the both-sides-large
    * path. Duplicate (key, ts) right rows resolve to the greatest
    * payload struct (sort_array orders ties by payload; the binary
    * search returns the greatest index) — the same tie-break asOf()
    * defines via its trailing __p sort key. */
  def asOfBroadcast(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val packed = right
      .filter(col(rightTs).isNotNull) // NULL ts never matches (as above)
      .groupBy(col(key))
      .agg(sort_array(collect_list(
        struct(col(rightTs).as("__ts") +: payload.map(col): _*))).as("__arr"))
    val pick = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.AsOfPick(
        org.apache.spark.sql.GraftSqlBridge.expression(col("__arr")),
        org.apache.spark.sql.GraftSqlBridge.expression(col(leftTs))))
    left.join(broadcast(packed), Seq(key), "left")
      .withColumn("__p", pick)
      .select(left.columns.map(col) ++
        payload.map(c => col("__p").getField(c).as(c)): _*)
  }

  /** q_asof_join: each event enriched with the user's most recent
    * order as of the event time. Orders are re-keyed to the event
    * user domain (custkey mod 150) and shifted +29 years so cutoffs
    * fall mid-stream; (key, ts) deduped by max orderkey. */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "user_id", "ts")
    val ord = Tables.load(s, dir, "orders")
      .select((col("o_custkey") % 150).as("user_id"),
        (col("o_orderdate") + expr("INTERVAL 29 YEARS")).as("o_ts"),
        col("o_orderkey"))
      .groupBy("user_id", "o_ts")
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    asOf(ev, ord, key = "user_id", leftTs = "ts", rightTs = "o_ts",
        payload = Seq("o_orderkey", "o_ts"))
      .orderBy("event_id")
  }

  val qAsofJoinSql: String =
    """WITH r AS (
      |  SELECT o_custkey % 150 AS user_id,
      |    o_orderdate + INTERVAL 29 YEAR AS o_ts,
      |    max(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, e.ts, r.o_orderkey, r.o_ts
      |FROM events e ASOF LEFT JOIN r
      |  ON e.user_id = r.user_id AND e.ts >= r.o_ts
      |ORDER BY e.event_id""".stripMargin

  /** The same enrichment through the broadcast binary-search variant;
    * shares the DuckDB ASOF oracle since the semantics are identical. */
  def qAsofBcast(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "user_id", "ts")
    val ord = Tables.load(s, dir, "orders")
      .select((col("o_custkey") % 150).as("user_id"),
        (col("o_orderdate") + expr("INTERVAL 29 YEARS")).as("o_ts"),
        col("o_orderkey"))
      .groupBy("user_id", "o_ts")
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    asOfBroadcast(ev, ord, key = "user_id", leftTs = "ts", rightTs = "o_ts",
        payload = Seq("o_orderkey", "o_ts"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_bcast" -> (qAsofBcast _))

  val oracles: Map[String, String] = Map(
    "q_asof_join" -> qAsofJoinSql,
    "q_asof_bcast" -> qAsofJoinSql)
}
