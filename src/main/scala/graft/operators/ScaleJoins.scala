package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.sources.Bucketing

/** Driver-checked query keys for the two scale-layout strategies —
  * salting (skew) and bucketing (co-location). Both produce results
  * identical to their straightforward equivalents, so each carries a
  * plain-SQL DuckDB oracle: the layout machinery must be invisible in
  * the answer. (Reference analog: every per-table extract join in
  * the migration pipeline repeats the same join keys —
  * /root/reference/libs/MysqlParser.py:121-150 `get_table_raw_data`
  * with `_JOIN_` — which is exactly when a one-time co-located
  * layout, or a salt for a pathological key, pays off.)
  */
object ScaleJoins {

  /** Exact decimal sum rendered as double — deterministic in both
    * engines (SURVEY §4). */
  private def sumQty(c: String) =
    sum(col(c).cast(DecimalType(18, 2))).cast(DoubleType)

  /** Salted join over a deliberately skewed key: lineitem's
    * l_returnflag has 3 values covering ~600k rows at sf0.1 — the
    * power-law shape where one reducer would take a whole key. The
    * flag-level dim (total quantity per flag) joins back to the fact
    * through Skew.saltedJoin: the fact side salts into
    * (flag, salt∈[0,16)) shuffle keys, the 3-row dim replicates 16×,
    * so each hot key spreads over 16 reducers. The aggregate proves
    * exactness — salting must be invisible in the result. */
  def qSkewJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
    val dim = li.groupBy("l_returnflag")
      .agg(sumQty("l_quantity").as("flag_total_qty"))
    // shuffle_hash hint: salting exists for the case where the small
    // side CANNOT broadcast — without the hint the fixture-sized dim
    // broadcasts and the (key, salt) shuffle the key demonstrates
    // never materializes. With it, the plan shuffles both sides on
    // (l_returnflag, __salt): each hot key spreads over 16 reducers.
    Skew.saltedJoin(li, dim.hint("shuffle_hash"), "l_returnflag", factor = 16)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sumQty("l_quantity").as("sum_qty"),
        max(col("flag_total_qty")).as("flag_total_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val qSkewJoinSql: String =
    """WITH dim AS (
      |  SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS flag_total_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_returnflag, l.l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  MAX(d.flag_total_qty) AS flag_total_qty
      |FROM lineitem l JOIN dim d USING (l_returnflag)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Bucketed co-located join: lineitem and orders are written ONCE
    * as 8-bucket tables on the order key, then joined exchange-free —
    * the recurring O(data) shuffle of a fact-fact join becomes a
    * one-time layout cost (at 100 TB, THE strategy when the same join
    * key repeats across a workload). The merge hint forces the
    * sort-merge path so the bucket layout, not a broadcast, carries
    * the join at every scale; the only Exchange in the plan is the
    * 3-group final aggregate. */
  /** Corpus identity for the one-time layout: path PLUS the source
    * files' byte sizes and mtimes — a regenerated fixture at the same
    * path must rebuild the bucketed tables, not silently reuse a
    * stale layout persisted in the warehouse by an earlier session. */
  private[graft] def corpusTag(dir: String, tables: Seq[String]): String = {
    def stat(f: java.io.File): String =
      if (f.isDirectory) {
        val fs = f.listFiles()
        s"${fs.map(_.length).sum}:${if (fs.isEmpty) 0L else fs.map(_.lastModified).max}"
      } else s"${f.length}:${f.lastModified}"
    val sig = tables.map(t => s"$t=${stat(new java.io.File(s"$dir/$t.parquet"))}")
      .mkString("|")
    java.lang.Long.toHexString((dir + "|" + sig).hashCode.toLong & 0xffffffffL)
  }

  def qBucketJoin(s: SparkSession, dir: String): DataFrame = {
    // layout is ONE-TIME per corpus: table names carry the corpus
    // fingerprint, and an already-laid-out table is reused — repeated
    // queries measure the recurring exchange-free join, not the write
    val tag = corpusTag(dir, Seq("lineitem", "orders"))
    val liTab = s"graft_li_bucketed_$tag"
    val ordTab = s"graft_ord_bucketed_$tag"
    if (!s.catalog.tableExists(liTab))
      Bucketing.writeBucketed(Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity"), liTab, "l_orderkey", 8)
    if (!s.catalog.tableExists(ordTab))
      Bucketing.writeBucketed(Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus"), ordTab, "o_orderkey", 8)
    Bucketing.readTable(s, liTab).hint("merge")
      .join(Bucketing.readTable(s, ordTab),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sumQty("l_quantity").as("sum_qty"))
      .orderBy("o_orderstatus")
  }

  val qBucketJoinSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Root of the one-time hive-partitioned orders layout. */
  private[graft] def partLayoutDir(dir: String): String =
    s"/tmp/graft_part_orders_${corpusTag(dir, Seq("orders"))}"

  /** Partition-pruned scan — the THIRD scale-layout strategy beside
    * salting and bucketing, and the dominant one at 100 TB: facts land
    * hive-partitioned by a time key, and a query over one period
    * LISTS only that partition's files — pruning happens before any
    * byte is read, where row-group pushdown still reads footers. The
    * orders table is written ONCE per corpus fingerprint partitioned
    * by order year (7 partitions at every sf; partition COUNT scales
    * with time, not data); the query aggregates one year and must
    * show `PartitionFilters` carrying the predicate (asserted by
    * ScaleOpsSpec along with the pruned file listing). The layout is
    * invisible in the answer — the oracle is plain SQL over the raw
    * table. */
  def qPartitionPrune(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val layout = partLayoutDir(dir)
    val tagPath = Paths.get(layout, "_GRAFT_TAG")
    val tag = corpusTag(dir, Seq("orders"))
    Etl.withPathLock(Paths.get(layout + ".lock")) {
      if (!Files.exists(tagPath) || Files.readString(tagPath) != tag) {
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"),
            year(col("o_orderdate")).as("o_year"))
          .write.mode("overwrite").partitionBy("o_year").parquet(layout)
        Files.writeString(tagPath, tag)
      }
    }
    s.read.parquet(layout)
      .filter(col("o_year") === 1996)
      .groupBy(month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
      .orderBy("o_month")
  }

  val qPartitionPruneSql: String =
    """SELECT MONTH(o_orderdate) AS o_month, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |WHERE YEAR(o_orderdate) = 1996
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Runtime bloom-filter join pruning — the FOURTH scale lever
    * beside salting, bucketing, and partition pruning, and the one
    * that needs no layout at all: when a selective dim-side filter
    * feeds a shuffle join, Catalyst builds a bloom filter from the
    * filtered keys at runtime and applies it to the fact side BEFORE
    * its shuffle, so non-joining fact rows (here ~80%: one of five
    * priorities survives) never cross the wire. At 100 TB neither
    * join side broadcasts, which is exactly when the optimizer
    * injects the filter — the fixture reproduces that regime in a
    * CLONED session (thresholds lowered there only, so no other
    * key's optimizer is touched): broadcast off, scan-size floor
    * zero. ScaleOpsSpec asserts the injected
    * bloom_filter_might_contain actually prunes the fact scan; the
    * oracle is the plain join — runtime filtering must be invisible
    * in the answer. */
  def qBloomJoin(s0: SparkSession, dir: String): DataFrame = {
    val s = s0.newSession()
    // the 100 TB regime, in-fixture: no broadcast path (both sides
    // "too big"), no scan-size floor; bloom injection itself stays at
    // its public defaults
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val urgent = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_quantity")
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sumQty("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")
  }

  val qBloomJoinSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_join" -> (qSkewJoin _),
    "q_bucket_join" -> (qBucketJoin _),
    "q_partition_prune" -> (qPartitionPrune _),
    "q_bloom_join" -> (qBloomJoin _))

  val oracles: Map[String, String] = Map(
    "q_skew_join" -> qSkewJoinSql,
    "q_bucket_join" -> qBucketJoinSql,
    "q_partition_prune" -> qPartitionPruneSql,
    "q_bloom_join" -> qBloomJoinSql)
}
