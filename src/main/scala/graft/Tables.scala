package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). All queries take the sf directory as a
  * parameter so the same plan runs at any scale factor.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session settings every graft entrypoint (Verify/Bench/tests) applies
    * at construction. events.ts is parquet TIMESTAMP(NANOS), which Spark
    * rejects unless nanos are read as long (truncated to micros below —
    * the same floor semantics DuckDB applies loading nanos into its
    * microsecond timestamps, so oracle parity is preserved). Set once
    * here instead of mutating conf inside the loader (order-dependence).
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // Driver fixtures write ts as TIMESTAMP(MICROS) isAdjustedToUTC=false,
    // which Spark >=3.4 would otherwise infer as TIMESTAMP_NTZ. Under the
    // UTC session timezone above, reading it as TIMESTAMP_LTZ is
    // semantics-preserving and keeps unix_micros()/window() usable.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // AQE partition coalescing sizes reduce stages by BYTES alone
    // (parallelismFirst still floors at minPartitionSize), which
    // serializes CPU-dense stages whose bytes are small: the
    // levenshtein verify of q_fuzzy_join ran as ONE task (jobstats:
    // 3 jobs / 3 tasks) because its post-shuffle input is <1 MB while
    // its compute is ~10⁹ DP cells. 64 KB keeps such stages parallel
    // on the fixture; a 100 TB deployment overrides via this same
    // conf (bytes dominate there and the 1 MB default is fine) —
    // see OPTIMIZATION_r14.md. Overridable through the env knob.
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")

  /** Register every table as a temp view so the full engine surface
    * is reachable from spark.sql(...) too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(t => load(spark, sfDir, t).createOrReplaceTempView(t))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // driver fixtures store ts as TIMESTAMP(NANOS) (read as int64 under
    // nanosAsLong → truncate to micros here); GenScale'd corpora write
    // ts as a real TIMESTAMP(MICROS) already — branch on the type
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Corpus-dir tag for one-time /tmp artifact paths AND the oracle
    * side's `__SFTAG__` substitution (Verify) — the two must agree
    * byte-for-byte, so this is the ONLY derivation. Truncated SHA-256
    * of the dir string, not 32-bit String.hashCode: two colliding dir
    * strings would share one artifact directory, and a concurrent
    * Verify on corpus A could clobber published payloads between
    * corpus B's publish and its oracle's read_parquet — the same
    * collision/stale-artifact hazard the mv_auto defTag already moved
    * off hashCode for (ScaleJoins.scala). 64 digest bits put an
    * accidental cross-corpus collision past any realistic dir count. */
  def sfTag(dir: String): String = digest64(dir)

  /** Truncated-SHA-256 tag shared by every artifact identity in the
    * engine (corpus dirs here, content/freshness signatures in
    * ScaleJoins.corpusTag): 64 digest bits, never 32-bit
    * String.hashCode — a hashCode collision on a freshness token
    * would read as a false "fresh" and silently serve a stale
    * artifact to both engines, invisible to the parity gate. */
  def digest64(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString

  /** Redistribute a LOW-SPLIT source before per-row CPU-heavy work
    * (JSON parsing, media decode): parquet cannot split inside a row
    * group, so a single-row-group file scans as ONE task and
    * serializes everything computed above it no matter how many cores
    * exist — the driver fixtures ship exactly that shape (events and
    * documents are single-file, single-row-group at EVERY sf, which
    * made q_json_table's parse single-threaded: 8.5 s at sf1 where
    * the plan itself is embarrassingly parallel). When the scan's
    * split count is well under the session's parallelism, one
    * round-robin shuffle of the raw rows buys full-width execution;
    * when the source is already wide — the 100 TB case, thousands of
    * files and row groups — the guard makes this a NO-OP and no
    * shuffle is added. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
