package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** End-to-end JDBC source/sink against embedded Derby (in
  * /opt/spark/jars): batched parallel write, PK-stat-derived ranged
  * parallel read, predicate-partitioned read — the runtime behavior of
  * the reference's core DB I/O path, exercised live.
  */
class JdbcSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val conn = Jdbc.tempDerby("graft-derby-spec")

  private lazy val customer = {
    val df = Tables.load(spark, sf, "customer")
    Jdbc.write(df, conn, "CUSTOMER")
    df
  }

  test("batched write + ranged parallel read round-trips exactly") {
    val src = customer // forces the one-time write into Derby
    val back = Jdbc.partitionedRead(spark, conn, "CUSTOMER", "c_custkey", 4)
      .toDF(src.columns: _*)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)))
    val a = back.orderBy("c_custkey").collect()
    val b = src.orderBy("c_custkey").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("pkStats reads live min/max and the read honors stride ranges") {
    val src = customer
    val (lo, hi) = Jdbc.pkStats(conn, "CUSTOMER", "c_custkey")
    val expected = src.agg(min("c_custkey"), max("c_custkey")).head()
    assert(lo == expected.getLong(0) && hi == expected.getLong(1))

    // Spark's JDBCRelation turns [lower, upper) into numPartitions
    // stride ranges (partition 0 unbounded below, last unbounded
    // above). The exact stride rounding is version-internal, so assert
    // the structural contract of the generated WHERE clauses
    // behaviorally: ranges are evenly strided, ordered by partition
    // id, disjoint, and exhaustive — with a dense PK the per-partition
    // min/max ARE the clause boundaries.
    val n = 4
    val rows = Jdbc.partitionedRead(spark, conn, "CUSTOMER", "c_custkey", n)
      .select(col("c_custkey"), spark_partition_id().as("pid"))
      .collect()
    assert(rows.length == src.count())
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val byPid = rows.groupBy(_.getInt(1)).view
      .mapValues(_.map(_.getLong(0))).toMap
    assert(byPid.keySet == (0 until n).toSet,
      "expected all 4 range partitions non-empty")
    val mins = (0 until n).map(p => byPid(p).min)
    val maxs = (0 until n).map(p => byPid(p).max)
    assert(mins.head == lo && maxs.last == hi)
    // ordered + disjoint: each partition's range ends before the next
    (0 until n - 1).foreach(p => assert(maxs(p) < mins(p + 1),
      s"partitions $p and ${p + 1} overlap"))
    // balanced boundaries: with the dense 0..149 key the partition
    // mins sit exactly at the clause boundaries; Spark spreads the
    // fractional stride so ranges differ by at most one key
    val strides = (1 until n).map(p => mins(p) - mins(p - 1))
    assert(strides.max - strides.min <= 1,
      s"expected balanced stride ranges, got $strides")
    assert(strides.max * n >= (hi + 1 - lo),
      "stride ranges must cover the whole PK window")
  }

  test("mod-predicate read is disjoint and exhaustive") {
    val src = customer
    val preds = Jdbc.modPredicates("\"c_custkey\"", 3)
    val df = Jdbc.predicateRead(spark, conn, "CUSTOMER", preds)
    assert(df.rdd.getNumPartitions == 3)
    val perPart = df
      .select(col("c_custkey"), spark_partition_id().as("pid"))
      .collect()
    // exhaustive: every source row appears exactly once
    assert(perPart.length == src.count())
    assert(perPart.map(_.getLong(0)).distinct.length == perPart.length)
    // disjoint by construction: partition i holds exactly pk % 3 == i
    perPart.foreach(r =>
      assert(r.getLong(0) % 3 == r.getInt(1),
        s"pk ${r.getLong(0)} in wrong mod-partition ${r.getInt(1)}"))
  }

  test("append write accumulates batches (batched insert path)") {
    val df = Tables.load(spark, sf, "nation")
    Jdbc.write(df, conn, "NATION")
    Jdbc.write(df, conn, "NATION")
    val n = Jdbc.predicateRead(spark, conn, "NATION",
      Array("1=1")).count()
    assert(n == df.count() * 2)
  }
}
