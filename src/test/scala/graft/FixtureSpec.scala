package graft

import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Guards against driver fixture regeneration silently changing the
  * physical encoding of time columns. The fixtures have shipped ts as
  * parquet TIMESTAMP(NANOS) (read as long under nanosAsLong) and as
  * TIMESTAMP(MICROS) isAdjustedToUTC=false (which Spark would infer as
  * TIMESTAMP_NTZ unless inferTimestampNTZ is disabled). Tables.load +
  * Tables.configure must normalize every variant to TIMESTAMP_LTZ under
  * the UTC session timezone — if a regeneration introduces a third
  * encoding, this fails loud instead of breaking unix_micros() callers
  * or silently no-oping the Projector's UTC shift.
  */
class FixtureSpec extends AnyFunSuite {
  import TestSpark._

  test("events.ts loads as TIMESTAMP_LTZ regardless of parquet encoding") {
    val events = Tables.load(spark, sf, "events")
    assert(events.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType (LTZ); got " +
        s"${events.schema("ts").dataType}")
  }

  test("orders.o_orderdate and all key columns keep expected types") {
    val orders = Tables.load(spark, sf, "orders")
    assert(orders.schema("o_orderkey").dataType == LongType)
    val events = Tables.load(spark, sf, "events")
    // unix_micros is the canonical consumer that rejects NTZ — prove it
    // analyzes and executes against the loaded column.
    val n = events.selectExpr("unix_micros(ts) AS t").where("t IS NOT NULL").count()
    assert(n > 0)
  }
}
