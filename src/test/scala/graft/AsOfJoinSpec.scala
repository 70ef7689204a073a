package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("asOf: inclusive match, latest-wins, pre-history NULL") {
    import spark.implicits._
    val left = Seq(
      (1L, "k", 100L), // before any right row -> NULL
      (2L, "k", 200L), // exactly at right ts 200 -> inclusive match
      (3L, "k", 250L), // between 200 and 300 -> 200 wins
      (4L, "k", 301L), // after 300 -> 300 wins
      (5L, "z", 500L)) // key with no right rows -> NULL
      .toDF("id", "key", "ts")
    val right = Seq(
      ("k", 200L, "a"),
      ("k", 300L, "b"))
      .toDF("key", "rts", "v")
    val out = AsOfJoin.asOf(left, right, "key", "ts", "rts", Seq("v"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(3)))
    assert(out.toSeq == Seq(
      1L -> None, 2L -> Some("a"), 3L -> Some("a"),
      4L -> Some("b"), 5L -> None))
  }

  test("asOf: enrichment is all-or-nothing per right row (no column mixing)") {
    import spark.implicits._
    val left = Seq((1L, "k", 400L)).toDF("id", "key", "ts")
    // latest right row has v2 = NULL; its v2 must NOT back-fill from
    // the older row — that would mix columns of different right rows
    val right = Seq(
      ("k", 100L, Some("old_v1"), Some("old_v2")),
      ("k", 300L, Some("new_v1"), None: Option[String]))
      .toDF("key", "rts", "v1", "v2")
    val r = AsOfJoin.asOf(left, right, "key", "ts", "rts", Seq("v1", "v2"))
      .collect().head
    assert(r.getString(3) == "new_v1")
    assert(r.isNullAt(4), s"v2 back-filled from an older right row: $r")
  }

  test("asOf variants ignore NULL-ts right rows (ts >= NULL never matches)") {
    import spark.implicits._
    val left = Seq((1L, "k", 100L), (2L, "k", 250L)).toDF("id", "key", "ts")
    val right = Seq(
      ("k", None: Option[Long], "poison"), // must never match anything
      ("k", Some(200L), "a"))
      .toDF("key", "rts", "v")
    for (out <- Seq(
        AsOfJoin.asOf(left, right, "key", "ts", "rts", Seq("v")),
        AsOfJoin.asOfBroadcast(left, right, "key", "ts", "rts", Seq("v")))) {
      val rows = out.orderBy("id").collect()
        .map(r => r.getLong(0) -> Option(r.getString(3)))
      assert(rows.toSeq == Seq(1L -> None, 2L -> Some("a")), rows.toSeq)
    }
  }

  test("asOfBroadcast (binary-search variant) equals the windowed asOf") {
    import spark.implicits._
    val left = Seq(
      (1L, "k", 100L), (2L, "k", 200L), (3L, "k", 250L),
      (4L, "k", 301L), (5L, "z", 500L)).toDF("id", "key", "ts")
    val right = Seq(("k", 200L, "a"), ("k", 300L, "b")).toDF("key", "rts", "v")
    val windowed = AsOfJoin.asOf(left, right, "key", "ts", "rts", Seq("v"))
      .orderBy("id").collect().map(r => r.getLong(0) -> Option(r.getString(3)))
    val bcast = AsOfJoin.asOfBroadcast(left, right, "key", "ts", "rts", Seq("v"))
      .orderBy("id").collect().map(r => r.getLong(0) -> Option(r.getString(3)))
    assert(bcast.toSeq == windowed.toSeq)
    // and against the real fixture at sf0.001
    val a = AsOfJoin.qAsofJoin(spark, sf).collect()
    val b = AsOfJoin.qAsofBcast(spark, sf).collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("as-of variants agree on duplicate right timestamps (greatest payload wins)") {
    import spark.implicits._
    val left = Seq((1L, "k", 250L), (2L, "k", 200L)).toDF("id", "key", "ts")
    // three right rows share ts=200: both variants must pick the
    // greatest payload struct, not an arrival-order row
    val right = Seq(
      ("k", 200L, "b"), ("k", 200L, "c"), ("k", 200L, "a"),
      ("k", 100L, "z"))
      .toDF("key", "rts", "v")
    val windowed = AsOfJoin.asOf(left, right, "key", "ts", "rts", Seq("v"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getString(3))
    val bcast = AsOfJoin.asOfBroadcast(left, right, "key", "ts", "rts", Seq("v"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getString(3))
    assert(windowed.toSeq == Seq(1L -> "c", 2L -> "c"))
    assert(bcast.toSeq == windowed.toSeq)
  }

  test("RangeJoin binned execution equals naive inequality join, no BNLJ") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val points = (1 to 2000).map(i => (i.toLong, rnd.nextInt(100000).toLong))
      .toDF("id", "pt")
    val ranges = (1 to 300).map { i =>
      val lo = rnd.nextInt(100000).toLong
      (i.toLong, lo, lo + rnd.nextInt(5000).toLong)
    }.toDF("rid", "lo", "hi")
    val binned = operators.RangeJoin.pointInRange(
        points, ranges, "pt", "lo", "hi", binWidth = 4096)
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(ranges,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive && naive.nonEmpty)
    val plan = operators.RangeJoin.pointInRange(
      points, ranges, "pt", "lo", "hi", 4096).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"binned range join degenerated to BNLJ:\n$plan")
  }

  test("q_asof_join keeps every event and matched orders precede their event") {
    val df = AsOfJoin.qAsofJoin(spark, "/root/testdata/sf0.01")
    assert(df.count() == 10000)
    val matched = df.filter(col("o_orderkey").isNotNull)
    assert(matched.count() > 0, "sf0.01 should produce as-of matches")
    val violations = matched
      .filter(col("o_ts").cast("timestamp") > col("ts")).count()
    assert(violations == 0, s"$violations matched orders after their event")
  }

  test("q_asof_nearest picks the truly closest order in either direction") {
    import graft.operators.AsOfJoin
    val rows = AsOfJoin.qAsofNearest(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver-side replay: per user, the full order-ts list; for each
    // event the nearest |diff| with back-on-tie. Timestamps compared
    // at MICROsecond precision (getTime truncates to ms).
    def us(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000L
    val ord = Tables.load(spark, sf, "orders")
      .select(expr("o_custkey % 150"),
        expr("o_orderdate + INTERVAL 29 YEARS"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case ((u, ts), g) =>
        (u, us(ts), g.map(_._3).max)
      }.toSeq.groupBy(_._1)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val tsMs = us(r.getAs[java.sql.Timestamp]("ts"))
      ord.get(u) match {
        case None =>
          assert(r.isNullAt(r.fieldIndex("o_orderkey")))
          assert(r.isNullAt(r.fieldIndex("direction")))
        case Some(os) =>
          val best = os.minBy { case (_, oMs, ok) =>
            (math.abs(tsMs - oMs), // nearest wins
              if (oMs <= tsMs) 0 else 1, // tie → backward
              -ok) // never relevant given (user, ts) dedup, pinned anyway
          }
          assert(r.getAs[Long]("o_orderkey") == best._3,
            s"event at $tsMs (user $u) picked the wrong order")
          val oMs = us(r.getAs[java.sql.Timestamp]("o_ts"))
          assert(r.getAs[Long]("lag_us") == math.abs(tsMs - oMs))
          assert(r.getAs[String]("direction") ==
            (if (oMs <= tsMs) "back" else "fwd"))
      }
    }
    // non-vacuity: both directions genuinely occur
    val dirs = rows.flatMap(r => Option(r.getAs[String]("direction")))
    assert(dirs.contains("back") && dirs.contains("fwd"))
  }
}
