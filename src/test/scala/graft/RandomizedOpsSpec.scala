package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.plans.TopKPerKey

/** Randomized (seeded) equivalence checks for distributed operators:
  * generated data with heavy duplication, skewed keys, and ties —
  * the shapes that break naive top-k and salting implementations.
  */
class RandomizedOpsSpec extends AnyFunSuite {
  import TestSpark._

  private val rnd = new scala.util.Random(20260812L)

  test("TopKPerKey equals sort-take on skewed random data with ties") {
    import spark.implicits._
    // skewed keys (power-law-ish) and a tiny value domain forcing ties
    val rows = (1 to 20000).map { i =>
      val key = if (rnd.nextInt(10) == 0) 0L else rnd.nextInt(50).toLong
      (key, rnd.nextInt(8).toLong, i.toLong)
    }
    val df = rows.toDF("k", "v", "id").repartition(13)
    val ours = TopKPerKey.topK(df, Seq("k"),
        Seq(col("v").desc, col("id")), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity)
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy { case (_, v, id) => (-v, id) }.take(5)
    }.sortBy(identity)
    assert(ours.toSeq == expected)
  }

  test("saltedCount equals groupBy count on skewed random keys") {
    import spark.implicits._
    val rows = (1 to 30000).map { _ =>
      if (rnd.nextInt(3) == 0) 7L else rnd.nextInt(100).toLong
    }
    val df = rows.toDF("k").repartition(9)
    val salted = Skew.saltedCount(df, "k", factor = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = rows.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    assert(salted == plain)
  }
}
