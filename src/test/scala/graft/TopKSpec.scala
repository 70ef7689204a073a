package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

class TopKSpec extends AnyFunSuite {
  import TestSpark._

  test("TopKPerKey matches the window row_number form exactly") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
    val ours = TopKPerKey.topK(li,
        keyCols = Seq("l_suppkey"),
        orderBy = Seq(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber")),
        k = 7)
      .orderBy(col("l_suppkey"), col("l_quantity").desc,
        col("l_orderkey"), col("l_linenumber"))
      .collect()
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
    val reference = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7).drop("rn")
      .orderBy(col("l_suppkey"), col("l_quantity").desc,
        col("l_orderkey"), col("l_linenumber"))
      .collect()
    assert(ours.length == reference.length && ours.nonEmpty)
    ours.zip(reference).foreach { case (a, b) => assert(a == b) }
  }

  test("TopKPerKey plans as partial/final execs around one exchange") {
    val ord = Tables.load(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    val df = TopKPerKey.topK(ord, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\d".r.findAllIn(plan).length == 2,
      s"expected partial+final execs in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(o_orderpriority"),
      s"expected candidate exchange keyed on the group in:\n$plan")
    // no Sort node: bounded heaps replace partition-wide sorting
    assert(!plan.contains("Sort "), s"unexpected sort in:\n$plan")
  }

  test("TopKPerKey handles k larger than group size and empty input") {
    val tiny = Tables.load(spark, sf, "region") // 5 rows, unique keys
    val all = TopKPerKey.topK(tiny, Seq("r_regionkey"),
      Seq(col("r_name")), 10).collect()
    assert(all.length == tiny.count())
    val none = TopKPerKey.topK(
      tiny.filter(col("r_regionkey") < 0), Seq("r_regionkey"),
      Seq(col("r_name")), 3).collect()
    assert(none.isEmpty)
  }
}
