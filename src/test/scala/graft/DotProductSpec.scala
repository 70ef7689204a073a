package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

class DotProductSpec extends AnyFunSuite {
  import TestSpark._

  test("native graft_dot is bit-identical to the interpreted fold") {
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val declarative = aggregate(
      zip_with(col("v"), col("v"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val rows = e.select(col("vec_id"),
      dotD(col("v"), col("v")).as("native"), declarative.as("fold")).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"bit mismatch for vec ${r.getLong(0)}")
    }
  }

  test("graft_dot is registered for SQL via GraftExtensions") {
    Tables.load(spark, sf, "embeddings").createOrReplaceTempView("emb")
    val out = spark.sql(
      """SELECT graft_dot(cast(embedding as array<double>),
        |                 cast(embedding as array<double>)) AS d
        |FROM emb LIMIT 5""".stripMargin).collect()
    assert(out.length == 5 && out.forall(r => math.abs(r.getDouble(0) - 1.0) < 0.1))
  }

  test("graft_dot participates in whole-stage codegen on float arrays") {
    val e = Tables.load(spark, sf, "embeddings")
      .select(dotD(col("embedding"), col("embedding")).as("d"))
    val plan = e.queryExecution.executedPlan.toString
    // the projection computing graft_dot must sit inside a codegen
    // span (lines marked *(n)), not fall back to interpreted Project
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_dot") && l.trim.startsWith("*(")),
      s"graft_dot outside codegen:\n$plan")
  }
}
