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

  test("graft_dot: NULL element yields NULL; length mismatch throws") {
    import spark.implicits._
    // NULL element -> NULL result, matching the documented
    // zip_with/aggregate fold equivalence (codegen + interpreted)
    val withNull = Seq(
      (1L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("id", "a", "b")
    val out = withNull.select(col("id"), dotD(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1), "null element must null the fold")
    assert(out(1).getDouble(1) == 11.0)
    // dimension mismatch is data corruption: fail loud, not truncate
    val mismatched = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    // surfaces raw from local-relation eval, SparkException-wrapped
    // from an executor — accept either carrier
    val e = intercept[Exception] {
      mismatched.select(dotD(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("length mismatch")), s"got: $e")
  }

  test("graft_asof_pick is registered for SQL via GraftExtensions") {
    val out = spark.sql(
      """SELECT graft_asof_pick(
        |  array(named_struct('ts', 100L, 'v', 'a'),
        |        named_struct('ts', 300L, 'v', 'b')), probe).v AS v
        |FROM VALUES (50L), (100L), (250L), (400L) AS t(probe)
        |ORDER BY probe""".stripMargin).collect()
    assert(out.map(r => Option(r.getString(0))).toSeq ==
      Seq(None, Some("a"), Some("a"), Some("b")))
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
