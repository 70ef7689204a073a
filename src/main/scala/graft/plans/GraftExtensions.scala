package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{AsOfPick, DotProductD, PolyHash}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions with the session's FunctionRegistry so SQL text can
  * call them (`SELECT graft_dot(a, b)`), alongside the direct Column
  * API in VectorFunctions. Enabled via
  * `spark.sql.extensions=graft.plans.GraftExtensions`
  * (Tables.configure sets it on every graft session).
  *
  * NearestCentroid / SignBitsPacked are Column-API-only: they carry
  * driver-computed matrices as constructor data, which SQL text
  * cannot express.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductD(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (children: Seq[Expression]) => PolyHash(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_asof_pick"),
      new ExpressionInfo(classOf[AsOfPick].getName, "graft_asof_pick"),
      (children: Seq[Expression]) => AsOfPick(children(0), children(1))))
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectPostHocResolutionRule(MvRewrite(_))
  }
}
