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

  /** Arity gate: SQL text can call an injected function with any
    * argument count — a bare children(i) would die with an
    * internal-looking IndexOutOfBounds (or silently DROP extras)
    * instead of the standard wrong-number-of-arguments message. */
  private def arity(name: String, n: Int)(
      children: Seq[Expression]): Seq[Expression] = {
    if (children.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${children.length}")
    children
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        val c = arity("graft_dot", 2)(children); DotProductD(c(0), c(1)) }))
    ext.injectFunction((
      new FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (children: Seq[Expression]) => {
        val c = arity("graft_polyhash", 1)(children); PolyHash(c(0)) }))
    ext.injectFunction((
      new FunctionIdentifier("graft_asof_pick"),
      new ExpressionInfo(classOf[AsOfPick].getName, "graft_asof_pick"),
      (children: Seq[Expression]) => {
        val c = arity("graft_asof_pick", 2)(children); AsOfPick(c(0), c(1)) }))
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectPostHocResolutionRule(MvRewrite(_))
  }
}
