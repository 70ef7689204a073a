package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over `array<float>`/`array<double>`
  * columns (sides may mix).
  *
  * The declarative form — aggregate(zip_with(a, b, *), 0.0, +) over
  * element-cast arrays — is correct but runs on Catalyst's interpreted
  * higher-order-function path (CodegenFallback), allocating a lambda
  * frame per element AND evicting the enclosing Project from
  * whole-stage codegen. This expression generates a tight primitive
  * loop instead: floats widen exactly to double per element, products
  * accumulate left-to-right, so results are bit-identical to the
  * cast-then-fold form and to DuckDB's list_dot_product over
  * CAST(v AS DOUBLE[]) (SURVEY.md §4).
  *
  * This is the preferred extension path when built-in operators can't
  * express an op efficiently: a scalar Catalyst Expression with
  * doGenCode, before reaching for UDFs or custom physical plans.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elementOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elementOk(left.dataType) && elementOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float|double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  /** The documented zip_with/aggregate equivalence: a NULL element
    * anywhere makes the whole fold NULL, so the result is nullable
    * whenever an input array may contain nulls. */
  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: array length mismatch (${x.numElements()} vs " +
          s"${y.numElements()}) — embedding dimensions must agree")
    val n = x.numElements()
    val lf = isFloat(left)
    val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv: Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv: Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, fl: Boolean) =
        if (fl) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      // the element null check compiles in only when the type says it
      // can fire, keeping the statically non-null loop tight
      val nullGuard =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: array length mismatch (" + $a.numElements() +
         |      " vs " + $b.numElements() + ") — embedding dimensions must agree");
         |}
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  $acc += ${get(a, isFloat(left))} * ${get(b, isFloat(right))};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}
