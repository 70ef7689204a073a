package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All hyperplane LSH sign bits of a vector as ONE packed long, MSB
  * first: bit for plane p lands at position (nPlanes - 1 - p). Band k
  * of width w is then `(sig >> ((nBands-1-k)*w)) & ((1<<w)-1)` —
  * bit-identical to folding each band's sign bits separately.
  *
  * Like NearestCentroid, the plane matrix rides as reference-object
  * data: the expression tree is 1 node regardless of plane count,
  * where the equivalent Column form (nPlanes × when(dotD(v, typedlit)
  * >= 0)) re-pays Catalyst analysis of a thousands-of-node tree on
  * every invocation. Each dot product folds left-to-right in doubles,
  * so the sign — and the bucket — matches the declarative form and
  * the DuckDB oracle exactly.
  */
case class SignBitsPacked(child: Expression, planes: DoubleMatrix)
  extends UnaryExpression {

  require(planes.rows.nonEmpty && planes.rows.length <= 64,
    s"SignBitsPacked supports 1..64 planes, got ${planes.rows.length}")

  private def matrix: Array[Array[Double]] = planes.rows

  private def isFloatVec: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_bits expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sign_bits"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val fl = isFloatVec
    if (v.numElements() != matrix(0).length)
      throw new IllegalArgumentException(
        s"graft_sign_bits: vector dim ${v.numElements()} != " +
          s"plane dim ${matrix(0).length}")
    var sig = 0L
    var p = 0
    while (p < matrix.length) {
      val plane = matrix(p)
      val n = plane.length
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x: Double = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * plane(i)
        i += 1
      }
      sig = (sig << 1) | (if (acc >= 0) 1L else 0L)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("lshPlanes", matrix, "double[][]")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val plane = ctx.freshName("plane")
      val get =
        if (isFloatVec) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |if ($v.numElements() != $m[0].length) {
         |  throw new IllegalArgumentException(
         |    "graft_sign_bits: vector dim " + $v.numElements() +
         |    " != plane dim " + $m[0].length);
         |}
         |long $sig = 0L;
         |for (int $p = 0; $p < $m.length; $p++) {
         |  double[] $plane = $m[$p];
         |  int $n = $plane.length;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $get * $plane[$i];
         |  }
         |  $sig = ($sig << 1) | ($acc >= 0 ? 1L : 0L);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBitsPacked =
    copy(child = newChild)
}
