package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Nearest-centroid argmax as ONE constant-size native expression.
  *
  * The centroid matrix rides along as plain Scala data (shipped to
  * executors inside the expression's reference objects, exactly how
  * Catalyst ships any literal), NOT as k child expressions. The
  * alternative — k `dot/greatest/when` branches built from typedlit
  * columns — produces an O(k²·dim) expression tree whose analysis +
  * Janino compilation dwarfs execution once k grows (at IVF-correct
  * k≈√n the tree is unbuildable). Here the tree is 2 children
  * regardless of k; the k-loop lives in the generated code.
  *
  * Semantics (bit-compatible with the expression-chain form it
  * replaces, and with the probe-side `dotD / (nrm * cnrm)` scoring):
  * per centroid c, cos_c = fold_left(v[i] * cv[i]) / (nrm * cnrm_c),
  * each float widened to double before multiply; result is the id of
  * the max cosine, ties and all-NaN resolving to the lowest id (ids
  * are sorted ascending by construction).
  */
case class NearestCentroid(
    left: Expression,
    right: Expression,
    ids: IndexedSeq[Int],
    cvecs: IndexedSeq[IndexedSeq[Double]],
    cnrms: IndexedSeq[Double])
  extends BinaryExpression {

  @transient private lazy val idsArr: Array[Int] = ids.toArray
  @transient private lazy val matrix: Array[Array[Double]] =
    cvecs.map(_.toArray).toArray
  @transient private lazy val nrmsArr: Array[Double] = cnrms.toArray

  private def isFloatVec: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if right.dataType == DoubleType =>
      if (ids.nonEmpty && ids.length == cvecs.length && ids.length == cnrms.length)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_nearest_centroid: ids/vecs/nrms sizes differ or empty " +
          s"(${ids.length}/${cvecs.length}/${cnrms.length})")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects (array<float|double>, double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_nearest_centroid"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val fl = isFloatVec
    var best = idsArr(0)
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < matrix.length) {
      val cv = matrix(c)
      val n = math.min(v.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x: Double = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * cv(i)
        i += 1
      }
      val cos = acc / (nrm * nrmsArr(c))
      if (cos > bestCos) { bestCos = cos; best = idsArr(c) }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val m = ctx.addReferenceObj("centVecs", matrix, "double[][]")
      val nr = ctx.addReferenceObj("centNrms", nrmsArr, "double[]")
      val idRef = ctx.addReferenceObj("centIds", idsArr, "int[]")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val cos = ctx.freshName("cos")
      val cv = ctx.freshName("cv")
      val best = ctx.freshName("best")
      val bestCos = ctx.freshName("bestCos")
      val get =
        if (isFloatVec) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $best = $idRef[0];
         |double $bestCos = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $m.length; $c++) {
         |  double[] $cv = $m[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $cv.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $get * $cv[$i];
         |  }
         |  double $cos = $acc / ($nrm * $nr[$c]);
         |  if ($cos > $bestCos) { $bestCos = $cos; $best = $idRef[$c]; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}
