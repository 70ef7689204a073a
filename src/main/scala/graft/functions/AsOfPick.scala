package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary search for the as-of match: given an array of structs
  * sorted ascending by their FIRST field (a timestamp/long) and a
  * probe timestamp, returns the element with the greatest first field
  * <= the probe (inclusive, DuckDB ASOF semantics), or NULL when the
  * probe precedes every element.
  *
  * This is the per-row kernel of the broadcast as-of join
  * (AsOfJoin.asOfBroadcast): the right side packs into one sorted
  * array per key, ships inside a broadcast hash relation, and each
  * left row resolves its match in O(log n) generated code — the left
  * fact is never shuffled OR sorted, which is exactly what a skewed
  * key distribution needs (the union+window form sorts |L|+|R| rows
  * inside every key partition).
  */
case class AsOfPick(left: Expression, right: Expression)
    extends BinaryExpression {

  private def structType: StructType = left.dataType match {
    case ArrayType(st: StructType, _) => st
    case _ => StructType(Nil)
  }

  /** timestamp / timestamp_ntz / long all store as long micros; the
    * session runs UTC (Tables.configure) so cross-kind comparison is
    * well-defined. */
  private def microsBacked(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(st: StructType, _), probe) if st.nonEmpty =>
      if (microsBacked(st.head.dataType) && microsBacked(probe))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_asof_pick: sort field and probe must be timestamp[_ntz] or " +
          s"long, got (${st.head.dataType.simpleString}, ${probe.simpleString})")
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"graft_asof_pick expects (array<struct<...>>, timestamp|long), got " +
        s"(${a.simpleString}, ${b.simpleString})")
  }

  override def dataType: DataType = structType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_asof_pick"

  private def nFields: Int = structType.length

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val t = b.asInstanceOf[Long] // timestamps are long micros internally
    var lo = 0
    var hi = arr.numElements() - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getStruct(mid, nFields).getLong(0) <= t) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans < 0) null else arr.getStruct(ans, nFields)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, t) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val ans = ctx.freshName("ans")
      s"""
         |int $lo = 0;
         |int $hi = $arr.numElements() - 1;
         |int $ans = -1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr.getStruct($mid, $nFields).getLong(0) <= $t) {
         |    $ans = $mid; $lo = $mid + 1;
         |  } else {
         |    $hi = $mid - 1;
         |  }
         |}
         |if ($ans < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $arr.getStruct($ans, $nFields);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsOfPick =
    copy(left = newLeft, right = newRight)
}
