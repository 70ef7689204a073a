package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object PolyHash {
  /** The shared checksum modulus (a prime below 2³⁰, so acc·31 + cp
    * never leaves the long range). */
  final val Mod = 1000000007L

  /** Codepoint polynomial fold: acc ← (acc·31 + codepoint) mod M,
    * left-to-right, acc₀ = 0 — exactly the declarative
    * aggregate(transform(filter(split(s, '')), ascii), 0, ...) chain
    * and DuckDB's list_reduce over string_split, on any input; the
    * all-ASCII fast path (every rendered checksum row here) folds raw
    * bytes without materializing a String. */
  def hash(s: UTF8String): Long = {
    val b = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < b.length) {
      if (b(i) < 0) ascii = false else i += 1
    }
    var acc = 0L
    if (ascii) {
      i = 0
      while (i < b.length) { acc = (acc * 31 + b(i)) % Mod; i += 1 }
    } else {
      val str = s.toString
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        acc = (acc * 31 + cp) % Mod
        j += Character.charCount(cp)
      }
    }
    acc
  }
}

/** Native codegen'd polynomial row hash over a string column.
  *
  * The declarative form — aggregate over split(s, '') with an ascii()
  * transform — is correct but interpreted: a per-row array of
  * one-char strings plus a lambda frame per character, and the
  * enclosing Project falls out of whole-stage codegen
  * (DotProductD's rationale, applied to strings). This expression
  * folds the string's bytes in a tight loop via one static call,
  * keeping the checksum scans (etl_table_checksum, etl_reconcile)
  * fully codegen'd.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects a string input, got " +
        child.dataType.simpleString)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(
      newChild: Expression): PolyHash = copy(child = newChild)
}
