package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over `array<float>` embedding columns as pure Column
  * expression trees (codegen'd higher-order functions — no UDFs, no
  * serialization off the Tungsten row format).
  *
  * Determinism contract (SURVEY.md §4): every element is cast
  * float->double BEFORE any arithmetic, and every reduction folds
  * left-to-right, so results are bit-identical to DuckDB's
  * list_dot_product over CAST(v AS DOUBLE[]).
  */
object VectorFunctions {

  /** Elementwise float->double widening. */
  def toDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Left-to-right summed dot product of two (already double) arrays —
    * the native codegen'd DotProductD expression (same summation order
    * as the declarative aggregate/zip_with fold, ~10x faster). */
  def dotD(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      DotProductD(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  def dot(a: Column, b: Column): Column = dotD(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** cosine = dot / (||a|| * ||b||), evaluated in exactly that shape. */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))

  /** Sign-bit LSH bucket from `nBits` integer-coefficient hyperplanes.
    *
    * Random-hyperplane LSH normally draws gaussian coefficients; for
    * oracle-exact parity we use deterministic small-integer planes
    * h_j[i] = ((i*(j+3) + 7) mod 13) - 6, which are fixed, cheap, and
    * reproducible in ANSI SQL. dot(v, h_j) is a left fold of exact
    * double ops, so the sign — and therefore the bucket id — is
    * bit-stable across engines. Identical vectors always share a
    * bucket, which is the property dedup relies on.
    */
  /** `planeOffset` selects a disjoint run of hyperplanes, so banded
    * multi-probe LSH (OR of several independent bucket tables) can
    * derive band k's bucket from planes [k*nBits, (k+1)*nBits). */
  def lshBucket(v: Column, dim: Int, nBits: Int, planeOffset: Int = 0): Column = {
    // the fold packs bits into an Int column: 31+ bits would wrap
    // silently (SignBitsPacked's 64-bit pack guards its own range)
    require(nBits >= 1 && nBits <= 30,
      s"lshBucket packs into an int column: nBits must be 1..30, got $nBits")
    val bits = (0 until nBits).map { jj =>
      val j = jj + planeOffset
      // typedlit ships the plane as ONE constant ArrayData literal —
      // array(lit, ...) would rebuild a 64-element array per row
      val plane = typedlit((0 until dim).map(i =>
        ((i * (j + 3) + 7) % 13 - 6).toDouble).toArray)
      when(dotD(v, plane) >= 0, lit(1)).otherwise(lit(0))
    }
    bits.foldLeft(lit(0))((acc, b) => acc * 2 + b)
  }

  /** All `nBits` LSH sign bits (planes [planeOffset, planeOffset +
    * nBits)) packed MSB-first into one long via the native
    * SignBitsPacked expression — same bits as lshBucket, constant-size
    * expression tree. */
  def lshSignature(v: Column, dim: Int, nBits: Int,
      planeOffset: Int = 0): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SignBitsPacked(
        org.apache.spark.sql.GraftSqlBridge.expression(v),
        new DoubleMatrix((0 until nBits).map { jj =>
          val j = jj + planeOffset
          (0 until dim).map(i =>
            ((i * (j + 3) + 7) % 13 - 6).toDouble).toArray
        }.toArray)))

  /** The same bucket expression as DuckDB SQL text, for oracles. */
  def lshBucketSql(vExpr: String, dim: Int, nBits: Int,
      planeOffset: Int = 0): String = {
    // (1 << shift) is a Scala Int: 31+ bits would emit a negative
    // multiplier into the oracle text and break engine parity
    require(nBits >= 1 && nBits <= 30,
      s"lshBucketSql emits int multipliers: nBits must be 1..30, got $nBits")
    val bits = (0 until nBits).map { jj =>
      val j = jj + planeOffset
      val plane = (0 until dim).map(i =>
        s"${(i * (j + 3) + 7) % 13 - 6}.0").mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($vExpr, $plane) >= 0 THEN 1 ELSE 0 END)"
    }
    bits.zipWithIndex.map { case (b, idx) =>
      val shift = nBits - 1 - idx
      if (shift == 0) b else s"$b * ${1 << shift}"
    }.mkString("(", " + ", ")")
  }
}
