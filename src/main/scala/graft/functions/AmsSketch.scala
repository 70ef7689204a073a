package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** AMS F2 (second-frequency-moment / self-join-size) sign-sum sketch
  * as a typed Aggregator (Alon, Matias & Szegedy, STOC'96) — the
  * counter vector IS the aggregation buffer, so Spark's partial/final
  * contract is literally the sketch merge (vector addition), exactly
  * as MisraGries models the mergeable-summaries tree.
  *
  * The n sign hashes are 4-wise-independent degree-3 polynomials over
  * Z_p (p = 2^31−1), evaluated in a plain JVM loop: a column-per-
  * estimator formulation pays a 128-column codegen/janino bill on
  * every plan (measured seconds of q_join_cardest's wall-clock); the
  * loop costs nanoseconds per row and generates nothing. The
  * polynomial is shared digit-for-digit with the DuckDB oracle's SQL
  * rendering (SketchOps.amsSignSql), which is what keeps the
  * Aggregator's counters hash-exact cross-engine.
  *
  * Overflow bound: every Horner intermediate is ≤ (2p)·key, so keys
  * must stay < ~2.1e9 — pre-fold wider keys through a mod-p hash
  * first (and mirror that fold in the verifying SQL).
  */
object AmsSketch {

  val P = 2147483647L

  /** Coefficient i of estimator j — mirrored in amsSignSql. */
  def coeff(j: Int, i: Int): Long =
    ((j.toLong * 4 + i) * 2654435761L + 777 + i * 7919) % P

  /** ±1 sign of key k under estimator j. floorMod (not %) at every
    * reduction keeps residues in [0, P) for NEGATIVE keys too — JVM %
    * yields negative residues whose parity term would leave {-1,+1}
    * (1−2·(−1) = 3) and silently corrupt the F2 estimate. Identical
    * to % on the non-negative keys fed today; mirrored step-for-step
    * in SketchOps.amsSignSql. The < ~2.1e9 magnitude bound above now
    * applies to |key|. */
  def sign(j: Int, k: Long): Long = {
    val t1 = Math.floorMod(coeff(j, 3) * k, P)
    val t2 = Math.floorMod((t1 + coeff(j, 2)) * k, P)
    val t3 = Math.floorMod((t2 + coeff(j, 1)) * k, P)
    val t = Math.floorMod(t3 + coeff(j, 0), P)
    1L - 2L * (t % 2L)
  }

  /** Aggregator over a long key column; finish() emits the n signed
    * sums in estimator order. */
  def sketch(n: Int): Aggregator[Long, Array[Long], Seq[Long]] =
    new Aggregator[Long, Array[Long], Seq[Long]] {
      def zero: Array[Long] = new Array[Long](n)
      def reduce(b: Array[Long], k: Long): Array[Long] = {
        var j = 0
        while (j < n) { b(j) += sign(j, k); j += 1 }
        b
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var j = 0
        while (j < n) { a(j) += b(j); j += 1 }
        a
      }
      def finish(b: Array[Long]): Seq[Long] = b.toSeq
      def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
      def outputEncoder: Encoder[Seq[Long]] = Encoders.kryo[Seq[Long]]
    }
}
