package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed Aggregator — the
  * constant-memory heavy-hitter summary beside the engine's other
  * sketches (HLL distinct, quantile digest): k counters summarize an
  * unbounded stream with the classic guarantee that any item with
  * true frequency > n/(k+1) survives, and every kept estimate
  * undercounts by at most n/(k+1). The mergeable variant (Agarwal et
  * al., "Mergeable Summaries") keeps the same bound under arbitrary
  * partition-wise merges, which is exactly Spark's partial/final
  * aggregation contract: each partition sketches locally (O(k)
  * memory, map-side), partials merge pairwise — the corpus itself
  * never shuffles, only k-entry maps do. At 100 TB this is THE
  * frequency profile a scan can afford: top domains, hot keys, skew
  * detection before a join strategy is chosen.
  *
  * (Reference analog: the reference eyeballs frequency skew through
  * ad-hoc SELECTs during migration — /root/reference/libs/
  * MysqlParser.py:121-150 extracts per-table rows wholesale; a
  * bounded-memory profile is its scale successor.)
  */
object MisraGries {

  /** Decrement-based reduce step: count the item if tracked or space
    * remains; otherwise every counter pays one — the O(1)-amortized
    * textbook step. */
  private[graft] def reduce(m: Map[String, Long], x: String, k: Int)
      : Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < k => m.updated(x, 1L)
      case None =>
        m.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None
        }
    }

  /** Mergeable-summaries merge: sum counts, then if over k keep only
    * entries above the (k+1)-th largest count, subtracting it — the
    * error stays ≤ n/(k+1) under any merge tree. */
  private[graft] def merge(a: Map[String, Long], b: Map[String, Long],
      k: Int): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val kth = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (key, c) =>
        if (c > kth) Some(key -> (c - kth)) else None
      }
    }
  }

  /** Aggregator over a string column; finish() emits the surviving
    * counters ordered (count desc, key) for a deterministic frame. */
  def sketch(k: Int): Aggregator[String, Map[String, Long], Seq[(String, Long)]] =
    new Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(m: Map[String, Long], x: String): Map[String, Long] =
        MisraGries.reduce(m, x, k)
      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
        MisraGries.merge(a, b, k)
      def finish(m: Map[String, Long]): Seq[(String, Long)] =
        m.toSeq.sortBy { case (key, c) => (-c, key) }
      def bufferEncoder: Encoder[Map[String, Long]] =
        Encoders.kryo[Map[String, Long]]
      def outputEncoder: Encoder[Seq[(String, Long)]] =
        Encoders.kryo[Seq[(String, Long)]]
    }
}
