package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.plans.TopKPerKey

/** Randomized (seeded) equivalence checks for distributed operators:
  * generated data with heavy duplication, skewed keys, and ties —
  * the shapes that break naive top-k and salting implementations.
  */
class RandomizedOpsSpec extends AnyFunSuite {
  import TestSpark._

  private val rnd = new scala.util.Random(20260812L)

  test("TopKPerKey equals sort-take on skewed random data with ties") {
    import spark.implicits._
    // skewed keys (power-law-ish) and a tiny value domain forcing ties
    val rows = (1 to 20000).map { i =>
      val key = if (rnd.nextInt(10) == 0) 0L else rnd.nextInt(50).toLong
      (key, rnd.nextInt(8).toLong, i.toLong)
    }
    val df = rows.toDF("k", "v", "id").repartition(13)
    val ours = TopKPerKey.topK(df, Seq("k"),
        Seq(col("v").desc, col("id")), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity)
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy { case (_, v, id) => (-v, id) }.take(5)
    }.sortBy(identity)
    assert(ours.toSeq == expected)
  }

  test("jaccardPairs equals all-pairs brute force on random near-dup docs") {
    import spark.implicits._
    // small vocab + mutated copies so real near-dups occur at tau=0.5
    val vocab = ('a' to 'z').map(_.toString) ++ Seq("foo", "bar", "baz")
    def doc(): Seq[String] =
      Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
    val bases = (0 until 120).map(i => i.toLong -> doc())
    val mutated = bases.collect { case (i, toks) if i % 3 == 0 =>
      val t = toks.toArray
      if (t.nonEmpty) t(rnd.nextInt(t.length)) = vocab(rnd.nextInt(vocab.size))
      (i + 10000L) -> t.toSeq
    }
    val all = bases ++ mutated
    val df = all.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    val ours = operators.DedupOps.jaccardPairs(df, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over string shingle sets
    def sh(toks: Seq[String]): Set[String] =
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    val sets = all.map { case (id, toks) => id -> sh(toks) }
      .filter(_._2.nonEmpty)
    val expected = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size if j >= 0.5
    } yield (ia, ib)).toSet
    assert(ours == expected,
      s"missed: ${expected -- ours}; extra: ${ours -- expected}")
  }

  test("saltedCount equals groupBy count on skewed random keys") {
    import spark.implicits._
    val rows = (1 to 30000).map { _ =>
      if (rnd.nextInt(3) == 0) 7L else rnd.nextInt(100).toLong
    }
    val df = rows.toDF("k").repartition(9)
    val salted = Skew.saltedCount(df, "k", factor = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = rows.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    assert(salted == plain)
  }
}
