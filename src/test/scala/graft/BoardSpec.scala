package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical board-consistency guard (VERDICT r7 #4): every key the
  * engine ships must be documented in SURVEY §2, and every SURVEY §2
  * key row must be a real registered query — keys can no longer land
  * in code without a SURVEY row, or linger in SURVEY after removal.
  * The committed bench artifact runs SparkEntry.queries directly, so
  * queries == SURVEY rows implies bench coverage too.
  */
class BoardSpec extends AnyFunSuite {

  private def surveyKeys: Set[String] = {
    val lines = scala.io.Source.fromFile("SURVEY.md", "UTF-8").getLines().toSeq
    val sec2 = lines.dropWhile(l => !l.startsWith("## §2"))
      .takeWhile(l => !l.startsWith("## §3"))
    // key rows are snake_case first cells; header cells ("key",
    // "component") and infra component names (spaces, capitals,
    // hyphens) don't match
    val keyRe = """^\| ([a-z][a-z0-9_]*) \|""".r
    sec2.flatMap(l => keyRe.findFirstMatchIn(l).map(_.group(1)))
      .filterNot(Set("key", "component")).toSet
  }

  test("SURVEY §2 key rows and SparkEntry.queries are the same set") {
    val survey = surveyKeys
    val code = SparkEntry.queries.keySet
    val undocumented = code -- survey
    val stale = survey -- code
    assert(undocumented.isEmpty,
      s"keys implemented but missing a SURVEY §2 row: ${undocumented.toSeq.sorted}")
    assert(stale.isEmpty,
      s"SURVEY §2 rows with no implementation: ${stale.toSeq.sorted}")
  }

  test("every oracle belongs to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted}")
  }

  test("keys without an oracle are the declared [T]-by-design set") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // sketch internals (HLL, quantile digest) are engine-specific by
    // contract; mm_binary_meta decodes real media bytes no SQL engine
    // can recompute (mm_decode is its formula-derived [O] twin)
    // q_heavy_hitters joins the sketch family: Misra-Gries counters
    // are merge-order-dependent within the guaranteed error bound
    // stream_heavy_hitters carries the same Misra-Gries contract as
    // q_heavy_hitters, maintained as streaming state
    // (dedup_lsh_eval left this set in r11: its candidates rebuild
    // from the PUBLISHED band-bucket artifact, so the whole audit is
    // DuckDB-replayable)
    val declared = Set("q_approx_distinct", "q_approx_percentile",
      "mm_binary_meta", "q_heavy_hitters", "stream_heavy_hitters")
    assert(noOracle == declared,
      s"oracle-free keys drifted from the declared [T] set: " +
        s"extra=${(noOracle -- declared).toSeq.sorted} " +
        s"missing=${(declared -- noOracle).toSeq.sorted}")
  }
}
