package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Hybrid

/** RRF fusion invariants (engine-defined; driver-verified end to end by
  * ft_hybrid against the DuckDB twin).
  */
class HybridSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // 8 deterministic 4-dim embeddings; id 0 is the query
  private lazy val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.5f, 0.5f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (5L, Array(0.7f, 0.0f, 0.7f, 0.0f)),
    (6L, Array(0.0f, 0.0f, 0.0f, 1.0f)),
    (7L, Array(1.0f, 1.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")

  test("vectorRanks: query ranks first (cosine 1), ranks are 1-based and dense") {
    val r = Hybrid.vectorRanks(emb, "vec_id", "embedding", queryId = 0L, n = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r.map(_._2).sorted == (1L to 5L))
    assert(r.find(_._2 == 1L).get._1 == 0L) // self-similarity tops
    assert(r.find(_._2 == 2L).get._1 == 1L) // nearest neighbor next
  }

  test("rrfFuse: both-list docs beat single-list docs at equal ranks; k bounds") {
    val vec = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "vrank")
    val lex = Seq(11L, 20L, 21L) // 11 is in BOTH lists
    val fused = Hybrid.rrfFuse(spark, lex, vec, k0 = 60, k = 4).collect()
    assert(fused.length == 4)
    assert(fused.head.getLong(0) == 11L) // 1/62 + 1/61 beats any single 1/(60+r)
    val rrf11 = fused.head.getDouble(1)
    assert(rrf11 == 1.0 / 62.0 + 1.0 / 61.0) // lexical term first, exact
    // single-list docs carry exactly one reciprocal term
    val rrf10 = fused.find(_.getLong(0) == 10L).get.getDouble(1)
    assert(rrf10 == 1.0 / 61.0)
    // ties on rrf break by doc_id asc: lex rank 2 (doc 20) vs nothing equal
    assert(fused.map(_.getLong(0)).toSeq == fused.sortBy(r => (-r.getDouble(1), r.getLong(0))).map(_.getLong(0)).toSeq)
  }

  test("rrfFuse: empty vector side degrades to the lexical ranking") {
    val vec = Seq.empty[(Long, Long)].toDF("doc_id", "vrank")
    val fused = Hybrid.rrfFuse(spark, Seq(5L, 6L, 7L), vec, 60, 10).collect()
    assert(fused.map(_.getLong(0)).toSeq == Seq(5L, 6L, 7L))
  }
}
