package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** MinHash-LSH scale guards: exact-duplicate collapse before banding keeps
  * candidate count O(near-dup groups) — a 1,000-copy boilerplate group must
  * NOT produce ~500k intra-group candidate pairs — and the bucket-size cap
  * bounds any single bucket's join contribution.
  */
class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val common = (0 until 40).map(i => s"tok$i").mkString(" ")

  test("1000-copy duplicate group: candidates O(groups), not O(m²)") {
    val boiler = (0 until 1000).map(i => (i.toLong, s"$common ending"))
    val near = Seq(
      (2000L, s"$common variantone"),
      (2001L, s"$common varianttwo"),
      (2002L, "completely different content with no shared shingles at all yes truly"))
    val df = (boiler ++ near).toDF("doc_id", "text")

    val reps = Dedup.contentRepresentatives(df, "text", "doc_id")
    assert(reps.count() == 4) // 1 boilerplate rep + 3 distinct contents

    val cands = Dedup.lshCandidatePairs(reps, "text", "doc_id",
      numHashes = 8, rowsPerBand = 2, shingleSize = 3, maxBucket = 10000)
    val n = cands.count()
    assert(n <= 6, s"candidate count must be O(groups) — got $n (m² would be ~500k)")
    assert(cands.where(col("id_a") < 1000 && col("id_b") < 1000).count() == 0,
      "no intra-duplicate-group candidates")

    // the true near-dup edge (docs differing in one trailing token) survives
    // end-to-end, reported between group representatives
    val pairs = Dedup.minhashLshPairs(df, "text", "doc_id", tau = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 2000L)) || pairs.contains((0L, 2001L)) ||
      pairs.contains((2000L, 2001L)),
      s"expected a near-dup edge among the variant docs, got ${pairs.toSeq}")
  }

  test("bucket-size cap drops oversized buckets (skew guard)") {
    val near = Seq(
      (1L, s"$common variantone"),
      (2L, s"$common varianttwo"),
      (3L, s"$common variantthree"))
    val reps = Dedup.contentRepresentatives(near.toDF("doc_id", "text"), "text", "doc_id")
    val uncapped = Dedup.lshCandidatePairs(reps, "text", "doc_id", 8, 2, 3, maxBucket = 10000)
    assert(uncapped.count() > 0)
    val capped = Dedup.lshCandidatePairs(reps, "text", "doc_id", 8, 2, 3, maxBucket = 1)
    assert(capped.count() == 0, "maxBucket=1 must suppress every multi-member bucket")
  }
}
