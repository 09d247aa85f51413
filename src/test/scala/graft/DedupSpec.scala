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

  test("capped collector: buffers bounded at cap+1 while counts stay exact") {
    val agg = new graft.pipeline.CappedIdCollect(10)
    // reduce: one pathological partition feeding 100k ids
    var b = agg.zero
    (0L until 100000L).foreach(i => b = agg.reduce(b, i))
    assert(b.n == 100000L, "true count must survive truncation")
    assert(b.ids.size == 11, s"buffer must cap at cap+1, got ${b.ids.size}")
    // merge of two over-cap partials stays bounded and exact
    val m = agg.merge(b, b)
    assert(m.n == 200000L && m.ids.size == 11)
    // under-cap buckets keep every id (pair explosion needs them all)
    var s = agg.zero
    (0L until 7L).foreach(i => s = agg.reduce(s, i))
    assert(s.n == 7 && s.ids.sorted == (0L until 7L))
    assert(agg.merge(s, agg.zero).ids.size == 7)
  }

  test("pathological band (every doc in one bucket): capped → dropped, raised cap → full pairs") {
    // 60 docs with IDENTICAL shingle sets but distinct texts (the phrase
    // repeated i times ≥ 2 yields the same circular 3-shingle set), so rep
    // collapse keeps all of them and every band puts all 60 in ONE bucket
    val docs = (0 until 60).map(i => (i.toLong, ("wa wb wc wd " * (i + 2)).trim))
      .toDF("doc_id", "text")
    val dropped = Dedup.minhashLshPairs(docs, "text", "doc_id", tau = 0.05, maxBucket = 10)
    assert(dropped.count() == 0, "over-cap bucket must be skipped entirely")
    val kept = Dedup.minhashLshPairs(docs, "text", "doc_id", tau = 0.05, maxBucket = 100)
    assert(kept.count() == 60L * 59 / 2, "under-cap bucket yields all i<j pairs (jaccard 1.0)")
  }

  test("autoPlanes: buckets scale with corpus size") {
    assert(Dedup.autoPlanes(500) == 4) // floor — matches the oracle's pinned 4
    assert(Dedup.autoPlanes(16000) == 4)
    assert(Dedup.autoPlanes(1000000) == 10) // 2^10 = 1024 buckets ≥ n/1000
    assert(Dedup.autoPlanes(100000000L) == 17)
    assert(Dedup.autoPlanes(Long.MaxValue / 2) == 24) // hard cap
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

  test("connected components: chains, diamonds, and isolated pairs resolve to min-id reps") {
    // components: {1..5} as a chain (worst diameter), {10,11,12} as a
    // triangle+tail, {20,21} isolated pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("id_a", "id_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // driver union-find fast path AND the distributed propagation loop
    // (localEdgeMax=0 forces it) must resolve identically
    for (localMax <- Seq(1000000L, 0L)) {
      val got = Dedup.connectedComponents(pairs, localEdgeMax = localMax)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"localEdgeMax=$localMax")
    }
    // a LONG chain through the distributed loop: pointer jumping must
    // converge in O(log diameter) rounds (one-hop propagation would need
    // 120 rounds here and trip the convergence guard)
    val chain = (0L until 120L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val chained = Dedup.connectedComponents(chain, maxIters = 12, localEdgeMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chained.size == 121 && chained.values.forall(_ == 0L))
  }

  test("simhash32: one row per doc, ZERO shuffle; vote semantics preserved") {
    val df = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha beta gamma alpha"), // identical → identical hash
      (3L, "totally different words here entirely"),
      (4L, "")) // zero tokens → absent (explode parity)
    .toDF("doc_id", "text")
    val sh = Dedup.simhash32(df, "text", "doc_id")
    // the whole computation lives inside the doc's row: the physical plan
    // must contain NO Exchange (round-3 fix: the old explode(0..31) shuffled
    // 32 rows per token)
    val plan = sh.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"simhash32 plan shuffles:\n$plan")
    val got = sh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == got(2L) && got(1L) != got(3L))
    // hand-check one doc against the vote rule (md5 high hex nibble = +1)
    val hashes = Seq("alpha", "beta", "gamma", "alpha").map { t =>
      java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val expected = (0 until 32).map { j =>
      val votes = hashes.map(h => if ("89abcdef".contains(h(j))) 1 else -1).sum
      if (votes >= 0) 1L << j else 0L
    }.sum
    assert(got(1L) == expected)
  }

  test("simhash32Agg (explode + declarative agg, the pairs path) ≡ simhash32") {
    val df = ((0 until 60).map { i =>
      (i.toLong, (0 to i % 7).map(k => s"w${(i * 31 + k * 7) % 13}").mkString(" "))
    } ++ Seq((100L, ""))).toDF("doc_id", "text") // empty doc absent from both
    val a = Dedup.simhash32(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Dedup.simhash32Agg(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.nonEmpty && a.sameElements(b))
  }
}
