package graft.search

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.SmallFloat

/** rowBound soundness: the per-row WAND bound must dominate BOTH scoring
  * modes for every (freq ≤ maxFreq, dl ≥ minDl) a range row can contain —
  * including dls that straddle byte315 quantization bucket edges, where the
  * round-1 bound (stepping the byte DOWN) was provably unsafe.
  */
class WandBoundSpec extends AnyFunSuite {

  test("rowBound dominates Ref32 and ExactDouble scores across quantization buckets") {
    val cs = CollectionStats("content", maxDoc = 10000, docCount = 10000,
      sumTotalTermFreq = 800000, sumDocFreq = 500000)
    val ts = TermStats("content", "t", docFreq = 1234, totalTermFreq = 5678)
    val sim = new Bm25Similarity()
    val ref = sim.termScorer(ts, cs, 1.0f)
    val exact = Bm25.exactScorer(ts, cs)
    for (minDl <- 1 to 512; maxFreq <- Seq(1, 3, 17)) {
      val bound = Wand.rowBound(ref, maxFreq, minDl).toDouble
      var dl = minDl
      while (dl <= math.min(minDl + 80, 700)) {
        val b = SmallFloat.encodeNorm(dl, 0)
        val r = ref.score(maxFreq.toFloat, b).toDouble
        assert(r <= bound, s"ref32: dl=$dl minDl=$minDl f=$maxFreq score=$r bound=$bound")
        val e = exact.score(maxFreq.toDouble, dl.toDouble)
        assert(e <= bound + 1e-6, s"exact: dl=$dl minDl=$minDl f=$maxFreq score=$e bound=$bound")
        dl += 1
      }
    }
  }

  test("byte315 monotonicity premise: larger byte → smaller decoded doc length") {
    var prev = Double.MaxValue
    for (b <- 1 to 255) {
      val len = SmallFloat.decodeNormToDocLen(b.toByte).toDouble
      assert(len < prev, s"decodedLen must strictly decrease at byte $b")
      prev = len
    }
  }
}
