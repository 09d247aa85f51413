package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.TextOps

class TextOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("sampleThreshold: boundary weights stay 8-hex (or the keep-all sentinel)") {
    assert(TextOps.sampleThreshold(1.0) == "g")
    assert(TextOps.sampleThreshold(1.5) == "g")
    assert(TextOps.sampleThreshold(0.0) == "00000000")
    assert(TextOps.sampleThreshold(-0.2) == "00000000")
    assert(TextOps.sampleThreshold(0.5) == "80000000")
    // advisor round-4 case: w just below 1.0 ROUNDS to 2^32 — the 9-char
    // hex '100000000' compared lexicographically kept only ~1/16 of rows
    val justBelow = 1.0 - math.pow(2.0, -34)
    val t = TextOps.sampleThreshold(justBelow)
    assert(t == "g", s"near-1 weight must clamp to keep-all, got '$t'")
    // and every representable w < 1 - 2^-33 stays 8 chars
    assert(TextOps.sampleThreshold(1.0 - 1e-9).length == 8 ||
      TextOps.sampleThreshold(1.0 - 1e-9) == "g")
    assert(TextOps.sampleThreshold(0.999).length == 8)
  }

  test("stratifiedSample: near-1 weight keeps (almost) everything") {
    val df = (0L until 200L).map(i => (i, "en")).toDF("doc_id", "lang")
    val kept = TextOps.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> (1.0 - 1e-12)), default = 0.0).count()
    assert(kept == 200L, s"expected all 200 rows kept at w≈1, got $kept")
  }
}
