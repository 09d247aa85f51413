package graft.tools

import org.apache.spark.sql.SparkSession

import graft.FtQueries
import graft.search._

/** Hot-path latency of the round-5 serving surfaces against the driver
  * tables: monolithic vs SHARDED search (MultiSearcher over the doc_id%2
  * pair), exhaustive vs WAND on both, and RRF hybrid fusion. Protocol per
  * BENCH.md: ≥20 INTERLEAVED reps per op on warmed searchers, p50 + p95
  * reported (host noise arrives in windows — interleaving exposes it to
  * every op equally).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt 'runMain graft.tools.OpBench'
  */
object OpBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-opbench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val q = BooleanQuery(Seq(
      BooleanClause(Occur.SHOULD, TermQuery("merge")),
      BooleanClause(Occur.SHOULD, TermQuery("spark"))))
    val mono = FtQueries.searcher(spark, sfDir)
    val multi = FtQueries.multiSearcher(spark, sfDir)

    val ops: Seq[(String, () => Unit)] = Seq(
      ("mono_search", () => { mono.search(q, 10, ScoreMode.ExactDouble); () }),
      ("mono_wand", () => { Wand.searchTopK(mono, q, 10, ScoreMode.ExactDouble); () }),
      ("sharded_search", () => { multi.search(q, 10, ScoreMode.ExactDouble); () }),
      ("sharded_wand", () => { multi.searchWand(q, 10, ScoreMode.ExactDouble); () }),
      ("hybrid_rrf", () => { FtQueries.hybridDF(spark, sfDir, q, 0L, 50, 60, 10).collect(); () }))

    // warm every path (index builds resume from cache; stats caches fill)
    ops.foreach { case (_, f) => f(); f() }

    val reps = sys.env.getOrElse("GRAFT_OPBENCH_REPS", "20").toInt
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 0 until reps; (name, f) <- ops) { // interleaved
      val t0 = System.nanoTime()
      f()
      times(name) = times(name) :+ ((System.nanoTime() - t0) / 1e6)
    }
    def pct(v: Vector[Double], p: Double): Double = {
      val s = v.sorted
      s(math.min(s.length - 1, math.ceil(p * s.length).toInt - 1).max(0))
    }
    println(f"| op | p50 ms | p95 ms |  ($reps interleaved reps, $sfDir)")
    ops.foreach { case (name, _) =>
      val v = times(name)
      println(f"| $name%-14s | ${pct(v, 0.50)}%8.1f | ${pct(v, 0.95)}%8.1f |")
    }
    spark.stop()
  }
}
