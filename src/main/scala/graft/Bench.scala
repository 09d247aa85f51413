package graft

import org.apache.spark.sql.SparkSession

import graft.analysis.StandardCodeAnalyzer
import graft.index.{IndexBuilder, IndexConfig}
import graft.search._
import graft.tools.SyntheticCorpus

/** Benchmark entry (driver contract): ONE JSON line with per-query seconds
  * plus the engine's headline metrics — index-build throughput (docs/sec) on
  * the synthesized source-code corpus, BM25 top-10 p95 latency over the
  * FIXTURES.md reference query set, and N→4N scaling efficiency evidenced as
  * local[8] vs local[32] (no real cluster in this sandbox).
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_DOCS
  * (default 200000), SPARK_GRAFT_SCALING=0 to skip the two-master run.
  */
object Bench {

  private def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus.toInt, 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def freshDir(tag: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_bench_${tag}_${System.nanoTime()}"
    d
  }

  /** Build the index over n synthesized docs; returns wall seconds. */
  private def timedBuild(spark: SparkSession, n: Long, parts: Int, out: String): Double = {
    import spark.implicits._
    val corpus = spark.range(0L, n, 1L, parts).map(i => SyntheticCorpus.file(i)).toDF()
    val cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(),
      docsPerRange = 8192, numSegments = 64, segmentsPerWave = 64,
      buildPartitions = parts)
    val t0 = System.nanoTime()
    new IndexBuilder(spark, cfg).build(corpus, out, resume = false)
    (System.nanoTime() - t0) / 1e9
  }

  private def refQueries(parser: QueryParser): Seq[(String, Query)] = Seq(
    "q1_term" -> TermQuery("import"),
    "q2_or" -> parser.parse("parser OR buffer"),
    "q3_phrase" -> PhraseQuery(Seq("posting", "list")),
    "q4_boost" -> TermQuery("scorer", -42.0f),
    "q5_and" -> parser.parse("+import +parser"),
    "q6_reqexcl" -> parser.parse("parser -uniqtoken_7"),
    "q7_stop" -> parser.parse("a OR the OR import"),
    "q8_msm" -> BooleanQuery(Seq(
      BooleanClause(Occur.SHOULD, TermQuery("parser")),
      BooleanClause(Occur.SHOULD, TermQuery("buffer")),
      BooleanClause(Occur.SHOULD, TermQuery("scorer"))), minShouldMatch = 2))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "200000").toLong
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"

    // ---- 1) driver-contract query timings on sfDir ----
    var spark = session(cpus)
    FtQueries.indexPath(spark, sfDir) // warm the ft index (build timed separately)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // ---- 2) headline: build throughput + query p95 on synthesized corpus ----
    val buildDir = freshDir(s"c$cpus")
    val buildSec = timedBuild(spark, benchDocs, 64, buildDir)
    val docsPerSec = benchDocs / buildSec

    val searcher = new IndexSearcher(spark, buildDir)
    val parser = new QueryParser(new StandardCodeAnalyzer())
    val reps = 5
    val p95 = refQueries(parser).map { case (name, q) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        searcher.search(q, 10, ScoreMode.Ref32)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      name -> times(math.min(reps - 1, math.ceil(reps * 0.95).toInt - 1))
    }

    // ---- 3) scaling: same build at local[8] vs local[32] ----
    var scalingJson = ""
    if (doScaling) {
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s8 = session("8")
      val t8 = timedBuild(s8, benchDocs, 64, freshDir("s8"))
      s8.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s32 = session("32")
      val t32 = timedBuild(s32, benchDocs, 64, freshDir("s32"))
      val eff = t8 / (4.0 * t32)
      scalingJson =
        f""","scaling":{"docs":$benchDocs,"local8_sec":$t8%.2f,"local32_sec":$t32%.2f,"local8_docs_per_sec":${benchDocs / t8}%.1f,"local32_docs_per_sec":${benchDocs / t32}%.1f,"efficiency":$eff%.3f}"""
      spark = s32
    }

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val p95s = p95.map { case (k, v) => f""""$k":$v%.1f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","build_docs":$benchDocs,"build_sec":$buildSec%.2f,"build_docs_per_sec":$docsPerSec%.1f,"query_p95_ms":$p95s$scalingJson}""")
    spark.stop()
  }
}
