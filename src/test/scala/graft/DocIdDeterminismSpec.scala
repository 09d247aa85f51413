package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analysis.StandardCodeAnalyzer
import graft.index._

/** The north-star checkpoint invariant: docIds are a PURE FUNCTION of the
  * input — identical across reruns, input partitionings, and build
  * parallelism (rank in a total key order is partitioning-independent).
  * A violation would silently corrupt resume-after-partial-failure.
  */
class DocIdDeterminismSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val N = 500

  private def idsOf(buildPartitions: Int, inputParts: Int): Map[String, Long] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-det").toString
    val cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(),
      docsPerRange = 64, numSegments = 8, segmentsPerWave = 8,
      buildPartitions = buildPartitions)
    val corpus = TestCorpus.corpus(N).toDF().repartition(inputParts)
    new IndexBuilder(spark, cfg).build(corpus, dir)
    spark.read.parquet(s"$dir/docs").select("path", "docId")
      .as[(String, Long)].collect().toMap
  }

  test("docIds identical across build parallelism and input partitioning") {
    val a = idsOf(buildPartitions = 4, inputParts = 3)
    val b = idsOf(buildPartitions = 16, inputParts = 11)
    assert(a.size == N && b.size == N)
    assert(a == b, {
      val diff = a.collect { case (p, id) if b(p) != id => (p, id, b(p)) }.take(5)
      s"docId mapping differs, e.g. $diff"
    })
  }
}
