package graft.tools

import org.apache.spark.sql.SparkSession

import graft.analysis.StandardCodeAnalyzer
import graft.index.{IndexBuilder, IndexConfig}

/** Build-stage scaling probe: times stage1 (docIds) / invert+flush / publish
  * separately at two parallelism levels to locate the non-scaling component.
  * Usage: runMain graft.tools.ScalingProbe <docs> <cpus> [cpus2 ...]
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpusList = if (args.length > 1) args.tail.toSeq else Seq("8", "32")
    for (cpus <- cpusList) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val scratch =
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_probe"
        else sys.props("java.io.tmpdir")
      new java.io.File(scratch).mkdirs()
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", s"$scratch/spark_local")
      .config("spark.sql.files.maxPartitionBytes",
          sys.env.getOrElse("SPARK_GRAFT_MPB", "16m"))
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // stage-level telemetry: wall vs ideal(task-time/cores) exposes
      // stragglers and serial gaps between stages
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val taskSum = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = e.taskInfo.duration
          taskSum.merge(e.stageId, (d, d, 1),
            (a, b) => (a._1 + b._1, math.max(a._2, b._2), a._3 + b._3))
        }
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
          val (sum, mx, n) = taskSum.getOrDefault(si.stageId, (0L, 0L, 0))
          if (wall > 0.5)
            println(f"  STAGE ${si.stageId}%3d ${si.name.take(40)}%-40s wall=$wall%6.2fs tasks=$n taskSum=${sum / 1e3}%7.1fs taskMax=${mx / 1e3}%5.1fs")
        }
      })
      import spark.implicits._

      val dir = s"${scratch}/probe_${cpus}_${System.nanoTime()}"
      val cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(),
        docsPerRange = 8192, numSegments = 64, segmentsPerWave = 64)
      val b = new IndexBuilder(spark, cfg)
      val corpus = spark.range(0L, docs, 1L, 64).map(i => SyntheticCorpus.file(i)).toDF()

      // warmup JIT with a small build
      b.build(spark.range(0L, 5000L, 1L, 16).map(i => SyntheticCorpus.file(i)).toDF(),
        s"${dir}_warm", resume = false)

      def t[A](f: => A): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val mode = sys.env.getOrElse("SPARK_GRAFT_PROBE_MODE", "fused")
      if (mode == "staged") {
        val tTotal = t(b.build(corpus, dir, resume = false))
        val tPublish = t(b.publish(dir))
        val tInvert = t(b.invertWave(spark.read.parquet(s"$dir/staged"), 99, dir))
        println(f"PROBE cpus=$cpus docs=$docs total=$tTotal%.2f publish=$tPublish%.2f invertOnly=$tInvert%.2f stage1~=${tTotal - tPublish - tInvert}%.2f docs_per_sec=${docs / tTotal}%.0f")
      } else {
        // fused: explicit ids straight from the generator, no staged parquet
        val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "256").toInt
        val nSegs = cfg.numSegments
        val perSeg = math.max(1L, (docs + nSegs) / nSegs)
        val corpusPath = s"$scratch/corpus_${docs}_$parts"
        if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
          spark.range(0L, docs, 1L, parts).map { i =>
            val f = SyntheticCorpus.file(i)
            (i, (i / perSeg).toInt, f.repo, f.path, f.commit, f.lang, f.content)
          }.toDF("docId", "segId", "repo", "path", "commit", "lang", "content")
            .write.mode("overwrite").parquet(corpusPath)
        }
        val fusedCorpus = spark.read.parquet(corpusPath)
        val tInvert = t(b.invertWave(fusedCorpus, 0, dir))
        val tPublish = t(b.publish(dir))
        println(f"PROBE-FUSED cpus=$cpus docs=$docs parts=$parts total=${tInvert + tPublish}%.2f invert=$tInvert%.2f publish=$tPublish%.2f docs_per_sec=${docs / (tInvert + tPublish)}%.0f")
      }
      spark.stop()
    }
  }
}
