package graft.tools

import org.apache.spark.sql.SparkSession

import graft.analysis.StandardCodeAnalyzer
import graft.index.{IndexBuilder, IndexConfig}

/** One scaling measurement in its own JVM (launched by graft.Bench with
  * -XX:ActiveProcessorCount=N): a faithful N-core-node emulation — GC
  * threads, ForkJoinPool, and JIT ergonomics all see N cores, unlike
  * switching local[N] inside one 32-core JVM.
  *
  * args: <cpus> <docs> <parts> <corpusPath> <outBase> <reps> [doFull]
  * prints: CHILD cpus=N invert=<min s> publish=<min s> [full=<s>]
  *
  * `full` (optional, expensive → measured once when requested) is the FULL
  * checkpointed build including stage-1 docId assignment and the staged
  * write — the end-to-end pipeline the north rule scales.
  */
object ScalingChild {
  def main(args: Array[String]): Unit = {
    val Array(cpus, docsS, partsS, corpusPath, outBase, repsS, rest @ _*) = args
    val reps = repsS.toInt
    val doFull = rest.headOption.contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaling-child")
      // IDENTICAL job config at both levels (the protocol measures "add 4x
      // cores to the same job", and Spark jobs keep their shuffle.partitions
      // when executors are added). Measured aside: giving the 2-core level
      // cores-proportional partitions (2) speeds ITS invert ~9% — i.e. the
      // fixed-config protocol under-states nothing; it just holds the job
      // constant. Override for experiments: SPARK_GRAFT_CHILD_SHUFFLE.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CHILD_SHUFFLE", math.max(cpus.toInt, 8).toString))
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"$outBase/spark_local")
      // invert wants ONE corpus file per map task: files are written
      // range-aligned (8192 docs each), so every (term, rangeId) shuffle
      // group has a single partial and the reduce stage is a pure
      // pass-through (no decode + re-encode); coarse packing would merge
      // files, split ranges across partitions, and re-encode everything
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(),
      docsPerRange = 8192, numSegments = 64, segmentsPerWave = 64)
    val b = new IndexBuilder(spark, cfg)
    val corpus = spark.read.parquet(corpusPath)

    def once(out: String): (Double, Double) = {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4m") // per-file map tasks
      val t0 = System.nanoTime()
      b.invertWave(corpus, 0, out)
      val t1 = System.nanoTime()
      // publish scans small metadata columns — coarse packing beats
      // per-file task overhead there
      spark.conf.set("spark.sql.files.maxPartitionBytes", "32m")
      b.publish(out)
      ((t1 - t0) / 1e9, (System.nanoTime() - t1) / 1e9)
    }
    // JIT/codegen warm-up on a slice
    {
      val slice = corpus.where(org.apache.spark.sql.functions.col("docId") < 20000)
      b.invertWave(slice, 0, s"$outBase/warm")
      b.publish(s"$outBase/warm")
    }
    val runs = (1 to reps).map(r => once(s"$outBase/run$r"))
    val best = runs.minBy(r => r._1 + r._2)

    val fullStr =
      if (doFull) {
        // full pipeline: stage-1 rank assignment (range sort + zipWithIndex)
        // + staged write + invert + publish, from the raw corpus columns
        val raw = corpus.select("repo", "path", "commit", "lang", "content")
        val t0 = System.nanoTime()
        b.build(raw, s"$outBase/full", resume = false)
        f" full=${(System.nanoTime() - t0) / 1e9}%.3f"
      } else ""

    println(f"CHILD cpus=$cpus invert=${best._1}%.3f publish=${best._2}%.3f$fullStr")
    spark.stop()
  }
}
