package graft.tools

import org.apache.spark.sql.SparkSession

/** Extra benchmark harness for optimization work (guide §1.4): isolates
  * individual SparkEntry queries with the SAME session shape and action as
  * graft.Bench section 1 (fresh session per invocation, warmed ft indexes,
  * `.count()` per query, queries run in the given order) — so per-query
  * numbers here are comparable to the driver's, without paying the full
  * 700 s bench. Does NOT touch graft.Bench (frozen harness).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt 'runMain graft.tools.BenchExtra [--reps N] [--explain DIR] [--nowarm] q1 q2 ...'
  *
  * --reps N     run the listed queries N times in order (rep timings all
  *              printed; first rep ≈ the driver's single-shot number, later
  *              reps isolate steady-state vs first-run planning/codegen)
  * --explain D  write <query>.txt formatted plans into directory D
  * --nowarm     skip the ft index warm-up (for dd_/ann_/ta_-only runs)
  */
object BenchExtra {

  private val scratch: String =
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_benchx"
    else sys.props("java.io.tmpdir")

  def main(args: Array[String]): Unit = {
    var reps = 1
    var explainDir: Option[String] = None
    var warm = true
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--explain" => explainDir = Some(args(i + 1)); i += 2
        case "--nowarm" => warm = false; i += 1
        case q => names += q; i += 1
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus.toInt, 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"$scratch/spark_local")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (warm) {
      graft.FtQueries.indexPath(spark, sfDir)
      graft.FtQueries.mergedIndexPath(spark, sfDir)
      graft.FtQueries.streamedIndexPath(spark, sfDir)
      graft.FtQueries.logMergedIndexPath(spark, sfDir)
      graft.FtQueries.reclaimedIndexPath(spark, sfDir)
    }

    val qs = if (names.nonEmpty) names.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (r <- 1 to reps) {
      for (name <- qs) {
        val fn = graft.SparkEntry.queries(name)
        spark.sparkContext.setJobDescription(s"benchx:$name:rep$r")
        val t0 = System.nanoTime()
        val n = try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          System.err.println(s"[benchx] $name failed: $e"); -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"BENCHX $name%-24s rep$r%-3d $sec%8.3f s  rows=$n")
        if (r == 1) explainDir.foreach { d =>
          new java.io.File(d).mkdirs()
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/$name.txt"), plan)
        }
      }
    }
    spark.stop()
  }
}
