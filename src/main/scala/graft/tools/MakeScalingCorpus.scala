package graft.tools

import org.apache.spark.sql.SparkSession

/** Materialize the range-aligned scaling corpus (the exact layout
  * graft.Bench feeds its scaling children) without running the full bench —
  * for standalone ScalingChild experiments. args: [docs] [parts] [segs].
  */
object MakeScalingCorpus {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1048576L)
    val parts = args.lift(1).map(_.toInt).getOrElse(128)
    val segs = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("CORPUS " + graft.Bench.corpusParquet(spark, n, parts, segs))
    spark.stop()
  }
}
