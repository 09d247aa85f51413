package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway sub-stage profiler for optimization round 6. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft_probe/spark_local")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }

    val toks = graft.pipeline.TextOps.tokens(col("text"))

    // variant A: original — 32x substr + 8-way string isin per token
    def simA: DataFrame = {
      val highHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")
      val votes = aggregate(
        transform(toks, t => md5(t)),
        array_repeat(lit(0), 32),
        (acc, h) => zip_with(acc,
          transform(sequence(lit(0), lit(31)),
            j => when(h.substr(j + 1, lit(1)).isin(highHex: _*), lit(1)).otherwise(lit(-1))),
          (a, b) => a + b))
      docs.where(size(toks) > 0)
        .select(col("doc_id"),
          aggregate(
            zip_with(votes, sequence(lit(0), lit(31)),
              (v, j) => when(v >= 0, pow(lit(2.0), j).cast("long")).otherwise(lit(0L))),
            lit(0L), (a, b) => a + b).as("simhash32"))
    }

    // variant C: chunks bound once per token (nested transform), bit ops in fold
    def simC: DataFrame = {
      val chunkArrs = transform(transform(toks, t => md5(t)),
        h => transform(sequence(lit(0), lit(3)),
          c => conv(h.substr(c * 8 + 1, lit(8)), 16, 10).cast("long")))
      val votes = aggregate(
        chunkArrs,
        array_repeat(lit(0), 32),
        (acc, ch) => zip_with(acc, sequence(lit(0), lit(31)),
          (a, j) => a +
            (floor(element_at(ch, (j / 8).cast("int") + 1) /
              pow(lit(2.0), lit(31) - (j % 8) * 4)) % 2).cast("int") * 2 - 1))
      docs.where(size(toks) > 0)
        .select(col("doc_id"),
          aggregate(
            zip_with(votes, sequence(lit(0), lit(31)),
              (v, j) => when(v >= 0, pow(lit(2.0), j).cast("long")).otherwise(lit(0L))),
            lit(0L), (a, b) => a + b).as("simhash32"))
    }

    // variant D: per-token packed mask via chunk array, votes from mask bits
    def simD: DataFrame = {
      val masks = transform(
        transform(transform(toks, t => md5(t)),
          h => transform(sequence(lit(0), lit(3)),
            c => conv(h.substr(c * 8 + 1, lit(8)), 16, 10).cast("long"))),
        ch => aggregate(sequence(lit(0), lit(31)), lit(0L),
          (acc, j) => acc +
            (floor(element_at(ch, (j / 8).cast("int") + 1) /
              pow(lit(2.0), lit(31) - (j % 8) * 4)) % 2).cast("long") *
              pow(lit(2.0), j).cast("long")))
      val votes = aggregate(
        masks,
        array_repeat(lit(0), 32),
        (acc, m) => zip_with(acc, sequence(lit(0), lit(31)),
          (a, j) => a + (floor(m / pow(lit(2.0), j)) % 2).cast("int") * 2 - 1))
      docs.where(size(toks) > 0)
        .select(col("doc_id"),
          aggregate(
            zip_with(votes, sequence(lit(0), lit(31)),
              (v, j) => when(v >= 0, pow(lit(2.0), j).cast("long")).otherwise(lit(0L))),
            lit(0L), (a, b) => a + b).as("simhash32"))
    }

    // variant E: explode + codegen'd declarative aggregation (1 row/token,
    // map-side partials; bit j set iff 2*cnt_j >= T)
    def simE: DataFrame = {
      val ex = docs.select(col("doc_id"), explode(toks).as("tok"))
        .select(col("doc_id"), md5(col("tok")).as("h"))
      val cnts = (0 until 32).map(j =>
        sum(when(substring(col("h"), j + 1, 1) >= "8", 1L).otherwise(0L)).as(s"c$j"))
      val agg = ex.groupBy("doc_id").agg(cnts.head, cnts.tail: _*)
        .withColumn("tt", Seq.empty[Int].foldLeft(lit(0L))((a, _) => a)) // placeholder
      val aggT = ex.groupBy("doc_id")
        .agg((cnts :+ count(lit(1L)).as("tt")).head,
          (cnts :+ count(lit(1L)).as("tt")).tail: _*)
      val packed = (0 until 32).map(j =>
        when(col(s"c$j") * 2 >= col("tt"), lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
      aggT.select(col("doc_id"), packed.as("simhash32"))
    }

    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      t("simA-isin")(noop(simA))
      t("simE-explode-agg")(noop(simE))
    }
    // equality check
    val a = simA.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val e = simE.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"PROBE equal A==E: ${a.sameElements(e)}")
    spark.stop()
  }
}
