package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints formatted physical plans for the hot paths so scan pushdown /
  * column pruning / codegen coverage can be audited (the "explain and
  * iterate" loop). Usage: runMain graft.tools.ExplainAudit <indexPath> <sfDir>
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val indexPath = args.headOption.getOrElse("/tmp/vidx")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def audit(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    audit("postings scan, term pushdown + column pruning") {
      spark.read.parquet(s"$indexPath/postings")
        .where(col("field") === "content" && col("term").isin("merge", "sort"))
        .select("term", "rangeId", "firstDocId", "payload")
    }

    audit("postings metadata scan (WAND bounds: no payload columns)") {
      spark.read.parquet(s"$indexPath/postings")
        .where(col("term").isin("merge"))
        .select("term", "rangeId", "docFreq", "maxFreq", "minDl")
    }

    audit("multi-field pair predicate (OR of field=AND term-IN) pushdown") {
      // the searcher's pairPredicate shape for a fielded query
      spark.read.parquet(s"$indexPath/postings")
        .where((col("field") === "content" && col("term").isin("merge", "sort")) ||
          (col("field") === "lang" && col("term").isin("de")))
        .select("field", "term", "rangeId", "firstDocId", "payload")
    }

    audit("terms dict point lookup") {
      spark.read.parquet(graft.index.IndexManifest.load(spark, indexPath).termsLocation)
        .where(col("term") === "merge")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    audit("quality pipeline (codegen, no shuffle)") {
      graft.pipeline.TextOps.quality(docs, "text", "doc_id")
    }
    audit("exact dedup (single hash agg)") {
      graft.pipeline.Dedup.exactDupGroups(docs, "text", "doc_id")
    }
    audit("ann brute force (broadcast join)") {
      graft.pipeline.Ann.cosineTopK(
        spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", "embedding", 5L, 5)
    }
    spark.stop()
  }
}
