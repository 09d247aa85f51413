package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deletes — the liveDocs of this engine (reference applies
  * per-segment liveDocs on every postings enum,
  * /root/reference/core/search/term.go:132, core/index/bufferedDeletes.go).
  *
  * The index stays append-only: a delete is one row in `<index>/deletes/`
  * (parquet, append mode). Searchers fold the delete set into the range
  * evaluator as a sorted-docId broadcast, so deleted docs vanish from
  * matches AND totalHits on every path (driver-local and distributed) with
  * zero change to postings. Lucene semantics: collection/term statistics
  * still count deleted docs until a rewrite reclaims them.
  *
  * Scale note: the broadcast holds 8 B/deleted-doc (10M deletes = 80 MB —
  * beyond that, compact the index instead: filter+rebuild is one bounded
  * Spark job, and training-data pipelines delete in bulk, not per-doc).
  */
object Deletes {

  def append(spark: SparkSession, indexPath: String, docIds: DataFrame): Unit =
    docIds.select(col(docIds.columns.head).cast("long").as("docId"))
      .write.mode("append").parquet(s"$indexPath/deletes")

  def append(spark: SparkSession, indexPath: String, docIds: Seq[Long]): Unit = {
    import spark.implicits._
    append(spark, indexPath, docIds.toDF("docId"))
  }

  /** Sorted distinct deleted docIds; empty when no deletes exist. */
  def load(spark: SparkSession, indexPath: String): Array[Long] = {
    val p = new Path(s"$indexPath/deletes")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Array.emptyLongArray
    import spark.implicits._
    spark.read.parquet(p.toString).select("docId").as[Long]
      .distinct().collect().sorted
  }
}
