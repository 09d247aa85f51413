package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval via reciprocal-rank fusion (RRF —
  * Cormack & Clarke, SIGIR 2009: rrf(d) = Σ_lists 1/(k0 + rank_d)). The
  * modern serving pattern the reference predates entirely: BM25 answers
  * "contains these words", the embedding column answers "means this", and
  * rank fusion combines them without score calibration (ranks are
  * scale-free, so the two lists need no common score space).
  *
  * Scale shape: both inputs are bounded top-n RANKINGS, not corpus scans —
  * the lexical side is the searcher's distributed top-n (heap-merged
  * k-bounded collection), the vector side is a TakeOrdered top-n over one
  * broadcast-query cosine pass (swap in the IVF/LSH variants for the
  * partition-pruned serving path). The fuse itself joins two ≤n-row sets:
  * metadata-sized, never corpus-sized.
  */
object Hybrid {

  /** 1-based vector ranks: cosine of every corpus embedding against the
    * embedding of `queryId` (one broadcast row), ranked (round(cosine,4)
    * desc, id asc) — the shared cosine expression shape, so the SQL twin
    * reproduces ranks exactly. Top-n via TakeOrderedAndProject (no global
    * sort); the rank window then runs over ≤n surviving rows.
    */
  def vectorRanks(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, n: Int): DataFrame = {
    val all = Ann.withNorm(emb, idCol, vecCol)
    val q = all.where(col(idCol) === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val scored = all.select(col(idCol).as("doc_id"), col("v"), col("nrm"))
      .crossJoin(broadcast(q))
      .withColumn("cosine", Ann.cosineCol(col("qv"), col("qn"), col("v"), col("nrm")))
      .select(col("doc_id"), col("cosine"))
    scored.orderBy(col("cosine").desc, col("doc_id").asc).limit(n)
      // single-partition window is fine HERE: it ranks the n survivors of
      // the distributed top-n, never the corpus
      .withColumn("vrank", row_number()
        .over(Window.orderBy(col("cosine").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("vrank"))
  }

  /** Fuse a lexical ranking (docIds in rank order, from the searcher's
    * top-n) with a vector ranking (`(doc_id, vrank)`): full-outer join,
    * rrf = 1/(k0+lrank) + 1/(k0+vrank) with a missing list contributing 0
    * (lexical term added FIRST — the SQL twin mirrors the float64 order),
    * global top-k by (raw rrf desc, doc_id asc).
    */
  def rrfFuse(spark: SparkSession, lexRanked: Seq[Long], vecRanks: DataFrame,
      k0: Int, k: Int): DataFrame = {
    import spark.implicits._
    val lex = lexRanked.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
      .toDF("doc_id", "lrank")
    lex.join(vecRanks.select(col("doc_id"), col("vrank")), Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(k0.toDouble) + col("lrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0.toDouble) + col("vrank")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("rrf"), col("lrank"), col("vrank"))
  }
}
