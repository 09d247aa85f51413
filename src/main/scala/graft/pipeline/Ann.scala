package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - [[cosineTopK]]: exact brute force — the correctness baseline. The dot
  *    product is a codegen'd `aggregate(zip_with(...))` fold, no UDF. Query
  *    side is broadcast; cost O(|queries| × n).
  *  - [[lshCosineTopK]]: random-hyperplane LSH — the 100 TB path. Vectors
  *    hash into 2^p sign-pattern buckets via deterministic hyperplanes;
  *    candidates only meet within a bucket (equi-join, shuffle bounded by
  *    bucket sizes), then exact cosine re-ranks. Recall tunable by p and
  *    number of hash tables.
  */
object Ann {

  private def dotD(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def withNorm(df: DataFrame, idCol: String, vecCol: String) =
    df.select(
      col(idCol),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dotD(col("v"), col("v"))))

  /** Exact cosine top-k neighbors for each query id. */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
      queryMaxId: Long, k: Int): DataFrame = {
    val all = withNorm(df, idCol, vecCol)
    val q = all.where(col(idCol) < queryMaxId)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = all.select(col(idCol).as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    // broadcast the (small) QUERY side; the candidate corpus streams
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dotD(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
  }

  /** LSH bucket signature: p sign bits of projections onto deterministic
    * ±1 hyperplanes (components hashed from (table, plane, dim) — no RNG
    * state, identical across executors and reruns).
    */
  private def lshKey(v: org.apache.spark.sql.Column, p: Int, table: Int) = {
    val bits = (0 until p).map { plane =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * when(pmod(xxhash64(lit(table * 1000 + plane), i), lit(2)) === 0,
            lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0)) * lit(1 << plane)
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed cosine top-k: candidates share a bucket in ≥1 of
    * `tables` hash tables; exact cosine on candidates only.
    */
  def lshCosineTopK(df: DataFrame, idCol: String, vecCol: String,
      queryMaxId: Long, k: Int, planes: Int = 8, tables: Int = 4): DataFrame = {
    val all = withNorm(df, idCol, vecCol)
    val bucketed = (0 until tables).map { t =>
      all.select(col(idCol), col("v"), col("nrm"),
        lit(t).as("table"), lshKey(col("v"), planes, t).as("bucket"))
    }.reduce(_ unionAll _)
    val qq = bucketed.where(col(idCol) < queryMaxId)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("table"), col("bucket"))
    val cc = bucketed
      .select(col(idCol).as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"),
        col("table"), col("bucket"))
    val cands = qq.join(cc, Seq("table", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.withColumn("cosine",
      round(dotD(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
  }
}
