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

  private[pipeline] def dotD(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** round(cosine, 4) of two (vector, norm) column pairs — the ONE
    * expression shape every cosine operator and its SQL oracle share.
    */
  private[pipeline] def cosineCol(va: org.apache.spark.sql.Column, na: org.apache.spark.sql.Column,
      vb: org.apache.spark.sql.Column, nb: org.apache.spark.sql.Column) =
    round(dotD(va, vb) / (na * nb), 4)

  private[pipeline] def withNorm(df: DataFrame, idCol: String, vecCol: String) =
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

  /** Hyperplane component sign for (table, plane, dim): the high bit of
    * md5("t|p|i") — no RNG state, identical across executors/reruns, and
    * reproducible by the ANSI-SQL oracle (same trick as the dd_* operators).
    * Computed DRIVER-SIDE into literal arrays: the hashes are constants per
    * (t, p, i), so executors do a pure vectorized multiply instead of
    * dim×planes×tables md5 calls per row.
    */
  private[pipeline] def planeSigns(table: Int, plane: Int, dim: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      md.reset()
      val d = md.digest(s"$table|$plane|$i".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
    }
  }

  /** LSH bucket signature: p sign bits of projections onto the literal
    * hyperplanes (left-fold sum in element order — matches the SQL oracle's
    * list_reduce exactly).
    */
  private def lshKey(v: org.apache.spark.sql.Column, p: Int, table: Int, dim: Int) = {
    val bits = (0 until p).map { plane =>
      val proj = aggregate(
        zip_with(v, typedLit(planeSigns(table, plane, dim)), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0)) * lit(1 << plane)
    }
    bits.reduce(_ + _)
  }

  /** Appends the `tables`-element bucket-key array `bs` to a pre-normed
    * (id, v, nrm) projection — shared by [[bucketed]] and
    * Dedup.embeddingNearDupPairs (which bands ids WITHOUT the vector payload
    * so its candidate shuffle carries keys, not vectors).
    */
  private[pipeline] def withBucketArray(normed: DataFrame,
      planes: Int, tables: Int, dim: Int): DataFrame =
    normed.withColumn("bs",
      array((0 until tables).map(t => lshKey(col("v"), planes, t, dim)): _*))

  /** Embedding dimensionality probe (one tiny job; plans are per-dim). */
  private[pipeline] def dimOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).first().getInt(0)

  /** (table, bucket) rows for every vector: ONE scan computes all `tables`
    * bucket keys as an array, then posexplode — not `tables` unioned scans.
    */
  private[pipeline] def bucketed(df: DataFrame, idCol: String, vecCol: String,
      planes: Int, tables: Int) = {
    val dim = dimOf(df, vecCol)
    withBucketArray(withNorm(df, idCol, vecCol), planes, tables, dim)
      .select(col(idCol), col("v"), col("nrm"),
        posexplode(col("bs")).as(Seq("table", "bucket")))
  }

  /** LSH-bucketed cosine top-k: candidates share a bucket in ≥1 of
    * `tables` hash tables; exact cosine on candidates only. Shuffle volume
    * is bounded by bucket sizes (equi-join), never O(n²).
    */
  def lshCosineTopK(df: DataFrame, idCol: String, vecCol: String,
      queryMaxId: Long, k: Int, planes: Int = 8, tables: Int = 4): DataFrame = {
    // the bucketed projection feeds both join sides → persist (planes×tables
    // fold expressions are the cost, not the data volume)
    val b = bucketed(df, idCol, vecCol, planes, tables)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qq = b.where(col(idCol) < queryMaxId)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("table"), col("bucket"))
    val cc = b
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

  /** IVF (inverted-file) cosine top-k — the second scale path besides LSH:
    * a coarse quantizer partitions vectors into `numCentroids` lists; a
    * query probes only its `nprobe` closest lists, then exact cosine
    * re-ranks the candidates. Candidate volume is bounded by list sizes
    * (equi-join on the centroid id), never O(n).
    *
    * The quantizer here is FIXED and deterministic (centroids = the
    * `numCentroids` lowest-id vectors) so the whole operator is
    * reproducible by the ANSI-SQL oracle; swap in k-means centroids for
    * production recall — the Spark plumbing (broadcast centroids →
    * assignment → probe join → re-rank) is identical.
    */
  /** The oracle-stable FIXED quantizer: the numCentroids lowest-id vectors
    * as (cid, cv, cn) — ivfCosineTopK's default, also usable as an explicit
    * quantizer for [[writeIvfIndex]] so the persisted-index path stays
    * ANSI-SQL-reproducible (kmeansCentroids is the production swap).
    */
  def fixedCentroids(df: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int = 16): DataFrame =
    withNorm(df, idCol, vecCol).where(col(idCol) < numCentroids)
      .select(col(idCol).as("cid"), col("v").as("cv"), col("nrm").as("cn"))

  def ivfCosineTopK(df: DataFrame, idCol: String, vecCol: String,
      queryMaxId: Long, k: Int, numCentroids: Int = 16, nprobe: Int = 4,
      centroids: Option[DataFrame] = None): DataFrame = {
    val all = withNorm(df, idCol, vecCol)
    // trained quantizer when provided (kmeansCentroids — the production
    // path); the fixed lowest-id default stays for oracle reproducibility
    val cents = centroids.getOrElse(fixedCentroids(df, idCol, vecCol, numCentroids))
    // assignment: every vector → its closest centroid (broadcast: n×C
    // cosines, C small); ties break toward the smaller centroid id.
    // max_by over (ccos, -cid) is a partial aggregation — the shuffle
    // carries ONE row per vector, not the n×C expansion a window would
    // (same deterministic argmax as ORDER BY ccos DESC, cid ASC)
    val assigned = all.crossJoin(broadcast(cents))
      .withColumn("ccos", dotD(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .groupBy(col(idCol))
      .agg(
        max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc"))).as("cid"),
        first(col("v")).as("nv"), first(col("nrm")).as("nn"))
      .select(col(idCol).as("neighbor_id"), col("nv"), col("nn"), col("cid"))
    // probe: each query → its nprobe closest centroids
    val wProbe = Window.partitionBy("query_id").orderBy(col("ccos").desc, col("cid").asc)
    val probes = all.where(col(idCol) < queryMaxId)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", dotD(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("prank", row_number().over(wProbe))
      .where(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))
    // candidates = vectors in the probed lists; exact cosine re-rank
    val scored = probes.join(assigned, "cid")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dotD(col("qv"), col("nv")) / (col("qn") * col("nn")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
  }

  /** Deterministic spherical k-means (Lloyd's) for the IVF quantizer:
    * init = the k lowest-id vectors; assignment by cosine (broadcast
    * centroids, one shuffle per iteration carrying 1 row/vector); new
    * centroid = member mean. Per-dimension sums go through DECIMAL so the
    * result is independent of partitioning/aggregation order — two runs
    * yield bit-identical centroids. Only the k×dim centroid matrix touches
    * the driver (per iteration); all per-vector work stays distributed.
    * Returns (cid, cv, cn) ready for [[ivfCosineTopK]].
    */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, iters: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val all = withNorm(df, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Seq[(Long, Seq[Double])] = all.orderBy(col(idCol)).limit(k)
      .select(col(idCol), col("v")).as[(Long, Seq[Double])].collect()
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }.toSeq
    for (_ <- 1 to iters) {
      val centDf = cents.toDF("cid", "cv")
        .withColumn("cn", sqrt(dotD(col("cv"), col("cv"))))
      val assigned = all.crossJoin(broadcast(centDf))
        .withColumn("ccos", dotD(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .groupBy(col(idCol))
        .agg(max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc"))).as("cid"),
          first(col("v")).as("v"))
      val sums = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum(col("x").cast("decimal(38,18)")).as("sx"), count(lit(1)).as("m"))
        .collect()
      val byC = sums.groupBy(_.getLong(0))
      cents = cents.map { case (cid, prev) =>
        byC.get(cid) match {
          case Some(rows) =>
            val m = rows.head.getLong(3).toDouble
            (cid, rows.sortBy(_.getInt(1)).map(_.getDecimal(2).doubleValue() / m).toSeq)
          case None => (cid, prev) // empty cluster keeps its centroid
        }
      }
    }
    all.unpersist()
    cents.toDF("cid", "cv").withColumn("cn", sqrt(dotD(col("cv"), col("cv"))))
  }

  /** Measured recall@k of the IVF path vs the exact brute-force top-k, per
    * query — with either the fixed quantizer (oracle mode) or trained
    * centroids.
    */
  def ivfRecallAtK(df: DataFrame, idCol: String, vecCol: String,
      queryMaxId: Long, k: Int, numCentroids: Int = 16, nprobe: Int = 4,
      centroids: Option[DataFrame] = None): DataFrame = {
    val exact = cosineTopK(df, idCol, vecCol, queryMaxId, k)
      .select("query_id", "neighbor_id")
    val ivf = ivfCosineTopK(df, idCol, vecCol, queryMaxId, k, numCentroids, nprobe, centroids)
      .select(col("query_id"), col("neighbor_id").as("ivf_neighbor"))
    exact
      .join(ivf, exact("query_id") === ivf("query_id") &&
        exact("neighbor_id") === ivf("ivf_neighbor"), "left")
      .groupBy(exact("query_id").as("query_id"))
      .agg(round(count(col("ivf_neighbor")).cast("double") / lit(k.toDouble), 4).as("recall"))
  }

  /** Persist an IVF index: `<path>/centroids` (tiny) + `<path>/assignments`
    * PARTITIONED BY the coarse-quantizer cell `cid`. Query-time probes then
    * read only `nprobe` partitions per query — Spark partition pruning is
    * the inverted-file seek, so a 100 TB embedding corpus costs
    * O(corpus/numCentroids × nprobe) scan per query batch, never a full
    * scan. Centroids come from [[kmeansCentroids]] unless supplied.
    */
  def writeIvfIndex(df: DataFrame, idCol: String, vecCol: String, path: String,
      numCentroids: Int = 16, iters: Int = 5,
      centroids: Option[DataFrame] = None): Unit = {
    val cents = centroids.getOrElse(kmeansCentroids(df, idCol, vecCol, numCentroids, iters))
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    val all = withNorm(df, idCol, vecCol)
    val written = cents.sparkSession.read.parquet(s"$path/centroids")
    all.crossJoin(broadcast(written))
      .withColumn("ccos", dotD(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .groupBy(col(idCol))
      .agg(
        max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc"))).as("cid"),
        first(col("v")).as("nv"), first(col("nrm")).as("nn"))
      .select(col(idCol).as("neighbor_id"), col("nv"), col("nn"), col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/assignments")
  }

  /** Top-k over a persisted IVF index. The probed cells reach the
    * assignments scan as a `cid IN (...)` pushdown → partition pruning
    * reads only those directories.
    */
  def ivfIndexTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("ccos").desc, col("cid").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("ccos", dotD(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("prank", row_number().over(wProbe))
      .where(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))
      // localCheckpoint, NOT persist (advisor round-3 fix: the persisted
      // probes DF was never unpersisted and accumulated one cache entry per
      // query batch): the bounded probe set (queries × nprobe rows)
      // materializes eagerly and its blocks free with the DF reference
      .localCheckpoint(true)
    // collect ONLY the distinct probed cell ids (≤ queries × nprobe, tiny):
    // as an isin literal they prune assignment PARTITIONS at the source
    val cids = probes.select("cid").distinct().collect().map(_.getLong(0))
    val candidates = spark.read.parquet(s"$path/assignments")
      .where(col("cid").isin(cids: _*))
    val scored = probes.join(candidates, "cid")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dotD(col("qv"), col("nv")) / (col("qn") * col("nn")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
  }

  /** Measured recall@k of the LSH path vs the exact brute-force top-k, per
    * query — the accuracy/cost dial for tuning (planes, tables).
    */
  def lshRecallAtK(df: DataFrame, idCol: String, vecCol: String,
      queryMaxId: Long, k: Int, planes: Int = 8, tables: Int = 4): DataFrame = {
    val exact = cosineTopK(df, idCol, vecCol, queryMaxId, k)
      .select("query_id", "neighbor_id")
    val lsh = lshCosineTopK(df, idCol, vecCol, queryMaxId, k, planes, tables)
      .select(col("query_id"), col("neighbor_id").as("lsh_neighbor"))
    exact
      .join(lsh, exact("query_id") === lsh("query_id") &&
        exact("neighbor_id") === lsh("lsh_neighbor"), "left")
      .groupBy(exact("query_id").as("query_id"))
      .agg(round(count(col("lsh_neighbor")).cast("double") / lit(k.toDouble), 4).as("recall"))
  }
}
