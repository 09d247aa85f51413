package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All ops are pure Catalyst column expressions (whole-stage-codegen'd, no
  * UDFs, no shuffles except where aggregation is inherent) and use the
  * SQL-portable tokenization `filter(split(lower(text), '[^a-z0-9]+'), x <> '')`
  * so an ANSI-SQL oracle can reproduce every output bit-for-bit.
  */
object TextOps {

  /** Engine-agnostic 4-dp half-up rounding for small-integer RATIO columns:
    * floor(x·10⁴ + 0.5)/10⁴. Spark round() and DuckDB round() disagree on
    * doubles sitting exactly on a .xxxx5 decimal boundary (measured:
    * quality (23/48)·(45/48)·0.96 = 0.43124999999999997 → Spark 0.4312,
    * DuckDB 0.4313); ratios of small integers hit such boundaries, so both
    * sides must run the IDENTICAL float64 ops. SQL twin:
    * `floor(x * 10000 + 0.5) / 10000`. Non-negative inputs only.
    */
  def r4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** Lowercased alnum tokens of a string column. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), x => x =!= lit(""))

  val StopList: Seq[String] = graft.analysis.Analyzer.EnglishStopWords.toSeq.sorted

  /** CommonGrams analysis stats per doc: total emitted tokens (unigrams +
    * grams) and gram count, running the REAL [[graft.analysis.CommonGramsAnalyzer]]
    * over a SimpleAnalyzer base — driver-verifiable because the gram rule
    * (prev or cur ∈ common words, over adjacent token pairs) is expressible
    * in ANSI SQL on the same regexp tokenization.
    */
  def commonGramStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val analyzer = new graft.analysis.CommonGramsAnalyzer(
      new graft.analysis.SimpleAnalyzer(), graft.analysis.Analyzer.EnglishStopWords)
    val aB = spark.sparkContext.broadcast(analyzer)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val a = aB.value
        it.map { case (id, t) =>
          val r = a(t)
          (id, r.length.toLong, r.numOverlap.toLong)
        }
      }
      .toDF(idCol, "n_tokens", "n_grams")
  }

  /** 8-hex-digit threshold for a sampling weight: the first 8 md5 hex chars
    * of the id are a uniform 32-bit draw (identical in ANSI SQL), and
    * lowercase-hex string order == numeric order, so `hexDraw < threshold`
    * keeps exactly a `w` fraction deterministically. w ≥ 1 → "g" (above any
    * hex string — keep all); w ≤ 0 → "00000000" (keep none).
    */
  def sampleThreshold(w: Double): String =
    if (w >= 1.0) "g"
    else {
      // w just below 1.0 can ROUND to 2^32, which formats as 9 hex chars and
      // breaks the lexicographic comparison (advisor round-4 fix) — a
      // rounded-up full range means keep-all, same as w >= 1
      val r = math.max(0L, (w * 4294967296.0).round)
      if (r >= 4294967296L) "g" else f"$r%08x"
    }

  /** DETERMINISTIC stratified sampling — the data-mixing primitive of a
    * training pipeline (per-source/per-language mixture weights). A pure
    * row-local filter: no shuffle, no RNG state, reproducible across runs
    * and cluster sizes, and the kept set is STABLE under corpus growth
    * (a doc's fate depends only on its own id). Keep fraction =
    * `weights(stratum)` (else `default`).
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      weights: Map[String, Double], default: Double = 0.0): DataFrame = {
    val thresh = weights.toSeq.sortBy(_._1).foldLeft(lit(sampleThreshold(default))) {
      case (acc, (s, w)) => when(col(stratumCol) === s, lit(sampleThreshold(w))).otherwise(acc)
    }
    df.where(substring(md5(col(idCol).cast("string")), 1, 8) < thresh)
  }

  /** Greedy-by-order SEQUENCE PACKING for training-context assembly: docs
    * (in id order within each `partitionCol` group) are laid end-to-end and
    * cut into bins of ~`capacity` tokens; bin id = floor(startOffset /
    * capacity) — the streaming-pack approximation (a straddling doc joins
    * the bin its first token falls in, so bins can exceed capacity by at
    * most one doc's tail). Pure window arithmetic, ANSI-SQL-reproducible.
    *
    * Scale: the running sum is windowed PER `partitionCol` group — at corpus
    * scale pack within (source, shard) so no group exceeds one executor's
    * sort. `partitionCol` has NO permissive default (same discipline as
    * ngramJaccardPairs' explicit maxId): a bare global window would be a
    * single-task sort of the whole corpus; pass None only for explicitly
    * small scopes.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      capacity: Int, partitionCol: Option[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("pack_group").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tokens"),
        partitionCol.map(col).getOrElse(lit(0)).as("pack_group"))
      .withColumn("start_off", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("bin_id", floor(col("start_off") / lit(capacity.toDouble)).cast("long"))
      .select(col(idCol), col("n_tokens"), col("bin_id"))
  }

  /** Token counting: whitespace-ish tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation marks).
    */
  def tokenCounts(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_tokens"),
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .cast("long").as("n_bpeish"))

  /** Quality scoring: length, lexical diversity, stopword ratio, mean token
    * length, and a composite score — deterministic arithmetic, double +
    * round(4) so the oracle matches.
    */
  def quality(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks).cast("double")
    val nDistinct = size(array_distinct(toks)).cast("double")
    val nStop = size(filter(toks, t => t.isInCollection(StopList))).cast("double")
    val sumLen = aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double")
    df.select(
      col(idCol),
      n.cast("long").as("n_tokens"),
      nDistinct.cast("long").as("n_distinct"),
      r4(nStop / n).as("stop_ratio"),
      r4(sumLen / n).as("avg_token_len"),
      // composite: diversity * (1 - stopiness) * saturating length factor
      r4((nDistinct / n) * (lit(1.0) - nStop / n) * least(lit(1.0), n / lit(50.0)))
        .as("quality"))
      .where(col("n_tokens") > 0)
  }

  /** Marker lists for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "a", "in", "it"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "y", "una", "que"))

  /** Language-ID heuristic: CJK-charset short-circuit, else argmax of
    * per-language marker-token counts with a fixed tie order (en>de>fr>es).
    */
  def langId(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scores = LangMarkers.map { case (l, ms) =>
      l -> size(filter(toks, t => t.isInCollection(ms))).cast("long")
    }
    val Seq(en, de, fr, es) = scores.map(_._2)
    val pred = when(col(textCol).rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
    df.select(col(idCol), pred.as("pred_lang"))
  }

  /** Document fingerprint (Solr-style): md5 of the sorted distinct token
    * set — collapses near-identical bag-of-words docs for dedup.
    */
  def fingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      md5(concat_ws(" ", array_sort(array_distinct(tokens(col(textCol)))))).as("fingerprint"))
}
