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
