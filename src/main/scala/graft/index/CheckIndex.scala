package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.codec.PostingsCodec

/** Offline index validator (reference CheckIndex,
  * /root/reference/core/index/checkIndex.go:17-509): recomputes doc/term
  * counts and stats from the raw postings and cross-checks the published
  * manifest/terms/fieldstats — the "doc-count/term-count metrics" leg of the
  * north-star checkpoint story.
  */
object CheckIndex {
  final case class Report(
      maxDoc: Long,
      docCount: Long,
      termCount: Long,
      sumDocFreq: Long,
      sumTotalTermFreq: Long,
      postingRows: Long,
      problems: Seq[String]) {
    def ok: Boolean = problems.isEmpty
  }

  def run(spark: SparkSession, indexPath: String): Report = {
    import spark.implicits._
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]

    val manifest = IndexManifest.load(spark, indexPath)
    val docs = spark.read.parquet(s"$indexPath/docs")
    // format gate (advisor round-3 fix): a pre-fieldDls index must produce a
    // clean 'rebuild required' report, not an AnalysisException mid-run
    if (manifest.formatVersion < IndexManifest.CurrentFormat ||
        manifest.formatVersion > IndexManifest.FormatOffsets ||
        !docs.columns.contains("fieldDls"))
      return Report(0, 0, 0, 0, 0, 0, Seq(
        s"index format version ${manifest.formatVersion} outside supported " +
          s"[${IndexManifest.CurrentFormat}, ${IndexManifest.FormatOffsets}] " +
          s"(docs ${if (docs.columns.contains("fieldDls")) "have" else "LACK"} " +
          "per-field dls) — rebuild the index with the current builder"))
    val postings = spark.read.parquet(s"$indexPath/postings")
    val terms = spark.read.parquet(manifest.termsLocation)
    val stats = spark.read.parquet(manifest.statsLocation)

    val nDocs = docs.count()
    if (nDocs != manifest.maxDoc)
      problems += s"docs count $nDocs != manifest.maxDoc ${manifest.maxDoc}"
    val dupIds = docs.groupBy("docId").count().where(col("count") > 1).count()
    if (dupIds > 0) problems += s"$dupIds duplicate docIds"

    // decode-level invariants, distributed: every posting row re-decoded;
    // per-field sums kept so fieldstats verify FIELD BY FIELD (compensating
    // errors across fields must not cancel — advisor round-2 fix)
    val rowChecks = postings
      .select("field", "term", "rangeId", "firstDocId", "lastDocId", "docFreq", "ttf", "payload")
      .as[(String, String, Long, Long, Long, Int, Long, Array[Byte])]
      .map { case (field, term, rangeId, first, last, df, ttf, payload) =>
        val dec = PostingsCodec.decode(payload)
        var bad: String = null
        if (dec.length != df) bad = s"docFreq mismatch $field:$term@$rangeId"
        else if (dec.docIds.head != first || dec.docIds.last != last)
          bad = s"first/last docId mismatch $field:$term@$rangeId"
        else if (dec.freqs.map(_.toLong).sum != ttf) bad = s"ttf mismatch $field:$term@$rangeId"
        else {
          var i = 1
          while (bad == null && i < dec.length) {
            if (dec.docIds(i) <= dec.docIds(i - 1)) bad = s"unsorted docIds $field:$term@$rangeId"
            i += 1
          }
        }
        (field, if (bad == null) "" else bad, dec.length.toLong, dec.freqs.map(_.toLong).sum, 1L)
      }
      .toDF("field", "bad", "df", "ttf", "rows")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val agg = rowChecks
      .agg(
        sum(when(col("bad") =!= "", 1L).otherwise(0L)).as("badRows"),
        sum("df").as("sumDf"), sum("ttf").as("sumTtf"), sum("rows").as("rows"),
        max("bad").as("sampleBad"))
      .collect()(0)
    if (agg.getLong(0) > 0)
      problems += s"${agg.getLong(0)} bad posting rows (e.g. ${agg.getString(4)})"

    // terms dict vs postings aggregate (global)
    val t = terms.agg(sum("docFreq"), sum("totalTermFreq"), count(lit(1))).collect()(0)
    if (t.getLong(0) != agg.getLong(1))
      problems += s"terms.sumDocFreq ${t.getLong(0)} != postings ${agg.getLong(1)}"
    if (t.getLong(1) != agg.getLong(2))
      problems += s"terms.sumTtf ${t.getLong(1)} != postings ${agg.getLong(2)}"

    // published field stats vs PER-FIELD recomputation: sums from decoded
    // postings, termCount from the terms dict, docCount from the stored
    // per-field dls (docs with ≥1 token in that field)
    val perFieldPostings = rowChecks.groupBy("field")
      .agg(sum("df").as("pSumDf"), sum("ttf").as("pSumTtf"))
    val perFieldTerms = terms.groupBy("field").agg(count(lit(1)).as("pTermCount"))
    val perFieldDocs = docs
      .select(explode(col("fieldDls")).as(Seq("field", "fdl")))
      .where(col("fdl") > 0)
      .groupBy("field").agg(count(lit(1)).as("pDocCount"))
    val fieldRows = stats
      .join(perFieldPostings, Seq("field"), "full_outer")
      .join(perFieldTerms, Seq("field"), "full_outer")
      .join(perFieldDocs, Seq("field"), "full_outer")
      .collect()
    fieldRows.foreach { r =>
      val f = r.getAs[String]("field")
      def cmp(published: String, recomputed: String): Unit = {
        val p = if (r.isNullAt(r.fieldIndex(published))) -1L else r.getAs[Long](published)
        val c = if (r.isNullAt(r.fieldIndex(recomputed))) -1L else r.getAs[Long](recomputed)
        if (p != c) problems += s"fieldstats[$f].$published $p != recomputed $c"
      }
      cmp("sumTotalTermFreq", "pSumTtf")
      cmp("sumDocFreq", "pSumDf")
      cmp("termCount", "pTermCount")
      cmp("docCount", "pDocCount")
      if (r.isNullAt(r.fieldIndex("maxDoc")) || r.getAs[Long]("maxDoc") != nDocs)
        problems += s"fieldstats[$f].maxDoc stale"
    }
    rowChecks.unpersist()

    val docCount = stats.agg(max("docCount")).collect()(0).getLong(0)
    Report(nDocs, docCount, t.getLong(2), t.getLong(0), t.getLong(1),
      agg.getLong(3), problems.toSeq)
  }
}
