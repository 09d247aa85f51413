package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.analysis.{Analyzer, SimpleAnalyzer, StandardCodeAnalyzer}
import graft.search._

/** SQL-native search surface: the engine's top-k as a DataSource V2 table,
  * so BM25 queries compose with plain Spark SQL —
  *
  * {{{
  * CREATE TEMPORARY VIEW hits
  * USING `graft-search`
  * OPTIONS (index '/idx', query '+import parser', k '20');
  * SELECT * FROM hits WHERE score > 1.5 ORDER BY score DESC LIMIT 5;
  * }}}
  *
  * or `spark.read.format("graft-search").option(...).load()`.
  *
  * Options: `index` (required), `query` (required, classic parser syntax),
  * `k` (default 10), `mode` (`ref32`|`exact`), `field` (default field,
  * default `content`), `keywordFields` (comma-separated, for `field:value`
  * routing), `analyzer` (`standard`|`simple`), `wand` (`true` to prune).
  *
  * Catalyst integration: `LIMIT n` pushes down into `k`
  * (SupportsPushDownLimit) — `SELECT * FROM hits LIMIT 3` evaluates a k=3
  * search, not k=10 truncated. The search itself is a driver-coordinated
  * distributed job (planInputPartitions runs on the driver); the bounded
  * top-k result ships to executors as one InputPartition.
  */
class GraftSearchSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-search"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSearchTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftSearchTable(new CaseInsensitiveStringMap(properties))
}

object GraftSearchTable {
  val Schema: StructType = StructType(Seq(
    StructField("docId", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  // searchers are expensive to warm (manifest + stats cache) → share per
  // (index, field, freshness) across queries in this JVM. The freshness
  // token folds in commit.json's mtime/len and the deletes dir listing, so
  // a publish (streaming append, rebuild) or a delete after the first query
  // is picked up by the next one instead of silently serving stale results.
  private val searchers =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), IndexSearcher]

  private def freshness(spark: SparkSession, index: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val c = new org.apache.hadoop.fs.Path(s"$index/commit.json")
    val fs = c.getFileSystem(conf)
    val cTok =
      if (fs.exists(c)) { val st = fs.getFileStatus(c); s"${st.getModificationTime}:${st.getLen}" }
      else "nocommit"
    val d = new org.apache.hadoop.fs.Path(s"$index/deletes")
    val dTok =
      if (fs.exists(d))
        fs.listStatus(d).map(s => s"${s.getPath.getName}:${s.getLen}")
          .sorted.mkString("|").hashCode.toString
      else "nodel"
    s"$cTok/$dTok"
  }

  private[sources] def searcher(index: String, field: String): IndexSearcher = {
    val spark = SparkSession.active
    searchers.getOrElseUpdate((index, field, freshness(spark, index)),
      new IndexSearcher(spark, index, field))
  }
}

final class GraftSearchTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-search(${options.get("index")}, '${options.get("query")}')"
  override def schema(): StructType = GraftSearchTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveStringMap: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(options)
}

final class GraftScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownLimit {
  private var limit: Int = -1
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def build(): Scan = new GraftScan(options, limit)
}

final class GraftScan(options: CaseInsensitiveStringMap, limit: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = GraftSearchTable.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val index = options.get("index")
    val queryStr = options.get("query")
    require(index != null && queryStr != null,
      "graft-search requires OPTIONS (index '...', query '...')")
    val field = options.getOrDefault("field", "content")
    val k0 = options.getInt("k", 10)
    val k = if (limit >= 0) math.min(k0, limit) else k0
    val mode = options.getOrDefault("mode", "ref32").toLowerCase match {
      case "exact" | "exactdouble" => ScoreMode.ExactDouble
      case _ => ScoreMode.Ref32
    }
    val analyzer: Analyzer = options.getOrDefault("analyzer", "standard").toLowerCase match {
      case "simple" => new SimpleAnalyzer(Analyzer.EnglishStopWords)
      case _ => new StandardCodeAnalyzer()
    }
    val kw = Option(options.get("keywordFields"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty[String])
    val q = new QueryParser(analyzer, field, kw).parse(queryStr)
    val searcher = GraftSearchTable.searcher(index, field)
    val top =
      if (options.getBoolean("wand", false)) Wand.searchTopK(searcher, q, k, mode)
      else searcher.search(q, k, mode)
    Array(GraftResultPartition(top.scoreDocs.map(d => (d.docId, d.score))))
  }

  override def createReaderFactory(): PartitionReaderFactory = GraftReaderFactory
}

final case class GraftResultPartition(rows: Array[(Long, Double)]) extends InputPartition

object GraftReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = partition.asInstanceOf[GraftResultPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = InternalRow(rows(i)._1, rows(i)._2)
      override def close(): Unit = ()
    }
}
