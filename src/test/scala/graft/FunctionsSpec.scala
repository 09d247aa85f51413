package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Functions

class FunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("tokenize_code expression: DataFrame and SQL surfaces, explode-composable") {
    val df = Seq((1L, "The Quick Foo.bar(baz)"), (2L, "import io.spark_utils"))
      .toDF("id", "content")
    val out = df.select(col("id"),
      Functions.tokenizeCode(col("content")).as("toks"))
      .select(col("id"), explode(col("toks")).as("t"))
      .select(col("id"), col("t.term"), col("t.pos"))
      .as[(Long, String, Int)].collect().toSeq
    assert(out == Seq((1L, "quick", 1), (1L, "foo.bar", 2), (1L, "baz", 3),
      (2L, "import", 0), (2L, "io.spark_utils", 1)))

    Functions.register(spark)
    val sqlOut = df.createOrReplaceTempView("t")
    val viaSql = spark.sql(
      "SELECT id, tok.term FROM t LATERAL VIEW explode(tokenize_code(content)) x AS tok ORDER BY id, tok.pos")
      .as[(Long, String)].collect().toSeq
    assert(viaSql.map(_._2) == Seq("quick", "foo.bar", "baz", "import", "io.spark_utils"))
  }

  test("porter_stem expression: DataFrame and SQL surfaces match Porter.stem") {
    val words = Seq("caresses", "motoring", "happy", "relational", "merge", "sky")
    val df = words.toDF("w")
    val got = df.select(Functions.porterStem(col("w")).as("s")).as[String].collect().toSeq
    assert(got == words.map(graft.analysis.Porter.stem))
    Functions.register(spark)
    df.createOrReplaceTempView("pw")
    val viaSql = spark.sql("SELECT porter_stem(w) FROM pw").as[String].collect().toSeq
    assert(viaSql == words.map(graft.analysis.Porter.stem))
    // paper vectors through the expression (independent expected values)
    assert(df.where(col("w") === "caresses")
      .select(Functions.porterStem(col("w"))).as[String].head() == "caress")
  }

  test("bm25Score column arithmetic matches the exact scorer") {
    val df = Seq((3, 50, 100L), (1, 10, 5L)).toDF("freq", "dl", "df")
    val got = df.select(Functions.bm25Score(col("freq"), col("dl"), col("df"),
      lit(1000L), lit(100000L)).as("s")).as[Double].collect()
    val cs = graft.search.CollectionStats("content", 1000, 1000, 100000, 0)
    val exp = Seq(
      graft.search.Bm25.exactScorer(graft.search.TermStats("content", "t", 100, 0), cs).score(3.0, 50.0),
      graft.search.Bm25.exactScorer(graft.search.TermStats("content", "t", 5, 0), cs).score(1.0, 10.0))
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }
}
