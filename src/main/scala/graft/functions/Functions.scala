package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSessionExtensions

import graft.analysis.StandardCodeAnalyzer

/** Native Catalyst expression for the StandardAnalyzer-equivalent tokenizer
  * (SURVEY §2.1 "UDF surface mapping"): `tokenize_code(text)` returns
  * `array<struct<term:string,pos:int>>` — composes with `explode`/`posexplode`
  * (the Generator path) without UDF row ser/de. Evaluation is interpreted
  * (CodegenFallback): the tokenizer is a String→Array kernel; surrounding
  * operators stay in whole-stage codegen.
  */
case class TokenizeCode(child: Expression) extends UnaryExpression with CodegenFallback {
  @transient private lazy val analyzer = new StandardCodeAnalyzer()

  override def dataType: DataType = TokenizeCode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "tokenize_code"

  override def nullSafeEval(input: Any): Any = {
    val a = analyzer(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(a.tokens.map { t =>
      InternalRow(UTF8String.fromString(t.term), t.pos)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeCode =
    copy(child = newChild)
}

object TokenizeCode {
  val schema: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
}

/** Native Catalyst expression for the Porter stemmer: `porter_stem(term)` —
  * a pure String→String kernel (interpreted body, CodegenFallback;
  * surrounding operators stay in whole-stage codegen), replacing the Scala
  * UDF row ser/de on the stemming pipeline path.
  */
case class PorterStem(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "porter_stem"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.analysis.Porter.stem(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): PorterStem =
    copy(child = newChild)
}

/** Column-level function surface. BM25 is pure `functions._` arithmetic —
  * fully whole-stage-codegen'd, no UDF, no custom expression needed
  * (SURVEY §2.5 "optionally exposed as a registered function").
  */
object Functions {

  def tokenizeCode(text: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      TokenizeCode(org.apache.spark.sql.GraftShims.expression(text)))

  def porterStem(term: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      PorterStem(org.apache.spark.sql.GraftShims.expression(term)))

  /** BM25 (k1=1.2, b=0.75) from per-doc freq/dl and per-term df plus
    * collection stats — float64 (the engine's SQL-oracle mode).
    */
  def bm25Score(freq: Column, dl: Column, docFreq: Column, maxDoc: Column,
      sumTotalTermFreq: Column, k1: Double = 1.2, b: Double = 0.75): Column = {
    val idf = log(lit(1.0) + (maxDoc.cast("double") - docFreq.cast("double") + lit(0.5)) /
      (docFreq.cast("double") + lit(0.5)))
    val avgdl = sumTotalTermFreq.cast("double") / maxDoc.cast("double")
    idf * ((freq.cast("double") * lit(k1 + 1)) /
      (freq.cast("double") + lit(k1) * (lit(1 - b) + (lit(b) * dl.cast("double")) / avgdl)))
  }

  /** Register SQL names on an existing session (alternative to the
    * extensions path for spark-shell use): `SELECT tokenize_code(content)`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize_code", (children: Seq[Expression]) => TokenizeCode(children.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "porter_stem", (children: Seq[Expression]) => PorterStem(children.head), "scala_udf")
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` wiring:
  * injects the engine's SQL functions at session build (SURVEY §4.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("tokenize_code"),
      new ExpressionInfo(classOf[TokenizeCode].getName, "tokenize_code"),
      (children: Seq[Expression]) => TokenizeCode(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("porter_stem"),
      new ExpressionInfo(classOf[PorterStem].getName, "porter_stem"),
      (children: Seq[Expression]) => PorterStem(children.head)))
  }
}
