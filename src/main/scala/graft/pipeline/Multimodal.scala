package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. The Spark-side machinery (schema,
  * partitioning, batched per-partition decode, metadata extraction) is real
  * and tested; the actual media decode is STUBBED behind
  * [[MediaDecoder.decode]] (a deterministic fake — the codec libraries are
  * not in this container) and clearly marked for substitution.
  */
object Multimodal {

  /** Typed metadata produced by a (stub) decoder. */
  final case class MediaMeta(
      id: Long,
      nBytes: Long,
      sha256: String,
      format: String,
      width: Int,
      height: Int,
      nFrames: Int)

  /** Blob-table shape: any id + binary payload. Here synthesized from text
    * (UTF-8 bytes) as the stand-in payload.
    */
  def toBlobTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("blob"))

  /** Declarative metadata extraction (no decode needed): byte length +
    * digest, fully codegen'd — the cheap first pass of a media pipeline.
    */
  def blobStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(textCol)).cast("long").as("n_bytes"),
      sha2(col(textCol).cast("binary"), 256).as("sha256"))

  /** Batched per-partition decode: the Scala analogue of `mapInPandas` —
    * one decoder instance per partition, amortized over its rows (the shape
    * a real libjpeg/ffmpeg binding needs). Deterministic fake decode.
    */
  def decodeBlobs(spark: SparkSession, blobs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs.select("id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = new MediaDecoder // per-partition init (native handles etc.)
        it.map { case (id, blob) => decoder.decode(id, blob) }
      }
  }

  /** Frame sampling stub: pick k evenly spaced byte offsets (stand-in for
    * video frame extraction); shows the array-output plumbing.
    */
  def sampleFrames(df: DataFrame, idCol: String, textCol: String, k: Int = 5): DataFrame =
    df.select(
      col(idCol),
      concat_ws(",",
        transform(sequence(lit(0), lit(k - 1)),
          i => i * floor(octet_length(col(textCol)) / k))).as("frame_offsets"))

  /** Resize PLANNING over decoded metadata: aspect-preserving fit into a
    * target box — floor(dim × min(tw/w, th/h)). This geometry is the real
    * operator (exact, tested); only the per-pixel resample lives in the
    * binding a production deployment supplies.
    */
  def resizePlan(spark: SparkSession, blobs: DataFrame,
      targetW: Int = 224, targetH: Int = 224): DataFrame =
    decodeBlobs(spark, blobs).toDF()
      .withColumn("scale",
        least(lit(targetW.toDouble) / col("width"), lit(targetH.toDouble) / col("height")))
      .select(col("id"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("int").as("out_w"),
        floor(col("height") * col("scale")).cast("int").as("out_h"))

  /** Feature-extraction stub with the real inference BATCH SHAPE: one
    * "model" instance per partition (the mapInPandas analogue — amortized
    * model init, row batches through it), fixed-dim output per blob. The
    * fake embedding derives from the content digest (deterministic, the SQL
    * oracle reproduces it); a real vision/audio model slots into the same
    * mapPartitions body.
    */
  def extractFeatures(spark: SparkSession, blobs: DataFrame): DataFrame = {
    import spark.implicits._
    blobs.select("id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val model = new MediaDecoder // per-partition model init
        it.map { case (id, blob) =>
          val sha = model.decode(id, blob).sha256
          def f(i: Int): Double = sha.charAt(i - 1).toInt / 255.0
          (id, f(1), f(2), f(3), f(4), f(5), f(6), f(7), f(8))
        }
      }
      .toDF("id", "f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7")
  }
}

/** STUB media decoder. Replace `decode` with a real binding (libjpeg /
  * libsndfile / ffmpeg) in production; everything around it — batching,
  * schema, partitioning — is the real pipeline.
  */
final class MediaDecoder extends Serializable {
  import Multimodal.MediaMeta

  def decode(id: Long, blob: Array[Byte]): MediaMeta = {
    // ??? <- real decode goes here; deterministic fake below keeps the
    // pipeline testable without media libraries in the container.
    val sha = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      d.digest(blob).map("%02x".format(_)).mkString
    }
    // ascii-derived fake header fields (reproducible by the SQL oracle)
    def c(i: Int): Int = sha.charAt(i - 1).toInt
    MediaMeta(
      id = id,
      nBytes = blob.length.toLong,
      sha256 = sha,
      format = Seq("jpeg", "png", "wav", "mp4")(c(1) % 4),
      width = 64 + (c(2) % 8) * 16,
      height = 64 + (c(3) % 8) * 16,
      nFrames = 1 + (c(4) % 30))
  }
}
