package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication with keyed state: across all micro-batches,
  * emit each distinct content exactly once (the first-seen row; within a
  * batch, the lowest id wins). The `flatMapGroupsWithState` state per
  * content digest is ONE boolean — 16-byte keys + negligible state, so the
  * state store stays bounded by the number of DISTINCT contents, not rows.
  *
  * This is the streaming twin of [[graft.pipeline.Dedup.exactDupGroups]]:
  * a training-data ingest can dedupe continuously instead of re-scanning
  * the corpus. (Spark's built-in `dropDuplicates` needs a watermark to
  * bound state and then forgets; this keeps digests forever by design —
  * pair with a TTL timeout if the stream is unbounded in content.)
  */
object StreamingDedup {

  final case class Doc(id: Long, text: String)
  final case class Keyed(digest: String, id: Long, text: String)

  /** first-seen filter over a STREAMING DataFrame with (idCol, textCol). */
  def firstSeen(stream: DataFrame, textCol: String, idCol: String): Dataset[Doc] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(md5(col(textCol)).as("digest"), col(idCol).cast("long").as("id"),
        col(textCol).as("text"))
      .as[Keyed]
      .groupByKey(_.digest)
      .flatMapGroupsWithState[Boolean, Doc](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.minBy(_.id)
            Iterator.single(Doc(first.id, first.text))
          }
      }
  }
}
