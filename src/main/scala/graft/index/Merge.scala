package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.codec.{PostingEntry, PostingsCodec}

/** Tiered merge over build waves.
  *
  * Policy: the budget math of the reference's TieredMergePolicy
  * (/root/reference/core/index/merge.go:355-380,496-643 — segsPerTier=10,
  * maxMergeAtOnce=10, 2MB size floor, tiers by log_mergeFactor of size): when
  * a tier holds more than segsPerTier members, its smallest maxMergeAtOnce
  * members merge into one. The reference's merge *execution* is a stub
  * (writer.go:1420-1422 panics), so execution here is designed from scratch
  * per the north star: a salted-shuffle merge — the shuffle key
  * (field, term, rangeId) carries the deterministic range salt assigned at
  * build time, so a hot term's postings (df ≈ N) merge as many independent
  * bounded groups instead of one multi-GB group, and no executor ever
  * materializes a full hot-term posting list.
  *
  * Invariant (property-tested): merge(build waves) ≡ build(union of docs) on
  * decoded postings and stats.
  */
object TieredMerge {
  /** Merge output waves live in their own namespace, disjoint from batch
    * waves (0..nWaves) AND streaming waves (StreamingIndexer.StreamingWaveBase
    * + batchId): a merged wave numbered max+1 in the shared space would be
    * overwritten by the next streaming micro-batch (mode=overwrite), silently
    * dropping every retired wave's postings.
    */
  val MergeWaveBase = 1000000

  final case class WaveInfo(wave: Int, bytes: Long, path: String)

  /** (mergedInto → sources) pairs from the merges_N.json logs. */
  def mergeLog(spark: SparkSession, indexPath: String): Map[Int, Seq[Int]] = {
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Map.empty
    fs.listStatus(root).toSeq
      .filter(s => s.getPath.getName.startsWith("merges_") && s.getPath.getName.endsWith(".json"))
      .flatMap { s =>
        val in = fs.open(s.getPath)
        val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
        for {
          into <- """"into":(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
          merged <- """"merged":\[([0-9,]*)\]""".r.findFirstMatchIn(txt)
            .map(_.group(1).split(',').filter(_.nonEmpty).map(_.toInt).toSeq)
        } yield into -> merged
      }
      .toMap
  }

  /** Waves retired by past merges: build resume must NOT re-invert segments
    * whose wave was folded into a merged wave — the postings already live
    * there.
    */
  def retiredWaves(spark: SparkSession, indexPath: String): Set[Int] =
    mergeLog(spark, indexPath).values.flatten.toSet

  /** Waves in GENERATIONAL (arrival) order: a merged wave sorts at its
    * OLDEST source's position, resolved transitively from the merge logs.
    * LogMergePolicy's positional selection assumes this order — raw wave
    * numbers would sort merged waves (≥ MergeWaveBase) after newer
    * streaming waves, repeatedly re-merging the big merged wave with
    * handfuls of fresh tiny ones (quadratic write amplification).
    */
  def wavesByAge(spark: SparkSession, indexPath: String): Seq[WaveInfo] = {
    val ws = waves(spark, indexPath)
    val logs = mergeLog(spark, indexPath)
    def oldest(w: Int, depth: Int): Double = logs.get(w) match {
      case Some(srcs) if srcs.nonEmpty && depth < 64 => srcs.map(oldest(_, depth + 1)).min
      case _ => w.toDouble
    }
    ws.sortBy(w => oldest(w.wave, 0))
  }

  /** Live waves. Two-phase-commit discipline (the merges_N.json log is the
    * commit point of a merge):
    *  - a wave listed as `merged` in any log is DEAD even if its dir still
    *    exists (crash after log write, before source deletion) — its postings
    *    live in the merged wave; reading both would double df/freq/scores;
    *  - a merge-numbered wave (≥ MergeWaveBase) with NO log is an UNCOMMITTED
    *    merge output (crash after the merged wave's _SUCCESS, before the log)
    *    — its sources are still live, so reading it would double postings.
    * Both kinds of leftover are deleted here on load, restoring the invariant
    * that the postings dir holds exactly the committed wave set.
    */
  def waves(spark: SparkSession, indexPath: String): Seq[WaveInfo] = {
    val root = new Path(s"$indexPath/postings")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val logs = mergeLog(spark, indexPath)
    val retired = logs.values.flatten.toSet
    val committedMerges = logs.keySet
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("wave="))
      .flatMap { s =>
        val w = s.getPath.getName.stripPrefix("wave=").toInt
        val dead = retired.contains(w) ||
          (w >= MergeWaveBase && !committedMerges.contains(w))
        if (dead) {
          fs.delete(s.getPath, true)
          val partial = new Path(s"$indexPath/termsPartial/wave=$w")
          if (fs.exists(partial)) fs.delete(partial, true)
          None
        } else {
          val size = fs.getContentSummary(s.getPath).getLength
          Some(WaveInfo(w, size, s.getPath.toString))
        }
      }
      .sortBy(_.wave)
  }

  /** Reference budget math, reduced to the append-only case. */
  def plan(segs: Seq[WaveInfo], segsPerTier: Int = 10, maxMergeAtOnce: Int = 10,
      floorBytes: Long = 2L << 20, maxMergedBytes: Long = 5L << 30): Seq[Seq[WaveInfo]] = {
    // tier = floor(log_10(max(size, floor)))  (mergeFactor-base log buckets)
    def tier(b: Long): Int =
      math.floor(math.log10(math.max(b, floorBytes).toDouble)).toInt
    segs.groupBy(s => tier(s.bytes)).values.toSeq.flatMap { members =>
      if (members.size <= segsPerTier) Nil
      else {
        val sorted = members.sortBy(_.bytes)
        val cand = sorted.take(maxMergeAtOnce)
        if (cand.map(_.bytes).sum > maxMergedBytes) Nil else Seq(cand)
      }
    }
  }

  /** LogByteSizeMergePolicy budget math (reference merge.go:680-996:
    * LEVEL_LOG_SPAN=0.75, mergeFactor=10): level = ln(bytes)/ln(mergeFactor)
    * floored at the min-size level; scanning left-to-right (waves keep
    * arrival order), each level window spans LOG_SPAN below the remaining
    * max level, and windows merge ADJACENT groups of `mergeFactor` members —
    * unlike tiered, selection is positional, never by size rank. Segments
    * at or above `maxMergeBytes` never merge.
    */
  def planLog(segs: Seq[WaveInfo], mergeFactor: Int = 10,
      minMergeBytes: Long = 2L << 20, maxMergeBytes: Long = 5L << 30): Seq[Seq[WaveInfo]] = {
    if (segs.size < mergeFactor) return Nil
    val norm = math.log(mergeFactor.toDouble)
    val levelFloor = math.log(minMergeBytes.toDouble) / norm
    val levels = segs.map(s =>
      math.max(math.log(math.max(s.bytes, 1L).toDouble) / norm, levelFloor)).toArray
    val out = Seq.newBuilder[Seq[WaveInfo]]
    var start = 0
    while (start < segs.length) {
      val maxLevel = levels.drop(start).max
      val levelBottom =
        if (maxLevel <= levelFloor) -1.0
        else math.max(maxLevel - 0.75, levelFloor)
      // window = [start, upto]: the longest prefix tail whose levels reach
      // down to levelBottom (reference scans backward from the end)
      var upto = segs.length - 1
      while (upto >= start && levels(upto) < levelBottom) upto -= 1
      // any FULL group of mergeFactor within the window merges (reference
      // loop bound `end <= 1+upto`, merge.go:922-926) — a window of exactly
      // mergeFactor members merges too
      if (upto - start + 1 >= mergeFactor) {
        var g = start
        while (g + mergeFactor <= upto + 1) {
          val group = segs.slice(g, g + mergeFactor)
          if (!group.exists(_.bytes >= maxMergeBytes)) out += group
          g += mergeFactor
        }
      }
      start = upto + 1
    }
    out.result()
  }

  /** Execute one merge: bounded-group re-encode of the selected waves into a
    * new wave dir, then atomically retire the sources.
    */
  def execute(spark: SparkSession, indexPath: String, group: Seq[WaveInfo]): Int = {
    import spark.implicits._
    val all = waves(spark, indexPath)
    val newWave = math.max(all.map(_.wave).max + 1, MergeWaveBase)
    val target = s"$indexPath/postings/wave=$newWave"

    val rows = spark.read.parquet(group.map(_.path): _*).as[PostingRow]
    rows
      .groupByKey(r => (r.field, r.term, r.rangeId))
      .mapGroups { (_: (String, String, Long), it: Iterator[PostingRow]) =>
        // rows of later merge generations cover non-contiguous doc ranges
        // (tier selection is by size, not adjacency) → PostingRows.merge
        // does a full entry sort, not just a row-order concat
        PostingRows.merge(it.toArray, newWave)
      }
      .sortWithinPartitions("field", "term", "rangeId") // same file order as
      // invertWave → tight (field, term) row-group stats survive merges
      .write.mode("overwrite").parquet(target)

    // Two-phase commit (advisor round-2 fix): the merges log is written
    // DURABLY before any source deletion. Crash windows:
    //  - before the log: the merged wave is an uncommitted orphan — waves()
    //    deletes it on next load, sources stay live (no double postings);
    //  - after the log, before deletions: sources are logged-retired —
    //    waves() treats them as dead and deletes the leftovers on load.
    val fs = new Path(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val log = fs.create(new Path(s"$indexPath/merges_$newWave.json"), true)
    log.write(
      s"""{"merged":[${group.map(_.wave).mkString(",")}],"into":$newWave,"bytes":${group.map(_.bytes).sum}}"""
        .getBytes("UTF-8"))
    log.close()
    group.foreach(w => fs.delete(new Path(w.path), true))
    newWave
  }

  /** Merge driver loop: plan + execute until the tier budget is satisfied. */
  def maybeMerge(spark: SparkSession, indexPath: String,
      segsPerTier: Int = 10, maxMergeAtOnce: Int = 10): Seq[Int] =
    maybeMergeWith(spark, indexPath, plan(_, segsPerTier, maxMergeAtOnce))

  /** Merge driver loop with a pluggable policy. Size-based policies (tiered)
    * see waves in number order; POSITIONAL policies (planLog) must receive
    * generational order, so the driver feeds them [[wavesByAge]].
    */
  def maybeMergeWith(spark: SparkSession, indexPath: String,
      policy: Seq[WaveInfo] => Seq[Seq[WaveInfo]],
      positional: Boolean = false): Seq[Int] = {
    val done = scala.collection.mutable.ArrayBuffer.empty[Int]
    var continue = true
    while (continue) {
      val ws =
        if (positional) wavesByAge(spark, indexPath) else waves(spark, indexPath)
      val p = policy(ws)
      if (p.isEmpty) continue = false
      else p.foreach(g => done += execute(spark, indexPath, g))
    }
    done.toSeq
  }
}
