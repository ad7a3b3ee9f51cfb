package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.util.SerializableConfiguration

/** Micro-batch STREAMING form of the `graft-frames` source — the live
  * counterpart of the reference's rate-limited TCP producer loop
  * (ref: hyperion.py:284-312 `stream_data`, streamer classes
  * hyperion.py:324-385): an instrument gateway appends BBHI-framed dump
  * files to a landing directory; this source tails the directory as an
  * unbounded stream with REAL offset semantics.
  *
  * ```
  * spark.readStream.format("graft-frames")
  *   .option("kind", "peaks")
  *   .option("maxFramesPerTrigger", "10000")   // admission control
  *   .load("/landing/dir")
  * ```
  *
  * Design:
  *  - **Offset = global frame ordinal** (count of raw records across the
  *    name-ordered file list). Offsets are dense, restart-stable, and
  *    cheap to split into per-file ranges via the cumulative index.
  *  - **Admission control**: `maxFramesPerTrigger` bounds every
  *    micro-batch via [[ReadMaxRows]] — the Spark-native form of the
  *    reference's rate limit (10 Hz loop) and bounded queue
  *    (`Queue(maxsize=5)`, database_peak_streaming.py:109): a slow sink
  *    never faces an unbounded batch.
  *  - **Trigger.AvailableNow**: the end offset is pinned by
  *    [[prepareForTriggerAvailableNow]], so a drain processes exactly
  *    the frames present at start, still rate-limited per batch.
  *  - **Append-only, name-ordered landing contract**: files are
  *    immutable once visible (write-temp-then-rename, which
  *    [[FrameDumpWriter]] does) and new files must sort AFTER already
  *    -seen ones (standard landing-zone naming: part-<timestamp> /
  *    increasing sequence). A violation is detected and thrown, never
  *    silently mis-offset. Hidden files (`.`/`_` prefixes — in-flight
  *    temps) are ignored.
  *
  * Scale: the per-batch driver work is one directory listing plus a
  * header-walk of NEW files only (8-byte header reads + seeks, no
  * content I/O, cached by file); executors read only their assigned
  * record ranges. State in the driver is one (path, frameCount) pair
  * per file.
  */
class FrameMicroBatchStream(dir: String, kind: String,
                            maxFramesPerTrigger: Option[Long],
                            conf: Configuration)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val serConf = new SerializableConfiguration(conf)
  // (path, frames, cumulativeStart) in landing order; append-only
  private val index = ArrayBuffer.empty[(String, Long, Long)]
  // byte length of each indexed file at index time, keyed by path:
  // landing files are immutable once visible, so a length change on a
  // seen file means the contract was violated and planned ranges would
  // read short (truncation) or miss frames (in-place growth)
  private val indexedLen = scala.collection.mutable.Map.empty[String, Long]
  private var total = 0L
  private var availableNowEnd: Option[Long] = None

  private def refresh(): Unit = synchronized {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return
    val visible =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile)
          .filterNot(s => s.getPath.getName.startsWith(".") ||
            s.getPath.getName.startsWith("_"))
          .map(s => (s.getPath.toString, s.getLen)).sortBy(_._1)
      else Array((dir, fs.getFileStatus(p).getLen))
    val seen = index.map(_._1)
    if (!seen.sameElements(visible.take(seen.length).map(_._1)))
      throw new IllegalStateException(
        s"graft-frames stream over $dir: a file appeared out of order " +
          "(landing files must be immutable and lexicographically " +
          "increasing); offsets would be corrupted — refusing to " +
          s"continue. seen=${seen.mkString(",")} now=${visible.map(_._1).mkString(",")}")
    for ((f, len) <- visible.take(seen.length))
      if (indexedLen.getOrElse(f, len) != len)
        throw new IllegalStateException(
          s"graft-frames stream over $dir: seen file $f changed length " +
            s"(${indexedLen(f)} -> $len bytes); landing files must be " +
            "immutable once visible — planned offset ranges would read " +
            "short or skip frames, refusing to continue")
    for ((f, len) <- visible.drop(seen.length)) {
      val n = FrameMicroBatchStream.countRecords(f, conf)
      index += ((f, n, total))
      indexedLen(f) = len
      total += n
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    maxFramesPerTrigger.map(n => ReadLimit.maxRows(n))
      .getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit = {
    refresh()
    availableNowEnd = Some(total)
  }

  /** Index snapshot recorded into every emitted offset (see
    * [[FrameOffset]]): the restart-validation contract.
    */
  private def snapshot(): Seq[(String, Long, Long)] = synchronized(
    index.map { case (f, n, _) => (f, n, indexedLen(f)) }.toSeq)

  override def initialOffset(): Offset = FrameOffset(0L)

  override def deserializeOffset(json: String): Offset =
    FrameOffset.fromJson(json)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val available = availableNowEnd.getOrElse { refresh(); total }
    val from = start.asInstanceOf[FrameOffset].frame
    val end = limit match {
      case r: ReadMaxRows => math.min(available, from + r.maxRows())
      case _: ReadAllAvailable => available
      case _ => available
    }
    FrameOffset(math.max(from, end), snapshot())
  }

  override def reportLatestOffset(): Offset =
    synchronized(FrameOffset(total, snapshot()))

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FrameOffset].frame
    val e = end.asInstanceOf[FrameOffset].frame
    synchronized {
      // Restart replay: on recovery Spark replans any uncommitted batch
      // straight from the offset log WITHOUT calling latestOffset first
      // (the ProcessingTime path), so a fresh stream instance arrives
      // here with an empty index. Rebuild it whenever it cannot cover
      // the requested range — otherwise the replayed batch would plan
      // zero partitions and silently emit no rows.
      if (e > total) refresh()
      if (e > total)
        throw new IllegalStateException(
          s"graft-frames stream over $dir: checkpoint requests frames " +
            s"[$s,$e) but only $total are present in the landing dir — " +
            "files recorded in the offset log have disappeared; " +
            "refusing to silently drop them")
      // Restart validation (the in-memory immutability checks cover one
      // instance's lifetime only): the per-file snapshot persisted in
      // the offset log must prefix-match the index REBUILT by this
      // instance — a file rewritten/grown while the stream was down
      // re-counts cleanly but shifts every later cumulative range.
      for (o <- Seq(start, end); metas = o.asInstanceOf[FrameOffset].files;
           i <- metas.indices if i < index.length) {
        val (mp, mn, mlen) = metas(i)
        val (f, n, _) = index(i)
        if (f != mp || n != mn || indexedLen(f) != mlen)
          throw new IllegalStateException(
            s"graft-frames stream over $dir: landing file #$i changed " +
              s"across restart — offset log recorded ($mp, $mn frames, " +
              s"$mlen bytes) but the directory now yields ($f, $n " +
              s"frames, ${indexedLen(f)} bytes); landing files must be " +
              "immutable once visible — replayed offset ranges would " +
              "map to different frames, refusing to continue")
      }
      index.iterator
        .map { case (f, n, cum) =>
          val lo = math.max(s, cum)
          val hi = math.min(e, cum + n)
          FrameRangePartition(f, lo - cum, hi - lo)
        }
        .filter(_.take > 0)
        .toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val k = kind
    val c = serConf
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[FrameRangePartition]
        new FrameDumpReader(p.file, k, c, p.skip, p.take)
      }
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object FrameMicroBatchStream {
  /** Raw record count of one dump file: header walk (8-byte reads +
    * seeks over message/content), no frame decode. Counts exactly the
    * records [[FrameDumpReader]] can consume — a corrupt header ends
    * the count the same way it ends the reader, so planned ranges and
    * readable records can never disagree.
    */
  def countRecords(file: String, conf: Configuration): Long = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      var n = 0L
      var pos = 0L
      val hdr = new Array[Byte](8)
      var done = false
      while (!done) {
        if (pos + 8 > len) done = true
        else {
          in.readFully(pos, hdr, 0, 8)
          val messageLen = (hdr(2) & 0xFF) | ((hdr(3) & 0xFF) << 8)
          val contentLen = (hdr(4) & 0xFF).toLong |
            ((hdr(5) & 0xFF).toLong << 8) |
            ((hdr(6) & 0xFF).toLong << 16) |
            ((hdr(7) & 0xFF).toLong << 24)
          if (contentLen < 0 || contentLen > FrameDumpReader.MaxRecordBytes ||
              pos + 8 + messageLen + contentLen > len)
            done = true // corrupt/truncated tail: reader stops here too
          else {
            pos += 8 + messageLen + contentLen
            n += 1
          }
        }
      }
      n
    } finally in.close()
  }
}

/** Offset = number of frames consumed across the name-ordered landing
  * files (a dense global ordinal, like Kafka's per-partition offsets
  * collapsed to one log), plus the per-file (path, frameCount, byteLen)
  * index snapshot backing that ordinal. The snapshot makes the offset
  * self-validating across process restarts: a landing file rewritten or
  * grown WHILE THE STREAM WAS DOWN re-counts cleanly into a fresh index
  * (the in-memory immutability checks never saw it change), silently
  * shifting every later file's cumulative range — on restart the
  * rebuilt index is checked against the snapshot recorded in the offset
  * log and any drift fails the stream instead of replaying wrong frames.
  *
  * Cost: one (path, count, len) triple per landing file per offset-log
  * entry — the same order of driver state the source already keeps, and
  * the same shape Spark's own FileStreamSource persists per batch.
  */
case class FrameOffset(frame: Long,
                       files: Seq[(String, Long, Long)] = Nil)
    extends Offset {
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.put("frame", frame)
    val arr = root.putArray("files")
    files.foreach { case (p, n, len) =>
      val a = arr.addArray(); a.add(p); a.add(n); a.add(len); ()
    }
    m.writeValueAsString(root)
  }
}

object FrameOffset {
  /** Accepts both the self-validating JSON form and the legacy bare
    * ordinal (pre-round-6 checkpoints keep replaying, minus the
    * rewrite-while-down validation they never had).
    */
  def fromJson(json: String): FrameOffset = {
    val t = json.trim
    if (t.startsWith("{")) {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(t)
      val files = scala.jdk.CollectionConverters
        .IteratorHasAsScala(root.get("files").elements()).asScala
        .map(a => (a.get(0).asText, a.get(1).asLong, a.get(2).asLong))
        .toSeq
      FrameOffset(root.get("frame").asLong, files)
    } else FrameOffset(t.toLong)
  }
}

case class FrameRangePartition(file: String, skip: Long, take: Long)
    extends InputPartition
