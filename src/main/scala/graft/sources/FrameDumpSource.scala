package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.ingest.FrameCodec

/** DataSource V2 batch reader for binary frame-dump files — the at-rest
  * form of the reference's TCP stream: each record is the 8-byte
  * `BBHI` read header `(status:u8, response_type:u8, message_length:u16,
  * content_length:u32)` followed by `message_length` ASCII bytes
  * (empty on the data stream) and `content_length` frame bytes
  * (ref: hyperion.py:133-149 read loop, 266-279 fast-streaming header
  * elision) — decoded straight to typed rows through [[FrameCodec]].
  *
  * ```
  * spark.read.format("graft-frames")
  *   .option("kind", "peaks" | "sensor" | "spectrum")
  *   .load("/path/to/dump-dir")
  * ```
  *
  * Scale notes: records are variable-length with no sync markers, so a
  * FILE is the split unit (one InputPartition per file — the dump
  * writer's job is to emit many files; same contract as concatenated
  * gzip/avro-without-sync). Corrupt/truncated records and frames decode
  * to skipped rows, never task failures. Column pruning is left to
  * Spark's ProjectExec (frames are narrow; a pruning Scan would save
  * little), predicate pushdown likewise — the source's value is the
  * byte-faithful ingest path.
  */
class FrameDumpSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-frames"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FrameDumpSource.schemaFor(
      Option(options.get("kind")).getOrElse("peaks"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // case-insensitive like inferSchema — a capitalized option key must
    // not silently fall back to the peaks layout
    val opts = new CaseInsensitiveStringMap(properties)
    if (opts.containsKey("paths"))
      throw new IllegalArgumentException(
        "graft-frames supports a single directory/file path " +
          "(point it at the dump directory; files are the split unit)")
    val kind = Option(opts.get("kind")).getOrElse("peaks")
    // validate even when the caller supplied an explicit schema (which
    // skips inferSchema): a bad kind must be a clean driver-side error,
    // not a MatchError inside executor tasks
    FrameDumpSource.schemaFor(kind)
    new FrameDumpTable(schema, kind,
      Option(opts.get("path")).getOrElse(
        throw new IllegalArgumentException("graft-frames requires a path")),
      Option(opts.get("maxFramesPerTrigger")).map(_.toLong))
  }
}

object FrameDumpSource {
  def schemaFor(kind: String): StructType = kind match {
    case "peaks"    => FrameCodec.peaksSchema
    case "sensor"   => FrameCodec.sensorSchema
    case "spectrum" => FrameCodec.spectrumSchema
    case other => throw new IllegalArgumentException(
      s"unknown frame kind: $other (peaks|sensor|spectrum)")
  }
}

class FrameDumpTable(schema: StructType, kind: String, path: String,
                     maxFramesPerTrigger: Option[Long] = None)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-frames($kind)@$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  /** Write path: one dump file per task, written to a temp name and
    * renamed on task commit (retries/speculation never publish partial
    * files); truncate (overwrite mode) clears the directory first.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          private val serConf = new SerializableConfiguration(
            org.apache.spark.sql.SparkSession.active
              .sparkContext.hadoopConfiguration)
          if (doTruncate) {
            val p = new Path(path)
            val fs = p.getFileSystem(serConf.value)
            if (fs.exists(p)) fs.delete(p, true)
          }

          override def createBatchWriterFactory(
              info: PhysicalWriteInfo): DataWriterFactory = {
            val k = kind
            val dir = path
            val conf = serConf
            new DataWriterFactory {
              override def createWriter(partitionId: Int,
                  taskId: Long): DataWriter[InternalRow] =
                new FrameDumpWriter(dir, k, partitionId, taskId, conf)
            }
          }
          override def commit(messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema
      override def toBatch: Batch = this

      override def toMicroBatchStream(
          checkpointLocation: String): org.apache.spark.sql.connector
            .read.streaming.MicroBatchStream =
        new FrameMicroBatchStream(path, kind,
          Option(options.get("maxFramesPerTrigger")).map(_.toLong)
            .orElse(maxFramesPerTrigger),
          org.apache.spark.sql.SparkSession.active
            .sparkContext.hadoopConfiguration)

      override def planInputPartitions(): Array[InputPartition] = {
        val conf = org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration
        val p = new Path(path)
        val fs = p.getFileSystem(conf)
        val files =
          if (fs.getFileStatus(p).isDirectory)
            fs.listStatus(p).filter(_.isFile)
              // hidden-file convention: '.'/'_' prefixes are in-flight
              // temps (e.g. an aborted task's orphaned .part-*.bin.tmp)
              // — scanning one would surface duplicate/partial rows
              .filterNot(f => f.getPath.getName.startsWith(".") ||
                f.getPath.getName.startsWith("_"))
              .map(_.getPath.toString).sorted
          else Array(path)
        files.map(f => FrameFilePartition(f): InputPartition)
      }

      override def createReaderFactory(): PartitionReaderFactory = {
        val serConf = new SerializableConfiguration(
          org.apache.spark.sql.SparkSession.active
            .sparkContext.hadoopConfiguration)
        val k = kind
        new PartitionReaderFactory {
          override def createReader(
              partition: InputPartition): PartitionReader[InternalRow] =
            new FrameDumpReader(
              partition.asInstanceOf[FrameFilePartition].file, k, serConf)
        }
      }
    }
}

case class FrameFilePartition(file: String) extends InputPartition

/** Sequential record reader for one dump file, optionally over a raw
  * RECORD range `[skip, skip+take)` (the streaming form's unit — raw
  * record ordinals, so a poison frame that decodes to null still
  * advances the range deterministically). Malformed records (truncated
  * header/content, undecodable frame) end or skip cleanly.
  */
class FrameDumpReader(file: String, kind: String,
                      conf: SerializableConfiguration,
                      skip: Long = 0L, take: Long = Long.MaxValue)
    extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(file)
    p.getFileSystem(conf.value).open(p)
  }
  private var row: InternalRow = _
  private var consumed = 0L

  private def readFully(n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) return null
      off += r
    }
    buf
  }

  private def skipFully(n: Long): Boolean = {
    var left = n
    while (left > 0) {
      val r = in.skip(left)
      if (r <= 0) return false
      left -= r
    }
    true
  }

  override def next(): Boolean = {
    while (true) {
      // overflow-safe form of `consumed >= skip + take`: skip > 0 with
      // the default take = Long.MaxValue would wrap skip + take negative
      if (consumed - skip >= take) return false
      val hdr = readFully(8)
      if (hdr == null) return false
      // BBHI little-endian: status, response_type, message_length u16,
      // content_length u32
      val messageLen = ((hdr(2) & 0xFF) | ((hdr(3) & 0xFF) << 8))
      val contentLen = ((hdr(4) & 0xFF).toLong | ((hdr(5) & 0xFF).toLong << 8) |
        ((hdr(6) & 0xFF).toLong << 16) | ((hdr(7) & 0xFF).toLong << 24))
      // insane u32 length = corrupt header; records can't be resynced
      // (no markers), so stop this file cleanly instead of allocating
      // gigabytes or a negative array
      if (contentLen < 0 || contentLen > FrameDumpReader.MaxRecordBytes)
        return false
      val inRange = consumed >= skip
      consumed += 1
      if (!inRange) { // seek past the record without decoding
        if (!skipFully(messageLen.toLong + contentLen)) return false
      } else {
        if (messageLen > 0 && readFully(messageLen) == null) return false
        val content = readFully(contentLen.toInt)
        if (content == null) return false
        val decoded = kind match {
          case "peaks"    => FrameCodec.decodePeaksBytes(content)
          case "sensor"   => FrameCodec.decodeSensorBytes(content)
          case "spectrum" => FrameCodec.decodeSpectrumBytes(content)
        }
        if (decoded != null) { // poison frame -> skip, keep reading
          row = decoded
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

object FrameDumpReader {
  /** largest plausible single frame (spectra: 48 + 2·16·65535 ≈ 2 MiB;
    * 64 MiB leaves generous headroom)
    */
  val MaxRecordBytes: Long = 64L * 1024 * 1024
}

/** Per-task dump writer: typed rows (the kind's schema) re-encoded to
  * wire bytes, BBHI-framed, one file per task via temp + rename.
  */
class FrameDumpWriter(dir: String, kind: String, partitionId: Int,
                      taskId: Long, conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {
  private val fs = new Path(dir).getFileSystem(conf.value)
  // taskId in the FINAL name too: append jobs must ADD files, and a
  // partition-only name would let a second append's task clobber the
  // first job's part file (Spark's commit coordinator guarantees a
  // single committed attempt per partition per job, so one file per
  // partition per job survives)
  private val tmpPath =
    new Path(dir, s".part-$partitionId-$taskId.bin.tmp")
  private val finalPath =
    new Path(dir, f"part-$partitionId%05d-$taskId.bin")
  private val out = fs.create(tmpPath, true)

  override def write(row: InternalRow): Unit = {
    val frame = kind match {
      case "peaks" => FrameCodec.encodePeaksBytes(
        row.getLong(2), row.getLong(3), row.getLong(4),
        row.getArray(5), row.getArray(6))
      case "sensor" => FrameCodec.encodeSensorBytes(
        row.getInt(1), row.getInt(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getArray(6))
      case "spectrum" => FrameCodec.encodeSpectrumBytes(
        row.getLong(2), row.getLong(3), row.getLong(4),
        row.getDouble(5), row.getDouble(6), row.getInt(9),
        row.getArray(10))
    }
    out.write(FrameDump.record(frame))
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    fs.delete(finalPath, false)
    fs.rename(tmpPath, finalPath)
    new WriterCommitMessage {}
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tmpPath, false)
  }

  override def close(): Unit = ()
}

/** Dump-file writer helpers (the producer side for tests/fixtures and
  * landing-zone writers): wraps each frame in the `BBHI` record header
  * with an empty message, exactly as the wire protocol frames it.
  */
object FrameDump {
  def record(frame: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + frame.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(0.toByte).put(0.toByte).putShort(0.toShort)
    out.putInt(frame.length)
    out.put(frame)
    out.array()
  }

  /** Write the partition's frames as ONE dump file (call from
    * `foreachPartition`; file-per-partition is the parallel layout the
    * reader splits on).
    */
  def writeFile(path: String, frames: Iterator[Array[Byte]]): Unit = {
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val os = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f))
    try frames.foreach(fr => os.write(record(fr)))
    finally os.close()
  }
}
