package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Byte-level frame codec for the reference's wire formats — the actual
  * data path its parsers consume (all little-endian, x86-native struct
  * layout, no padding):
  *
  *  - peaks frame (ref: hyperion.py:424-453, `unpack('HHIQII', ...)`):
  *    24-byte header `length:u16 version:u16 reserved:u32 serial:u64
  *    ts_int:u32 ts_frac:u32`, then int16 peak counts up to
  *    `header.length`, then float64 peak data to the end. `length` is the
  *    TOTAL header+counts length, exactly like the reference slices
  *    `raw_data[header_length:self.header.length]`.
  *  - sensor frame (ref: hyperion.py:388-420, `unpack('HBBIQII', ...)`):
  *    24-byte header `header_length:u16 status:u8 buffer_pct:u8
  *    reserved:u32 serial:u64 ts_int:u32 ts_frac:u32`, then float64
  *    values.
  *  - spectrum frame (ref: hyperion.py:475-500, `unpack('HHIQIIddIHH')`):
  *    48-byte header `length:u16 version:u16 reserved:u32 serial:u64
  *    ts_int:u32 ts_frac:u32 start_wl:f64 wl_inc:f64 num_points:u32
  *    num_channels:u16 active_bits:u16`, then a row-major
  *    `num_channels × num_points` uint16 matrix.
  *
  * Exposed as native Catalyst expressions (`StaticInvoke` — the standard
  * internal pattern for byte-twiddling builtins like `Decode`/`AesEncrypt`):
  * the decode sits inside whole-stage codegen as one static call per row,
  * no UDF serialization, no interpreted fallback. At 100 TB the decode
  * stage is a pure map over a BINARY column — column-pruned, no shuffle,
  * partition count inherited from the landing-zone files.
  *
  * Unsigned handling: u16→int, u32→long (zero-extended), u64→long
  * (two's-complement wrap above 2^63, like numpy viewing int64).
  * Truncated/malformed buffers decode to null rather than throwing —
  * a poison frame must not kill a 1000-executor stage.
  */
object FrameCodec {

  val peaksSchema: StructType = StructType(Seq(
    StructField("length", IntegerType, nullable = false),
    StructField("version", IntegerType, nullable = false),
    StructField("serial_number", LongType, nullable = false),
    StructField("timestamp_int", LongType, nullable = false),
    StructField("timestamp_frac", LongType, nullable = false),
    StructField("peak_counts", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("peaks", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  val sensorSchema: StructType = StructType(Seq(
    StructField("header_length", IntegerType, nullable = false),
    StructField("status", IntegerType, nullable = false),
    StructField("buffer_percentage", IntegerType, nullable = false),
    StructField("serial_number", LongType, nullable = false),
    StructField("timestamp_int", LongType, nullable = false),
    StructField("timestamp_frac", LongType, nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  val spectrumSchema: StructType = StructType(Seq(
    StructField("length", IntegerType, nullable = false),
    StructField("version", IntegerType, nullable = false),
    StructField("serial_number", LongType, nullable = false),
    StructField("timestamp_int", LongType, nullable = false),
    StructField("timestamp_frac", LongType, nullable = false),
    StructField("start_wavelength", DoubleType, nullable = false),
    StructField("wavelength_increment", DoubleType, nullable = false),
    StructField("num_points", IntegerType, nullable = false),
    StructField("num_channels", IntegerType, nullable = false),
    StructField("active_channel_bits", IntegerType, nullable = false),
    StructField("spectrum",
      ArrayType(ArrayType(IntegerType, containsNull = false),
        containsNull = false), nullable = false)))

  // ---- Column API --------------------------------------------------------

  private def invoke(name: String, dt: DataType, nullable: Boolean,
                     args: Column*): Column =
    ColumnBridge.column(StaticInvoke(
      FrameCodec.getClass, dt, name,
      args.map(ColumnBridge.expression),
      returnNullable = nullable))

  /** peaks frame bytes ← (serial u64, ts_int u32, ts_frac u32,
    * counts ARRAY&lt;INT&gt;, peaks ARRAY&lt;DOUBLE&gt;)
    */
  def encodePeaks(serial: Column, tsInt: Column, tsFrac: Column,
                  counts: Column, peaks: Column): Column =
    invoke("encodePeaksBytes", BinaryType, nullable = false,
      serial.cast("long"), tsInt.cast("long"), tsFrac.cast("long"),
      counts.cast("array<int>"), peaks.cast("array<double>"))

  /** BINARY → typed peaks-frame struct (null on truncated buffers). */
  def decodePeaks(bin: Column): Column =
    invoke("decodePeaksBytes", peaksSchema, nullable = true, bin)

  def encodeSensor(status: Column, bufferPct: Column, serial: Column,
                   tsInt: Column, tsFrac: Column, values: Column): Column =
    invoke("encodeSensorBytes", BinaryType, nullable = false,
      status.cast("int"), bufferPct.cast("int"), serial.cast("long"),
      tsInt.cast("long"), tsFrac.cast("long"), values.cast("array<double>"))

  def decodeSensor(bin: Column): Column =
    invoke("decodeSensorBytes", sensorSchema, nullable = true, bin)

  def encodeSpectrum(serial: Column, tsInt: Column, tsFrac: Column,
                     startWl: Column, wlInc: Column, activeBits: Column,
                     matrix: Column): Column =
    invoke("encodeSpectrumBytes", BinaryType, nullable = false,
      serial.cast("long"), tsInt.cast("long"), tsFrac.cast("long"),
      startWl.cast("double"), wlInc.cast("double"), activeBits.cast("int"),
      matrix.cast("array<array<int>>"))

  def decodeSpectrum(bin: Column): Column =
    invoke("decodeSpectrumBytes", spectrumSchema, nullable = true, bin)

  /** Deterministic synthetic spectrum matrix for [[FrameSource]]:
    * raw[c][p] = (cents + c*1000 + p*7) mod 65536. One native call per
    * row building the nested array in a tight loop — the unrolled
    * 128-scalar-expression `array(array(...))` form generated a huge
    * codegen method (past the JIT's compilation threshold) that cost
    * ~100 µs/row interpreted.
    */
  def synthSpectrum(cents: Column, channels: Int, points: Int): Column =
    invoke("synthSpectrumMatrix",
      ArrayType(ArrayType(IntegerType, containsNull = false),
        containsNull = false), nullable = false,
      cents.cast("long"), lit(channels).cast("int"), lit(points).cast("int"))

  def synthSpectrumMatrix(cents: Long, channels: Int,
                          points: Int): ArrayData = {
    val rows = new Array[Any](channels)
    var c = 0
    while (c < channels) {
      val row = new Array[Int](points)
      var p = 0
      while (p < points) {
        // plain Java % — dividend-sign semantics, identical to Spark's
        // Remainder and DuckDB's %
        row(p) = ((cents + c * 1000L + p * 7L) % 65536L).toInt
        p += 1
      }
      rows(c) = new GenericArrayData(row)
      c += 1
    }
    new GenericArrayData(rows)
  }

  // ---- static byte-level implementations (called from generated code) ----

  def encodePeaksBytes(serial: Long, tsInt: Long, tsFrac: Long,
                       counts: ArrayData, peaks: ArrayData): Array[Byte] = {
    val nC = counts.numElements()
    val nP = peaks.numElements()
    val len = 24 + 2 * nC
    val buf = ByteBuffer.allocate(len + 8 * nP).order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(len.toShort)
    buf.putShort(1.toShort)              // version
    buf.putInt(0)                        // reserved
    buf.putLong(serial)
    buf.putInt(tsInt.toInt)
    buf.putInt(tsFrac.toInt)
    var i = 0
    while (i < nC) { buf.putShort(counts.getInt(i).toShort); i += 1 }
    i = 0
    while (i < nP) { buf.putDouble(peaks.getDouble(i)); i += 1 }
    buf.array()
  }

  def decodePeaksBytes(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 24) return null
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val len = buf.getShort & 0xFFFF
    val version = buf.getShort & 0xFFFF
    buf.getInt                           // reserved
    val serial = buf.getLong
    val tsInt = buf.getInt & 0xFFFFFFFFL
    val tsFrac = buf.getInt & 0xFFFFFFFFL
    if (len < 24 || len > bytes.length || (len - 24) % 2 != 0 ||
      (bytes.length - len) % 8 != 0) return null
    val counts = new Array[Int]((len - 24) / 2)
    var i = 0
    while (i < counts.length) { counts(i) = buf.getShort.toInt; i += 1 }
    val peaks = new Array[Double]((bytes.length - len) / 8)
    i = 0
    while (i < peaks.length) { peaks(i) = buf.getDouble; i += 1 }
    new GenericInternalRow(Array[Any](len, version, serial, tsInt, tsFrac,
      new GenericArrayData(counts), new GenericArrayData(peaks)))
  }

  def encodeSensorBytes(status: Int, bufferPct: Int, serial: Long,
                        tsInt: Long, tsFrac: Long,
                        values: ArrayData): Array[Byte] = {
    val n = values.numElements()
    val buf = ByteBuffer.allocate(24 + 8 * n).order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(24.toShort)             // header_length
    buf.put(status.toByte)
    buf.put(bufferPct.toByte)
    buf.putInt(0)                        // reserved
    buf.putLong(serial)
    buf.putInt(tsInt.toInt)
    buf.putInt(tsFrac.toInt)
    var i = 0
    while (i < n) { buf.putDouble(values.getDouble(i)); i += 1 }
    buf.array()
  }

  def decodeSensorBytes(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 24) return null
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val hdrLen = buf.getShort & 0xFFFF
    val status = buf.get & 0xFF
    val bufferPct = buf.get & 0xFF
    buf.getInt                           // reserved
    val serial = buf.getLong
    val tsInt = buf.getInt & 0xFFFFFFFFL
    val tsFrac = buf.getInt & 0xFFFFFFFFL
    if (hdrLen < 24 || hdrLen > bytes.length ||
      (bytes.length - hdrLen) % 8 != 0) return null
    buf.position(hdrLen)
    val values = new Array[Double]((bytes.length - hdrLen) / 8)
    var i = 0
    while (i < values.length) { values(i) = buf.getDouble; i += 1 }
    new GenericInternalRow(Array[Any](hdrLen, status, bufferPct, serial,
      tsInt, tsFrac, new GenericArrayData(values)))
  }

  def encodeSpectrumBytes(serial: Long, tsInt: Long, tsFrac: Long,
                          startWl: Double, wlInc: Double, activeBits: Int,
                          matrix: ArrayData): Array[Byte] = {
    val nCh = matrix.numElements()
    val nPts = if (nCh == 0) 0
      else matrix.getArray(0).numElements()
    val buf = ByteBuffer.allocate(48 + 2 * nCh * nPts)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(48.toShort)             // length
    buf.putShort(1.toShort)              // version
    buf.putInt(0)                        // reserved
    buf.putLong(serial)
    buf.putInt(tsInt.toInt)
    buf.putInt(tsFrac.toInt)
    buf.putDouble(startWl)
    buf.putDouble(wlInc)
    buf.putInt(nPts)
    buf.putShort(nCh.toShort)
    buf.putShort(activeBits.toShort)
    var c = 0
    while (c < nCh) {
      val row = matrix.getArray(c)
      // jagged input: bound by the ROW's own length, zero-padding short
      // rows — the wire format is rectangular, and an out-of-bounds read
      // in an executor must not be the failure mode (mirrors the decode
      // side's null-on-malformed contract)
      val rowLen = math.min(nPts, row.numElements())
      var p = 0
      while (p < rowLen) { buf.putShort(row.getInt(p).toShort); p += 1 }
      while (p < nPts) { buf.putShort(0.toShort); p += 1 }
      c += 1
    }
    buf.array()
  }

  def decodeSpectrumBytes(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 48) return null
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val len = buf.getShort & 0xFFFF
    val version = buf.getShort & 0xFFFF
    buf.getInt                           // reserved
    val serial = buf.getLong
    val tsInt = buf.getInt & 0xFFFFFFFFL
    val tsFrac = buf.getInt & 0xFFFFFFFFL
    val startWl = buf.getDouble
    val wlInc = buf.getDouble
    val nPts = buf.getInt
    val nCh = buf.getShort & 0xFFFF
    val activeBits = buf.getShort & 0xFFFF
    // Long arithmetic: a corrupt header with huge num_points must fail
    // the guard (return null), not overflow 32-bit and pass it
    if (nPts < 0 ||
      (bytes.length - 48).toLong < 2L * nCh * nPts) return null
    val rows = new Array[Any](nCh)
    var c = 0
    while (c < nCh) {
      val row = new Array[Int](nPts)
      var p = 0
      while (p < nPts) { row(p) = buf.getShort & 0xFFFF; p += 1 }
      rows(c) = new GenericArrayData(row)
      c += 1
    }
    new GenericInternalRow(Array[Any](len, version, serial, tsInt, tsFrac,
      startWl, wlInc, nPts, nCh, activeBits, new GenericArrayData(rows)))
  }
}
