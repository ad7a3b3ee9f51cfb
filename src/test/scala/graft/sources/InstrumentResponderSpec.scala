package graft.sources

import java.net.Socket
import java.nio.charset.StandardCharsets.US_ASCII

import graft.SparkSpec
import graft.ingest.CommandCodec
import graft.ingest.CommandCodec.Request
import graft.model.InstrumentConfig
import graft.queries.PipelineQueries

/** S14 full: the live command round-trip — client-formatted packets
  * over a real TCP socket to the instrument responder, responses
  * parsed and checked against the SAME InstrumentConfig the query
  * surface serves, so control plane and queryable config agree. Plus
  * the F10 tie: q_command_format's SQL-derived packet hex equals the
  * real CommandCodec wire bytes.
  */
class InstrumentResponderSpec extends SparkSpec {

  test("every config property round-trips over a live socket") {
    val r = new InstrumentResponder().start()
    try {
      def cmd(c: String) =
        InstrumentResponder.command("127.0.0.1", r.port, c)
      assert(new String(cmd("#GetSerialNumber").content, US_ASCII)
        == InstrumentConfig.Serial)
      assert(new String(cmd("#GetInstrumentName").content, US_ASCII)
        == InstrumentConfig.InstrumentName)
      assert(new String(cmd("#GetFirmwareVersion").content, US_ASCII)
        == InstrumentConfig.FirmwareVersion)
      assert(new String(cmd("#GetFPGAVersion").content, US_ASCII)
        == InstrumentConfig.FpgaVersion)
      assert(cmd("#isready").content.head == 1.toByte)
      assert(CommandCodec.readU32le(cmd("#GetDutChannelCount").content)
        == InstrumentConfig.ChannelCount.toLong)
      assert(CommandCodec.readU32le(
        cmd("#GetMaximumPeakCountPerDutChannel").content)
        == InstrumentConfig.MaxPeaksPerChannel.toLong)
      // unknown command: non-SUCCESS status, error in message —
      // the reference's error path (hyperion.py:141-146)
      val bad = cmd("#NoSuchCommand")
      assert(bad.status != CommandCodec.Success)
      assert(bad.message.contains("unknown command"))
      // config answers equal the queryable config DataFrame (S14-lite
      // and S14-live can never disagree)
      val row = InstrumentConfig.config(spark).head()
      assert(row.getAs[String]("serial_number") == InstrumentConfig.Serial)
    } finally r.stop()
  }

  test("multiple commands pipeline over one connection") {
    val r = new InstrumentResponder().start()
    try {
      val sock = new Socket("127.0.0.1", r.port)
      try {
        val out = sock.getOutputStream
        for (c <- Seq("#GetSerialNumber", "#isready", "#GetDutChannelCount"))
          out.write(CommandCodec.encodeRequest(Request(0, c, "")))
        out.flush()
        val in = sock.getInputStream
        assert(new String(CommandCodec.readResponse(in).content, US_ASCII)
          == InstrumentConfig.Serial)
        assert(CommandCodec.readResponse(in).content.head == 1.toByte)
        assert(CommandCodec.readU32le(CommandCodec.readResponse(in).content)
          == InstrumentConfig.ChannelCount.toLong)
      } finally sock.close()
    } finally r.stop()
  }

  test("q_command_format hex equals the real CommandCodec wire bytes") {
    val hex = "0123456789ABCDEF"
    def toHex(b: Array[Byte]): String =
      b.map(x => s"${hex((x >> 4) & 0xF)}${hex(x & 0xF)}").mkString
    val rows = graft.SparkEntry.queries("q_command_format")(spark, "")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getString(3), r.getString(4))).toSeq
    assert(rows.size == PipelineQueries.CommandTable.size)
    for ((c, a, o, headerHex, packetMd5) <- rows) {
      val wire = CommandCodec.encodeRequest(Request(o, c, a))
      assert(toHex(wire) == headerHex + toHex(c.getBytes(US_ASCII)) +
        toHex(a.getBytes(US_ASCII)), s"$c header/packet hex mismatch")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(toHex(wire).getBytes(US_ASCII))
      assert(toHex(md).toLowerCase == packetMd5, s"$c md5 mismatch")
    }
  }
}
