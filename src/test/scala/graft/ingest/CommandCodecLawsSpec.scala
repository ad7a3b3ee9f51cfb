package graft.ingest

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.CommandCodec._

/** Seeded-random round-trip laws for every command-port wire codec:
  * decode(encode(x)) == x over randomized valid values, including the
  * range extremes the hand-written fixtures don't reach (u32 delays
  * above 2^31, 255-octet IPs, empty collections, max-u16 counts).
  * Pure JVM — no Spark session.
  */
class CommandCodecLawsSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(20260813)

  test("request/response stream framing round-trips random payloads") {
    for (_ <- 1 to 200) {
      val req = Request(rnd.nextInt(256),
        "#" + rnd.alphanumeric.take(1 + rnd.nextInt(24)).mkString,
        if (rnd.nextBoolean()) rnd.alphanumeric.take(rnd.nextInt(60)).mkString
        else "")
      val got = readRequest(
        new ByteArrayInputStream(encodeRequest(req))).get
      assert(got == req)
      val resp = Response(rnd.nextInt(256), rnd.nextInt(256),
        rnd.alphanumeric.take(rnd.nextInt(40)).mkString,
        Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte))
      val gotR = readResponse(
        new ByteArrayInputStream(encodeResponse(resp)))
      assert(gotR.status == resp.status &&
        gotR.responseType == resp.responseType &&
        gotR.message == resp.message &&
        gotR.content.toSeq == resp.content.toSeq)
    }
  }

  test("peak offsets round-trip incl. u32 delays above 2^31 and empty") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(8) // 0 regions is legal (cleared channel)
      val o = PeakOffsets(
        Seq.fill(n)(rnd.nextInt(0x10000)),
        Seq.fill(n)(rnd.nextLong(0x100000000L))) // full u32 range
      assert(decodePeakOffsets(encodePeakOffsets(o)) == o)
    }
    intercept[IllegalArgumentException](decodePeakOffsets(Array[Byte](1)))
    intercept[IllegalArgumentException](
      decodePeakOffsets(Array[Byte](2, 0, 9))) // count says 2, no regions
  }

  test("network settings round-trip over all-octet-range IPs") {
    def ip() = Seq.fill(4)(rnd.nextInt(256)).mkString(".")
    for (_ <- 1 to 200) {
      val ns = NetworkSettings(ip(), ip(), ip())
      assert(decodeNetworkSettings(encodeNetworkSettings(ns)) == ns)
    }
    assert(ipv4Bytes("1.2.3.256").isEmpty)
    assert(ipv4Bytes("1.2.3").isEmpty)
    assert(ipv4Bytes("a.b.c.d").isEmpty)
  }

  test("UTC datetime, i32 array, f64 and power cal round-trip") {
    for (_ <- 1 to 200) {
      val dt = Seq(1970 + rnd.nextInt(8000), 1 + rnd.nextInt(12),
        1 + rnd.nextInt(31), rnd.nextInt(24), rnd.nextInt(60),
        rnd.nextInt(60))
      assert(decodeUtcDateTime(encodeUtcDateTime(dt)) == dt)
      val xs = Seq.fill(rnd.nextInt(20))(rnd.nextInt())
      assert(readI32ArrayLe(i32ArrayLe(xs)) == xs)
      val d = rnd.nextGaussian() * math.pow(10, rnd.nextInt(9))
      assert(readF64le(f64le(d)) == d)
      val cal = Seq.fill(1 + rnd.nextInt(16))(
        PowerCal(rnd.nextInt(), 1 + rnd.nextInt(1000)))
      assert(decodePowerCal(encodePowerCal(cal)) == cal)
    }
  }

  test("detection settings and sensor export round-trip randomized") {
    for (_ <- 1 to 100) {
      val ss = Seq.fill(1 + rnd.nextInt(5))(DetectionSetting(
        rnd.nextInt(128),
        rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString,
        rnd.alphanumeric.take(rnd.nextInt(40)).mkString,
        rnd.nextInt(0x10000), rnd.nextInt(0x10000), rnd.nextInt(0x10000),
        rnd.nextInt(0x10000), rnd.nextInt(),
        if (rnd.nextBoolean()) "Peak" else "Valley"))
      assert(decodeDetectionSettings(encodeDetectionSettings(ss)) == ss)
      // the pack-string surface round-trips the same records
      for (s <- ss)
        assert(parseDetectionSetting(formatDetectionSetting(s))
          .contains(s))
      val sensors = Seq.tabulate(1 + rnd.nextInt(4))(k => SensorExport(
        version = 1 + rnd.nextInt(10),
        id = Seq.fill(16)(rnd.nextInt().toByte),
        name = s"s${k}_" + rnd.alphanumeric.take(rnd.nextInt(12)).mkString,
        model = if (rnd.nextBoolean()) "os7510" else "os7520",
        channel = 1 + rnd.nextInt(64),
        distance = rnd.nextDouble() * 1e4,
        wavelength = 1500.0 + rnd.nextDouble() * 100,
        calibrationFactor = rnd.nextDouble(),
        rcGain = rnd.nextDouble() * 10,
        rcThresholdHigh = rnd.nextDouble() * 5000,
        rcThresholdLow = rnd.nextDouble() * 2000))
      assert(decodeSensorExport(
        encodeSensorExport(1, sensors)) == sensors)
    }
  }
}
