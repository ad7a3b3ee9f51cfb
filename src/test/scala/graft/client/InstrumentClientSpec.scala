package graft.client

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.CommandCodec
import graft.ingest.CommandCodec.{DetectionSetting, NetworkSettings, PeakOffsets}
import graft.model.InstrumentConfig
import graft.ops.Physics
import graft.sources.InstrumentResponder

/** The full reference client API surface (`Hyperion` class properties,
  * hyperion.py:652-1330) exercised through the typed facade against a
  * live responder — a user of the reference client can switch to
  * [[Instrument]] and call the same things. Pure socket work, no Spark.
  */
class InstrumentClientSpec extends AnyFunSuite {

  private def withInstrument(f: (Instrument, InstrumentResponder) => Unit)
      : Unit = {
    val r = new InstrumentResponder().start()
    try f(new Instrument("127.0.0.1", r.port), r) finally r.stop()
  }

  test("identity, readiness and config properties") {
    withInstrument { (h, _) =>
      assert(h.serialNumber == InstrumentConfig.Serial)
      assert(h.firmwareVersion == InstrumentConfig.FirmwareVersion)
      assert(h.fpgaVersion == InstrumentConfig.FpgaVersion)
      assert(h.isReady)
      assert(h.channelCount == InstrumentConfig.ChannelCount)
      assert(h.maxPeakCountPerChannel == InstrumentConfig.MaxPeaksPerChannel)
      assert(h.instrumentName == InstrumentConfig.InstrumentName)
      h.setInstrumentName("lab-rig-7")
      assert(h.instrumentName == "lab-rig-7")
      assert(h.powerCal == InstrumentConfig.PowerCalibration)
    }
  }

  test("detection-setting surface incl. the add-then-update fallback") {
    withInstrument { (h, _) =>
      assert(h.availableDetectionSettings.map(_.settingId)
        == InstrumentConfig.Presets.map(_.setting_id))
      val mine = DetectionSetting(9, "client", "from the facade",
        300, 900, 1200, 9500, 2500, "Peak")
      h.addOrUpdateDetectionSetting(mine) // add path
      assert(h.getDetectionSetting(9) == mine)
      val mine2 = mine.copy(threshold = 2600)
      h.addOrUpdateDetectionSetting(mine2) // update path (add fails)
      assert(h.getDetectionSetting(9).threshold == 2600)
      assert(h.channelDetectionSettingIds.length
        == InstrumentConfig.ChannelCount)
      h.setChannelDetectionSettingId(2, 9)
      assert(h.getChannelDetectionSetting(2) == mine2)
      h.setChannelDetectionSettingId(2, 1)
      h.removeDetectionSetting(9)
      intercept[Instrument.CommandError](h.getDetectionSetting(9))
    }
  }

  test("laser scan speed and the full-spectrum channel set") {
    withInstrument { (h, _) =>
      assert(h.availableLaserScanSpeeds
        == InstrumentConfig.AvailableLaserScanSpeeds)
      assert(h.laserScanSpeed == InstrumentConfig.LaserScanSpeedDefault)
      h.setLaserScanSpeed(1000)
      assert(h.laserScanSpeed == 1000)
      intercept[Instrument.CommandError](h.setLaserScanSpeed(7))
      assert(h.activeFullSpectrumChannelNumbers
        == InstrumentConfig.ActiveFullSpectrumChannelsDefault)
      h.setActiveFullSpectrumChannelNumbers(Seq(1, 4))
      assert(h.activeFullSpectrumChannelNumbers == Seq(1, 4))
      // the reference clears the set by assigning [] — empty is legal
      h.setActiveFullSpectrumChannelNumbers(Nil)
      assert(h.activeFullSpectrumChannelNumbers.isEmpty)
    }
  }

  test("peaks/spectra snapshots decode like the reference data classes") {
    withInstrument { (h, r) =>
      r.setCurrentFrame(cents = 3100, serial = 42, tsInt = 1700000000L,
        tsFrac = 250000000L)
      val p = h.peaks
      assert(p.serialNumber == 42)
      assert(p.timestamp == 250000000L * 1e-9 + 1700000000L)
      assert(p.channelSlices.length == InstrumentConfig.ChannelCount)
      // counts are 1/port: channel slice i holds peak i-1 of the recipe
      assert(p(1) == Seq(3100.0) && p(8) == Seq(3800.0))
      intercept[IllegalArgumentException](p(0))
      // spectra: only active channels present, dBm = raw/scale + offset
      h.setActiveFullSpectrumChannelNumbers(Seq(3))
      val sp = h.spectra
      assert(sp.spectra.keySet == Set(3))
      assert(sp.wavelengths.head == 1500.0 &&
        sp.wavelengths(1) == 1500.8)
      val raw0 = (3100 + 2 * 1000) % 65536 // channel 3 → c=2 recipe
      assert(sp(3).head == raw0 * (1.0 / 102.0) + -42.0)
      intercept[Instrument.CommandError](sp(5))
    }
  }

  test("peak offsets: counts mode, wavelength composition, clears") {
    withInstrument { (h, _) =>
      // defaults carry the Physics-derived delays
      val o2 = h.getPeakOffsets(2)
      assert(o2.delays == (1 to 2).map(r2 => Physics.delayNsScalar(
        InstrumentConfig.offsetDistanceM(2, r2),
        InstrumentConfig.IndexOfRefraction)))
      // counts-mode set round-trips
      h.setPeakOffsetsInCounts(4, PeakOffsets(Seq(1500, 2500), Seq(80L, 160L)))
      assert(h.getPeakOffsets(4) ==
        PeakOffsets(Seq(1500, 2500), Seq(80L, 160L)))
      // the reference's wavelength-mode composition: boundaries go
      // through #ConvertWavelengthToCount, delays through the delay
      // physics — and reading back returns exactly what was computed
      val wls = Seq(1501.2, 1502.4)
      val dists = Seq(30.0, 60.0)
      val set = h.setPeakOffsetsInWavelength(5, wls, dists)
      assert(h.getPeakOffsets(5) == set)
      // boundaries truncate like the reference's np int cast
      // (hyperion.py:1151), not round
      assert(set.boundaries == wls.map(wl =>
        InstrumentConfig.wavelengthToCount(wl, 0.0).toInt))
      assert(set.delays == dists.map(d => Physics.delayNsScalar(
        d, InstrumentConfig.IndexOfRefraction)))
      // conversions invert each other over the wire
      val counts = h.convertWavelengthsToCounts(wls)
      val back = h.convertCountsToWavelengths(counts)
      for ((a, b) <- back.zip(wls)) assert(math.abs(a - b) < 1e-9)
      h.clearPeakOffsets(Some(5))
      assert(h.getPeakOffsets(5).boundaries.isEmpty)
      h.clearPeakOffsets()
      assert(h.getPeakOffsets(4).boundaries.isEmpty)
    }
  }

  test("network, clock, time-sync and reboot") {
    withInstrument { (h, r) =>
      assert(h.networkIpMode == "DHCP")
      assert(h.activeNetworkSettings == InstrumentConfig.DhcpNetworkDefault)
      val mine = NetworkSettings("172.16.0.9", "255.255.0.0", "172.16.0.1")
      h.setStaticNetworkSettings(mine)
      h.setNetworkIpMode("static")
      assert(h.networkIpMode == "STATIC")
      assert(h.activeNetworkSettings == mine)
      h.setNetworkIpMode("dhcp")
      intercept[Instrument.CommandError](h.setNetworkIpMode("carrier-pigeon"))
      assert(h.instrumentUtcDateTime == InstrumentConfig.BootUtc)
      h.setInstrumentUtcDateTime(Seq(2026, 8, 13, 23, 5, 0))
      assert(h.instrumentUtcDateTime == Seq(2026, 8, 13, 23, 5, 0))
      assert(h.ntpEnabled && !h.ptpEnabled)
      h.setPtpEnabled(true)
      assert(h.ptpEnabled && !h.ntpEnabled)
      h.setNtpServer("10.1.1.1")
      assert(h.ntpServer == "10.1.1.1")
      // sensors: add unsaved, reboot reverts to the saved snapshot
      h.addSensor("probe_x", "os7510", 1, 1510.0, 0.25, distance = 12.0)
      assert(h.sensorNames.contains("probe_x"))
      assert(h.exportSensors.exists(_.name == "probe_x"))
      h.reboot()
      assert(r.rebootsSeen == 1)
      assert(!h.sensorNames.contains("probe_x"))
      // saved sensors survive a reboot
      h.addSensor("probe_y", "os7520", 2, 1520.0, 0.5)
      h.saveSensors()
      h.reboot()
      assert(h.sensorNames.contains("probe_y"))
      h.removeSensor("probe_y")
      assert(!h.sensorNames.contains("probe_y"))
    }
  }

  test("spectra decodes a live-mirrored frame with power-cal applied") {
    withInstrument { (h, r) =>
      // mirror a raw spectrum frame carrying channels 3 and 7 (bits 2,6)
      val mk = (c: Int) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array.tabulate(16)(p => c * 50 + p)): Any
      val raw = graft.ingest.FrameCodec.encodeSpectrumBytes(
        11L, 1700000002L, 9L, 1510.0, 0.4, (1 << 2) | (1 << 6),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array(mk(0), mk(1))))
      assert(r.setCurrentSpectrumFrame(raw))
      val sp = h.spectra
      assert(sp.serialNumber == 11L)
      assert(sp.spectra.keySet == Set(3, 7))
      assert(sp.startWavelength == 1510.0 && sp.wavelengthIncrement == 0.4)
      // dBm via the DECODED power cal at the channel-map indices 2 and 6
      val cal = h.powerCal
      assert(sp(3).head == 0.0 * (1.0 / cal(2).scale) + cal(2).offset)
      assert(sp(7)(1) == (50 + 1) * (1.0 / cal(6).scale) + cal(6).offset)
      intercept[Instrument.CommandError](sp(1))
    }
  }

  test("spectra rejects channels beyond the power calibration cleanly") {
    withInstrument { (h, r) =>
      // a mirrored frame may carry any bit pattern whose popcount
      // matches its channel count — bit 9 is legal on the wire but has
      // no calibration entry (ChannelCount = 8), so the client must
      // raise CommandError, not IndexOutOfBoundsException
      val mk = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.tabulate(16)(p => p): Any)
      val raw = graft.ingest.FrameCodec.encodeSpectrumBytes(
        12L, 1700000003L, 0L, 1510.0, 0.4, 1 << 9,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(mk: Any)))
      assert(r.setCurrentSpectrumFrame(raw))
      val e = intercept[Instrument.CommandError](h.spectra)
      assert(e.getMessage.contains("channel 10"))
      assert(e.getMessage.contains("8 channels"))
    }
  }

  test("command errors surface the instrument's message") {
    withInstrument { (h, _) =>
      val e = intercept[Instrument.CommandError](
        h.setLaserScanSpeed(123456))
      assert(e.getMessage.contains("not available"))
    }
  }
}
