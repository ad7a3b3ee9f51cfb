package graft.client

import java.util.concurrent.Executors

import scala.concurrent.{ExecutionContext, Future}

import graft.ingest.CommandCodec.{DetectionSetting, NetworkSettings, PeakOffsets, SensorExport}
import graft.model.InstrumentConfig

/** Typed asynchronous client — the Scala equivalent of the reference's
  * `AsyncHyperion` (hyperion.py:1333-1955): every method returns a
  * `Future`, and ALL requests share ONE persistent command connection
  * (hyperion.py:1349; `HCommTCPClient` at 81-186) instead of the sync
  * client's socket-per-command lifecycle. Method names mirror the
  * reference's `get_`/`set_` coroutines one for one.
  *
  * Commands run on a dedicated single-thread executor, so concurrent
  * callers' request/response pairs are serialized on the wire in
  * submission order — the role the asyncio event loop plays for the
  * reference — and the client is usable while data streams
  * concurrently through the streaming ports (the defining
  * `AsyncHyperion` use-case, hyperion.py:1335-1338).
  *
  * The decode logic is shared with [[Instrument]]: this class wraps a
  * sync facade bound to the persistent transport, so the bytes on the
  * wire and the typed results are identical between both clients.
  */
final class AsyncInstrument(host: String, port: Int) extends AutoCloseable {

  private val connection = new PersistentConnection(host, port)
  private val sync = new Instrument(connection)
  private val executor = Executors.newSingleThreadExecutor(r => {
    val t = new Thread(r, "graft-async-instrument")
    t.setDaemon(true)
    t
  })
  private implicit val ec: ExecutionContext =
    ExecutionContext.fromExecutor(executor)

  private def run[T](f: Instrument => T): Future[T] = Future(f(sync))

  /** True while the persistent connection is open. */
  def isConnected: Boolean = connection.isConnected

  // --- identity / readiness (hyperion.py:1373-1432) ---
  def getPowerCal: Future[Seq[graft.ingest.CommandCodec.PowerCal]] =
    run(_.powerCal)
  def getSerialNumber: Future[String] = run(_.serialNumber)
  def getLibraryVersion: Future[String] = run(_.libraryVersion)
  def getFirmwareVersion: Future[String] = run(_.firmwareVersion)
  def getFpgaVersion: Future[String] = run(_.fpgaVersion)
  def getInstrumentName: Future[String] = run(_.instrumentName)
  def setInstrumentName(name: String): Future[Unit] =
    run(_.setInstrumentName(name))
  def getIsReady: Future[Boolean] = run(_.isReady)
  def getChannelCount: Future[Int] = run(_.channelCount)
  def getMaxPeakCountPerChannel: Future[Int] =
    run(_.maxPeakCountPerChannel)

  // --- detection settings (hyperion.py:1437-1464, 1786-1875) ---
  def getAvailableDetectionSettings: Future[Seq[DetectionSetting]] =
    run(_.availableDetectionSettings)
  def getChannelDetectionSettingIds: Future[Seq[Int]] =
    run(_.channelDetectionSettingIds)
  def getDetectionSetting(id: Int): Future[DetectionSetting] =
    run(_.getDetectionSetting(id))
  def addOrUpdateDetectionSetting(s: DetectionSetting): Future[Unit] =
    run(_.addOrUpdateDetectionSetting(s))
  def removeDetectionSetting(id: Int): Future[Unit] =
    run(_.removeDetectionSetting(id))
  def getChannelDetectionSetting(channel: Int): Future[DetectionSetting] =
    run(_.getChannelDetectionSetting(channel))
  def setChannelDetectionSettingId(channel: Int, id: Int): Future[Unit] =
    run(_.setChannelDetectionSettingId(channel, id))

  // --- full-spectrum channel set (hyperion.py:1466-1484) ---
  def getActiveFullSpectrumChannelNumbers: Future[Seq[Int]] =
    run(_.activeFullSpectrumChannelNumbers)
  def setActiveFullSpectrumChannelNumbers(channels: Seq[Int]): Future[Unit] =
    run(_.setActiveFullSpectrumChannelNumbers(channels))

  // --- laser scan speed (hyperion.py:1486-1512) ---
  def getAvailableLaserScanSpeeds: Future[Seq[Int]] =
    run(_.availableLaserScanSpeeds)
  def getLaserScanSpeed: Future[Int] = run(_.laserScanSpeed)
  def setLaserScanSpeed(hz: Int): Future[Unit] =
    run(_.setLaserScanSpeed(hz))

  // --- network (hyperion.py:1514-1596) ---
  def getActiveNetworkSettings: Future[NetworkSettings] =
    run(_.activeNetworkSettings)
  def getStaticNetworkSettings: Future[NetworkSettings] =
    run(_.staticNetworkSettings)
  def setStaticNetworkSettings(n: NetworkSettings): Future[Unit] =
    run(_.setStaticNetworkSettings(n))
  def getNetworkIpMode: Future[String] = run(_.networkIpMode)
  def setNetworkIpMode(mode: String): Future[Unit] =
    run(_.setNetworkIpMode(mode))

  // --- UTC clock / time sync (hyperion.py:1598-1682) ---
  def getInstrumentUtcDateTime: Future[Seq[Int]] =
    run(_.instrumentUtcDateTime)
  def setInstrumentUtcDateTime(parts: Seq[Int]): Future[Unit] =
    run(_.setInstrumentUtcDateTime(parts))
  def getNtpEnabled: Future[Boolean] = run(_.ntpEnabled)
  def setNtpEnabled(v: Boolean): Future[Unit] = run(_.setNtpEnabled(v))
  def getNtpServer: Future[String] = run(_.ntpServer)
  def setNtpServer(addr: String): Future[Unit] = run(_.setNtpServer(addr))
  def getPtpEnabled: Future[Boolean] = run(_.ptpEnabled)
  def setPtpEnabled(v: Boolean): Future[Unit] = run(_.setPtpEnabled(v))

  // --- one-shot snapshot reads (hyperion.py:1684-1705) ---
  def getPeaks: Future[Instrument.PeaksSnapshot] = run(_.peaks)
  def getSpectra: Future[Instrument.SpectrumSnapshot] = run(_.spectra)
  def getSensors: Future[Instrument.SensorsSnapshot] = run(_.sensors)

  // --- reboot (hyperion.py:1707-1713) ---
  def reboot(): Future[Unit] = run(_.reboot())

  // --- peak offsets + conversions (hyperion.py:1877-1955) ---
  def setPeakOffsetsInCounts(channel: Int, o: PeakOffsets): Future[Unit] =
    run(_.setPeakOffsetsInCounts(channel, o))
  def getPeakOffsets(channel: Int): Future[PeakOffsets] =
    run(_.getPeakOffsets(channel))
  def setPeakOffsetsInWavelength(channel: Int,
      wavelengthBoundaries: Seq[Double], distancesM: Seq[Double],
      indexOfRefraction: Double = InstrumentConfig.IndexOfRefraction)
      : Future[PeakOffsets] =
    run(_.setPeakOffsetsInWavelength(channel, wavelengthBoundaries,
      distancesM, indexOfRefraction))
  def clearPeakOffsets(channel: Option[Int] = None): Future[Unit] =
    run(_.clearPeakOffsets(channel))
  def convertWavelengthsToCounts(wls: Seq[Double],
      offsets: Option[Seq[Long]] = None): Future[Seq[Double]] =
    run(_.convertWavelengthsToCounts(wls, offsets))
  def convertCountsToWavelengths(counts: Seq[Double]): Future[Seq[Double]] =
    run(_.convertCountsToWavelengths(counts))

  // --- sensors (hyperion.py:1900-1955) ---
  def addSensor(name: String, model: String, channel: Int,
                wavelength: Double, calibrationFactor: Double,
                distance: Double = 0.0): Future[Unit] =
    run(_.addSensor(name, model, channel, wavelength, calibrationFactor,
      distance))
  def getSensorNames: Future[Seq[String]] = run(_.sensorNames)
  def exportSensors: Future[Seq[SensorExport]] = run(_.exportSensors)
  /** Removes sensors by name; with None, removes ALL currently defined
    * sensors — the reference's `remove_sensors(sensor_names=None)`
    * (hyperion.py:1933-1948).
    */
  def removeSensors(sensorNames: Option[Seq[String]] = None): Future[Unit] =
    run { h =>
      val names = sensorNames.getOrElse(h.sensorNames)
      names.foreach(h.removeSensor)
    }
  def saveSensors(): Future[Unit] = run(_.saveSensors())

  /** Close the persistent connection and stop the command executor.
    * Queued commands drain FIRST (bounded wait) — closing the
    * connection before the queue is empty would let a still-queued
    * command lazily REOPEN it, leaking a socket and running commands
    * after close. If the drain exceeds the bound (hung peer — socket
    * reads ignore interrupts), the connection is closed TERMINALLY,
    * which aborts the stuck read without touching the monitor that
    * read holds, and the still-queued command runnables run against
    * the now-fail-fast transport so every outstanding Future completes
    * (exceptionally) instead of hanging its waiter forever.
    */
  def close(): Unit = {
    executor.shutdown()
    val drained =
      try executor.awaitTermination(10, java.util.concurrent.TimeUnit.SECONDS)
      catch {
        case _: InterruptedException =>
          Thread.currentThread().interrupt()
          false
      }
    connection.closeTerminally()
    if (!drained)
      executor.shutdownNow().forEach(_.run()) // fail fast, complete Futures
  }
}
