package graft.ingest

import graft.codec.{Base58Check, Scalars}
import graft.proto.DynMessage
import graft.proto.DynMessage.Msg
import graft.sources.FrameSource.RawFrame
import MoreTables._

/** Flatten transforms for the remaining 16 record types, over the generic
  * wire view. Field numbers are this project's fixture convention
  * (FIXTURES.md §B); semantics follow the reference module cited on each
  * function. Required-message absence throws → S10 drops the record.
  */
object MoreFlatten {

  private def b58(b: Array[Byte]): String = Base58Check.encodePubKey(b)
  private def ts(v: Long): java.sql.Timestamp = Scalars.timestampAuto(v)

  // T6 enum-name tables (fixture-defined names, reference shape `as_str_name`)
  private def statusName(v: Int) = v match {
    case 0 => "REPORT_STATUS_VALID"; case 1 => "REPORT_STATUS_INVALID"
    case o => s"REPORT_STATUS_$o"
  }
  private def techName(v: Int) = v match {
    case 0 => "RADIO_ACCESS_TECHNOLOGY_WLAN"; case 1 => "RADIO_ACCESS_TECHNOLOGY_CBRS"
    case o => s"RADIO_ACCESS_TECHNOLOGY_$o"
  }
  private def carrierName(v: Int) = v match {
    case 0 => "CARRIER_ID_UNKNOWN"; case 1 => "CARRIER_ID_HELIUM_MOBILE"
    case o => s"CARRIER_ID_$o"
  }
  private def validityName(v: Int) = v match {
    case 0 => "HEARTBEAT_VALIDITY_VALID"; case 1 => "HEARTBEAT_VALIDITY_INVALID"
    case o => s"HEARTBEAT_VALIDITY_$o"
  }
  private def locSourceName(v: Int) = v match {
    case 0 => "LOCATION_SOURCE_ASSERTED"; case 1 => "LOCATION_SOURCE_GPS"
    case o => s"LOCATION_SOURCE_$o"
  }
  private def reasonName(v: Int) = v match {
    case 0 => "REASON_NOT_ENOUGH_DATA"; case 1 => "REASON_STALE"; case o => s"REASON_$o"
  }
  private def banTypeName(v: Int) = v match {
    case 0 => "BAN_TYPE_ALL"; case 1 => "BAN_TYPE_POC"; case o => s"BAN_TYPE_$o"
  }

  private def parse(f: RawFrame): Msg = DynMessage.parse(f.bytes)

  /** data_transfer.rs:35-52 — 2-level unwrap. */
  def dataTransferIngest(f: RawFrame): DataTransferIngestReport = {
    val ingest = parse(f)
    val req = ingest.reqMsg(1)
    val usage = req.reqMsg(1)
    DataTransferIngestReport(b58(usage.bytes(1)), usage.i64(2), usage.i64(3),
      req.i64(2), techName(usage.i32(4)), usage.str(5), b58(usage.bytes(6)),
      ts(usage.i64(7)), ts(ingest.i64(2)), carrierName(req.i32(3)), f.file_source)
  }

  /** data_transfer.rs:82-102 — 3-level unwrap. */
  def verifiedDataTransfer(f: RawFrame): VerifiedDataTransferIngestReport = {
    val v = parse(f)
    val ingest = v.reqMsg(1)
    val req = ingest.reqMsg(1)
    val usage = req.reqMsg(1)
    VerifiedDataTransferIngestReport(b58(usage.bytes(1)), usage.i64(2), usage.i64(3),
      req.i64(2), techName(usage.i32(4)), usage.str(5), b58(usage.bytes(6)),
      ts(usage.i64(7)), ts(ingest.i64(2)), ts(v.i64(2)), statusName(v.i32(3)),
      carrierName(req.i32(3)), f.file_source)
  }

  /** data_transfer.rs:130-145. */
  def dataTransferBurn(f: RawFrame): DataTransferBurn = {
    val m = parse(f)
    DataTransferBurn(b58(m.bytes(1)), m.i64(2), m.i64(3), m.i64(4), b58(m.bytes(5)),
      ts(m.i64(6)), ts(m.i64(7)), m.i64(8), ts(m.i64(9)), f.file_source)
  }

  /** heartbeats.rs:33-50. */
  def verifiedWifiHeartbeat(f: RawFrame): VerifiedWifiHeartbeat = {
    val m = parse(f)
    VerifiedWifiHeartbeat(b58(m.bytes(1)), ts(m.i64(2)), validityName(m.i32(3)),
      m.dbl(4), m.dbl(5), Scalars.uuidFromBytes(m.bytes(6)), ts(m.i64(7)),
      m.i64(8), m.i32(9), locSourceName(m.i32(10)), f.file_source)
  }

  /** heartbeats.rs:76-96 — missing report is malformed (`expect`). */
  def wifiHeartbeatIngest(f: RawFrame): WifiHeartbeatIngestReport = {
    val v = parse(f)
    val r = v.reqMsg(1)
    WifiHeartbeatIngestReport(b58(r.bytes(1)), ts(r.i64(2)), r.dbl(3), r.dbl(4),
      Scalars.uuidFromBytes(r.bytes(5)), ts(v.i64(2)), r.bool(6), ts(r.i64(7)),
      locSourceName(r.i32(8)), f.file_source)
  }

  /** boosting.rs:28-41 — T8 first-element with default 0. */
  def boostedHexUpdate(f: RawFrame): BoostedHexUpdate = {
    val v = parse(f)
    val u = v.reqMsg(2)
    BoostedHexUpdate(ts(v.i64(1)), u.i64(1), ts(u.i64(2)), ts(u.i64(3)), u.i32(4),
      u.i64s(5).headOption.getOrElse(0L).toInt, u.i32(6), f.file_source)
  }

  /** subscribers.rs:28-41. */
  def subscriberActivityIngest(f: RawFrame): SubscriberMappingActivityIngest = {
    val v = parse(f)
    val r = v.reqMsg(1)
    SubscriberMappingActivityIngest(Scalars.uuidFromBytes(r.bytes(1)), r.i64(2),
      r.i64(3), ts(r.i64(4)), ts(v.i64(2)), r.str(5), f.file_source)
  }

  /** subscribers.rs:64-80 — 3-level unwrap. */
  def verifiedSubscriberActivity(f: RawFrame): VerifiedSubscriberMappingActivity = {
    val v = parse(f)
    val ingest = v.reqMsg(1)
    val r = ingest.reqMsg(1)
    VerifiedSubscriberMappingActivity(Scalars.uuidFromBytes(r.bytes(1)), r.i64(2),
      r.i64(3), ts(r.i64(4)), ts(ingest.i64(2)), ts(v.i64(2)), r.str(5),
      statusName(v.i32(3)), f.file_source)
  }

  /** radio_thresholds.rs:30-50 — T7 coalesce: pubkey nonempty else cbsd_id. */
  def verifiedRadioThreshold(f: RawFrame): VerifiedRadioThreshold = {
    val v = parse(f)
    val ingest = v.reqMsg(1)
    val r = ingest.reqMsg(1)
    val key = if (r.bytes(1).nonEmpty) b58(r.bytes(1)) else r.str(2)
    VerifiedRadioThreshold(key, r.i64(3), r.i32(4), ts(r.i64(5)), ts(ingest.i64(2)),
      ts(v.i64(2)), statusName(v.i32(3)), f.file_source)
  }

  /** radio_thresholds.rs:71-91. */
  def verifiedInvalidatedThreshold(f: RawFrame): VerifiedInvalidatedRadioThreshold = {
    val v = parse(f)
    val ingest = v.reqMsg(1)
    val r = ingest.reqMsg(1)
    val key = if (r.bytes(1).nonEmpty) b58(r.bytes(1)) else r.str(2)
    VerifiedInvalidatedRadioThreshold(key, reasonName(r.i32(3)), ts(r.i64(4)),
      ts(ingest.i64(2)), ts(v.i64(2)), statusName(v.i32(3)), f.file_source)
  }

  /** sp_banned_radio.rs:30-54 — key-type oneof; unknown → malformed. */
  def verifiedCdrVerification(f: RawFrame): VerifiedCdrVerification = {
    val v = parse(f)
    val ingest = v.reqMsg(1)
    val r = ingest.reqMsg(1)
    val key =
      if (r.has(1)) b58(r.bytes(1))
      else if (r.has(2)) r.str(2)
      else throw new Flatten.ProtoFieldMissing("key_type")
    VerifiedCdrVerification(key, reasonName(r.i32(3)), ts(r.i64(4)),
      banTypeName(r.i32(5)), ts(ingest.i64(2)), ts(v.i64(2)),
      statusName(v.i32(3)), f.file_source)
  }

  /** unique_connections.rs:32-50. */
  def verifiedUniqueConnections(f: RawFrame): VerifiedUniqueConnections = {
    val v = parse(f)
    val ingest = v.reqMsg(1)
    val r = ingest.reqMsg(1)
    VerifiedUniqueConnections(b58(r.bytes(1)), ts(r.i64(2)), ts(r.i64(3)), r.i64(4),
      ts(r.i64(5)), ts(ingest.i64(2)), ts(v.i64(2)), statusName(v.i32(3)), f.file_source)
  }

  /** enabled_carriers_info.rs:22-44 — T9 repeated enums → arrays. */
  def enabledCarriersInfo(f: RawFrame): EnabledCarriersInfo = {
    val v = parse(f)
    val r = v.reqMsg(1)
    EnabledCarriersInfo(b58(r.bytes(1)),
      r.i64s(2).map(e => carrierName(e.toInt)),
      r.i64s(3).map(e => carrierName(e.toInt)),
      r.str(4), ts(r.i64(5)), f.file_source)
  }

  /** usage.rs:37-75 — T9 repeated message → typed array. */
  def radioUsageStats(f: RawFrame): RadioUsageStats = {
    val v = parse(f)
    val r = v.reqMsg(1)
    RadioUsageStats(b58(r.bytes(1)), ts(r.i64(2)), ts(r.i64(3)), r.i64(4), r.i64(5),
      r.i64(6), r.i64(7), r.i64(8), ts(r.i64(9)), ts(v.i64(2)),
      r.msgs(10).map(x => CarrierTransfer(carrierName(x.i32(1)), x.i64(2), x.i64(3))),
      f.file_source)
  }

  /** usage_v2.rs:40-107 — two typed arrays. */
  def radioUsageStatsV2(f: RawFrame): RadioUsageStatsV2 = {
    val v = parse(f)
    val r = v.reqMsg(1)
    RadioUsageStatsV2(b58(r.bytes(1)), ts(r.i64(2)), ts(r.i64(3)), ts(r.i64(4)),
      ts(v.i64(2)), b58(r.bytes(5)), r.i64(6), r.i64(7), r.i64(8), r.i64(9), r.i64(10),
      r.msgs(11).map(x => CarrierTransferV2(carrierName(x.i32(1)), x.i64(2), x.i64(3), x.i64(4))),
      r.msgs(12).map(x => SamplingCarrierTransfer(carrierName(x.i32(1)), x.i64(2), x.i64(3))),
      f.file_source)
  }

  /** mobile_rewards.rs:280-293 — manifest with written_files array. */
  def rewardManifest(f: RawFrame): MobileRewardManifest = {
    val m = parse(f)
    val files = m.fields.getOrElse(1, Vector.empty)
      .collect { case DynMessage.VBytes(b) => new String(b, "UTF-8") }
    MobileRewardManifest(ts(m.i64(2)), ts(m.i64(3)), m.i64(5), m.i64(6), files,
      f.file_source)
  }
}
