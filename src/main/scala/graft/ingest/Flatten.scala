package graft.ingest

import graft.codec.{Base58Check, Scalars}
import graft.proto.Messages
import graft.proto.Messages._
import graft.sources.FrameSource.RawFrame
import Tables._

/** Frame → flat-row transforms (T1–T10): nested-option unwrapping, base58
  * pubkeys, UUID-from-bytes, sec/ms timestamps, decimal-with-default,
  * enum names, key coalescing, epoch-window propagation.
  */
object Flatten {

  /** T1 flat case (verified_speedtest.rs:31-48): 3-level unwrap; a missing
    * inner report is a malformed record (the reference unwraps and panics
    * per record — here it throws, and S10 tolerance drops the record). */
  def speedtest(f: RawFrame): VerifiedSpeedtestReport = {
    val v = Messages.VerifiedSpeedtest.decode(f.bytes)
    val ingest = v.report.getOrElse(throw new ProtoFieldMissing("report"))
    val req = ingest.report.getOrElse(throw new ProtoFieldMissing("report.report"))
    VerifiedSpeedtestReport(
      hotspot_key = Base58Check.encodePubKey(req.pubKey),
      serial = req.serial,
      timestamp = Scalars.timestampAuto(req.timestamp),
      upload_speed = req.uploadSpeed,
      download_speed = req.downloadSpeed,
      latency = req.latency,
      received_timestamp = Scalars.timestampAuto(ingest.receivedTimestamp),
      verified_timestamp = Scalars.timestampAuto(v.timestamp),
      result = Messages.speedtestResultName(v.result),
      file_source = f.file_source)
  }

  /** D1: one share → tagged wide row; T10 epoch-window propagation into
    * every arm (mobile_rewards.rs:24-25). */
  def mobileShare(f: RawFrame): MobileShareFlat = {
    val share = Messages.MobileRewardShare.decode(f.bytes)
    val start = Scalars.timestampAuto(share.startPeriod)
    val end = Scalars.timestampAuto(share.endPeriod)
    val base = MobileShareFlat(start, end, "deprecated", f.file_source,
      None, None, None, None, None, None)
    share.reward match {
      case g: GatewayArm => base.copy(arm = "gateway", gateway = Some(GatewayFlat(
        Base58Check.encodePubKey(g.hotspotKey), g.dcTransferReward, g.rewardableBytes, g.price)))
      case s: SubscriberArm => base.copy(arm = "subscriber", subscriber = Some(SubscriberFlat(
        Scalars.uuidFromBytes(s.subscriberId), s.discoveryLocationAmount,
        s.verificationMappingAmount, s.rewardOverrideEntityKey)))
      case s: ServiceProviderArm => base.copy(arm = "service_provider",
        service_provider = Some(ServiceProviderFlat(
          Messages.serviceProviderName(s.serviceProviderId), s.amount, s.rewardableEntityKey)))
      case u: UnallocatedArm => base.copy(arm = "unallocated", unallocated = Some(
        UnallocatedFlat(Messages.unallocatedTypeName(u.rewardType), u.amount)))
      case p: PromotionArm => base.copy(arm = "promotion", promotion = Some(
        PromotionFlat(p.entity, p.serviceProviderAmount, p.matchedAmount)))
      case r: RadioArm => base.copy(arm = "radio", radio = Some(radioFlat(f, r)))
      case DeprecatedArm => base
    }
  }

  /** D3/D4: radio reward + 3 child collections under a deterministic
    * surrogate id (deviation from the reference's UUIDv4, radio_reward.rs:117
    * — documented; derived from (file_source, frame_index) so re-ingest is
    * reproducible). Missing speedtest_average is malformed per the
    * reference's unwrap (radio_reward.rs:142). */
  private def radioFlat(f: RawFrame, r: RadioArm): RadioFlat = {
    val id = Scalars.surrogateId(f.file_source, f.frame_index)
    val avg = r.speedtestAverage.getOrElse(throw new ProtoFieldMissing("speedtest_average"))
    RadioFlat(
      id = id,
      hotspot_key = Base58Check.encodePubKey(r.hotspotKey),
      base_coverage_points_sum = Scalars.protoDecimal(r.baseCoveragePointsSum),
      boosted_coverage_points_sum = Scalars.protoDecimal(r.boostedCoveragePointsSum),
      base_reward_shares = Scalars.protoDecimal(r.baseRewardShares),
      boosted_reward_shares = Scalars.protoDecimal(r.boostedRewardShares),
      base_poc_reward = r.basePocReward,
      boosted_poc_reward = r.boostedPocReward,
      seniority_timestamp = Scalars.timestampAuto(r.seniorityTimestamp),
      coverage_object = Scalars.uuidFromBytes(r.coverageObject),
      location_trust_score_multiplier = Scalars.protoDecimal(r.locationTrustScoreMultiplier),
      speedtest_multiplier = Scalars.protoDecimal(r.speedtestMultiplier),
      sp_boosted_hex_status = Messages.hexStatusName(r.spBoostedHexStatus),
      oracle_boosted_hex_status = Messages.hexStatusName(r.oracleBoostedHexStatus),
      speedtest_avg_upload = avg.upload,
      speedtest_avg_download = avg.download,
      speedtest_avg_latency_ms = avg.latencyMs,
      speedtest_avg_timestamp = Scalars.timestampAuto(avg.timestamp),
      location_trust_scores = r.locationTrustScores.map(t =>
        TrustScoreFlat(t.metersToAsserted, Scalars.protoDecimal(t.trustScore))),
      speedtests = r.speedtests.map(s =>
        RadioSpeedtestFlat(s.upload, s.download, s.latencyMs, Scalars.timestampAuto(s.timestamp))),
      covered_hexes = r.coveredHexes.map(h =>
        CoveredHexFlat(h.location, Scalars.protoDecimal(h.baseCoveragePoints),
          Scalars.protoDecimal(h.boostedCoveragePoints),
          Messages.assignmentName(h.urbanized), Messages.assignmentName(h.footfall),
          Messages.assignmentName(h.landtype), Scalars.protoDecimal(h.assignmentMultiplier),
          h.rank, Scalars.protoDecimal(h.rankMultiplier), h.boostedMultiplier,
          h.serviceProviderOverride)))
  }

  /** D2: iot 3-way demux (iot_rewards.rs:15-33). */
  def iotShare(f: RawFrame): IotShareFlat = {
    val share = Messages.IotRewardShare.decode(f.bytes)
    val start = Scalars.timestampAuto(share.startPeriod)
    val end = Scalars.timestampAuto(share.endPeriod)
    val base = IotShareFlat(start, end, "deprecated", f.file_source, None, None, None)
    share.reward match {
      case g: IotGatewayArm => base.copy(arm = "gateway", gateway = Some(IotGatewayFlat(
        Base58Check.encodePubKey(g.hotspotKey), g.beaconAmount, g.witnessAmount,
        g.dcTransferAmount)))
      case o: IotOperationalArm =>
        base.copy(arm = "operational", operational = Some(IotOperationalFlat(o.amount)))
      case u: IotUnallocatedArm => base.copy(arm = "unallocated", unallocated = Some(
        IotUnallocatedFlat(Messages.unallocatedTypeName(u.rewardType), u.amount)))
      case IotDeprecatedArm => base
    }
  }

  /** D5 + T7: coverage key-type coalesce (coverage.rs:58-67 — an unknown key
    * type is fail-fast in the reference; here it throws → S10 drop). */
  def coverage(f: RawFrame): CoverageObjectFlat = {
    val v = Messages.CoverageObjectV1.decode(f.bytes)
    val (radioKey, radioType) = v.keyType match {
      case HotspotKey(b) => (Base58Check.encodePubKey(b), "wifi")
      case CbsdId(id) => (id, "cbrs")
      case UnknownKey => throw new ProtoFieldMissing("key_type")
    }
    CoverageObjectFlat(
      radio_key = radioKey,
      radio_type = radioType,
      uuid = Scalars.uuidFromBytes(v.uuid),
      coverage_claim_time = Scalars.timestampAuto(v.coverageClaimTime),
      indoor = v.indoor,
      file_source = f.file_source,
      locations = v.coverage.map(l => CoverageLocationFlat(
        l.location, Messages.signalLevelName(l.signalLevel), l.signalPower)))
  }

  final class ProtoFieldMissing(field: String)
    extends RuntimeException(s"required field missing: $field")
}
