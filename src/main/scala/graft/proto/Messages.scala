package graft.proto

import graft.codec.ProtoWire.{Reader, Writer}

/** Wire-compatible message model for the record families the engine ingests.
  *
  * The container cannot fetch the reference's proto descriptors, so field
  * numbers below are this project's own (documented in FIXTURES.md §B); the
  * fixture writer in each companion is the encoder, and decoders read only
  * the fields the reference's transforms consume (SURVEY §2.2 T1).
  * Structure mirrors the reference's message shapes: the speedtest report is
  * a 3-level nested unwrap (verified_speedtest.rs:31-48), mobile/iot reward
  * shares are oneofs (mobile_rewards.rs:22-49, iot_rewards.rs:15-33), the
  * radio reward carries three repeated children (radio_reward.rs:16-40), the
  * coverage object a key-type oneof plus one repeated child
  * (coverage.rs:54-91).
  */
object Messages {

  // ---- enums (T6: stored as name strings; names are fixture-defined) ----
  def speedtestResultName(v: Int): String = v match {
    case 0 => "SPEEDTEST_RESULT_VALID"
    case 1 => "SPEEDTEST_RESULT_TOO_SLOW"
    case 2 => "SPEEDTEST_RESULT_TOO_FEW"
    case other => s"SPEEDTEST_RESULT_UNKNOWN_$other"
  }
  def serviceProviderName(v: Int): String = v match {
    case 0 => "SERVICE_PROVIDER_UNKNOWN"
    case 1 => "SERVICE_PROVIDER_HELIUM_MOBILE"
    case other => s"SERVICE_PROVIDER_$other"
  }
  def unallocatedTypeName(v: Int): String = v match {
    case 0 => "UNALLOCATED_REWARD_TYPE_POC"
    case 1 => "UNALLOCATED_REWARD_TYPE_DISCOVERY_LOCATION"
    case 2 => "UNALLOCATED_REWARD_TYPE_MAPPER"
    case other => s"UNALLOCATED_REWARD_TYPE_$other"
  }
  def hexStatusName(v: Int): String = v match {
    case 0 => "BOOSTED_HEX_STATUS_ELIGIBLE"
    case 1 => "BOOSTED_HEX_STATUS_LOCATION"
    case other => s"BOOSTED_HEX_STATUS_$other"
  }
  def assignmentName(v: Int): String = v match {
    case 0 => "ASSIGNMENT_A"
    case 1 => "ASSIGNMENT_B"
    case 2 => "ASSIGNMENT_C"
    case other => s"ASSIGNMENT_$other"
  }
  def signalLevelName(v: Int): String = v match {
    case 0 => "SIGNAL_LEVEL_NONE"
    case 1 => "SIGNAL_LEVEL_LOW"
    case 2 => "SIGNAL_LEVEL_MEDIUM"
    case 3 => "SIGNAL_LEVEL_HIGH"
    case other => s"SIGNAL_LEVEL_$other"
  }

  // ---- verified speedtest (flat family, 3-level nesting) ----
  case class SpeedtestReq(pubKey: Array[Byte], serial: String, timestamp: Long,
                          uploadSpeed: Long, downloadSpeed: Long, latency: Int)
  case class SpeedtestIngest(report: Option[SpeedtestReq], receivedTimestamp: Long)
  case class VerifiedSpeedtest(report: Option[SpeedtestIngest], timestamp: Long, result: Int)

  object VerifiedSpeedtest {
    def decode(bytes: Array[Byte]): VerifiedSpeedtest = {
      var report: Option[SpeedtestIngest] = None
      var ts = 0L; var result = 0
      val r = new Reader(bytes)
      while (r.hasNext) r.readTag() match {
        case (1, _) => report = Some(decodeIngest(r.readMessage()))
        case (2, _) => ts = r.readVarint()
        case (3, _) => result = r.readVarint().toInt
        case (_, w) => r.skip(w)
      }
      VerifiedSpeedtest(report, ts, result)
    }
    private def decodeIngest(r: Reader): SpeedtestIngest = {
      var req: Option[SpeedtestReq] = None
      var received = 0L
      while (r.hasNext) r.readTag() match {
        case (1, _) => req = Some(decodeReq(r.readMessage()))
        case (2, _) => received = r.readVarint()
        case (_, w) => r.skip(w)
      }
      SpeedtestIngest(req, received)
    }
    private def decodeReq(r: Reader): SpeedtestReq = {
      var pk = Array.emptyByteArray; var serial = ""; var ts = 0L
      var up = 0L; var down = 0L; var lat = 0
      while (r.hasNext) r.readTag() match {
        case (1, _) => pk = r.readBytes()
        case (2, _) => serial = r.readString()
        case (3, _) => ts = r.readVarint()
        case (4, _) => up = r.readVarint()
        case (5, _) => down = r.readVarint()
        case (6, _) => lat = r.readVarint().toInt
        case (_, w) => r.skip(w)
      }
      SpeedtestReq(pk, serial, ts, up, down, lat)
    }
    def encode(v: VerifiedSpeedtest): Array[Byte] = {
      val w = new Writer
      v.report.foreach { ing =>
        val wi = new Writer
        ing.report.foreach { rq =>
          val wr = new Writer
          wr.bytes(1, rq.pubKey).string(2, rq.serial).int64(3, rq.timestamp)
            .int64(4, rq.uploadSpeed).int64(5, rq.downloadSpeed).int32(6, rq.latency)
          wi.message(1, wr)
        }
        wi.int64(2, ing.receivedTimestamp)
        w.message(1, wi)
      }
      w.int64(2, v.timestamp).int32(3, v.result).toBytes
    }
  }

  // ---- proto Decimal (T5) ----
  case class PDecimal(value: String)
  def decodeDecimal(r: Reader): PDecimal = {
    var v = ""
    while (r.hasNext) r.readTag() match {
      case (1, _) => v = r.readString()
      case (_, w) => r.skip(w)
    }
    PDecimal(v)
  }
  def encodeDecimal(v: String): Writer = new Writer().string(1, v)

  // ---- mobile reward share (6-way oneof + radio children) ----
  sealed trait MobileArm
  case class GatewayArm(hotspotKey: Array[Byte], dcTransferReward: Long,
                        rewardableBytes: Long, price: Long) extends MobileArm
  case class SubscriberArm(subscriberId: Array[Byte], discoveryLocationAmount: Long,
                           verificationMappingAmount: Long,
                           rewardOverrideEntityKey: String) extends MobileArm
  case class ServiceProviderArm(serviceProviderId: Int, amount: Long,
                                rewardableEntityKey: String) extends MobileArm
  case class UnallocatedArm(rewardType: Int, amount: Long) extends MobileArm
  case class PromotionArm(entity: String, serviceProviderAmount: Long,
                          matchedAmount: Long) extends MobileArm
  case class TrustScoreMsg(metersToAsserted: Long, trustScore: Option[String])
  case class RadioSpeedtestMsg(upload: Long, download: Long, latencyMs: Int, timestamp: Long)
  case class CoveredHexMsg(location: Long, baseCoveragePoints: Option[String],
                           boostedCoveragePoints: Option[String], urbanized: Int,
                           footfall: Int, landtype: Int, assignmentMultiplier: Option[String],
                           rank: Int, rankMultiplier: Option[String], boostedMultiplier: Int,
                           serviceProviderOverride: Boolean)
  case class SpeedtestAvgMsg(upload: Long, download: Long, latencyMs: Int, timestamp: Long)
  case class RadioArm(hotspotKey: Array[Byte],
                      baseCoveragePointsSum: Option[String],
                      boostedCoveragePointsSum: Option[String],
                      baseRewardShares: Option[String], boostedRewardShares: Option[String],
                      basePocReward: Long, boostedPocReward: Long,
                      seniorityTimestamp: Long, coverageObject: Array[Byte],
                      locationTrustScoreMultiplier: Option[String],
                      speedtestMultiplier: Option[String],
                      spBoostedHexStatus: Int, oracleBoostedHexStatus: Int,
                      speedtestAverage: Option[SpeedtestAvgMsg],
                      locationTrustScores: Seq[TrustScoreMsg],
                      speedtests: Seq[RadioSpeedtestMsg],
                      coveredHexes: Seq[CoveredHexMsg]) extends MobileArm
  case object DeprecatedArm extends MobileArm

  case class MobileRewardShare(startPeriod: Long, endPeriod: Long, reward: MobileArm)

  object MobileRewardShare {
    def decode(bytes: Array[Byte]): MobileRewardShare = {
      var start = 0L; var end = 0L
      var arm: MobileArm = DeprecatedArm
      val r = new Reader(bytes)
      while (r.hasNext) r.readTag() match {
        case (1, _) => start = r.readVarint()
        case (2, _) => end = r.readVarint()
        case (4, _) => arm = decodeGateway(r.readMessage())
        case (5, _) => arm = decodeSubscriber(r.readMessage())
        case (6, _) => arm = decodeServiceProvider(r.readMessage())
        case (7, _) => arm = decodeUnallocated(r.readMessage())
        case (8, _) => arm = decodePromotion(r.readMessage())
        case (9, _) => arm = decodeRadio(r.readMessage())
        case (3, w) => r.skip(w) // retired oneof arm → Deprecated
        case (_, w) => r.skip(w)
      }
      MobileRewardShare(start, end, arm)
    }
    private def decodeGateway(r: Reader): GatewayArm = {
      var pk = Array.emptyByteArray; var dc = 0L; var rb = 0L; var price = 0L
      while (r.hasNext) r.readTag() match {
        case (1, _) => pk = r.readBytes()
        case (2, _) => dc = r.readVarint()
        case (3, _) => rb = r.readVarint()
        case (4, _) => price = r.readVarint()
        case (_, w) => r.skip(w)
      }
      GatewayArm(pk, dc, rb, price)
    }
    private def decodeSubscriber(r: Reader): SubscriberArm = {
      var id = Array.emptyByteArray; var disc = 0L; var ver = 0L; var key = ""
      while (r.hasNext) r.readTag() match {
        case (1, _) => id = r.readBytes()
        case (2, _) => disc = r.readVarint()
        case (3, _) => ver = r.readVarint()
        case (4, _) => key = r.readString()
        case (_, w) => r.skip(w)
      }
      SubscriberArm(id, disc, ver, key)
    }
    private def decodeServiceProvider(r: Reader): ServiceProviderArm = {
      var sp = 0; var amount = 0L; var key = ""
      while (r.hasNext) r.readTag() match {
        case (1, _) => sp = r.readVarint().toInt
        case (2, _) => amount = r.readVarint()
        case (3, _) => key = r.readString()
        case (_, w) => r.skip(w)
      }
      ServiceProviderArm(sp, amount, key)
    }
    private def decodeUnallocated(r: Reader): UnallocatedArm = {
      var t = 0; var amount = 0L
      while (r.hasNext) r.readTag() match {
        case (1, _) => t = r.readVarint().toInt
        case (2, _) => amount = r.readVarint()
        case (_, w) => r.skip(w)
      }
      UnallocatedArm(t, amount)
    }
    private def decodePromotion(r: Reader): PromotionArm = {
      var entity = ""; var spAmount = 0L; var matched = 0L
      while (r.hasNext) r.readTag() match {
        case (1, _) => entity = r.readString()
        case (2, _) => spAmount = r.readVarint()
        case (3, _) => matched = r.readVarint()
        case (_, w) => r.skip(w)
      }
      PromotionArm(entity, spAmount, matched)
    }
    private def decodeTrustScore(r: Reader): TrustScoreMsg = {
      var m = 0L; var ts: Option[String] = None
      while (r.hasNext) r.readTag() match {
        case (1, _) => m = r.readVarint()
        case (2, _) => ts = Some(decodeDecimal(r.readMessage()).value)
        case (_, w) => r.skip(w)
      }
      TrustScoreMsg(m, ts)
    }
    private def decodeRadioSpeedtest(r: Reader): RadioSpeedtestMsg = {
      var up = 0L; var down = 0L; var lat = 0; var ts = 0L
      while (r.hasNext) r.readTag() match {
        case (1, _) => up = r.readVarint()
        case (2, _) => down = r.readVarint()
        case (3, _) => lat = r.readVarint().toInt
        case (4, _) => ts = r.readVarint()
        case (_, w) => r.skip(w)
      }
      RadioSpeedtestMsg(up, down, lat, ts)
    }
    private def decodeCoveredHex(r: Reader): CoveredHexMsg = {
      var loc = 0L; var base: Option[String] = None; var boosted: Option[String] = None
      var urb = 0; var foot = 0; var land = 0; var assign: Option[String] = None
      var rank = 0; var rankMult: Option[String] = None; var boostMult = 0
      var spOverride = false
      while (r.hasNext) r.readTag() match {
        case (1, _) => loc = r.readVarint()
        case (2, _) => base = Some(decodeDecimal(r.readMessage()).value)
        case (3, _) => boosted = Some(decodeDecimal(r.readMessage()).value)
        case (4, _) => urb = r.readVarint().toInt
        case (5, _) => foot = r.readVarint().toInt
        case (6, _) => land = r.readVarint().toInt
        case (7, _) => assign = Some(decodeDecimal(r.readMessage()).value)
        case (8, _) => rank = r.readVarint().toInt
        case (9, _) => rankMult = Some(decodeDecimal(r.readMessage()).value)
        case (10, _) => boostMult = r.readVarint().toInt
        case (11, _) => spOverride = r.readBool()
        case (_, w) => r.skip(w)
      }
      CoveredHexMsg(loc, base, boosted, urb, foot, land, assign, rank, rankMult,
        boostMult, spOverride)
    }
    private def decodeSpeedtestAvg(r: Reader): SpeedtestAvgMsg = {
      var up = 0L; var down = 0L; var lat = 0; var ts = 0L
      while (r.hasNext) r.readTag() match {
        case (1, _) => up = r.readVarint()
        case (2, _) => down = r.readVarint()
        case (3, _) => lat = r.readVarint().toInt
        case (4, _) => ts = r.readVarint()
        case (_, w) => r.skip(w)
      }
      SpeedtestAvgMsg(up, down, lat, ts)
    }
    private def decodeRadio(r: Reader): RadioArm = {
      var pk = Array.emptyByteArray
      var baseCov: Option[String] = None; var boostCov: Option[String] = None
      var baseShares: Option[String] = None; var boostShares: Option[String] = None
      var basePoc = 0L; var boostPoc = 0L; var seniority = 0L
      var covObj = Array.emptyByteArray
      var locMult: Option[String] = None; var stMult: Option[String] = None
      var spStatus = 0; var oracleStatus = 0
      var avg: Option[SpeedtestAvgMsg] = None
      val trust = Seq.newBuilder[TrustScoreMsg]
      val sts = Seq.newBuilder[RadioSpeedtestMsg]
      val hexes = Seq.newBuilder[CoveredHexMsg]
      while (r.hasNext) r.readTag() match {
        case (1, _) => pk = r.readBytes()
        case (2, _) => baseCov = Some(decodeDecimal(r.readMessage()).value)
        case (3, _) => boostCov = Some(decodeDecimal(r.readMessage()).value)
        case (4, _) => baseShares = Some(decodeDecimal(r.readMessage()).value)
        case (5, _) => boostShares = Some(decodeDecimal(r.readMessage()).value)
        case (6, _) => basePoc = r.readVarint()
        case (7, _) => boostPoc = r.readVarint()
        case (8, _) => seniority = r.readVarint()
        case (9, _) => covObj = r.readBytes()
        case (10, _) => locMult = Some(decodeDecimal(r.readMessage()).value)
        case (11, _) => stMult = Some(decodeDecimal(r.readMessage()).value)
        case (12, _) => spStatus = r.readVarint().toInt
        case (13, _) => oracleStatus = r.readVarint().toInt
        case (14, _) => avg = Some(decodeSpeedtestAvg(r.readMessage()))
        case (15, _) => trust += decodeTrustScore(r.readMessage())
        case (16, _) => sts += decodeRadioSpeedtest(r.readMessage())
        case (17, _) => hexes += decodeCoveredHex(r.readMessage())
        case (_, w) => r.skip(w)
      }
      RadioArm(pk, baseCov, boostCov, baseShares, boostShares, basePoc, boostPoc,
        seniority, covObj, locMult, stMult, spStatus, oracleStatus, avg,
        trust.result(), sts.result(), hexes.result())
    }

    def encode(v: MobileRewardShare): Array[Byte] = {
      val w = new Writer().int64(1, v.startPeriod).int64(2, v.endPeriod)
      v.reward match {
        case GatewayArm(pk, dc, rb, price) =>
          w.message(4, new Writer().bytes(1, pk).int64(2, dc).int64(3, rb).int64(4, price))
        case SubscriberArm(id, disc, ver, key) =>
          w.message(5, new Writer().bytes(1, id).int64(2, disc).int64(3, ver).string(4, key))
        case ServiceProviderArm(sp, amount, key) =>
          w.message(6, new Writer().int32(1, sp).int64(2, amount).string(3, key))
        case UnallocatedArm(t, amount) =>
          w.message(7, new Writer().int32(1, t).int64(2, amount))
        case PromotionArm(entity, spAmount, matched) =>
          w.message(8, new Writer().string(1, entity).int64(2, spAmount).int64(3, matched))
        case radio: RadioArm =>
          val wr = new Writer().bytes(1, radio.hotspotKey)
          radio.baseCoveragePointsSum.foreach(d => wr.message(2, encodeDecimal(d)))
          radio.boostedCoveragePointsSum.foreach(d => wr.message(3, encodeDecimal(d)))
          radio.baseRewardShares.foreach(d => wr.message(4, encodeDecimal(d)))
          radio.boostedRewardShares.foreach(d => wr.message(5, encodeDecimal(d)))
          wr.int64(6, radio.basePocReward).int64(7, radio.boostedPocReward)
            .int64(8, radio.seniorityTimestamp).bytes(9, radio.coverageObject)
          radio.locationTrustScoreMultiplier.foreach(d => wr.message(10, encodeDecimal(d)))
          radio.speedtestMultiplier.foreach(d => wr.message(11, encodeDecimal(d)))
          wr.int32(12, radio.spBoostedHexStatus).int32(13, radio.oracleBoostedHexStatus)
          radio.speedtestAverage.foreach { a =>
            wr.message(14, new Writer().int64(1, a.upload).int64(2, a.download)
              .int32(3, a.latencyMs).int64(4, a.timestamp))
          }
          radio.locationTrustScores.foreach { t =>
            val wt = new Writer().int64(1, t.metersToAsserted)
            t.trustScore.foreach(d => wt.message(2, encodeDecimal(d)))
            wr.message(15, wt)
          }
          radio.speedtests.foreach { s =>
            wr.message(16, new Writer().int64(1, s.upload).int64(2, s.download)
              .int32(3, s.latencyMs).int64(4, s.timestamp))
          }
          radio.coveredHexes.foreach { h =>
            val wh = new Writer().int64(1, h.location)
            h.baseCoveragePoints.foreach(d => wh.message(2, encodeDecimal(d)))
            h.boostedCoveragePoints.foreach(d => wh.message(3, encodeDecimal(d)))
            wh.int32(4, h.urbanized).int32(5, h.footfall).int32(6, h.landtype)
            h.assignmentMultiplier.foreach(d => wh.message(7, encodeDecimal(d)))
            wh.int32(8, h.rank)
            h.rankMultiplier.foreach(d => wh.message(9, encodeDecimal(d)))
            wh.int32(10, h.boostedMultiplier).bool(11, h.serviceProviderOverride)
            wr.message(17, wh)
          }
          w.message(9, wr)
        case DeprecatedArm =>
          w.message(3, new Writer().int64(1, 0L)) // retired arm
      }
      w.toBytes
    }
  }

  // ---- iot reward share (3-way oneof) ----
  sealed trait IotArm
  case class IotGatewayArm(hotspotKey: Array[Byte], beaconAmount: Long,
                           witnessAmount: Long, dcTransferAmount: Long) extends IotArm
  case class IotOperationalArm(amount: Long) extends IotArm
  case class IotUnallocatedArm(rewardType: Int, amount: Long) extends IotArm
  case object IotDeprecatedArm extends IotArm

  case class IotRewardShare(startPeriod: Long, endPeriod: Long, reward: IotArm)

  object IotRewardShare {
    def decode(bytes: Array[Byte]): IotRewardShare = {
      var start = 0L; var end = 0L
      var arm: IotArm = IotDeprecatedArm
      val r = new Reader(bytes)
      while (r.hasNext) r.readTag() match {
        case (1, _) => start = r.readVarint()
        case (2, _) => end = r.readVarint()
        case (3, _) =>
          val g = r.readMessage()
          var pk = Array.emptyByteArray; var b = 0L; var wit = 0L; var dc = 0L
          while (g.hasNext) g.readTag() match {
            case (1, _) => pk = g.readBytes()
            case (2, _) => b = g.readVarint()
            case (3, _) => wit = g.readVarint()
            case (4, _) => dc = g.readVarint()
            case (_, w) => g.skip(w)
          }
          arm = IotGatewayArm(pk, b, wit, dc)
        case (4, _) =>
          val o = r.readMessage()
          var amount = 0L
          while (o.hasNext) o.readTag() match {
            case (1, _) => amount = o.readVarint()
            case (_, w) => o.skip(w)
          }
          arm = IotOperationalArm(amount)
        case (5, _) =>
          val u = r.readMessage()
          var t = 0; var amount = 0L
          while (u.hasNext) u.readTag() match {
            case (1, _) => t = u.readVarint().toInt
            case (2, _) => amount = u.readVarint()
            case (_, w) => u.skip(w)
          }
          arm = IotUnallocatedArm(t, amount)
        case (_, w) => r.skip(w)
      }
      IotRewardShare(start, end, arm)
    }
    def encode(v: IotRewardShare): Array[Byte] = {
      val w = new Writer().int64(1, v.startPeriod).int64(2, v.endPeriod)
      v.reward match {
        case IotGatewayArm(pk, b, wit, dc) =>
          w.message(3, new Writer().bytes(1, pk).int64(2, b).int64(3, wit).int64(4, dc))
        case IotOperationalArm(amount) =>
          w.message(4, new Writer().int64(1, amount))
        case IotUnallocatedArm(t, amount) =>
          w.message(5, new Writer().int32(1, t).int64(2, amount))
        case IotDeprecatedArm =>
          w.message(6, new Writer().int64(1, 0L))
      }
      w.toBytes
    }
  }

  // ---- coverage object (key-type oneof + repeated locations) ----
  sealed trait CoverageKey
  case class HotspotKey(bytes: Array[Byte]) extends CoverageKey
  case class CbsdId(id: String) extends CoverageKey
  case object UnknownKey extends CoverageKey

  case class CoverageLocationMsg(location: String, signalLevel: Int, signalPower: Int)
  case class CoverageObjectV1(keyType: CoverageKey, uuid: Array[Byte],
                              coverageClaimTime: Long, indoor: Boolean,
                              coverage: Seq[CoverageLocationMsg])

  object CoverageObjectV1 {
    def decode(bytes: Array[Byte]): CoverageObjectV1 = {
      // outer wrapper: field 1 = coverage_object request
      val outer = new Reader(bytes)
      var inner: Reader = null
      while (outer.hasNext) outer.readTag() match {
        case (1, _) => inner = outer.readMessage()
        case (_, w) => outer.skip(w)
      }
      if (inner == null) throw new graft.codec.ProtoWire.Malformed("missing coverage_object")
      var key: CoverageKey = UnknownKey
      var uuid = Array.emptyByteArray; var claim = 0L; var indoor = false
      val locs = Seq.newBuilder[CoverageLocationMsg]
      while (inner.hasNext) inner.readTag() match {
        case (1, _) => key = HotspotKey(inner.readBytes())
        case (2, _) => key = CbsdId(inner.readString())
        case (3, _) => uuid = inner.readBytes()
        case (4, _) => claim = inner.readVarint()
        case (5, _) => indoor = inner.readBool()
        case (6, _) =>
          val l = inner.readMessage()
          var loc = ""; var level = 0; var power = 0
          while (l.hasNext) l.readTag() match {
            case (1, _) => loc = l.readString()
            case (2, _) => level = l.readVarint().toInt
            case (3, _) => power = l.readVarint().toInt
            case (_, w) => l.skip(w)
          }
          locs += CoverageLocationMsg(loc, level, power)
        case (_, w) => inner.skip(w)
      }
      CoverageObjectV1(key, uuid, claim, indoor, locs.result())
    }
    def encode(v: CoverageObjectV1): Array[Byte] = {
      val inner = new Writer()
      v.keyType match {
        case HotspotKey(b) => inner.bytes(1, b)
        case CbsdId(id) => inner.string(2, id)
        case UnknownKey => ()
      }
      inner.bytes(3, v.uuid).int64(4, v.coverageClaimTime).bool(5, v.indoor)
      v.coverage.foreach { l =>
        inner.message(6, new Writer().string(1, l.location).int32(2, l.signalLevel)
          .int32(3, l.signalPower))
      }
      new Writer().message(1, inner).toBytes
    }
  }
}
