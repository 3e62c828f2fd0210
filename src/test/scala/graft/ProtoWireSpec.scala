package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.proto.Messages
import graft.proto.Messages._
import graft.codec.ProtoWire

class ProtoWireSpec extends AnyFunSuite with GenChecks {

  private val genBytes = Gen.chooseNum(0, 40).flatMap(n =>
    Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
  private val genU64 = Gen.chooseNum(0L, Long.MaxValue)
  private val genStr = Gen.alphaNumStr.map(_.take(30))
  private val genDec = Gen.option(Gen.chooseNum(0, 999999).map(n => s"$n.${n % 100}"))

  private def eqBytes(a: Array[Byte], b: Array[Byte]) = assert(a.sameElements(b))

  test("speedtest roundtrip (3-level nesting)") {
    val gen = for {
      pk <- genBytes; serial <- genStr; ts <- genU64; up <- genU64
      down <- genU64; lat <- Gen.chooseNum(0, Int.MaxValue)
      recv <- genU64; vts <- genU64; res <- Gen.chooseNum(0, 3)
    } yield VerifiedSpeedtest(Some(SpeedtestIngest(
      Some(SpeedtestReq(pk, serial, ts, up, down, lat)), recv)), vts, res)
    forAll(gen) { v =>
      val back = VerifiedSpeedtest.decode(VerifiedSpeedtest.encode(v))
      eqBytes(back.report.get.report.get.pubKey, v.report.get.report.get.pubKey)
      assert(back.copy(report = None) == v.copy(report = None))
      assert(back.report.get.receivedTimestamp == v.report.get.receivedTimestamp)
      assert(back.report.get.report.get.copy(pubKey = null) ==
        v.report.get.report.get.copy(pubKey = null))
    }
  }

  test("mobile share roundtrip across all oneof arms") {
    val genArm: Gen[MobileArm] = Gen.oneOf(
      for { pk <- genBytes; a <- genU64; b <- genU64; c <- genU64 } yield GatewayArm(pk, a, b, c),
      for { a <- genU64; b <- genU64; k <- genStr } yield
        SubscriberArm(Array.tabulate[Byte](16)(_.toByte), a, b, k),
      for { sp <- Gen.chooseNum(0, 2); a <- genU64; k <- genStr } yield ServiceProviderArm(sp, a, k),
      for { t <- Gen.chooseNum(0, 2); a <- genU64 } yield UnallocatedArm(t, a),
      for { e <- genStr; a <- genU64; m <- genU64 } yield PromotionArm(e, a, m))
    val gen = for { s <- genU64; e <- genU64; arm <- genArm } yield MobileRewardShare(s, e, arm)
    forAll(gen) { v =>
      val back = MobileRewardShare.decode(MobileRewardShare.encode(v))
      assert(back.startPeriod == v.startPeriod && back.endPeriod == v.endPeriod)
      (back.reward, v.reward) match {
        case (a: GatewayArm, b: GatewayArm) =>
          eqBytes(a.hotspotKey, b.hotspotKey)
          assert(a.copy(hotspotKey = null) == b.copy(hotspotKey = null))
        case (a: SubscriberArm, b: SubscriberArm) =>
          eqBytes(a.subscriberId, b.subscriberId)
          assert(a.copy(subscriberId = null) == b.copy(subscriberId = null))
        case (a, b) => assert(a == b)
      }
    }
  }

  test("radio arm roundtrip preserves children and decimals") {
    val gen = for {
      nTrust <- Gen.chooseNum(0, 4); nSt <- Gen.chooseNum(0, 3); nHex <- Gen.chooseNum(0, 5)
      d1 <- genDec; d2 <- genDec
    } yield RadioArm(
      hotspotKey = Array[Byte](1, 2, 3),
      baseCoveragePointsSum = d1, boostedCoveragePointsSum = d2,
      baseRewardShares = Some("12.5"), boostedRewardShares = None,
      basePocReward = 10L, boostedPocReward = 20L,
      seniorityTimestamp = 1700000000L,
      coverageObject = Array.tabulate[Byte](16)(i => (i * 3).toByte),
      locationTrustScoreMultiplier = Some("0.75"), speedtestMultiplier = None,
      spBoostedHexStatus = 1, oracleBoostedHexStatus = 0,
      speedtestAverage = Some(SpeedtestAvgMsg(5, 6, 7, 1700000001L)),
      locationTrustScores = Seq.tabulate(nTrust)(i => TrustScoreMsg(i.toLong, Some(s"0.$i"))),
      speedtests = Seq.tabulate(nSt)(i => RadioSpeedtestMsg(i, i + 1, i + 2, 1700000000L + i)),
      coveredHexes = Seq.tabulate(nHex)(i => CoveredHexMsg(i.toLong, Some(s"$i.0"), None,
        i % 3, (i + 1) % 3, (i + 2) % 3, Some("1.0"), i, Some("0.5"), i, i % 2 == 0)))
    forAll(gen) { radio =>
      val share = MobileRewardShare(1L, 2L, radio)
      val back = MobileRewardShare.decode(MobileRewardShare.encode(share))
      val r = back.reward.asInstanceOf[RadioArm]
      assert(r.locationTrustScores == radio.locationTrustScores)
      assert(r.speedtests == radio.speedtests)
      assert(r.coveredHexes == radio.coveredHexes)
      assert(r.baseCoveragePointsSum == radio.baseCoveragePointsSum)
      assert(r.speedtestAverage == radio.speedtestAverage)
    }
  }

  test("iot share roundtrip; unknown arm decodes as Deprecated") {
    val share = IotRewardShare(1L, 2L, IotGatewayArm(Array[Byte](9), 1, 2, 3))
    val back = IotRewardShare.decode(IotRewardShare.encode(share))
    assert(back.reward.asInstanceOf[IotGatewayArm].beaconAmount == 1)
    val dep = IotRewardShare.decode(IotRewardShare.encode(IotRewardShare(1L, 2L, IotDeprecatedArm)))
    assert(dep.reward == IotDeprecatedArm)
    val depMobile = MobileRewardShare.decode(MobileRewardShare.encode(
      MobileRewardShare(1L, 2L, DeprecatedArm)))
    assert(depMobile.reward == DeprecatedArm)
  }

  test("coverage roundtrip with both key types") {
    val uuid = Array.tabulate[Byte](16)(_.toByte)
    for (key <- Seq(HotspotKey(Array[Byte](1, 2)), CbsdId("cbsd-1"))) {
      val v = CoverageObjectV1(key, uuid, 1700000000L, indoor = true,
        Seq(CoverageLocationMsg("8c2681a30641dff", 2, -90),
          CoverageLocationMsg("8c2681a30641dfe", 1, -100)))
      val back = CoverageObjectV1.decode(CoverageObjectV1.encode(v))
      assert(back.coverage == v.coverage)
      assert(back.indoor == v.indoor)
      (back.keyType, key) match {
        case (HotspotKey(a), HotspotKey(b)) => assert(a.sameElements(b))
        case (a, b) => assert(a == b)
      }
    }
  }

  test("malformed frames throw Malformed (→ S10 drop), never hang") {
    val garbage = Array[Byte](-1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1)
    intercept[ProtoWire.Malformed] {
      // field 0 / truncated varints must be rejected
      val r = new ProtoWire.Reader(Array[Byte](0x00))
      r.readTag()
    }
    // decoding random garbage either succeeds (skippable fields) or throws
    // Malformed — anything else is a bug
    try { Messages.MobileRewardShare.decode(garbage); () }
    catch { case _: ProtoWire.Malformed => () }
  }
}
