package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.codec.{Base58Check, Framing, Scalars}

class CodecSpec extends AnyFunSuite with GenChecks {

  // ---- framing ----

  private def roundtrip(frames: Seq[Array[Byte]], gzip: Boolean): Seq[Array[Byte]] = {
    val out = new ByteArrayOutputStream()
    if (gzip) Framing.writeGzipFrames(out, frames) else Framing.writeFrames(out, frames)
    val in = new ByteArrayInputStream(out.toByteArray)
    (if (gzip) Framing.gzipFrames(in) else Framing.frames(in)).toSeq
  }

  test("framing roundtrip: empty, zero-length and >64KB frames") {
    val frames = Seq(Array.emptyByteArray, Array.fill[Byte](70 * 1024)(7), Array[Byte](1, 2, 3))
    for (gz <- Seq(false, true)) {
      val back = roundtrip(frames, gz)
      assert(back.size == 3)
      frames.zip(back).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
    assert(roundtrip(Seq.empty, gzip = true).isEmpty)
  }

  test("framing roundtrip property: arbitrary frame contents and counts") {
    val genFrame = Gen.chooseNum(0, 2000).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    forAll(Gen.listOfN(10, genFrame)) { frames =>
      val back = roundtrip(frames, gzip = false)
      assert(back.size == frames.size)
      frames.zip(back).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
  }

  test("framing tolerance: truncated body drops frame, keeps earlier ones") {
    val out = new ByteArrayOutputStream()
    Framing.writeFrames(out, Seq(Array[Byte](1, 2), Array[Byte](3, 4, 5)))
    val bytes = out.toByteArray.dropRight(2) // cut into the last frame's body
    var drops = 0
    val got = Framing.frames(new ByteArrayInputStream(bytes), _ => drops += 1).toSeq
    assert(got.size == 1 && got.head.sameElements(Array[Byte](1, 2)))
    assert(drops == 1)
  }

  test("framing tolerance: implausible length header drops remainder, never throws") {
    val bogus = Array[Byte](0x7f, -1, -1, -1) ++ Array.fill[Byte](10)(0) // len ≈ 2^31
    var drops = 0
    assert(Framing.frames(new ByteArrayInputStream(bogus), _ => drops += 1).isEmpty)
    assert(drops == 1)
    // random corruption never throws (fixed seed for reproducibility)
    val rnd = new scala.util.Random(42)
    val out = new ByteArrayOutputStream()
    Framing.writeFrames(out, Seq.fill(5)(Array.fill[Byte](50)(9)))
    for (_ <- 0 until 50) {
      val b = out.toByteArray
      b(rnd.nextInt(b.length)) = rnd.nextInt().toByte
      Framing.frames(new ByteArrayInputStream(b)).foreach(_ => ())
    }
  }

  // ---- base58check ----

  test("base58check known vector: all-zero payload") {
    // Classic vector: version 0x00 + 20 zero bytes → the well-known address.
    assert(Base58Check.encode(0, Array.fill[Byte](20)(0)) ==
      "1111111111111111111114oLvT2")
  }

  test("base58check encode/decode roundtrip with checksum validation") {
    forAll(Gen.chooseNum(0, 64).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))) { payload =>
      val s = Base58Check.encodePubKey(payload)
      val decoded = Base58Check.decode(s)
      assert(decoded.isDefined)
      assert(decoded.get._1 == 0)
      assert(decoded.get._2.sameElements(payload))
      // flipping a character must break the checksum (or the alphabet)
      val flipped = (if (s.head == '1') 'z' else '1') + s.tail
      assert(Base58Check.decode(flipped).isEmpty)
    }
  }

  // ---- timestamps (T4 boundary) ----

  test("sec/ms heuristic boundary: 1e12 is seconds, above is millis") {
    assert(Scalars.timestampAuto(999_999_999_999L).getTime == 999_999_999_999L * 1000)
    assert(Scalars.timestampAuto(1_000_000_000_000L).getTime == 1_000_000_000_000L * 1000)
    assert(Scalars.timestampAuto(1_000_000_000_001L).getTime == 1_000_000_000_001L)
    assert(Scalars.timestampAuto(1_700_000_000L).getTime == 1_700_000_000_000L)
  }

  test("timestamp heuristic monotonicity within each regime") {
    forAll(Gen.chooseNum(0L, Scalars.MillisThreshold - 1), Gen.chooseNum(0L, Scalars.MillisThreshold - 1)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      assert(Scalars.timestampAuto(lo).getTime <= Scalars.timestampAuto(hi).getTime)
    }
  }

  // ---- uuid (T3) ----

  test("uuid from 16 bytes: canonical rendering") {
    val bytes = (0 until 16).map(_.toByte).toArray
    assert(Scalars.uuidFromBytes(bytes) == "00010203-0405-0607-0809-0a0b0c0d0e0f")
    intercept[IllegalArgumentException](Scalars.uuidFromBytes(new Array[Byte](15)))
  }

  test("surrogate id is deterministic and distinct per frame") {
    val a = Scalars.surrogateId("s3://b/file.123.gz", 0)
    assert(a == Scalars.surrogateId("s3://b/file.123.gz", 0))
    assert(a != Scalars.surrogateId("s3://b/file.123.gz", 1))
    assert(a != Scalars.surrogateId("s3://b/file.124.gz", 0))
  }

  // ---- proto decimal (T5) ----

  test("proto decimal: parse, default-0 on missing/unparsable") {
    assert(Scalars.protoDecimal(Some("1.5")) == 1.5)
    assert(Scalars.protoDecimal(Some("-0.25")) == -0.25)
    assert(Scalars.protoDecimal(None) == 0.0)
    assert(Scalars.protoDecimal(Some("not-a-number")) == 0.0)
    assert(Scalars.protoDecimal(Some("")) == 0.0)
  }

  test("gzip tolerance: empty, garbage, and truncated gzip yield drops, not exceptions") {
    // empty file
    var drops = 0
    assert(Framing.gzipFrames(new ByteArrayInputStream(Array.emptyByteArray),
      _ => drops += 1).isEmpty)
    assert(drops == 1)
    // not gzip at all
    drops = 0
    assert(Framing.gzipFrames(new ByteArrayInputStream("not gzip".getBytes),
      _ => drops += 1).isEmpty)
    assert(drops == 1)
    // valid gzip header but truncated body: frames already decodable are
    // kept, the cut reports corruption
    val out = new ByteArrayOutputStream()
    Framing.writeGzipFrames(out, Seq.fill(50)(Array.fill[Byte](100)(3)))
    val full = out.toByteArray
    drops = 0
    val got = Framing.gzipFrames(
      new ByteArrayInputStream(full.take(full.length / 2)), _ => drops += 1).size
    assert(got < 50 && drops == 1)
  }
}
