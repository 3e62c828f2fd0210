package graft.codec

import java.sql.Timestamp

/** Scalar conversion helpers shared by ingest transforms (T3/T4/T5). */
object Scalars {

  /** T4 (huckli-import/src/lib.rs:158-175): epoch values strictly above
    * 1e12 are milliseconds, otherwise seconds. Boundary: exactly 1e12 is
    * seconds (the reference uses `>`). */
  val MillisThreshold: Long = 1_000_000_000_000L

  def timestampAuto(epoch: Long): Timestamp =
    if (epoch > MillisThreshold) new Timestamp(epoch)
    else new Timestamp(epoch * 1000L)

  /** T3 (mobile_rewards.rs:223 et al.): canonical UUID string from exactly
    * 16 bytes; anything else is a malformed record. */
  def uuidFromBytes(bytes: Array[Byte]): String = {
    require(bytes.length == 16, s"uuid needs 16 bytes, got ${bytes.length}")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    new java.util.UUID(bb.getLong, bb.getLong).toString
  }

  /** D4 deviation (documented in SURVEY): the reference generates a fresh
    * UUIDv4 per radio reward (radio_reward.rs:117); we derive a
    * deterministic surrogate from (file_source, frame index) so ingest is
    * replayable and testable. */
  def surrogateId(fileSource: String, frameIndex: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    uuidFromBytes(md.digest(s"$fileSource#$frameIndex".getBytes("UTF-8")))
  }

  /** T5 (huckli-import/src/lib.rs:307-313): proto Decimal carries a decimal
    * string; missing or unparsable ⇒ 0.0. */
  def protoDecimal(value: Option[String]): Double =
    value.flatMap(v => scala.util.Try(BigDecimal(v.trim)).toOption)
      .map(_.toDouble).getOrElse(0.0)
}
