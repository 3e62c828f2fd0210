package graft.codec

import java.security.MessageDigest

/** Base58Check encoding (public Bitcoin-style algorithm): payload is
  * prefixed with a version byte and suffixed with the first 4 bytes of
  * double-SHA256 as a checksum, then base-58 encoded with leading zero
  * bytes mapped to '1'.
  *
  * The reference renders hotspot public keys as base58check of
  * 0x00 ∥ key-bytes (T2, huckli-import/src/lib.rs:139-156).
  */
object Base58Check {

  private val Alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val IndexOf: Array[Int] = {
    val a = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  /** Raw base-58 of a byte string (big-endian base conversion). */
  def base58(bytes: Array[Byte]): String = {
    val zeros = bytes.takeWhile(_ == 0).length
    var num = BigInt(1, bytes)
    val sb = new StringBuilder
    while (num > 0) {
      val (q, r) = num /% 58
      sb.append(Alphabet(r.toInt))
      num = q
    }
    ("1" * zeros) + sb.reverseInPlace().toString
  }

  def base58Decode(s: String): Option[Array[Byte]] = {
    if (s.exists(c => c >= 128 || IndexOf(c.toInt) < 0)) return None
    val zeros = s.takeWhile(_ == '1').length
    var num = BigInt(0)
    s.foreach(c => num = num * 58 + IndexOf(c.toInt))
    val body = num.toByteArray.dropWhile(_ == 0)
    Some(Array.fill[Byte](zeros)(0) ++ body)
  }

  /** version ∥ payload ∥ first4(sha256(sha256(version ∥ payload))). */
  def encode(version: Byte, payload: Array[Byte]): String = {
    val data = version +: payload
    base58(data ++ sha256(sha256(data)).take(4))
  }

  /** Hotspot pubkey rendering: version byte 0x00 prepended to raw key. */
  def encodePubKey(keyBytes: Array[Byte]): String = encode(0x00.toByte, keyBytes)

  /** Decode + checksum validation → (version, payload). */
  def decode(s: String): Option[(Byte, Array[Byte])] =
    base58Decode(s).flatMap { all =>
      if (all.length < 5) None
      else {
        val (data, check) = all.splitAt(all.length - 4)
        if (sha256(sha256(data)).take(4).sameElements(check))
          Some((data.head, data.tail))
        else None
      }
    }
}
