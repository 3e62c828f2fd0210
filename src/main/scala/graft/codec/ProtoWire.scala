package graft.codec

import scala.collection.mutable.ArrayBuffer

/** Minimal protobuf wire-format reader/writer (public format: varint,
  * 64-bit, length-delimited, 32-bit field encodings).
  *
  * The container has no proto descriptors or codegen available, so message
  * decoders (graft.proto.Messages) read exactly the fields the reference's
  * transforms consume (SURVEY §2.2), and the writer is the fixture encoder
  * (FIXTURES.md §B). Malformed input throws ProtoWire.Malformed — callers
  * drop the record and continue (S10).
  */
object ProtoWire {

  final class Malformed(msg: String) extends RuntimeException(msg)

  final val WireVarint = 0
  final val WireFixed64 = 1
  final val WireLenDelim = 2
  final val WireFixed32 = 5

  final class Reader(buf: Array[Byte], from: Int, until: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = from

    def hasNext: Boolean = pos < until

    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val tag = readVarint()
      val fieldNo = (tag >>> 3).toInt
      if (fieldNo == 0) throw new Malformed("field number 0")
      (fieldNo, (tag & 7).toInt)
    }

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift < 64) {
        if (pos >= until) throw new Malformed("varint past end")
        val b = buf(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new Malformed("varint too long")
    }

    def readFixed64(): Long = {
      if (pos + 8 > until) throw new Malformed("fixed64 past end")
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (buf(pos + i) & 0xffL); i -= 1 }
      pos += 8
      v
    }

    def readFixed32(): Int = {
      if (pos + 4 > until) throw new Malformed("fixed32 past end")
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }

    def readBytes(): Array[Byte] = {
      val len = readVarint()
      if (len < 0 || pos + len > until) throw new Malformed(s"bad length $len")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len.toInt)
      pos += len.toInt
      out
    }

    def readString(): String = new String(readBytes(), "UTF-8")

    /** Sub-reader over an embedded message without copying. */
    def readMessage(): Reader = {
      val len = readVarint()
      if (len < 0 || pos + len > until) throw new Malformed(s"bad message length $len")
      val r = new Reader(buf, pos, pos + len.toInt)
      pos += len.toInt
      r
    }

    def readDouble(): Double = java.lang.Double.longBitsToDouble(readFixed64())
    def readBool(): Boolean = readVarint() != 0

    def skip(wireType: Int): Unit = wireType match {
      case WireVarint => readVarint()
      case WireFixed64 => readFixed64()
      case WireLenDelim => readBytes()
      case WireFixed32 => readFixed32()
      case w => throw new Malformed(s"unknown wire type $w")
    }
  }

  final class Writer {
    private val out = new ArrayBuffer[Byte]()

    def toBytes: Array[Byte] = out.toArray

    def writeVarintRaw(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
      out += x.toByte
    }

    private def tag(fieldNo: Int, wireType: Int): Unit =
      writeVarintRaw((fieldNo.toLong << 3) | wireType)

    def int64(fieldNo: Int, v: Long): Writer = { tag(fieldNo, WireVarint); writeVarintRaw(v); this }
    def int32(fieldNo: Int, v: Int): Writer = int64(fieldNo, v.toLong)
    def bool(fieldNo: Int, v: Boolean): Writer = int64(fieldNo, if (v) 1L else 0L)
    def double(fieldNo: Int, v: Double): Writer = {
      tag(fieldNo, WireFixed64)
      var bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out += (bits & 0xff).toByte; bits >>>= 8; i += 1 }
      this
    }
    def bytes(fieldNo: Int, v: Array[Byte]): Writer = {
      tag(fieldNo, WireLenDelim); writeVarintRaw(v.length.toLong); out ++= v; this
    }
    def string(fieldNo: Int, v: String): Writer = bytes(fieldNo, v.getBytes("UTF-8"))
    def message(fieldNo: Int, m: Writer): Writer = bytes(fieldNo, m.toBytes)
  }
}
