package graft.proto

import graft.codec.ProtoWire
import graft.codec.ProtoWire.{Reader, Writer}

/** Generic protobuf message view: field number → values, with typed
  * accessors. Used for the simpler record shapes (one level of nesting, no
  * oneofs) where a full case-class decoder adds no safety — the flatten
  * functions read exactly the fields they consume, unknown fields are
  * skipped (forward-compatible, like prost's decode).
  */
object DynMessage {

  sealed trait V
  final case class VInt(v: Long) extends V
  final case class VBytes(v: Array[Byte]) extends V
  final case class VDouble(v: Double) extends V

  final case class Msg(fields: Map[Int, Vector[V]]) {
    private def first(n: Int): Option[V] = fields.get(n).flatMap(_.headOption)

    def i64(n: Int): Long = first(n) match {
      case Some(VInt(v)) => v
      case Some(VDouble(d)) => d.toLong
      case _ => 0L
    }
    // VDouble survives only for values injected by tests; parse() stores
    // fixed64 as raw bits (VInt) so i64 on a (s)fixed64 integer field is
    // exact and dbl() reinterprets lazily — prost-style forward-compat.
    def i32(n: Int): Int = i64(n).toInt
    def bool(n: Int): Boolean = i64(n) != 0
    def dbl(n: Int): Double = first(n) match {
      case Some(VDouble(d)) => d
      case Some(VInt(v)) => java.lang.Double.longBitsToDouble(v)
      case _ => 0.0
    }
    def bytes(n: Int): Array[Byte] = first(n) match {
      case Some(VBytes(b)) => b
      case _ => Array.emptyByteArray
    }
    def str(n: Int): String = new String(bytes(n), "UTF-8")
    def msg(n: Int): Option[Msg] = first(n) match {
      case Some(VBytes(b)) => Some(parse(b))
      case _ => None
    }
    def reqMsg(n: Int): Msg =
      msg(n).getOrElse(throw new ProtoWire.Malformed(s"required message field $n missing"))
    def msgs(n: Int): Seq[Msg] =
      fields.getOrElse(n, Vector.empty).collect { case VBytes(b) => parse(b) }
    def i64s(n: Int): Seq[Long] =
      fields.getOrElse(n, Vector.empty).collect { case VInt(v) => v }
    def has(n: Int): Boolean = fields.contains(n)
  }

  def parse(bytes: Array[Byte]): Msg = {
    val r = new Reader(bytes)
    val acc = scala.collection.mutable.Map.empty[Int, Vector[V]]
    while (r.hasNext) {
      val (n, wt) = r.readTag()
      val v: V = wt match {
        case ProtoWire.WireVarint => VInt(r.readVarint())
        case ProtoWire.WireFixed64 => VInt(r.readFixed64())
        case ProtoWire.WireLenDelim => VBytes(r.readBytes())
        case ProtoWire.WireFixed32 => VInt(r.readFixed32().toLong)
        case w => throw new ProtoWire.Malformed(s"unknown wire type $w")
      }
      acc.updateWith(n) { old => Some(old.getOrElse(Vector.empty) :+ v) }
    }
    Msg(acc.toMap)
  }

  /** Fluent builder mirroring the accessors (fixture/sink encoder). */
  final class B {
    private val w = new Writer
    def i64(n: Int, v: Long): B = { w.int64(n, v); this }
    def i32(n: Int, v: Int): B = { w.int32(n, v); this }
    def bool(n: Int, v: Boolean): B = { w.bool(n, v); this }
    def dbl(n: Int, v: Double): B = { w.double(n, v); this }
    def bytes(n: Int, v: Array[Byte]): B = { w.bytes(n, v); this }
    def str(n: Int, v: String): B = { w.string(n, v); this }
    def msg(n: Int, v: B): B = { w.bytes(n, v.toBytes); this }
    def toBytes: Array[Byte] = w.toBytes
  }
  def b: B = new B
}
