package graft.codec

import java.io.{DataOutputStream, EOFException, InputStream, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** u32 big-endian length-delimited framing over a (gzipped) byte stream —
  * the reference's S7/S8 wire format (tokio `LengthDelimitedCodec` defaults:
  * 4-byte BE unsigned length prefix, exclusive of the header;
  * huckli-s3/src/lib.rs:165-178).
  *
  * Error tolerance (S10, huckli-import/src/lib.rs:227-235): a malformed
  * frame (truncated header/body, negative or oversize length) cannot be
  * resynchronized, so the iterator drops the remainder of the stream and
  * reports the drop through `onCorrupt` — records, not jobs, fail.
  */
object Framing {

  /** Frames above this are treated as corruption (a true 64 MiB record is
    * outside anything the reference's buckets contain). */
  val MaxFrameBytes: Int = 64 * 1024 * 1024

  /** Lazily iterate frames from an already-decompressed stream. */
  def frames(in: InputStream, onCorrupt: String => Unit = _ => ()): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextFrame: Array[Byte] = null
      private var done = false

      private def readFully(buf: Array[Byte], from: Int = 0): Boolean = {
        var off = from
        while (off < buf.length) {
          val n = in.read(buf, off, buf.length - off)
          if (n < 0) return false
          off += n
        }
        true
      }

      // Any IO failure mid-stream (incl. ZipException from a truncated gzip
      // member) is corruption of THIS file, not a job failure: report + stop.
      private def advance(): Unit = try {
        if (done) return
        val hdr = new Array[Byte](4)
        val first = in.read()
        if (first < 0) { done = true; return } // clean EOF at a frame boundary
        hdr(0) = first.toByte
        if (!readFully(hdr, 1)) { onCorrupt("truncated length header"); done = true; return }
        val len = ((hdr(0) & 0xff) << 24) | ((hdr(1) & 0xff) << 16) |
          ((hdr(2) & 0xff) << 8) | (hdr(3) & 0xff)
        if (len < 0 || len > MaxFrameBytes) {
          onCorrupt(s"implausible frame length $len"); done = true; return
        }
        val body = new Array[Byte](len)
        if (!readFully(body)) { onCorrupt("truncated frame body"); done = true; return }
        nextFrame = body
      } catch {
        case e: java.io.IOException =>
          onCorrupt(s"io error mid-stream: ${e.getMessage}"); done = true
      }

      override def hasNext: Boolean = {
        if (nextFrame == null && !done) advance()
        nextFrame != null
      }

      override def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException("no more frames")
        val f = nextFrame; nextFrame = null; f
      }
    }

  /** Iterate frames from a gzip-compressed stream (the on-bucket format).
    * A file that is not even a gzip stream (empty, truncated header) yields
    * zero frames + one corruption report — files fail, jobs don't. */
  def gzipFrames(raw: InputStream, onCorrupt: String => Unit = _ => ()): Iterator[Array[Byte]] = {
    val gz =
      try new GZIPInputStream(raw)
      catch {
        case e: java.io.IOException =>
          onCorrupt(s"bad gzip stream: ${e.getMessage}")
          return Iterator.empty
      }
    frames(gz, onCorrupt)
  }

  /** Write frames in the same format (fixture/sink side). */
  def writeFrames(out: OutputStream, frames: IterableOnce[Array[Byte]]): Unit = {
    val d = new DataOutputStream(out)
    frames.iterator.foreach { f => d.writeInt(f.length); d.write(f) }
    d.flush()
  }

  def writeGzipFrames(out: OutputStream, frames: IterableOnce[Array[Byte]]): Unit = {
    val gz = new GZIPOutputStream(out)
    writeFrames(gz, frames)
    gz.finish()
  }
}
