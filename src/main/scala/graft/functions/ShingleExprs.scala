package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle kernels for the MinHash dedup family (r22, guide §1.2
  * step 2 "per-task work" after the r21 shuffle work).
  *
  * The r21 pipeline materialized 3-token shingles as STRING arrays through
  * interpreted higher-order functions (`transform(sequence(...))` is
  * CodegenFallback — per-row lambda interpretation), then [[VectorExprs
  * .minhashSig]] re-hashed every shingle string once per permutation
  * (64x), and the Jaccard verify intersected string arrays. Profiled at
  * sf0.1 this was the dedup family's dominant term: 3x ~1.9 s cache-fill
  * stages on first materialization plus ~0.3 s of cached-string-array
  * deserialization per downstream scan.
  *
  * Here each document's shingle SET is one native pass over the lowered
  * text's bytes: token boundaries are space positions (0x20 never occurs
  * inside a UTF-8 multibyte sequence), and because tokens are separated by
  * exactly one space, the 3-token shingle `concat_ws(' ', t[i], t[i+1],
  * t[i+2])` is literally the byte slice from t[i]'s start to t[i+2]'s end —
  * each shingle is hashed IN PLACE with xxhash64(seed 42), the exact value
  * Spark's `xxhash64(shingle_string)` computes, with zero per-shingle
  * allocation. Output is the sorted-distinct hash array, so set
  * intersection/union ([[JaccardSorted]]) is a linear merge and the
  * per-permutation MinHash values ([[VectorExprs.minhashSigFromHashes]])
  * are a cheap integer mix per (shingle, perm) instead of a string re-hash.
  *
  * Result equivalence: Jaccard over hashed sets equals Jaccard over the
  * string sets unless two DISTINCT shingles inside one compared pair's
  * union collide at 64 bits — for the ≤10^3-shingle documents this
  * pipeline handles, P(collision per pair) < 10^-12 at any corpus scale
  * (collisions across unrelated documents are irrelevant: only same-pair
  * unions are ever compared). The oracle gate re-proves the hash-identical
  * results at every checked SF.
  */
object ShingleExprs {

  /** Sorted-distinct xxhash64(seed 42) values of the 3-token shingles of
    * `lower(text)` — the hashed dual of [[graft.llmops.MinHash
    * .withShingles]]: documents shorter than 3 tokens fall back to the
    * whole (lowered) text as a single shingle, exactly like the string
    * pipeline's `concat_ws(' ', toks)` fallback (single-space joining of a
    * single-space split reconstructs the input verbatim). */
  case class ShingleHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      ShingleExprs.shingleHashes(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ShingleExprs.shingleHashes($c);")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
  }

  /** xxhash64's default seed — what `xxhash64(col)` uses, so these hashes
    * are bit-compatible with the SQL-function values (decontaminate joins
    * on them). */
  private final val Seed = 42L

  def shingleHashes(text: UTF8String): ArrayData = {
    val lower = text.toLowerCase
    val base = lower.getBaseObject
    val off = lower.getBaseOffset
    val n = lower.numBytes()
    // Token starts: position 0 plus every byte after a 0x20. A space byte is
    // always a real space in UTF-8 (continuation bytes are >= 0x80).
    var spaces = 0
    var i = 0
    while (i < n) { if (lower.getByte(i) == 0x20) spaces += 1; i += 1 }
    val nTok = spaces + 1
    if (nTok < 3) {
      // Whole-text fallback — concat_ws(' ', split(s, ' ')) == s.
      return new GenericArrayData(
        Array(XXH64.hashUnsafeBytes(base, off, n, Seed)))
    }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (lower.getByte(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = n
    val hashes = new Array[Long](nTok - 2)
    var s = 0
    while (s < nTok - 2) {
      val from = starts(s)
      val len = ends(s + 2) - from
      hashes(s) = XXH64.hashUnsafeBytes(base, off + from, len, Seed)
      s += 1
    }
    // Sorted-distinct in place: sort, then compact equal runs.
    java.util.Arrays.sort(hashes)
    var w = 0
    var r = 1
    while (r < hashes.length) {
      if (hashes(r) != hashes(w)) { w += 1; hashes(w) = hashes(r) }
      r += 1
    }
    val m = w + 1
    if (m == hashes.length) new GenericArrayData(hashes)
    else new GenericArrayData(java.util.Arrays.copyOf(hashes, m))
  }

  def shingleHashesCol(text: Column): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text)))

  /** Jaccard similarity of two SORTED-DISTINCT long arrays (the
    * [[ShingleHashes]] output invariant) — |A∩B| / |A∪B| by linear merge,
    * the same exact-integer IEEE division `size(array_intersect)/
    * size(array_union)` computes over the string sets. */
  case class JaccardSorted(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      ShingleExprs.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.ShingleExprs.jaccardSorted($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
      copy(left = l, right = r)
  }

  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  def jaccardSortedCol(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSorted(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
