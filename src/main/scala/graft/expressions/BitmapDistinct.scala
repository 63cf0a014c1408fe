package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Roaring-style EXACT distinct sketch over 64-bit keys — the mergeable,
  * persistable building block of the sketch-table pattern: build one
  * bitmap per shard (day / source / partition) in a single pass, persist
  * the binary column, and answer "distinct keys over any shard subset"
  * later by unioning sketches — no re-scan of the raw data, no
  * re-shuffle of the key column, and (unlike HLL) no error bar.
  *
  * Layout (Chambi et al., "Better bitmap performance with Roaring
  * bitmaps", 2016): keys are split into a high-48-bit chunk key and a
  * low-16-bit offset; each chunk holds its offsets either as a sorted
  * `Char` array (≤ 4096 entries, ≤ 8 KB) or as a 65536-bit / 1024-word
  * bitmap (8 KB flat) — 4096 is the exact break-even point. Dense data
  * costs ≤ 1.0008 bits per universe slot; sparse data costs 2 bytes per
  * present key. A shard sketch of 1M distinct int keys is ≤ 2 MB —
  * shuffling sketches instead of keys is the 100-TB win.
  *
  * Wire format (deterministic — chunks ascending by key, so equal sets
  * serialize identically and a persisted sketch column is stable across
  * partitionings): `int32 nChunks`, then per chunk `int64 key, int8
  * mode, int32 n, payload` where payload is `n` chars (mode 0, sorted)
  * or 1024 longs (mode 1). [[BitmapCardinality]] and [[BitmapContains]]
  * read the header/payload in place without materializing containers.
  */
object Bitmap64 {

  /** Sparse→dense promotion threshold: 4096 chars = 8 KB = one dense
    * chunk, the classic roaring break-even.
    */
  val PromoteAt = 4096
  private val DenseWords = 1024 // 65536 bits

  /** One chunk of the bitmap: sorted-array mode (`arr`, first `n`
    * entries) until [[PromoteAt]], dense bit-word mode (`words`,
    * `n` = popcount) above.
    */
  final class Container {
    var arr: Array[Char] = new Array[Char](8)
    var words: Array[Long] = null
    var n: Int = 0

    def dense: Boolean = words != null

    def add(low: Char): Unit =
      if (dense) {
        val w = low >> 6
        val bit = 1L << (low & 63)
        if ((words(w) & bit) == 0L) { words(w) |= bit; n += 1 }
      } else {
        val idx = java.util.Arrays.binarySearch(arr, 0, n, low)
        if (idx < 0) {
          if (n == PromoteAt) { promote(); add(low) }
          else {
            if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
            val at = -idx - 1
            System.arraycopy(arr, at, arr, at + 1, n - at)
            arr(at) = low
            n += 1
          }
        }
      }

    private def promote(): Unit = {
      words = new Array[Long](DenseWords)
      var i = 0
      while (i < n) { val v = arr(i); words(v >> 6) |= 1L << (v & 63); i += 1 }
      arr = null
    }

    def contains(low: Char): Boolean =
      if (dense) (words(low >> 6) & (1L << (low & 63))) != 0L
      else java.util.Arrays.binarySearch(arr, 0, n, low) >= 0

    /** Union `other` into this container. */
    def mergeFrom(other: Container): Unit =
      if (other.dense) {
        if (!dense) promoteForMerge()
        var w = 0
        var count = 0
        while (w < DenseWords) {
          words(w) |= other.words(w)
          count += java.lang.Long.bitCount(words(w))
          w += 1
        }
        n = count
      } else {
        var i = 0
        while (i < other.n) { add(other.arr(i)); i += 1 }
      }

    private def promoteForMerge(): Unit = {
      words = new Array[Long](DenseWords)
      var i = 0
      while (i < n) { val v = arr(i); words(v >> 6) |= 1L << (v & 63); i += 1 }
      arr = null
    }
  }

  type Sketch = java.util.HashMap[java.lang.Long, Container]

  def empty(): Sketch = new java.util.HashMap[java.lang.Long, Container]()

  def add(sk: Sketch, v: Long): Unit = {
    val key = java.lang.Long.valueOf(v >> 16)
    var c = sk.get(key)
    if (c == null) { c = new Container; sk.put(key, c) }
    c.add((v & 0xffff).toChar)
  }

  /** Union `other` into `dst`. `other`'s containers must be owned by the
    * caller (freshly deserialized or about to be discarded) — empty-dst
    * chunks adopt them by reference.
    */
  def mergeInto(dst: Sketch, other: Sketch): Unit = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val existing = dst.get(e.getKey)
      if (existing == null) dst.put(e.getKey, e.getValue)
      else existing.mergeFrom(e.getValue)
    }
  }

  def serialize(sk: Sketch): Array[Byte] = {
    val keys = new Array[Long](sk.size())
    var i = 0
    val kit = sk.keySet().iterator()
    while (kit.hasNext) { keys(i) = kit.next(); i += 1 }
    java.util.Arrays.sort(keys)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(keys.length)
    i = 0
    while (i < keys.length) {
      val c = sk.get(keys(i))
      out.writeLong(keys(i))
      out.writeByte(if (c.dense) 1 else 0)
      out.writeInt(c.n)
      if (c.dense) {
        var w = 0
        while (w < DenseWords) { out.writeLong(c.words(w)); w += 1 }
      } else {
        var j = 0
        while (j < c.n) { out.writeChar(c.arr(j)); j += 1 }
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val nChunks = in.readInt()
    val sk = new java.util.HashMap[java.lang.Long, Container](nChunks * 2)
    var i = 0
    while (i < nChunks) {
      val key = in.readLong()
      val mode = in.readByte()
      val n = in.readInt()
      val c = new Container
      c.n = n
      if (mode == 1) {
        c.arr = null
        c.words = new Array[Long](DenseWords)
        var w = 0
        while (w < DenseWords) { c.words(w) = in.readLong(); w += 1 }
      } else {
        c.arr = new Array[Char](math.max(n, 8))
        var j = 0
        while (j < n) { c.arr(j) = in.readChar(); j += 1 }
      }
      sk.put(key, c)
      i += 1
    }
    sk
  }

  /** Cardinality straight off the wire format — header walk only, no
    * container materialization (each chunk stores its own count).
    */
  def cardinality(bytes: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val nChunks = buf.getInt
    var total = 0L
    var i = 0
    while (i < nChunks) {
      buf.getLong // key
      val mode = buf.get()
      val n = buf.getInt
      total += n
      buf.position(buf.position() + (if (mode == 1) DenseWords * 8 else n * 2))
      i += 1
    }
    total
  }

  /** Intersection cardinality of two serialized sketches — a merge-join
    * over the (sorted) chunk directories, intersecting only chunks
    * present in BOTH: dense∧dense is 1024 popcounts, dense∧sparse
    * probes bits, sparse∧sparse two-pointers. Nothing materializes.
    * This is the audience-overlap / retention primitive: |A ∩ B| of two
    * persisted shard sketches without touching raw keys.
    */
  def andCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val ba = java.nio.ByteBuffer.wrap(a)
    val bb = java.nio.ByteBuffer.wrap(b)
    val na = ba.getInt
    val nb = bb.getInt
    var ia = 0
    var ib = 0
    var posA = 4
    var posB = 4
    var total = 0L
    // per-chunk header: key(8) + mode(1) + n(4) = 13 bytes, then payload
    @inline def keyAt(buf: java.nio.ByteBuffer, pos: Int): Long = buf.getLong(pos)
    @inline def modeAt(buf: java.nio.ByteBuffer, pos: Int): Byte = buf.get(pos + 8)
    @inline def nAt(buf: java.nio.ByteBuffer, pos: Int): Int = buf.getInt(pos + 9)
    @inline def payloadLen(mode: Byte, n: Int): Int = if (mode == 1) 8192 else n * 2
    while (ia < na && ib < nb) {
      val ka = keyAt(ba, posA)
      val kb = keyAt(bb, posB)
      if (ka < kb) { posA += 13 + payloadLen(modeAt(ba, posA), nAt(ba, posA)); ia += 1 }
      else if (kb < ka) { posB += 13 + payloadLen(modeAt(bb, posB), nAt(bb, posB)); ib += 1 }
      else {
        val ma = modeAt(ba, posA); val nA = nAt(ba, posA); val pA = posA + 13
        val mb = modeAt(bb, posB); val nB = nAt(bb, posB); val pB = posB + 13
        total += intersectChunk(ba, ma, nA, pA, bb, mb, nB, pB)
        posA += 13 + payloadLen(ma, nA); ia += 1
        posB += 13 + payloadLen(mb, nB); ib += 1
      }
    }
    total
  }

  private def intersectChunk(ba: java.nio.ByteBuffer, ma: Byte, na: Int, pa: Int,
                             bb: java.nio.ByteBuffer, mb: Byte, nb: Int, pb: Int): Long =
    if (ma == 1 && mb == 1) {
      var w = 0
      var c = 0L
      while (w < 1024) {
        c += java.lang.Long.bitCount(ba.getLong(pa + w * 8) & bb.getLong(pb + w * 8))
        w += 1
      }
      c
    } else if (ma == 1 || mb == 1) {
      // probe the sparse side's elements against the dense side's bits
      val (dense, dOff, sparse, sOff, sN) =
        if (ma == 1) (ba, pa, bb, pb, nb) else (bb, pb, ba, pa, na)
      var i = 0
      var c = 0L
      while (i < sN) {
        val v = sparse.getChar(sOff + i * 2)
        if ((dense.getLong(dOff + (v >> 6) * 8) & (1L << (v & 63))) != 0L) c += 1
        i += 1
      }
      c
    } else {
      var i = 0
      var j = 0
      var c = 0L
      while (i < na && j < nb) {
        val va = ba.getChar(pa + i * 2)
        val vb = bb.getChar(pb + j * 2)
        if (va == vb) { c += 1; i += 1; j += 1 }
        else if (va < vb) i += 1
        else j += 1
      }
      c
    }

  /** Membership straight off the wire format. Chunks are ascending by
    * key, so the scan stops at the first key past the target.
    */
  def contains(bytes: Array[Byte], v: Long): Boolean = {
    val target = v >> 16
    val low = (v & 0xffff).toChar
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val nChunks = buf.getInt
    var i = 0
    while (i < nChunks) {
      val key = buf.getLong
      val mode = buf.get()
      val n = buf.getInt
      if (key == target) {
        if (mode == 1) {
          val base = buf.position()
          val word = buf.getLong(base + (low >> 6) * 8)
          return (word & (1L << (low & 63))) != 0L
        } else {
          // binary search over the serialized sorted chars
          val base = buf.position()
          var lo = 0
          var hi = n - 1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            val c = buf.getChar(base + mid * 2)
            if (c == low) return true
            else if (c < low) lo = mid + 1
            else hi = mid - 1
          }
          return false
        }
      }
      if (key > target) return false
      buf.position(buf.position() + (if (mode == 1) DenseWords * 8 else n * 2))
      i += 1
    }
    false
  }
}

/** `bitmap_build(bigint) -> binary`: one-pass exact-distinct sketch of a
  * key column ([[Bitmap64]]). Partial buffers merge pairwise like any
  * built-in aggregate, so the shuffle carries one sketch per partition,
  * never the keys. Nulls are skipped (SQL aggregate convention). The
  * output bytes are deterministic for a given key SET (chunk-sorted wire
  * format) — safe to persist, compare, and re-aggregate.
  */
case class BitmapBuildAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap64.Sketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_build expects an integral key column, got $other")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_build"

  override def createAggregationBuffer(): Bitmap64.Sketch = Bitmap64.empty()

  override def update(buf: Bitmap64.Sketch, input: InternalRow): Bitmap64.Sketch = {
    val v = child.eval(input)
    if (v != null) {
      val l = v match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
      }
      Bitmap64.add(buf, l)
    }
    buf
  }

  override def merge(buf: Bitmap64.Sketch, other: Bitmap64.Sketch): Bitmap64.Sketch = {
    Bitmap64.mergeInto(buf, other)
    buf
  }

  override def eval(buf: Bitmap64.Sketch): Any = Bitmap64.serialize(buf)

  override def serialize(buf: Bitmap64.Sketch): Array[Byte] = Bitmap64.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bitmap64.Sketch = Bitmap64.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapBuildAgg =
    copy(child = newChild)
}

/** `bitmap_union_agg(binary) -> binary`: union of persisted
  * [[Bitmap64]] sketches — the rollup half of the sketch-table pattern.
  * Exact (unlike `hll_union_agg`), and the union of shard sketches is
  * byte-identical to a direct [[BitmapBuildAgg]] over the raw keys, so
  * incremental rollups never drift from cold recomputes.
  */
case class BitmapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap64.Sketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_union_agg expects a binary sketch column, got $other")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_union_agg"

  override def createAggregationBuffer(): Bitmap64.Sketch = Bitmap64.empty()

  override def update(buf: Bitmap64.Sketch, input: InternalRow): Bitmap64.Sketch = {
    val v = child.eval(input)
    if (v != null) Bitmap64.mergeInto(buf, Bitmap64.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Bitmap64.Sketch, other: Bitmap64.Sketch): Bitmap64.Sketch = {
    Bitmap64.mergeInto(buf, other)
    buf
  }

  override def eval(buf: Bitmap64.Sketch): Any = Bitmap64.serialize(buf)

  override def serialize(buf: Bitmap64.Sketch): Array[Byte] = Bitmap64.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bitmap64.Sketch = Bitmap64.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapUnionAgg =
    copy(child = newChild)
}

/** `bitmap_cardinality(binary) -> bigint`: exact distinct count off a
  * serialized [[Bitmap64]] sketch — a header walk (each chunk stores its
  * count), no container materialization. Called once per output group,
  * not per input row, so interpreted eval is off the hot path.
  */
case class BitmapCardinality(child: Expression) extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_cardinality expects a binary sketch column, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_cardinality"

  override protected def nullSafeEval(input: Any): Any =
    Bitmap64.cardinality(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): BitmapCardinality =
    copy(child = newChild)
}

/** `bitmap_and_cardinality(binary, binary) -> bigint`: exact |A ∩ B| of
  * two serialized [[Bitmap64]] sketches — the retention / audience-
  * overlap primitive ("users active in BOTH weeks") answered from
  * persisted sketches with a chunk merge-join, no raw-key re-scan, no
  * join. Called once per output group; interpreted eval off the hot
  * path.
  */
case class BitmapAndCardinality(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bitmap_and_cardinality expects (binary, binary), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_and_cardinality"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Bitmap64.andCardinality(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCardinality =
    copy(left = newLeft, right = newRight)
}

/** `bitmap_contains(binary, bigint) -> boolean`: membership probe
  * straight off the wire format (chunk scan with early exit + binary
  * search / bit test) — lets a broadcast shard sketch act as an exact
  * pre-filter the way [[graft.operators.Dedup]] uses Bloom filters,
  * minus the false positives.
  */
case class BitmapContains(left: Expression, right: Expression) extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bitmap_contains expects (binary sketch, integral key), got ($l, $r)")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bitmap_contains"

  override protected def nullSafeEval(sketch: Any, key: Any): Any = {
    val k = key match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
    }
    Bitmap64.contains(sketch.asInstanceOf[Array[Byte]], k)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapContains =
    copy(left = newLeft, right = newRight)
}
