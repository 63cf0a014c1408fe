package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{TernaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Count-min sketch (Cormode & Muthukrishnan 2005): a d×w counter grid
  * answering "how often did key x occur?" for ANY key in fixed memory —
  * the point-frequency complement to [[MisraGries]] (which only surfaces
  * the top keys it retained) and the frequency analog of the distinct
  * sketches ([[Bitmap64]]/[[KmvSketch]]): build per shard, persist the
  * binary column, merge by element-wise addition, query long after the
  * raw stream is gone. Estimates overcount only (collisions add, never
  * subtract): `true ≤ est ≤ true + εN` with ε = e/w at failure
  * probability (1/2)^... — the textbook bound; w trades memory for
  * accuracy, d drives the confidence.
  *
  * Determinism is engineered the same way as [[KmvSketch]]: row i hashes
  * key s into bucket `md5(i || ':' || s)` first-8-hex mod w — the q25
  * engine-portable convention, so a SQL oracle can rebuild every cell
  * (`('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || s), 1, 8))
  * ::BIGINT % w`) and replay the min-over-rows estimate EXACTLY. An
  * approximate sketch with an exact-match oracle, and sketches built on
  * different partitionings are byte-identical.
  *
  * Wire format: `int32 d, int32 w, d·w × int64` counters row-major —
  * d = 4, w = 2048 is 64 KB regardless of key cardinality; the shuffle
  * carries grids, never keys.
  */
object Cms {

  def hashBucket(row: Int, key: String, w: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((row.toString + ":" + key).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val top = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (top % w).toInt
  }

  final class Buffer(val d: Int, val w: Int) {
    val counters = new Array[Long](d * w)

    def add(key: String, by: Long): Unit = {
      var i = 0
      while (i < d) { counters(i * w + hashBucket(i, key, w)) += by; i += 1 }
    }

    def mergeFrom(other: Buffer): Unit = {
      require(other.d == d && other.w == w,
        s"cannot merge count-min sketches of different geometry: " +
          s"(${d}x$w) vs (${other.d}x${other.w})")
      var i = 0
      while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
    }

    def estimate(key: String): Long = {
      // zero-geometry grid (d = 0 — a merge buffer no sketch ever landed
      // in): nothing was counted, so the estimate is 0, not the
      // min-over-no-rows identity Long.MaxValue
      if (d == 0) return 0L
      var best = Long.MaxValue
      var i = 0
      while (i < d) {
        val c = counters(i * w + hashBucket(i, key, w))
        if (c < best) best = c
        i += 1
      }
      best
    }
  }

  def serialize(b: Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * b.counters.length)
    bb.putInt(b.d)
    bb.putInt(b.w)
    var i = 0
    while (i < b.counters.length) { bb.putLong(b.counters(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val w = bb.getInt
    val b = new Buffer(d, w)
    var i = 0
    while (i < b.counters.length) { b.counters(i) = bb.getLong; i += 1 }
    b
  }

  def estimate(bytes: Array[Byte], key: String): Long =
    deserialize(bytes).estimate(key)

  /** Equi-join size estimate from two grids over the join key columns
    * (Cormode & Muthukrishnan's inner-product estimator): row i's
    * Σ_b a[i][b]·b[i][b] upper-bounds Σ_k f_A(k)·f_B(k) = |A ⋈ B|
    * (collisions only ADD cross terms), and the min over rows is the
    * estimate — join cardinality for ANY pair of persisted key
    * sketches without touching either table. Same-geometry sketches
    * only (the hash families must line up bucket-for-bucket).
    */
  def innerProduct(a: Array[Byte], b: Array[Byte]): Long = {
    val ba = deserialize(a)
    val bb = deserialize(b)
    require(ba.d == bb.d && ba.w == bb.w,
      s"cannot inner-product count-min sketches of different geometry: " +
        s"(${ba.d}x${ba.w}) vs (${bb.d}x${bb.w})")
    if (ba.d == 0) return 0L // zero-geometry grids: empty join, not MaxValue
    var best = Long.MaxValue
    var i = 0
    while (i < ba.d) {
      var s = 0L
      var j = i * ba.w
      val end = j + ba.w
      // overflow-loud: at extreme counter magnitudes a silent Long wrap
      // would go negative and min-over-rows would pick the corrupted row
      while (j < end) {
        s = Math.addExact(s, Math.multiplyExact(ba.counters(j), bb.counters(j)))
        j += 1
      }
      if (s < best) best = s
      i += 1
    }
    best
  }
}

/** `cms_build(key, w, d) -> binary`: one-pass count-min sketch of a key
  * column's occurrence counts. Partial grids merge by addition; nulls
  * are skipped. Integral keys hash by their decimal rendering
  * (= DuckDB's `CAST(x AS VARCHAR)`).
  */
case class CmsBuildAgg(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Cms.Buffer]
  with TernaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType | IntegerType | StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        val w = second.eval()
        val d = third.eval()
        if (w != null && d != null && w.asInstanceOf[Int] >= 1 && d.asInstanceOf[Int] >= 1)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("w and d must be positive int literals")
      case (k, w, d) => TypeCheckResult.TypeCheckFailure(
        s"cms_build expects (long/int/string key, foldable int w, foldable int d), got ($k, $w, $d)")
    }

  @transient private lazy val w: Int = second.eval().asInstanceOf[Int]
  @transient private lazy val d: Int = third.eval().asInstanceOf[Int]

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_build"

  override def createAggregationBuffer(): Cms.Buffer = new Cms.Buffer(d, w)

  override def update(buf: Cms.Buffer, input: InternalRow): Cms.Buffer = {
    val v = first.eval(input)
    if (v != null) {
      val s = v match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case other => other.toString
      }
      buf.add(s, 1L)
    }
    buf
  }

  override def merge(buf: Cms.Buffer, other: Cms.Buffer): Cms.Buffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: Cms.Buffer): Any = Cms.serialize(buf)
  override def serialize(buf: Cms.Buffer): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Cms.Buffer = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CmsBuildAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `cms_merge_agg(binary) -> binary`: element-wise sum of persisted
  * count-min grids — the rollup half of the sketch-table pattern.
  * Mismatched geometries are REFUSED (adding a 4×2048 grid into a
  * 4×1024 one would silently corrupt every estimate — the
  * [[DDSketchPsi]] α-mismatch precedent).
  */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Cms.Buffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_merge_agg expects a binary sketch column, got $other")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_merge_agg"

  // geometry is learned from the first sketch seen
  override def createAggregationBuffer(): Cms.Buffer = new Cms.Buffer(0, 0)

  private def fold(buf: Cms.Buffer, other: Cms.Buffer): Cms.Buffer =
    if (buf.d == 0) other
    else if (other.d == 0) buf
    else { buf.mergeFrom(other); buf }

  override def update(buf: Cms.Buffer, input: InternalRow): Cms.Buffer = {
    val v = child.eval(input)
    if (v == null) buf
    else fold(buf, Cms.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: Cms.Buffer, other: Cms.Buffer): Cms.Buffer =
    fold(buf, other)

  override def eval(buf: Cms.Buffer): Any = Cms.serialize(buf)
  override def serialize(buf: Cms.Buffer): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Cms.Buffer = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}

/** `cms_inner_product(binary, binary) -> bigint`: equi-join size
  * estimate |A ⋈ B| = Σ_k f_A(k)·f_B(k) off two persisted key grids —
  * the cardinality input a join planner wants BEFORE reading either
  * table (broadcast-vs-shuffle, skew pre-detection). Overcounts only;
  * exact when no row pair collides. Geometry mismatch refused.
  */
case class CmsInnerProduct(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_inner_product expects (binary, binary), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_inner_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Cms.innerProduct(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsInnerProduct =
    copy(left = newLeft, right = newRight)
}

/** `cms_estimate(binary, key) -> bigint`: min-over-rows point-frequency
  * estimate off a serialized grid. Overcounts only; exact when the
  * key's d cells saw no collisions.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType | StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary sketch, long/int/string key), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(sketch: Any, key: Any): Any = {
    val s = key match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case other => other.toString
    }
    Cms.estimate(sketch.asInstanceOf[Array[Byte]], s)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
