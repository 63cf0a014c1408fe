package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** KMV / theta distinct sketch (Beyer et al., SIGMOD 2007; the Apache
  * DataSketches theta family): keep the k smallest distinct 60-bit
  * hashes of a key stream. Closes the hole the other two distinct
  * sketches leave open — [[Bitmap64]] is exact but needs ~2 bytes per
  * key (hopeless on an unbounded string/UUID domain), HLL is constant-
  * size but CANNOT intersect (inclusion–exclusion error explodes on
  * small overlaps). A KMV sketch is a uniform hash-order SAMPLE of the
  * key set, so two sketches support set algebra directly: cut both to
  * the shared threshold θ = min(θ_A, θ_B) and count sample hits —
  * `|A ∩ B| ≈ |S_A ∩ S_B| / θ` with relative error O(1/√k) on the
  * INTERSECTION itself.
  *
  * Determinism is the design choice everything else hangs on: the hash
  * is the engine-portable md5 prefix (top 60 bits of md5 of the key's
  * decimal/string rendering — the q25 convention, `('0x' ||
  * substring(md5(CAST(key AS VARCHAR)), 1, 15))::BIGINT` in DuckDB), so
  * a sketch is a pure function of the key SET: shard-union is
  * byte-identical to a cold rebuild, and every estimate — including the
  * approximate ones — is exactly reproducible by a SQL oracle replaying
  * the k-smallest scan. An approximate sketch with an exact-match
  * oracle.
  *
  * Estimator conventions (mirrored verbatim in the q131 oracle):
  *  - retained set = k smallest distinct hashes; u(h) = h / 2^60;
  *  - θ_X = u(k-th smallest) when the sketch is full, else 1.0;
  *  - cardinality: n when not full (EXACT — θ = 1 means the sketch IS
  *    the key set), else (k−1)/θ_X (the k-th value is the threshold,
  *    not evidence);
  *  - set ops at θ = min(θ_A, θ_B): S_X = {h ∈ X : u(h) < θ} (strict,
  *    so a full sketch's own θ-defining value is excluded — which is
  *    what makes |S|/θ reduce to (k−1)/θ on a single full sketch);
  *    intersection = |S_A ∩ S_B| / θ, union = |S_A ∪ S_B| / θ.
  *
  * Wire format (deterministic): `int32 k, int32 n, n × int64` hashes
  * ascending. A k = 1024 sketch is ≤ 8 KB regardless of key domain —
  * the shuffle carries sketches, never keys.
  */
object KmvSketch {

  private val Two60 = 1152921504606846976.0 // 2^60

  /** Top 60 bits of md5(key-as-string) — equals DuckDB's
    * `('0x' || substring(md5(s), 1, 15))::BIGINT` (15 hex nibbles =
    * the digest's first 60 bits, big-endian nibble order).
    */
  def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  /** Mutable k-smallest-distinct buffer. */
  final class Buffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()

    def add(h: Long): Unit =
      if (set.size < k) { set.add(h); () }
      else if (h < set.last()) {
        if (set.add(h)) { set.pollLast(); () }
      }

    def mergeFrom(other: Buffer): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }

    def theta: Double = if (set.size >= k) set.last().longValue() / Two60 else 1.0

    def estimate: Double =
      if (set.size < k) set.size.toDouble else (k - 1) / theta
  }

  def serialize(b: Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * b.set.size)
    bb.putInt(b.k)
    bb.putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    val b = new Buffer(k)
    var i = 0
    while (i < n) { b.set.add(bb.getLong); i += 1 }
    b
  }

  def estimate(bytes: Array[Byte]): Double = deserialize(bytes).estimate

  /** Shared-θ sample intersection / union straight off two wire
    * sketches (both ascending → one two-pointer pass). Returns
    * (|S_A ∩ S_B|, |S_A ∪ S_B|, θ).
    */
  private def thetaCounts(a: Array[Byte], b: Array[Byte]): (Long, Long, Double) = {
    val ba = deserialize(a)
    val bb = deserialize(b)
    val theta = math.min(ba.theta, bb.theta)
    // the θ cut MUST be evaluated as u(h) = h / 2^60 < θ in double
    // arithmetic — the exact predicate the SQL oracle replays. A
    // back-multiplied `h < θ·2^60` long comparison would disagree near
    // the threshold (60-bit hashes don't round-trip a 53-bit mantissa).
    @inline def in(h: Long): Boolean = h / Two60 < theta
    var inter = 0L
    var union = 0L
    val ia = ba.set.iterator()
    val ib = bb.set.iterator()
    var va = if (ia.hasNext) ia.next().longValue() else Long.MaxValue
    var vb = if (ib.hasNext) ib.next().longValue() else Long.MaxValue
    while ((va != Long.MaxValue && in(va)) || (vb != Long.MaxValue && in(vb))) {
      if (va == vb) {
        if (in(va)) { inter += 1; union += 1 }
        va = if (ia.hasNext) ia.next().longValue() else Long.MaxValue
        vb = if (ib.hasNext) ib.next().longValue() else Long.MaxValue
      } else if (va < vb) {
        if (in(va)) union += 1
        va = if (ia.hasNext) ia.next().longValue() else Long.MaxValue
      } else {
        if (in(vb)) union += 1
        vb = if (ib.hasNext) ib.next().longValue() else Long.MaxValue
      }
    }
    (inter, union, theta)
  }

  def andEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val (inter, _, theta) = thetaCounts(a, b)
    inter / theta
  }

  def orEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val (_, union, theta) = thetaCounts(a, b)
    union / theta
  }

  /** |A \ B| estimate at the shared θ: θ-cut sample hits of A that B's
    * sample doesn't contain. With both samples cut to the same θ,
    * membership in the sample IS membership in the set (for hashes
    * below θ), so |S_A| − |S_A ∩ S_B| is the unbiased difference
    * sample.
    */
  def andNotEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val ba = deserialize(a)
    val bb = deserialize(b)
    val theta = math.min(ba.theta, bb.theta)
    @inline def in(h: Long): Boolean = h / Two60 < theta
    var onlyA = 0L
    val ia = ba.set.iterator()
    val ib = bb.set.iterator()
    var vb = if (ib.hasNext) ib.next().longValue() else Long.MaxValue
    while (ia.hasNext) {
      val va = ia.next().longValue()
      if (in(va)) {
        while (vb < va) vb = if (ib.hasNext) ib.next().longValue() else Long.MaxValue
        if (va != vb) onlyA += 1
      }
    }
    onlyA / theta
  }
}

/** `kmv_build(key, k) -> binary`: one-pass KMV sketch of a key column
  * ([[KmvSketch]]). Partial buffers merge pairwise; the shuffle carries
  * ≤ k hashes per partition. Nulls are skipped. Output bytes are a pure
  * function of the key SET — safe to persist, compare, and re-union.
  */
case class KmvBuildAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType | IntegerType | StringType, IntegerType) if right.foldable =>
      val k = right.eval()
      if (k != null && k.asInstanceOf[Int] >= 2) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("k must be an int literal >= 2")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"kmv_build expects (long/int/string key, foldable int k), got ($l, $r)")
  }

  @transient private lazy val k: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_build"

  override def createAggregationBuffer(): KmvSketch.Buffer = new KmvSketch.Buffer(k)

  override def update(buf: KmvSketch.Buffer, input: InternalRow): KmvSketch.Buffer = {
    val v = left.eval(input)
    if (v != null) {
      // decimal rendering of integrals == DuckDB's CAST(x AS VARCHAR)
      val s = v match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case other => other.toString
      }
      buf.add(KmvSketch.hash60(s))
    }
    buf
  }

  override def merge(buf: KmvSketch.Buffer, other: KmvSketch.Buffer): KmvSketch.Buffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: KmvSketch.Buffer): Any = KmvSketch.serialize(buf)
  override def serialize(buf: KmvSketch.Buffer): Array[Byte] = KmvSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer = KmvSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvBuildAgg =
    copy(left = newLeft, right = newRight)
}

/** `kmv_merge_agg(binary) -> binary`: union of persisted [[KmvSketch]]
  * sketches — the rollup half of the sketch-table pattern. The union of
  * shard sketches is byte-identical to a cold [[KmvBuildAgg]] over the
  * raw keys at the same k (k-smallest of a union = k-smallest of the
  * pooled k-smallests). Sketches of differing k merge to the SMALLEST k
  * seen (the only cut that loses no information it still needs).
  */
case class KmvMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge_agg expects a binary sketch column, got $other")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_merge_agg"

  override def createAggregationBuffer(): KmvSketch.Buffer =
    new KmvSketch.Buffer(Int.MaxValue)

  private def recap(buf: KmvSketch.Buffer, k: Int): KmvSketch.Buffer =
    if (k >= buf.k) buf
    else {
      val nb = new KmvSketch.Buffer(k)
      nb.mergeFrom(buf)
      nb
    }

  override def update(buf: KmvSketch.Buffer, input: InternalRow): KmvSketch.Buffer = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val other = KmvSketch.deserialize(v.asInstanceOf[Array[Byte]])
      val out = recap(buf, other.k)
      out.mergeFrom(other)
      out
    }
  }

  override def merge(buf: KmvSketch.Buffer, other: KmvSketch.Buffer): KmvSketch.Buffer = {
    val out = recap(buf, other.k)
    out.mergeFrom(other)
    out
  }

  override def eval(buf: KmvSketch.Buffer): Any = KmvSketch.serialize(buf)
  override def serialize(buf: KmvSketch.Buffer): Array[Byte] = KmvSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer = KmvSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)
}

/** `kmv_cardinality(binary) -> double`: distinct estimate off a
  * serialized [[KmvSketch]] — exact (= n) while the sketch isn't full,
  * (k−1)/θ after. Called once per output group; interpreted eval off
  * the hot path.
  */
case class KmvCardinality(child: Expression) extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_cardinality expects a binary sketch column, got $other")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_cardinality"

  override protected def nullSafeEval(input: Any): Any =
    KmvSketch.estimate(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): KmvCardinality =
    copy(child = newChild)
}

/** `kmv_and_cardinality(binary, binary) -> double`: |A ∩ B| estimate of
  * two serialized [[KmvSketch]] sketches at the shared threshold
  * θ = min(θ_A, θ_B) — the constant-memory audience-overlap primitive
  * for unbounded key domains, where HLL cannot intersect and exact
  * bitmaps cannot fit. One two-pointer pass over the sorted wire
  * formats; nothing materializes.
  */
case class KmvAndCardinality(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kmv_and_cardinality expects (binary, binary), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_and_cardinality"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.andEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvAndCardinality =
    copy(left = newLeft, right = newRight)
}

/** `kmv_andnot_cardinality(binary, binary) -> double`: |A \ B| estimate
  * at the shared θ — audience exclusion ("users active in week 1 but
  * not week 2") from persisted sketches, the third set-algebra verb
  * next to intersection and union.
  */
case class KmvAndNotCardinality(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kmv_andnot_cardinality expects (binary, binary), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_andnot_cardinality"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.andNotEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvAndNotCardinality =
    copy(left = newLeft, right = newRight)
}

/** `kmv_or_cardinality(binary, binary) -> double`: |A ∪ B| estimate at
  * the shared θ — same pass as the intersection, counting the union of
  * the two θ-cut samples.
  */
case class KmvOrCardinality(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kmv_or_cardinality expects (binary, binary), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_or_cardinality"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.orEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvOrCardinality =
    copy(left = newLeft, right = newRight)
}
