package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** DDSketch (Masson, Lee & Rim, "DDSketch: a fast and fully-mergeable
  * quantile sketch with relative-error guarantees", VLDB 2019) — the
  * quantile leg of the sketch-table pattern next to [[Bitmap64]]
  * (exact distinct) and the HLL built-ins (approx distinct).
  *
  * A value x > 0 lands in bin ⌈log_γ(x)⌉ with γ = (1+α)/(1−α); any
  * value reported from a bin is within relative error α of the true
  * value. Negative values mirror into a second store; zeros (and
  * |x| below a tiny floor) count separately. Three properties make it
  * the right persisted shape at 100 TB:
  *
  *  - MERGE IS BIN-WISE ADDITION — associative, commutative, and (with
  *    the sorted wire format below) the union of shard sketches is
  *    byte-identical to a cold one-pass build, like the bitmap and
  *    unlike randomized KLL/t-digest compaction. Incremental rollups
  *    can never drift from recomputes. (Caveat: once the `maxBins`
  *    collapse fires, WHICH bins collapsed depends on arrival order —
  *    the guarantee is exact byte-identity in the no-collapse regime
  *    and α-bounded answers always.)
  *  - The guarantee is RELATIVE error on the VALUE — a p99 latency of
  *    1 s is answered within ±α·1 s no matter how heavy the tail,
  *    where rank-error sketches (percentile_approx) can be off by
  *    unbounded value amounts on skewed tails.
  *  - Size is bounded by `maxBins` via the paper's collapse rule (the
  *    LOWEST bins merge into one), trading accuracy only at the small
  *    end — tail quantiles, the ones dashboards ask for, keep the α
  *    guarantee.
  *
  * Wire format (deterministic: bins ascending): `float64 alpha,
  * int64 zeros, int32 nPos, nPos × (int32 bin, int64 count),
  * int32 nNeg, nNeg × (int32 bin, int64 count)`.
  */
object DDSketch {

  /** Bins per store before the low-end collapse kicks in. 2048 bins at
    * α = 1% span > 40 orders of magnitude — collapse is a safety valve,
    * not a working regime.
    */
  val MaxBins = 2048

  /** |x| below this floor counts as zero (log-bins cannot hold 0). */
  val ZeroFloor = 1e-12

  final class Sketch(val alpha: Double) {
    val gamma: Double = (1 + alpha) / (1 - alpha)
    private val logGamma = math.log(gamma)
    // bin index -> count, both signs; zeros tracked separately
    val pos = new java.util.HashMap[Integer, java.lang.Long]()
    val neg = new java.util.HashMap[Integer, java.lang.Long]()
    var zeros: Long = 0L

    def binOf(absX: Double): Int = math.ceil(math.log(absX) / logGamma).toInt

    /** Midpoint value a bin reports: 2γ^i/(γ+1) — within α of any x
      * that mapped to bin i.
      */
    def valueOf(bin: Int): Double = 2.0 * math.pow(gamma, bin) / (gamma + 1)

    def add(x: Double, w: Long = 1L): Unit =
      if (math.abs(x) < ZeroFloor) zeros += w
      else {
        val store = if (x > 0) pos else neg
        store.merge(binOf(math.abs(x)), w, (a, b) => a + b)
        if (store.size() > MaxBins) collapse(store)
      }

    /** Paper's size bound: merge the LOWEST bins (smallest magnitudes)
      * into one until within MaxBins — tail accuracy is untouched.
      */
    private def collapse(store: java.util.HashMap[Integer, java.lang.Long]): Unit = {
      val keys = sortedKeys(store)
      var i = 0
      var acc = 0L
      val upto = keys.length - MaxBins + 1 // bins to fold into keys(upto-1)... fold into the (upto-1)-th
      while (i < upto) { acc += store.remove(keys(i)); i += 1 }
      store.put(keys(upto - 1), acc) // re-landed in the highest collapsed bin
    }

    def mergeFrom(other: Sketch): Unit = {
      require(other.alpha == alpha,
        s"cannot merge DDSketches with different alpha ($alpha vs ${other.alpha})")
      zeros += other.zeros
      val itP = other.pos.entrySet().iterator()
      while (itP.hasNext) {
        val e = itP.next()
        pos.merge(e.getKey, e.getValue, (a, b) => a + b)
      }
      if (pos.size() > MaxBins) collapse(pos)
      val itN = other.neg.entrySet().iterator()
      while (itN.hasNext) {
        val e = itN.next()
        neg.merge(e.getKey, e.getValue, (a, b) => a + b)
      }
      if (neg.size() > MaxBins) collapse(neg)
    }

    def totalCount: Long = {
      var t = zeros
      val itP = pos.values().iterator()
      while (itP.hasNext) t += itP.next()
      val itN = neg.values().iterator()
      while (itN.hasNext) t += itN.next()
      t
    }

    /** Quantile estimate: walk negatives (most-negative first = highest
      * bin of the mirrored store first), zeros, then positives in bin
      * order until the target rank.
      */
    def quantile(q: Double): Double = {
      require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
      val n = totalCount
      if (n == 0) return Double.NaN
      val rank = math.max(0L, math.min(n - 1, math.round(q * (n - 1)).toLong))
      var seen = 0L
      // negatives: descending bin = ascending value (-valueOf(bin))
      val negKeys = sortedKeys(neg)
      var i = negKeys.length - 1
      while (i >= 0) {
        seen += neg.get(negKeys(i))
        if (seen > rank) return -valueOf(negKeys(i))
        i -= 1
      }
      seen += zeros
      if (seen > rank) return 0.0
      val posKeys = sortedKeys(pos)
      i = 0
      while (i < posKeys.length) {
        seen += pos.get(posKeys(i))
        if (seen > rank) return valueOf(posKeys(i))
        i += 1
      }
      if (posKeys.nonEmpty) valueOf(posKeys(posKeys.length - 1))
      else if (zeros > 0) 0.0
      else -valueOf(sortedKeys(neg)(0))
    }

    private def sortedKeys(store: java.util.HashMap[Integer, java.lang.Long]): Array[Int] = {
      val keys = new Array[Int](store.size())
      var i = 0
      val it = store.keySet().iterator()
      while (it.hasNext) { keys(i) = it.next(); i += 1 }
      java.util.Arrays.sort(keys)
      keys
    }

    def serialize(): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeDouble(alpha)
      out.writeLong(zeros)
      def writeStore(store: java.util.HashMap[Integer, java.lang.Long]): Unit = {
        val keys = sortedKeys(store)
        out.writeInt(keys.length)
        var i = 0
        while (i < keys.length) {
          out.writeInt(keys(i))
          out.writeLong(store.get(keys(i)))
          i += 1
        }
      }
      writeStore(pos)
      writeStore(neg)
      out.flush()
      bos.toByteArray
    }
  }

  /** PSI between two DDSketches — drift gating straight off PERSISTED
    * sketch tables, no raw-value re-scan: both sketches share the same
    * log-γ bin function (equal alpha required), so their bin
    * histograms are directly comparable; fractions are eps-floored
    * like [[graft.operators.Drift]]. The zero band counts as its own
    * bin; positive and negative stores compare bin-by-bin over the
    * union of occupied bins.
    */
  def psi(base: Sketch, current: Sketch, eps: Double = 1e-6): Double = {
    require(base.alpha == current.alpha,
      s"cannot compare sketches with different alpha (${base.alpha} vs ${current.alpha})")
    val tb = base.totalCount.toDouble
    val tc = current.totalCount.toDouble
    require(tb > 0 && tc > 0, "cannot compute PSI against an empty sketch")
    var out = 0.0
    def term(nb: Long, nc: Long): Unit = {
      val ef = math.max(nb / tb, eps)
      val af = math.max(nc / tc, eps)
      out += (af - ef) * math.log(af / ef)
    }
    def store(sel: Sketch => java.util.HashMap[Integer, java.lang.Long]): Unit = {
      val keys = new java.util.HashSet[Integer](sel(base).keySet())
      keys.addAll(sel(current).keySet())
      val it = keys.iterator()
      while (it.hasNext) {
        val k = it.next()
        term(Option(sel(base).get(k)).map(_.longValue).getOrElse(0L),
          Option(sel(current).get(k)).map(_.longValue).getOrElse(0L))
      }
    }
    store(_.pos)
    store(_.neg)
    if (base.zeros > 0 || current.zeros > 0) term(base.zeros, current.zeros)
    out
  }

  def deserialize(bytes: Array[Byte]): Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new Sketch(in.readDouble())
    sk.zeros = in.readLong()
    def readStore(store: java.util.HashMap[Integer, java.lang.Long]): Unit = {
      val n = in.readInt()
      var i = 0
      while (i < n) { store.put(in.readInt(), in.readLong()); i += 1 }
    }
    readStore(sk.pos)
    readStore(sk.neg)
    sk
  }
}

/** `ddsketch_build(double, alpha) -> binary`: one-pass DDSketch of a
  * value column at relative accuracy `alpha` (foldable literal).
  * Partial buffers merge bin-wise; the wire format is deterministic,
  * so a persisted sketch column is stable and shard unions are
  * byte-identical to cold builds. Nulls and NaNs are skipped.
  */
case class DDSketchAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DDSketch.Sketch]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) if right.foldable =>
        val a = right.eval()
        if (a != null && a.asInstanceOf[Double] > 0 && a.asInstanceOf[Double] < 1)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("alpha must be a double literal in (0, 1)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ddsketch_build expects (double, foldable double alpha), got ($l, $r)")
    }

  @transient private lazy val alpha: Double = right.eval().asInstanceOf[Double]

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ddsketch_build"

  override def createAggregationBuffer(): DDSketch.Sketch = new DDSketch.Sketch(alpha)

  override def update(buf: DDSketch.Sketch, input: InternalRow): DDSketch.Sketch = {
    val v = left.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buf.add(d)
    }
    buf
  }

  override def merge(buf: DDSketch.Sketch, other: DDSketch.Sketch): DDSketch.Sketch = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: DDSketch.Sketch): Any = buf.serialize()

  override def serialize(buf: DDSketch.Sketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): DDSketch.Sketch = DDSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DDSketchAgg =
    copy(left = newLeft, right = newRight)
}

/** `ddsketch_merge_agg(binary) -> binary`: bin-wise union of persisted
  * DDSketches — the rollup half. Refuses mismatched alphas loudly.
  */
case class DDSketchMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DDSketch.Sketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ddsketch_merge_agg expects a binary sketch column, got $other")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ddsketch_merge_agg"

  /** Alpha is adopted from the first sketch seen (empty buffer marker:
    * alpha = 0 means "not yet bound").
    */
  override def createAggregationBuffer(): DDSketch.Sketch = new DDSketch.Sketch(0.0)

  private def fold(buf: DDSketch.Sketch, other: DDSketch.Sketch): DDSketch.Sketch =
    if (other.alpha == 0.0) buf // other side empty/unbound
    else if (buf.alpha == 0.0) other // adopt the first real sketch
    else { buf.mergeFrom(other); buf }

  override def update(buf: DDSketch.Sketch, input: InternalRow): DDSketch.Sketch = {
    val v = child.eval(input)
    if (v == null) buf
    else fold(buf, DDSketch.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: DDSketch.Sketch, other: DDSketch.Sketch): DDSketch.Sketch =
    fold(buf, other)

  override def eval(buf: DDSketch.Sketch): Any = buf.serialize()

  override def serialize(buf: DDSketch.Sketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): DDSketch.Sketch = DDSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DDSketchMergeAgg =
    copy(child = newChild)
}

/** `ddsketch_psi(binary, binary) -> double`: PSI of (base, current)
  * persisted DDSketches — the [[graft.operators.Drift]] gate without
  * re-scanning raw values. Equal-alpha sketches only (refused loudly).
  */
case class DDSketchPsi(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ddsketch_psi expects (binary base, binary current), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "ddsketch_psi"

  override protected def nullSafeEval(base: Any, current: Any): Any =
    DDSketch.psi(DDSketch.deserialize(base.asInstanceOf[Array[Byte]]),
      DDSketch.deserialize(current.asInstanceOf[Array[Byte]]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DDSketchPsi =
    copy(left = newLeft, right = newRight)
}

/** `ddsketch_quantile(binary, q) -> double`: quantile estimate off a
  * serialized DDSketch — within relative error α of the true value for
  * the ranks the sketch guarantees. Interpreted eval; one call per
  * output group.
  */
case class DDSketchQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ddsketch_quantile expects (binary sketch, double quantile), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "ddsketch_quantile"

  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    DDSketch.deserialize(sketch.asInstanceOf[Array[Byte]])
      .quantile(q.asInstanceOf[Double])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DDSketchQuantile =
    copy(left = newLeft, right = newRight)
}
