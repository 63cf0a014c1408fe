package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic bottom-k sample: a uniform sample of k DISTINCT key
  * values per group, mergeable across shards — "show me a few example
  * user ids / documents per segment" answered in one aggregation pass
  * at any scale. The selection rule is hash-order, not randomness:
  * keep the k keys whose md5-prefix hash ([[KmvSketch.hash60]], the
  * engine-portable convention) is smallest, ties broken by the key
  * string. A hash-uniform sample IS a uniform sample of the distinct
  * key set, and determinism buys what `rand()`-based sampling can't:
  * shard-merges are exact (bottom-k of pooled bottom-ks = bottom-k of
  * the union), reruns and retries agree, samples of OVERLAPPING groups
  * overlap consistently (the same key is either in or out everywhere),
  * and a SQL oracle can replay the pick exactly.
  *
  * Repeated occurrences of a key collapse (this samples the distinct
  * VALUE set, not occurrences — pair with [[Cms]] when frequency
  * matters). Output is the sampled key STRINGS in hash order —
  * integral keys render in decimal, matching DuckDB's
  * `CAST(x AS VARCHAR)`.
  */
object BottomKSample {

  /** (hash, key) pairs ordered by hash then key — the pick order. */
  type Buffer = java.util.TreeMap[(Long, String), Unit]

  def empty(): Buffer = new java.util.TreeMap[(Long, String), Unit](
    new java.util.Comparator[(Long, String)] {
      override def compare(a: (Long, String), b: (Long, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    })

  def add(buf: Buffer, k: Int, key: String): Unit = {
    val entry = (KmvSketch.hash60(key), key)
    if (buf.size < k) { buf.put(entry, ()); () }
    else if (buf.comparator.compare(entry, buf.lastKey()) < 0) {
      if (buf.put(entry, ()) == null) { buf.pollLastEntry(); () }
    }
  }

  def mergeInto(buf: Buffer, k: Int, other: Buffer): Unit = {
    val it = other.keySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (buf.size < k) buf.put(e, ())
      else if (buf.comparator.compare(e, buf.lastKey()) < 0) {
        if (buf.put(e, ()) == null) buf.pollLastEntry()
      }
    }
  }

  def serialize(buf: Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.keySet().iterator()
    while (it.hasNext) {
      val (h, s) = it.next()
      out.writeLong(h)
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = empty()
    var i = 0
    while (i < n) {
      val h = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put((h, new String(b, java.nio.charset.StandardCharsets.UTF_8)), ())
      i += 1
    }
    buf
  }
}

/** `sample_bottomk(key, k) -> array<string>`: k-distinct-key uniform
  * sample per group, hash-ordered, mergeable, deterministic. Nulls are
  * skipped.
  */
case class BottomKSampleAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKSample.Buffer]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType | IntegerType | StringType, IntegerType) if right.foldable =>
      val k = right.eval()
      if (k != null && k.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("k must be an int literal >= 1")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sample_bottomk expects (long/int/string key, foldable int k), got ($l, $r)")
  }

  @transient private lazy val k: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sample_bottomk"

  override def createAggregationBuffer(): BottomKSample.Buffer = BottomKSample.empty()

  override def update(buf: BottomKSample.Buffer, input: InternalRow): BottomKSample.Buffer = {
    val v = left.eval(input)
    if (v != null) {
      val s = v match {
        case u: UTF8String => u.toString
        case other => other.toString
      }
      BottomKSample.add(buf, k, s)
    }
    buf
  }

  override def merge(buf: BottomKSample.Buffer,
                     other: BottomKSample.Buffer): BottomKSample.Buffer = {
    BottomKSample.mergeInto(buf, k, other)
    buf
  }

  override def eval(buf: BottomKSample.Buffer): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()._2); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: BottomKSample.Buffer): Array[Byte] =
    BottomKSample.serialize(buf)
  override def deserialize(bytes: Array[Byte]): BottomKSample.Buffer =
    BottomKSample.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSampleAgg =
    copy(left = newLeft, right = newRight)
}
