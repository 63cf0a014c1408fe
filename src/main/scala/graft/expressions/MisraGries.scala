package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native aggregate
  * (`TypedImperativeAggregate` — the mergeable-buffer rung of the
  * extension ladder, which scalar `Expression`s can't demonstrate):
  * one pass, at most `capacity` counters per partial buffer, and the
  * classic deterministic guarantee that every item with true frequency
  * > N/(capacity+1) survives to the output. Buffers merge pairwise
  * (Agarwal et al. '13: sum counters, then subtract the (capacity+1)-th
  * largest and drop non-positives), so the aggregate is partial-final
  * like any built-in — the shuffle carries `capacity` counters per
  * partition, NEVER the vocabulary.
  *
  * Output: `array<struct<item string, est bigint>>`, est-descending
  * (item-ascending tie-break). `est` undercounts by at most N/(capacity
  * +1); [[graft.operators.Scoring.heavyHitters]] re-counts the
  * surviving candidates exactly in a second bounded pass.
  *
  * The miss path decrements all counters (O(capacity)); amortized this
  * charges each decrement to a prior increment, so a scan is O(rows +
  * capacity·distinct-misses) — the textbook trade for a hard memory
  * bound. Nulls are skipped (SQL aggregate convention).
  */
case class MisraGries(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        val k = right.eval()
        if (k != null && k.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("capacity must be a positive int literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"misra_gries expects (string, foldable int capacity), got ($l, $r)")
    }

  @transient private lazy val capacity: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long]()

  override def update(buf: java.util.HashMap[UTF8String, Long],
                      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val v = left.eval(input)
    if (v == null) return buf
    val s = v.asInstanceOf[UTF8String]
    val cur = buf.get(s)
    if (cur != 0L || buf.containsKey(s)) buf.put(s.clone(), cur + 1L)
    else if (buf.size() < capacity) buf.put(s.clone(), 1L)
    else decrementAll(buf, 1L)
    buf
  }

  override def merge(buf: java.util.HashMap[UTF8String, Long],
                     other: java.util.HashMap[UTF8String, Long]): java.util.HashMap[UTF8String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (buf.size() > capacity) {
      // subtract the (capacity+1)-th largest counter from everything —
      // keeps ≤ capacity counters and preserves the MG error bound
      val values = new Array[Long](buf.size())
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { values(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(values)
      decrementAll(buf, values(buf.size() - capacity - 1))
    }
    buf
  }

  private def decrementAll(buf: java.util.HashMap[UTF8String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  override def eval(buf: java.util.HashMap[UTF8String, Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size())
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortWith { case ((ia, ea), (ib, eb)) =>
      ea > eb || (ea == eb && ia.compareTo(ib) < 0)
    }
    new GenericArrayData(sorted.map { case (item, est) =>
      new GenericInternalRow(Array[Any](item, est)): Any
    })
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[UTF8String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGries =
    copy(left = newLeft, right = newRight)
}
