package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native one-pass symmetric int8 quantization report over an
  * `array<float|double>` embedding: `struct<scale double, q_sum bigint,
  * q_l1 bigint, max_err double>` — the fused kernel behind
  * [[graft.operators.Quantize.quantizeReport]].
  *
  * Replaces the declarative composition (`array_max(transform(abs))` +
  * two `aggregate`s + a `zip_with`), whose per-element lambdas run
  * INTERPRETED (higher-order functions don't codegen their bodies —
  * SURVEY §4.3) and, worse, re-evaluate the embedded scale subexpression
  * `array_max(...)` once per element per output column: O(4·d²)
  * interpreted ops per vector. This kernel is two JIT'd passes (scale,
  * then codes+stats): O(d).
  *
  * Semantics are EXACTLY the declarative/oracle contract
  * (engine-portable; the q58 DuckDB oracle recomputes it):
  *   scale = max_i |x_i| / 127 (doubles; 0.0 for empty/all-zero),
  *   q_i   = round-half-away-from-zero(x_i / scale), 0 when scale = 0,
  *   q_sum = Σ q_i,  q_l1 = Σ |q_i|,  max_err = max_i |q_i·scale − x_i|.
  * Ties round away from zero on the EXACT binary double (BigDecimal
  * HALF_UP = Spark's `round` = C `round()`) — `(long)(x + 0.5)` would
  * misround 0.49999999999999994. Null elements are skipped in every
  * statistic (the data contract has none).
  */
case class QuantizeInt8Stats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8_stats expects array<float|double>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_l1", LongType, nullable = false),
    StructField("max_err", DoubleType, nullable = false)))

  override def prettyName: String = "quantize_int8_stats"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elem(a: ArrayData, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  private def roundHalfAwayFromZero(d: Double): Long =
    new java.math.BigDecimal(d).setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Shared by interpreted eval and codegen (same rationale as
    * [[TextArrayStats.compute]]: the loop is identical either way and a
    * reference-object call can't collide in Janino).
    */
  def compute(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = math.abs(elem(a, i))
        if (v > maxAbs) maxAbs = v
      }
      i += 1
    }
    val scale = maxAbs / 127.0
    var qSum = 0L
    var qL1 = 0L
    var maxErr = 0.0
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val x = elem(a, i)
          val q = roundHalfAwayFromZero(x / scale)
          qSum += q
          qL1 += math.abs(q)
          val e = math.abs(q * scale - x)
          if (e > maxErr) maxErr = e
        }
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale, qSum, qL1, maxErr))
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("quantizeInt8Stats", this, classOf[QuantizeInt8Stats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Stats =
    copy(child = newChild)
}
