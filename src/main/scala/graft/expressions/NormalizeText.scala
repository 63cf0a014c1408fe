package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonicalization
  * step a multilingual training corpus needs before dedup/fingerprinting
  * (the same text arrives both precomposed `é` and decomposed `e`+`´`;
  * without normalization exact dedup and md5 fingerprints silently treat
  * them as different documents). Spark has no built-in; this wraps the
  * JDK's `java.text.Normalizer` (Unicode-standard NFC) as a native
  * expression so it runs inside whole-stage codegen rather than as an
  * opaque UDF. DuckDB's `nfc_normalize` implements the same Unicode
  * algorithm, which is what makes an engine-independent oracle possible
  * (q55).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for virtually all real text — only strings that actually contain
  * decomposition targets pay for re-composition and re-encoding.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"normalize_nfc expects string, got $t")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "normalize_nfc"

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("normalizeNfc", this, classOf[NormalizeNfc].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}
