package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<float>` columns —
  * the top rung of the extension ladder (Expression > UDF > interpreted
  * HOFs, SURVEY.md §4.3): operates directly on Tungsten `ArrayData` with
  * no per-row boxing into Scala collections (a UDF converts both arrays
  * to `WrappedArray[Float]` per call), and whole-stage codegen inlines the
  * loop into the generated consume path.
  *
  * Math in double precision, sequential left-to-right accumulation —
  * bit-compatible with the UDF kernel and oracle-comparable to 1e-15.
  * Null arrays → null (BinaryExpression null-safe contract); MISMATCHED
  * dimensions → null (same contract as the UDF kernel — a silent
  * truncated dot product is a wrong answer, and throwing would kill a
  * 100 TB job on one bad row). Null ELEMENTS are not expected (embedding
  * vectors are dense) and read as 0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // nullable regardless of children: mismatched dimensions produce null
  override def nullable: Boolean = true

  // manual type check (ExpectsInputTypes needs private[sql] AbstractDataType)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  // every local via ctx.freshName: two instances of this expression can
  // inline into ONE whole-stage-codegen function (e.g. a projection and a
  // filter both referencing cosine_similarity); fixed names collide there
  // ("Redefinition of local variable") and Janino rejects the whole stage
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
