package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** A constant-0 int that is deliberately NOT foldable.
  *
  * Purpose: a window partition key for BOUNDED-BY-CONTRACT global
  * windows ([[graft.operators.Windows.boundedGlobal]]). A plain
  * `lit(0)` there is stripped by Catalyst's `EliminateWindowPartitions`
  * (it removes foldable partition keys), which reverts the spec to the
  * empty-partition form and brings back WindowExec's per-task
  * "No Partition Defined" warning. Declaring `foldable = false` keeps
  * the key in the plan; execution is identical either way (every row
  * hashes to the one partition the caller's bound already implies).
  * Deterministic, null-free, a compile-time constant under codegen —
  * zero per-row cost.
  */
case class SingletonKey() extends LeafExpression {

  override def nullable: Boolean = false

  override def dataType: DataType = IntegerType

  // the entire point of this expression — see scaladoc
  override def foldable: Boolean = false

  override def prettyName: String = "singleton_key"

  override def eval(input: InternalRow): Any = 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.EmptyBlock,
      isNull = FalseLiteral, value = JavaCode.literal("0", IntegerType))
}
