package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Fused MinHash-signature + LSH-banding kernel: from a hashed-token
  * `array<bigint>` directly to the `array<struct<band_idx:int,
  * band_hash:bigint>>` the dedup miners explode.
  *
  * BIT-COMPATIBLE by construction with the declarative two-step the
  * miners used before —
  * `Dedup.lshBands(minhash_signature(toks, k), b, k/b)`, i.e. per band
  * `xxhash64(slice(sig, j*r+1, r))` — because it calls the same public
  * XXH64 statics in the same order: signature slot i is
  * `min over toks of XXH64.hashInt(i, XXH64.hashLong(tok, 42))` (the
  * [[MinHashSignature]] kernel), and a band hash folds its r slots
  * through `XXH64.hashLong(slot, acc)` from the seed 42, skipping null
  * slots exactly as Spark's array hashing does (an EMPTY token array
  * yields an all-null signature, so every band hash is the seed 42).
  *
  * Why fusion and not two expressions: Catalyst performs no
  * common-subexpression elimination inside higher-order-function
  * lambdas, so `lshBands(sig, b, r)` after projection collapse
  * re-evaluated `minhash_signature` ONCE PER BAND inside the
  * interpreted `transform` lambda — b× the signature cost (104× for
  * the selective-banding miner) and all of it interpreted, with
  * JIT-profile-dependent 8× run-to-run swings at bench. Here the
  * signature is computed once per row and the banding loop is
  * whole-stage-codegen'd with everything else in the projection.
  *
  * `k` (numHashes) and `b` (bands) must be foldable positive ints with
  * b dividing k.
  */
case class LshBandHashes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        val k = second.eval()
        val b = third.eval()
        if (k == null || b == null || k.asInstanceOf[Int] <= 0 ||
            b.asInstanceOf[Int] <= 0 ||
            k.asInstanceOf[Int] % b.asInstanceOf[Int] != 0)
          TypeCheckResult.TypeCheckFailure(
            "lsh_band_hashes needs positive int literals k, b with b dividing k")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"lsh_band_hashes expects (array<bigint>, foldable int, foldable int), got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band_idx", IntegerType, nullable = false),
      StructField("band_hash", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "lsh_band_hashes"

  @transient private lazy val k: Int = second.eval().asInstanceOf[Int]
  @transient private lazy val b: Int = third.eval().asInstanceOf[Int]

  /** Shared by interpreted eval and codegen (the [[CharGramBuckets]]
    * pattern). Null signature slots only occur when `toks` is empty —
    * then every band folds zero slots and stays at the xxhash64 seed.
    */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val r = k / b
    val out = new Array[Any](b)
    if (n == 0) {
      var j = 0
      while (j < b) { out(j) = InternalRow(j, 42L); j += 1 }
      return new GenericArrayData(out)
    }
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var t = 0
    while (t < n) {
      val inner = XXH64.hashLong(toks.getLong(t), 42L)
      var i = 0
      while (i < k) {
        val v = XXH64.hashInt(i, inner)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      t += 1
    }
    var j = 0
    while (j < b) {
      var h = 42L
      var i = j * r
      val end = i + r
      while (i < end) { h = XXH64.hashLong(sig(i), h); i += 1 }
      out(j) = InternalRow(j, h)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, kk: Any, bb: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  // all locals via ctx.freshName — multiple instances may inline into one
  // whole-stage-codegen function (the MinHashSignature lesson)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lshBandHashes", this, classOf[LshBandHashes].getName)
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      s"${ev.value} = $self.compute($a);"
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LshBandHashes =
    copy(first = newFirst, second = newSecond, third = newThird)
}
