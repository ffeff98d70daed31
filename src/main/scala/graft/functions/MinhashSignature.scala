package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object MinhashKernel {
  /** Smallest prime > 2^32 (see Dedup.MinhashP — the modulus must engage
    * for 32-bit inputs or every "function" degenerates to argmin(h)). */
  val P = 4294967311L

  /** Deterministic Carter-Wegman coefficients, a in [1, 2^31) so a*h+b
    * never overflows a long for 32-bit h. Shared by the native kernel and
    * the built-ins-only formulation so both produce identical signatures. */
  def coeffs(k: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(k)((
      java.lang.Math.floorMod(rnd.nextLong(), (1L << 31) - 1) + 1,
      java.lang.Math.floorMod(rnd.nextLong(), P)))
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def ab(k: Int): (Array[Long], Array[Long]) =
    cache.computeIfAbsent(k, k2 => {
      val c = coeffs(k2); (c.map(_._1), c.map(_._2))
    })

  /** All k minhash rows in ONE pass over the token-hash array. */
  def compute(th: ArrayData, k: Int): ArrayData = {
    val (as, bs) = ab(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val n = th.numElements()
    var t = 0
    while (t < n) {
      val h = th.getLong(t)
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native minhash signature: `minhash_sig(tokenHashes, k)` over a
  * precomputed array<long> of 32-bit token hashes. The built-ins-only
  * formulation (k x array_min(transform(...))) walks the array k times
  * through higher-order-function machinery; this kernel is one fused
  * loop. Bit-identical coefficients via MinhashKernel.coeffs. */
case class MinhashSignatureExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right) match {
    case (ArrayType(LongType, _), Literal(_, IntegerType)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "minhash_sig expects (array<bigint>, int literal k)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any =
    MinhashKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MinhashKernel.compute($a, $b);")

  override def prettyName: String = "minhash_sig"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSignatureExpr =
    copy(left = newLeft, right = newRight)
}
