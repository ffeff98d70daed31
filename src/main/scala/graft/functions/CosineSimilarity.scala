package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused cosine similarity over two numeric array columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * The `functions.aggregate`/`zip_with` formulation walks each vector
  * three times through higher-order-function machinery (one lambda call
  * per element per pass); this kernel is a single fused loop emitted
  * directly into the generated code — the hot inner loop of every ANN /
  * near-dup scoring join. Accumulation order matches the HOF version
  * (sequential, ascending index), so results are bit-identical on
  * well-formed inputs. Degenerate inputs diverge DELIBERATELY: a
  * dimension mismatch REFUSES (the HOF null-pads to NULL; min-length
  * truncation scored confident wrong prefixes), and zero-norm vectors
  * score 0.0 (the HOF's 0/0 NULL and a raw NaN both poison top-k
  * ordering — Catalyst sorts NaN greatest).
  *
  * Mirrors the role of Drill's generated per-batch evaluation loops
  * (reference: exec/java-exec codegen over value vectors), expressed the
  * Spark way: Expression + doGenCode.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  private def numericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (numericArray(left.dataType) && numericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // refuse, never truncate: min(len) silently scored a confident
    // PREFIX cosine on mixed-dimension corpora (partial re-embedding
    // migrations) — wrong neighbors with no error
    if (n != y.numElements()) throw new IllegalArgumentException(
      s"cosine_sim: dimension mismatch ($n vs ${y.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    // zero-norm vectors (padding artifacts) score 0, NOT NaN: Catalyst
    // sorts NaN GREATEST, so a 0/0 here made an all-zero embedding the
    // rank-1 neighbor of every query and a ">= threshold" near-dup of
    // everything it shared a bucket with
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val dn = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: dimension mismatch (" + $n + " vs " +
         |      $b.numElements() + ")");
         |}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = (double) $a.$lGet($i);
         |  double yv = (double) $b.$rGet($i);
         |  $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
         |}
         |double $dn = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($dn == 0.0) ? 0.0 : $dot / $dn;
       """.stripMargin
    })
  }

  override def prettyName: String = "cosine_sim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
