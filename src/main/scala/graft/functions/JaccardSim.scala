package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object JaccardKernel {
  /** |A∩B| / |A∪B| for two DISTINCT string arrays (the tokenizer applies
    * array_distinct): one hash-set build + one probe pass, no
    * intermediate arrays — replaces array_intersect + array_union, which
    * build two result arrays per pair on the hottest join in dedup. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[UTF8String](Math.max(16, na * 2))
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < nb) { if (set.contains(b.getUTF8String(j))) inter += 1; j += 1 }
    inter.toDouble / (na + nb - inter).toDouble
  }
}

/** Native exact Jaccard over two distinct string-array columns. */
case class JaccardSimExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def strArray(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (strArray(left.dataType) && strArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim expects array<string> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardKernel.compute($a, $b);")

  override def prettyName: String = "jaccard_sim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimExpr =
    copy(left = newLeft, right = newRight)
}
