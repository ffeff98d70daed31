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
    val denom = na + nb - inter
    // J(∅,∅) = 0, NOT NaN: Catalyst compares NaN LARGER than any value
    // (NaN >= threshold is TRUE), so a NaN here silently marked every
    // blank-vs-blank pair a near-dup on the SQL verify path while the
    // plain-JVM stateful path (Java NaN semantics) kept them — 0.0 means
    // "no evidence of similarity" on both paths.
    if (denom == 0) 0.0 else inter.toDouble / denom.toDouble
  }

  /** Long-array variant for hashed-token sets: two-pointer merge count
    * over sorted arrays — zero allocation beyond the primitive copies, no
    * hashing, no boxing. The dedup pipeline pre-sorts with array_sort, so
    * the defensive sort below is a no-op check in the hot path. */
  def computeLong(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    if (!isSorted(xs)) java.util.Arrays.sort(xs)
    if (!isSorted(ys)) java.util.Arrays.sort(ys)
    var i = 0; var j = 0; var inter = 0
    while (i < xs.length && j < ys.length) {
      val x = xs(i); val y = ys(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val denom = xs.length + ys.length - inter
    if (denom == 0) 0.0 else inter.toDouble / denom.toDouble // see compute()
  }

  private def isSorted(a: Array[Long]): Boolean = {
    var i = 1
    while (i < a.length) { if (a(i - 1) > a(i)) return false; i += 1 }
    true
  }

  /** Plain-JVM form of [[computeLong]] for stateful-streaming handlers
    * (flatMapGroupsWithState verifies candidates in Scala, not Catalyst).
    * Inputs must be sorted distinct hashed-token arrays. */
  def computeLongArrays(xs: Array[Long], ys: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < xs.length && j < ys.length) {
      val x = xs(i); val y = ys(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val denom = xs.length + ys.length - inter
    if (denom == 0) 0.0 else inter.toDouble / denom.toDouble // see compute()
  }
}

/** Native exact Jaccard over two distinct array columns — array<string>
  * (hash-set probe) or array<bigint> (sorted two-pointer merge, the
  * hashed-token fast path the dedup verify join runs on). */
case class JaccardSimExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(StringType, _) => Some(StringType)
    case ArrayType(LongType, _) => Some(LongType)
    case _ => None
  }

  private lazy val longMode: Boolean = elemType(left.dataType).contains(LongType)

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sim expects two array<string> or two array<bigint> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    if (longMode)
      JaccardKernel.computeLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      JaccardKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (longMode) "computeLong" else "compute"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardKernel.$method($a, $b);")
  }

  override def prettyName: String = "jaccard_sim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimExpr =
    copy(left = newLeft, right = newRight)
}
