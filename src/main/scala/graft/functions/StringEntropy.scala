package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object StringEntropy {
  /** Shannon entropy (bits/char) of the character distribution — the
    * security-log randomness score from Drill's threat-hunting pack
    * (reference contrib/udfs/.../ThreatHuntingFunctions.java entropy).
    * Single pass over a bounded char-count table; terms are summed in
    * ascending char order so the result is deterministic for a given
    * string. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0.0
    // HashMap + one final key sort keeps the deterministic ascending-
    // char summation order WITHOUT paying boxed TreeMap rebalancing per
    // character on this codegen'd hot path
    val counts = new java.util.HashMap[Character, Int]()
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      counts.merge(c, 1, (a, b) => a + b)
      i += 1
    }
    val keys = new Array[Char](counts.size)
    val it0 = counts.keySet().iterator()
    var j = 0
    while (it0.hasNext) { keys(j) = it0.next(); j += 1 }
    java.util.Arrays.sort(keys)
    var h = 0.0
    j = 0
    while (j < keys.length) {
      val p = counts.get(keys(j)).toDouble / n
      h += p * (math.log(p) / math.log(2.0))
      j += 1
    }
    math.abs(h)
  }
}

/** entropy(str): bits of Shannon entropy per character. Registered via
  * GraftExtensions; verified against hand-computed values in ScalaTest
  * (log-based doubles are not bit-portable across engines, so this row is
  * spec-gated, not DuckDB-gated). */
case class StringEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"entropy expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any =
    StringEntropy.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StringEntropy.compute($c);")

  override def prettyName: String = "entropy"

  override protected def withNewChildInternal(newChild: Expression): StringEntropyExpr =
    copy(child = newChild)
}
