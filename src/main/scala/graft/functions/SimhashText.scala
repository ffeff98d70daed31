package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object SimhashText {
  /** Whole-document SimHash in ONE pass over pre-normalized text: split on
    * single spaces, md5-derived 32-bit hash per token (the engine-portable
    * hash the DuckDB oracle reproduces), signed bit votes, sign-packed
    * signature. SimHash is a per-document function — computing it as a
    * scalar kernel removes the token explode AND the groupBy shuffle the
    * aggregate formulation pays (1M exploded rows per 5k docs at sf0.1).
    * The aggregate (SimhashAgg) stays as the distributed formulation and
    * equality oracle.
    *
    * Matches the split semantics of split(text, " ") (limit -1) exactly —
    * including the empty tokens that leading/trailing/double spaces and
    * the empty document produce — so the three formulations stay
    * bit-identical on ANY input, not just pre-normalized text. */
  def compute(s: UTF8String, bits: Int): Long = {
    val str = s.toString
    val n = str.length
    val votes = new Array[Int](bits)
    def vote(tok: String): Unit = {
      val h = Md5Hash32.compute(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var start = 0
    var more = true
    while (more) {
      var end = str.indexOf(' ', start)
      if (end < 0) end = n
      vote(str.substring(start, end))
      if (end == n) more = false else start = end + 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** simhash_text(normalizedText, bits): whole-doc portable SimHash as a
  * scalar expression (codegen). Registered via GraftExtensions. */
case class SimhashTextExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"simhash_text expects (string, int), got ${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any, bits: Any): Any =
    SimhashText.compute(s.asInstanceOf[UTF8String], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, b) =>
      s"${ev.value} = graft.functions.SimhashText.compute($s, $b);")

  override def prettyName: String = "simhash_text"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashTextExpr =
    copy(left = newLeft, right = newRight)
}
