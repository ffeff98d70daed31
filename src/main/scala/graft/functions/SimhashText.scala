package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
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

  /** 64-bit portable SimHash as TWO 32-bit halves [lo, hi], one pass:
    * one md5 digest per token; lo's votes come from digest bytes 0-3 (the
    * exact md5_hash32 value), hi's from bytes 4-7 (hex chars 9-16 — just
    * as oracle-reproducible with substr/strpos arithmetic). Two unsigned
    * 32-bit halves rather than one packed signed 64-bit long keep every
    * downstream value in [0, 2^32), so blocking keys, xor and bit_count
    * are plain positive arithmetic in ANY SQL engine — no sign-bit games
    * in the oracle. Same split(text, " ") empty-token semantics as
    * [[compute]]. */
  def compute64(s: UTF8String): Array[Long] = {
    val str = s.toString
    val n = str.length
    val votes = new Array[Int](64)
    def vote(tok: String): Unit = {
      val d = Md5Hash32.digestOf(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var b = 0
      while (b < 32) {
        if (((h1 >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        if (((h2 >> b) & 1L) == 1L) votes(32 + b) += 1 else votes(32 + b) -= 1
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
    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) lo |= (1L << b)
      if (votes(32 + b) > 0) hi |= (1L << b)
      b += 1
    }
    Array(lo, hi)
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

/** simhash_text64(normalizedText): 64-bit whole-doc portable SimHash as
  * array<bigint> [lo32, hi32] — the scale variant whose 4 x 16-bit
  * blocking keyspace (262,144 buckets) grows with signature entropy,
  * unlike the 32-bit form's hard 1,024-bucket ceiling. Registered via
  * GraftExtensions. */
case class SimhashText64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_text64 expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    new GenericArrayData(SimhashText.compute64(s.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.SimhashText.compute64($s));""".stripMargin)

  override def prettyName: String = "simhash_text64"

  override protected def withNewChildInternal(newChild: Expression): SimhashText64Expr =
    copy(child = newChild)
}
