package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object Md5Hash32 {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Full md5 digest (16 bytes) — for kernels that parse more than the
    * first 4 bytes (SimhashText.compute64 reads bytes 0-7) with ONE
    * digest computation. */
  def digestOf(bytes: Array[Byte]): Array[Byte] = {
    val d = digest.get()
    d.reset()
    d.digest(bytes)
  }

  /** Unsigned value of the first 4 md5 bytes == the positional parse of
    * the first 8 hex chars — the engine-portable hash any SQL oracle can
    * reproduce with md5()+substr()+strpos(). */
  def compute(bytes: Array[Byte]): Long = {
    val h = digestOf(bytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }
}

/** Native form of the portable 32-bit md5 hash (one digest per value).
  * The built-in-only formulation (md5 -> hex string -> 8 x substr/strpos
  * arithmetic, Dedup.md5Hash32) recomputes the digest per extracted
  * nibble; this kernel is the identical function at one digest per call,
  * usable inside higher-order lambdas via `call_function("md5_hash32", _)`.
  */
case class Md5Hash32Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_hash32 expects string or binary, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val bytes = child.dataType match {
      case StringType => v.asInstanceOf[UTF8String].getBytes
      case _ => v.asInstanceOf[Array[Byte]]
    }
    Md5Hash32.compute(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toBytes = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case _ => (c: String) => c
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Hash32.compute(${toBytes(c)});")
  }

  override def prettyName: String = "md5_hash32"

  override protected def withNewChildInternal(newChild: Expression): Md5Hash32Expr =
    copy(child = newChild)
}
