package graft.functions

import org.apache.commons.codec.language._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Phonetic encoders, re-expressed from Drill's phonetic UDF pack
  * (reference contrib/udfs/.../PhoneticFunctions.java: soundex,
  * refined_soundex, metaphone, double_metaphone, nysiis, caverphone1/2,
  * cologne_phonetic, dm_soundex, match_rating_encoder).
  *
  * Drill binds each codec as a row-at-a-time UDF; here one native
  * expression dispatches to the same commons-codec algorithms (the jar is
  * part of Spark's own classpath) through a static per-algorithm call, so
  * the encode stays inside whole-stage codegen. Spark's built-in soundex
  * covers the plain variant; this adds the rest of the family.
  */
object Phonetics {
  // commons-codec encoders are thread-safe once constructed (config is
  // only mutable pre-use); one shared instance per algorithm.
  private val refined = new RefinedSoundex()
  private val meta = new Metaphone()
  private val dmeta = new DoubleMetaphone()
  private val nys = new Nysiis()
  private val cav1 = new Caverphone1()
  private val cav2 = new Caverphone2()
  private val cologne = new ColognePhonetic()
  private val dmSoundex = new DaitchMokotoffSoundex()
  private val matchRating = new MatchRatingApproachEncoder()

  def encode(algo: Int, s: UTF8String): UTF8String = {
    // refined_soundex: commons-codec's clean() keeps NON-ASCII letters
    // (Character.isLetter), then indexes a 26-entry mapping with
    // 'É'-'A' → ArrayIndexOutOfBounds — one accented name killed the
    // whole scan. Pre-strip to A-Z for that algo (documented divergence:
    // the reference crashes here too; null-per-row beats a dead query).
    val raw = s.toString
    val in = if (algo == 0) raw.filter(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) else raw
    val out = algo match {
      case 0 => refined.encode(in)
      case 1 => meta.metaphone(in)
      case 2 => dmeta.doubleMetaphone(in)
      case 3 => nys.encode(in)
      case 4 => cav1.encode(in)
      case 5 => cav2.encode(in)
      case 6 => cologne.encode(in)
      // soundex(), not encode(): encode() returns only the first
      // pronunciation branch, but the reference's dm_soundex returns ALL
      // Daitch-Mokotoff branches pipe-joined ('Auerbach' ->
      // '097400|097500')
      case 7 => dmSoundex.soundex(in)
      case 8 => matchRating.encode(in)
      case other => throw new IllegalArgumentException(s"unknown phonetic algo id $other")
    }
    UTF8String.fromString(if (out == null) "" else out)
  }

  val AlgoIds: Map[String, Int] = Map(
    "refined_soundex" -> 0, "metaphone" -> 1, "double_metaphone" -> 2,
    "nysiis" -> 3, "caverphone1" -> 4, "caverphone2" -> 5,
    "cologne_phonetic" -> 6, "dm_soundex" -> 7, "match_rating_encoder" -> 8)
}

/** `phonetic(algoName)` applied to a string column; registered per-algo
  * (metaphone(s), nysiis(s), ...) via GraftExtensions. */
case class PhoneticExpr(child: Expression, algo: String) extends UnaryExpression {

  private val algoId: Int = Phonetics.AlgoIds.getOrElse(algo,
    throw new IllegalArgumentException(
      s"unknown phonetic algorithm '$algo' (have ${Phonetics.AlgoIds.keys.mkString(", ")})"))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$algo expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    Phonetics.encode(algoId, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Phonetics.encode($algoId, $c);")

  override def prettyName: String = algo

  override protected def withNewChildInternal(newChild: Expression): PhoneticExpr =
    copy(child = newChild)
}
