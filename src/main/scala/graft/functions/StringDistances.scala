package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Drill's string-distance UDF pack (reference contrib/udfs/.../
  * StringDistanceFunctions.java: cosine_distance, fuzzy_score,
  * hamming_distance, jaccard_distance, jaro_distance,
  * levenshtein_distance, longest_common_substring_distance), each a
  * thin binding of an apache commons-text similarity class.
  *
  * Same here — commons-text ships on Spark's own classpath, so one
  * native expression dispatches to the IDENTICAL algorithms (word-vector
  * cosine, character-set Jaccard, Jaro-Winkler distance = 1 - jw
  * similarity, LCS-subsequence distance |a|+|b|-2*lcs) through a static
  * call that stays inside whole-stage codegen. levenshtein_distance is
  * Spark's built-in `levenshtein` and is not re-registered.
  */
object StringDistances {
  // commons-text similarity classes are stateless (FuzzyScore holds only
  // its locale) — one shared instance per algorithm.
  private val cosine = new org.apache.commons.text.similarity.CosineDistance()
  private val fuzzy =
    new org.apache.commons.text.similarity.FuzzyScore(java.util.Locale.ENGLISH)
  private val hamming = new org.apache.commons.text.similarity.HammingDistance()
  private val jaccard = new org.apache.commons.text.similarity.JaccardDistance()
  private val jaro = new org.apache.commons.text.similarity.JaroWinklerDistance()
  private val lcs =
    new org.apache.commons.text.similarity.LongestCommonSubsequenceDistance()

  def dist(algo: Int, a: UTF8String, b: UTF8String): Double = {
    val x = a.toString
    val y = b.toString
    algo match {
      case 0 => cosine.apply(x, y)
      case 1 => fuzzy.fuzzyScore(x, y).toDouble
      case 2 => hamming.apply(x, y).toDouble // throws on unequal lengths, like Drill
      case 3 => jaccard.apply(x, y)
      case 4 => jaro.apply(x, y)
      case 5 => lcs.apply(x, y).toDouble
      case other =>
        throw new IllegalArgumentException(s"unknown distance algo id $other")
    }
  }

  val AlgoIds: Map[String, Int] = Map(
    "cosine_distance" -> 0, "fuzzy_score" -> 1, "hamming_distance" -> 2,
    "jaccard_distance" -> 3, "jaro_distance" -> 4,
    "longest_common_substring_distance" -> 5)
}

/** `<algo>(a, b)` for the Drill string-distance names; registered
  * per-algorithm via GraftExtensions. NULL_IF_NULL like the reference. */
case class StringDistanceExpr(left: Expression, right: Expression,
                              algo: String) extends BinaryExpression {

  private val algoId: Int = StringDistances.AlgoIds.getOrElse(algo,
    throw new IllegalArgumentException(
      s"unknown string distance '$algo' " +
        s"(have ${StringDistances.AlgoIds.keys.mkString(", ")})"))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$algo expects two string arguments, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistances.dist(algoId,
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringDistances.dist($algoId, $a, $b);")

  override def prettyName: String = algo

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringDistanceExpr =
    copy(left = newLeft, right = newRight)
}
