package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** MULTIPOLYGON WKT parse as ONE compact expression node. The first
  * implementation unrolled this declaratively (split/transform/
  * aggregate HOFs) inside [[GisFunctions.stGeomFromText]]'s when-chain
  * — correct, but the per-part closure/orientation algebra duplicated
  * subtrees ~100x and every stGeomFromText CALL SITE paid seconds of
  * analysis/codegen even for plain POINTs (the GIS spec suite went
  * 10 s → 9 min). As a CodegenFallback node the branch costs one
  * reference in the plan, whole-stage codegen continues around it, and
  * the boxed eval runs only on actual MULTIPOLYGON strings.
  *
  * Semantics match the declarative version: parts split on the
  * `)), ((` separator; stray parens inside a part (HOLES) refuse; each
  * ring's closure is decided from BOTH coordinates, rings normalize to
  * CCW, and the result is the NaN-separated CLOSED-ring multi form
  * ([[ConvexClip.multiRow]]'s layout). Z/M forms and malformed
  * coordinates refuse loudly. */
object WktMultiParse {
  private def fail(wkt: String): Nothing =
    throw new IllegalArgumentException(
      "st_geomfromtext: MULTIPOLYGON must be 2-D single-ring parts " +
        s"(no holes) with numeric coordinates, got: $wkt")

  private val Outer =
    "(?is)^\\s*MULTIPOLYGON\\s*\\(\\s*\\(\\s*\\(\\s*(.*)\\s*\\)\\s*\\)\\s*\\)\\s*$".r
  private val PartSep = "\\)\\s*\\)\\s*,\\s*\\(\\s*\\(".r

  def parse(wkt: String): Seq[(Array[Double], Array[Double])] = {
    if (wkt.matches("(?is)^\\s*MULTIPOLYGON\\s+(ZM|Z|M)\\s*\\(.*")) fail(wkt)
    val body = Outer.findFirstMatchIn(wkt).map(_.group(1)).getOrElse(fail(wkt))
    val parts = PartSep.split(body)
    if (parts.isEmpty) fail(wkt)
    parts.toSeq.map { part =>
      if (part.exists(c => c == '(' || c == ')')) fail(wkt) // holes/nesting
      val coords = part.split(",").map(_.trim.split("\\s+"))
      if (coords.isEmpty || coords.exists(_.length != 2)) fail(wkt)
      var xs = new Array[Double](coords.length)
      var ys = new Array[Double](coords.length)
      var i = 0
      while (i < coords.length) {
        try {
          xs(i) = coords(i)(0).toDouble
          ys(i) = coords(i)(1).toDouble
        } catch { case _: NumberFormatException => fail(wkt) }
        i += 1
      }
      // closure decided from BOTH coordinates; rings stored CLOSED
      val closed = xs.length > 1 && xs.head == xs.last && ys.head == ys.last
      if (!closed) { xs = xs :+ xs.head; ys = ys :+ ys.head }
      // a polygon ring needs >= 3 DISTINCT vertices — the same honesty
      // bound StUnionAgg.partsOf enforces; without it a degenerate
      // part like ((1 1, 2 2)) closes to a zero-area "ring" and flows
      // into area/envelope/predicates as a silent zero
      val distinct = xs.dropRight(1).zip(ys.dropRight(1)).distinct.length
      if (distinct < 3) fail(wkt)
      // normalize CCW: the multi form's shoelace sums SIGNED terms
      // across rings — a CW part would cancel a CCW one
      if (ConvexClip.signedArea2(xs.dropRight(1), ys.dropRight(1)) < 0)
        (xs.reverse, ys.reverse)
      else (xs, ys)
    }
  }

  def row(wkt: String): InternalRow = {
    val parts = parse(wkt)
    val xs = Array.newBuilder[Double]
    val ys = Array.newBuilder[Double]
    parts.foreach { case (rx, ry) =>
      xs ++= rx; xs += Double.NaN
      ys ++= ry; ys += Double.NaN
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString("MULTIPOLYGON"),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          xs.result().map(x => x: Any)),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ys.result().map(y => y: Any))))
  }
}

/** See [[WktMultiParse]]. */
case class WktMultiParseExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wkt_multi_parse expects a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("gtype", StringType, nullable = false),
    StructField("xs", ArrayType(DoubleType, containsNull = true),
      nullable = true),
    StructField("ys", ArrayType(DoubleType, containsNull = true),
      nullable = true)))

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(wkt: Any): Any =
    WktMultiParse.row(wkt.toString)

  override def prettyName: String = "wkt_multi_parse"

  override protected def withNewChildInternal(
      newChild: Expression): WktMultiParseExpr = copy(child = newChild)
}
