package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** `st_union_multi(array<geometry>)` — the reference's
  * ST_UnionAggregate (contrib/udfs gis/STUnionAggregate.java, an Esri
  * ListeningGeometryCursor union there) narrowed to the slice the
  * hand-rolled core can answer EXACTLY: the union of pairwise-DISJOINT
  * polygons, which is just their MULTIPOLYGON. Spell the aggregate as
  * `st_union_multi(collect_list(geom))` (the Scala API wraps exactly
  * that — [[GisFunctions.stUnionAgg]]).
  *
  * Semantics:
  *  - inputs: POLYGON rows and MULTIPOLYGON rows (parts flatten in);
  *    null elements are EMPTY geometries and skip (union identity);
  *    an all-null/empty group returns NULL;
  *  - parts normalize to open CCW rings and sort canonically, so the
  *    result is deterministic regardless of aggregation order — an
  *    AGGREGATE whose value depended on collect_list order would be
  *    silently nondeterministic under shuffles;
  *  - ONE surviving part returns a plain POLYGON; several return the
  *    NaN-separated MULTIPOLYGON form (st_area sums parts, renderers
  *    emit real multi text);
  *  - any TOUCHING or OVERLAPPING pair refuses LOUDLY: merging
  *    boundaries is true geometry algebra (the binary st_union's
  *    convex walk handles exactly two) — a silently-wrong multi with
  *    interleaved parts is the one thing this file must never emit.
  *    Disjointness is verified by a plane SWEEP over the parts' bbox
  *    x-intervals (sort by xmin, prune the active set by xmax, exact
  *    DE-9IM only on bbox-meeting candidates) — near-linear for the
  *    spread layouts disjoint unions actually have; the exact-check
  *    count is still bounded ([[MaxRelates]]) against adversarial
  *    all-overlapping-bbox layouts, and parts are bounded at
  *    [[MaxParts]] per group, both with loud refusals (a group past
  *    either bound wants a spatial index, not an aggregate).
  *
  *  POINT/LINESTRING inputs refuse (the reference unions geometries of
  *  one dimension per call in practice; a mixed-dimension union result
  *  is not representable in the struct).
  */
object StUnionAgg {

  val MaxParts = 65536
  /** Bound on EXACT disjointness checks (bbox-meeting candidate pairs):
    * valid inputs with heavily interlocking bboxes (diagonal strips)
    * are still quadratic in candidates — refuse loudly past this
    * rather than hang the task. */
  val MaxRelates = 1 << 20

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"st_union_multi: $msg")

  /** Decompose one geometry row into OPEN CCW rings. */
  private def partsOf(row: InternalRow): Seq[(Array[Double], Array[Double])] = {
    val t = row.getUTF8String(0).toString
    val xsA = row.getArray(1); val ysA = row.getArray(2)
    val xs = Array.tabulate(xsA.numElements())(xsA.getDouble)
    val ys = Array.tabulate(ysA.numElements())(ysA.getDouble)
    def normalized(rx0: Array[Double], ry0: Array[Double])
        : (Array[Double], Array[Double]) = {
      var rx = rx0; var ry = ry0
      if (rx.length > 1 && rx.head == rx.last && ry.head == ry.last) {
        rx = rx.dropRight(1); ry = ry.dropRight(1)
      }
      if (rx.length < 3) fail("a ring has fewer than 3 distinct vertices")
      if (ConvexClip.signedArea2(rx, ry) < 0) (rx.reverse, ry.reverse)
      else (rx, ry)
    }
    t match {
      case "POLYGON" => Seq(normalized(xs, ys))
      case "MULTIPOLYGON" =>
        // NaN-separated closed rings (ConvexClip.multiRow layout)
        val out = Seq.newBuilder[(Array[Double], Array[Double])]
        var start = 0
        var i = 0
        while (i < xs.length) {
          if (xs(i).isNaN) {
            if (i > start) out += normalized(
              xs.slice(start, i), ys.slice(start, i))
            start = i + 1
          }
          i += 1
        }
        if (start < xs.length) out += normalized(
          xs.slice(start, xs.length), ys.slice(start, ys.length))
        out.result()
      case other => fail(s"inputs must be POLYGON/MULTIPOLYGON, got $other " +
        "(a mixed-dimension union is not representable)")
    }
  }

  private def polyRow(p: (Array[Double], Array[Double])): InternalRow =
    ConvexClip.geomRow(p._1, p._2)

  def unionAll(arr: org.apache.spark.sql.catalyst.util.ArrayData,
               elemType: StructType): InternalRow = {
    val n = arr.numElements()
    val parts = Seq.newBuilder[(Array[Double], Array[Double])]
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        parts ++= partsOf(arr.getStruct(i, elemType.fields.length))
      i += 1
    }
    // canonical sort must be a TOTAL order over distinct rings or tied
    // parts keep collect_list's nondeterministic shuffle order: after
    // (min x, min y), fall back to full lexicographic coordinate
    // comparison (distinct disjoint rings always differ somewhere)
    val coordOrd = Ordering.Implicits.seqOrdering[Seq, Double]
    val ps = parts.result().sortBy(p =>
      (p._1.min, p._2.min, p._1.toSeq, p._2.toSeq))(
      Ordering.Tuple4(Ordering.Double.TotalOrdering,
        Ordering.Double.TotalOrdering, coordOrd, coordOrd))
    if (ps.isEmpty) return null
    if (ps.length > MaxParts) fail(
      s"${ps.length} parts exceed the $MaxParts-part bound — a group " +
        "this large wants a spatial index, not an aggregate")
    // disjointness by x-interval SWEEP: sort bboxes by xmin, keep an
    // active set pruned by xmax, exact DE-9IM only on candidates whose
    // bboxes meet in BOTH axes. Rows built lazily per part (only
    // candidate pairs pay the boxing).
    val boxes = ps.map(p => (p._1.min, p._1.max, p._2.min, p._2.max))
    val rows = new Array[InternalRow](ps.length)
    def rowOf(i: Int): InternalRow = {
      if (rows(i) == null) rows(i) = polyRow(ps(i))
      rows(i)
    }
    val order = boxes.indices.sortBy(i => boxes(i)._1)
    val active = scala.collection.mutable.ArrayBuffer[Int]()
    var relates = 0
    order.foreach { i =>
      val (x1, _, y1, y2) = boxes(i)
      // prune: actives whose x-extent ended strictly before this xmin
      var k = 0
      while (k < active.length) {
        if (boxes(active(k))._2 < x1) { active.remove(k) } else k += 1
      }
      active.foreach { j =>
        val (_, _, by1, by2) = boxes(j)
        if (y1 <= by2 && by1 <= y2) { // bboxes meet in both axes
          relates += 1
          if (relates > MaxRelates) fail(
            s"more than $MaxRelates bbox-meeting part pairs — the " +
              "layout is too interlocked for the aggregate's " +
              "disjointness sweep; use a spatial index")
          if (!GisPredicates.relateMatch(rowOf(i), rowOf(j), "FF*FF****"))
            fail("two input polygons touch or overlap — merging " +
              "boundaries is true geometry algebra (use the binary " +
              "st_union for a convex pair); refusing rather than " +
              "emitting a wrong multi-part ring")
        }
      }
      active += i
    }
    if (ps.length == 1) polyRow(ps.head)
    else ConvexClip.multiRow(ps)
  }
}

/** `st_union_multi(array<geometry>)` — see [[StUnionAgg]]. */
case class StUnionMultiExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private def elemStruct: Option[StructType] = child.dataType match {
    case ArrayType(s: StructType, _) if GisPredicates.isGeomType(s) => Some(s)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemStruct.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "st_union_multi expects array<geometry struct> (spell the " +
        "aggregate as st_union_multi(collect_list(geom))), got " +
        child.dataType.simpleString)

  override def dataType: DataType = child.dataType match {
    case ArrayType(s: StructType, _) => StructType(s.fields.take(3))
    case other => other
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(arr: Any): Any =
    StUnionAgg.unionAll(
      arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      elemStruct.get)

  override def prettyName: String = "st_union_multi"

  override protected def withNewChildInternal(
      newChild: Expression): StUnionMultiExpr = copy(child = newChild)
}
