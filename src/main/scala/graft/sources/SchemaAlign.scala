package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Align a file's rows to the driver's reference schema BY NAME — the
  * multi-file schema-on-read degrade the hand-rolled readers share: a
  * directory may mix files whose columns differ in order or set, and
  * positional binding would mis-assign values silently (or crash the
  * encoder on an arity change). Missing columns null-fill, extra
  * columns drop, and a name whose type differs from the reference
  * nulls out rather than lying. */
private[graft] object SchemaAlign {

  /** Index plan from `fileSchema` into `want`; None = identity.
    * Name matching is exact-first, then CASE-INSENSITIVE — Spark's own
    * resolution is case-insensitive by default, and a column spelled
    * `ID` in one file and `id` in another silently nulled out under an
    * exact-only lookup. */
  def plan(want: StructType, fileSchema: StructType): Option[Array[Option[Int]]] =
    if (fileSchema == want) None
    else Some(want.fields.map { f =>
      val exact = fileSchema.fieldNames.indexOf(f.name)
      val i = if (exact >= 0) exact
              else fileSchema.fieldNames.indexWhere(_.equalsIgnoreCase(f.name))
      i match {
        case -1 => None
        case j if fileSchema.fields(j).dataType == f.dataType => Some(j)
        case _ => None // same name, different type: null out
      }
    })

  def align(rows: Iterator[Row], p: Option[Array[Option[Int]]]): Iterator[Row] =
    p match {
      case None => rows
      case Some(idx) => rows.map(r =>
        Row.fromSeq(idx.toSeq.map(_.map(i => r.get(i)).orNull)))
    }
}
