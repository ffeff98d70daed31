package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, MapType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Drill's `get_map_schema(m)` (reference contrib/udfs/
  * ComplexSchemaFunctions.java): field name -> type name for a map
  * (Drill's map = Spark's struct). The schema is static per column, so
  * the result is computed once at planning from the child's data type —
  * the eval just returns the prebuilt literal map (null in, null out,
  * like the reference's NULL_IF_NULL). */
case class GetMapSchemaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"get_map_schema expects a map/struct argument, got ${t.simpleString}")
  }

  override def dataType: DataType = MapType(StringType, StringType, false)

  @transient private lazy val result: ArrayBasedMapData = {
    val fields = child.dataType.asInstanceOf[StructType].fields
    new ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        fields.map(f => UTF8String.fromString(f.name)).toArray[Any]),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        fields.map(f => UTF8String.fromString(f.dataType.sql)).toArray[Any]))
  }

  def schemaMap(): ArrayBasedMapData = result

  override def nullSafeEval(v: Any): Any = result

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("schemaMap", this,
      classOf[GetMapSchemaExpr].getName)
    nullSafeCodeGen(ctx, ev, _ => s"${ev.value} = $ref.schemaMap();")
  }

  override def prettyName: String = "get_map_schema"

  override protected def withNewChildInternal(newChild: Expression): GetMapSchemaExpr =
    copy(child = newChild)
}

/** Drill's `md2(x)` (reference contrib/udfs/CryptoFunctions.java binds
  * commons-codec DigestUtils; md5/sha1/sha2 are Spark built-ins and md2
  * is the one digest Spark lacks). */
case class Md2Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md2 expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(org.apache.commons.codec.digest.DigestUtils.md2Hex(
      v.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"org.apache.commons.codec.digest.DigestUtils.md2Hex($c.getBytes()));")

  override def prettyName: String = "md2"

  override protected def withNewChildInternal(newChild: Expression): Md2Expr =
    copy(child = newChild)
}
