package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression,
  Expression,
  TernaryExpression
}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the geo key-derivation functions the
  * reference computes per record (SURVEY §2.2 P6-P8, §2.8 F7-F10). These
  * participate in whole-stage codegen (each `doGenCode` emits a direct
  * static call into [[GeoCodecs]]), unlike a Scala UDF which would break
  * the codegen span and box every row.
  */

/** `quadkey(lat: double, lon: double, zoom: int) -> string` */
case class QuadKeyExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quadkey"

  override protected def nullSafeEval(lat: Any, lon: Any, zoom: Any): Any =
    GeoCodecs.quadKey(lat.asInstanceOf[Double], lon.asInstanceOf[Double], zoom.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, lon, z) => s"graft.functions.GeoCodecs.quadKey($lat, $lon, $z)")

  override protected def withNewChildrenInternal(
      f: Expression,
      s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** `geohash_encode(lat: double, lon: double, precision: int) -> string` */
case class GeohashEncodeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geohash_encode"

  override protected def nullSafeEval(lat: Any, lon: Any, p: Any): Any =
    GeoCodecs.geohashEncode(
      lat.asInstanceOf[Double],
      lon.asInstanceOf[Double],
      p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (lat, lon, p) => s"graft.functions.GeoCodecs.geohashEncode($lat, $lon, $p)")

  override protected def withNewChildrenInternal(
      f: Expression,
      s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** `geohash_lat(gh: string) -> double` / `geohash_lon(gh: string) -> double`
  * (cell-center decode, the reference's GeoHash.decodeHash at
  * ingestion/IngestStream.java:313).
  */
case class GeohashLatExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geohash_lat"
  override protected def nullSafeEval(gh: Any): Any =
    GeoCodecs.geohashLat(gh.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, gh => s"graft.functions.GeoCodecs.geohashLat($gh)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class GeohashLonExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geohash_lon"
  override protected def nullSafeEval(gh: Any): Any =
    GeoCodecs.geohashLon(gh.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, gh => s"graft.functions.GeoCodecs.geohashLon($gh)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `geohash_to_quadkey(gh: string, zoom: int) -> string` — the fused
  * per-record re-indexing step (decode + tile + quadkey in one call,
  * no intermediate lat/lon columns).
  */
case class GeohashToQuadKeyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geohash_to_quadkey"
  override protected def nullSafeEval(gh: Any, zoom: Any): Any =
    GeoCodecs.geohashToQuadKey(gh.asInstanceOf[UTF8String], zoom.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (gh, z) => s"graft.functions.GeoCodecs.geohashToQuadKey($gh, $z)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
