package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

/** Public Column API + SQL registration for the geo functions
  * (SURVEY §2.8 F7-F12). Scalar per-record functions are native codegen
  * expressions; bbox covers are driver-side planning helpers that fold
  * into pushable predicates (SURVEY §3.3: the reference's 32^k point-get
  * enumeration becomes a prefix/IN predicate Catalyst can push down).
  */
object GeoFunctions {

  // Inputs are cast explicitly (the expressions skip ExpectsInputTypes —
  // `AbstractDataType` is private[sql] in Spark 4).
  private def d(c: Column) = Shim.expression(c.cast("double"))
  private def i(c: Column) = Shim.expression(c.cast("int"))
  private def s(c: Column) = Shim.expression(c.cast("string"))

  def quadkey(lat: Column, lon: Column, zoom: Column): Column =
    Shim.column(QuadKeyExpr(d(lat), d(lon), i(zoom)))

  def quadkey(lat: Column, lon: Column, zoom: Int): Column = quadkey(lat, lon, lit(zoom))

  def geohash_encode(lat: Column, lon: Column, precision: Column): Column =
    Shim.column(GeohashEncodeExpr(d(lat), d(lon), i(precision)))

  def geohash_encode(lat: Column, lon: Column, precision: Int): Column =
    geohash_encode(lat, lon, lit(precision))

  def geohash_lat(gh: Column): Column = Shim.column(GeohashLatExpr(s(gh)))

  def geohash_lon(gh: Column): Column = Shim.column(GeohashLonExpr(s(gh)))

  def geohash_to_quadkey(gh: Column, zoom: Column): Column =
    Shim.column(GeohashToQuadKeyExpr(s(gh), i(zoom)))

  def geohash_to_quadkey(gh: Column, zoom: Int): Column = geohash_to_quadkey(gh, lit(zoom))

  /** SQL function builders, shared by session-level registration and
    * `SparkSessionExtensions` injection.
    */
  val builders: Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}
    def cd(e: Expression) = Cast(e, DoubleType)
    def ci(e: Expression) = Cast(e, IntegerType)
    def cs(e: Expression) = Cast(e, StringType)
    Seq(
      "quadkey" -> ((es: Seq[Expression]) => QuadKeyExpr(cd(es(0)), cd(es(1)), ci(es(2)))),
      "geohash_encode" -> ((es: Seq[Expression]) =>
        GeohashEncodeExpr(cd(es(0)), cd(es(1)), ci(es(2)))),
      "geohash_lat" -> ((es: Seq[Expression]) => GeohashLatExpr(cs(es.head))),
      "geohash_lon" -> ((es: Seq[Expression]) => GeohashLonExpr(cs(es.head))),
      "geohash_to_quadkey" -> ((es: Seq[Expression]) =>
        GeohashToQuadKeyExpr(cs(es(0)), ci(es(1)))))
  }

  /** Register all geo functions for SQL (`SELECT quadkey(lat, lon, 14)`). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Shim.registerFunction(spark, name, b) }

  /** Inject into `SparkSessionExtensions` (see [[graft.GraftExtensions]]). */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) => ext.injectFunction(Shim.functionDescription(name, b)) }
}
