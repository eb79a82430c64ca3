package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Standard extensions entry point: deployments enable the library's
  * SQL surface with
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`),
  * instead of calling `GeoFunctions.register` imperatively.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GeoFunctions.injectInto(ext)
}
