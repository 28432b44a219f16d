package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-build-time registration of the engine's SQL surface:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ... // or .withExtensions(new GraftExtensions)
  * }}}
  *
  * Existing sessions use `GraftFunctions.register(spark)` instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.GraftFunctions.injectInto(ext)
    functions.GraftTableFunctions.injectInto(ext)
  }
}
