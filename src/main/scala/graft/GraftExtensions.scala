package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: makes every graft native SQL
  * function available in sessions the application does NOT construct —
  * notebooks, Thrift/Connect servers, `spark-submit` jobs — via
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * or programmatically `SparkSession.builder.withExtensions(new
  * GraftExtensions)`. Equivalent to calling
  * [[graft.functions.Registry.install]] on a live session (which remains
  * the path when you already hold the session — e.g. the driver-owned
  * gate sessions); the extension form is the deployment-grade hook that
  * survives session cloning and needs no imperative setup call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.Registry.injectInto(ext)
}
