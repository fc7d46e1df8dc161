package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x moved `Column` to the connect-agnostic sql-api module (backed
  * by a `ColumnNode`, not an `Expression`), so a library shipping native
  * codegen expressions needs the `private[sql]` conversion helpers in
  * `org.apache.spark.sql.classic.ExpressionUtils`. This one-file shim lives
  * under `org.apache.spark.sql` purely to satisfy that access qualifier —
  * the standard extension-library pattern; everything it touches is Apache
  * Spark public source.
  */
object ColumnBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a (classic) Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
