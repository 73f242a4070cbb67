package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for building public `Column`s from custom Catalyst
  * expressions. Spark 4 moved Column construction behind
  * `private[sql] classic.ExpressionUtils`; this shim re-exports the two
  * conversions graft needs. Lives in the org.apache.spark.sql package
  * purely for access — contains no Spark-internal logic.
  */
object graftshim {
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Stable per-session UUID (`private[sql]` on classic.SparkSession):
    * the index caches key on it because identity hashes can be reused
    * after a session is GC'd.
    */
  def sessionUUID(s: classic.SparkSession): String = s.sessionUUID

  /** Drain the listener bus (`private[spark]`) so a test that just ran
    * a job can read its SparkListener-collected task metrics without
    * racing event delivery.
    */
  def drainListenerBus(s: classic.SparkSession): Unit =
    s.sparkContext.listenerBus.waitUntilEmpty()
}
