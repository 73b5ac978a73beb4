package org.apache.spark.sql

import org.apache.spark.sql.connector.expressions.{Expressions, LiteralValue, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.types.DataType

/** Test-only factory for V2 runtime-filter predicates: [[LiteralValue]] is
  * `private[sql]` in the Scala signature, so specs (package graft) build
  * the DPP-shaped `IN` predicate through this bridge. */
object GraftTestV2 {
  def inPredicate(col: String, dt: DataType, values: Any*): Predicate =
    new Predicate("IN",
      (Expressions.column(col) +: values.map(v => LiteralValue(v, dt): V2Expression)).toArray)

  def opaquePredicate(name: String): Predicate =
    new Predicate(name, Array.empty[V2Expression])
}
