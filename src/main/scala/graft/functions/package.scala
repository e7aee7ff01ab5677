package graft

import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Column-level entry points for graft's custom Catalyst expressions. */
package object functions {

  /** Cosine similarity of two `array<float>` columns — codegen'd native
    * expression (see [[CosineSim]]), not a UDF.
    */
  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
