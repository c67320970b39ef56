package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point: registers the engine's SQL surface
 * (currently `parse_number`) so `spark.sql("SELECT parse_number(c) ...")`
 * works cluster-wide via
 * `--conf spark.sql.extensions=graft.expr.GraftExtensions`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("parse_number"),
      new ExpressionInfo(classOf[ParseNumber].getName, "parse_number"),
      (children: Seq[Expression]) => ParseNumber(children.head)))
  }
}
