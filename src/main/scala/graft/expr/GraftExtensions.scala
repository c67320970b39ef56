package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point: registers the engine's SQL surface
 * (`parse_number`, `minhash_sig`, `simhash_blocks`) so
 * `spark.sql("SELECT parse_number(c) ...")` works cluster-wide via
 * `--conf spark.sql.extensions=graft.expr.GraftExtensions`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("parse_number"),
      new ExpressionInfo(classOf[ParseNumber].getName, "parse_number"),
      (children: Seq[Expression]) => ParseNumber(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(children.head,
        children(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("simhash_blocks"),
      new ExpressionInfo(classOf[SimHashBlocksExpr].getName, "simhash_blocks"),
      (children: Seq[Expression]) => SimHashBlocksExpr(children.head)))
  }
}
