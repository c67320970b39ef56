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
object GraftExtensions {
  /** minhash_sig SQL builder: numHashes must be a foldable integral
    * literal — INT and BIGINT literals both work (Number.intValue);
    * anything non-foldable or non-numeric fails here with a clear message
    * instead of a ClassCastException deep in plan building. */
  private[graft] def minhashSigBuilder(children: Seq[Expression]): MinHashSig = {
    val numHashes = children.lift(1) match {
      case Some(e) if e.foldable => e.eval() match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"minhash_sig: second argument must be an integer literal, got $other")
      }
      case Some(_) => throw new IllegalArgumentException(
        "minhash_sig: second argument (numHashes) must be a foldable literal")
      case None => throw new IllegalArgumentException(
        "minhash_sig(shingles, numHashes) takes exactly 2 arguments")
    }
    MinHashSig(children.head, numHashes)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("parse_number"),
      new ExpressionInfo(classOf[ParseNumber].getName, "parse_number"),
      (children: Seq[Expression]) => ParseNumber(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      GraftExtensions.minhashSigBuilder))
    ext.injectFunction((
      FunctionIdentifier("simhash_blocks"),
      new ExpressionInfo(classOf[SimHashBlocksExpr].getName, "simhash_blocks"),
      (children: Seq[Expression]) => SimHashBlocksExpr(children.head)))
  }
}
