package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.graftbridge.Bridge

/**
 * P1 as a native Catalyst expression: locale-aware numeric cast with the
 * reference `_parse_number` semantics (app/pipeline/parser.py:247-281),
 * shared with the row engine via [[graft.core.Num]].
 *
 * Codegen emits a single static call (graft.core.Num has static forwarders),
 * so the expression stays inside whole-stage codegen — no UDF wrapping,
 * no encoder round-trip.
 */
case class ParseNumber(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    graft.core.Num.parseOrNull(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("parsed")
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = -1.0;
        if (!${c.isNull}) {
          java.lang.Double $boxed = graft.core.Num.parseOrNull(${c.value}.toString());
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseNumber =
    copy(child = newChild)
}

/** Column-level function surface of the engine. */
object functions {
  /** parse_number(col): double — null on unparsable, Python-float semantics. */
  def parse_number(c: Column): Column =
    Bridge.column(ParseNumber(Bridge.expression(c)))
}
