package graft.model

/**
 * Core data model for the extraction engine.
 *
 * [[Item]] mirrors the reference's flat item dict
 * (app/pipeline/invoice_parser.py:219-230 and siblings): all parsers emit
 * this shape; absent keys in the reference become "" / None here.
 */
final case class Item(
    name: String,
    article: String,
    qty: Option[Double],
    unit: String,
    price: Option[Double],
    currency: String,
    total: Option[Double],
    supplier: String,
    source: String,
    confidence: Double)

object Item {
  def base(name: String, qty: Option[Double], unit: String, price: Option[Double],
           currency: String, total: Option[Double], source: String, confidence: Double): Item =
    Item(name, "", qty, unit, price, currency, total, "", source, confidence)
}

/** One row of the transcripts input table (BASELINE.json input_hint). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp)

/** Per-parser outcome: items, or an error (mirrors the reference's
  * try/except around each parser in universal_parser.py:125-217). */
final case class ParserResult(parser: String, items: Seq[Item], error: Boolean) {
  def count: Int = if (error) 0 else items.length
  /** sum(item['total']) — throws in the reference when a total is None;
    * that propagation is modeled by [[error]] upstream. */
  def totalCost: Double = if (error) 0.0 else items.map(_.total.getOrElse(0.0)).sum
  def avgConfidence: Double =
    if (error || items.isEmpty) 0.0 else items.map(_.confidence).sum / items.length
}

final case class ParserStat(parser: String, count: Int, total_cost: Double, avg_confidence: Double)

/** Per-turn extraction result (the engine's main output row). */
final case class TurnResult(
    conv_id: String,
    turn_idx: Int,
    n_chars: Int,
    n_lines: Int,
    n_tables: Int,
    has_text: Boolean,
    needs_fallback: Boolean,
    doc_type: String,
    invoice_score: Double,
    commercial_score: Double,
    competitive_score: Double,
    contract_score: Double,
    text_quality: Double,
    table_quality: Double,
    overall_quality: Double,
    best_parser: String,
    best_count: Int,
    best_total_cost: Double,
    best_avg_confidence: Double,
    supplier_id: String,
    parser_stats: Seq[ParserStat],
    best_items: Seq[Item],
    extracted_text: String,
    blocks: Seq[String],
    recommendations: Seq[String],
    // A7 grand totals across ALL non-error parsers (universal_parser.py:
    // 277-281): computed there into locals and then shadowed by the best-
    // parser fields — materialized here as first-class envelope columns.
    grand_total_count: Int,
    grand_total_cost: Double,
    grand_avg_confidence: Double)
