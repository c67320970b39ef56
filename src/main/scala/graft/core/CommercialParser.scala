package graft.core

import graft.core.Py.PyStringOps

import graft.model.Item
import graft.rules.Rules
import ParserCommon._

/**
 * Commercial-proposal parser — semantics of the reference
 * CommercialProposalParser (app/pipeline/commercial_parser.py).
 */
object CommercialParser {

  def parse(text: String, tables: Seq[Tab]): Seq[Item] =
    parse(new SharedLines(text), tables)

  def parse(shared: SharedLines, tables: Seq[Tab]): Seq[Item] = {
    val items = tables.zipWithIndex.flatMap { case (t, i) => parseTable(t, i) } ++
      (if (shared.text != null && shared.text.nonEmpty) parseText(shared) else Nil)
    dedup(items).filter(validate)
  }

  // commercial_parser.py:96-128
  private[core] def identifyColumns(table: Tab): Option[Map[String, Int]] = {
    if (table.nCols >= 11) return Some(byPosition(table.nCols)) // forced positional for wide tables
    var mapping = mapBySynonyms(table, Rules.commercialHeaderPatterns, clean = true).toMap
    if (mapping.isEmpty) mapping = byPosition(table.nCols)
    if (mapping.contains("name") && mapping.size >= 2) Some(mapping) else None
  }

  // commercial_parser.py:130-157
  private def byPosition(n: Int): Map[String, Int] =
    if (n >= 11) Map("number" -> 0, "name" -> 1, "qty" -> 5, "unit" -> 6, "price" -> 8, "total" -> 10)
    else if (n >= 6) Map("number" -> 0, "name" -> 1, "qty" -> 2, "unit" -> 3, "price" -> 4, "total" -> 5)
    else if (n >= 4) Map("name" -> 0, "qty" -> 1, "price" -> 2, "total" -> 3)
    else Map.empty

  private def parseTable(table: Tab, tableIdx: Int): Seq[Item] =
    try {
      identifyColumns(table) match {
        case Some(m) => parseWithMapping(table, m, tableIdx)
        case None => parseByContent(table, tableIdx)
      }
    } catch { case _: Exception => Nil }

  private def parseWithMapping(table: Tab, m: Map[String, Int], tableIdx: Int): Seq[Item] = {
    val out = Seq.newBuilder[Item]
    var rowIdx = 0
    while (rowIdx < table.rows.length) {
      val row = table.rows(rowIdx)
      val parsed: Option[Item] = try {
        val firstCell = if (row.nonEmpty) Py.pyStr(row(0)) else ""
        if (Py.containsAny(Py.lower(firstCell), Rules.headerFirstCellCommercial)) None
        else {
          var name = if (m.contains("name")) ilocStr(row, m("name")) else ""
          val qty = if (m.contains("qty")) Num.parse(iloc(row, m("qty")).orNull) else Some(1.0)
          val unit = if (m.contains("unit")) ilocStr(row, m("unit")) else ""
          val price = if (m.contains("price")) Num.parse(iloc(row, m("price")).orNull) else Some(0.0)
          val total0 = if (m.contains("total")) Num.parse(iloc(row, m("total")).orNull) else None
          if (isEmptyName(name)) None
          else if (isServiceRow(name, Rules.serviceRowShort)) None
          else {
            name = cleanName(name)
            val total = backfillIfNone(total0, qty, price)
            val it = Item.base(name, qty, unit.pyStrip, price, "RUB", total,
              s"table_${tableIdx}_row_$rowIdx", 0.95)
            if (validate(it)) Some(it) else None
          }
        }
      } catch { case _: Exception => None }
      parsed.foreach(out += _)
      rowIdx += 1
    }
    out.result()
  }

  // commercial_parser.py:215-325
  private def parseByContent(table: Tab, tableIdx: Int): Seq[Item] = {
    val out = Seq.newBuilder[Item]
    var rowIdx = 1
    while (rowIdx < table.rows.length) {
      val values = table.rowVals(rowIdx)
      if (values.length >= 4)
        (try parseRowValues(values, tableIdx, rowIdx) catch { case _: Exception => None })
          .foreach(out += _)
      rowIdx += 1
    }
    out.result()
  }

  private def parseRowValues(values: IndexedSeq[String], tableIdx: Int, rowIdx: Int): Option[Item] = {
    if (values.length < 4) return None
    if (!Patterns.matchAt(Patterns.digitsOnly, values(0))) return None
    var name = if (values.length > 1) values(1) else ""
    if (name.isEmpty || isServiceRow(name, Rules.serviceRowShort)) return None
    // qty: first parsable digit-bearing cell in [2, min(5,n))
    var qty: Option[Double] = None
    var qtyIdx = -1
    var i = 2
    while (qty.isEmpty && i < math.min(5, values.length)) {
      if (values(i).nonEmpty && Patterns.search(Patterns.hasDigit, values(i))) {
        val q = Num.parse(values(i))
        if (q.isDefined) { qty = q; qtyIdx = i }
      }
      i += 1
    }
    if (qty.isEmpty) return None
    val unit = if (qtyIdx + 1 < values.length) values(qtyIdx + 1) else ""
    // price: first parsable in [qtyIdx+2, min(qtyIdx+4, n))
    var price: Option[Double] = None
    i = qtyIdx + 2
    while (price.isEmpty && i < math.min(qtyIdx + 4, values.length)) {
      if (i < values.length && values(i).nonEmpty && Patterns.search(Patterns.hasDigit, values(i))) {
        price = Num.parse(values(i))
      }
      i += 1
    }
    if (price.isEmpty) return None
    // total: scan last two cells; keep scanning while equal to price/qty
    var total: Option[Double] = None
    i = values.length - 2
    var done = false
    while (i < values.length && !done) {
      if (i >= 0 && values(i).nonEmpty && Patterns.search(Patterns.hasDigit, values(i))) {
        total = Num.parse(values(i)) // unconditional assignment, like the reference
        if (total.isDefined && total != price && total != qty) done = true
      }
      i += 1
    }
    name = cleanName(name)
    val totalF = if (truthy(total)) total else Some(qty.get * price.get)
    val it = Item.base(name, qty, unit.pyStrip, price, "RUB", totalF,
      s"table_${tableIdx}_row_$rowIdx", 0.8)
    if (validate(it)) Some(it) else None
  }

  // -- text path (commercial_parser.py:327-393) --
  private def parseText(shared: SharedLines): Seq[Item] = {
    val out = Seq.newBuilder[Item]
    var lineIdx = 0
    while (lineIdx < shared.stripped.length) {
      val line = shared.stripped(lineIdx)
      if (shared.hasDigit(lineIdx) &&
          passesStrictLinePrefilter(line, shared.lower(lineIdx), Rules.headerLineCommercial, Rules.serviceLineCommercial))
        parseLine(line).foreach(it =>
          out += it.copy(source = s"text_line_$lineIdx", confidence = 0.7))
      lineIdx += 1
    }
    out.result()
  }

  private def parseLine(line: String): Option[Item] = {
    // explicit first-match-wins loop: the iterator.flatMap chain
    // allocated ~5 wrapper objects per call on the per-line hot path
    val __ps = Patterns.commercialPatterns
    var __pi = 0
    while (__pi < __ps.length) {
      val p = __ps(__pi)
      val __r: Option[Item] = {
      val m = Patterns.cachedMatcher(p, line)
      if (!m.find()) None
      else try {
        var name = m.group("name").pyStrip
        val qty = Num.parse(m.group("qty"))
        val unit = Option(m.group("unit")).getOrElse("")
        val price = Num.parse(m.group("price"))
        val total0 = Num.parse(m.group("total"))
        name = cleanName(name)
        val total = backfillFalsy(total0, qty, price)
        val it = Item.base(name, qty, unit, price, "RUB", total, "regex_match", 0.85)
        if (validate(it)) Some(it) else None
      } catch { case _: Exception => None }
      }
      if (__r.isDefined) return __r
      __pi += 1
    }
    None
  }

  /** commercial _clean_name also strips the leading tech-spec prefix
    * (commercial_parser.py:395-405). */
  def cleanName(name: String): String = {
    val n = Py.cleanName(name)
    Patterns.cachedMatcher(Patterns.commercialTechPrefix, n).replaceFirst("")
  }

  def validate(it: Item): Boolean =
    validateStrict(it, Rules.validationServiceWordsCommercial)
}
