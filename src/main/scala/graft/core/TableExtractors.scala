package graft.core

import graft.core.Py.PyStringOps

import graft.model.Item
import graft.rules.Rules
import ParserCommon._
import scala.collection.mutable

/**
 * Table-only extractors — semantics of the reference TableExtractor
 * (app/pipeline/table_extractor.py) and PreciseTableParser
 * (app/pipeline/precise_table_parser.py). No text path, no dedup: items are
 * returned per-table in order, each gated by product plausibility (F8).
 */
object TableExtractor {

  private val elifFields: Seq[(String, Seq[String])] = Seq(
    "number" -> Seq("№", "номер", "позиция"),
    "article" -> Seq("артикул", "код", "арт"),
    "name" -> Seq("наименование", "товары", "работы", "услуги", "название"),
    "qty" -> Seq("количество", "кол-во", "колво"),
    "unit" -> Seq("ед", "единица", "изм"),
    "price" -> Seq("цена", "стоимость", "руб"),
    "total" -> Seq("сумма", "итого", "всего"))

  def parse(tables: Seq[Tab]): Seq[Item] =
    tables.zipWithIndex.flatMap { case (t, i) =>
      try extractFromTable(t, i) catch { case _: Exception => Nil }
    }

  private[core] def identifyColumns(table: Tab): Option[Map[String, Int]] = {
    var mapping = mapByElifChain(table.header, elifFields).toMap
    if (mapping.isEmpty) mapping = byPosition(table.nCols)
    if (mapping.contains("name") && (mapping.contains("qty") || mapping.contains("price")))
      Some(mapping)
    else None
  }

  // table_extractor.py:138-171
  private def byPosition(n: Int): Map[String, Int] =
    if (n >= 7) Map("number" -> 0, "name" -> 1, "qty" -> 2, "unit" -> 3, "price" -> 4, "total" -> 5)
    else if (n >= 6) Map("number" -> 0, "name" -> 1, "qty" -> 2, "unit" -> 3, "price" -> 4, "total" -> 5)
    else if (n >= 4) Map("name" -> 0, "qty" -> 1, "price" -> 2, "total" -> 3)
    else Map.empty

  private def extractFromTable(table: Tab, tableIdx: Int): Seq[Item] = {
    identifyColumns(table) match {
      case None => Nil
      case Some(m) =>
        val out = Seq.newBuilder[Item]
        var rowIdx = 0
        while (rowIdx < table.rows.length) {
          val row = table.rows(rowIdx)
          (try {
            val firstCell = if (row.nonEmpty) Py.pyStr(row(0)) else ""
            if (Py.containsAnyLowered(firstCell, Rules.headerFirstCellTable)) None
            else extractItemFromRow(row, m, tableIdx, rowIdx)
              .filter(validateProduct(_, Rules.excludeWordsTableExtractor))
          } catch { case _: Exception => None }).foreach(out += _)
          rowIdx += 1
        }
        out.result()
    }
  }

  // string-field state: 0 = unmapped/out-of-range -> "", 1 = mapped cell
  // was NaN -> null (table_extractor.py:196-197), 2 = value
  private def extractItemFromRow(row: IndexedSeq[Option[String]], m: Map[String, Int],
                                 tableIdx: Int, rowIdx: Int): Option[Item] = {
    try {
      var nameV: String = null
      var artState = 0; var artV: String = null
      var unitState = 0; var unitV: String = null
      var qty: Option[Double] = None
      var price: Option[Double] = None
      var total: Option[Double] = None
      m.foreach { case (field, colIdx) =>
        if (colIdx < row.length) {
          val cell = row(colIdx)
          field match {
            case "qty" => cell.foreach(v => qty = Num.parse(v))
            case "price" => cell.foreach(v => price = Num.parse(v))
            case "total" => cell.foreach(v => total = Num.parse(v))
            case "name" => cell.foreach(v => nameV = v.pyStrip)
            case "article" => cell match {
              case Some(v) => artState = 2; artV = v.pyStrip
              case None => artState = 1
            }
            case "unit" => cell match {
              case Some(v) => unitState = 2; unitV = v.pyStrip
              case None => unitState = 1
            }
            case _ => // "number": collected but never read by the item
          }
        }
      }
      if (nameV == null || nameV.isEmpty || qty.isEmpty || price.isEmpty) None
      else {
        val totalB = backfillIfNone(total, qty, price)
        def strOrNull(state: Int, v: String): String =
          if (state == 0) "" else if (state == 1) null else v
        Some(Item(nameV, strOrNull(artState, artV), qty,
          strOrNull(unitState, unitV), price, "RUB", totalB, "",
          s"table_${tableIdx}_row_$rowIdx", 0.95))
      }
    } catch { case _: Exception => None }
  }
}

object PreciseTableParser {

  private val elifFields: Seq[(String, Seq[String])] = Seq(
    "number" -> Seq("№", "номер", "позиция"),
    "article" -> Seq("артикул", "код", "арт"),
    "name" -> Seq("наименование", "товары", "работы", "услуги", "название", "наимен"),
    "qty" -> Seq("количество", "кол-во", "колво"),
    "unit" -> Seq("ед", "единица", "изм"),
    "price" -> Seq("цена", "стоимость", "руб", "без ндс"),
    "total" -> Seq("сумма", "итого", "всего", "с ндс"))

  def parse(tables: Seq[Tab]): Seq[Item] =
    tables.zipWithIndex.flatMap { case (t, i) =>
      try extractFromTable(t, i) catch { case _: Exception => Nil }
    }

  private[core] def identifyColumns(table: Tab): Option[Map[String, Int]] = {
    var mapping = mapByElifChain(table.header, elifFields, collapseWs = true).toMap
    if (mapping.isEmpty) mapping = byPosition(table.nCols)
    if (mapping.contains("name") && (mapping.contains("qty") || mapping.contains("price")))
      Some(mapping)
    else None
  }

  // precise_table_parser.py:189-244 (includes the 13-col split-header layout)
  private def byPosition(n: Int): Map[String, Int] =
    if (n >= 13) Map("number" -> 0, "name" -> 1, "qty" -> 5, "unit" -> 6, "price" -> 8, "total" -> 10)
    else if (n >= 10) Map("number" -> 0, "article" -> 1, "name" -> 2, "qty" -> 3, "unit" -> 4, "price" -> 5, "total" -> 6)
    else if (n >= 7) Map("number" -> 0, "name" -> 1, "qty" -> 2, "unit" -> 3, "price" -> 4, "total" -> 5)
    else if (n >= 6) Map("number" -> 0, "name" -> 1, "qty" -> 2, "unit" -> 3, "price" -> 4, "total" -> 5)
    else if (n >= 4) Map("name" -> 0, "qty" -> 1, "price" -> 2, "total" -> 3)
    else Map.empty

  private def extractFromTable(table: Tab, tableIdx: Int): Seq[Item] = {
    identifyColumns(table) match {
      case None => Nil
      case Some(m) =>
        val out = Seq.newBuilder[Item]
        var rowIdx = 0
        while (rowIdx < table.rows.length) {
          val row = table.rows(rowIdx)
          (try {
            if (isHeaderRow(row) || isServiceRowAnyCell(row)) None
            else extractItemFromRow(row, m, tableIdx, rowIdx)
              .filter(validateProduct(_, Rules.excludeWordsPrecise))
          } catch { case _: Exception => None }).foreach(out += _)
          rowIdx += 1
        }
        out.result()
    }
  }

  private def isHeaderRow(row: IndexedSeq[Option[String]]): Boolean = {
    val firstCell = if (row.nonEmpty) Py.pyStr(row(0)) else ""
    Py.containsAnyLowered(firstCell, Rules.headerFirstCellPrecise)
  }

  /** F5 — ANY cell containing an exclude word kills the row
    * (precise_table_parser.py:266-281). */
  private def isServiceRowAnyCell(row: IndexedSeq[Option[String]]): Boolean =
    row.exists {
      case Some(cell) => Py.containsAnyLowered(cell, Rules.excludeWordsPrecise)
      case None => false
    }

  // same local-state layout as TableExtractor.extractItemFromRow
  private def extractItemFromRow(row: IndexedSeq[Option[String]], m: Map[String, Int],
                                 tableIdx: Int, rowIdx: Int): Option[Item] = {
    try {
      var nameV: String = null
      var artState = 0; var artV: String = null
      var unitState = 0; var unitV: String = null
      var qty: Option[Double] = None
      var price: Option[Double] = None
      var total: Option[Double] = None
      m.foreach { case (field, colIdx) =>
        if (colIdx < row.length) {
          val cell = row(colIdx)
          field match {
            case "qty" => cell.foreach(v => qty = Num.parse(v))
            case "price" => cell.foreach(v => price = Num.parse(v))
            case "total" => cell.foreach(v => total = Num.parse(v))
            case "name" => cell.foreach(v => nameV = Py.collapseWs(v))
            case "article" => cell match {
              case Some(v) => artState = 2; artV = Py.collapseWs(v)
              case None => artState = 1
            }
            case "unit" => cell match {
              case Some(v) => unitState = 2; unitV = Py.collapseWs(v)
              case None => unitState = 1
            }
            case _ => // "number": collected but never read by the item
          }
        }
      }
      // neighbor-cell unit lookup (M4, precise_table_parser.py:301-308):
      // fires when the mapped unit cell is absent, NaN, or empty
      if (m.contains("unit") && (unitState != 2 || unitV.isEmpty)) {
        val unitCol = m("unit")
        if (unitCol + 1 < row.length) row(unitCol + 1).foreach { uv =>
          val u = uv.pyStrip
          if (u.nonEmpty && u != "None" && u.length <= 5) { unitState = 2; unitV = u }
        }
      }
      // split-header name merge (M4, precise_table_parser.py:310-320)
      if (m.contains("name") && nameV != null && nameV.nonEmpty) {
        val nameCol = m("name")
        var merged = nameV
        (1 to 4).foreach { i =>
          if (nameCol + i < row.length) row(nameCol + i).foreach { nv =>
            val n = nv.pyStrip
            if (n.nonEmpty && n != "None" && n.length > 2)
              merged = merged + " " + Py.collapseWs(n)
          }
        }
        nameV = merged
      }
      if (nameV == null || nameV.isEmpty || qty.isEmpty || price.isEmpty) None
      else {
        val totalB = if (total.isEmpty && truthy(qty) && truthy(price)) Some(qty.get * price.get) else total
        def strOrNull(state: Int, v: String): String =
          if (state == 0) "" else if (state == 1) null else v
        Some(Item(nameV, strOrNull(artState, artV), qty,
          strOrNull(unitState, unitV), price, "RUB", totalB, "",
          s"table_${tableIdx}_row_$rowIdx", 0.95))
      }
    } catch { case _: Exception => None }
  }
}
