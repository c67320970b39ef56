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
        table.rows.zipWithIndex.flatMap { case (row, rowIdx) =>
          try {
            val firstCell = if (row.nonEmpty) Py.pyStr(row(0)) else ""
            if (Py.containsAny(Py.lower(firstCell), Rules.headerFirstCellTable)) None
            else extractItemFromRow(row, m, tableIdx, rowIdx)
              .filter(validateProduct(_, Rules.excludeWordsTableExtractor))
          } catch { case _: Exception => None }
        }
    }
  }

  private def extractItemFromRow(row: IndexedSeq[Option[String]], m: Map[String, Int],
                                 tableIdx: Int, rowIdx: Int): Option[Item] = {
    try {
      val f = mutable.Map.empty[String, Option[String]]
      val nums = mutable.Map.empty[String, Option[Double]]
      m.foreach { case (field, colIdx) =>
        if (colIdx < row.length) {
          row(colIdx) match {
            case Some(v) =>
              if (field == "qty" || field == "price" || field == "total") nums(field) = Num.parse(v)
              else f(field) = Some(v.pyStrip)
            case None =>
              if (field == "qty" || field == "price" || field == "total") nums(field) = None
              else f(field) = None
          }
        }
      }
      val name = f.getOrElse("name", None)
      val qty = nums.getOrElse("qty", None)
      val price = nums.getOrElse("price", None)
      if (name.forall(_.isEmpty) || qty.isEmpty || price.isEmpty) None
      else {
        val total = backfillIfNone(nums.getOrElse("total", None), qty, price)
        // a mapped-but-missing cell stays None in the reference item dict
        // (table_extractor.py:196-197): null here, "" only when unmapped
        def strOrNull(field: String): String =
          if (f.contains(field)) f(field).orNull else ""
        Some(Item(name.get, strOrNull("article"), qty,
          strOrNull("unit"), price, "RUB", total, "",
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
        table.rows.zipWithIndex.flatMap { case (row, rowIdx) =>
          try {
            if (isHeaderRow(row) || isServiceRowAnyCell(row)) None
            else extractItemFromRow(row, m, tableIdx, rowIdx)
              .filter(validateProduct(_, Rules.excludeWordsPrecise))
          } catch { case _: Exception => None }
        }
    }
  }

  private def isHeaderRow(row: IndexedSeq[Option[String]]): Boolean = {
    val firstCell = if (row.nonEmpty) Py.pyStr(row(0)) else ""
    Py.containsAny(Py.lower(firstCell), Rules.headerFirstCellPrecise)
  }

  /** F5 — ANY cell containing an exclude word kills the row
    * (precise_table_parser.py:266-281). */
  private def isServiceRowAnyCell(row: IndexedSeq[Option[String]]): Boolean =
    row.exists {
      case Some(cell) => Py.containsAny(Py.lower(cell), Rules.excludeWordsPrecise)
      case None => false
    }

  private def extractItemFromRow(row: IndexedSeq[Option[String]], m: Map[String, Int],
                                 tableIdx: Int, rowIdx: Int): Option[Item] = {
    try {
      val f = mutable.Map.empty[String, Option[String]]
      val nums = mutable.Map.empty[String, Option[Double]]
      m.foreach { case (field, colIdx) =>
        if (colIdx < row.length) {
          row(colIdx) match {
            case Some(v) =>
              if (field == "qty" || field == "price" || field == "total") nums(field) = Num.parse(v)
              else f(field) = Some(Py.collapseWs(v))
            case None =>
              if (field == "qty" || field == "price" || field == "total") nums(field) = None
              else f(field) = None
          }
        }
      }
      // neighbor-cell unit lookup (M4, precise_table_parser.py:301-308)
      if (m.contains("unit") && f.getOrElse("unit", None).forall(_.isEmpty)) {
        val unitCol = m("unit")
        if (unitCol + 1 < row.length) row(unitCol + 1).foreach { uv =>
          val u = uv.pyStrip
          if (u.nonEmpty && u != "None" && u.length <= 5) f("unit") = Some(u)
        }
      }
      // split-header name merge (M4, precise_table_parser.py:310-320)
      if (m.contains("name") && f.getOrElse("name", None).exists(_.nonEmpty)) {
        val nameCol = m("name")
        var merged = f("name").get
        (1 to 4).foreach { i =>
          if (nameCol + i < row.length) row(nameCol + i).foreach { nv =>
            val n = nv.pyStrip
            if (n.nonEmpty && n != "None" && n.length > 2)
              merged = merged + " " + Py.collapseWs(n)
          }
        }
        f("name") = Some(merged)
      }
      val name = f.getOrElse("name", None)
      val qty = nums.getOrElse("qty", None)
      val price = nums.getOrElse("price", None)
      if (name.forall(_.isEmpty) || qty.isEmpty || price.isEmpty) None
      else {
        val total0 = nums.getOrElse("total", None)
        val total = if (total0.isEmpty && truthy(qty) && truthy(price)) Some(qty.get * price.get) else total0
        def strOrNull(field: String): String =
          if (f.contains(field)) f(field).orNull else ""
        Some(Item(name.get, strOrNull("article"), qty,
          strOrNull("unit"), price, "RUB", total, "",
          s"table_${tableIdx}_row_$rowIdx", 0.95))
      }
    } catch { case _: Exception => None }
  }
}
