package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.Turn

/**
 * Deterministic synthetic transcripts generator (FIXTURES.md §B).
 *
 * Produces the `(conv_id, turn_idx, role, text, tool, ts)` table of
 * BASELINE.json's input_hint at any scale, seed-fixed (splitmix64 over
 * (seed, id) — no wall clock, no order dependence), with:
 *  - Zipf-ish skew: the first `hotShare` of rows belong to ONE hot
 *    conversation (dense turn_idx), the rest to 8-turn conversations —
 *    exercises salted repartitioning;
 *  - payload shapes covering every reference behavior (plain invoices,
 *    RU/US number formats, numbered rows, split-header 13-col tables,
 *    key:value blocks, service noise, supplier-profile docs, duplicates,
 *    low-quality payloads).
 */
object Transcripts {

  // -- splitmix64: public-domain PRNG step (Steele et al., JDK SplittableRandom) --
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d4a4b449bb9d4bL
    z ^ (z >>> 31)
  }
  def rng(seed: Long, id: Long, slot: Long): Long = mix(mix(mix(seed) ^ id) ^ slot)
  def rngInt(seed: Long, id: Long, slot: Long, bound: Int): Int =
    (Math.floorMod(rng(seed, id, slot), bound.toLong)).toInt

  val products: Array[String] = Array(
    "Кабель силовой ВВГнг 3х2,5", "Кабель силовой ВВГ 4х16", "СИП-4 4х25",
    "Провод ПуГВ 1х6", "Кабель КГ 3х1,5", "СИП-2 3х70+1х54,6",
    "Перевозка до склада заказчика", "Кабель ППГнг 5х10", "Провод СИП-3 1х50",
    "Транспортные услуги по городу")
  private val units = Array("шт", "м", "кг", "л")

  /** Format a price deterministically in one of the RU/US shapes P1 handles.
    * Locale pinned to ROOT — never the JVM default. */
  def fmtNum(v: Double, style: Int): String = {
    val L = java.util.Locale.ROOT
    var i = v.toLong
    var frac = math.round((v - i) * 100).toInt
    if (frac == 100) { i += 1; frac = 0 } // carry: 63241.9999 -> 63242,00
    style match {
      case 0 => String.format(L, "%.2f", Double.box(v))                                   // 1234.56
      case 1 => String.format(L, "%,d", Long.box(i)).replace(",", " ") +
                String.format(L, ",%02d", Int.box(frac))                                  // 1 234,56
      case 2 => String.format(L, "%,.2f", Double.box(v))                                  // 1,234.56
      case _ => if (frac == 0) s"$i" else s"$i," + String.format(L, "%02d", Int.box(frac)) // 1234 / 1234,56
    }
  }

  private def pad(s: String, w: Int): String = if (s.length >= w) s + "  " else s + (" " * (w - s.length))

  /** One item line of a whitespace-column table. */
  private def tableLine(name: String, qty: Int, unit: String, price: Double, style: Int): String = {
    val total = qty * price
    pad(name, 34) + pad(qty.toString, 8) + pad(unit, 8) + pad(fmtNum(price, style), 12) + fmtNum(total, style)
  }

  /** Deterministic payload for a row id. */
  def payload(seed: Long, id: Long): String = {
    val shape = rngInt(seed, id, 1, 10)
    val style = rngInt(seed, id, 2, 4)
    val n = 2 + rngInt(seed, id, 3, 4) // 2-5 items
    def item(k: Int): (String, Int, String, Double) = {
      val p = products(rngInt(seed, id, 10 + k, products.length))
      val qty = 1 + rngInt(seed, id, 20 + k, 50)
      val unit = units(rngInt(seed, id, 30 + k, units.length))
      val price = 50.0 + rngInt(seed, id, 40 + k, 500000) / 100.0
      (p, qty, unit, price)
    }
    val sb = new StringBuilder
    shape match {
      case 0 | 1 => // plain invoice with table region (sample_invoice shape)
        sb.append(s"СЧЕТ-ФАКТУРА № ${1000 + id % 9000} от 15.01.2025\n\n")
        sb.append("Поставщик: ООО \"ТестПоставщик\"\nПокупатель: ООО \"Покупатель\"\n\n")
        sb.append(pad("Наименование товара", 34) + pad("Кол-во", 8) + pad("Ед.изм", 8) + pad("Цена", 12) + "Сумма\n")
        var sum = 0.0
        (0 until n).foreach { k => val (p, q, u, pr) = item(k); sum += q * pr
          sb.append(tableLine(p, q, u, pr, style)).append('\n') }
        sb.append(s"\nИтого: ${fmtNum(sum, 0)} руб.\n")
      case 2 => // numbered invoice rows (R4/R5 text shape, no table region)
        sb.append(s"Счет на оплату № ${100 + id % 900}\n\n")
        (0 until n).foreach { k =>
          val (p, q, u, pr) = item(k)
          sb.append(s"${k + 1} АБВ-${100 + k} $p $q $u ${fmtNum(pr, 0)} ${fmtNum(q * pr, 0)}\n")
        }
      case 3 => // key:value structured blocks (T5/R14)
        sb.append("Конкурентная процедура закупки\n\n")
        (0 until n).foreach { k =>
          val (p, q, _, pr) = item(k)
          sb.append(s"Наименование: $p\nКоличество: $q\nЦена: ${fmtNum(pr, style)}\n\n")
        }
      case 4 => // supplier-profile doc (J4): БАЛТКАБЕЛЬ + №-led table
        sb.append("ООО 'БАЛТКАБЕЛЬ'  ИНН 7800000000\n\n")
        sb.append(pad("№", 4) + pad("Наименование", 30) + pad("Кол-во", 8) + pad("Ед", 6) + pad("Срок", 8) + pad("Цена", 12) + "Сумма\n")
        (0 until n).foreach { k =>
          val (p, q, u, pr) = item(k)
          sb.append(pad((k + 1).toString, 4) + pad(p, 30) + pad(q.toString, 8) + pad(u, 6) + pad("5", 8) +
            pad(fmtNum(pr, style), 12) + fmtNum(q * pr, style)).append('\n')
        }
      case 5 => // service/boilerplate noise only -> zero items (F2/F3/F5)
        sb.append("ИНН 5027177653 КПП 502701001\nБанк получателя: ПАО БАНК\n")
        sb.append("Р/с 40702810123450101230 БИК 044525225\n")
        sb.append("Адрес: Копорское шоссе, дом 15, корпус 2\nИтого к оплате: 12 345,67 руб.\n")
      case 6 => // split-header 13-col table (M4 / precise positional layout)
        sb.append("Спецификация поставки\n\n")
        sb.append(pad("№", 4) + pad("Наимен", 10) + pad("ование", 10) + pad("Доп", 6) + pad("Прим", 6) +
          pad("Кол-во", 8) + pad("Ед. изм.", 10) + pad("Срок поставки", 15) + pad("Цена (б", 10) +
          pad("ез НДС)", 9) + "Сумма (с НДС)\n")
        (0 until n).foreach { k =>
          val (p, q, u, pr) = item(k)
          val (h, t) = p.splitAt(math.max(1, p.length / 2))
          sb.append(pad((k + 1).toString, 4) + pad(h.strip(), 10) + pad(t.strip(), 10) + pad(".", 6) + pad(".", 6) +
            pad(q.toString, 8) + pad(u, 10) + pad("5 дней", 15) + pad(fmtNum(pr, 1), 10) + pad(".", 9) +
            fmtNum(q * pr, 1)).append('\n')
        }
      case 7 => // duplicates across table and text (A1 dedup)
        val (p, q, u, pr) = item(0)
        sb.append("Коммерческое предложение\n\n")
        sb.append(pad("Наименование", 34) + pad("Кол-во", 8) + pad("Ед.изм", 8) + pad("Цена", 12) + "Сумма\n")
        sb.append(tableLine(p, q, u, pr, 0)).append('\n')
        sb.append('\n')
        sb.append(s"$p $q $u ${fmtNum(pr, 0)} руб\n")
      case 8 => // low quality (F9)
        sb.append("стр. " + (id % 40))
      case _ => // mixed prose with embedded item lines (R1-R3)
        sb.append("Уважаемые коллеги, направляем предложение по позициям ниже.\n")
        (0 until n).foreach { k =>
          val (p, q, u, pr) = item(k)
          sb.append(s"$p  $q $u  ${fmtNum(pr, 0)} руб\n")
        }
        sb.append("С уважением, отдел продаж\n")
    }
    sb.toString
  }

  /** id -> (conv_id, turn_idx): first `hotShare` ids form one hot conv. */
  def convOf(id: Long, nTurns: Long, hotShare: Double, turnsPerConv: Int): (String, Int) = {
    val hot = math.max(1L, (nTurns * hotShare).toLong)
    if (id < hot) ("conv-hot-00000000", id.toInt)
    else {
      val rest = id - hot
      (f"conv-${rest / turnsPerConv}%08d", (rest % turnsPerConv).toInt)
    }
  }

  val roles = Array("user", "assistant", "tool")

  def turnFor(seed: Long, id: Long, nTurns: Long, hotShare: Double, turnsPerConv: Int): Turn = {
    val (conv, turnIdx) = convOf(id, nTurns, hotShare, turnsPerConv)
    val role = roles(turnIdx % 3)
    val tool = if (role == "tool") "pdf_extract" else null
    val ts = new java.sql.Timestamp(1704067200000L + id * 1000L) // 2024-01-01 + id sec
    Turn(conv, turnIdx, role, payload(seed, id), tool, ts)
  }

  /** Distributed generation: spark.range -> map (no driver-side data). */
  def generate(spark: SparkSession, nTurns: Long, seed: Long = 42L,
               hotShare: Double = 0.05, turnsPerConv: Int = 8,
               partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, nTurns, 1, partitions) else spark.range(nTurns)
    base.map(id => turnFor(seed, id, nTurns, hotShare, turnsPerConv))
  }

  def generateDF(spark: SparkSession, nTurns: Long): DataFrame = generate(spark, nTurns).toDF()

  /** Small products dimension for J1 fuzzy matching (FIXTURES.md §B):
    * exact names (auto band >=90), near variants (suggest band 70-89) and
    * unrelated names (<70). */
  def productsDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val exact = products.zipWithIndex.map { case (p, i) => (i + 1, f"SKU-$i%04d", p) }
    val variants = products.take(4).zipWithIndex.map { case (p, i) =>
      (100 + i, f"SKU-V$i%03d", p.replace("х", "x") + " ГОСТ") }
    val noise = Seq((900, "SKU-N001", "Болт М8 оцинкованный"), (901, "SKU-N002", "Гайка М10"))
    (exact.toSeq ++ variants.toSeq ++ noise).toDF("product_id", "sku", "name")
  }
}
