package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.matching.Fuzzy

/** J1 — WRatio decision-band parity (SURVEY.md §2.12: parity asserted on
  * match decisions >=90 auto / >=70 suggest, not exact scores). */
class FuzzySpec extends AnyFunSuite {

  test("identical strings score 100 after preprocessing") {
    assert(Fuzzy.wratio("Кабель ВВГ 3х2,5", "кабель ввг 3х2,5") == 100.0)
    assert(Fuzzy.wratio("a-b-c", "A B C") == 100.0)
  }

  test("empty or null inputs score 0") {
    assert(Fuzzy.wratio("", "x") == 0.0)
    assert(Fuzzy.wratio(null, "x") == 0.0)
  }

  test("near-identical names land in the auto band (>=90)") {
    assert(Fuzzy.wratio("Кабель силовой ВВГнг 3х2,5", "Кабель силовой ВВГнг 3x2,5") >= 90.0)
    assert(Fuzzy.wratio("СИП-4 4х25", "СИП-4 4х25 ГОСТ") >= 90.0) // token-set subset -> 100*0.95
  }

  test("related but different names land in the suggest band (70-89)") {
    val s = Fuzzy.wratio("Кабель силовой ВВГ 3х2,5", "Кабель силовой АВВГ 4х16")
    assert(s >= 70.0 && s < 90.0, s)
  }

  test("unrelated names score below the suggest threshold") {
    assert(Fuzzy.wratio("Кабель силовой ВВГнг", "Болт М8 оцинкованный") < 70.0)
    assert(Fuzzy.wratio("перевозка до склада", "Гайка М10") < 70.0)
  }

  test("token order does not matter (token_sort path)") {
    val s = Fuzzy.wratio("силовой кабель ВВГ", "кабель силовой ВВГ")
    assert(s >= 95.0 * 0.95)
  }

  test("substring containment uses the partial path for unequal lengths") {
    val s = Fuzzy.wratio("ВВГ", "Кабель силовой ВВГ 3х2,5 на барабане с доставкой")
    assert(s >= 50.0, s) // partial match scaled by 0.9/0.6
  }

  test("ratio/partialRatio basic identities") {
    assert(Fuzzy.ratio("abc", "abc") == 100.0)
    assert(Fuzzy.ratio("", "") == 100.0)
    assert(Fuzzy.ratio("abc", "xyz") == 0.0)
    assert(Fuzzy.partialRatio("bc", "abcd") == 100.0)
    assert(Fuzzy.tokenSetRatio("a b c", "c b a") == 100.0)
  }
}
