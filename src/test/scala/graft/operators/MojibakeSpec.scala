package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** x204 demojibake unit laws: exact inversion of the misread transform,
  * the strictness-based no-false-positive guarantee, layering, and the
  * inherent "Ã©" ambiguity pinned as documented behavior. */
class MojibakeSpec extends AnyFunSuite {

  private def corrupt(s: String): String = new String(s.getBytes("UTF-8"), "ISO-8859-1")

  test("repairs one misread layer exactly for 2-, 3- and 4-byte sequences") {
    val samples = Seq(
      "plain café and straße text",
      "3-byte: € 中文 works",
      "4-byte: 😀 astral",
      "mixed é ü ß №  "
    )
    samples.foreach { s0 =>
      assert(Curation.demojibake(corrupt(s0)) === Some(s0), s0)
    }
  }

  test("no false positives: ASCII and genuine Latin-1 text pass through") {
    assert(Curation.demojibake("pure ascii text, nothing to do") === None)
    // a real Latin-1 'é' mid-ASCII is an invalid UTF-8 lead byte
    assert(Curation.demojibake("un café honnête") === None)
    assert(Curation.demojibake("trailing accent é") === None)
    // chars above 0xFF cannot be a Latin-1 misread at all
    assert(Curation.demojibake("has a № sign") === None)
  }

  test("double encoding peels one layer per pass; fixpoint recovers the original") {
    val s0 = "tárgyüber ß"
    val twice = corrupt(corrupt(s0))
    val once = Curation.demojibake(twice)
    assert(once === Some(corrupt(s0)), "first pass peels exactly one layer")
    assert(once.flatMap(Curation.demojibake) === Some(s0), "fixpoint reaches the original")
    assert(Curation.demojibake(s0) === None, "the original is a fixpoint")
  }

  test("the documented ambiguity: text that legitimately spells mojibake repairs anyway") {
    // "Ã©" IS the UTF-8-of-é misread — indistinguishable by construction
    assert(Curation.demojibake("literal Ã© here") === Some("literal é here"))
  }
}
