package graft.operators

import graft.functions.{IdnFixture, Punycode}
import org.scalatest.funsuite.AnyFunSuite

/** x206 punycode decoder: agreement with the OFFICIAL java.net.IDN on the
  * fixture corpus and on adversarially varied labels (that library is the
  * authoritative conformance target), case-insensitivity, pass-through,
  * and the RFC's MUST-detect overflow/malformed quarantines. */
class PunycodeSpec extends AnyFunSuite {

  test("every fixture host decodes back to its formula unicode AND to IDN.toUnicode") {
    (0L until 300L).foreach { z =>
      val ascii = IdnFixture.asciiHost(z)
      val got = Punycode.decodeHost(ascii).getOrElse(fail(s"host $z quarantined"))
      assert(got === IdnFixture.unicodeHost(z), s"host $z vs formula")
      assert(got === java.net.IDN.toUnicode(ascii), s"host $z vs official decoder")
    }
  }

  test("official-library agreement on varied single labels (incl. no-basic-part)") {
    val samples = Seq(
      "éüñ",                 // no basic part at all
      "abc中文def",                 // basic + CJK interleaved
      "aあbいcう",              // alternating
      "ж" * 20,                        // long run, bias adaptation
      "x" + "αβγ" * 7        // greek repeats
    )
    samples.foreach { u =>
      val ascii = java.net.IDN.toASCII(u)
      assert(ascii.startsWith("xn--"), s"sanity: $u must need encoding")
      assert(Punycode.decodeLabel(ascii.substring(4)) === Some(u), u)
    }
  }

  test("ACE prefix and digits are case-insensitive; pure-ASCII hosts pass through") {
    val ascii = java.net.IDN.toASCII("café")
    val upper = ascii.toUpperCase
    assert(Punycode.decodeHost("XN--" + ascii.substring(4)) === Punycode.decodeHost(ascii))
    assert(Punycode.decodeHost(upper).map(_.toLowerCase) === Some("café"))
    assert(Punycode.decodeHost("plain.example.com") === Some("plain.example.com"))
    assert(Punycode.decodeHost("") === Some(""))
  }

  test("malformed labels quarantine: bad digit, truncation, overflow, leading dash") {
    // '!' is not a punycode digit
    assert(Punycode.decodeLabel("ab-c!d").isEmpty, "invalid digit char")
    // a trailing in-progress integer (last digit >= its threshold t)
    val good = java.net.IDN.toASCII("éüñ").substring(4)
    assert(Punycode.decodeLabel(good + "z").isEmpty, "truncated trailing integer")
    // the RFC MUST-detect overflow: maximal digits blow past Int range
    assert(Punycode.decodeLabel("999999999999").isEmpty, "overflow must quarantine")
    // leading '-' with no basic part: the reference decoder path (the
    // '-' is consumed as a digit and is not one)
    assert(Punycode.decodeLabel("-abc").isEmpty, "leading dash, no basic part")
    // a whole-host quarantine: one bad label poisons the host
    assert(Punycode.decodeHost("ok.xn--!!.com").isEmpty)
  }
}
