package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** WARC reader (x176) + HTML extractor (x177): fixture-truth agreement,
  * official-library gzip cross-checks both directions, the quarantine
  * matrix, and the tokenizer constructs a regex stripper gets wrong. */
class WarcScanSpec extends AnyFunSuite {

  test("all 200 fixture files parse to the formula-derived record table") {
    (0L until 200L).foreach { w =>
      val recs = WarcScan.parse(WarcFixture.fileBytes(w)).getOrElse(fail(s"warc $w quarantined"))
      val n = WarcFixture.nResponses(w)
      val expLen = 1 + n + (if (w % 3 == 0) 1 else 0)
      assert(recs.length === expLen, s"warc $w")
      assert(recs.head.warcType === "warcinfo")
      assert(recs.head.httpStatus === -1L)
      assert(new String(recs.head.body, "ISO-8859-1") === WarcFixture.warcinfoContent)
      (0 until n).foreach { j =>
        val r = recs(1 + j)
        assert(r.warcType === "response")
        assert(r.targetUri === s"https://example.com/$w/$j")
        assert(r.httpStatus === WarcFixture.status(w, j.toLong))
        assert(new String(r.body, "ISO-8859-1") === WarcFixture.body(w, j.toLong), s"warc $w rec ${j + 1}")
      }
      if (w % 3 == 0) {
        val r = recs.last
        assert(r.warcType === "request")
        assert(r.httpStatus === -1L)
        assert(r.body.isEmpty)
      }
    }
  }

  test("JDK GZIPInputStream reads our concatenated members (multi-member conformance)") {
    val b = WarcFixture.fileBytes(5L)
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    val jdk = in.readAllBytes()
    val ours = WarcScan.gunzipMembers(b).get.reduce(_ ++ _)
    assert(java.util.Arrays.equals(jdk, ours), "member concatenation differs from the JDK's")
  }

  test("a member with FEXTRA+FNAME+FHCRC header flags decodes (full RFC 1952 flag walk)") {
    val payload = WarcScan.record("warcinfo", None, "2026-01-01T00:00:00Z",
      Some("application/warc-fields"), "a: b\r\n".getBytes("ISO-8859-1"))
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    defl.setInput(payload); defl.finish()
    val buf = new Array[Byte](4096)
    val m = defl.deflate(buf); defl.end()
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    def le4(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val hdr = Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8 | 2).toByte, 0, 0, 0, 0, 0, 0xff.toByte) ++
      Array[Byte](4, 0) ++ Array[Byte](1, 2, 3, 4) ++ // FEXTRA xlen=4 + payload
      "x.warc\u0000".getBytes("ISO-8859-1") ++ // FNAME (NUL-terminated)
      Array[Byte](0x42, 0x42) // FHCRC (skipped, not validated)
    val member = hdr ++ buf.take(m) ++ le4(crc.getValue) ++ le4(payload.length.toLong)
    val recs = WarcScan.parse(member).getOrElse(fail("flagged member quarantined"))
    assert(recs.length === 1)
    assert(recs.head.warcType === "warcinfo")
  }

  test("structural lies quarantine: CRC flip, truncation, bad Content-Length, version, trailing bytes") {
    val good = WarcFixture.fileBytes(1L)
    assert(WarcScan.parse(good).isDefined)
    // flip one byte of the first member's deflate stream (CRC catches it)
    val crcFlip = good.clone(); crcFlip(20) = (crcFlip(20) ^ 0x01).toByte
    assert(WarcScan.parse(crcFlip).isEmpty, "corrupted deflate body must quarantine")
    // truncate mid-member
    assert(WarcScan.parse(good.take(good.length - 5)).isEmpty, "truncation must quarantine")
    // trailing garbage after the last member fails the next magic check
    assert(WarcScan.parse(good ++ Array[Byte](0, 1, 2)).isEmpty, "trailing bytes must quarantine")
    // a record whose Content-Length misses by one
    val rec = WarcScan.record("warcinfo", None, "2026-01-01T00:00:00Z", None, "abc".getBytes)
    val off = new String(rec, "ISO-8859-1").replace("Content-Length: 3", "Content-Length: 2")
    assert(WarcScan.parse(WarcScan.gzipMember(off.getBytes("ISO-8859-1"))).isEmpty, "bad Content-Length")
    // wrong version line
    val bad = new String(rec, "ISO-8859-1").replace("WARC/1.0", "WARC/9.9")
    assert(WarcScan.parse(WarcScan.gzipMember(bad.getBytes("ISO-8859-1"))).isEmpty, "bad version")
    // bytes after the record's two closing CRLFs inside one member
    assert(WarcScan.parse(WarcScan.gzipMember(rec ++ "zz".getBytes)).isEmpty, "post-record bytes")
  }

  test("x276 export: from-scratch-gzip'd files parse record-identically to the official-encoder files") {
    for (w <- 0L until 200L by 13L) {
      val official = WarcScan.parse(WarcFixture.fileBytes(w))
      val export = WarcScan.parse(WarcExportFixture.fileBytes(w))
      assert(official.isDefined && export.isDefined, s"w=$w")
      val a = official.get.map(r => (r.recIdx, r.warcType, r.targetUri, r.httpStatus, r.body.toSeq))
      val b = export.get.map(r => (r.recIdx, r.warcType, r.targetUri, r.httpStatus, r.body.toSeq))
      assert(a === b, s"w=$w: export corpus must carry the identical records")
    }
  }

  test("HtmlText handles the constructs a regex stripper gets wrong") {
    val html = WarcFixture.html(3L, 1L)
    val got = HtmlText.extract(html)
    assert(got === "Doc 3-1 Head 3 alpha&beta 3 <q> link 1 gamma A delta")
    // the naive stripper truncates the quoted '>' attribute wrongly and
    // leaks script/style content — provably different
    val naive = html.replaceAll("<[^>]*>", " ").replaceAll("\\s+", " ").trim
    assert(naive !== got, "fixture must make the regex stripper diverge")
    assert(naive.contains("color:red") || naive.contains("v\""), "expected regex-stripper damage")
    // raw-text elements swallow inner '<'
    assert(HtmlText.extract("<script>if(a<b){x()}</script>hi") === "hi")
    // unterminated comment / tag / raw-text consume to end (documented)
    assert(HtmlText.extract("a<!-- never closed") === "a")
    assert(HtmlText.extract("a<tag attr=\"x") === "a")
    assert(HtmlText.extract("a<style>p{") === "a")
    // entities: named, decimal, invalid forms stay verbatim
    assert(HtmlText.extract("&lt;&amp;&gt;&quot;&apos;") === "<&>\"'")
    assert(HtmlText.extract("&#65;&#97;") === "Aa")
    assert(HtmlText.extract("&zzz; &#; &#99999999;") === "&zzz; &#; &#99999999;")
    // whitespace collapse + boundary spaces
    assert(HtmlText.extract("a\n\n  b<p>c</p>d") === "a b c d")
    // a bare '<' in prose is TEXT (HTML5 tokenizer rule), not a tag open
    assert(HtmlText.extract("5 < 6 and 7 > 4") === "5 < 6 and 7 > 4")
    // '</scripts>' must NOT close a script element (name-boundary rule)
    assert(HtmlText.extract("<script>a</scripts>b</script>c") === "c")
  }
}
