package graft.sources

/** Format-sniffing pixel-decode dispatch — the shape a MIXED media corpus
  * actually needs: payloads arrive with no format column, the first bytes
  * decide (BMP `BM`, PNG signature, GIF `GIF8`, JPEG FFD8), and the
  * matching from-scratch decoder produces pixels under one shared
  * contract (the 8×8 resample/checksum of x33). One operator, five real
  * decoders ([[BmpPixels]], [[PngPixels]], [[GifPixels]], [[JpegPixels]],
  * [[TiffPixels]] — II and MM magics); anything unrecognized or out of
  * scope quarantines to None exactly as each decoder does alone. */
object ImageDispatch {

  /** (format, image) by magic-byte sniff; None = unrecognized/corrupt. */
  def decodeAny(b: Array[Byte]): Option[(String, BmpPixels.Image)] = {
    if (b.length < 8) None
    else if (b(0) == 'B' && b(1) == 'M') BmpPixels.decode(b).map("bmp" -> _)
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      PngPixels.decode(b).map("png" -> _)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      GifPixels.decode(b).map("gif" -> _)
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) JpegPixels.decode(b).map("jpeg" -> _)
    else if (b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 42 && b(3) == 0)
      TiffPixels.decode(b).map("tiff" -> _)
    else if (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 42)
      TiffPixels.decode(b).map("tiff" -> _)
    else None
  }
}
