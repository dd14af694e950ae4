package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class VideoMetaSpec extends AnyFunSuite {

  test("parses synthesized MP4 track dimensions and duration") {
    val b = VideoMeta.synthesize(1920, 1080, durationMs = 90500L, junk = 50, seed = 2)
    assert(VideoMeta.parse(b) === Some(VideoMeta.Meta("video/mp4", 1920, 1080, 90500L)))
  }

  test("box walk tolerates leading boxes before moov (free box)") {
    val base = VideoMeta.synthesize(640, 360, 1000L, 10, 1)
    // insert a 'free' box between ftyp and moov
    val ftypLen = ((base(0) & 0xff) << 24) | ((base(1) & 0xff) << 16) | ((base(2) & 0xff) << 8) | (base(3) & 0xff)
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes("US-ASCII") ++ Array[Byte](9, 9, 9, 9)
    val spliced = base.take(ftypLen) ++ free ++ base.drop(ftypLen)
    assert(VideoMeta.parse(spliced) === Some(VideoMeta.Meta("video/mp4", 640, 360, 1000L)))
  }

  test("non-MP4 and malformed payloads return None") {
    assert(VideoMeta.parse("definitely not a video file bytes".getBytes) === None)
    assert(VideoMeta.parse(ImageMeta.synthesize("image/png", 4, 4, 4, 1)) === None)
    assert(VideoMeta.parse(AudioMeta.synthesize(8000, 1, 8, 10, 1)) === None)
    // ftyp present but no moov
    val noMoov = VideoMeta.synthesize(64, 64, 100L, 4, 1).take(24)
    assert(VideoMeta.parse(noMoov) === None)
  }

  test("gate fixture payloads parse to exactly the twin metadata") {
    VideoFixture.rows.foreach { case (id, payload, w, h, durMs) =>
      assert(VideoMeta.parse(payload) === Some(VideoMeta.Meta("video/mp4", w, h, durMs)), s"video $id")
    }
  }
}
