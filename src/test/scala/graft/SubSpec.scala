package graft

import graft.extract.SubtitleExtractor
import graft.gen.SubGen
import graft.sources.RawFiles
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Subtitle front end: SubRip/WebVTT cue machines, tag/entity cleanup,
  * rolling-caption collapse, at-byte-0 content magic — against SubGen's
  * hand-assembled files and hand-written ground truth.
  */
class SubSpec extends AnyFunSuite {

  test("generator round trip: all 6 variants extract their hand-written cues") {
    for (i <- 0 until 12) {
      val got = SubtitleExtractor.items(
        new String(SubGen.fileBytes(i), UTF_8))
      val exp = SubGen.expectedDoc(i).map(_.text)
      assert(got == exp, s"variant $i")
    }
  }

  test("cue machine: apparatus drops, tags strip, rollups collapse") {
    // BOM + CRLF + position settings + rolling duplicate (variant 1)
    val v1 = SubtitleExtractor.items(new String(SubGen.fileBytes(1), UTF_8))
    assert(v1.size == 3 && v1(1) == "Rolled caption stays once 1.")
    // NOTE/STYLE/REGION blocks and header metadata drop (variant 2)
    val v2 = SubtitleExtractor.items(new String(SubGen.fileBytes(2), UTF_8))
    assert(!v2.exists(_.contains("apparatus")))
    assert(!v2.exists(_.contains("captions")))
    assert(v2.exists(_ == "Slides & notes for m158.")) // entity decoded
    // a timing line separated from its payload by the id line only
    val idCue = "WEBVTT\n\nid7\n00:00:01.000 --> 00:00:02.000\nText here.\n"
    assert(SubtitleExtractor.items(idCue) == Vector("Text here."))
    // prose never parses as cues
    assert(SubtitleExtractor.items("Just prose.\nMore prose.\n").isEmpty)
    assert(SubtitleExtractor.items("").isEmpty)
    // timing with no payload yields nothing
    assert(SubtitleExtractor.items(
      "1\n00:00:01,000 --> 00:00:02,000\n\n").isEmpty)
  }

  test("content magic: SubRip under .txt reroutes; honest prose stays text") {
    val lying = RawFiles.decodeAny("lecture_0004.txt", SubGen.fileBytes(4), "")
    assert(lying.head.spans.map(_.text) ==
      SubGen.expectedDoc(4).map(_.text))
    val vttTxt = RawFiles.decodeAny("cap.txt",
      "WEBVTT\n\n00:00:01.000 --> 00:00:02.000\nHi there.\n".getBytes(UTF_8), "")
    assert(vttTxt.head.spans.map(_.text) == Seq("Hi there."))
    // prose .txt keeps its classification; a .srt of prose yields nothing
    val prose = RawFiles.decodeAny("note.txt",
      "1982 was the year.\nNothing else.\n".getBytes(UTF_8), "")
    assert(prose.head.spans.head.text.startsWith("1982"))
    val junk = RawFiles.decodeAny("film_0005.srt", SubGen.fileBytes(5), "")
    assert(junk.forall(_.spans.isEmpty))
  }

  test("mutation storm: corruption and truncation never crash the cue machine") {
    val rnd = new scala.util.Random(20260818L)
    for (v <- Seq(1, 2); _ <- 0 until 100) {
      val b = SubGen.fileBytes(v).clone()
      for (_ <- 0 until 6)
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      SubtitleExtractor.items(new String(b, UTF_8)) // must not throw
    }
    val base = new String(SubGen.fileBytes(2), UTF_8)
    for (_ <- 0 until 60)
      SubtitleExtractor.items(base.substring(0, rnd.nextInt(base.length)))
  }
}
