package graft

import graft.extract.PptExtractor
import graft.gen.PptGen
import graft.sources.RawFiles
import org.scalatest.funsuite.AnyFunSuite

/** PowerPoint 97–2003 binary front end: record-tree walk, both text
  * atom kinds, container nesting, decoy skipping, paragraph/soft-break
  * semantics, encryption drop — against PptGen's hand-assembled decks.
  */
class PptSpec extends AnyFunSuite {

  test("generator round trip: all 4 variants yield their hand-written blocks") {
    for (i <- 0 until 12) {
      val got = PptExtractor.items(PptGen.fileBytes(i))
        .collect { case PptExtractor.Text(t) => t }
      assert(got == PptGen.expectedDoc(i).map(_.text), s"variant $i")
    }
  }

  test("soft break stays inside its block; CR splits; decoys skipped") {
    val v1 = PptExtractor.items(PptGen.fileBytes(1))
      .collect { case PptExtractor.Text(t) => t }
    assert(v1.exists(_.contains("\n")))
    val v2 = PptExtractor.items(PptGen.fileBytes(2))
      .collect { case PptExtractor.Text(t) => t }
    assert(!v2.exists(_.contains("decoy")))
  }

  test("encrypted decks drop whole") {
    assert(PptExtractor.items(PptGen.fileBytes(3)).isEmpty)
    assert(RawFiles.decodeAny("deck.ppt", PptGen.fileBytes(3), "")
      .forall(_.spans.isEmpty))
  }

  test("content magic: a .ppt lying as .txt or .doc routes by stream name") {
    val ppt = PptGen.fileBytes(0)
    for (name <- Seq("deck.txt", "deck.doc", "deck.xls")) {
      val spans = RawFiles.decodeAny(name, ppt, "").head.spans
      assert(spans.map(_.text) == PptGen.expectedDoc(0).map(_.text),
        name)
    }
  }

  test("mutation storm: corruption and truncation never crash the walker") {
    val rnd = new scala.util.Random(20260820L)
    for (v <- 0 until 3) {
      val base = PptGen.fileBytes(v)
      for (_ <- 0 until 80) {
        val b = base.clone()
        for (_ <- 0 until 8)
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        PptExtractor.items(b) // must not throw
      }
      for (_ <- 0 until 30)
        PptExtractor.items(
          java.util.Arrays.copyOf(base, rnd.nextInt(base.length)))
    }
  }
}
