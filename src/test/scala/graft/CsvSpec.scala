package graft

import graft.extract.CsvExtractor
import graft.gen.CsvGen
import graft.sources.RawFiles
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Delimited-data front end: RFC 4180 field machine, delimiter
  * sniffing, TSV normalization — against CsvGen's hand-written grids.
  */
class CsvSpec extends AnyFunSuite {

  test("generator round trip: all 6 variants yield their hand-written TSVs") {
    for (i <- 0 until 12) {
      val docs = RawFiles.decodeAny(CsvGen.fileName(i), CsvGen.fileBytes(i), "")
      val got = docs.flatMap(_.spans).map(_.text)
      val exp = CsvGen.expectedDoc(i).map(_.tsv)
      assert(got == exp, s"variant $i")
    }
  }

  test("field machine: quoting, escapes, embedded newlines, unterminated quotes") {
    def r(t: String) = CsvExtractor.rows(t, ',')
    assert(r("a,b\nc,d") == Vector(Vector("a", "b"), Vector("c", "d")))
    assert(r("\"x,y\",z") == Vector(Vector("x,y", "z")))
    assert(r("\"he said \"\"hi\"\"\",q") ==
      Vector(Vector("he said \"hi\"", "q")))
    assert(r("\"two\nlines\",b") == Vector(Vector("two\nlines", "b")))
    // unterminated quote runs to EOF without throwing
    assert(r("\"open,never closed") == Vector(Vector("open,never closed")))
    // mid-cell quotes are literal
    assert(r("5\" nail,b") == Vector(Vector("5\" nail", "b")))
    // empty rows vanish; a row of empties with >1 cell keeps grid shape
    assert(r("a\n\n\nb") == Vector(Vector("a"), Vector("b")))
    assert(r(",\nx,y") == Vector(Vector("", ""), Vector("x", "y")))
  }

  test("delimiter sniffing: semicolon, pipe, tab, quoted-first-row decoys") {
    assert(CsvExtractor.sniffDelim("a;b;c\n1,2\n") == ';')
    assert(CsvExtractor.sniffDelim("a|b|c|d\n") == '|')
    assert(CsvExtractor.sniffDelim("a\tb\n") == '\t')
    assert(CsvExtractor.sniffDelim("plain line\n") == ',')
    // delimiters inside a quoted first-row field do not count
    assert(CsvExtractor.sniffDelim("\"x;y;z\",b,c\n") == ',')
    // ties break to comma
    assert(CsvExtractor.sniffDelim("a,b;c,d;e\nz") == ',')
  }

  test("mutation storm: random bytes never crash the field machine") {
    val rnd = new scala.util.Random(20260818L)
    for (_ <- 0 until 200) {
      val n = 1 + rnd.nextInt(400)
      val b = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      CsvExtractor.tsv(new String(b, UTF_8), tabDelimited = rnd.nextBoolean())
    }
  }
}
