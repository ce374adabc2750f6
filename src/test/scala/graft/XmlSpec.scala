package graft

import graft.extract.XmlExtractor
import graft.gen.XmlGen
import graft.sources.RawFiles
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Generic-XML front end: block rule, CDATA/entity/encoding handling,
  * apparatus drops, feed/generic routing — against XmlGen's
  * hand-assembled files + hand-written ground truth AND an independent
  * DOM twin (javax.xml parses the bytes; the block rule is re-derived
  * over DOM nodes, never over the scanner's tokens).
  */
class XmlSpec extends AnyFunSuite {

  /** Independent twin: javax.xml DOM walk implementing the block
    * semantics — a DFS over nodes carrying (buffer, solid, mark) the
    * way the SPEC states them, with the JDK doing all tokenization,
    * entity decoding, CDATA and encoding work.
    */
  private def domBlocks(bytes: Array[Byte]): Vector[String] = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.setExpandEntityReferences(true)
    val b = f.newDocumentBuilder()
    b.setErrorHandler(null)
    val doc = b.parse(new java.io.ByteArrayInputStream(bytes))
    val out = Vector.newBuilder[String]
    val buf = new StringBuilder
    var solid = 0
    def normAdd(): Unit = {
      val t = graft.extract.HtmlExtractor.normalize(buf.toString)
      if (t.nonEmpty) out += t
      buf.setLength(0); solid = 0
    }
    def walk(n: org.w3c.dom.Node): Unit = n.getNodeType match {
      case org.w3c.dom.Node.TEXT_NODE |
           org.w3c.dom.Node.CDATA_SECTION_NODE =>
        val t = n.getNodeValue
        buf.append(t)
        solid += t.count(!_.isWhitespace)
      case org.w3c.dom.Node.ELEMENT_NODE =>
        val mark = solid
        var c = n.getFirstChild
        while (c != null) { walk(c); c = c.getNextSibling }
        if (mark == 0 && solid > 0) normAdd()
      case _ => // comments, PIs: apparatus
    }
    walk(doc.getDocumentElement)
    if (solid > 0) normAdd()
    out.result()
  }

  test("generator round trip: all 8 variants extract their hand-written blocks") {
    for (i <- 0 until 24) {
      val got = XmlExtractor.blocks(XmlGen.fileBytes(i))
      val exp = XmlGen.expectedDoc(i).map(_._2)
      assert(got == exp, s"variant $i")
    }
  }

  test("DOM twin parity on every well-formed variant") {
    // variant 5 carries an unescaped '<' (deliberately NOT well-formed
    // — the scanner's degrade path); every other variant must agree
    // with the JDK parser byte-for-byte
    for (i <- 0 until 24 if i % 8 != 5) {
      val bytes = XmlGen.fileBytes(i)
      assert(XmlExtractor.blocks(bytes) == domBlocks(bytes),
        s"variant $i")
    }
  }

  test("block rule pins: inline merge, leaf split, apparatus drops") {
    def bx(s: String) = XmlExtractor.blocks(s.getBytes(UTF_8))
    // mixed content merges into the container
    assert(bx("<p>re<em>mark</em>able</p>") == Vector("remarkable"))
    // leading sibling text makes the whole container one block
    assert(bx("<doc>intro <p>one</p></doc>") == Vector("intro one"))
    // trailing text after a flushed block is its own block
    assert(bx("<doc><p>one</p> outro</doc>") == Vector("one", "outro"))
    // leaves split; empty and whitespace-only elements vanish
    assert(bx("<r><a>A</a><b/><c>  </c><d>D</d></r>") == Vector("A", "D"))
    // attributes with '>' inside quotes; namespaces are just names
    assert(bx("<n:r note=\"a>b\"><n:i>x</n:i></n:r>") == Vector("x"))
    // mismatched end tag drops; EOF flushes the remainder
    assert(bx("<a><b>x</c>") == Vector("x"))
    // double-escaped entity decodes ONE level
    assert(bx("<a>&amp;lt;</a>") == Vector("&lt;"))
    // apparatus-only file yields nothing
    assert(XmlExtractor.blocks(XmlGen.fileBytes(7)).isEmpty)
    assert(XmlExtractor.blocks(Array.emptyByteArray).isEmpty)
  }

  test("encoding pins: XML-decl latin-1 and UTF-16 BOM decode correctly") {
    assert(XmlExtractor.blocks(XmlGen.fileBytes(3)) ==
      Vector("Élève très motivé 3"))
    assert(XmlExtractor.blocks(XmlGen.fileBytes(4)) ==
      Vector("Wide text payload 4."))
  }

  test("routing: feed .xml fans out entries; generic .xml is one doc; archive members extract") {
    // a feed-rooted .xml still goes through FeedExtractor (fan-out)
    val feed = ("<?xml version=\"1.0\"?><rss><channel><item>" +
      "<title>Entry title</title><guid>g1</guid>" +
      "</item></channel></rss>").getBytes(UTF_8)
    val fd = RawFiles.decodeAny("news.xml", feed, "")
    assert(fd.size == 1 && fd.head.doc_id.contains("#e0:g1"))
    // a generic .xml is ONE doc with block spans
    val gx = RawFiles.decodeAny("catalog_0000.xml", XmlGen.fileBytes(0), "")
    assert(gx.size == 1 &&
      gx.head.spans.map(_.text) == XmlGen.expectedDoc(0).map(_._2))
    // inside an archive: generic member extracts, feed member drops
    val zip = graft.gen.ArchiveGen.zipBytes(Seq(
      "doc.xml" -> XmlGen.fileBytes(0), "feed.xml" -> feed))
    val members = RawFiles.decodeAny("bundle.zip", zip, "")
    assert(members.map(_.doc_id) == Seq("bundle.zip#doc.xml"))
    assert(members.head.spans.map(_.text) ==
      XmlGen.expectedDoc(0).map(_._2))
  }

  test("mutation storm: corruption and truncation never crash the scanner") {
    val rnd = new scala.util.Random(20260818L)
    for (v <- 0 until 8; _ <- 0 until 40) {
      val b = XmlGen.fileBytes(v).clone()
      for (_ <- 0 until 6)
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      XmlExtractor.blocks(b) // must not throw
    }
    val base = XmlGen.fileBytes(2)
    for (_ <- 0 until 60)
      XmlExtractor.blocks(base.take(rnd.nextInt(base.length)))
  }
}
