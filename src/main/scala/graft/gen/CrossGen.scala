package graft.gen

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Cross-format duplicate corpus: each article is written EIGHT ways —
  * HTML page (with boilerplate the gate must strip), markdown post,
  * plain-text note, a MIME email, a generic XML document (DocBook-ish
  * title/para elements), a whole-file `.json` record (the text under
  * the Dolma `text` key), a legacy Word 97–2003 `.doc` (CFB piece
  * table), and a legacy PowerPoint `.ppt` deck (CFB text atom)
  * — carrying the SAME title and paragraphs. The ground truth for
  * `dd_cross_format`: after extraction into the one span vocabulary
  * and dedup-canonicalization ([[graft.ops.TextOps.canonicalText]]),
  * the eight renditions of an article collapse into ONE cluster;
  * `solo_*.txt` singletons stay alone. This is the engine's thesis in
  * one query — the interleaved span vocabulary makes corpus dedup
  * format-invariant even across the text/binary container boundary.
  */
object CrossGen {

  private def title(a: Int): String =
    s"Cross-Format Article $a Headline Title Line"
  private def para1(a: Int): String =
    s"The shared first paragraph of article $a reads identically in every rendition."
  private def para2(a: Int): String =
    s"A second shared paragraph closes article $a with the same words everywhere."

  def formats: Seq[String] =
    Seq("doc", "eml", "html", "json", "md", "ppt", "txt", "xml")

  def fileName(a: Int, fmt: String): String = f"art$a%04d.$fmt"
  def soloName(k: Int): String = f"solo$k%04d.txt"

  private def html(a: Int): String =
    s"""<html><head><title>ignored head title</title></head><body>
       |<nav><a href="/">Home</a> <a href="/x">More</a> menu bar</nav>
       |<p>${title(a)}</p>
       |<p>${para1(a)}</p>
       |<p>${para2(a)}</p>
       |<footer>site footer boilerplate</footer>
       |</body></html>""".stripMargin

  private def md(a: Int): String =
    s"# ${title(a)}\n\n${para1(a)}\n\n${para2(a)}\n"

  private def txt(a: Int): String =
    s"${title(a)}\n\n${para1(a)}\n\n${para2(a)}\n"

  /** No Subject header ON PURPOSE: the subject span would prefix
    * "Subject: " and break the cross-format text identity; identity
    * comes from the shared body.
    */
  private def eml(a: Int): String =
    s"From: writer$a@example.org\r\nTo: desk@example.net\r\n" +
    s"Message-ID: <cross$a@example.org>\r\nMIME-Version: 1.0\r\n" +
    "Content-Type: text/plain; charset=utf-8\r\n\r\n" +
    s"${title(a)}\r\n\r\n${para1(a)}\r\n\r\n${para2(a)}\r\n"

  /** DocBook-ish: each element is one block under the XmlExtractor
    * block rule, so the span sequence matches the md/txt renditions.
    */
  private def xml(a: Int): String =
    s"""<?xml version="1.0"?>
       |<article>
       |  <title>${title(a)}</title>
       |  <para>${para1(a)}</para>
       |  <para>${para2(a)}</para>
       |</article>
       |""".stripMargin

  /** One whole-file JSON record: the same text under the Dolma `text`
    * key (newlines JSON-escaped; the span decodes back to txt(a), so
    * the canonical identity holds through the .json front end too).
    */
  private def json(a: Int): String =
    s"""{"id": "art$a", "source": "cross", "text": "${title(a)}\\n\\n${para1(a)}\\n\\n${para2(a)}\\n"}"""

  def bytes(a: Int, fmt: String): Array[Byte] = fmt match {
    case "html" => html(a).getBytes(UTF_8)
    case "md"   => md(a).getBytes(UTF_8)
    case "txt"  => txt(a).getBytes(UTF_8)
    case "xml"  => xml(a).getBytes(UTF_8)
    case "json" => json(a).getBytes(UTF_8)
    case "doc"  => DocGen.simpleDocBytes(Seq(title(a), para1(a), para2(a)))
    case "ppt"  => PptGen.simpleDeckBytes(Seq(title(a), para1(a), para2(a)))
    case _      => eml(a).getBytes(UTF_8)
  }

  def write(dir: String, nArticles: Int, nSolo: Int): Unit = {
    Files.createDirectories(Paths.get(dir))
    (0 until nArticles).foreach { a =>
      formats.foreach { f =>
        Files.write(Paths.get(dir, fileName(a, f)), bytes(a, f)): Unit
      }
    }
    (0 until nSolo).foreach { k =>
      Files.write(Paths.get(dir, soloName(k)),
        s"Singleton note $k with its own unshared wording entirely."
          .getBytes(UTF_8)): Unit
    }
  }

  /** Ground truth: (doc_id, cluster_size, cluster_rep) — an article's
    * renditions cluster (rep = lexicographic min, the .doc), solos
    * stay singletons.
    */
  def expected(nArticles: Int, nSolo: Int): Seq[(String, Long, String)] = {
    val arts = (0 until nArticles).flatMap { a =>
      val ids = formats.map(fileName(a, _)).sorted
      ids.map(id => (id, ids.length.toLong, ids.min))
    }
    val solos = (0 until nSolo).map(k =>
      (soloName(k), 1L, soloName(k)))
    arts ++ solos
  }
}
