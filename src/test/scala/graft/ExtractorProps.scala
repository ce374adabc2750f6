package graft

import graft.core.{InputDoc, Span}
import graft.extract.Extractor
import graft.oracle.RefOracle
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property suite (ScalaCheck runs natively under sbt test): the
  * extractor and the oracle agree — and are total — on ARBITRARY inputs,
  * not just generator-shaped ones (SURVEY.md §5 property plan).
  */
object ExtractorProps extends Properties("Extractor") {

  private val genKind: Gen[String] = Gen.frequency(
    3 -> Gen.const("pdf"), 2 -> Gen.const("html"), 2 -> Gen.const("text"),
    1 -> Gen.const("image"), 1 -> Gen.const("video"),
    1 -> Gen.const("audio"), 1 -> Gen.alphaStr.map(_.take(8)))

  // payloads: anything — valid-ish content streams, random unicode, noise
  private val genPayload: Gen[String] = Gen.frequency(
    2 -> Gen.const(null),
    3 -> Gen.asciiPrintableStr.map(_.take(200)),
    3 -> {
      val genTx = for {
        x <- Gen.choose(-50.0, 700.0); y <- Gen.choose(-50.0, 800.0)
        w <- Gen.choose(-5.0, 200.0); h <- Gen.choose(0.0, 20.0)
        t <- Gen.asciiPrintableStr.map(_.take(20))
      } yield s"TX $x $y $w $h $t"
      val genLine: Gen[String] = Gen.oneOf(
        Gen.const("PG 612 792"), Gen.const("PG 0 nan"), genTx,
        // pinned edge tokens (ADVICE r01): bare "PG" is malformed, "PG "
        // opens a default page, NaN coords make a TX line malformed
        Gen.const("PG"), Gen.const("PG "),
        Gen.const("TX NaN 1 2 3 nan-x"), Gen.const("TX 1 NaN 2 3 nan-y"),
        Gen.asciiPrintableStr.map(_.take(40))).flatMap(g => g)
      Gen.listOf(genLine).map(_.mkString("\n"))
    },
    2 -> Gen.listOf(Gen.oneOf(
           "<p>", "</p>", "<nav>", "</nav>", "<a href=x>", "</a>",
           "<div>", "</div>", "<!--", "-->", "plain words here and there",
           "&amp;", "&lt;tag&gt;", "中文 ünïcode ", "<", ">", "<p/>",
           // raw-text + numeric-entity rule stressors (r04)
           "<script>", "</script>", "<SCRIPT>", "<style>", "</style>",
           "<script/>", "&#65;", "&#x41;", "&#", "&#;", "&#xD800;",
           "&#38;lt;", "&#99999999;",
           // html media-span rule stressors (r05): every attribute-
           // grammar edge from the HtmlExtractor scaladoc
           "<img src=a.png>", "<img src=\"a b.png\">", "<img src='q.png'>",
           "<img src>", "<img src=>", "<img src=\"\">",
           "<img data-src=no.png>", "<img alt=\"src=trap.png\" src=real.png>",
           "<img src=x/>", "<img src=\"a&amp;b.png\">",
           "<img src=\"untermin", "<img src='half",
           "<video>", "</video>", "<audio>", "</audio>", "<video/>",
           "<source src=s.mp4>", "<video src=v.mp4>", "<audio src=a.mp3>",
           "<img/src=weird>", "<img = src=y.png>", "<IMG SRC=UP.PNG>",
           "<source>", "<img src=&#120;.png>"
         )).map(_.mkString(" ")),
    1 -> Gen.stringOf(Gen.oneOf('\n', '\t', ' ', 'a', '\\', '<', '&',
           '中', '€', '\u3000', '\u2028')).map(_.take(300)))

  private val genSpan: Gen[Span] = for {
    kind <- genKind
    text <- genPayload
    media <- Gen.oneOf(
      Gen.const(null.asInstanceOf[String]),
      Gen.identifier.map("m://" + _)).flatMap(g => g)
    offset <- Gen.choose(-3, 50)
  } yield Span(kind, text, media, offset)

  private val genDoc: Gen[InputDoc] = for {
    id <- Gen.identifier.map(_.take(12))
    spans <- Gen.listOf(genSpan).map(_.take(12))
  } yield InputDoc(id, spans.toVector)

  private def key(d: InputDoc) =
    Extractor.extract(d).outSpans.map(o => (o.kind, o.text, o.media_ref, o.order))

  property("dual-implementation equality on arbitrary docs") =
    forAll(genDoc) { d =>
      key(d) == RefOracle.extract(d).outSpans
        .map(o => (o.kind, o.text, o.media_ref, o.order))
    }

  property("chunks equality on arbitrary docs") =
    forAll(genDoc) { d =>
      Extractor.extract(d).chunks == RefOracle.extract(d).chunks
    }

  property("permutation invariance of span order") =
    forAll(genDoc, Gen.long) { (d, seed) =>
      val r = new scala.util.Random(seed)
      val shuffled = d.copy(spans =
        if (d.spans == null) null else r.shuffle(d.spans))
      key(d) == key(shuffled)
    }

  property("order is a dense 0-based sequence") =
    forAll(genDoc) { d =>
      val orders = Extractor.extract(d).outSpans.map(_.order)
      orders == orders.indices.toVector.map(identity)
    }

  // dense pages (> 128 runs) take Layout's grid-pruned clustering path —
  // pin its equivalence with the oracle's fixpoint algorithm directly
  private val genDensePage: Gen[InputDoc] = for {
    n <- Gen.choose(130, 220)
    lines <- Gen.listOfN(n, for {
      x <- Gen.choose(0, 600); y <- Gen.choose(0, 780)
      w <- Gen.choose(0, 120); h <- Gen.oneOf(0, 2, 8, 10, 12, 40)
      t <- Gen.alphaNumStr.map(s => if (s.isEmpty) "t" else s.take(6))
    } yield s"TX $x $y $w $h $t")
  } yield InputDoc("dense",
    Vector(Span("pdf", ("PG 612 792" :: lines).mkString("\n"), null, 0)))

  property("grid clustering == fixpoint oracle on dense pages") =
    forAll(genDensePage) { d =>
      Extractor.extract(d).chunks == RefOracle.extract(d).chunks &&
      key(d) == RefOracle.extract(d).outSpans
        .map(o => (o.kind, o.text, o.media_ref, o.order))
    }
}
