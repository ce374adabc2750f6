#!/usr/bin/env python3
"""Generate the committed font-aware RealPdf test fixtures (round 4).

Run from the repo root:  python3 tools/make_font_fixtures.py
Writes src/test/resources/fixture_font.pdf and fixture_cid.pdf.
Deterministic output (no timestamps, no randomness) so re-running
never dirties the working tree. Driver-side python only — the library
itself is pure Scala.

fixture_font.pdf — simple TrueType-style font:
  /FirstChar 65, /Widths [600 700 800] (codes A,B,C),
  /FontDescriptor /MissingWidth 350,
  /ToUnicode: bfrange <41><43> -> <0061> ("abc"), bfchar <44> -> U+20AC.
  Content pins: (ABCD) Tj  -> text "abc€", advance 24.5 @ 10pt;
                (A B) Tj with Tw 5 -> "a b", advance 21.5.

fixture_cid.pdf — composite /Type0 /Identity-H (the LaTeX/Chrome/Word
embedded-subset shape), /Resources inherited from the /Pages node:
  DescendantFonts CIDFontType2, /DW 1000, /W [1 [500 600 700] 5 6 800],
  dummy /FontFile2 (extraction never reads the glyf program),
  Flate-compressed /ToUnicode: 1->H 2->e 3->l 4->l 5->o, 6->"fi".
  Content pins: <000100020003> Tj -> "Hel" 21.6 @ 12pt;
  [<00040005> -250 <0006>] TJ -> "lo" then "fi" with 3pt kern gap;
  <0007> Tj -> U+FFFD at /DW.
"""
import zlib, os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources")


def build(objects, version=b"%PDF-1.5\n"):
    """objects: list of (num, body_bytes, stream_bytes_or_None)."""
    out = bytearray(version)
    offsets = {}
    for num, body, stream in objects:
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        if stream is not None:
            body = body.replace(b"{LEN}", str(len(stream)).encode())
            out += body + b"\nstream\n" + stream + b"\nendstream"
        else:
            out += body
        out += b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for num in sorted(offsets):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, xref_at))
    return bytes(out)


def simple_font():
    tounicode = (b"/CIDInit /ProcSet findresource begin\n"
                 b"12 dict begin begincmap\n"
                 b"1 begincodespacerange <00> <FF> endcodespacerange\n"
                 b"1 beginbfrange\n<41> <43> <0061>\nendbfrange\n"
                 b"1 beginbfchar\n<44> <20AC>\nendbfchar\n"
                 b"endcmap end end\n")
    content = (b"BT /F1 10 Tf 50 700 Td (ABCD) Tj ET\n"
               b"BT /F1 10 Tf 5 Tw 50 650 Td (A B) Tj ET\n")
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/MediaBox [0 0 612 792] >>", None),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>", None),
        (4, b"<< /Length {LEN} >>", content),
        (5, b"<< /Type /Font /Subtype /TrueType /BaseFont /AAAAAA+Fake "
            b"/FirstChar 65 /LastChar 67 /Widths [600 700 800] "
            b"/FontDescriptor 6 0 R /ToUnicode 7 0 R >>", None),
        (6, b"<< /Type /FontDescriptor /FontName /AAAAAA+Fake "
            b"/MissingWidth 350 /Flags 32 >>", None),
        (7, b"<< /Length {LEN} >>", tounicode),
    ]
    return build(objs)


def cid_font():
    tounicode_plain = (b"/CIDInit /ProcSet findresource begin\n"
                       b"12 dict begin begincmap\n"
                       b"1 begincodespacerange <0000> <FFFF> "
                       b"endcodespacerange\n"
                       b"2 beginbfchar\n"
                       b"<0001> <0048>\n"
                       b"<0006> <00660069>\n"
                       b"endbfchar\n"
                       b"2 beginbfrange\n"
                       b"<0002> <0002> <0065>\n"
                       b"<0003> <0005> [<006C> <006C> <006F>]\n"
                       b"endbfrange\n"
                       b"endcmap end end\n")
    tounicode = zlib.compress(tounicode_plain, 9)
    fontfile = zlib.compress(b"\x00\x01\x00\x00 not a real glyf table "
                             b"- extraction never reads it", 9)
    content = (b"BT /F1 12 Tf 40 560 Td <000100020003> Tj ET\n"
               b"BT /F1 12 Tf 40 540 Td [<00040005> -250 <0006>] TJ ET\n"
               b"BT /F1 12 Tf 40 520 Td <0007> Tj ET\n")
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
        # /Resources on the PARENT node: inherited by the page (§7.7.3.4)
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/MediaBox [0 0 400 600] "
            b"/Resources << /Font << /F1 5 0 R >> >> >>", None),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
        (4, b"<< /Length {LEN} >>", content),
        (5, b"<< /Type /Font /Subtype /Type0 /BaseFont /BBBBBB+FakeCID "
            b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
            b"/ToUnicode 9 0 R >>", None),
        (6, b"<< /Type /Font /Subtype /CIDFontType2 "
            b"/BaseFont /BBBBBB+FakeCID "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> "
            b"/DW 1000 /W [1 [500 600 700] 5 6 800] "
            b"/CIDToGIDMap /Identity /FontDescriptor 7 0 R >>", None),
        (7, b"<< /Type /FontDescriptor /FontName /BBBBBB+FakeCID "
            b"/Flags 4 /FontFile2 8 0 R >>", None),
        (8, b"<< /Length {LEN} /Filter /FlateDecode /Length1 64 >>",
            fontfile),
        (9, b"<< /Length {LEN} /Filter /FlateDecode >>", tounicode),
    ]
    return build(objs)


if __name__ == "__main__":
    for name, data in (("fixture_font.pdf", simple_font()),
                       ("fixture_cid.pdf", cid_font())):
        path = os.path.join(OUT, name)
        with open(path, "wb") as f:
            f.write(data)
        print(f"wrote {path} ({len(data)} bytes)")
