package graft.extract

import java.nio.charset.{Charset, StandardCharsets}

/** Crawl-grade character-set detection for text payloads.
  *
  * Web corpora are NOT all UTF-8: a large fraction of legacy HTML
  * declares (or silently uses) windows-1252, Shift_JIS, GBK, Big5,
  * EUC-KR, KOI8-R … . The reference never faces this — its UI accepts
  * curated uploads (streamlit_app.py:655-678) — but a 10^12-document
  * crawl ingest that decodes everything as UTF-8 turns every legacy
  * page into U+FFFD mojibake, which then poisons every downstream
  * stage (language ID, dedup shingles, LM scores).
  *
  * Detection priority follows the WHATWG HTML "determining the
  * character encoding" algorithm (a public spec), trimmed to the
  * signals available at rest:
  *
  *   1. BOM at byte 0 (UTF-8 / UTF-16LE / UTF-16BE) — authoritative,
  *      overrides every declaration (a BOM mid-file is content).
  *   2. Transport-declared charset — the HTTP `Content-Type`
  *      parameter a WARC record preserves.
  *   3. For HTML payloads: the meta prescan over the first
  *      [[PrescanWindow]] bytes (`<meta charset=…>` or
  *      `<meta http-equiv="content-type" content="…; charset=…">`).
  *   4. Whole-payload strict UTF-8 validity scan → UTF-8.
  *   5. windows-1252 — the web's legacy default (WHATWG maps the
  *      `latin1`/`ascii`/`iso-8859-1` labels there too, because that
  *      is what pages labeled latin-1 actually contain).
  *
  * Label mapping quirks implemented per the WHATWG encoding registry:
  * `iso-8859-1`/`ascii`/`x-user-defined` → windows-1252;
  * `shift_jis` → windows-31j (the superset real pages use);
  * `gb2312` → GBK; `big5` → Big5-HKSCS; `euc-kr` → windows-949;
  * a `utf-16*` label on byte content without a BOM → UTF-8 (the
  * declaration is unsatisfiable for the ASCII-compatible bytes the
  * prescan just read). Unknown labels fall through to steps 4-5 —
  * a lying or unsupported declaration can only degrade to the
  * sniffed default, never crash the scan.
  *
  * Scale: the prescan touches ≤1 KiB per document and the UTF-8
  * validity scan is one branch-light pass over bytes already in
  * memory inside the ingest `flatMap` — no extra I/O, no shuffle,
  * nothing leaves the scan task.
  */
object CharsetSniff {

  /** Meta-prescan window, per the WHATWG prescan (1024 bytes). */
  val PrescanWindow = 1024

  private val Win1252 = Charset.forName("windows-1252")

  /** WHATWG encoding-registry labels → JDK charset names. Only entries
    * whose JDK charset exists in every standard JVM; [[label]] still
    * guards with `Charset.isSupported` so an exotic JVM degrades to
    * the sniffed default instead of throwing.
    */
  private val Labels: Map[String, String] = Map(
    // UTF-8 family
    "utf-8" -> "UTF-8", "utf8" -> "UTF-8", "unicode-1-1-utf-8" -> "UTF-8",
    // the latin-1 lie: these pages are windows-1252 in practice, and
    // WHATWG codifies exactly that
    "windows-1252" -> "windows-1252", "cp1252" -> "windows-1252",
    "iso-8859-1" -> "windows-1252", "iso8859-1" -> "windows-1252",
    "iso_8859-1" -> "windows-1252", "latin1" -> "windows-1252",
    "l1" -> "windows-1252", "ascii" -> "windows-1252",
    "us-ascii" -> "windows-1252", "ansi_x3.4-1968" -> "windows-1252",
    "x-user-defined" -> "windows-1252",
    // other latin / central-european
    "iso-8859-2" -> "ISO-8859-2", "latin2" -> "ISO-8859-2",
    "windows-1250" -> "windows-1250",
    "iso-8859-15" -> "ISO-8859-15", "latin9" -> "ISO-8859-15",
    "iso-8859-4" -> "ISO-8859-4", "iso-8859-13" -> "ISO-8859-13",
    "iso-8859-16" -> "ISO-8859-16",
    "windows-1254" -> "windows-1254", "iso-8859-9" -> "windows-1254",
    "latin5" -> "windows-1254",
    "windows-1257" -> "windows-1257", "windows-1258" -> "windows-1258",
    // cyrillic
    "windows-1251" -> "windows-1251", "koi8-r" -> "KOI8-R",
    "koi8-u" -> "KOI8-U", "ibm866" -> "IBM866",
    "iso-8859-5" -> "ISO-8859-5",
    // greek / hebrew / arabic / thai
    "windows-1253" -> "windows-1253", "iso-8859-7" -> "ISO-8859-7",
    "windows-1255" -> "windows-1255", "iso-8859-8" -> "ISO-8859-8",
    "windows-1256" -> "windows-1256", "iso-8859-6" -> "ISO-8859-6",
    "windows-874" -> "x-windows-874", "tis-620" -> "x-windows-874",
    // japanese: WHATWG maps shift_jis to the windows-31j superset
    "shift_jis" -> "windows-31j", "shift-jis" -> "windows-31j",
    "sjis" -> "windows-31j", "x-sjis" -> "windows-31j",
    "ms_kanji" -> "windows-31j", "windows-31j" -> "windows-31j",
    "euc-jp" -> "EUC-JP", "x-euc-jp" -> "EUC-JP",
    "iso-2022-jp" -> "ISO-2022-JP",
    // chinese: gb2312 label means GBK on the real web (WHATWG)
    "gbk" -> "GBK", "gb2312" -> "GBK", "gb_2312" -> "GBK",
    "gb_2312-80" -> "GBK", "chinese" -> "GBK", "csgb2312" -> "GBK",
    "x-gbk" -> "GBK", "gb18030" -> "GB18030",
    "big5" -> "Big5-HKSCS", "big5-hkscs" -> "Big5-HKSCS",
    "cn-big5" -> "Big5-HKSCS", "x-x-big5" -> "Big5-HKSCS",
    // korean: the euc-kr label means the windows-949 superset (WHATWG)
    "euc-kr" -> "x-windows-949", "korean" -> "x-windows-949",
    "ks_c_5601-1987" -> "x-windows-949", "ksc_5601" -> "x-windows-949",
    "windows-949" -> "x-windows-949")

  /** Resolve a declared label to a decode charset. `utf-16*` labels on
    * BOM-less byte content resolve to UTF-8 (WHATWG: the declaration
    * cannot be true of the bytes the prescan just read as ASCII).
    * Unknown/unsupported labels → None (caller falls through to the
    * sniffed default).
    */
  def label(declared: String): Option[Charset] = {
    val l = declared.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'").trim.toLowerCase
    if (l.isEmpty) None
    else if (l.startsWith("utf-16") || l.startsWith("utf16") ||
             l.startsWith("ucs-2")) Some(StandardCharsets.UTF_8)
    else Labels.get(l) match {
      case Some(jdk) if Charset.isSupported(jdk) =>
        Some(Charset.forName(jdk))
      case _ => None
    }
  }

  /** BOM at byte 0 → (charset, bytes to skip). Mid-file BOMs are
    * content (same at-byte-0-only rule as the PDF/DOCX magic).
    */
  def bom(bytes: Array[Byte]): Option[(Charset, Int)] = {
    def b(i: Int): Int = bytes(i) & 0xff
    if (bytes.length >= 2 && b(0) == 0xFE && b(1) == 0xFF)
      Some((StandardCharsets.UTF_16BE, 2))
    else if (bytes.length >= 2 && b(0) == 0xFF && b(1) == 0xFE)
      Some((StandardCharsets.UTF_16LE, 2))
    else if (bytes.length >= 3 && b(0) == 0xEF && b(1) == 0xBB &&
             b(2) == 0xBF)
      Some((StandardCharsets.UTF_8, 3))
    else None
  }

  /** Meta prescan over the first [[PrescanWindow]] bytes: the declared
    * label of the first `<meta … charset=…>` whose label resolves.
    * The window is read as ISO-8859-1 (byte-transparent) — every
    * ASCII-compatible encoding renders its own declaration readably,
    * which is the premise the WHATWG prescan rests on. `<!-- -->`
    * comments are skipped so a commented-out declaration can't win.
    */
  def metaPrescan(bytes: Array[Byte]): Option[Charset] = {
    val n = math.min(bytes.length, PrescanWindow)
    if (n == 0) return None
    val head = new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
    val noComments = CommentRe.replaceAllIn(head, " ")
    MetaRe.findAllMatchIn(noComments)
      .flatMap(m => CharsetAttrRe.findFirstMatchIn(m.group(1))
        .flatMap(a => label(a.group(1))))
      .nextOption()
  }

  // `<meta …>` tag bodies; DOTALL so attribute lists may wrap lines
  private val MetaRe = "(?is)<meta\\b([^>]*)".r
  // charset=… either bare (HTML5) or inside a content="…" value;
  // the attr grammar stops at quote/space/;/> exactly like browsers'
  // prescan value extraction
  private val CharsetAttrRe =
    "(?i)charset\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s;\"'>]+)".r
  private val CommentRe = "(?s)<!--.*?(?:-->|$)".r

  /** Strict UTF-8 validity: rejects overlong forms, surrogates,
    * > U+10FFFF, truncated tails — the exact definition, not a
    * heuristic, so a windows-1252 page can only pass if it is pure
    * ASCII (in which case the two decodes agree anyway).
    */
  def validUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) i += 1
      else if (b0 < 0xC2) return false // continuation or overlong lead
      else if (b0 < 0xE0) { // 2-byte
        if (i + 1 >= n || (bytes(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (b0 < 0xF0) { // 3-byte
        if (i + 2 >= n) return false
        val b1 = bytes(i + 1) & 0xff
        val lo = if (b0 == 0xE0) 0xA0 else 0x80
        val hi = if (b0 == 0xED) 0x9F else 0xBF // ED A0.. = surrogates
        if (b1 < lo || b1 > hi || (bytes(i + 2) & 0xC0) != 0x80)
          return false
        i += 3
      } else if (b0 < 0xF5) { // 4-byte
        if (i + 3 >= n) return false
        val b1 = bytes(i + 1) & 0xff
        val lo = if (b0 == 0xF0) 0x90 else 0x80
        val hi = if (b0 == 0xF4) 0x8F else 0xBF // > U+10FFFF
        if (b1 < lo || b1 > hi || (bytes(i + 2) & 0xC0) != 0x80 ||
            (bytes(i + 3) & 0xC0) != 0x80) return false
        i += 4
      } else return false // F5..FF never valid
    }
    true
  }

  /** Decode a text payload by the full priority chain. `html` enables
    * the meta prescan; `transport` is the HTTP-header charset label a
    * WARC record carried ("" = absent).
    */
  def decode(bytes: Array[Byte], html: Boolean,
             transport: String = ""): String =
    bom(bytes) match {
      case Some((cs, skip)) =>
        new String(bytes, skip, bytes.length - skip, cs)
      case None =>
        val declared = label(transport)
          .orElse(if (html) metaPrescan(bytes) else None)
        declared match {
          case Some(cs) => new String(bytes, cs)
          case None =>
            if (validUtf8(bytes)) new String(bytes, StandardCharsets.UTF_8)
            else new String(bytes, Win1252)
        }
    }
}
