package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}

/** Native Catalyst expression: the four per-document counting signals the
  * text-analysis family shares, in ONE pass —
  * `text_metrics(text)` returns
  * `struct(n_ws_tokens, n_distinct_tokens, n_bpe_tokens, n_punct)`.
  *
  * Replaces, per document:
  *   - `size(split(lower(trim(text)), '\s+'))` (regex split that
  *     materializes a Catalyst array just to be counted),
  *   - `size(array_distinct(ws))` (a second O(n) pass with per-element
  *     UTF8String equality),
  *   - `size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))`
  *     (a full regex scan materializing every BPE-ish token), and
  *   - `length(regexp_replace(text, '[A-Za-z0-9\s]', ''))` (builds an
  *     entire stripped string just to take its length)
  * — the four expressions that made ta02/ta03/ta08/cp01 the slowest
  * map-side queries at sf1.0.
  *
  * Exactness contract (each field is pinned equal to its expression form
  * by TextKernelsSpec):
  *   - `n_ws_tokens` / `n_distinct_tokens` replicate Spark's
  *     `split(lower(trim(text)), '\s+')` bit-for-bit by running the SAME
  *     compiled `\s+` Pattern.split (limit -1: trailing empty fields
  *     kept, empty input yields [""], a leading separator yields a
  *     leading "" field) on `UTF8String.trim` (ASCII space only) +
  *     `UTF8String.toLowerCase` — the exact operator chain `ws` compiles
  *     to. Distinct counts fields verbatim, empties included.
  *   - `n_bpe_tokens` counts matches of the alternation
  *     `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` over the RAW text without
  *     materializing them: a letter-run, a digit-run, or one non-alnum
  *     non-whitespace code point each count 1 — exactly the leftmost
  *     non-overlapping matches of the alternation (branches can never
  *     overlap: they partition the non-whitespace code points).
  *   - `n_punct` counts code points outside `[A-Za-z0-9\s]` — equal to
  *     `length(regexp_replace(text, '[A-Za-z0-9\s]', ''))` because
  *     `length` counts code points and the class only matches single
  *     code points. `\s` is Java regex whitespace: [ \t\n\x0B\f\r].
  */
case class TextMetrics(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_metrics expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_ws_tokens", IntegerType, nullable = false),
    StructField("n_distinct_tokens", IntegerType, nullable = false),
    StructField("n_bpe_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "text_metrics"

  /** Kernel shared by interpreted eval and codegen (called per row).
    * r12: both loops moved to BYTES — token fields from the shared
    * byte walk ([[TokensH60.fields]], distinct as byte-slice keys), and
    * the BPE/punct state machine over raw UTF-8: the classes are
    * ASCII-only, so every non-ASCII code point is one "other" token,
    * which is exactly one UTF-8 LEAD byte (continuation bytes leave the
    * already-reset state untouched). */
  def kernel(s: Any): Any = {
    val u = s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val fields = TokensH60.fields(u)
    val distinct =
      new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < fields.size()) { distinct.add(fields.get(i)); i += 1 }
    // BPE-ish + punct counts: one byte loop over the RAW text
    val raw = u.getBytes
    var nBpe = 0
    var nPunct = 0
    // 0 = boundary/ws/other, 1 = inside letter run, 2 = inside digit run
    var state = 0
    var j = 0
    while (j < raw.length) {
      val c = raw(j)
      if (c >= 0) {
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
          if (state != 1) { nBpe += 1; state = 1 }
        } else if (c >= '0' && c <= '9') {
          if (state != 2) { nBpe += 1; state = 2 }
        } else if (c == 0x20 || (c >= 0x09 && c <= 0x0D)) {
          state = 0
        } else {
          nBpe += 1; nPunct += 1; state = 0
        }
      } else if ((c & 0xC0) != 0x80) {
        nBpe += 1; nPunct += 1; state = 0
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](fields.size(), distinct.size, nBpe, nPunct))
  }

  override protected def nullSafeEval(a: Any): Any = kernel(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("textMetrics", this, classOf[TextMetrics].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: PII detect + redact + audit in one kernel —
  * `pii_scrub(text)` returns
  * `struct(n_email, n_ipv4, n_phone, redacted, clean)`.
  *
  * Column-program equivalent (what ta07 previously spelled out, NINE full
  * regex passes per document):
  *   n_email/n_ipv4/n_phone = regexp_count(text, P) for each pattern,
  *   redacted = regexp_replace(regexp_replace(regexp_replace(text,
  *                Email,'[EMAIL]'), Ipv4,'[IP]'), Phone,'[PHONE]'),
  *   clean = (sum of the three regexp_counts over `redacted`) == 0.
  *
  * The kernel computes the identical program with HAND-COMPILED matchers
  * over the original char data ([[PiiScrub.scan]], r10 verdict #5): the
  * three patterns are fixed, lookaround-free regular expressions, so
  * each is a direct char loop with java.util.regex's exact semantics
  * (fuzz-pinned against [[PiiScrub.scanRegex]], the retired 5-pass
  * Matcher form, in TextKernelsSpec). The chained replaces and the final
  * audit probes are span arithmetic on the ORIGINAL string — exact
  * because the replacement literals share no characters with any
  * pattern's alphabet (see the block comment in [[PiiScrub]]) — so the
  * whole detect+redact+audit runs in one structural pass per document
  * instead of 5 regex passes + 3 probes. The ipv4/phone COUNTS scan the
  * original text (counts are independent per pattern — an IPv4 inside
  * an email's domain is counted even though the chained redaction has
  * already removed it) while their REPLACES scan the post-redaction
  * segments, exactly like the chained regexp_replace.
  */
case class PiiScrub(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pii_scrub expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_email", IntegerType, nullable = false),
    StructField("n_ipv4", IntegerType, nullable = false),
    StructField("n_phone", IntegerType, nullable = false),
    StructField("redacted", StringType, nullable = false),
    StructField("clean", IntegerType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "pii_scrub"

  /** Kernel shared by interpreted eval and codegen (called per row). */
  def kernel(s: Any): Any =
    PiiScrub.scan(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override protected def nullSafeEval(a: Any): Any = kernel(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("piiScrub", this, classOf[PiiScrub].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiScrub {
  /** Canonical PII patterns (the kernel and ta07's oracle SQL share these
    * strings). Deliberately lookaround-free so Java regex (this kernel,
    * Spark's regexp_*) and RE2 (DuckDB) agree construct-for-construct. */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePat = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  private[functions] val Email = java.util.regex.Pattern.compile(EmailPat)
  private[functions] val Ipv4 = java.util.regex.Pattern.compile(Ipv4Pat)
  private[functions] val Phone = java.util.regex.Pattern.compile(PhonePat)

  // ------------------------------------------------------------------
  // Hand-compiled matchers (r10 verdict #5): the three patterns above,
  // implemented as direct char loops with java.util.regex's exact
  // semantics (leftmost start, greedy with backtracking, ASCII \b), so
  // the whole detect+redact+audit program runs in ONE structural pass
  // instead of 5 regex passes + 3 probes. Exactness is spec-pinned by
  // fuzzing against [[scanRegex]] (the retired java.util.regex form).
  //
  // Why span arithmetic on the ORIGINAL string is exact for the chained
  // replaces/probes: the replacement literals "[EMAIL]"/"[IP]"/"[PHONE]"
  // contain no digit, '@', '.', or '-', and every pattern's character
  // set excludes '[' and ']' — so a later-stage match can neither touch
  // a literal nor span across one, i.e. it lies entirely inside one
  // surviving original-text segment; and since '['/']' are non-word
  // chars, \b at a segment edge is exactly the string-edge rule. Each
  // stage therefore matches per segment on the original char data.
  // ------------------------------------------------------------------

  @inline private def isDigit(c: Char) = c >= '0' && c <= '9'
  @inline private def isAlpha(c: Char) =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  // Java \w (no UNICODE_CHARACTER_CLASS): [a-zA-Z_0-9]
  @inline private def isWord(c: Char) = isAlpha(c) || isDigit(c) || c == '_'
  @inline private def isLocal(c: Char) =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  @inline private def isDomainC(c: Char) =
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'

  /** Leftmost email match in cs[from,to) starting at or after `s0`,
    * packed as (start << 32) | end, or -1. A match starts at a local
    * char whose maximal local run (clamped at s0/from) ends exactly at
    * an '@' (the local class excludes '@', so `+` cannot backtrack past
    * it); the domain resolves greedily: the rightmost '.' inside the
    * maximal domain run that is followed by >= 2 alpha chars, the match
    * ending after that maximal alpha run. */
  private def findEmail(cs: String, from: Int, to: Int, s0: Int): Long = {
    var i = math.max(s0, from)
    var runStart = -1 // start of the current local-char run
    while (i < to) {
      val c = cs.charAt(i)
      if (c == '@') {
        if (runStart >= 0) {
          // domain run after '@'
          var e = i + 1
          while (e < to && isDomainC(cs.charAt(e))) e += 1
          if (e > i + 1) {
            // rightmost '.' in (i+1, e) followed by >= 2 alphas
            var d = e - 1
            var end = -1
            while (d > i + 1 && end < 0) {
              if (cs.charAt(d) == '.') {
                var a = d + 1
                while (a < e && isAlpha(cs.charAt(a))) a += 1
                if (a - d - 1 >= 2) end = a
              }
              if (end < 0) d -= 1
            }
            if (end >= 0) return (runStart.toLong << 32) | end.toLong
          }
        }
        runStart = -1
      } else if (isLocal(c)) { if (runStart < 0) runStart = i }
      else runStart = -1
      i += 1
    }
    -1L
  }

  /** \d{1,3} with greedy backtracking against a following literal: the
    * number of digits consumed at `p` such that the char after them is
    * `next` (longest of 3,2,1), or -1. */
  @inline private def octetBefore(cs: String, p: Int, to: Int, next: Char): Int = {
    var len = 0
    while (len < 3 && p + len < to && isDigit(cs.charAt(p + len))) len += 1
    while (len > 0 && !(p + len < to && cs.charAt(p + len) == next)) len -= 1
    len
  }

  /** Leftmost IPv4 match in cs[from,to) from `s0` (string-edge \b at
    * from/to), packed like [[findEmail]], or -1. */
  private def findIpv4(cs: String, from: Int, to: Int, s0: Int): Long = {
    var s = math.max(s0, from)
    while (s < to) {
      // leading \b then a digit
      if (isDigit(cs.charAt(s)) &&
          (s == from || !isWord(cs.charAt(s - 1)))) {
        var p = s
        var ok = true
        var k = 0
        while (k < 3 && ok) { // three "\d{1,3}\." groups
          val len = octetBefore(cs, p, to, '.')
          if (len == 0) ok = false else p += len + 1
          k += 1
        }
        if (ok) {
          // final \d{1,3}\b: greedy, shrink until the trailing char is
          // a non-word (or end)
          var len = 0
          while (len < 3 && p + len < to && isDigit(cs.charAt(p + len))) len += 1
          while (len > 0 && p + len < to && isWord(cs.charAt(p + len))) len -= 1
          if (len > 0) return (s.toLong << 32) | (p + len).toLong
        }
      }
      s += 1
    }
    -1L
  }

  /** Leftmost phone match (\b\d{3}-\d{3}-\d{4}\b, no backtracking) in
    * cs[from,to) from `s0`, packed, or -1. */
  private def findPhone(cs: String, from: Int, to: Int, s0: Int): Long = {
    var s = math.max(s0, from)
    while (s + 12 <= to) {
      if (isDigit(cs.charAt(s)) && (s == from || !isWord(cs.charAt(s - 1))) &&
          isDigit(cs.charAt(s + 1)) && isDigit(cs.charAt(s + 2)) &&
          cs.charAt(s + 3) == '-' &&
          isDigit(cs.charAt(s + 4)) && isDigit(cs.charAt(s + 5)) &&
          isDigit(cs.charAt(s + 6)) && cs.charAt(s + 7) == '-' &&
          isDigit(cs.charAt(s + 8)) && isDigit(cs.charAt(s + 9)) &&
          isDigit(cs.charAt(s + 10)) && isDigit(cs.charAt(s + 11)) &&
          (s + 12 == to || !isWord(cs.charAt(s + 12))))
        return (s.toLong << 32) | (s + 12).toLong
      s += 1
    }
    -1L
  }

  private type Finder = (String, Int, Int, Int) => Long

  /** All matches of `f` across the given segments, appended to `out` as
    * packed spans (find() semantics: next search resumes at match end). */
  private def collect(cs: String, segs: Array[Long], nSegs: Int, f: Finder,
      out: java.util.ArrayList[Long]): Unit = {
    var i = 0
    while (i < nSegs) {
      val a = (segs(i) >>> 32).toInt
      val b = (segs(i) & 0xffffffffL).toInt
      var s0 = a
      var m = f(cs, a, b, s0)
      while (m >= 0) {
        out.add(m)
        s0 = (m & 0xffffffffL).toInt
        m = f(cs, a, b, s0)
      }
      i += 1
    }
  }

  /** Split `segs` at the spans in `cut` (both sorted, spans inside
    * segments), returning the surviving sub-segments. */
  private def split(segs: Array[Long], nSegs: Int,
      cut: java.util.ArrayList[Long]): (Array[Long], Int) = {
    val out = new Array[Long](nSegs + cut.size())
    var n = 0
    var ci = 0
    var i = 0
    while (i < nSegs) {
      var a = (segs(i) >>> 32).toInt
      val b = (segs(i) & 0xffffffffL).toInt
      while (ci < cut.size() && ((cut.get(ci) & 0xffffffffL).toInt <= b) &&
          ((cut.get(ci) >>> 32).toInt >= a)) {
        val ca = (cut.get(ci) >>> 32).toInt
        val cb = (cut.get(ci) & 0xffffffffL).toInt
        if (ca > a) { out(n) = (a.toLong << 32) | ca.toLong; n += 1 }
        a = cb
        ci += 1
      }
      if (b > a) { out(n) = (a.toLong << 32) | b.toLong; n += 1 }
      i += 1
    }
    (out, n)
  }

  private def hasMatch(cs: String, segs: Array[Long], nSegs: Int,
      f: Finder): Boolean = {
    var i = 0
    while (i < nSegs) {
      if (f(cs, (segs(i) >>> 32).toInt, (segs(i) & 0xffffffffL).toInt,
        (segs(i) >>> 32).toInt) >= 0) return true
      i += 1
    }
    false
  }

  /** The full detect+redact+audit program over one document, span-based
    * (see the block comment above for why this equals the chained
    * regexp form). */
  def scan(text: String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val n = text.length
    val whole = Array((0L << 32) | n.toLong)

    // stage 1: email count+replace spans on the original text
    val emailSpans = new java.util.ArrayList[Long]()
    collect(text, whole, 1, findEmail, emailSpans)
    // independent counts on the ORIGINAL text
    var nIpv4 = 0
    var m = findIpv4(text, 0, n, 0)
    while (m >= 0) { nIpv4 += 1; m = findIpv4(text, 0, n, (m & 0xffffffffL).toInt) }
    var nPhone = 0
    m = findPhone(text, 0, n, 0)
    while (m >= 0) { nPhone += 1; m = findPhone(text, 0, n, (m & 0xffffffffL).toInt) }

    // stage 2: ipv4 replace spans over the post-email segments
    val (seg1, n1) = split(whole, 1, emailSpans)
    val ipSpans = new java.util.ArrayList[Long]()
    collect(text, seg1, n1, findIpv4, ipSpans)
    // stage 3: phone replace spans over the post-ipv4 segments
    val (seg2, n2) = split(seg1, n1, ipSpans)
    val phoneSpans = new java.util.ArrayList[Long]()
    collect(text, seg2, n2, findPhone, phoneSpans)
    val (seg3, n3) = split(seg2, n2, phoneSpans)

    // audit probes over the final segments (existence only)
    val clean = if (hasMatch(text, seg3, n3, findEmail) ||
      hasMatch(text, seg3, n3, findIpv4) ||
      hasMatch(text, seg3, n3, findPhone)) 0 else 1

    // assemble the redacted string: one walk over the disjoint sorted
    // span lists (merge by start offset)
    val sb = new java.lang.StringBuilder(n + 16)
    var pos = 0
    var ei = 0; var ii = 0; var pi = 0
    while (pos < n) {
      val es = if (ei < emailSpans.size()) (emailSpans.get(ei) >>> 32).toInt else Int.MaxValue
      val is = if (ii < ipSpans.size()) (ipSpans.get(ii) >>> 32).toInt else Int.MaxValue
      val ps = if (pi < phoneSpans.size()) (phoneSpans.get(pi) >>> 32).toInt else Int.MaxValue
      val nxt = math.min(es, math.min(is, ps))
      if (nxt == Int.MaxValue) { sb.append(text, pos, n); pos = n }
      else {
        if (nxt > pos) sb.append(text, pos, nxt)
        if (nxt == es) { sb.append("[EMAIL]"); pos = (emailSpans.get(ei) & 0xffffffffL).toInt; ei += 1 }
        else if (nxt == is) { sb.append("[IP]"); pos = (ipSpans.get(ii) & 0xffffffffL).toInt; ii += 1 }
        else { sb.append("[PHONE]"); pos = (phoneSpans.get(pi) & 0xffffffffL).toInt; pi += 1 }
      }
    }

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](emailSpans.size(), nIpv4, nPhone,
        org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString), clean))
  }

  /** The retired java.util.regex form (5 passes + 3 probes) — kept as
    * the spec's fuzz reference for [[scan]]'s hand matchers. */
  private[graft] def scanRegex(text: String): (Int, Int, Int, String, Int) = {
    var nEmail = 0
    val sb = new java.lang.StringBuffer()
    val me = Email.matcher(text)
    while (me.find()) { nEmail += 1; me.appendReplacement(sb, "[EMAIL]") }
    me.appendTail(sb)
    val s1 = sb.toString
    var nIpv4 = 0
    val mi0 = Ipv4.matcher(text)
    while (mi0.find()) nIpv4 += 1
    sb.setLength(0)
    val mi = Ipv4.matcher(s1)
    while (mi.find()) mi.appendReplacement(sb, "[IP]")
    mi.appendTail(sb)
    val s2 = sb.toString
    var nPhone = 0
    val mp0 = Phone.matcher(text)
    while (mp0.find()) nPhone += 1
    sb.setLength(0)
    val mp = Phone.matcher(s2)
    while (mp.find()) mp.appendReplacement(sb, "[PHONE]")
    mp.appendTail(sb)
    val s3 = sb.toString
    val clean =
      if (Email.matcher(s3).find() || Ipv4.matcher(s3).find() ||
        Phone.matcher(s3).find()) 0 else 1
    (nEmail, nIpv4, nPhone, s3, clean)
  }
}

/** Native Catalyst expression: hashed-feature linear-classifier
  * accumulation in ONE compiled pass — `clf_margin(text, weights)` with
  * `weights` a FOLDABLE `array<long>` of w_milli values (the model's
  * whole parameter set, shipped in-plan as a literal — ta13's
  * "broadcast the model" step). Returns `struct(n_tokens, w_milli)`:
  * every non-empty `\s+` token of lower(trim(text)) indexes the weight
  * array at `poly131(tok) mod len(weights)` and the margins sum in
  * exact integer millis.
  *
  * The feature hash is [[ClfMargin.poly131]] — `h = (h·131 + codepoint)
  * mod 1e9+7` — replacing the md5-based h60 that was ta13's measured
  * per-token hot loop at sf10 (r9 verdict #8): one multiply-add per
  * code point instead of an MD5 block round per token. Chosen for exact
  * oracle mirrorability:
  * `list_reduce(list_prepend(0, list_transform(
  *    regexp_extract_all(t, '.'), c -> ord(c))),
  *    (a, b) -> (a * 131 + b) % 1000000007)`
  * (DuckDB `ord` returns the code point, `.` matches one code point;
  * all intermediates stay far inside BIGINT). Hash-swap note: feature
  * ASSIGNMENT changes vs h60, but the model contract doesn't — weights
  * are data keyed by feature id, and the spec pins that the plan shape
  * is invariant to the hash family.
  */
case class ClfMargin(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) if right.foldable =>
        val w = right.eval(null)
        if (w == null)
          TypeCheckResult.TypeCheckFailure("clf_margin weights must not be NULL")
        else if (w.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .numElements() == 0)
          // dim == 0 would make the per-row `hash % dim` divide by zero at
          // execution time; reject at analysis like the NULL case
          TypeCheckResult.TypeCheckFailure("clf_margin weights must not be empty")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "clf_margin expects (string, foldable array<long>)")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("w_milli", org.apache.spark.sql.types.LongType,
      nullable = false)))
  override def prettyName: String = "clf_margin"

  @transient private lazy val weights: Array[Long] =
    right.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()

  /** Kernel shared by interpreted eval and codegen (called per row).
    * r12: byte-slice tokens from the shared walk ([[TokensH60.fields]]);
    * the poly131 fold decodes code points from the token's UTF-8 bytes
    * directly ([[ClfMargin.poly131Utf8]], fuzz-pinned ≡ the String
    * form) — the last kernel hot path that paid the UTF-16
    * decode + regex split per row. */
  def kernel(a: Any): Any = {
    val u = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val toks = TokensH60.fields(u)
    val dim = weights.length
    var n = 0
    var w = 0L
    var i = 0
    while (i < toks.size()) {
      val t = toks.get(i)
      if (t.numBytes() > 0) {
        n += 1
        w += weights((ClfMargin.poly131Utf8(t) % dim).toInt)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, w))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = kernel(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("clfMargin", this, classOf[ClfMargin].getName)
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.kernel($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ClfMargin {
  /** The cheap feature hash: polynomial 131 fold over CODE POINTS,
    * mod 1e9+7 (prime; every intermediate < 2^41, BIGINT/long-exact in
    * both engines). Reference form — the hot path runs
    * [[poly131Utf8]], spec-pinned equal. */
  def poly131(s: String): Long = {
    var h = 0L
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      h = (h * 131L + cp) % 1000000007L
      j += Character.charCount(cp)
    }
    h
  }

  /** [[poly131]] decoding the code points straight from the token's
    * UTF-8 bytes (no UTF-16 round-trip): 1/2/3/4-byte sequences fold to
    * the identical code points for valid UTF-8 — including astral ones,
    * which codePointAt also yields once. Fuzz-pinned ≡ [[poly131]] in
    * TextKernelsSpec.
    *
    * PRECONDITION (r12 ADVICE): the equivalence claim holds for VALID
    * UTF-8 only. Every producer in this engine feeds it UTF8String
    * tokens that originated as Spark strings (valid by construction);
    * on a truncated/invalid sequence (e.g. a raw `binary` cast) the
    * `j + k < b.length` guard folds the partial sequence as-is rather
    * than emitting U+FFFD the way String decoding would — a hash over
    * garbage-in stays deterministic but diverges from [[poly131]] of
    * the replacement-decoded String. Callers feeding untrusted bytes
    * must validate/replace first. */
  def poly131Utf8(t: org.apache.spark.unsafe.types.UTF8String): Long = {
    val b = t.getBytes
    var h = 0L
    var j = 0
    while (j < b.length) {
      val c = b(j) & 0xFF
      var cp = 0
      var len = 1
      if (c < 0x80) cp = c
      else if ((c & 0xE0) == 0xC0) { cp = c & 0x1F; len = 2 }
      else if ((c & 0xF0) == 0xE0) { cp = c & 0x0F; len = 3 }
      else { cp = c & 0x07; len = 4 }
      var k = 1
      while (k < len && j + k < b.length) {
        cp = (cp << 6) | (b(j + k) & 0x3F)
        k += 1
      }
      h = (h * 131L + cp) % 1000000007L
      j += len
    }
    h
  }
}

/** Native Catalyst expression: the engine's whitespace tokenizer as ONE
  * compiled pass — `tok_split(text)` returns the exact array
  * `split(lower(trim(text)), '\s+')` produces, without java.util.regex.
  *
  * Why it exists (r10 verdict #4 / SCALING round-11 ta14 note): the
  * probe-extraction floor under every explode-consumer of `ws` (ta09,
  * ta12, ta14, ta17's lexicon build, sp11) is the regex split itself —
  * measured 9.7 s of bare tokenize at sf10 before any join strategy
  * matters. `\s+` is a single character class; a byte scanner replicates
  * Pattern.split bit-for-bit with one branch per byte.
  *
  * Exactness contract (fuzz-pinned against the live Pattern.split in
  * TextKernelsSpec):
  *   - operates on `UTF8String.trim` (ASCII space only) +
  *     `UTF8String.toLowerCase` — the identical operator chain `ws`
  *     compiles to;
  *   - Java `\s` is ASCII-only ([ \t\n\x0B\f\r]); in UTF-8 those five
  *     code points appear ONLY as single bytes (every byte of a
  *     multi-byte sequence has the high bit set), so the byte scan can
  *     never split inside a multi-byte code point nor match a Unicode
  *     space Java's `\s` would not;
  *   - Pattern.split(limit -1) field structure: a leading separator
  *     yields a leading "" field (the `\s+` match has nonzero width, so
  *     the zero-width-at-start exemption never applies), a trailing
  *     separator yields a trailing "" field, and empty input yields
  *     [""] (no match → the input itself is the one field).
  */
case class TokSplit(child: Expression) extends UnaryExpression {

  import org.apache.spark.sql.types.ArrayType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tok_split expects string, got ${t.catalogString}")
  }

  // matches StringSplit's ArrayType(StringType, containsNull = false)
  // exactly (Spark 4.1.2 declares split's elements non-null — the kernel
  // below never emits a null element either), so consumers see the same
  // schema whether ws is the regex split or this
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "tok_split"

  /** Kernel shared by interpreted eval and codegen (called per row). */
  def kernel(a: Any): Any = {
    val u = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val t = u.trim().toLowerCase()
    val b = t.getBytes
    val n = b.length
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](16)
    var start = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == 0x20 || (c >= 0x09 && c <= 0x0D)) {
        out.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(b, start, i - start))
        i += 1
        while (i < n && {
          val d = b(i); d == 0x20 || (d >= 0x09 && d <= 0x0D) }) i += 1
        start = i
      } else i += 1
    }
    out.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(b, start, n - start))
    val arr = new Array[Any](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def nullSafeEval(a: Any): Any = kernel(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokSplit", this, classOf[TokSplit].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: every per-document signal the quality
  * GATE (ta08/cp01, plus ta02's subset) needs, in ONE tokenize pass —
  * `gate_stats(text, 'the,of,...|der,...', n)` returns
  * `struct(n_ws_tokens, n_punct, hits, n_grams, n_distinct)`.
  *
  * Replaces, per document, THREE separate kernels that each re-ran the
  * trim/lower/tokenize chain (the r12 sf10 gate floor):
  *   - `text_metrics(text)` for n_ws_tokens / n_punct (and computed a
  *     distinct-token HashSet and BPE-run count the gate never reads),
  *   - `stop_hits(text, spec)` for the per-language evidence counts,
  *   - `ngram_stats(text, n)` for the duplicate-gram counts (and
  *     tracked the top gram the gate never reads).
  *
  * Exactness contract (each field is pinned equal to its retired kernel
  * in TextKernelsSpec, fixtures + fuzz, codegen on/off):
  *   - `n_ws_tokens` = text_metrics.n_ws_tokens: field count of
  *     `split(lower(trim(text)), '\s+')` with limit -1 semantics,
  *     counted by the [[TokSplit]] byte scan (never materialized);
  *   - `n_punct` = text_metrics.n_punct: code points outside
  *     `[A-Za-z0-9\s]` over the RAW text — counted on the raw BYTES
  *     (ASCII classified directly; any non-ASCII code point is outside
  *     the ASCII-only class, so counting UTF-8 lead bytes ≡ counting
  *     code points);
  *   - `hits` = [stop_hits(text, spec)] element-for-element — but ONE
  *     hash probe per token against a word→list-bitmask map instead of
  *     one probe per (token × list);
  *   - `n_grams` / `n_distinct` = ngram_stats(text, n)'s fields with
  *     the NULL-when-fewer-than-n-tokens case folded to (0, 0): the
  *     gate branches on `n_grams > 0` (NOT a coalesce over 0/0, which
  *     ANSI mode rejects) and lands on the same 0.0 the legacy form's
  *     NULL propagation produced. Grams are
  *     UTF8String byte-slice windows joined by ' ' and counted in a
  *     HashSet — byte equality ≡ the retired form's String equality,
  *     with no UTF-16 decode and no per-gram StringBuilder;
  *   - n = 0 skips gram counting entirely (ta02's subset: the fields
  *     read are n_ws_tokens, n_punct, hits[0]).
  */
case class GateStats(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  import org.apache.spark.sql.types.{ArrayType, LongType}
  import org.apache.spark.unsafe.types.UTF8String

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != StringType || second.dataType != StringType ||
      !second.foldable || third.dataType != IntegerType || !third.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "gate_stats expects (string, foldable string list spec, foldable int n)")
    val spec = second.eval(null)
    if (spec == null)
      return TypeCheckResult.TypeCheckFailure(
        "gate_stats list spec must not be NULL")
    val lists = spec.toString.split("\\|", -1)
    if (lists.exists(_.isEmpty))
      return TypeCheckResult.TypeCheckFailure(
        "gate_stats list spec contains an empty list " +
          "(leading/trailing/doubled '|')")
    if (lists.length > 64)
      return TypeCheckResult.TypeCheckFailure(
        "gate_stats supports at most 64 lists (bitmask-probed)")
    val n = third.eval(null)
    if (n == null || n.asInstanceOf[Int] < 0)
      return TypeCheckResult.TypeCheckFailure(
        "gate_stats n must be a non-NULL non-negative int")
    TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_ws_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "gate_stats"

  @transient private lazy val nLists: Int =
    second.eval(null).toString.split("\\|", -1).length

  @transient private lazy val wordMask: java.util.HashMap[UTF8String, java.lang.Long] =
    StopHits.wordMask(second.eval(null).toString)

  @transient private lazy val gramN: Int = third.eval(null).asInstanceOf[Int]

  /** Kernel shared by interpreted eval and codegen (called per row). */
  def kernel(a: Any): Any = {
    val u = a.asInstanceOf[UTF8String]
    // n_punct: raw-byte loop (see the class scaladoc for the lead-byte
    // ≡ code-point argument)
    val rb = u.getBytes
    var nPunct = 0
    var p = 0
    while (p < rb.length) {
      val c = rb(p)
      if (c >= 0) {
        val alnum = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9')
        if (!alnum && c != 0x20 && (c < 0x09 || c > 0x0D)) nPunct += 1
      } else if ((c & 0xC0) != 0x80) nPunct += 1
      p += 1
    }
    // one token scan: the SHARED byte walk (TokensH60.fields — the
    // TokSplit semantics every token kernel runs). EVERY field is
    // bitmask-probed, empties included — [[StopHits]] probes empty
    // split fields too, and a spec may map the empty word — while only
    // non-empty tokens enter the gram window.
    val fields = TokensH60.fields(u)
    val counts = new Array[Int](nLists)
    val nTok = fields.size()
    val toks = new java.util.ArrayList[UTF8String](nTok)
    var i = 0
    while (i < nTok) {
      val tok = fields.get(i)
      StopHits.probe(wordMask, tok, counts)
      if (tok.numBytes() > 0) toks.add(tok)
      i += 1
    }
    // gram window over the non-empty tokens (gramN = 0 skips).
    // r12 ADVICE: distinct grams are counted as SLICE-SEQUENCE keys
    // ([[GateStats.Gram]]) instead of materializing one concatWs-copied
    // UTF8String per window — exact, not probabilistic: tokens contain
    // no whitespace (they are the split fields), so element-wise
    // equality of a gram's tokens ⟺ equality of the joined string the
    // old key was. Token hashes are computed once per token, not once
    // per (token × window).
    var nGrams = 0L
    var nDistinct = 0L
    if (gramN > 0 && toks.size() >= gramN) {
      nGrams = (toks.size() - gramN + 1).toLong
      val hashes = new Array[Int](toks.size())
      var t = 0
      while (t < toks.size()) { hashes(t) = toks.get(t).hashCode(); t += 1 }
      val seen = new java.util.HashSet[GateStats.Gram]()
      var g = 0
      while (g + gramN <= toks.size()) {
        seen.add(new GateStats.Gram(toks, hashes, g, gramN))
        g += 1
      }
      nDistinct = seen.size().toLong
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, nPunct,
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(counts),
        nGrams, nDistinct))
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = kernel(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("gateStats", this, classOf[GateStats].getName)
    nullSafeCodeGen(ctx, ev, (a, _, _) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.kernel($a);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GateStats {
  import org.apache.spark.unsafe.types.UTF8String

  /** HashSet key for a token n-gram WITHOUT materializing the joined
    * string: references `n` consecutive zero-copy token slices starting
    * at `start`, with per-token hashes precomputed once per row. Exact
    * (equals is element-wise byte equality), not a probabilistic hash —
    * see the kernel comment for the sequence-equality ⟺
    * concat-equality argument. */
  private[functions] final class Gram(
      val toks: java.util.ArrayList[UTF8String], val hashes: Array[Int],
      val start: Int, val n: Int) {
    override val hashCode: Int = {
      var h = 1
      var j = 0
      while (j < n) { h = h * 31 + hashes(start + j); j += 1 }
      h
    }
    override def equals(o: Any): Boolean = o match {
      case g: Gram =>
        if (g.n != n) false
        else {
          var j = 0
          var eq = true
          while (eq && j < n) {
            eq = toks.get(start + j).equals(g.toks.get(g.start + j))
            j += 1
          }
          eq
        }
      case _ => false
    }
  }
}

/** Native Catalyst expression: the classifier feature hash as a SCALAR —
  * `tok_hash131(tok)` returns [[ClfMargin.poly131]] of one token (the
  * polynomial-131 code-point fold mod 1e9+7, run over the UTF-8 bytes
  * via [[ClfMargin.poly131Utf8]]).
  *
  * Why it exists (round 15, the docfeats layer): [[ClfMargin]] fuses
  * tokenize+hash+lookup per DOCUMENT, which is right for direct serving
  * — but the vocabulary layer needs the hash of each DISTINCT token
  * exactly once (vocab-sized, not corpus-sized), so the per-token fold
  * must be addressable on its own. Pinned ≡ ClfMargin.poly131 in
  * DocFeatsSpec (fixtures + fuzz, codegen on/off). */
case class TokHash131(child: Expression) extends UnaryExpression {

  import org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tok_hash131 expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "tok_hash131"

  /** Kernel shared by interpreted eval and codegen (called per row). */
  def kernel(a: Any): Long =
    ClfMargin.poly131Utf8(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def nullSafeEval(a: Any): Any = kernel(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokHash131", this, classOf[TokHash131].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $self.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
