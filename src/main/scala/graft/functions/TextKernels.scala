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

  /** Kernel shared by interpreted eval and codegen (called per row). */
  def kernel(s: Any): Any = {
    val u = s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    // token fields: the same trim/lower/\s+ chain `ws` compiles to
    val t = u.trim().toLowerCase().toString
    val fields = TokensH60.Ws.split(t, -1)
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < fields.length) { distinct.add(fields(i)); i += 1 }
    // BPE-ish + punct counts: one code-point loop over the RAW text
    val raw = u.toString
    var nBpe = 0
    var nPunct = 0
    // 0 = boundary/ws, 1 = inside letter run, 2 = inside digit run
    var state = 0
    var j = 0
    while (j < raw.length) {
      val cp = raw.codePointAt(j)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) {
        if (state != 1) { nBpe += 1; state = 1 }
      } else if (cp >= '0' && cp <= '9') {
        if (state != 2) { nBpe += 1; state = 2 }
      } else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
          cp == '\f' || cp == '\r') {
        state = 0
      } else {
        nBpe += 1; nPunct += 1; state = 0
      }
      j += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](fields.length, distinct.size, nBpe, nPunct))
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
  * The kernel runs the SAME java.util.regex engine Spark's regexp_count /
  * regexp_replace use, with the same Patterns, so equality is by
  * construction — but in 5 passes + 3 short-circuit probes:
  * count+replace fuse into one Matcher loop for the email pass; the
  * ipv4/phone COUNTS scan the original text (counts are independent
  * per pattern — an IPv4 inside an email's domain is counted even though
  * the chained redaction has already removed it) while their REPLACES
  * scan the partially-redacted string, exactly like the chained
  * regexp_replace; `clean` only needs existence, so each audit probe
  * stops at the first hit instead of counting.
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
  def kernel(s: Any): Any = {
    import PiiScrub._
    val text = s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    // email: count + replace in one Matcher loop
    var nEmail = 0
    val sb = new java.lang.StringBuffer()
    val me = Email.matcher(text)
    while (me.find()) { nEmail += 1; me.appendReplacement(sb, "[EMAIL]") }
    me.appendTail(sb)
    val s1 = sb.toString
    // ipv4/phone counts run over the ORIGINAL text (independent counts);
    // their replaces run over the chain, like nested regexp_replace
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
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nEmail, nIpv4, nPhone,
        org.apache.spark.unsafe.types.UTF8String.fromString(s3), clean))
  }

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

  /** Kernel shared by interpreted eval and codegen (called per row). */
  def kernel(a: Any): Any = {
    val u = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val toks = TokensH60.Ws.split(u.trim().toLowerCase().toString, -1)
    val dim = weights.length
    var n = 0
    var w = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (!t.isEmpty) {
        n += 1
        w += weights((ClfMargin.poly131(t) % dim).toInt)
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
    * both engines). */
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
}
