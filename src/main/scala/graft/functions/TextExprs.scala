package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text expressions for the corpus-analysis hot path.
  *
  * The `functions`-only formulations (`size(filter(split(text, " "),
  * t => t.isin(...)))`, `aggregate(split(text, ""), …)`) are correct but
  * interpreted: array higher-order lambdas never enter whole-stage
  * codegen, so every document pays per-token lambda dispatch and a
  * materialized token array. These expressions make ONE pass over the
  * string per row via a compiled method referenced from generated code
  * (`ctx.addReferenceObj` — the standard pattern for config-carrying
  * builtins), allocating nothing but the candidate token strings.
  *
  * Semantics are pinned to the HOF forms bit-for-bit (TextAnalysis keeps
  * them as cross-checks; TextExprsSpec asserts equality), so the DuckDB
  * oracle parity of every downstream query is unchanged.
  */
object TextExprs {

  def tokenSetCount(text: Column, tokens: Seq[String]): Column =
    ColumnBridge.column(TokenSetCount(ColumnBridge.expression(text), tokens))

  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(text), markers))

  def rollingFp(text: Column): Column =
    ColumnBridge.column(RollingFpExpr(ColumnBridge.expression(text)))

  def bpeTokenCount(text: Column): Column =
    ColumnBridge.column(BpeCountExpr(ColumnBridge.expression(text)))

  def repetitionStats(text: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(text)))

  def termCounts(text: Column): Column =
    ColumnBridge.column(TermCountsExpr(ColumnBridge.expression(text)))

  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(text)))

  def winnow(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(text), k, w))

  def tokenCount(text: Column): Column =
    ColumnBridge.column(TokenCountExpr(ColumnBridge.expression(text)))

  def tokenStats(text: Column): Column =
    ColumnBridge.column(TokenStatsExpr(ColumnBridge.expression(text)))
}

/** Unicode NFC canonical composition (é from e + U+0301, etc.) as a
  * codegen'd expression — Spark has no builtin for it and a Scala UDF
  * would drop the whole normalize pipeline out of whole-stage codegen.
  * Fast path: `Normalizer.isNormalized` returns without allocating for
  * text that is already NFC — the overwhelming case in a real corpus,
  * so per-row cost is a scan, not a rewrite.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

/** Count of space-delimited tokens contained in `tokens` (duplicates
  * count; multi-space runs produce empty tokens that never match).
  * ≡ `size(filter(split(text, " "), t => t.isin(tokens: _*)))`.
  */
case class TokenSetCount(child: Expression, tokens: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    tokens.foreach(s.add)
    s
  }

  def compute(s: UTF8String): Int = {
    val str = s.toString
    var count = 0
    var start = 0
    while (start <= str.length) {
      var end = str.indexOf(' ', start)
      if (end < 0) end = str.length
      if (end > start && set.contains(str.substring(start, end))) count += 1
      start = end + 1
    }
    count
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSetCount", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
    copy(child = newChild)
  override def prettyName: String = "token_set_count"
}

/** Marker-hit argmax language ID ≡ the greatest(struct(score, -idx, lang))
  * over per-language [[TokenSetCount]]s: highest hit count wins, ties go
  * to the earliest language in `markers`, zero hits → "und". A token
  * appearing in several languages' marker lists scores for each (exactly
  * like the independent per-language filters).
  */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  @transient private lazy val langs: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val und = UTF8String.fromString("und")
  @transient private lazy val map: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    markers.zipWithIndex.foreach { case ((_, toks), idx) =>
      toks.foreach { t =>
        val prev = m.get(t)
        m.put(t, if (prev == null) Array(idx) else prev :+ idx)
      }
    }
    m
  }

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    val scores = new Array[Int](langs.length)
    var start = 0
    while (start <= str.length) {
      var end = str.indexOf(' ', start)
      if (end < 0) end = str.length
      if (end > start) {
        val hit = map.get(str.substring(start, end))
        if (hit != null) {
          var i = 0
          while (i < hit.length) { scores(hit(i)) += 1; i += 1 }
        }
      }
      start = end + 1
    }
    var bestIdx = 0
    var i = 1
    while (i < scores.length) {
      if (scores(i) > scores(bestIdx)) bestIdx = i
      i += 1
    }
    if (scores(bestIdx) > 0) langs(bestIdx) else und
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langId", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}

/** Count of BPE-ish pre-split tokens ≡ `size(filter(split(text,
  * "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"), t => t =!= ""))`: the
  * boundary-split yields one fragment per maximal [a-zA-Z0-9] run plus
  * one fragment per non-alphanumeric code point (adjacent boundaries
  * coincide, so no interior empties; edge empties are filtered). One
  * code-point pass instead of regex split + interpreted filter lambda.
  */
case class BpeCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  def compute(s: UTF8String): Int = {
    val str = s.toString
    var count = 0
    var inRun = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val alnum = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9')
      if (alnum) {
        if (!inRun) { count += 1; inRun = true }
      } else {
        count += 1
        inRun = false
      }
      i += Character.charCount(cp)
    }
    count
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCount", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
  override def prettyName: String = "bpe_token_count"
}

/** Rabin-Karp rolling fingerprint: fold h = (h*31 + codepoint) mod 1e9+7
  * over the character stream — ≡ `aggregate(filter(split(text, ""),
  * c => c =!= ""), 0L, (h, c) => (h*31 + ascii(c)) % 1000000007L)`
  * (empty-regex split advances by code point, `ascii` is the fragment's
  * code point).
  */
case class RollingFpExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingFp", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFpExpr =
    copy(child = newChild)
  override def prettyName: String = "rolling_fp"
}

/** Per-document repetition statistics in ONE string pass:
  * `struct(n_tokens, n_distinct, n_bigrams, top_bigram)` where tokens
  * are the single-space split fields (empties from multi-space runs
  * kept, exactly like `split(text, " ")` / DuckDB `string_split`),
  * bigrams are the n_tokens-1 adjacent pairs, and top_bigram is the
  * highest adjacent-pair frequency. ≡ the explode → two groupBys →
  * join formulation, but with zero shuffles: every statistic is a
  * function of a single row, which is the shape that survives 100 TB —
  * per-document metrics should never leave the scan task.
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false)))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val distinct = new java.util.HashSet[String]()
    val bigrams = new java.util.HashMap[String, Int]()
    var nTokens = 0
    var topBigram = 0
    var prev: String = null
    var start = 0
    while (start <= str.length) {
      var end = str.indexOf(' ', start)
      if (end < 0) end = str.length
      val tok = str.substring(start, end)
      nTokens += 1
      distinct.add(tok)
      if (prev != null) {
        val bg = prev + " " + tok
        val c = bigrams.getOrDefault(bg, 0) + 1
        bigrams.put(bg, c)
        if (c > topBigram) topBigram = c
      }
      prev = tok
      start = end + 1
    }
    InternalRow(nTokens, distinct.size(), nTokens - 1, topBigram)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repetitionStats", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

/** Per-document term frequencies in ONE string pass:
  * `array<struct<term, tf>>` over the single-space split fields
  * (empties kept), terms in first-occurrence order. ≡ `explode(split)`
  * → `groupBy(doc, term).count()` — but tf is a row-local fact, so
  * computing it inside the scan removes the full-corpus (doc, term)
  * shuffle that formulation pays; only genuinely corpus-wide
  * aggregates (document frequency) shuffle downstream.
  */
case class TermCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  def compute(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val counts = new java.util.LinkedHashMap[String, Int]()
    var start = 0
    while (start <= str.length) {
      var end = str.indexOf(' ', start)
      if (end < 0) end = str.length
      val tok = str.substring(start, end)
      counts.put(tok, counts.getOrDefault(tok, 0) + 1)
      start = end + 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termCounts", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermCountsExpr =
    copy(child = newChild)
  override def prettyName: String = "term_counts"
}

/** Winnowing document fingerprints (Schleimer et al., SIGMOD 2003) in
  * ONE pass per document: k-token gram md5s, a rightmost-min sliding
  * window of w grams, distinct selections out as
  * `array<struct<fp_pos int, fp string>>`. Every selection is a
  * function of the document's own tokens, so the whole operator is a
  * scan-side map — the r10 formulation shuffled the exploded gram
  * table on doc_id just to run a per-doc window and then paid a second
  * exchange for the distinct; per-document fingerprints should never
  * leave the scan task at any scale. Semantics pinned bit-for-bit to
  * the windowed form (DedupSpec equivalence test): grams are
  * end-capped slices (`slice(tk, pos, k)`), only full windows select
  * (pos ≤ max(ng−w+1, 1)), and ties on equal md5 pick the RIGHTMOST
  * gram — the winnowing rule that makes selections position-stable
  * across document edits.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be positive, got k=$k w=$w")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("fp_pos", IntegerType, nullable = false),
    StructField("fp", StringType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    val b = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((b(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def compute(s: UTF8String): GenericArrayData = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length
    val ng = math.max(n - k + 1, 1)
    val md = WinnowExpr.digest.get()
    md.reset()
    val hashes = new Array[String](ng)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < ng) {
      sb.setLength(0)
      val end = math.min(i + k, n)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      hashes(i) = md5Hex(md, sb.toString)
      i += 1
    }
    // windows start at 0-based p0 ∈ [0, max(ng−w+1,1)); rightmost-min
    // via a monotonic deque: each gram enters once and is evicted at
    // most once, so the whole selection pass is O(ng) instead of the
    // O(ng·w) rescans of the per-window loop. The back-pop condition
    // `back >= incoming` evicts equal-hash grams in favor of the new
    // (righter) one, which is exactly the rightmost-tie rule that makes
    // winnowing selections position-stable across document edits.
    val sel = new java.util.LinkedHashSet[Integer]()
    val lastP0 = math.max(ng - w + 1, 1) - 1
    val deque = new Array[Int](ng)
    var head = 0
    var tail = 0 // deque holds indices in [head, tail)
    var q = 0
    var p0 = 0
    while (p0 <= lastP0) {
      val wend = math.min(p0 + w, ng)
      while (q < wend) {
        while (tail > head && hashes(deque(tail - 1)).compareTo(hashes(q)) >= 0)
          tail -= 1
        deque(tail) = q
        tail += 1
        q += 1
      }
      while (deque(head) < p0) head += 1
      sel.add(deque(head))
      p0 += 1
    }
    val out = new Array[Any](sel.size())
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) {
      val b = it.next().intValue()
      out(o) = InternalRow(b + 1, UTF8String.fromString(hashes(b)))
      o += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprints"
}

object WinnowExpr {
  /** One digest per executor thread (BootstrapExprs precedent) — a
    * provider lookup per document is measurable overhead on
    * multi-million-doc scans.
    */
  private[functions] val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** Space-split token count in one byte scan — ≡ `size(split(text, ' '))`
  * (= number of 0x20 bytes + 1; a space byte never occurs inside a
  * UTF-8 multibyte sequence, and split-with-limit−1 keeps trailing
  * empties, so segments = separators + 1 always). Replaces a regex
  * split that materialized the full token array just to count it
  * (r15, guide §4). TextExprsSpec pins ≡ the split form.
  */
case class TokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  def compute(s: UTF8String): Int = {
    val n = s.numBytes
    var count = 1
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) count += 1
      i += 1
    }
    count
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenCount", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
  override def prettyName: String = "token_count"
}

/** Token count + distinct token count in ONE pass —
  * ≡ struct(size(split(text, ' ')), size(array_distinct(split(text,
  * ' ')))). The Gopher-gate family evaluates both over the same split;
  * the HOF form re-splits per use and hashes a materialized token
  * array (measured ~1.2 s per 5k-doc gate pass at sf0.1). Empty
  * tokens (consecutive/leading/trailing spaces) count like split's.
  * TextExprsSpec pins ≡ the split forms.
  */
case class TokenStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val seen = new java.util.HashSet[String]()
    var nTok = 0
    var start = 0
    val len = str.length
    while (start <= len) {
      var end = str.indexOf(' ', start)
      if (end < 0) end = len
      nTok += 1
      seen.add(str.substring(start, end))
      start = end + 1
    }
    InternalRow(nTok, seen.size)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStats", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "token_stats"
}
