package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle expression.
  *
  * Semantically identical to the composed form
  * `array_distinct(transform(sequence(1, greatest(size(tokens)-n+1, 1)),
  * i => concat_ws(" ", slice(tokens, i, n))))`, but evaluated as ONE flat
  * Java pass per row. The composed form nests four interpreted higher-order
  * functions (HOFs never enter codegen and re-enter the interpreter per
  * element); profiling showed shingle construction dominating the dedup
  * pipelines at ~0.6 ms/doc — this expression is ~10× cheaper and is the
  * kind of kernel worth owning when shingling 10¹¹ documents.
  */
case class WordShingles(child: org.apache.spark.sql.catalyst.expressions.Expression,
                        n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects STRING, got ${child.dataType.sql}")

  @transient private lazy val ws = Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim
    val toks = ws.split(text)
    // LinkedHashSet dedupes in first-seen order; the non-distinct mode
    // (repetition metrics) keeps every occurrence
    val out: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String]()
      else new java.util.ArrayList[String]()
    if (toks.length <= n) {
      out.add(String.join(" ", toks: _*))
    } else {
      var i = 0
      val sb = new java.lang.StringBuilder()
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : WordShingles = copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

/** Native SimHash kernel: one flat Java pass per row — tokenize, distinct,
  * md5 per token (twice when `wide`), accumulate per-bit votes, assemble the
  * signature Long.
  *
  * Bit-for-bit identical to the composed HOF form in
  * [[graft.operators.Dedup.simhashHof]]/[[graft.operators.Dedup.simhash64Hof]]
  * (bit j votes +1 when hex nibble j of the token hash has its high bit set
  * — `instr('0123456789abcdef', nibble) >= 9`), which is what the DuckDB
  * oracle reproduces. The HOF form nests two interpreted fold passes per
  * row (HOFs never enter codegen); this kernel is the shape worth owning
  * when signing 10¹¹ documents. `wide = true` → 64 bits, the second 32 from
  * `md5('2#' || token)`; `wide = false` → the 32-bit variant.
  */
case class SimHashSignature(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    wide: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash expects STRING, got ${child.dataType.sql}")

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val md5 =
    // MessageDigest is not thread-safe; one per task thread
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def voteDigest(d: Array[Byte], votes: Array[Int], base: Int)
      : Unit = {
    // hex nibble j of the md5 string = high/low half of byte j/2; high bit
    // of the nibble set <=> nibble value >= 8
    var j = 0
    while (j < 32) {
      val b = d(j >> 1) & 0xFF
      val nib = if ((j & 1) == 0) b >> 4 else b & 0x0F
      votes(base + j) += (if (nib >= 8) 1 else -1)
      j += 1
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim
    val toks = new java.util.LinkedHashSet[String]()
    ws.split(text).foreach(toks.add)
    val bits = if (wide) 64 else 32
    val votes = new Array[Int](bits)
    val digest = md5.get()
    val it = toks.iterator()
    while (it.hasNext) {
      val t = it.next()
      digest.reset()
      voteDigest(digest.digest(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8)), votes, 0)
      if (wide) {
        digest.reset()
        voteDigest(digest.digest(
          ("2#" + t).getBytes(java.nio.charset.StandardCharsets.UTF_8)),
          votes, 32)
      }
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : SimHashSignature = copy(child = newChild)

  override def prettyName: String = if (wide) "simhash64" else "simhash32"
}

/** Native MinHash kernel: all `k` seeded signature mins in ONE flat pass
  * over the shingle array.
  *
  * Per seed `s`, the signature slot is the lexicographic MIN of
  * `md5("s|" || shingle)` hex strings — identical to the composed
  * `array_min(transform(sh, x => md5(concat('s|', x))))` chain (which the
  * DuckDB oracle mirrors), but the composed form runs k interpreted folds
  * per row. Digests are compared as unsigned byte arrays (hex encoding is
  * order-preserving), hex-rendered once per slot at the end.
  */
case class MinHashSigs(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs expects ARRAY<STRING>, got ${other.sql}")
    }

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    (0 until numHashes).map(s =>
      (s + "|").getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF; val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xFF
      out(2 * i) = hexChars(b >> 4)
      out(2 * i + 1) = hexChars(b & 0x0F)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](numHashes)
    val digest = md5.get()
    var i = 0
    while (i < n) {
      val shingleBytes = arr.getUTF8String(i).getBytes
      var s = 0
      while (s < numHashes) {
        digest.reset()
        digest.update(seedPrefixes(s))
        digest.update(shingleBytes)
        val d = digest.digest()
        if (mins(s) == null || unsignedLess(d, mins(s))) mins(s) = d
        s += 1
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var s = 0
    while (s < numHashes) {
      // empty shingle array: min of nothing is null-ish — render the md5 of
      // the empty-input sentinel never happens in practice (shingles always
      // yield >= 1 element); guard anyway
      out(s) = if (mins(s) == null) UTF8String.fromString("") else hex(mins(s))
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : MinHashSigs = copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

/** Native winnowing kernel: the whole fingerprint selection for one
  * document in a single flat pass — normalise, md5 every k-gram, sliding
  * window-min via a monotonic deque (O(n)), distinct the survivors.
  *
  * Semantically identical to the relational formulation
  * ([[graft.operators.TextAnalysis.winnowFingerprintSetRelational]]:
  * explode positions + window-min + distinct, which the DuckDB oracle
  * mirrors) but with ZERO shuffle: the winnowing window never crosses a
  * document, so exploding 1 row per character through a partition-wide
  * window sort is pure overhead — at 100 TB that is the difference between
  * a map-only pass and sorting 10¹² gram rows. Substrings are taken by
  * CODEPOINT (matching Spark's `substr` semantics on multibyte text).
  * Returns the distinct fingerprint set; empty array for docs shorter than
  * one full window.
  */
case class WinnowFingerprints(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints expects STRING, got ${child.dataType.sql}")

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xFF
      out(2 * i) = hexChars(b >> 4)
      out(2 * i + 1) = hexChars(b & 0x0F)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    // replicate the relational normalisation EXACTLY:
    // regexp_replace(trim(lower(text)), "\s+", " ") — Spark's trim strips
    // ONLY the space character (not \t/\n like Java's String.trim), and
    // lower is locale-independent
    val lowered = input.asInstanceOf[UTF8String].toLowerCase.toString
    var b = 0; var e = lowered.length
    while (b < e && lowered.charAt(b) == ' ') b += 1
    while (e > b && lowered.charAt(e - 1) == ' ') e -= 1
    val norm = ws.matcher(lowered.substring(b, e)).replaceAll(" ")
    // codepoint start offsets (UTF-16 indices) — substr-by-codepoint
    val ncp = norm.codePointCount(0, norm.length)
    if (ncp < k + w - 1) return new GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](ncp + 1)
    var ci = 0; var off = 0
    while (ci < ncp) {
      starts(ci) = off
      off += Character.charCount(norm.codePointAt(off))
      ci += 1
    }
    starts(ncp) = norm.length
    val ngrams = ncp - k + 1
    val digest = md5.get()
    val hashes = new Array[String](ngrams)
    var i = 0
    while (i < ngrams) {
      digest.reset()
      hashes(i) = hex(digest.digest(norm.substring(starts(i), starts(i + k))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    // monotonic deque sliding min over windows of w hashes
    val out = new java.util.LinkedHashSet[String]()
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < ngrams) {
      while (!deque.isEmpty && hashes(deque.peekLast()).compareTo(hashes(i)) >= 0)
        deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - w) deque.pollFirst()
      if (i >= w - 1) out.add(hashes(deque.peekFirst()))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : WinnowFingerprints = copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

/** Unicode NFC normalization (canonical composition): `e` + combining
  * acute → `é`, fullwidth/compatibility forms left alone (that is NFKC —
  * deliberately not done here, it is lossy). Crawled text mixes composed
  * and decomposed forms, so EVERY hash-keyed dedup (exact keys, shingles,
  * MinHash, fingerprints) silently misses duplicates until the corpus is
  * normalized — this is the first map-only pass of a text pipeline.
  * Wraps the JDK's `java.text.Normalizer` (Unicode-conformant, zero
  * dependencies); codegen emits the direct static call. External engines
  * agree because NFC is a Unicode standard, not an implementation choice
  * (the q99 oracle uses DuckDB's `nfc_normalize`).
  */
case class NfcNormalize(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : NfcNormalize = copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object TextFunctions {
  /** Unicode NFC normalization, native kernel. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  /** Distinct word n-gram shingles, native kernel. */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** ALL n-gram occurrences (repetition metrics need the duplicates). */
  def wordShinglesAll(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n,
      distinct = false))

  /** All k MinHash signature slots in one pass, native kernel. */
  def minhashSigs(shingleArray: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigs(ColumnBridge.expression(shingleArray),
      numHashes))

  /** Winnowing fingerprint set, native kernel. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w))

  /** SimHash signatures, native kernel. */
  def simhash32(text: Column): Column =
    ColumnBridge.column(SimHashSignature(ColumnBridge.expression(text),
      wide = false))
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHashSignature(ColumnBridge.expression(text),
      wide = true))
}
