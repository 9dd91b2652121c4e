package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen twins of the engine's hot text kernels.
  *
  * The Column formulations they replace are built-in higher-order
  * functions (`transform`/`filter`), which Spark evaluates INTERPRETED —
  * they break whole-stage codegen, box every element, and (the killer)
  * re-evaluate any non-attribute subtree inside the lambda once PER
  * ELEMENT: `shingles`' old `transform(sequence(..), i -> concat_ws(" ",
  * slice(toks, i, n)))` re-tokenized the whole document for every
  * shingle, O(tokens²) per row. These expressions do the same work in
  * one tight JVM pass per row and keep the surrounding plan inside
  * whole-stage codegen.
  *
  * Each is pinned bit-for-bit against its Column twin in
  * KernelParitySpec, so the DuckDB oracles built on the old chains hold
  * unchanged — a pure execution-tier swap, like [[PortableHash60Expr]]
  * and [[VecDot]].
  */
object TextKernels {

  /** Same regex the Column chain passed to `split` (java.util.regex in
    * both paths — StringSplit routes through UTF8String.split, which
    * compiles the pattern per call; here it's compiled once). */
  private val Ws = Pattern.compile("\\s+")

  /** Null-element guard for kernels whose math has no null story: a null
    * token would NPE at .getBytes (or emit a null shingle into a
    * containsNull=false output) — fail with a MESSAGE instead, the
    * ANSI-abort posture. The pipelines feed these kernels from
    * tokenize_ws/word_shingles, which never emit nulls; a null element
    * means foreign data (parquet round-trips surface element nullability
    * as true) and must not be silently hashed or dropped. */
  private def nonNull(s: UTF8String, kernel: String): UTF8String = {
    if (s == null) throw new IllegalArgumentException(
      s"$kernel: null array element — graft text kernels require non-null tokens")
    s
  }

  /** tokenize_ws(text) == filter(split(lower(trim(text)), "\\s+"),
    * t -> t != ""). Uses the SAME UTF8String trim/toLowerCase the
    * built-in StringTrim/Lower call, then the cached pattern. */
  def tokenize(s: UTF8String): ArrayData = {
    val parts = Ws.split(s.trim().toLowerCase().toString, -1)
    var n = 0
    var i = 0
    while (i < parts.length) { if (!parts(i).isEmpty) n += 1; i += 1 }
    val out = new Array[AnyRef](n)
    var j = 0
    i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) { out(j) = UTF8String.fromString(parts(i)); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  private val Space = UTF8String.fromString(" ")

  /** word_shingles(toks, n) == transform(sequence(1, size-n+1),
    * i -> concat_ws(" ", slice(toks, i, n))); empty when size < n. */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    // n <= 0 would pass the len<n guard and index past the array end
    if (n <= 0 || len < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var s = nonNull(toks.getUTF8String(i), "word_shingles")
      var j = 1
      while (j < n) {
        s = UTF8String.concat(s, Space, nonNull(toks.getUTF8String(i + j), "word_shingles"))
        j += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The GPT-2-style pre-tokenization split t10 shares verbatim with its
    * DuckDB oracle: letter runs | digit runs | single non-alnum-non-ws. */
  // the whitespace class is spelled out because Java \\s and DuckDB
  // RE2 \\s disagree on exactly one char: vertical tab \\x0B (Java
  // includes it, RE2 does not) — with bare \\s a VT in the text would
  // be skipped here but counted as punct by the oracle, a hash mismatch.
  // [\\t\\n\\f\\r ] IS RE2's \\s, so both engines see one partition.
  private val BpePat = Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\t\\n\\f\\r ]")

  /** bpe_class_counts(text) → struct(n, alpha, digit, punct): one
    * matcher pass replacing FOUR regexp_extract_all evaluations plus
    * three interpreted filter+rlike passes. Classification is the
    * match's first character (the classes partition: a match never
    * starts with whitespace), identical to rlike("^[A-Za-z]") etc. on
    * the extracted token. */
  def bpeClassCounts(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val subject = s.toString
    val m = BpePat.matcher(subject)
    var n = 0
    var alpha = 0
    var digit = 0
    var punct = 0
    while (m.find()) {
      n += 1
      val c = subject.charAt(m.start())
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha += 1
      else if (c >= '0' && c <= '9') digit += 1
      else punct += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(n, alpha, digit, punct)
  }

  /** array_max_count(arr): the multiplicity of the most-repeated element
    * — one hash-map pass. Equals array_max(transform(array_distinct(a),
    * t -> size(filter(a, x -> x = t)))) for non-empty input, which is
    * O(distinct × n) with an interpreted filter scan per distinct
    * element. Returns 0 on empty input where the chain gives null —
    * call sites guard with when(size(a) > 0, ...) to keep parity total. */
  def maxCount(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      // null elements count 0, matching the Column twin: its filter
      // predicate `x = t` is NULL for null elements and drops them, so
      // counting nulls here would silently out-vote real tokens
      if (t != null) {
        val c = counts.merge(t, 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  /** sig_agree(a, b): positions where both signatures are non-null and
    * equal — the numerator of the MinHash similarity estimate. Equals
    * size(filter(zip_with(a, b, (x, y) -> x = y), p -> p)): null-vs-
    * anything compares null and is dropped by the filter; length
    * mismatch zip-pads with null, contributing nothing. */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        agree += 1
      i += 1
    }
    agree
  }

  // per-k cache of the seed prefix bytes ("0:".."k-1:"); k is a plan
  // constant so this holds one entry in practice
  @volatile private var prefixCache: (Int, Array[Array[Byte]]) = null

  private def prefixes(k: Int): Array[Array[Byte]] = {
    val c = prefixCache
    if (c != null && c._1 == k) return c._2
    val p = Array.tabulate(k)(seed =>
      (seed.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    prefixCache = (k, p)
    p
  }

  private val SimhashPrefix = "t:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** portable_simhash60(toks): the 60-bit SimHash vote —
    * h = md5-60("t:" ++ token) once per token, each bit position
    * accumulates +1 if set else −1, final bit = (count > 0). Equals the
    * SQL-lambda chain in TextFunctions.simhashPortable60, whose per-bit
    * CASE recomputed the hash 60× per token under interpreted eval. */
  def simhash(toks: ArrayData): Long = {
    val counts = new Array[Int](60)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = PortableHash60Expr.hashBytes(SimhashPrefix,
        nonNull(toks.getUTF8String(i), "portable_simhash60").getBytes)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) != 0L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) sh |= 1L << b
      b += 1
    }
    sh
  }

  /** xx_minhash64(shingles, k): the engine-native (100 TB configuration)
    * MinHash signature — per seed s in [0, k), the minimum over the
    * array of `xxhash64(shingle, s)`. Spark's multi-arg xxhash64 chains
    * the running hash (h1 = hash(shingle, 42); h2 = hash(s, h1)), so the
    * string part is seed-INDEPENDENT: this kernel hashes each shingle's
    * bytes once and folds k O(1) int-hash steps — k× less string
    * hashing than the Column chain, same values (same public
    * XxHash64Function entry points, KernelParitySpec pins it). */
  def minhashXx(sh: ArrayData, k: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(new Array[AnyRef](k))
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = nonNull(sh.getUTF8String(i), "xx_minhash64")
      // the same public entry the interpreted XxHash64 expression folds
      // through, with the same (value, type, running-seed) sequence
      val h1 = XxHash64Function.hash(s, StringType, 42L)
      var seed = 0
      while (seed < k) {
        val h2 = XxHash64Function.hash(seed, IntegerType, h1)
        if (h2 < mins(seed)) mins(seed) = h2
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  private val WinnowPrefix = "win:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** winnow_fps(shingles, w): the winnowing fingerprint set (Schleimer,
    * Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
    * Fingerprinting", SIGMOD'03). Hash each shingle with the portable
    * 60-bit kernel (prefix "win:", DuckDB-reproducible), slide a
    * w-window over the hash sequence, select each full window's minimum,
    * return the distinct selected values. Guarantees any shared token
    * run long enough to span one full window (w + shingle_k − 1 tokens)
    * contributes at least one common fingerprint — the partial-overlap /
    * containment detection that whole-document hashing and whole-document
    * MinHash signatures both miss. Value-equal to
    * `list_distinct(list_transform(range(1, n−w+2), i ->
    * list_min(list_slice(hs, i, i+w−1))))` (the DuckDB twin); the
    * classic rightmost-tie POSITION rule only matters for positional
    * fingerprints and cannot change the distinct value set. Empty when
    * fewer than w shingles (no full window). One O(n) pass: the running
    * window minimum is carried forward and rescanned only when it falls
    * out of the window (amortized O(1) per slide). */
  def winnowFps(sh: ArrayData, w: Int): ArrayData = {
    val n = sh.numElements()
    if (n < w) return new GenericArrayData(Array.empty[AnyRef])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = PortableHash60Expr.hashBytes(WinnowPrefix,
        nonNull(sh.getUTF8String(i), "winnow_fps").getBytes)
      i += 1
    }
    winnowOf(hs, w)
  }

  /** xx_winnow_fps(shingles, w): [[winnowFps]] with the engine-native
    * xxhash64 shingle hash (same public XxHash64Function entry as the
    * built-in expression, seed 42) instead of the portable md5 kernel —
    * the 100 TB pairing, ~20× less hash CPU per shingle. Winnowing's
    * detection guarantee is hash-agnostic (a shared run spanning a full
    * window shares its window minimum WHATEVER the hash function), so
    * flipping the kernel changes which shingles are selected but not
    * whether overlaps are caught — DedupSpec pins the planted-passage
    * case under both kernels. Not DuckDB-reproducible, hence not the
    * oracle configuration. */
  def winnowFpsXx(sh: ArrayData, w: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    val n = sh.numElements()
    if (n < w) return new GenericArrayData(Array.empty[AnyRef])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = XxHash64Function.hash(
        nonNull(sh.getUTF8String(i), "xx_winnow_fps"), StringType, 42L)
      i += 1
    }
    winnowOf(hs, w)
  }

  /** The shared window-minimum selection over a precomputed hash array. */
  private def winnowOf(hs: Array[Long], w: Int): ArrayData = {
    val n = hs.length
    val out = new java.util.LinkedHashSet[AnyRef]()
    var minPos = -1
    var i = 0
    while (i <= n - w) {
      val last = i + w - 1
      if (minPos < i) {
        minPos = i
        var j = i + 1
        while (j <= last) { if (hs(j) <= hs(minPos)) minPos = j; j += 1 }
      } else if (hs(last) <= hs(minPos)) minPos = last
      out.add(java.lang.Long.valueOf(hs(minPos)))
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  /** portable_minhash60(shingles, k): per seed s in [0, k), the minimum
    * over the array of md5("s:" ++ shingle) first-15-hex-chars-as-long
    * ([[PortableHash60Expr.hash]] — same kernel, same value). Equals
    * array(array_min(transform(sh, x -> portable_hash60(x, "s:"))) for
    * s <- 0 until k); all-null signature for an empty array, matching
    * array_min's null on empty. */
  def minhash(sh: ArrayData, k: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(new Array[AnyRef](k))
    val pfx = prefixes(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val bytes = nonNull(sh.getUTF8String(i), "portable_minhash60").getBytes
      var seed = 0
      while (seed < k) {
        val h = PortableHash60Expr.hashBytes(pfx(seed), bytes)
        if (h < mins(seed)) mins(seed) = h
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class TokenizeWs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokenize_ws expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "tokenize_ws"

  override protected def nullSafeEval(s: Any): Any =
    TextKernels.tokenize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextKernels.tokenize($s);")

  override protected def withNewChildInternal(newChild: Expression): TokenizeWs =
    copy(child = newChild)
}

case class WordShingles(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      right.dataType == IntegerType && right.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects (array<string>, int literal), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(toks: Any, n: Any): Any =
    TextKernels.shingles(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, n) =>
      s"${ev.value} = graft.functions.TextKernels.shingles($toks, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}

case class BpeClassCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_class_counts expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("alpha", IntegerType, nullable = false),
    StructField("digit", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false)))

  override def prettyName: String = "bpe_class_counts"

  override protected def nullSafeEval(s: Any): Any =
    TextKernels.bpeClassCounts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextKernels.bpeClassCounts($s);")

  override protected def withNewChildInternal(newChild: Expression): BpeClassCounts =
    copy(child = newChild)
}

case class ArrayMaxCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_max_count expects array<string>, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "array_max_count"

  override protected def nullSafeEval(arr: Any): Any =
    TextKernels.maxCount(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TextKernels.maxCount($arr);")

  override protected def withNewChildInternal(newChild: Expression): ArrayMaxCount =
    copy(child = newChild)
}

case class SigAgree(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean =
    t.isInstanceOf[ArrayType] && t.asInstanceOf[ArrayType].elementType == LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sig_agree expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sig_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.sigAgree($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}

case class XxMinhash64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      right.dataType == IntegerType && right.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"xx_minhash64 expects (array<string>, int literal), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "xx_minhash64"

  override protected def nullSafeEval(sh: Any, k: Any): Any =
    TextKernels.minhashXx(sh.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, k) =>
      s"${ev.value} = graft.functions.TextKernels.minhashXx($sh, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): XxMinhash64 =
    copy(left = newLeft, right = newRight)
}

case class PortableSimhash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_simhash60 expects array<string>, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "portable_simhash60"

  override protected def nullSafeEval(toks: Any): Any =
    TextKernels.simhash(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.TextKernels.simhash($toks);")

  override protected def withNewChildInternal(newChild: Expression): PortableSimhash60 =
    copy(child = newChild)
}

case class WinnowFps(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      right.dataType == IntegerType && right.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects (array<string>, int literal), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(sh: Any, w: Any): Any =
    TextKernels.winnowFps(sh.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, w) =>
      s"${ev.value} = graft.functions.TextKernels.winnowFps($sh, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowFps =
    copy(left = newLeft, right = newRight)
}

case class XxWinnowFps(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      right.dataType == IntegerType && right.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"xx_winnow_fps expects (array<string>, int literal), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "xx_winnow_fps"

  override protected def nullSafeEval(sh: Any, w: Any): Any =
    TextKernels.winnowFpsXx(sh.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, w) =>
      s"${ev.value} = graft.functions.TextKernels.winnowFpsXx($sh, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): XxWinnowFps =
    copy(left = newLeft, right = newRight)
}

case class PortableMinhash60(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      right.dataType == IntegerType && right.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_minhash60 expects (array<string>, int literal), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // null elements only for the empty-input signature (array_min-on-empty
  // semantics of the Column twin)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "portable_minhash60"

  override protected def nullSafeEval(sh: Any, k: Any): Any =
    TextKernels.minhash(sh.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, k) =>
      s"${ev.value} = graft.functions.TextKernels.minhash($sh, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PortableMinhash60 =
    copy(left = newLeft, right = newRight)
}
