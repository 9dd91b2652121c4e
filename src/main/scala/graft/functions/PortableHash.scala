package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen form of the engine's cross-engine-portable 60-bit hash:
  * `portable_hash60(s, prefix)` ==
  * `conv(substring(md5(concat(prefix, s)), 1, 15), 16, 10)` == DuckDB's
  * `CAST('0x' || substr(md5(prefix || s), 1, 15) AS BIGINT)`.
  *
  * The built-in chain pays, PER HASH: a string concat, an md5 that
  * allocates a 32-char hex string, a substring, and a `conv` radix parse
  * through BigInteger — and the MinHash pipeline calls it 16× per
  * shingle. This expression digests the raw UTF-8 bytes into a reusable
  * thread-local MessageDigest and assembles the value with shifts (the
  * first 15 hex chars of a digest ARE its first 8 bytes as an unsigned
  * big-endian long, shifted right 4 bits), allocating nothing but the
  * 16-byte digest. Same value bit-for-bit (KernelParitySpec pins it
  * against both the Column formulation and the JVM scalar twin), so
  * every DuckDB oracle built on the md5 kernel is untouched — this is a
  * pure execution-tier swap, the d11/d2/d3 hash CPU cut.
  *
  * Registered as SQL function `portable_hash60` via
  * [[graft.core.GraftExtensions]], usable inside higher-order lambdas
  * (simhashPortable60's per-token vote) and `call_function` alike.
  */
case class PortableHash60Expr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_hash60 expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "portable_hash60"

  override protected def nullSafeEval(s: Any, prefix: Any): Any =
    PortableHash60Expr.hash(
      prefix.asInstanceOf[UTF8String], s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, prefix) =>
      s"${ev.value} = graft.functions.PortableHash60Expr.hash($prefix, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PortableHash60Expr =
    copy(left = newLeft, right = newRight)
}

object PortableHash60Expr {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** md5(prefix ++ s) → first 15 hex chars as a long == first 8 digest
    * bytes, big-endian unsigned, >>> 4 (drops the 16th hex char). Public
    * and static-shaped: the generated code calls it directly. */
  def hash(prefix: UTF8String, s: UTF8String): Long =
    hashBytes(prefix.getBytes, s.getBytes)

  /** Byte-level form for callers that already hold UTF-8 bytes (the
    * multi-seed loop in [[TextKernels.minhash]] hashes each shingle k
    * times — extracting the bytes once saves k−1 copies). */
  def hashBytes(prefix: Array[Byte], s: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    d.update(prefix)
    d.update(s)
    val out = d.digest()
    val be =
      ((out(0) & 0xffL) << 56) | ((out(1) & 0xffL) << 48) |
        ((out(2) & 0xffL) << 40) | ((out(3) & 0xffL) << 32) |
        ((out(4) & 0xffL) << 24) | ((out(5) & 0xffL) << 16) |
        ((out(6) & 0xffL) << 8) | (out(7) & 0xffL)
    be >>> 4
  }
}
