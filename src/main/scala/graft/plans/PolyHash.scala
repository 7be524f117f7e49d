package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable polynomial hash family (mod 2^64) for the sketch
  * operators, replacing xxhash64 where a DuckDB oracle must recompute the
  * fingerprints: every step is wrapping 64-bit arithmetic with a SMALL
  * multiplier, so the same values are expressible as HUGEINT-mod-2^64 SQL
  * (the `stubCodecSql` technique) and as overflow-free 32-bit-split Column
  * arithmetic under ANSI mode (the HOF fallbacks in [[graft.ops.Dedup]]).
  *
  * Base hash of a string: h = SEED; per codepoint c: h = h*MUL + c (mod
  * 2^64). SEED is a full-width constant so even 1-char tokens populate all
  * 64 bits; MUL is ~2^20 so each DuckDB step stays within HUGEINT
  * (h*MUL < 2^84) and each 32-bit-split Column step stays within a signed
  * long (lo*MUL < 2^52). Seed family for MinHash: h_s = base*A_s + B_s
  * (mod 2^64) with A_s odd 20-bit and B_s 64-bit, both splitmix64-derived
  * — [[Poly64.seeds]] is the single source of truth that the DuckDB oracle
  * SQL renders as literals.
  *
  * ASCII-safe by construction (codepoint == byte); multi-byte codepoints
  * hash consistently across engines for BMP text (Spark `ascii`, DuckDB
  * `ascii` both yield the codepoint).
  */
object Poly64 {
  /** Unsigned 0x9E3779B97F4A7C15 (golden gamma) as a signed long. */
  val Seed: Long = 0x9E3779B97F4A7C15L
  val SeedHi: Long = (Seed >>> 32) // 0x9E3779B9
  val SeedLo: Long = Seed & 0xFFFFFFFFL // 0x7F4A7C15
  val Mul: Long = 1000003L

  def baseHash(s: String): Long = {
    var h = Seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = h * Mul + cp
      i += Character.charCount(cp)
    }
    h
  }

  def mulAdd(h: Long, a: Long, b: Long): Long = h * a + b

  private def splitmix64(state: Long): (Long, Long) = {
    val s = state + 0x9E3779B97F4A7C15L
    var z = s
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (s, z ^ (z >>> 31))
  }

  /** numHashes (A_s odd <2^20, B_s 64-bit) pairs from a fixed splitmix64
    * stream (state 42) — identical on every engine that re-derives them. */
  def seeds(numHashes: Int): Array[(Long, Long)] = {
    var st = 42L
    Array.fill(numHashes) {
      val (s1, a) = splitmix64(st)
      val (s2, b) = splitmix64(s1)
      st = s2
      ((a & 0xFFFFEL) | 1L, b)
    }
  }

  /** DuckDB literal of a signed long's UNSIGNED 64-bit value. */
  def unsignedSql(v: Long): String = java.lang.Long.toUnsignedString(v)

  /** DuckDB fragment: base poly hash (HUGEINT, unsigned mod 2^64) of a
    * VARCHAR expression. */
  def baseHashSql(strExpr: String): String =
    s"""list_reduce(list_prepend(CAST(${unsignedSql(Seed)} AS HUGEINT),
       |      list_transform(range(1, CAST(length($strExpr) + 1 AS INTEGER)), i -> CAST(ascii($strExpr[i:i]) AS HUGEINT))),
       |    (acc, cp) -> (acc * $Mul + cp) % 18446744073709551616)""".stripMargin

  /** DuckDB fragment: signed BIGINT view of an unsigned HUGEINT value. */
  def signedSql(uExpr: String): String =
    s"CAST(CASE WHEN $uExpr >= 9223372036854775808 THEN $uExpr - 18446744073709551616 ELSE $uExpr END AS BIGINT)"
}

/** `graft_simhash64(tokens array<string>) → long` — SimHash fingerprint
  * whose per-token hash is the portable [[Poly64]] polynomial (DuckDB can
  * recompute it exactly, giving the near-dup family a hard oracle). Same
  * vote semantics as [[SimHashExpr]] (distinct tokens, MSB-first bits,
  * vote > 0 → 1), but the fingerprint is a signed 64-bit long — cheaper to
  * shuffle and block than the hex-string form. Bit-identical to the HOF
  * fallback `Dedup.simhash64` (spec-enforced).
  *
  * Codegen: the hash loop itself isn't worth generating, but falling back
  * to CodegenFallback would kick the WHOLE enclosing stage out of
  * whole-stage codegen — so `doGenCode` emits one call to [[compute]] on a
  * reference object, keeping the surrounding projection compiled. */
case class SimHash64Expr(child: Expression)
  extends UnaryExpression with ComputeRefCodegen {

  override protected def refName: String = "simhash64"

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null && seen.add(t)) {
        val h = Poly64.baseHash(t.toString)
        var p = 0
        while (p < 64) {
          if (((h >>> (63 - p)) & 1L) == 1L) votes(p) += 1 else votes(p) -= 1
          p += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var p = 0
    while (p < 64) {
      fp = (fp << 1) | (if (votes(p) > 0) 1L else 0L)
      p += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** `graft_minhash_poly(tokens array<string>, k, numHashes) → array<long>` —
  * one-pass MinHash signature over word k-shingles using the portable
  * [[Poly64]] hash family (h_s = base·A_s + B_s mod 2^64), minima taken in
  * SIGNED long order so the DuckDB oracle's signed min agrees. Shingle
  * semantics mirror [[MinHashSig]] / `Dedup.shinglesOf`. */
case class Poly64MinHash(child: Expression, shingleK: Int, numHashes: Int)
  extends UnaryExpression with ComputeRefCodegen {

  override protected def refName: String = "minhashPoly"

  require(shingleK > 0 && numHashes > 0, "shingleK and numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_minhash_poly"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_poly requires array<string> tokens, got ${other.simpleString}")
  }

  @transient private lazy val seedsArr: Array[(Long, Long)] = Poly64.seeds(numHashes)

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(toks: ArrayData): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    ShingleWalk.foreach(toks, shingleK) { sh =>
      val base = Poly64.baseHash(sh.toString)
      var s = 0
      while (s < numHashes) {
        val (a, b) = seedsArr(s)
        val h = Poly64.mulAdd(base, a, b)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Poly64MinHash =
    copy(child = newChild)
}

/** `graft_span_fps(tokens array<string>, width) → array<long>` — every
  * width-w token window's Poly64 fingerprint in one tight loop: each token
  * base-hashed ONCE into a local array, then each window folds
  * h = h·MUL + tokenHash (mod 2^64, wrapping long arithmetic) from the
  * full-width seed. Fewer than `width` tokens → empty array (null tokens
  * input → null, which callers coalesce). A NULL ELEMENT inside the array
  * nulls exactly the windows covering it — matching the HOF twin's
  * null-propagating fold, since graft_span_fps is a registered SQL
  * function a user can feed arbitrary array<string> values (the internal
  * tokensIn path never produces null elements, so its fast all-primitive
  * branch is untouched). Bit-identical to the HOF twin in
  * [[graft.ops.Dedup.duplicateSpans]]'s portable path (spec-enforced)
  * and to the DuckDB HUGEINT replay; unlike the HOF it stays inside
  * whole-stage codegen via [[ComputeRefCodegen]] and never materializes
  * per-window slice arrays. */
case class Poly64SpanFps(child: Expression, width: Int)
  extends UnaryExpression with ComputeRefCodegen {

  override protected def refName: String = "spanFps"

  require(width >= 1, "width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_span_fps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_span_fps requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < width) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](n)
    var anyNull = false
    var i = 0
    while (i < n) {
      val u = toks.getUTF8String(i)
      if (u == null) anyNull = true else th(i) = Poly64.baseHash(u.toString)
      i += 1
    }
    if (!anyNull) {
      // the hot internal path: primitive array, no boxing
      val out = new Array[Long](n - width + 1)
      i = 0
      while (i <= n - width) {
        var h = Poly64.Seed
        var j = 0
        while (j < width) { h = h * Poly64.Mul + th(i + j); j += 1 }
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    } else {
      // user-supplied nulls: a window covering a null token yields a null
      // fingerprint, exactly the HOF fold's null propagation
      val out = new Array[Any](n - width + 1)
      i = 0
      while (i <= n - width) {
        var h = Poly64.Seed
        var ok = true
        var j = 0
        while (j < width) {
          if (toks.isNullAt(i + j)) ok = false else h = h * Poly64.Mul + th(i + j)
          j += 1
        }
        out(i) = if (ok) java.lang.Long.valueOf(h) else null
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Poly64SpanFps =
    copy(child = newChild)
}
