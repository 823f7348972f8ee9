package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** graft's native Catalyst expressions. All implement doGenCode as a static
  * call into their companion (no boxing, no virtual eval dispatch) so the
  * enclosing stage keeps WholeStageCodegen — a CodegenFallback expression
  * would knock the whole stage back to interpreted volcano mode.
  */

/** Cosine similarity over float vectors, quantized to a 1e-9 grid so the
  * accumulation is exact 64-bit integer math: order-independent and
  * bit-reproducible across engines (the DuckDB oracle mirrors the same
  * FLOOR(x*1e9) quantization). The only floating-point ops are the final
  * divide/sqrt/multiply, which are IEEE-deterministic.
  *
  * Domain: vectors with L2 NORM <= 3.0 (any dim) keep every accumulator
  * inside int64: na = 1e18 * ||x||^2 <= 9e18 < 2^63, and |dot| <=
  * sqrt(na*nb) by Cauchy-Schwarz. (The bound is on the norm, not per
  * component — a per-component bound would be ~sqrt(9.2/dim).) Unit-norm
  * embeddings sit at 1e18 with a 9x margin. Outside the domain the
  * accumulation THROWS (Math.addExact/multiplyExact) instead of silently
  * wrapping to garbage similarities.
  *
  * Spark-first replacement for per-event model scoring the reference does
  * via an external endpoint (reference: flink-app/.../CallSageMakerTest.java).
  */
case class QuantizedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantizedCosine.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.QuantizedCosine.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizedCosine {
  final val Q = 1e9

  def quant(f: Float): Long = math.floor(f.toDouble * Q).toLong

  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    try {
      while (i < n) {
        val xi = quant(x.getFloat(i))
        val yi = quant(y.getFloat(i))
        dot = Math.addExact(dot, Math.multiplyExact(xi, yi))
        na = Math.addExact(na, Math.multiplyExact(xi, xi))
        nb = Math.addExact(nb, Math.multiplyExact(yi, yi))
        i += 1
      }
    } catch {
      case _: ArithmeticException => throw new ArithmeticException(
        "graft_cosine overflow: input vector L2 norm exceeds the safe domain (||x||2 <= 3.0)")
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }
}

/** Engine-portable 64/32-bit basis hashes for the sketch family
  * (SimHash fingerprints, MinHash signatures): the leading bytes of the
  * MD5 digest, big-endian. MD5 is bit-identical across engines (the
  * one cross-engine hash both Spark and DuckDB ship), so every sketch
  * built on this basis is a DETERMINISTIC function of its input set and
  * the DuckDB oracle can replay signatures, band keys and verify joins
  * value-exact — the r11 change that flipped the minhash/simhash gates
  * from rows-only to hash-exact. A thread-local digest instance keeps
  * the per-call cost at the digest itself (~0.2 us for shingle-sized
  * input; the sketch loops dominate regardless).
  */
object Md5Basis {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def digest(s: UTF8String): Array[Byte] = {
    val m = md.get()
    m.reset()
    m.digest(s.getBytes)
  }

  /** First 4 digest bytes as an unsigned 32-bit value in a long —
    * equals `conv(substring(md5(s), 1, 8), 16, 10)`.
    */
  def h32(s: UTF8String): Long = {
    val d = digest(s)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 8 digest bytes as a 64-bit value (two's complement) —
    * the 16 leading hex chars of md5(s).
    */
  def h64(s: UTF8String): Long = {
    val d = digest(s)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }
}

/** PRODUCTION basis for the sketch family: xxHash64 with Spark SQL's
  * default seed (42), so the native-loop values equal the `xxhash64()`
  * column function bit-for-bit. ~10x cheaper per hash than [[Md5Basis]]
  * (no digest allocation, no byte copies) — the signature pass is the
  * hot loop of corpus-scale dedup, so this is the default; the md5
  * basis stays available as the DuckDB-replayable oracle-parity twin
  * (DuckDB ships no xxhash64). See DedupOps' BasisParitySpec-pinned
  * pair-set equality between the two bases.
  */
object XxBasis {
  final val Seed = 42L

  def h64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)

  /** Low 32 bits of h64 as an unsigned value in a long — equals
    * `xxhash64(s) & 0xFFFFFFFF`, keeping the MinHash permutation
    * domain (A*h + B < 2^62 needs h < 2^32).
    */
  def h32(s: UTF8String): Long = h64(s) & 0xffffffffL
}

/** 64-bit SimHash over a token array: basis hash per token (xxHash64
  * by default — [[XxBasis.h64]], the production hot path; md5
  * ([[Md5Basis.h64]]) when `md5Parity` — engine-portable, so the
  * fingerprint is oracle-replayable), add +1/-1 per bit position, set
  * result bit where the sum is positive. Single pass, no shuffle — the
  * banding join downstream is the only exchange in the near-dup
  * pipeline.
  */
case class SimHash64(child: Expression, md5Parity: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String =
    if (md5Parity) "graft_simhash64_md5" else "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData], md5Parity)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c, $md5Parity);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def compute(arr: ArrayData, md5Parity: Boolean): Long = {
    val acc = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = if (md5Parity) Md5Basis.h64(s) else XxBasis.h64(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Karp–Rabin polynomial rolling hash of a string (base 257, mod 2^61-1).
  * Content-defined fingerprint building block; exposed for chunking /
  * shingling without materializing substrings.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = (1L << 61) - 1
  final val Base = 257L

  def compute(s: UTF8String): Long = hash(s.getBytes)

  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // h = (h * Base + b) mod (2^61-1); h < 2^61, Base < 2^9 so the
      // product needs 128-bit reduction via Math.multiplyHigh.
      val lo = h * Base
      val hi = Math.multiplyHigh(h, Base)
      // fold 128-bit (hi, lo) mod 2^61-1: x = lo&M + (bits above 61)
      val folded = (lo & Mod) + ((hi << 3) | (lo >>> 61))
      h = folded % Mod
      h = (h + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }
}

/** All 64 MinHash signature values in ONE pass over the shingle array:
  * sig[i] = min over shingles of pmod(A(i)*h + B(i), P) where h is the
  * shingle's 32-bit basis hash — xxHash64 low word by default
  * ([[XxBasis.h32]], production), md5 prefix ([[Md5Basis.h32]],
  * engine-portable oracle twin) when `md5Parity`. Replaces 64 separate
  * array_min(transform(...)) expressions whose generated code blew past
  * JIT-friendly sizes; the tight nested loop here is ~64x|shingles|
  * multiply-adds per row.
  */
case class MinHashSig(child: Expression, md5Parity: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (md5Parity) "graft_minhash_sig_md5" else "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], md5Parity)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $md5Parity);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  final val NumPerm = 64
  final val P = 4294967311L // smallest prime > 2^32
  private val rng = new scala.util.Random(42)
  // A < 2^30 keeps A*h + B < 2^62 for 32-bit h.
  val A: Array[Long] = Array.fill(NumPerm)(1L + rng.nextInt((1 << 30) - 1).toLong)
  val B: Array[Long] = Array.fill(NumPerm)(rng.nextInt(Int.MaxValue).toLong)

  def compute(arr: ArrayData, md5Parity: Boolean): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(NumPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = if (md5Parity) Md5Basis.h32(s) else XxBasis.h32(s)
        var p = 0
        while (p < NumPerm) {
          val v = (A(p) * h + B(p)) % P
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }
}

/** Distinct word k-gram shingles of a text column in one pass. Replaces a
  * transform(sequence(...), concat_ws(...)) + array_distinct chain: Spark
  * evaluates higher-order lambdas interpretively per element, which showed
  * up as ~2 ms/doc; this loop is ~30x faster and allocation-light.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val space = UTF8String.fromString(" ")

  def compute(text: UTF8String, k: Int): ArrayData = {
    val toks = text.split(space, -1)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new GenericArrayData(out)
  }
}

/** ADC (asymmetric distance computation) table-lookup sum for
  * product-quantized scoring: for m sub-codes and a flat (m x k) query
  * lookup table, result = sum over j of lut[j*k + codes[j]]. m = |codes|,
  * k = |lut| / m — both derived from the inputs, so one expression serves
  * any PQ geometry.
  *
  * This is the per-row hot loop of the PQ ANN scan (SimilarityOps.knnPq /
  * knnIvfPq). The composed form — m element_at(+lit arithmetic) nodes —
  * stays inside codegen but costs ~3m expression nodes per row; this
  * single expression is one call with a tight primitive loop. Out-of-range
  * codes throw rather than silently reading a neighboring subspace's
  * table entries.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  /** Declared input types make the SQL surface safe: without them, an
    * array<bigint> codes column would pass analysis and then be misread
    * byte-wise by getInt. With them, Catalyst coerces what it can and
    * rejects the rest at analysis time.
    */
  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(DoubleType))

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    PqAdc.compute(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { (c, l) =>
      val tmp = ctx.freshName("adc")
      s"""java.lang.Double $tmp = graft.functions.PqAdc.compute($c, $l);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  /** Boxed result: null when any array ELEMENT is null (matching the SQL
    * semantics of the composed element_at form — a null code or table
    * entry poisons the sum, it does not silently contribute 0).
    */
  def compute(codes: ArrayData, lut: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val nLut = lut.numElements()
    if (nLut % m != 0) throw new IllegalArgumentException(
      s"graft_pq_adc: |lut| = $nLut is not a multiple of |codes| = $m — " +
        "codes and lookup table disagree on the PQ geometry")
    val k = nLut / m
    var s = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= k) throw new ArrayIndexOutOfBoundsException(
        s"graft_pq_adc: code $c out of range [0, $k) in subspace $j")
      val idx = j * k + c
      if (lut.isNullAt(idx)) return null
      s += lut.getDouble(idx)
      j += 1
    }
    s
  }
}

/** Engine-portable natural log: calls `java.lang.Math.log`, which HotSpot
  * compiles to its dlog stub — bit-identical to the platform libm (and so
  * to DuckDB's `ln`) on every input the gate corpus produces. Spark's
  * built-in `log()` routes through `StrictMath.log` (fdlibm), which is a
  * last-ulp OFF libm on some inputs (measured: ln(1.269...) for the
  * doc_bm25 idf at df=394/N=500 — fdlibm ...a376 vs libm ...a377), so a
  * gated float query using built-in log hash-mismatches the oracle. Only
  * expressions whose remaining ops are IEEE-correctly-rounded (+,-,*,/,
  * sqrt) should rely on this for cross-engine bit-exactness, and the gate
  * still verifies the agreement on the corpus it runs.
  */
case class PortableLn(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_ln expects DOUBLE, got ${child.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ln"

  override protected def nullSafeEval(x: Any): Any =
    java.lang.Math.log(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (canonical composition) — the first step of
  * every text-ingest pipeline (combining sequences like "e"+U+0301 and
  * compatibility leftovers otherwise make byte-identical text hash as
  * distinct, silently defeating exact dedup and fingerprinting). Spark has
  * no built-in; this calls the JDK's ICU-derived java.text.Normalizer,
  * which matches DuckDB's utf8proc `nfc_normalize` on NFC output (both
  * implement UAX #15 canonical composition). Skips the (allocating) JDK
  * call entirely when the string is pure ASCII — ASCII is NFC-invariant —
  * so the common-case hot loop is one byte scan.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    // ASCII fast path: NFC(ascii) == ascii, return the input buffer as-is
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      if (norm.equals(str)) s else UTF8String.fromString(norm)
    }
  }
}

/** DCT-based perceptual hash over an opaque binary payload — the pHash of
  * the multimodal family (frame dedup finds CONTAINER-level duplication
  * via exact byte frames; this finds CONTENT-level near-duplication that
  * survives transforms byte features cannot: brightness shift, contrast
  * scaling, small crops). The classic image pHash recipe (resize ->
  * grayscale -> DCT -> sign-of-coefficient bits; Zauner, "Implementation
  * and Benchmarking of Perceptual Image Hash Functions", 2010) applied to
  * the repo's byte-payload stand-in as a 1D signal:
  *
  *   1. resample WITH a low-pass: N = 128 samples, each the sum of a
  *      FIXED P = 8 evenly spaced byte picks x[n] = sum_p payload[
  *      (n*P+p)*len/(N*P)] — the fixed per-sample pick count is what
  *      keeps brightness cancellation exact below (a variable-width
  *      stride average would weight the shift unevenly), and the summing
  *      is the anti-aliasing a real image resize does, which is what
  *      buys crop/shift tolerance (a single strided pick aliases
  *      high-frequency content and a 1.5% crop scattered 18 bits —
  *      measured before this low-pass);
  *   2. mean-center IN INTEGERS: y[n] = N*x[n] - sum(x) — a constant
  *      brightness shift adds exactly P*c to every sample and cancels
  *      EXACTLY (no reliance on rounded basis rows summing to zero), and
  *      a positive contrast scale multiplies every y[n] (and so every
  *      coefficient) uniformly;
  *   3. integer DCT-II: X[k] = sum_n y[n] * C[k][n] with
  *      C[k][n] = round(cos(pi/N * (n+0.5) * k) * 2^15), k = 1..64 —
  *      the JPEG-style fixed-point basis, all int64-exact
  *      (|y| <= 128*255, x 2^15 x 128 terms ~ 1.4e14 << 2^63);
  *   4. bits: bit_{k-1} = X[k] > lower-median of the 64 coefficients —
  *      invariant under any positive uniform scale of the y's.
  *
  * Hamming <= 3 near-dup pairing uses the pigeonhole 4x16-bit banding
  * (the doc_simhash discipline — lossless at that radius, and 16-bit
  * band values keep buckets sparse at corpus scale where 8-bit ones
  * would collapse into ~256 buckets). Everything after the byte picks is
  * integer arithmetic, and the oracle's SQL embeds THIS object's basis
  * literals ([[PHash64.sqlBasis]]) and carries the hash as two 32-bit
  * halves (DuckDB rejects a shift to bit 63), so engine and oracle are
  * in bit lockstep by construction.
  */
case class PHash64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash64"

  override protected def nullSafeEval(input: Any): Any =
    PHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deterministic byte-level "jitter" over a binary payload — the
  * transform half of the pHash gate fixture: y[i] = mul * x[i+drop] + add
  * over unsigned bytes, returning the EMPTY payload when any output
  * would overflow a byte (the caller filters on octet_length > 0; the
  * DuckDB oracle expresses the same guard as a list_max predicate, so
  * both engines derive the identical twin set). mul=1/add=c is a
  * brightness shift (pHash-exact by the integer mean-centering), mul=2
  * a contrast scale (pHash-exact by sign-invariance under positive
  * uniform scaling), drop=k a head crop (pHash-tolerant, not exact).
  * Pure map-side, codegen'd — the twins never leave the scan stage.
  */
case class ByteAffine(child: Expression, mul: Int, add: Int, drop: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_byte_affine"

  override protected def nullSafeEval(input: Any): Any =
    ByteAffine.compute(input.asInstanceOf[Array[Byte]], mul, add, drop)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ByteAffine.compute($c, $mul, $add, $drop)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteAffine {
  private val Empty = Array.emptyByteArray
  def compute(payload: Array[Byte], mul: Int, add: Int, drop: Int): Array[Byte] = {
    val len = payload.length - drop
    if (len <= 0) return Empty
    val out = new Array[Byte](len)
    var i = 0
    while (i < len) {
      val y = (payload(i + drop) & 0xff) * mul + add
      if (y > 255 || y < 0) return Empty
      out(i) = y.toByte
      i += 1
    }
    out
  }
}

object PHash64 {
  val N = 128     // resampled signal length
  val P = 8       // low-pass picks summed per sample (fixed count)
  val Bits = 64   // AC coefficients k = 1..Bits
  val Scale = 32768L // 2^15 fixed-point basis

  /** basis(k-1)(n) = round(cos(pi/N * (n+0.5) * k) * Scale), k in 1..Bits. */
  val basis: Array[Array[Long]] = Array.tabulate(Bits, N) { (k0, n) =>
    math.round(math.cos(math.Pi / N * (n + 0.5) * (k0 + 1)) * Scale)
  }

  def compute(payload: Array[Byte]): Long = {
    val len = payload.length
    if (len == 0) return 0L
    // low-passed resample (P picks summed per sample), then integer
    // mean-centering: y[n] = N*x[n] - sum(x)
    val x = new Array[Long](N)
    var sum = 0L
    var n = 0
    while (n < N) {
      var s = 0L
      var p = 0
      while (p < P) {
        val m = n.toLong * P + p
        s += (payload(((m * len) / (N.toLong * P)).toInt) & 0xff).toLong
        p += 1
      }
      x(n) = s
      sum += s
      n += 1
    }
    val coef = new Array[Long](Bits)
    var k = 0
    while (k < Bits) {
      val row = basis(k)
      var acc = 0L
      var i = 0
      while (i < N) { acc += (N * x(i) - sum) * row(i); i += 1 }
      coef(k) = acc
      k += 1
    }
    val sorted = coef.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(Bits / 2 - 1) // lower median
    var h = 0L
    k = 0
    while (k < Bits) {
      if (coef(k) > med) h |= 1L << k
      k += 1
    }
    h
  }

  /** The basis as a DuckDB list-of-lists literal — the oracle computes
    * with the engine's own rounded values, never its own cos().
    */
  def sqlBasis: String =
    basis.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
}
