package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math.
  *
  * Why custom expressions here and nowhere else (SURVEY.md §4.3): every
  * relational operator of the reference maps to built-ins, but vector
  * similarity over `array<float>` via `aggregate`/`zip_with` lambdas runs
  * interpreted (higher-order functions are CodegenFallback) and
  * re-traverses the arrays once per statistic. These are proper
  * `doGenCode` expressions: one fused loop per pair producing dot product
  * and both norms — the hot inner kernel of brute-force ANN at corpus
  * scale. Both float and double element types are supported; null
  * elements contribute 0.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  protected def get(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType  => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case other      => throw new IllegalStateException(other.toString)
  }

  /** java accessor snippet for codegen. */
  protected def acc(arr: String, i: String, dt: DataType): String = dt match {
    case FloatType  => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other      => throw new IllegalStateException(other.toString)
  }
}

/** Σ a_i * b_i over the common prefix of the two arrays. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += get(x, i, lt) * get(y, i, rt)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $s += ${acc(x, i, elemType(left))} * ${acc(y, i, elemType(right))};
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ popcount(a_i XOR b_i) over the common prefix of two packed
  * sign-sketch word arrays (array<long>) — the Hamming kernel of binary
  * embedding search. The `aggregate(zip_with(...))` lambda form runs
  * interpreted (CodegenFallback) per candidate pair; this is one fused
  * popcount loop inside whole-stage codegen. Null words contribute 0. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "vec_hamming"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var s = 0; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $s += java.lang.Long.bitCount($x.getLong($i) ^ $y.getLong($i));
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cos(a,b) = dot/(‖a‖·‖b‖), one fused loop; 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xa = get(x, i, lt); val yb = get(y, i, rt)
        dot += xa * yb; na += xa * xa; nb += yb * yb
      }
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    double $xa = ${acc(x, i, elemType(left))};
         |    double $yb = ${acc(y, i, elemType(right))};
         |    $dot += $xa * $yb; $na += $xa * $xa; $nb += $yb * $yb;
         |  }
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** B-bit sign-random-projection LSH signature — the corpus-wide hot loop
  * of embedding LSH (every vector, every band). The lambda form
  * (`aggregate`/`zip_with` per plane) is CodegenFallback and re-walks the
  * array once per bit; this is one fused pass: per element, all `bits`
  * plane components are derived from the same chained xxhash64 and
  * accumulated.
  *
  * Bit p of the result = sign(Σ_i x_i · c_{p,i}) where
  * c_{p,i} = +1 if xxhash64(seed, p, i) is even else −1 — EXACTLY the
  * semantics of the built-in `xxhash64(lit(seed), lit(p), i)` chain
  * (seed 42L, int-fold order), so signatures are bit-identical to the
  * lambda form FOR FINITE, NULL-FREE vectors (the embedding contract).
  * Outside that domain the two forms diverge by design: a NaN dot is
  * `>= 0` in Spark SQL's total order (NaN sorts above all doubles) but
  * false under Java's `>=` here, and a null element nulls the whole
  * lambda dot while contributing 0 here.
  */
case class LshSignature(child: Expression, bits: Int, seed: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits=$bits must be in [1, 63]")

  override def prettyName: String = "vec_lsh_signature"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${other.simpleString}")
    }

  private def elemT: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  /** Per-plane chained hash state: xxhash64's fold of (seed, plane) with
    * initial seed 42L; the per-dimension fold completes inside the loop. */
  @transient private lazy val planeHashes: Array[Long] = {
    val h0 = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(seed, 42L)
    Array.tabulate(bits)(p =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(p, h0))
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val dots = new Array[Double](bits)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val xv = elemT match {
          case FloatType => x.getFloat(i).toDouble
          case _         => x.getDouble(i)
        }
        var p = 0
        while (p < bits) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashInt(i, planeHashes(p))
          dots(p) += xv * (if ((h & 1L) == 0L) 1.0 else -1.0)
          p += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < bits) { if (dots(p) >= 0.0) sig |= 1L << p; p += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ph = ctx.addReferenceObj("planeHashes", planeHashes, "long[]")
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    val accSnippet = elemT match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _         => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val p = ctx.freshName("p"); val p2 = ctx.freshName("p2")
      val dots = ctx.freshName("dots"); val xv = ctx.freshName("xv")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $x.numElements();
         |double[] $dots = new double[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    double $xv = ${accSnippet(x, i)};
         |    for (int $p = 0; $p < $bits; $p++) {
         |      $dots[$p] += $xv * ((($xxh.hashInt($i, $ph[$p]) & 1L) == 0L) ? 1.0D : -1.0D);
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $p2 = 0; $p2 < $bits; $p2++) {
         |  if ($dots[$p2] >= 0.0D) $sig |= (1L << $p2);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Static kernel shared by [[LshBandKeys]]'s eval and codegen — same
  * parity-by-construction trick as [[DecimalVecOps]]. */
object LshOps {
  /** One fused pass: all `width·bands` plane dots, then the per-band
    * keys (band b's key bit j = sign bit of plane b·width+j) — exactly
    * the bits [[LshSignature]] would produce, sliced per band, so for
    * total bits ≤ 63 the keys equal
    * `bandKeys(lshSignature(v, bits), bits, bands)` bit for bit. */
  def bandKeys(x: ArrayData, planeHashes: Array[Long], width: Int,
               bands: Int, isFloat: Boolean): ArrayData = {
    val bits = width * bands
    val n = x.numElements()
    val dots = new Array[Double](bits)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        var p = 0
        while (p < bits) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashInt(i, planeHashes(p))
          dots(p) += xv * (if ((h & 1L) == 0L) 1.0 else -1.0)
          p += 1
        }
      }
      i += 1
    }
    val keys = new Array[Long](bands)
    var p = 0
    while (p < bits) {
      if (dots(p) >= 0.0) keys(p / width) |= 1L << (p % width)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }
}

/** Per-band LSH bucket keys as `array<long>` (element b = band b's
  * `width`-bit key) — the MULTI-LONG signature path. [[LshSignature]]
  * packs all bits into one long, capping bits ≤ 63 and therefore the
  * bucket space at 2^63 across all bands; corpora ≫ 10^8 vectors want
  * wider signatures. Emitting keys per band lifts the cap entirely
  * (any `bands`; only the per-band width is bounded by the long) and
  * skips the slice/shift banding chain. Plane p's component is the
  * same chained xxhash64 as [[LshSignature]], so for total bits ≤ 63
  * the keys are bit-identical to `bandKeys(lshSignature(...))`
  * (spec-pinned — existing fixtures and gates stay stable). */
case class LshBandKeys(child: Expression, bits: Int, bands: Int, seed: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bands >= 1 && bits % bands == 0,
    s"bits=$bits must divide into bands=$bands")
  private val width = bits / bands
  require(width >= 1 && width <= 63,
    s"band width ${width} must be in [1, 63] (a 64-bit band mask " +
      "overflows to 0 and collapses all buckets)")

  override def prettyName: String = "vec_lsh_band_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${other.simpleString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Identical chaining to [[LshSignature.planeHashes]] — parity. */
  @transient private lazy val planeHashes: Array[Long] = {
    val h0 = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(seed, 42L)
    Array.tabulate(bits)(p =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(p, h0))
  }

  override def nullSafeEval(a: Any): Any =
    LshOps.bandKeys(a.asInstanceOf[ArrayData], planeHashes, width, bands, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ph = ctx.addReferenceObj("planeHashes", planeHashes, "long[]")
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = graft.functions.LshOps.bandKeys($x, $ph, $width, $bands, $isFloat);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Static kernel shared by [[DecimalDotProduct]]'s eval and codegen (a
  * top-level object's methods compile to static Java methods, so the
  * generated code calls the exact same bytecode the interpreter runs —
  * eval/codegen parity by construction).
  *
  * Replicates the `aggregate(zip_with(a,b,(x,y) => (x*y)::decimal(38,15)),
  * 0::decimal(38,15), (acc,x) => (acc+x)::decimal(38,15))` lambda chain
  * bit for bit:
  *   - per element: IEEE double product, then Spark's ANSI double→decimal
  *     cast = BigDecimal of the SHORTEST double string, setScale(15,
  *     HALF_UP), overflow (precision > 38) throws;
  *   - sum: decimal(38,15) + decimal(38,15) needs precision 39, so Spark's
  *     `adjustPrecisionScale` (allowPrecisionLoss, the default) types the
  *     Add as decimal(38,14) — every merge step rounds the exact sum to
  *     SCALE 14 (HALF_UP), and the lambda's explicit re-cast widens it
  *     back to scale 15. The kernel replays exactly that
  *     add→setScale(14, HALF_UP)→setScale(15) sequence per element;
  *   - zip_with pads the shorter array with null and a null element nulls
  *     the running sum ⇒ length mismatch or any null element → null.
  */
object DecimalVecOps {
  private val Precision = 38
  private val Scale = 15

  /** Fast-lane failure marker for [[scaledLongOf]]; Long.MinValue can
    * never be a real result (|shortest-repr digits| ≤ 17 digits and the
    * post-scaling magnitude checks reject anything near the range edge). */
  private final val Sentinel = Long.MinValue

  private val Pow10: Array[Long] = Array.iterate(1L, 19)(_ * 10)

  /** The unscaled value of
    * `new BigDecimal(Double.toString(v)).setScale(15, HALF_UP)` as a
    * long, or [[Sentinel]] when v is non-finite or the result does not
    * fit a long (|v| ≳ 9.2e3 — the slow lane then replays the exact
    * BigDecimal semantics including its overflow exceptions).
    *
    * Profiling round 12 (thread dumps over q363): the original
    * per-element `Double.toString` → `new BigDecimal(String)` →
    * `setScale` chain spent its time in FloatingDecimal ASCII
    * conversion and BigInteger parsing. This parses the SAME shortest
    * round-trip string directly into a ×10^15 scaled long — HALF_UP
    * needs only the first discarded digit, and the shortest repr has
    * ≤ 17 significant digits, so every step below is exact. */
  private def scaledLongOf(v: Double): Long = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
      return Sentinel
    val s = java.lang.Double.toString(v)
    val len = s.length
    var i = 0
    var neg = false
    if (s.charAt(0) == '-') { neg = true; i = 1 }
    var d = 0L      // all significant digits, left to right
    var nd = 0      // digit count (≤ 17 from Double.toString)
    var frac = 0    // digits after the point
    var exp = 0     // explicit exponent
    var seenPoint = false
    var ok = true
    while (ok && i < len) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        if (nd >= 18) ok = false   // defensive: never true for toString
        else {
          d = d * 10 + (c - '0')
          if (d != 0) nd += 1      // leading zeros carry no precision
          if (seenPoint) frac += 1
          i += 1
        }
      } else if (c == '.') { seenPoint = true; i += 1 }
      else if (c == 'E') {
        var j = i + 1
        var eneg = false
        if (j < len && s.charAt(j) == '-') { eneg = true; j += 1 }
        var e = 0
        while (j < len) {
          val ec = s.charAt(j)
          if (ec < '0' || ec > '9') return Sentinel
          e = e * 10 + (ec - '0'); j += 1
        }
        exp = if (eneg) -e else e
        i = len
      } else return Sentinel
    }
    if (!ok) return Sentinel
    // value = ±d × 10^(exp − frac); want round_half_up(value × 10^15)
    val e = exp - frac + Scale
    val r =
      if (d == 0L) 0L
      else if (e >= 0) {
        if (e > 18 || d > Long.MaxValue / Pow10(e)) return Sentinel
        d * Pow10(e)
      } else {
        val m = -e
        if (m >= 19) 0L            // d < 10^18 ⇒ rounds to zero
        else {
          val p = Pow10(m)
          val q = d / p
          val rem = d % p
          if (rem * 2 >= p) q + 1 else q   // HALF_UP, d ≥ 0
        }
      }
    if (neg) -r else r
  }

  /** One accumulation step of the lambda chain on ×10^15 scaled longs:
    * add, round to scale 14 HALF_UP (away from zero), rescale to 15.
    * Returns [[Sentinel]] on any overflow (slow lane takes over with
    * the exact BigDecimal semantics). */
  private def accStep(sum: Long, pd: Long): Long = {
    val s1 = sum + pd
    if (((sum ^ s1) & (pd ^ s1)) < 0L) return Sentinel
    var q = s1 / 10
    val r = s1 % 10
    if (r >= 5) q += 1 else if (r <= -5) q -= 1
    if (q > Long.MaxValue / 10 || q < Long.MinValue / 10) return Sentinel
    q * 10
  }

  /** Slow-lane body — the original, semantics-defining implementation:
    * per element Spark's ANSI double→decimal(38,15) cast (BigDecimal of
    * the shortest double string, setScale(15, HALF_UP), overflow
    * throws), then the Add's (38,14) rounding and the lambda's (38,15)
    * recast, each overflow-checked where the reference throws. */
  private def slowStep(sum0: java.math.BigDecimal,
                       prod: Double): java.math.BigDecimal = {
    val pd = new java.math.BigDecimal(java.lang.Double.toString(prod))
      .setScale(Scale, java.math.RoundingMode.HALF_UP)
    if (pd.precision > Precision)
      throw new ArithmeticException(
        s"vec_dot_decimal: product overflows decimal($Precision,$Scale)")
    // ANSI Add of two (38,15) is typed (38,14) by adjustPrecisionScale:
    // round each merge to scale 14, then the lambda re-casts to (38,15)
    var sum = sum0.add(pd).setScale(Scale - 1, java.math.RoundingMode.HALF_UP)
    if (sum.precision > Precision)
      throw new ArithmeticException(
        s"vec_dot_decimal: sum overflows decimal($Precision,${Scale - 1})")
    sum = sum.setScale(Scale)
    // the lambda's (38,14)→(38,15) recast ALSO overflow-checks: a sum
    // with precision exactly 38 at scale 14 gains a digit here, and
    // parity means throwing exactly where the reference throws
    if (sum.precision > Precision)
      throw new ArithmeticException(
        s"vec_dot_decimal: sum overflows decimal($Precision,$Scale)")
    sum
  }

  /** Returns null exactly when the lambda form yields null.
    *
    * Fast lane: products and the running sum ride ×10^15 scaled longs
    * (exact — every intermediate fits; any value that might not falls
    * back). Slow lane: the original BigDecimal chain, entered mid-sum
    * with the exact state (a scaled long converts losslessly), so
    * results and exceptions are bit-identical to the pre-round-12 code
    * on every input (spec-pinned against the lambda reference). */
  def dotDecimal(x: ArrayData, y: ArrayData,
                 xFloat: Boolean, yFloat: Boolean): org.apache.spark.sql.types.Decimal = {
    val nx = x.numElements(); val ny = y.numElements()
    if (nx != ny) return null
    var sum = 0L
    var i = 0
    while (i < nx) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xa = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yb = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val pd = scaledLongOf(xa * yb)
      if (pd == Sentinel) {
        // slow lane from element i, carrying the exact sum so far
        var bsum = java.math.BigDecimal.valueOf(sum, Scale)
        var j = i
        while (j < nx) {
          if (x.isNullAt(j) || y.isNullAt(j)) return null
          val xj = if (xFloat) x.getFloat(j).toDouble else x.getDouble(j)
          val yj = if (yFloat) y.getFloat(j).toDouble else y.getDouble(j)
          bsum = slowStep(bsum, xj * yj)
          j += 1
        }
        return org.apache.spark.sql.types.Decimal(bsum)
      }
      val s1 = accStep(sum, pd)
      if (s1 == Sentinel) {
        var bsum = slowStep(java.math.BigDecimal.valueOf(sum, Scale),
          xa * yb)
        var j = i + 1
        while (j < nx) {
          if (x.isNullAt(j) || y.isNullAt(j)) return null
          val xj = if (xFloat) x.getFloat(j).toDouble else x.getDouble(j)
          val yj = if (yFloat) y.getFloat(j).toDouble else y.getDouble(j)
          bsum = slowStep(bsum, xj * yj)
          j += 1
        }
        return org.apache.spark.sql.types.Decimal(bsum)
      }
      sum = s1
      i += 1
    }
    org.apache.spark.sql.types.Decimal(java.math.BigDecimal.valueOf(sum, Scale))
  }

  /** All `bits` md5-plane decimal dots of one vector, fused — the
    * round-12 kernel behind [[LshSignatureMd5Planes]]. Plane components
    * are ±1, so the per-plane product is an EXACT IEEE negation of the
    * element: each element converts to its decimal ONCE (the dominant
    * cost — see [[scaledLongOf]]) and every plane reuses ±that value
    * (HALF_UP is symmetric away from zero, so decimal(−x) = −decimal(x)
    * exactly). Accumulation replays the lambda chain per plane in
    * element order — bit-identical to `bits` separate
    * `dotDecimal(vec, planeLiteral)` calls (spec-pinned).
    *
    * Returns the packed sign signature: bit p = (plane-p dot ≥ 0).
    * A null vector, any null element, or numElements ≠ dims yields 0L —
    * exactly the `when(dot >= 0, 2^p).otherwise(0)` column form, where
    * a null dot contributes 0 to every bit. */
  def md5PlaneSignature(x: ArrayData, signs: Array[Byte], bits: Int,
                        dims: Int, isFloat: Boolean): Long = {
    if (x == null || x.numElements() != dims) return 0L
    val vals = new Array[Long](dims)
    var fast = true
    var d = 0
    while (d < dims) {
      if (x.isNullAt(d)) return 0L
      val xv = if (isFloat) x.getFloat(d).toDouble else x.getDouble(d)
      if (fast) {
        val l = scaledLongOf(xv)
        if (l == Sentinel) fast = false else vals(d) = l
      }
      d += 1
    }
    var sig = 0L
    var p = 0
    while (p < bits) {
      val base = p * dims
      var nonNeg = false
      if (fast) {
        var sum = 0L
        var ok = true
        var i = 0
        while (ok && i < dims) {
          val pd = if (signs(base + i) > 0) vals(i) else -vals(i)
          val s1 = accStep(sum, pd)
          if (s1 == Sentinel) ok = false else { sum = s1; i += 1 }
        }
        if (ok) nonNeg = sum >= 0L
        else nonNeg = md5PlaneDotSlow(x, signs, base, dims, isFloat) >= 0
      } else nonNeg = md5PlaneDotSlow(x, signs, base, dims, isFloat) >= 0
      if (nonNeg) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** Signum of one plane dot through the exact BigDecimal chain. */
  private def md5PlaneDotSlow(x: ArrayData, signs: Array[Byte], base: Int,
                              dims: Int, isFloat: Boolean): Int = {
    var bsum = java.math.BigDecimal.ZERO.setScale(Scale)
    var i = 0
    while (i < dims) {
      val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val prod = if (signs(base + i) > 0) xv * 1.0 else xv * -1.0
      bsum = slowStep(bsum, prod)
      i += 1
    }
    bsum.signum()
  }
}

/** Fused md5-parity-plane LSH signature — the round-12 replacement for
  * the `(0 until bits).map(p => when(dotDecimal(vec, planeLit(p)) >= 0,
  * 2^p)).reduce(_+_)` column tree in [[graft.llm.Similarity.lshSignatureMd5]].
  * That tree carried bits × dims literals (a 60-plane × 64-dim signature
  * is 3 840 literal nodes — heavy to codegen per AQE stage fragment) and
  * re-converted every element to decimal once PER PLANE (the measured
  * q363/q341 hot spot). This expression holds the sign matrix as one
  * reference object and converts each element once per ROW; the decimal
  * arithmetic per plane is replayed exactly (see
  * [[DecimalVecOps.md5PlaneSignature]]), so signatures — and therefore
  * every LSH bucket, candidate set, and gate hash — are bit-identical
  * (spec-pinned against the retained column-tree reference). */
case class LshSignatureMd5Planes(child: Expression, bits: Int, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits=$bits out of [1, 63]")
  require(dims >= 1, s"dims must be >= 1, got $dims")

  override def prettyName: String = "vec_lsh_signature_md5"
  override def dataType: DataType = LongType
  // the column form yields 0 (not null) for null/mis-shaped input
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${other.simpleString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** +1/−1 per (plane, dim), flattened plane-major — the same
    * [[graft.llm.Similarity.md5PlaneComponent]] matrix the column tree
    * baked in as literals. */
  @transient private lazy val planeSigns: Array[Byte] = {
    val a = new Array[Byte](bits * dims)
    var p = 0
    while (p < bits) {
      var d = 0
      while (d < dims) {
        a(p * dims + d) =
          if (graft.llm.Similarity.md5PlaneComponent(p, d) > 0) 1 else -1
        d += 1
      }
      p += 1
    }
    a
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    DecimalVecOps.md5PlaneSignature(
      if (v == null) null else v.asInstanceOf[ArrayData],
      planeSigns, bits, dims, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val signs = ctx.addReferenceObj("planeSigns", planeSigns, "byte[]")
    val c = child.genCode(ctx)
    ev.copy(
      code =
        code"""
           |${c.code}
           |long ${ev.value} = graft.functions.DecimalVecOps.md5PlaneSignature(
           |  ${c.isNull} ? null : ${c.value}, $signs, $bits, $dims, $isFloat);
         """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Exact DECIMAL(38,15) Σ a_i·b_i — the deterministic-cosine kernel.
  *
  * The oracle-checked queries (q26/q34) need dot products whose surfaced
  * double is bit-stable across engines; the lambda chain that guaranteed
  * that (see [[DecimalVecOps]]) is CodegenFallback and dominated their
  * wall time. This expression computes the identical decimal (spec-pinned
  * against the retained lambda reference) in one fused loop.
  */
case class DecimalDotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot_decimal"
  override def dataType: DataType = DecimalType(38, 15)
  override def nullable: Boolean = true   // null element ⇒ null result

  override def nullSafeEval(a: Any, b: Any): Any =
    DecimalVecOps.dotDecimal(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemType(left) == FloatType, elemType(right) == FloatType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val xF = elemType(left) == FloatType
      val yF = elemType(right) == FloatType
      s"""
         |${ev.value} = graft.functions.DecimalVecOps.dotDecimal($x, $y, $xF, $yF);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorFunctions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def vecDot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def vecNorm2(a: Column): Column = c(DotProduct(e(a), e(a)))
  def vecCosine(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
  def vecDotDecimal(a: Column, b: Column): Column = c(DecimalDotProduct(e(a), e(b)))
  def vecHamming(a: Column, b: Column): Column = c(HammingDistance(e(a), e(b)))
  def vecLshSignature(v: Column, bits: Int, seed: Int = 42): Column =
    c(LshSignature(e(v), bits, seed))
  def vecLshBandKeys(v: Column, bits: Int, bands: Int, seed: Int = 42): Column =
    c(LshBandKeys(e(v), bits, bands, seed))
  def vecLshSignatureMd5(v: Column, bits: Int, dims: Int): Column =
    c(LshSignatureMd5Planes(e(v), bits, dims))

  /** SQL registration: `SELECT vec_cosine(a.embedding, b.embedding)`. */
  def registerSql(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("jaro_winkler_ppm",
      exprs => JaroWinklerPpm(exprs(0), exprs(1)), "built-in")
  }
}
