package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector/hash hot paths.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`,
  * `transform`) do not participate in whole-stage codegen — each lambda
  * application is interpreted, with a boxed function call and often an
  * intermediate array allocation per row. For the similarity / dedup
  * operators that evaluate a dot product or a hash family per candidate
  * PAIR, that interpretation cost dominates the whole query. These
  * expressions keep the loop in compiled Scala invoked by a single
  * static call from generated code, and are bit-identical to the HOF
  * forms they replace (locked by VectorHashExpressionsSpec):
  *
  *  - [[DotProductExpr]]  == aggregate(zip_with(a, b, *), 0.0, +)
  *  - [[LshSigExpr]]      == the per-plane sign-bit fold in
  *                           [[graft.operators.Similarity]]
  *  - [[MinHashSigExpr]]  == array(min(xxhash64(lit(i), xxhash64(s))) for i)
  *  - [[SimHashExpr]]     == the 64 per-bit vote sums in
  *                           [[graft.operators.Dedup.simhashSignatures]]
  */
object VectorOps {

  /** Left-to-right fold of sum(a(i) * b(i)) — the exact evaluation
    * order of `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, so results
    * stay bit-identical to the HOF form (and to the DuckDB oracle
    * recipe). Returns null on length mismatch or a null element, like
    * the HOF (null product nulls the whole fold). */
  def dotBoxed(a: ArrayData, aFloat: Boolean, b: ArrayData,
               bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1) for
    * (plane, dim): splitmix64 finalizer over the pair. The single
    * source of truth — Similarity delegates here. */
  def planeComponent(plane: Int, d: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xC2B2AE3D27D4EB4FL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (java.lang.Math.floorMod(z, 2000003L).toDouble / 1000001.5) - 1.0
  }

  /** Sign-bit LSH signature: bit p set iff dot(v, planes(p)) > 0, with
    * the same left-to-right projection fold as the HOF form. A plane
    * whose projection is indeterminate (length mismatch / null element)
    * contributes bit 0, matching `when(proj > 0, ...).otherwise(0)`
    * on a null proj. */
  def lshSig(v: ArrayData, vFloat: Boolean,
             planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val row = planes(p)
      if (v.numElements() == row.length) {
        var acc = 0.0
        var ok = true
        var i = 0
        while (ok && i < row.length) {
          if (v.isNullAt(i)) ok = false
          else {
            val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
            acc += x * row(i)
            i += 1
          }
        }
        if (ok && acc > 0) sig |= 1L << p
      }
      p += 1
    }
    sig
  }

  /** MinHash signature: per seeded family, the (signed) min of the
    * family hash over the shingle set, all families in ONE pass. Each
    * shingle's STRING is hashed once (`xxhash64(s)`); family values
    * re-hash that 8-byte long with the family seed, so element hashes
    * equal `xxhash64(lit(i), xxhash64(s))` exactly (seeds(i) is the
    * running hash of the family index, see [[MinHashSigExpr]]). One
    * string walk instead of numHashes — string hashing dominated the
    * signature pass at corpus scale. Empty input -> all-null
    * signature, like `array_min` over an empty transform. */
  def minhashSig(shingles: ArrayData, seeds: Array[Long]): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](seeds.length))
    val mins = new Array[Long](seeds.length)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      // null element: xxhash64(NULL) is the untouched seed (the
      // expression skips null children) — mirror it, don't NPE
      val h0 = if (shingles.isNullAt(i)) 42L
        else XxHash64Function.hash(
          shingles.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < seeds.length) {
        val h = XxHash64Function.hash(h0, LongType, seeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct word k-shingles of a token array, first-occurrence order —
    * identical to `array_distinct(transform(sequence(...), concat_ws))`
    * but one compiled pass: fewer than k tokens yield the single
    * all-tokens join (like the HOF `otherwise` branch). */
  def shingles(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new java.util.LinkedHashSet[AnyRef]
    if (n < k) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var i = 0
      while (i < n) { parts(i) = tokens.getUTF8String(i); i += 1 }
      out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
    } else {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
      var i = 0
      while (i <= n - k) {
        var j = 0
        while (j < k) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Overlapping word k-grams of a SINGLE-SPACE-tokenized text, one
    * byte scan — positionally identical to
    * `transform(sequence(0, n-k), i -> concat_ws(" ", slice(split(
    * text, " ", -1), i+1, k)))` when n >= k, and the empty array when
    * n < k (the scrub's `otherwise` branch). Why a byte scan is exact:
    * with single-space separators, joining k consecutive tokens with
    * single spaces reproduces the VERBATIM substring of the input
    * from token i's first byte to token i+k-1's last byte — so each
    * gram is a zero-copy byte-range view (0x20 never occurs inside a
    * multi-byte UTF-8 sequence, so the space scan cannot split a
    * character). The HOF chain allocates a token array plus a
    * per-gram slice array and concat buffer — O(n·k) allocation that
    * [[graft.operators.Dedup.scrubRepeatedSpans]] pays TWICE since
    * its r15 de-skew (agg side + probe side). */
  def tokenGrams(text: org.apache.spark.unsafe.types.UTF8String,
                 k: Int): ArrayData = tokenGrams(text, k, 1, false)

  /** Generalized form: token-position stride between grams, and
    * `keepPartial` emits the trailing sub-k-token gram (the C4 span
    * contract: `stride = k, keepPartial = true` gives exactly
    * [[graft.operators.Dedup.tokenSpans]]' ceil(n/k) non-overlapping
    * spans, trailing partial kept). */
  def tokenGrams(text: org.apache.spark.unsafe.types.UTF8String,
                 k: Int, stride: Int, keepPartial: Boolean): ArrayData = {
    val bytes = text.getBytes
    val nb = bytes.length
    // token start byte offsets; token i ends at starts(i+1)-2
    var starts = new Array[Int](math.max(8, nb / 4))
    starts(0) = 0
    var n = 1
    var i = 0
    while (i < nb) {
      if (bytes(i) == ' ') {
        if (n == starts.length) starts = java.util.Arrays.copyOf(starts, n * 2)
        starts(n) = i + 1
        n += 1
      }
      i += 1
    }
    val count =
      if (keepPartial) (n + stride - 1) / stride
      else if (n < k) 0
      else (n - k) / stride + 1
    if (count == 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](count)
    var g = 0
    while (g < count) {
      val first = g * stride
      val lastEx = math.min(first + k, n) // exclusive token bound
      val s = starts(first)
      val e = if (lastEx < n) starts(lastEx) - 1 else nb
      out(g) = org.apache.spark.unsafe.types.UTF8String
        .fromBytes(bytes, s, e - s)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Unicode NFC normalization (java.text.Normalizer) — canonical
    * composition, the standard first step of text normalization;
    * agrees with utf8proc-based engines (DuckDB `nfc_normalize`) on
    * canonical sequences. Fast path: already-NFC input (the common
    * case) is returned untouched without re-encoding. */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Per-document n-gram repetition stats in ONE pass over the token
    * array: (n_grams, n_distinct, top_gram, top_count). Semantics are
    * exactly the explode + two-aggregate form they replace (locked by
    * spec): fewer than n tokens collapse to the single all-tokens
    * gram; the dominant gram resolves count ties to the binary-GREATEST
    * gram, i.e. `max(struct(cnt, gram))` under UTF8String order. */
  def repetitionStats(tokens: ArrayData, n: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val cnt = tokens.numElements()
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val nGrams = if (cnt >= n) cnt - n + 1 else 1
    val m = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, java.lang.Long](nGrams * 2)
    if (cnt < n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](cnt)
      var i = 0
      while (i < cnt) { parts(i) = tokens.getUTF8String(i); i += 1 }
      m.put(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*),
        1L)
    } else {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var i = 0
      while (i <= cnt - n) {
        var j = 0
        while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        val g = org.apache.spark.unsafe.types.UTF8String
          .concatWs(sep, parts: _*)
        val prev = m.get(g)
        m.put(g, if (prev == null) 1L else prev + 1L)
        i += 1
      }
    }
    var topGram: org.apache.spark.unsafe.types.UTF8String = null
    var topCnt = 0L
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.longValue()
      if (c > topCnt ||
          (c == topCnt && e.getKey.compareTo(topGram) > 0)) {
        topCnt = c
        topGram = e.getKey
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(
      nGrams.toLong, m.size.toLong, topGram, topCnt)
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(d: Array[Byte]): String = {
    val cs = new Array[Char](32)
    var i = 0
    while (i < 16) {
      cs(2 * i) = hexDigits((d(i) >> 4) & 0xF)
      cs(2 * i + 1) = hexDigits(d(i) & 0xF)
      i += 1
    }
    new String(cs)
  }

  /** MOSS winnowing fingerprint set of one document — see
    * [[WinnowExpr]]. md5 per character k-gram, width-w sliding min by
    * monotonic deque (amortized O(1) per window), window minima
    * deduped BY VALUE (two positions with identical gram content
    * yield one fingerprint, matching the frame-level DISTINCT of the
    * windowed form). Digest byte arrays compare unsigned — identical
    * ordering to the lowercase-hex strings the oracle compares, since
    * hex over fixed-length bytes is order-isomorphic. */
  def winnow(text: org.apache.spark.unsafe.types.UTF8String,
             k: Int, w: Int): ArrayData = {
    val n = text.numChars()
    val m = n - k + 1 // character k-gram count
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val md = md5Local.get()
    // char -> byte offset index, built in ONE pass: per-gram
    // UTF8String.substring would re-scan from byte 0 every call
    // (O(n^2) over the document — measured as the dominant cost of
    // the first native form), while md.update on byte slices of the
    // one materialized array allocates nothing per gram
    val bytes = text.getBytes
    val offs = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (ci < n) {
      offs(ci) = bi
      bi += org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(n) = bytes.length
    val hs = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      hs(i) = md.digest()
      i += 1
    }
    val dq = new Array[Int](m) // index deque, values unsigned-increasing
    var head = 0
    var tail = 0
    var lastIdx = -1
    val seen = new java.util.HashSet[String]
    val out = new java.util.ArrayList[AnyRef]
    var t = 0
    while (t < m) {
      while (tail > head &&
          java.util.Arrays.compareUnsigned(hs(dq(tail - 1)), hs(t)) >= 0)
        tail -= 1
      dq(tail) = t
      tail += 1
      if (dq(head) <= t - w) head += 1
      if (t >= w - 1 && dq(head) != lastIdx) {
        // hex + set-probe only when the min POSITION moves (runs of
        // stable minima are the common case); value-level dedup still
        // catches identical grams at different positions
        lastIdx = dq(head)
        val hex = md5Hex(hs(lastIdx))
        if (seen.add(hex))
          out.add(org.apache.spark.unsafe.types.UTF8String.fromString(hex))
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Jaccard over two string arrays in one pass: distinct-common count
    * (array_intersect semantics) over raw sizes —
    * |A∩B| / (|A|+|B|-|A∩B|), 0.0 when both empty. Bit-identical to
    * the column formula it replaces (integer counts, one double
    * division). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val seen = new java.util.HashSet[AnyRef](na * 2)
    var i = 0
    while (i < na) {
      seen.add(if (a.isNullAt(i)) null else a.getUTF8String(i))
      i += 1
    }
    val matched = new java.util.HashSet[AnyRef]
    var inter = 0
    i = 0
    while (i < nb) {
      val s: AnyRef = if (b.isNullAt(i)) null else b.getUTF8String(i)
      if (seen.contains(s) && matched.add(s)) inter += 1
      i += 1
    }
    val uni = na + nb - inter
    if (uni == 0) 0.0 else inter.toDouble / uni
  }

  /** Java `String.split` semantics over UTF8String (trailing empties
    * dropped by the limit-0 contract); empty input -> empty array per
    * the engine's splitLikeJava contract. */
  def splitJava(s: org.apache.spark.unsafe.types.UTF8String,
                pattern: java.util.regex.Pattern): ArrayData = {
    if (s.numBytes() == 0) return new GenericArrayData(Array.empty[Any])
    val parts = pattern.split(s.toString)
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(parts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a token array in one pass: per-bit votes of
    * xxhash64(token) (+1 set / -1 clear), bit set iff votes > 0 —
    * identical to the exploded 64-aggregate form but with no shuffle. */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Long](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // null token hashes to the seed, matching xxhash64(NULL) in the
      // exploded reference form
      val h = if (tokens.isNullAt(i)) 42L
        else XxHash64Function.hash(tokens.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        votes(b) += ((h >>> b) & 1L) * 2 - 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 64-bit SimHash over a token array with an MD5 token-hash family —
    * the ORACLE-SHARED variant of [[simhash]]: both engines can
    * recompute the signature (DuckDB has md5, not xxhash64), so the
    * banded near-dup pair list is checkable closed-form.
    *
    * Bit definition (mirrored bit-for-bit by the DuckDB oracle's
    * hex-string arithmetic): for bit j in [0, 64), let q = j/4 index
    * the hex character of md5(token) (0-based) and r = j%4 the bit of
    * that character's nibble value; bit j of the token hash is
    * (nibble(q) >> r) & 1 — i.e. the first 16 hex chars of the digest,
    * LSB-first within each nibble. Votes are +1 set / -1 clear per
    * token; signature bit j is set iff votes > 0 (ties clear). A null
    * token hashes as "" (string_split never yields null). */
  def simhashMd5(tokens: ArrayData): Long = {
    val md = md5Local.get()
    val votes = new Array[Long](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val bytes =
        if (tokens.isNullAt(i)) Array.emptyByteArray
        else tokens.getUTF8String(i).getBytes
      val d = md.digest(bytes) // digest() resets the instance
      var j = 0
      while (j < 64) {
        val q = j >> 2
        val nib =
          if ((q & 1) == 0) (d(q >> 1) >> 4) & 0xF
          else d(q >> 1) & 0xF
        votes(j) += (((nib >> (j & 3)) & 1) << 1) - 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Count of single-space-delimited segments of `text` byte-equal to
    * `term` — the exact segmentation of `split(text, " ", -1)`
    * (trailing and consecutive separators produce empty segments,
    * which count when term is empty). One pass, no allocation. */
  def countToken(text: org.apache.spark.unsafe.types.UTF8String,
                 term: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = text.numBytes()
    val m = term.numBytes()
    var count = 0L
    var segStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.getByte(i) == 0x20) {
        if (i - segStart == m) {
          var j = 0
          var eq = true
          while (eq && j < m) {
            if (text.getByte(segStart + j) != term.getByte(j)) eq = false
            j += 1
          }
          if (eq) count += 1
        }
        segStart = i + 1
      }
      i += 1
    }
    count
  }
}

private[plans] object VectorHashExpressions {
  def checkNumericArray(e: Expression, fn: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
    }

  def isFloatArray(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def checkStringArray(e: Expression, fn: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn requires ARRAY<STRING>, got ${other.sql}")
    }

  def info[T](cls: Class[T], name: String): ExpressionInfo =
    new ExpressionInfo(cls.getName, name)
}

/** `graft_dot(a, b)` — codegen'd double dot product (float arrays are
  * widened per element; float -> double is exact). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorHashExpressions._

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkNumericArray(left, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkNumericArray(right, prettyName)
  }
  override def dataType: DataType = DoubleType
  // Null on length mismatch / null element regardless of child
  // nullability — without this, non-nullable inputs would make
  // nullSafeCodeGen emit `isNull = true` against an undeclared local.
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotBoxed(a.asInstanceOf[ArrayData], isFloatArray(left),
      b.asInstanceOf[ArrayData], isFloatArray(right))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("dotRes")
      s"""
        java.lang.Double $res = graft.plans.VectorOps.dotBoxed(
          $a, ${isFloatArray(left)}, $b, ${isFloatArray(right)});
        if ($res == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $res.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[DotProductExpr], "graft_dot")
}

/** `graft_lsh_sig(v, planeOffset, numPlanes, dims)` — packed sign-bit
  * LSH signature against the deterministic plane family
  * [[VectorOps.planeComponent]]. The plane matrix is built once at plan
  * time and referenced by the generated code. */
case class LshSigExpr(child: Expression, planeOffset: Int, numPlanes: Int,
                      dims: Int) extends UnaryExpression {
  import VectorHashExpressions._

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(numPlanes, dims)((p, d) =>
      VectorOps.planeComponent(planeOffset + p, d + 1))

  override def checkInputDataTypes(): TypeCheckResult =
    checkNumericArray(child, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_sig"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.lshSig(v.asInstanceOf[ArrayData], isFloatArray(child), planes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorOps.lshSig($c, ${isFloatArray(child)}, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : LshSigExpr = copy(child = newChild)
}

object LshSigExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[LshSigExpr], "graft_lsh_sig")
}

/** `graft_minhash(shingles, numHashes)` — the full minhash signature in
  * one pass; element i equals `array_min(transform(sh, s =>
  * xxhash64(lit(i), xxhash64(s))))` bit-for-bit (the seed chain
  * replicates XxHash64's left fold over its children; the inner
  * xxhash64 collapses each string to a long so the numHashes families
  * each hash 8 bytes, not the string). */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  import VectorHashExpressions._

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i =>
      XxHash64Function.hash(i, IntegerType, 42L))

  override def checkInputDataTypes(): TypeCheckResult =
    checkStringArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.minhashSig(v.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("seeds", seeds, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorOps.minhashSig($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSigExpr = copy(child = newChild)
}

object MinHashSigExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[MinHashSigExpr], "graft_minhash")
}

/** `graft_simhash(tokens)` — one-pass 64-bit simhash of a token array;
  * replaces the explode + 64-aggregate shuffle with a projection. */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  import VectorHashExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    checkStringArray(child, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.simhash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorOps.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHashExpr = copy(child = newChild)
}

object SimHashExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[SimHashExpr], "graft_simhash")
}

/** `graft_simhash_md5(tokens)` — [[SimHashExpr]] with the MD5 token-hash
  * family ([[VectorOps.simhashMd5]]): slower per token than xxhash64 but
  * recomputable by any engine with md5 — the cross-engine-verifiable
  * signature for oracle-locked dedup queries. */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {
  import VectorHashExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    checkStringArray(child, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_md5"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.simhashMd5(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorOps.simhashMd5($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHashMd5Expr = copy(child = newChild)
}

object SimHashMd5Expr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[SimHashMd5Expr], "graft_simhash_md5")
}

/** `graft_shingles(tokens, k)` — distinct word k-shingles in one
  * compiled pass (the HOF form ran one interpreted concat lambda per
  * shingle). */
case class ShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  import VectorHashExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    checkStringArray(child, prettyName)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.shingles(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorOps.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression)
      : ShinglesExpr = copy(child = newChild)
}

object ShinglesExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[ShinglesExpr], "graft_shingles")
}

/** `graft_token_grams(text, k)` — ALL overlapping word k-grams of a
  * single-space-tokenized text in positional order (index = token
  * position), one compiled byte scan; empty array when the text has
  * fewer than k tokens. Unlike [[ShinglesExpr]] (distinct, set
  * semantics, for minhash/jaccard), this keeps every occurrence — the
  * gram STREAM the repeated-span scrub posexplodes. */
case class TokenGramsExpr(child: Expression, k: Int,
                          stride: Int = 1, keepPartial: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && stride >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, literal k >= 1, stride >= 1), " +
        s"got (${child.dataType.simpleString}, $k, $stride)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_grams"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.tokenGrams(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      k, stride, keepPartial)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorOps.tokenGrams($c, $k, $stride, $keepPartial)")

  override protected def withNewChildInternal(newChild: Expression)
      : TokenGramsExpr = copy(child = newChild)
}

object TokenGramsExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[TokenGramsExpr], "graft_token_grams")
}

/** `graft_jaccard(a, b)` — set Jaccard of two string arrays in one
  * compiled pass (the column form built an intersection array plus two
  * size scans per pair — per CANDIDATE PAIR in the dedup verify join). */
case class JaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorHashExpressions._

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkStringArray(left, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkStringArray(right, prettyName)
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VectorOps.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardExpr =
    copy(left = newLeft, right = newRight)
}

object JaccardExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[JaccardExpr], "graft_jaccard")
}

/** `graft_split_java(str, pattern)` — Java `String.split(regex)`
  * semantics (trailing empty strings dropped), the exact behavior of
  * the reference's line/label splits, as ONE compiled call. The HOF
  * composition (split + indexed transform + array_max + slice) costs
  * four array passes per row and a large codegen footprint in the ETL
  * hot path. Empty input yields an empty array (the engine's
  * established contract; Java itself returns [""] there — the one
  * deliberate divergence, locked by spec). */
case class SplitJavaExpr(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_split_java"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.splitJava(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pattern", compiled,
      "java.util.regex.Pattern")
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorOps.splitJava($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SplitJavaExpr = copy(child = newChild)
}

object SplitJavaExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[SplitJavaExpr], "graft_split_java")
}

/** `graft_repetition(tokens, n)` — per-document n-gram repetition
  * stats struct in one compiled pass, replacing an explode plus TWO
  * hash aggregates (a (doc, gram) count and a per-doc max/sum) with a
  * scan-level projection: the per-doc gram map lives for one row and
  * never crosses a shuffle. */
case class RepetitionStatsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  import VectorHashExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    checkStringArray(child, prettyName)
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = true),
    StructField("top_count", LongType, nullable = false)))
  override def prettyName: String = "graft_repetition"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.repetitionStats(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorOps.repetitionStats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : RepetitionStatsExpr = copy(child = newChild)
}

object RepetitionStatsExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[RepetitionStatsExpr],
      "graft_repetition")
}

/** `graft_winnow(text, k, w)` — the MOSS winnowing fingerprint SET of
  * one document in one compiled pass: md5 each of the n−k+1
  * character k-grams, slide a width-w window taking the minimum
  * (monotonic-deque, O(n) total), return the DISTINCT window minima
  * as lowercase md5 hex (the same values `md5(substr(text, p, k))`
  * yields engine-side and in the DuckDB oracle — hex over 16 fixed
  * bytes is order-isomorphic to the bytes, so byte-compares in the
  * deque pick exactly the hex-min). Replaces a per-CHARACTER-position
  * explode + md5 projection + per-doc window shuffle + global
  * distinct with a scan-level projection: the fingerprint stream
  * never crosses an exchange (r14 — the count()->force fix surfaced
  * the window chain as 2.8 s of hidden cost at sf0.1; this form is
  * the plan that should always have run). Documents shorter than
  * k+w−1 chars yield an empty set — identical to the windowed form's
  * full-windows-only filter. */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && w >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, k >= 1, w >= 1), got " +
        s"${child.dataType.catalogString}, k=$k, w=$w")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.winnow(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorOps.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowExpr = copy(child = newChild)
}

object WinnowExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[WinnowExpr], "graft_winnow")
}

/** `graft_nfc(str)` — Unicode NFC canonical composition as a codegen
  * expression (Spark ships no normalizer built-in). */
case class NfcExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.nfc(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorOps.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcExpr = copy(child = newChild)
}

object NfcExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[NfcExpr], "graft_nfc")
}

/** `graft_token_count(text, term)` — count of whitespace-split tokens
  * equal to `term`, bit-identical to
  * `size(filter(split(text, " ", -1), x => x === term))` (locked by
  * VectorHashExpressionsSpec): segments between single 0x20 bytes,
  * trailing/consecutive separators yielding empty segments included.
  * One byte scan, no array materialization — the BM25 tf hot path,
  * where the HOF form paid one interpreted lambda per token per term. */
case class TokenCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.plans.VectorOps.countToken(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VectorOps.countToken($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenCountExpr =
    copy(left = newLeft, right = newRight)
}

object TokenCountExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[TokenCountExpr], "graft_token_count")
}
