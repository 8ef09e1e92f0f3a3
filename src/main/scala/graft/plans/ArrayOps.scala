package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Custom Catalyst expressions for the near-dup kernels (SURVEY §7.3
  * preference order (b): a native Expression where built-ins can't express
  * the computation efficiently).
  *
  * `array_intersect` builds a boxed hash set PER ROW — on the blocked
  * Jaccard join that is 159k pairs × ~550 boxed longs at sf0.1 (~10 s,
  * the single hottest kernel in the bench). Over SORTED long arrays the
  * intersection size is a primitive two-pointer merge: `toLongArray()`
  * (one primitive copy), zero allocation, zero hashing. Sorting happens
  * once per DOCUMENT (codegen'd `sort_array`), not once per pair.
  */
case class LongSortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  /** Real codegen (not CodegenFallback): this expression lives in JOIN
    * conditions, and a fallback expression there knocks the entire join
    * stage out of whole-stage codegen — measured 2× on the blocked
    * Jaccard join.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
        int $i = 0; int $j = 0; int $c = 0;
        final int $nx = $a.numElements();
        final int $ny = $b.numElements();
        while ($i < $nx && $j < $ny) {
          final long $xi = $a.getLong($i);
          final long $yj = $b.getLong($j);
          if ($xi == $yj) { $c++; $i++; $j++; }
          else if ($xi < $yj) { $i++; } else { $j++; }
        }
        ${ev.value} = $c;
      """
    })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    // iterate ArrayData in place — toLongArray() would allocate a copy of
    // both arrays per PAIR (≈1.4 GB/s of garbage on the blocked join)
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    var xi = if (nx > 0) x.getLong(0) else 0L
    var yj = if (ny > 0) y.getLong(0) else 0L
    while (i < nx && j < ny) {
      if (xi == yj) {
        c += 1; i += 1; j += 1
        if (i < nx) xi = x.getLong(i)
        if (j < ny) yj = y.getLong(j)
      } else if (xi < yj) {
        i += 1; if (i < nx) xi = x.getLong(i)
      } else {
        j += 1; if (j < ny) yj = y.getLong(j)
      }
    }
    c
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sequential dot product of two double arrays: acc += a[i]·b[i] in index
  * order — the SAME accumulation order as DuckDB's `list_dot_product` (a
  * left fold), so results stay bit-identical across engines.
  *
  * Replaces the `aggregate(zip_with(...))` HOF the similarity pack used in
  * round 1: interpreted lambdas re-evaluate per element and block plan
  * canonicalization (no exchange reuse); this is one primitive loop inside
  * whole-stage codegen. Arrays shorter on one side stop at the shorter
  * length (zip semantics).
  */
case class DoubleArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_array_dot"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        final int $n = Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dense matrix–vector product against a DRIVER-CONSTANT matrix: returns
  * the array [dot(mat(0), v), …, dot(mat(rows-1), v)] with each dot
  * accumulated sequentially in index order (bit-identical to evaluating
  * `rows` independent `list_sum` comprehensions in DuckDB).
  *
  * Exists because the ANN signatures/assignments need `rows` projections
  * per input row: `rows` separate DoubleArrayDot calls generate `rows`
  * codegen loops (janino compile time grows with plan text and lands on
  * the first execution), and each re-reads the vector. This is ONE loop
  * nest over a flat `double[]` shipped via `addReferenceObj`.
  */
case class DoubleMatVec(child: Expression, mat: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val rows = mat.length
  private val dims = if (rows == 0) 0 else mat(0).length
  @transient private lazy val flat: Array[Double] = mat.flatten

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "double_mat_vec"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("matvecFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val out = ctx.freshName("out"); val base = ctx.freshName("base")
      s"""
        final int $n = Math.min($v.numElements(), $dims);
        final double[] $out = new double[$rows];
        for (int $j = 0; $j < $rows; $j++) {
          final int $base = $j * $dims;
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += $v.getDouble($i) * $matRef[$base + $i];
          }
          $out[$j] = $acc;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
      """
    })
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dims)
    val out = new Array[Double](rows)
    var j = 0
    while (j < rows) {
      val base = j * dims
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * flat(base + i); i += 1 }
      out(j) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The first 60 bits of md5(string) as a long, in ONE kernel — exactly
  * `conv(substring(md5(g), 1, 15), 16, 10)::long` (the repo-wide gram
  * hash, mirrored by every oracle as
  * `('0x' || substr(md5(g),1,15))::BIGINT`): the top 15 hex nibbles are
  * the big-endian first 8 digest bytes shifted right 4. The composed
  * form pays a 32-char hex encode, a substring, and a radix-16 string
  * parse per gram ON TOP of the digest — measured ~5 µs/gram; at q37's
  * 1.47M grams (sf0.1) the plumbing alone was ~3 s of the query. The
  * digest instance is thread-local (MessageDigest is stateful and
  * generated code shares references across threads in local mode).
  */
case class Md5Prefix64(child: Expression, hexStart: Int = 1)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(hexStart == 1 || hexStart == 17,
    "only the byte-aligned md5 halves (hexStart 1 or 17) are supported")
  private val byteStart = (hexStart - 1) / 2

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "md5_prefix64"

  @transient private lazy val digests =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Called from both eval and generated code. */
  def hash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var acc = 0L
    var i = byteStart
    while (i < byteStart + 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5prefix", this,
      classOf[Md5Prefix64].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.hash($v);")
  }

  override protected def nullSafeEval(input: Any): Any =
    hash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Whitespace-token COUNT without the token array: equivalent by
  * definition to `size(array_remove(split(text, " +"), ""))` (the
  * engine-wide token rule, `TextOps.tokens`) but computed as a single
  * byte scan counting maximal runs of non-space bytes. The composed form
  * regex-splits and materializes every token as a UTF8String slice just
  * to take the array's size — on count-only consumers (token stats,
  * packing, BM25 doc lengths) that is the dominant per-row cost. The
  * byte scan is exact for UTF-8: 0x20 never occurs inside a multi-byte
  * sequence, and the " +" pattern matches only ASCII spaces.
  * KernelFuzzSpec pins kernel ≡ composition.
  */
case class TokenCount(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  /** Called from both eval and generated code. */
  def count(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    val n = s.numBytes
    var i = 0; var c = 0; var inTok = false
    while (i < n) {
      if (s.getByte(i) == 0x20) inTok = false
      else { if (!inTok) c += 1; inTok = true }
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokencount", this, classOf[TokenCount].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.count($v);")
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Content-defined-chunking boundary positions in ONE codegen pass: the
  * 1-based positions `i ∈ [window, len]` where the md5 of the trailing
  * `window`-char slice satisfies `u32BE(digest[0..3]) mod 2^modBits = 0` —
  * bit-identical to the oracle's `('0x' || substr(md5(win), 1, 8))::BIGINT
  * % 2^modBits` (the first 8 hex chars ARE the first 4 digest bytes, and
  * for modBits ≤ 32 the mod is a mask), with no hex rendering at all.
  *
  * Why a kernel: the declarative form is `filter(sequence(window, len),
  * i -> pmod(conv(substring(md5(substr(...)))...)))` — a higher-order
  * lambda, which Spark evaluates INTERPRETED per element (the r03 HOF
  * lesson): at sf0.1 that is ~1.5M interpreted md5+substr+conv pipelines
  * and the single most expensive scan stage in the suite (measured 6.1 s
  * of q105's 6.7 s). The kernel digests byte slices of one UTF-8 copy
  * per row (ASCII fast path; a char-sliced fallback keeps non-ASCII
  * positions character-based, matching both engines' substr semantics).
  * A production CDC would swap the per-window md5 for a rolling Rabin
  * polynomial — O(1) per position — without changing this contract.
  */
case class CdcBoundaries(child: Expression, window: Int, modBits: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(window >= 2 && modBits >= 1 && modBits <= 20,
    s"need window >= 2 and modBits in [1, 20], got $window/$modBits")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val mask: Int = (1 << modBits) - 1

  /** Called from both eval and generated code. */
  def boundaries(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    val out = new java.util.ArrayList[Integer]()
    val digest = md.get()
    if (ascii) {
      var p = window
      while (p <= bytes.length) {
        digest.reset()
        digest.update(bytes, p - window, window)
        val d = digest.digest()
        val u32 = ((d(0) & 0xFF) << 24) | ((d(1) & 0xFF) << 16) |
          ((d(2) & 0xFF) << 8) | (d(3) & 0xFF)
        if ((u32 & mask) == 0) out.add(p)
        p += 1
      }
    } else {
      // char-positioned fallback: windows are CHARACTER slices re-encoded
      // UTF-8, exactly substr semantics in both engines
      val str = s.toString
      var p = window
      while (p <= str.length) {
        val d = digest.digest(
          str.substring(p - window, p).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val u32 = ((d(0) & 0xFF) << 24) | ((d(1) & 0xFF) << 16) |
          ((d(2) & 0xFF) << 8) | (d(3) & 0xFF)
        if ((u32 & mask) == 0) out.add(p)
        p += 1
      }
    }
    val arr = new Array[Int](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    ArrayData.toArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcbounds", this,
      classOf[CdcBoundaries].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.boundaries($v);")
  }

  override protected def nullSafeEval(input: Any): Any =
    boundaries(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Banded Levenshtein with a PER-PAIR threshold: returns `lev(a, b)` when
  * it is ≤ k, −1 otherwise. Spark's `levenshtein(l, r, threshold)` takes
  * only a SCALAR threshold, so a pair join has to size it for the worst
  * pair in the corpus (the corpus max length) — at minSim 0.8 and
  * max-len 577 that is a 116-wide band even for 150-char pairs whose own
  * admission bound is 30. Threading the bound through as a third COLUMN
  * (`floor((1−t′)·max(la,lb))`) lets every pair run the tightest band
  * its own final filter can admit.
  *
  * Kernel shape: two-row DP restricted to the diagonal band |i−j| ≤ k,
  * values capped at k+1 (the band sentinel), EARLY EXIT as soon as a
  * row's minimum exceeds k — a rejected pair costs O(k·min(la,lb)) at
  * worst and typically exits after ~k/ρ rows (ρ = the pair's per-row
  * distance growth), not the full O(la·lb) matrix. Any alignment path
  * with cost ≤ k stays inside the band, so the banded value equals the
  * exact distance whenever it is returned (KernelFuzzSpec pins kernel ≡
  * full DP on random pairs, both sides of the threshold).
  *
  * Unit note: operates on UTF-16 code units (String.charAt). Spark's
  * builtin counts CODEPOINTS and DuckDB's counts BYTES — all three agree
  * exactly on ASCII, which callers must guarantee (editSimilarityPairs
  * pre-filters `^[\\x00-\\x7F]*$` for this reason).
  */
case class LevenshteinWithin(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "levenshtein_within"

  /** Called from both eval and generated code. */
  def banded(l: org.apache.spark.unsafe.types.UTF8String,
             r: org.apache.spark.unsafe.types.UTF8String, k0: Int): Int = {
    if (k0 < 0) return -1
    val a = l.toString; val b = r.toString
    val la = a.length; val lb = b.length
    if (la == 0) return if (lb <= k0) lb else -1
    if (lb == 0) return if (la <= k0) la else -1
    // lev never exceeds max(la, lb): clamping k keeps the sentinel k+1
    // from overflowing on a caller passing Int.MaxValue-ish bounds, and
    // never changes the result
    val k = math.min(k0, math.max(la, lb))
    if (math.abs(la - lb) > k) return -1
    val inf = k + 1
    var prev = new Array[Int](lb + 2)
    var curr = new Array[Int](lb + 2)
    var j = 0
    while (j <= lb) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= la) {
      val lo = math.max(1, i - k)
      val hi = math.min(lb, i + k)
      // left band edge: the true value is i when the cell is in band
      // (lo == 1 and i <= k), the sentinel otherwise
      curr(lo - 1) = if (i - k <= 0) math.min(i, inf) else inf
      var rowMin = inf
      val ai = a.charAt(i - 1)
      var jj = lo
      while (jj <= hi) {
        val cost = if (ai == b.charAt(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = curr(jj - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        curr(jj) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      if (rowMin > k) return -1
      // right band edge: the next row reads prev(hi + 1); it must be the
      // sentinel, not a stale value from two rows back
      if (hi + 1 <= lb) curr(hi + 1) = inf
      val tmp = prev; prev = curr; curr = tmp
      i += 1
    }
    if (prev(lb) <= k) prev(lb) else -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("levwithin", this,
      classOf[LevenshteinWithin].getName)
    nullSafeCodeGen(ctx, ev, (a, b, k) => s"${ev.value} = $ref.banded($a, $b, $k);")
  }

  override protected def nullSafeEval(a: Any, b: Any, k: Any): Any =
    banded(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      k.asInstanceOf[Int])

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** One greedy left-to-right BPE merge pass over a symbol array: every
  * non-overlapping occurrence of the adjacent pair (l, r) becomes the
  * single symbol l+r. Greedy matters only when l == r ("aaaa" with
  * merge (a,a) → [aa, aa], not three overlapping candidates) — the
  * standard tokenizer-training semantics. A kernel because Spark has no
  * builtin for stateful adjacent-pair rewriting and a higher-order
  * `aggregate` lambda would be interpreted per element
  * (CodegenFallback); this stays a primitive loop inside whole-stage
  * codegen, so each training round's merge is a pure projection.
  * BpeSpec fuzzes it against an independent Scala reference.
  */
case class BpeMergePair(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_pair"

  def merge(arr: ArrayData, l: org.apache.spark.unsafe.types.UTF8String,
            r: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0; var k = 0
    while (i < n) {
      if (i < n - 1 && arr.getUTF8String(i) == l && arr.getUTF8String(i + 1) == r) {
        out(k) = org.apache.spark.unsafe.types.UTF8String.concat(l, r)
        i += 2
      } else {
        out(k) = arr.getUTF8String(i)
        i += 1
      }
      k += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpemerge", this, classOf[BpeMergePair].getName)
    nullSafeCodeGen(ctx, ev, (a, l, r) => s"${ev.value} = $ref.merge($a, $l, $r);")
  }

  override protected def nullSafeEval(a: Any, l: Any, r: Any): Any =
    merge(a.asInstanceOf[ArrayData],
      l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Centroid dots + argmax cell in ONE pass: returns
  * `[dot(c_0, v), …, dot(c_{rows-1}, v), bestCell]` (length rows+1) —
  * the matVec result with the 0-based index of the FIRST centroid
  * attaining the maximum 6-dp-rounded cosine appended. The argmax is
  * bit-equivalent to `array_position(ccos, array_max(ccos)) - 1` over
  * `ccos = [round(cd_c / (cnorm_c · vn), 6)]`: same truncated dot
  * (min(len, dims)), same full-length vn, same shortest-decimal HALF_UP
  * rounding as Catalyst's `Round` (which passes NaN/Infinity through
  * unrounded), and the comparison uses `Double.compare` — NaN ranks
  * greatest and the first max wins, exactly Spark's array_max/
  * array_position ordering, so degenerate rows (a zero-norm centroid →
  * NaN cosine) assign identically to the composed form.
  *
  * One kernel for BOTH outputs because each alone loses: the composed
  * argmax is PRUNING-HOSTILE (a consumer keeping `cell` but dropping
  * `ccos` makes column pruning inline the matVec into 2·C array
  * elements; codegen overflows and the interpreted fallback has no CSE —
  * measured 33× on the q74 within-cell join), while a cell-only kernel
  * beside a separate matVec makes consumers that keep both pay the
  * C·dims dots twice. Consumers needing only `cell` read the last
  * element — pruning inlines ONE kernel call.
  */
case class DoubleMatVecArgMaxCos(child: Expression, mat: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val rows = mat.length
  private val dims = if (rows == 0) 0 else mat(0).length
  @transient private lazy val flat: Array[Double] = mat.flatten
  @transient private lazy val norms: Array[Double] = mat.map { v =>
    var acc = 0.0; var i = 0
    while (i < v.length) { acc += v(i) * v(i); i += 1 }
    math.sqrt(acc)
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "double_mat_vec_argmax_cos"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("argmaxFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("argmaxNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val n = ctx.freshName("n"); val nf = ctx.freshName("nf")
      val x = ctx.freshName("x"); val base = ctx.freshName("base")
      val vn = ctx.freshName("vn"); val acc = ctx.freshName("acc")
      val cos = ctx.freshName("cos"); val r = ctx.freshName("r")
      val best = ctx.freshName("best"); val bestR = ctx.freshName("bestR")
      val out = ctx.freshName("out")
      s"""
        final int $n = Math.min($v.numElements(), $dims);
        final int $nf = $v.numElements();
        final double[] $out = new double[$rows + 1];
        double $vn = 0.0;
        for (int $i = 0; $i < $nf; $i++) {
          final double $x = $v.getDouble($i);
          $vn += $x * $x;
        }
        $vn = Math.sqrt($vn);
        int $best = 0; double $bestR = Double.NEGATIVE_INFINITY;
        for (int $c = 0; $c < $rows; $c++) {
          double $acc = 0.0;
          final int $base = $c * $dims;
          for (int $i = 0; $i < $n; $i++) {
            $acc += $v.getDouble($i) * $matRef[$base + $i];
          }
          $out[$c] = $acc;
          final double $cos = $acc / ($normRef[$c] * $vn);
          final double $r = Double.isFinite($cos)
            ? java.math.BigDecimal.valueOf($cos)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            : $cos;
          if (Double.compare($r, $bestR) > 0) { $bestR = $r; $best = $c; }
        }
        $out[$rows] = (double) $best;
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
      """
    })
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dims)
    val nf = v.numElements()
    val out = new Array[Double](rows + 1)
    var vn = 0.0
    var i = 0
    while (i < nf) { val x = v.getDouble(i); vn += x * x; i += 1 }
    vn = math.sqrt(vn)
    var best = 0
    var bestR = Double.NegativeInfinity
    var c = 0
    while (c < rows) {
      var acc = 0.0
      val base = c * dims
      i = 0
      while (i < n) { acc += v.getDouble(i) * flat(base + i); i += 1 }
      out(c) = acc
      val cos = acc / (norms(c) * vn)
      val r = if (java.lang.Double.isFinite(cos))
        java.math.BigDecimal.valueOf(cos)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      else cos
      if (java.lang.Double.compare(r, bestR) > 0) { bestR = r; best = c }
      c += 1
    }
    out(rows) = best.toDouble
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-row scalar-quantization statistics: quantizes an array<double> to
  * `levels` uniform levels between its own min and max and returns
  * `[vmin, vmax, sse_micro]` — the reconstruction squared error snapped
  * per ELEMENT to integer micro-units (`floor(d²·1e6 + 0.5)`) and summed
  * as an exact integer, so the result is bit-identical to a DuckDB
  * `list_transform` mirror regardless of either engine's summation order
  * (PLANS.md numerics doctrine). A constant vector (vmax == vmin) has
  * zero error by definition; an EMPTY array returns [0, 0, 0] (callers
  * with nullable/ragged inputs filter first — embeddings are fixed-dim).
  *
  * One scan-stage loop, zero shuffle: the whole int8-quantization quality
  * audit (the "can we store these embeddings quantized?" question) runs
  * at input-split parallelism. `sse_micro` rides as an exact
  * integer-valued double (max 64 dims × 4e6 micro ≪ 2^53).
  */
case class DoubleArrayQuantStats(child: Expression, levels: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(levels >= 2, "quantization needs at least 2 levels")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "double_array_quant_stats"

  private val denom: Double = (levels - 1).toDouble

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val mn = ctx.freshName("mn"); val mx = ctx.freshName("mx")
      val sc = ctx.freshName("sc"); val acc = ctx.freshName("acc")
      val x = ctx.freshName("x"); val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      s"""
        final int $n = $v.numElements();
        final double[] $out = new double[3];
        if ($n > 0) {
          double $mn = $v.getDouble(0); double $mx = $mn;
          for (int $i = 1; $i < $n; $i++) {
            final double $x = $v.getDouble($i);
            if ($x < $mn) $mn = $x;
            if ($x > $mx) $mx = $x;
          }
          long $acc = 0L;
          if ($mx != $mn) {
            final double $sc = ($mx - $mn) / $denom;
            for (int $i = 0; $i < $n; $i++) {
              final double $x = $v.getDouble($i);
              final double $d = $x - ($mn + Math.floor(($x - $mn) / $sc + 0.5) * $sc);
              $acc += (long) Math.floor($d * $d * 1e6 + 0.5);
            }
          }
          $out[0] = $mn; $out[1] = $mx; $out[2] = (double) $acc;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
      """
    })

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Double](3)
    if (n > 0) {
      var mn = v.getDouble(0); var mx = mn
      var i = 1
      while (i < n) {
        val x = v.getDouble(i)
        if (x < mn) mn = x
        if (x > mx) mx = x
        i += 1
      }
      var acc = 0L
      if (mx != mn) {
        val sc = (mx - mn) / denom
        i = 0
        while (i < n) {
          val x = v.getDouble(i)
          val d = x - (mn + math.floor((x - mn) / sc + 0.5) * sc)
          acc += math.floor(d * d * 1e6 + 0.5).toLong
          i += 1
        }
      }
      out(0) = mn; out(1) = mx; out(2) = acc.toDouble
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** PQ-ENCODE kernel (r15 — the F4 treatment applied to product
  * quantization): per subspace s of a dims = m·dsub vector, the
  * argmin-SSE code against an m×ksub×dsub codebook, computed over the
  * RESIDUAL v − base (pass a zeros base for raw-subvector PQ: IEEE
  * x − 0.0 is bit-identical to x, including −0.0 and NaN, so the raw
  * path is exactly the old slice form). Returns
  * array<struct<subspace, code, sse_micro, rsub>> of length m — code
  * and snapped SSE for every consumer, plus the residual subvector the
  * TRAINER's mean update needs (audit/encode consumers drop the field;
  * computing it is free — the loop materializes the residual anyway).
  *
  * Why a kernel: the expression form fans out m·ksub candidate trees
  * (each a slice + two dot kernels + the snap); at the artifact sizes
  * (m=8, ksub=16 → 128 candidates) the single generated consume
  * method crosses janino's 64 KB cap and the WHOLE projection falls
  * back to interpreted eval — measured on the r15 retrain log (3
  * fallbacks; SCALE.md §10 "known limit", now closed). One kernel call
  * per row keeps PQ encode inside whole-stage codegen at ANY m·ksub.
  *
  * Numerics are the expression path's exactly (KernelFuzzSpec pins it
  * against an independent reference; the q134/q158/q207/q218 oracles
  * pin it against DuckDB): residual = v_i − base_i elementwise;
  * aa = Σ r_i² and ab = Σ r_i·cv_i as sequential index-order folds;
  * SSE = (aa − 2.0·ab) + cv·cv with the codebook self-dot precomputed
  * ONCE on the driver with the same fold (`lit(seqSelfDot(cv))` in the
  * old form); micro-snap floor(x·1e6 + 0.5) BEFORE the argmin so both
  * engines compare identical longs; ties keep the LOWEST code (strict
  * `<` while scanning codes ascending ≡ the old min(struct(sse, code))).
  * Inputs shorter than m·dsub fail LOUDLY — the old slice form would
  * silently score truncated subvectors, and every registered input is
  * fixed-width.
  */
case class DoublePqEncode(left: Expression, right: Expression,
                          m: Int, ksub: Int,
                          cb: Array[Array[Array[Double]]])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(cb.length == m && cb.forall(_.length == ksub),
    s"codebook must be m=$m × ksub=$ksub")
  private val dsub = cb(0)(0).length
  require(cb.forall(_.forall(_.length == dsub)),
    s"every codebook entry must carry dsub=$dsub dims")

  // s-major, then code, then dim — one flat read-only array per task
  @transient private lazy val flat: Array[Double] =
    cb.flatten.flatten
  @transient private lazy val selfDots: Array[Double] =
    cb.flatten.map { v =>
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i) * v(i); i += 1 }
      acc
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("subspace",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("code",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("sse_micro",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rsub",
          org.apache.spark.sql.types.ArrayType(DoubleType,
            containsNull = false), nullable = false))),
      containsNull = false)
  override def prettyName: String = "double_pq_encode"

  /** Called from both eval and generated code. */
  def encode(v: ArrayData, base: ArrayData): ArrayData = {
    val dims = m * dsub
    require(v.numElements() >= dims && base.numElements() >= dims,
      s"pq_encode needs >= $dims dims, got vector ${v.numElements()} / " +
        s"base ${base.numElements()}")
    val out = new Array[Any](m)
    val r = new Array[Double](dsub)
    var s = 0
    while (s < m) {
      val off = s * dsub
      var aa = 0.0
      var i = 0
      while (i < dsub) {
        val x = v.getDouble(off + i) - base.getDouble(off + i)
        r(i) = x
        i += 1
      }
      i = 0
      while (i < dsub) { aa += r(i) * r(i); i += 1 }
      var bestCode = 0
      var bestSse = Long.MaxValue
      var c = 0
      while (c < ksub) {
        val cOff = (s * ksub + c) * dsub
        var ab = 0.0
        i = 0
        while (i < dsub) { ab += r(i) * flat(cOff + i); i += 1 }
        val sse = (aa - 2.0 * ab) + selfDots(s * ksub + c)
        val sseM = math.floor(sse * 1e6 + 0.5).toLong
        if (sseM < bestSse) { bestSse = sseM; bestCode = c }
        c += 1
      }
      out(s) = org.apache.spark.sql.catalyst.InternalRow(
        s, bestCode, bestSse,
        ArrayData.toArrayData(java.util.Arrays.copyOf(r, dsub)))
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqencode", this, classOf[DoublePqEncode].getName)
    nullSafeCodeGen(ctx, ev, (v, b) => s"${ev.value} = $ref.encode($v, $b);")
  }

  override protected def nullSafeEval(v: Any, b: Any): Any =
    encode(v.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Shared emit + types of the two term-frequency kernels below. The
  * accumulation is a per-row open-addressing hash (distinct terms per
  * document are tiny against occurrences — measured ~42× compression on
  * the sf0.1 char-3-gram corpus — so hashing occurrences beats sorting
  * them: the first cut of these kernels TimSorted all ~30M gram objects
  * and that sort WAS the remaining q220 cost). Only the DISTINCT terms
  * are sorted at emit (binary UTF8 order — canonical, so recomputed
  * partitions emit identical arrays). Null terms fail LOUDLY: the
  * registered feature families (whitespace tokens, char n-grams) never
  * produce null elements, and a silent null group would shift the
  * smoothing V count against the oracle.
  */
private[plans] object TermRle {
  private val RowCmp: java.util.Comparator[AnyRef] =
    new java.util.Comparator[AnyRef] {
      override def compare(a: AnyRef, b: AnyRef): Int =
        a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].getUTF8String(0)
          .compareTo(
            b.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].getUTF8String(0))
    }

  /** Sort the distinct (term, count) rows by term and wrap. */
  def emit(rows: Array[AnyRef]): ArrayData = {
    java.util.Arrays.sort(rows, RowCmp)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rows.asInstanceOf[Array[Any]])
  }

  val pairType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.LongType, nullable = false))),
      containsNull = false)
}

/** CHAR-N-GRAM TERM-FREQUENCY kernel (r15, the q220 follow-through):
  * the per-document (term, count) table of character n-grams, computed
  * in ONE codegen pass per row — array<struct<term, c>> sorted by term.
  *
  * Why a kernel: the declarative form is `transform(sequence(1,
  * len−n+1), i -> substr(text, i, n))` — a higher-order lambda Spark
  * evaluates INTERPRETED per element (the r03 HOF lesson; ~30M
  * interpreted substr pipelines at sf0.1) — followed by an explode +
  * groupBy(doc, term) whose shuffle ships every raw OCCURRENCE. Char
  * grams are ~10× repeat-heavy, so aggregating inside the row kernel
  * ships nothing at all: the NB core's biggest exchange disappears and
  * the gram materialization drops out of interpreted eval.
  *
  * Gram extraction matches Spark's `substr` (and DuckDB's) exactly:
  * grams are CODEPOINT slices. One pass records the byte offset of
  * every UTF-8 char start (a non-continuation byte); gram i is the
  * byte range [off(i), off(i+n)) wrapped zero-copy. Strings shorter
  * than n codepoints yield an empty array (the `when(length >= n)`
  * branch of the declarative form).
  */
case class CharNgramRleCounts(child: Expression, n: Int,
                              prefix: String = "")
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(n >= 1, s"char n-gram width $n < 1")

  override def dataType: DataType = TermRle.pairType
  override def prettyName: String = "char_ngram_rle_counts"

  // the constant term prefix as UTF8 bytes, built once per JVM
  // (transient — the expression ships to executors inside codegen
  // references); empty prefix keeps the zero-copy emit path
  @transient private lazy val prefixU8 =
    org.apache.spark.unsafe.types.UTF8String.fromString(prefix)

  /** Called from both eval and generated code. Zero allocation per
    * OCCURRENCE: grams are hashed and compared as (start, end) byte
    * slices against the open table; a UTF8String is wrapped only once
    * per DISTINCT term at emit.
    */
  def counts(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    // char-start byte offsets (UTF-8 continuation bytes are 10xxxxxx)
    var nc = 0
    var bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xC0) != 0x80) nc += 1
      bi += 1
    }
    if (nc < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    val offs = new Array[Int](nc + 1)
    var ci = 0
    bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xC0) != 0x80) { offs(ci) = bi; ci += 1 }
      bi += 1
    }
    offs(nc) = bytes.length
    val m = nc - n + 1
    // open-addressing table keyed by the gram's char-start index; slot
    // empty = -1. Grows by rehash at load > 0.6 (distinct terms per doc
    // are typically far below the occurrence count).
    var cap = 64
    var keyAt = new Array[Int](cap); java.util.Arrays.fill(keyAt, -1)
    var cnt = new Array[Long](cap)
    var used = 0

    def hashSlice(a: Int, b: Int): Int = {
      var h = 1; var p = a
      while (p < b) { h = 31 * h + bytes(p); p += 1 }
      h & 0x7FFFFFFF
    }
    def sliceEq(a1: Int, b1: Int, a2: Int, b2: Int): Boolean = {
      if (b1 - a1 != b2 - a2) return false
      var p = a1; var q = a2
      while (p < b1) { if (bytes(p) != bytes(q)) return false; p += 1; q += 1 }
      true
    }

    var i = 0
    while (i < m) {
      val a = offs(i); val b = offs(i + n)
      var idx = hashSlice(a, b) & (cap - 1)
      while (keyAt(idx) != -1 &&
        !sliceEq(offs(keyAt(idx)), offs(keyAt(idx) + n), a, b))
        idx = (idx + 1) & (cap - 1)
      if (keyAt(idx) == -1) {
        keyAt(idx) = i; cnt(idx) = 1L; used += 1
        if (used * 5 > cap * 3) { // load > 0.6 → double + rehash
          val oldKey = keyAt; val oldCnt = cnt
          cap <<= 1
          keyAt = new Array[Int](cap); java.util.Arrays.fill(keyAt, -1)
          cnt = new Array[Long](cap)
          var j = 0
          while (j < oldKey.length) {
            val k = oldKey(j)
            if (k != -1) {
              var nx = hashSlice(offs(k), offs(k + n)) & (cap - 1)
              while (keyAt(nx) != -1) nx = (nx + 1) & (cap - 1)
              keyAt(nx) = k; cnt(nx) = oldCnt(j)
            }
            j += 1
          }
        }
      } else cnt(idx) += 1L
      i += 1
    }
    val rows = new Array[AnyRef](used)
    val withPrefix = prefix.nonEmpty
    var j = 0; var r = 0
    while (j < cap) {
      val k = keyAt(j)
      if (k != -1) {
        val g = org.apache.spark.unsafe.types.UTF8String.fromBytes(
          bytes, offs(k), offs(k + n) - offs(k))
        rows(r) = org.apache.spark.sql.catalyst.InternalRow(
          if (withPrefix)
            org.apache.spark.unsafe.types.UTF8String.concat(prefixU8, g)
          else g,
          cnt(j))
        r += 1
      }
      j += 1
    }
    TermRle.emit(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cgramrle", this,
      classOf[CharNgramRleCounts].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.counts($v);")
  }

  override protected def nullSafeEval(input: Any): Any =
    counts(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** TERM-FREQUENCY RLE over an ALREADY-TOKENIZED array<string> — the
  * [[CharNgramRleCounts]] contract for feature families whose gram
  * extraction is itself codegen'd (whitespace tokens via
  * `array_remove(split(..))`): per-row array<struct<term, c>> sorted
  * by term, no explode + groupBy exchange. Null elements fail loudly
  * (see [[TermRle]]).
  */
case class StringArrayRleCounts(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = TermRle.pairType
  override def prettyName: String = "string_rle_counts"

  /** Called from both eval and generated code. Open table keyed by the
    * element objects (UTF8String hashCode/equals — bytes-based). */
  def counts(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    if (m == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    var cap = 64
    var keys = new Array[org.apache.spark.unsafe.types.UTF8String](cap)
    var cnt = new Array[Long](cap)
    var used = 0
    var i = 0
    while (i < m) {
      val g = arr.getUTF8String(i)
      require(g != null, "rle_counts: null term element")
      var idx = (g.hashCode & 0x7FFFFFFF) & (cap - 1)
      while (keys(idx) != null && !keys(idx).equals(g))
        idx = (idx + 1) & (cap - 1)
      if (keys(idx) == null) {
        keys(idx) = g; cnt(idx) = 1L; used += 1
        if (used * 5 > cap * 3) { // load > 0.6 → double + rehash
          val oldKeys = keys; val oldCnt = cnt
          cap <<= 1
          keys = new Array[org.apache.spark.unsafe.types.UTF8String](cap)
          cnt = new Array[Long](cap)
          var j = 0
          while (j < oldKeys.length) {
            val k = oldKeys(j)
            if (k != null) {
              var nx = (k.hashCode & 0x7FFFFFFF) & (cap - 1)
              while (keys(nx) != null) nx = (nx + 1) & (cap - 1)
              keys(nx) = k; cnt(nx) = oldCnt(j)
            }
            j += 1
          }
        }
      } else cnt(idx) += 1L
      i += 1
    }
    val rows = new Array[AnyRef](used)
    var j = 0; var r = 0
    while (j < cap) {
      if (keys(j) != null) {
        rows(r) = org.apache.spark.sql.catalyst.InternalRow(keys(j), cnt(j))
        r += 1
      }
      j += 1
    }
    TermRle.emit(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("strrle", this,
      classOf[StringArrayRleCounts].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.counts($v);")
  }

  override protected def nullSafeEval(input: Any): Any =
    counts(input.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ArrayOps {
  private val FnName = "sorted_intersect_count"
  private val DotName = "double_array_dot"

  /** Register the temp function once per (session, name): every call site
    * used to `createOrReplaceTempFunction` unconditionally, flooding logs
    * with SimpleFunctionRegistry "function replaced" warnings. An
    * existence probe is the correct idempotence key — `matVec` names carry
    * a matrix content hash, so an existing name always maps to the same
    * builder. The check-then-register race is benign (worst case: one
    * replace warning).
    */
  private def ensureRegistered(spark: SparkSession, name: String,
                               builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }

  /** Column API for the expression; registers the session function on
    * first use (Column construction from a raw Expression is not public
    * API in Spark 4, the registry route is).
    */
  def sortedIntersectCount(df: DataFrame, a: String, b: String): Column = {
    ensureRegistered(df.sparkSession, FnName,
      exprs => LongSortedIntersectCount(exprs(0), exprs(1)))
    // a/b are SQL column references (possibly alias-qualified, e.g. "a.sh")
    org.apache.spark.sql.functions.expr(s"$FnName($a, $b)")
  }

  /** Column-typed API for the dot kernel (works on arbitrary Column args
    * via the registry + `call_function` resolution). */
  def doubleDot(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark, DotName, exprs => DoubleArrayDot(exprs(0), exprs(1)))
    org.apache.spark.sql.functions.call_function(DotName, a, b)
  }

  /** Column-typed API for the matrix kernel. The matrix is captured in the
    * registered function closure; the registry name carries a content key
    * so distinct matrices never collide in a session. */
  def matVec(spark: SparkSession, v: Column, mat: Array[Array[Double]],
             key: String): Column = {
    val name = s"double_mat_vec_$key"
    ensureRegistered(spark, name, exprs => DoubleMatVec(exprs(0), mat))
    org.apache.spark.sql.functions.call_function(name, v)
  }

  /** Column-typed API for the md5-prefix gram hash kernel (hexStart 1 or
    * 17 — the two byte-aligned 60-bit halves of the digest). */
  /** Column-typed API for the whitespace-token-count kernel. */
  def tokenCount(spark: SparkSession, text: Column): Column = {
    val name = "token_count_kernel"
    ensureRegistered(spark, name, exprs => TokenCount(exprs(0)))
    org.apache.spark.sql.functions.call_function(name, text)
  }

  /** Column-typed API for the CDC boundary kernel. */
  def cdcBoundaries(spark: SparkSession, text: Column, window: Int,
                    modBits: Int): Column = {
    val name = s"cdc_boundaries_w${window}_m$modBits"
    ensureRegistered(spark, name,
      exprs => CdcBoundaries(exprs(0), window, modBits))
    org.apache.spark.sql.functions.call_function(name, text)
  }

  /** Column-typed API for the per-pair banded Levenshtein kernel. */
  def levenshteinWithin(spark: SparkSession, a: Column, b: Column,
                        k: Column): Column = {
    val name = "levenshtein_within"
    ensureRegistered(spark, name,
      exprs => LevenshteinWithin(exprs(0), exprs(1), exprs(2)))
    org.apache.spark.sql.functions.call_function(name, a, b, k)
  }

  def md5Prefix64(spark: SparkSession, g: Column, hexStart: Int = 1): Column = {
    val name = s"md5_prefix64_h$hexStart"
    ensureRegistered(spark, name, exprs => Md5Prefix64(exprs(0), hexStart))
    org.apache.spark.sql.functions.call_function(name, g)
  }

  /** Column-typed API for the argmax-cosine cell kernel; the caller's
    * content key (same scheme as [[matVec]]) keeps distinct matrices from
    * colliding in the session registry. */
  def matVecArgMaxCos(spark: SparkSession, v: Column, mat: Array[Array[Double]],
                      key: String): Column = {
    val name = s"double_mat_vec_argmax_cos_$key"
    ensureRegistered(spark, name, exprs => DoubleMatVecArgMaxCos(exprs(0), mat))
    org.apache.spark.sql.functions.call_function(name, v)
  }

  /** Column-typed API for the quantization-stats kernel; the level count
    * rides in the registry name (distinct level settings never collide). */
  def quantStats(spark: SparkSession, v: Column, levels: Int): Column = {
    val name = s"double_array_quant_stats_$levels"
    ensureRegistered(spark, name, exprs => DoubleArrayQuantStats(exprs(0), levels))
    org.apache.spark.sql.functions.call_function(name, v)
  }

  /** Column-typed API for the PQ-encode kernel; the caller's content
    * key (the matVec scheme — an md5 over the codebook doubles) keeps
    * distinct codebooks from colliding in the session registry. */
  def pqEncode(spark: SparkSession, v: Column, base: Column, m: Int,
               ksub: Int, cb: Array[Array[Array[Double]]],
               key: String): Column = {
    val name = s"double_pq_encode_$key"
    ensureRegistered(spark, name,
      exprs => DoublePqEncode(exprs(0), exprs(1), m, ksub, cb))
    org.apache.spark.sql.functions.call_function(name, v, base)
  }

  /** Column-typed API for the BPE merge kernel; the pair rides in as
    * literal columns so ONE registry entry serves every training round.
    */
  def bpeMergePair(spark: SparkSession, syms: Column, l: Column, r: Column): Column = {
    val name = "bpe_merge_pair"
    ensureRegistered(spark, name, exprs => BpeMergePair(exprs(0), exprs(1), exprs(2)))
    org.apache.spark.sql.functions.call_function(name, syms, l, r)
  }

  /** Column-typed API for the char-n-gram term-frequency kernel; the
    * width (and the width-prefix flag) ride in the registry name
    * (distinct configurations never collide). `widthPrefixed` emits
    * terms as "n|gram" — the collision-free term namespace a
    * MIXED-WIDTH feature union needs (VERDICT r15 #5): concat several
    * prefixed kernels and the (term, c) pairs from different widths
    * can never alias ("ab" as a 2-gram vs "ab" inside a 3-gram table).
    */
  def charNgramRleCounts(spark: SparkSession, text: Column, n: Int,
                         widthPrefixed: Boolean = false): Column = {
    val name =
      if (widthPrefixed) s"char_ngram_rle_counts_${n}_wp"
      else s"char_ngram_rle_counts_$n"
    ensureRegistered(spark, name, exprs =>
      CharNgramRleCounts(exprs(0), n, if (widthPrefixed) s"$n|" else ""))
    org.apache.spark.sql.functions.call_function(name, text)
  }

  /** Column-typed API for the array<string> term-frequency kernel. */
  def stringRleCounts(spark: SparkSession, arr: Column): Column = {
    val name = "string_rle_counts"
    ensureRegistered(spark, name, exprs => StringArrayRleCounts(exprs(0)))
    org.apache.spark.sql.functions.call_function(name, arr)
  }
}
