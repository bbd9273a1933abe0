package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native deletion-neighborhood expression (FastSS blocking keys for
 * graft.operators.Enrich.fuzzySelfMatch).
 *
 * Why native: the depth-d neighborhood is inherently iterative — "apply
 * 1-character deletions to the previous level, dedup, repeat". Composed
 * from built-ins (`array_union(nb, flatten(transform(nb, deletions)))`
 * folded d times) each level's expression TREE embeds the previous level
 * several times, so Catalyst evaluates the level-1 set O(7^d) times per
 * row — measured 42 s for the e4 catalog query at sf0.1 where this
 * expression runs it in well under a second. One BFS with a hash-set
 * dedup per row is the honest cost: ~len²·depth short substring builds.
 *
 * Evaluation is a static-helper call from generated code (same pattern as
 * [[FloatVecDotExact]]), so the surrounding projection stays inside
 * whole-stage codegen.
 *
 * Deletions operate on UTF-16 units (Java string positions); for
 * supplementary-plane characters a single user-perceived edit spans two
 * units — acceptable for the normalized name strings this blocks on.
 */
object TextOps {
  /** The string plus every variant reachable by deleting up to `depth`
    * characters, distinct, in BFS order (the original is element 0). */
  def deletionNeighborhood(s: UTF8String, depth: Int): ArrayData = {
    val str = s.toString
    val seen = new java.util.LinkedHashSet[String]()
    seen.add(str)
    var frontier: Array[String] = Array(str)
    var d = 0
    while (d < depth && frontier.nonEmpty) {
      val next = Array.newBuilder[String]
      var i = 0
      while (i < frontier.length) {
        val v = frontier(i)
        var j = 0
        while (j < v.length) {
          val w = v.substring(0, j) + v.substring(j + 1)
          if (seen.add(w)) next += w
          j += 1
        }
        i += 1
      }
      frontier = next.result()
      d += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit FNV-1a over the string's chars — the internal key form of the
    * deletion neighborhood. The hashes are ONLY join keys (never compared
    * to an external system), so any deterministic 64-bit hash works; a
    * collision can only merge two candidate buckets (adds a pair the
    * ratio filter removes), never lose one.
    */
  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** [[deletionNeighborhood]] emitting the variants' 64-bit hashes as a
    * primitive long array: the explode amplifies each name ~len^d/d!×, so
    * keeping per-variant Strings/UTF8Strings out of the generated rows is
    * what keeps the blocking stage allocation-light. */
  def deletionNeighborhoodHashes(s: UTF8String, depth: Int): ArrayData = {
    val str = s.toString
    val seen = new java.util.HashSet[String]()
    val hashes = new java.util.ArrayList[java.lang.Long]()
    seen.add(str); hashes.add(fnv64(str))
    var frontier: Array[String] = Array(str)
    var d = 0
    while (d < depth && frontier.nonEmpty) {
      val next = Array.newBuilder[String]
      var i = 0
      while (i < frontier.length) {
        val v = frontier(i)
        var j = 0
        while (j < v.length) {
          val w = v.substring(0, j) + v.substring(j + 1)
          if (seen.add(w)) { next += w; hashes.add(fnv64(w)) }
          j += 1
        }
        i += 1
      }
      frontier = next.result()
      d += 1
    }
    val out = new Array[Long](hashes.size())
    var i = 0
    while (i < out.length) { out(i) = hashes.get(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** `graft_del_neighborhood_hash(name, depth)` — hashed-key form, see
  * [[TextOps.deletionNeighborhoodHashes]]. */
case class DeletionNeighborhoodHashes(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_del_neighborhood_hash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override protected def nullSafeEval(s: Any, d: Any): Any =
    TextOps.deletionNeighborhoodHashes(s.asInstanceOf[UTF8String], d.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, d) =>
      s"${ev.value} = graft.plans.TextOps.deletionNeighborhoodHashes($s, $d);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_del_neighborhood(name, depth)` — see [[TextOps]]. */
case class DeletionNeighborhood(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_del_neighborhood"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override protected def nullSafeEval(s: Any, d: Any): Any =
    TextOps.deletionNeighborhood(s.asInstanceOf[UTF8String], d.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, d) =>
      s"${ev.value} = graft.plans.TextOps.deletionNeighborhood($s, $d);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Helper object for [[MinhashSlices]] — static so generated code can
  * call it without capturing the expression instance. */
object MinhashOps {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 4·nHashes unsigned-32-bit min-hash slices of `s`, bit-identical to
    * `conv(substring(concat(md5(s), md5(s||'#1'), ..), j*8+1, 8), 16, 10)`
    * over the md5-hex concatenation: digest g is md5 of the raw UTF-8
    * bytes (g == 0) or of the bytes of `s || "#g"`, and slice 4g+c is
    * bytes [4c, 4c+4) of digest g read big-endian unsigned. One digest
    * instance per thread, no hex strings, no substring/conv re-parsing —
    * the builtin composition allocates a MessageDigest and materializes a
    * 32-char hex string per md5 call, 4 calls per shingle.
    */

  /** First 8 bytes of md5(s) as a big-endian long: bit j (0 = MSB) is
    * exactly the bit the hex-nibble formula `(nibble at hex position
    * j/4+1) & (8 >> j%4)` tests — the SimHash vote bits, without the
    * 32-char hex string or 16 conv(substring) nibble parses per token. */
  def md5Prefix64(s: UTF8String): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  def slices(s: UTF8String, nHashes: Int): ArrayData = {
    val md = md5.get()
    val base = s.getBytes
    val out = new Array[Long](4 * nHashes)
    var g = 0
    while (g < nHashes) {
      md.reset()
      md.update(base)
      if (g > 0) md.update(("#" + g).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      var c = 0
      while (c < 4) {
        val o = 4 * c
        out(4 * g + c) =
          ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
            ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
        c += 1
      }
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_minhash_slices(shingle, nHashes)` — see [[MinhashOps.slices]].
  * Feeds graft.operators.Dedup's signature aggregation: the per-document
  * minimum of slice j over all shingles is min-hash row j. */
case class MinhashSlices(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_minhash_slices"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override protected def nullSafeEval(s: Any, n: Any): Any =
    MinhashOps.slices(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.plans.MinhashOps.slices($s, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_in_set(s, setArr)` — hash-set membership of `s` in the
  * FOLDABLE string-array literal `setArr`.
  *
  * Why native: probing a 5·10^5-entry map/array LITERAL per gram is what
  * a literal-backed dictionary costs at benchmark scale — measured on
  * t12_decontaminate_spans at sf0.1, the map-literal probe ran 4.97 s
  * where this expression runs 1.32 s (same query, same linear mask
  * algebra; a ~3.7× cut from the probe path alone — literal map data is
  * re-shipped and probed per task with no shared index, the HashSet here
  * is built once per instance and probed O(1)). The set literal is
  * evaluated ONCE per expression instance into a transient java HashSet;
  * generated code references that object — the surrounding projection
  * stays inside whole-stage codegen. */
case class InStringSet(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_in_set"
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def checkInputDataTypes(): TypeCheckResult = {
    val rightIsStringArray = right.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (left.dataType != StringType || !rightIsStringArray)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>) arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) set argument")
    else TypeCheckResult.TypeCheckSuccess
  }
  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      s.add(arr.getUTF8String(i).clone())
      i += 1
    }
    s
  }
  override protected def nullSafeEval(s: Any, unused: Any): Any =
    lookup.contains(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftInSet", lookup, "java.util.HashSet")
    // the right child is a literal: its generated value is a constant
    // reference the probe ignores (membership goes through the hash set)
    nullSafeCodeGen(ctx, ev, (s, _) =>
      s"${ev.value} = $setRef.contains($s);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_md5_prefix64(token)` — see [[MinhashOps.md5Prefix64]]. */
case class Md5Prefix64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_md5_prefix64"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(s: Any): Any =
    MinhashOps.md5Prefix64(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.MinhashOps.md5Prefix64($s);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/**
 * Block-mean perceptual hash over an opaque byte payload — the classic
 * block-mean image hash (Yang/Weng's blocked mean-threshold scheme)
 * re-expressed for a binary media column: 64 equal byte-range blocks
 * (block k = bytes [k·L/64, (k+1)·L/64)), bit k = 1 iff the block's byte
 * mean exceeds the whole-payload mean. The mean comparison is EXACT
 * cross-multiplication (sum(block)·L > total·blockLen) — no division, no
 * doubles, so the hash is engine-identical by construction.
 *
 * A real image phash resizes + DCTs decoded pixels; this operates on the
 * raw payload bytes (the honest stub this container supports — swap the
 * byte loop for decoded-pixel means and the whole distributed plan is
 * unchanged). Robust to in-place byte noise, NOT to length changes —
 * exactly a block-mean hash's behavior on unaligned crops.
 *
 * Returned as 8 ints of 8 consecutive bits (int j carries bits 8j..8j+7,
 * MSB first: bit 8j+i lands at 1 << (7−i)) so pair generation can
 * pigeonhole on int blocks (Dedup.simhashPairs' form: any pair within
 * hamming 7 agrees exactly on ≥ 1 of the 8 blocks) and pair hamming is
 * 8 codegen'd bit_count(xor)s.
 */
object MediaOps {
  def blockMeanBits(payload: Array[Byte]): ArrayData = {
    val L = payload.length
    var total = 0L
    var i = 0
    while (i < L) { total += (payload(i) & 0xff); i += 1 }
    val out = new Array[Int](8)
    var k = 0
    while (k < 64) {
      val lo = (k.toLong * L / 64).toInt
      val hi = ((k + 1).toLong * L / 64).toInt
      var s = 0L
      var j = lo
      while (j < hi) { s += (payload(j) & 0xff); j += 1 }
      if (s * L > total * (hi - lo)) out(k / 8) |= 1 << (7 - (k % 8))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_blockmean_bits(payload)` — see [[MediaOps.blockMeanBits]]. */
case class BlockMeanBits(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_blockmean_bits"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(b: Any): Any =
    MediaOps.blockMeanBits(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.plans.MediaOps.blockMeanBits($b);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/**
 * Unicode case/diacritic fold — the normalization tier a multilingual
 * corpus needs AHEAD of the `\A[a-z]+\z` word universe (t3/t7/t17/t18
 * would otherwise silently DROP every accented word): lowercase (root
 * locale), NFD-decompose, drop combining marks (\p{Mn}), NFC-recompose.
 * Latin accented letters fold to their base (á→a, Ü→u, Ç→c); CJK and
 * other non-decomposable scripts pass through UNCHANGED — the fold
 * never mangles what it cannot fold. Cross-engine contract: equals
 * DuckDB's nfc_normalize(strip_accents(lower(x))) on the folded accent
 * range (both walk the same Unicode decomposition data; t19's oracle
 * replays it).
 *
 * Why native: java.text.Normalizer is not reachable from built-in
 * Column functions, and a Scala UDF would break whole-stage codegen in
 * the corpus-sized scan this runs under. The static-helper call keeps
 * the projection inside codegen (the Md5Prefix64 pattern).
 */
object UnicodeOps {
  def fold(s: UTF8String): UTF8String = {
    import java.text.Normalizer
    val lowered = s.toString.toLowerCase(java.util.Locale.ROOT)
    val nfd = Normalizer.normalize(lowered, Normalizer.Form.NFD)
    // iterate CODE POINTS, not UTF-16 units: a supplementary-plane Mn
    // mark (e.g. U+1E008) is two surrogate chars whose per-char type is
    // SURROGATE, never NON_SPACING_MARK — charAt-based scanning would
    // keep it and silently diverge from utf8proc-based strip_accents
    var i = 0
    var hasMark = false
    while (i < nfd.length && !hasMark) {
      val cp = nfd.codePointAt(i)
      hasMark = Character.getType(cp) == Character.NON_SPACING_MARK
      i += Character.charCount(cp)
    }
    // fast path: nothing to strip — recompose and return (for pure-ASCII
    // input NFC of NFD is the identity and this is one array scan)
    val stripped = if (!hasMark) nfd else {
      val sb = new java.lang.StringBuilder(nfd.length)
      var j = 0
      while (j < nfd.length) {
        val cp = nfd.codePointAt(j)
        if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
        j += Character.charCount(cp)
      }
      sb.toString
    }
    UTF8String.fromString(Normalizer.normalize(stripped, Normalizer.Form.NFC))
  }
}

/** `graft_unicode_fold(text)` — see [[UnicodeOps.fold]]. */
case class UnicodeFold(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_unicode_fold"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(s: Any): Any =
    UnicodeOps.fold(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.UnicodeOps.fold($s);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
