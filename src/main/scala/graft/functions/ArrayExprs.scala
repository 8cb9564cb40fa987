package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the signature/similarity hot loops.
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) are
  * interpreted — every lambda application allocates and boxes. For the
  * pair-space operators (n² dot products, n×perms minhash) that
  * interpretation overhead dominates the runtime by ~100×, so these
  * three kernels are native expressions with `doGenCode` emitting the
  * tight loop. Each is semantically identical to the higher-order
  * formulation it replaces (same index order, same Long arithmetic),
  * which the specs pin.
  */
object ArrayExprs {

  /** Exact integer dot product of two array<long> columns. */
  def longDot(a: Column, b: Column): Column =
    ColumnBridge.column(LongArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** 64-perm MinHash signature of an array<long> of element hashes. */
  def minhashSig(hs: Column, as: Array[Long], bs: Array[Long], p: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hs), as, bs, p))

  /** Fused gram-hash + k-perm MinHash signature of an array<string>
    * of grams (see [[MinHashGramSig]]).
    */
  def minhashGramSig(grams: Column, as: Array[Long], bs: Array[Long], p: Long): Column =
    ColumnBridge.column(MinHashGramSig(ColumnBridge.expression(grams), as, bs, p))

  /** 62-bit SimHash of an array<long> of element hashes. */
  def simhash62(hs: Column): Column =
    ColumnBridge.column(SimHash62(ColumnBridge.expression(hs)))

  /** |A ∩ B| for two SORTED distinct array<long> columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Winnowing fingerprints from an array<long> of word hashes. */
  def winnow(wordHashes: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(wordHashes), k, w))

  /** Space-joined word n-grams of an array<string> column. */
  def wordNgrams(words: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(words), n))

  /** Per-table LSH sign buckets of a quantized array<long> vector
    * against a constant plane tensor (see [[PlaneSignBuckets]]).
    */
  def planeSignBuckets(qv: Column, planes: Array[Array[Long]], bitsPerTable: Int): Column =
    ColumnBridge.column(PlaneSignBuckets(ColumnBridge.expression(qv), planes, bitsPerTable))

  /** Sign-bit pack of a raw array<float> embedding into the two
    * non-negative 32-bit words `[bits_lo, bits_hi]` (see
    * [[SignBitsPack]]).
    */
  def signBitsPack(embedding: Column): Column =
    ColumnBridge.column(SignBitsPack(ColumnBridge.expression(embedding)))

  /** Per-table MULTI-PROBE LSH buckets of a quantized array<long>
    * vector — the query-side companion of [[planeSignBuckets]] (see
    * [[PlaneSignProbes]]).
    */
  def planeSignProbes(qv: Column, planes: Array[Array[Long]], bitsPerTable: Int, nProbes: Int): Column =
    ColumnBridge.column(PlaneSignProbes(ColumnBridge.expression(qv), planes, bitsPerTable, nProbes))

  /** Dense integer projection of a quantized array<long> vector
    * against a constant plane tensor (see [[PlaneProject]]).
    */
  def planeProject(qv: Column, planes: Array[Array[Long]]): Column =
    ColumnBridge.column(PlaneProject(ColumnBridge.expression(qv), planes))

  /** BPE token count of a string word under a constant merge list
    * (see [[BpeEncodeCount]]).
    */
  def bpeEncodeCount(word: Column, lefts: Array[String], rights: Array[String]): Column =
    ColumnBridge.column(BpeEncodeCount(ColumnBridge.expression(word), lefts, rights))

  /** PQ codes of a quantized vector under a constant codebook tensor
    * (see [[PqEncode]]).
    */
  def pqEncode(qv: Column, codebooks: Array[Array[Long]], numSub: Int, ksub: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(qv), codebooks, numSub, ksub))

  /** Per-query ADC lookup table against the same codebook tensor
    * (see [[PqLut]]).
    */
  def pqLut(qv: Column, codebooks: Array[Array[Long]], numSub: Int, ksub: Int): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(qv), codebooks, numSub, ksub))

  /** ADC score: sum of LUT entries selected by a code array
    * (see [[PqAdcScore]]).
    */
  def pqAdcScore(codes: Column, lut: Column, ksub: Int): Column =
    ColumnBridge.column(PqAdcScore(ColumnBridge.expression(codes), ColumnBridge.expression(lut), ksub))

  /** Bloom-filter membership probe of a long key column
    * (see [[BloomMightContainLong]]).
    */
  def bloomMightContain(key: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(key), bloom))

  /** 62-bit block-parity perceptual hash of a binary column
    * (see [[BlockParityHash]]).
    */
  def blockParityHash(payload: Column): Column =
    ColumnBridge.column(BlockParityHash(ColumnBridge.expression(payload)))

  /** Centered projections of a quantized vector onto constant
    * component vectors (see [[CenteredProject]]).
    */
  def centeredProject(qv: Column, mu: Array[Double], ws: Array[Array[Double]]): Column =
    ColumnBridge.column(CenteredProject(ColumnBridge.expression(qv), mu, ws))

  /** Content-defined chunk lengths of a binary column by gear-hash
    * cut-points (see [[GearCdcChunks]]).
    */
  def gearCdcChunks(payload: Column, minSize: Int, maskBits: Int, maxSize: Int): Column =
    ColumnBridge.column(GearCdcChunks(ColumnBridge.expression(payload), minSize, maskBits, maxSize))

  /** Count of array<string> elements present in a constant reference
    * set (see [[RefSetHitCount]]).
    */
  def refSetHitCount(arr: Column, ref: Iterable[String]): Column = {
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      math.max(16, ref.size * 2))
    ref.foreach(s => set.add(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    ColumnBridge.column(RefSetHitCount(ColumnBridge.expression(arr), set))
  }

  /** Nearest frozen centroid of a quantized vector, packed as
    * cid·4e6 + (sim_ppm + 2e6) (see [[NearestCentroidPacked]]).
    * `cents` must be (cid, quantized vector, norm) triples.
    */
  def nearestCentroidPacked(
      qv: Column, norm: Column, cents: Seq[(Int, Seq[Long], Double)]): Column = {
    val sorted = cents.sortBy(_._1)
    ColumnBridge.column(NearestCentroidPacked(
      ColumnBridge.expression(qv), ColumnBridge.expression(norm),
      sorted.map(_._1).toArray, sorted.map(_._2.toArray).toArray,
      sorted.map(_._3).toArray))
  }
}

/** Space-joined n-grams of a word array; a document shorter than n
  * words yields a single gram of all its words (for the single-spaced
  * corpus this equals the whole text, matching the
  * `when(size < n, array(text))` fallback it replaces).
  *
  * Exists as a kernel because the higher-order formulation
  * (`transform(sequence(...), i -> concat_ws(' ', slice(ws, i+1, n)))`)
  * is interpreted — per gram it allocates a lambda frame, a sliced
  * array copy, and boxes — and it drops the whole projection out of
  * whole-stage codegen. Gram assembly here is one UTF8String.concatWs
  * per gram inside the generated loop.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val ws = in.asInstanceOf[ArrayData]
    val nw = ws.numElements()
    val k = math.min(n, nw)
    val m = if (nw >= n) nw - n + 1 else 1
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = ws.getUTF8String(i + j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj(
      "sep",
      org.apache.spark.unsafe.types.UTF8String.fromString(" "),
      "org.apache.spark.unsafe.types.UTF8String",
    )
    nullSafeCodeGen(ctx, ev, ws => {
      // freshName'd locals — see WinnowFingerprints.doGenCode.
      val nw = ctx.freshName("nw"); val k = ctx.freshName("k")
      val m = ctx.freshName("m"); val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
         |int $nw = $ws.numElements();
         |int $k = Math.min($n, $nw);
         |int $m = $nw >= $n ? $nw - $n + 1 : 1;
         |Object[] $out = new Object[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String[] $parts = new org.apache.spark.unsafe.types.UTF8String[$k];
         |  for (int $j = 0; $j < $k; $j++) { $parts[$j] = $ws.getUTF8String($i + $j); }
         |  $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of elements of an array<string> column that appear in a
  * constant reference set (UTF8String hash set via addReferenceObj).
  *
  * Exists as a kernel because it makes membership testing against a
  * SMALL reference corpus (a benchmark's n-gram index — MBs at any
  * data scale) a stateless map-side expression: no explode, no join,
  * no per-doc re-aggregation. That statelessness is what lets the
  * decontamination stage run inside a STREAMING pipeline (a
  * stream-static gram join would need a per-doc stateful count-back);
  * in batch plans it also keeps the projection inside whole-stage
  * codegen. Semantically identical to
  * `size(array_intersect(arr, ref))` only when `arr` is distinct —
  * this counts every occurrence, matching the exploded-join hit
  * count the batch decontaminate operator produces over distinct
  * grams.
  */
case class RefSetHitCount(
    child: Expression,
    ref: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String],
) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(in: Any): Any = {
    val a = in.asInstanceOf[ArrayData]
    var c = 0
    var i = 0
    while (i < a.numElements()) {
      if (ref.contains(a.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("refSet", ref, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      s"""
         |int $c = 0;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if ($refName.contains($arr.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing (Schleimer'03) in one pass: FNV-mix k-gram hashes over
  * the word-hash stream, take the min of each w-window, dedupe + sort.
  *
  * Exists as a kernel because the higher-order formulation
  * (`transform(windows, j -> array_min(slice(grams, ...)))`) re-inlines
  * the whole `grams` subtree into every window's lambda — interpreted
  * HOF children are re-evaluated per element, turning O(n·w) into
  * O(n²·w) with allocations. 25 ms/doc interpreted → µs here.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val wh = in.asInstanceOf[ArrayData]
    val n = wh.numElements()
    val m = math.max(n - k + 1, 1)
    val grams = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k && i + j < n) { h = (h ^ wh.getLong(i + j)) * 0x100000001b3L; j += 1 }
      grams(i) = h
      i += 1
    }
    val nw = math.max(m - w + 1, 1)
    val mins = new Array[Long](nw)
    i = 0
    while (i < nw) {
      var mn = grams(i)
      var j = 1
      while (j < w && i + j < m) { val v = grams(i + j); if (v < mn) mn = v; j += 1 }
      mins(i) = mn
      i += 1
    }
    java.util.Arrays.sort(mins)
    var cnt = 0
    i = 0
    while (i < nw) { if (i == 0 || mins(i) != mins(i - 1)) cnt += 1; i += 1 }
    val out = new Array[Long](cnt)
    var o = 0
    i = 0
    while (i < nw) { if (i == 0 || mins(i) != mins(i - 1)) { out(o) = mins(i); o += 1 }; i += 1 }
    new GenericArrayData(out)
  }

  // Every local goes through ctx.freshName: nullSafeCodeGen inlines this
  // body at function scope when the child is non-nullable, so two kernel
  // instances in one generated function would otherwise collide in Janino
  // ("Redefinition of local variable").
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, wh => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val grams = ctx.freshName("grams"); val nw = ctx.freshName("nw")
      val mins = ctx.freshName("mins"); val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out"); val o = ctx.freshName("o")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val mn = ctx.freshName("mn")
      s"""
         |int $n = $wh.numElements();
         |int $m = Math.max($n - $k + 1, 1);
         |long[] $grams = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = 0xcbf29ce484222325L;
         |  for (int $j = 0; $j < $k && $i + $j < $n; $j++) { $h = ($h ^ $wh.getLong($i + $j)) * 0x100000001b3L; }
         |  $grams[$i] = $h;
         |}
         |int $nw = Math.max($m - $w + 1, 1);
         |long[] $mins = new long[$nw];
         |for (int $i = 0; $i < $nw; $i++) {
         |  long $mn = $grams[$i];
         |  for (int $j = 1; $j < $w && $i + $j < $m; $j++) { if ($grams[$i + $j] < $mn) $mn = $grams[$i + $j]; }
         |  $mins[$i] = $mn;
         |}
         |java.util.Arrays.sort($mins);
         |int $cnt = 0;
         |for (int $i = 0; $i < $nw; $i++) { if ($i == 0 || $mins[$i] != $mins[$i-1]) $cnt++; }
         |long[] $out = new long[$cnt];
         |int $o = 0;
         |for (int $i = 0; $i < $nw; $i++) { if ($i == 0 || $mins[$i] != $mins[$i-1]) { $out[$o++] = $mins[$i]; } }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Two-pointer merge count over sorted distinct long arrays — the
  * set-similarity hot loop (array_intersect/array_union are interpreted
  * and hash-based; on an n² pair space the constant matters).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName'd locals — see WinnowFingerprints.doGenCode.
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(), $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i), $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; } else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** sum_i a[i]*b[i] in Long arithmetic; NULL on ragged pairs, matching
  * the zip_with null-padding semantics so [[graft.plans.RewriteHofDotProduct]]
  * is an exact rewrite.
  */
case class LongArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName'd locals — see WinnowFingerprints.doGenCode.
      val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) { $s += $a.getLong($i) * $b.getLong($i); }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** min over hs of (as(j)*h + bs(j)) mod p, per permutation j.
  * Preconditions (enforced by the caller): 0 <= h < 2^31,
  * 0 <= as(j),bs(j) < 2^31 — products stay < 2^62, no overflow.
  * Empty input yields p (the identity of min mod p), matching
  * array_min of an empty transform = null avoided upstream.
  */
/** Shared md5-prefix gram hash for the MinHash sketch family: the
  * first 8 hex chars of md5(utf8-bytes) parsed as an unsigned int64 —
  * bit-identical to `conv(substring(md5(gram), 1, 8), 16, 10)`, the
  * form the DuckDB oracle computes, but straight from the digest's
  * first 4 bytes with no hex-string materialization or string parse.
  */
object MinHashKernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def h32(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md.get(); d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) | ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
  }
}

/** Fused gram-hash + k-permutation MinHash signature of one document:
  * array<string> grams → array<long> of k slot minima, where slot j =
  * min over grams of `(as(j)·h32(gram) + bs(j)) % p` (all operands
  * non-negative, so `%` ≡ `pmod`). Exists as a kernel because the
  * column formulation — explode the grams, md5 to a hex STRING,
  * substring, conv-parse, then k separate pmod min-aggregate
  * expressions — pays a per-gram string round-trip and k disjoint
  * codegen statements for what is one tight two-level loop here; the
  * per-source signature then aggregates from |docs| rows instead of
  * |gram occurrences| rows (min-of-mins ≡ global min, duplicates
  * absorbed at both levels). An empty gram array yields all-`p`
  * sentinel slots, absorbed by any real gram downstream.
  */
case class MinHashGramSig(child: Expression, as: Array[Long], bs: Array[Long], p: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val gs = in.asInstanceOf[ArrayData]
    val k = as.length
    val mins = Array.fill(k)(p)
    var i = 0
    val n = gs.numElements()
    while (i < n) {
      val h = MinHashKernel.h32(gs.getUTF8String(i))
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, gs => {
      // freshName'd locals — see WinnowFingerprints.doGenCode.
      val k = ctx.freshName("k"); val mins = ctx.freshName("mins")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |int $k = $asRef.length;
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${p}L);
         |int $n = $gs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = graft.functions.MinHashKernel.h32($gs.getUTF8String($i));
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($asRef[$j] * $h + $bsRef[$j]) % ${p}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long], p: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val hs = in.asInstanceOf[ArrayData]
    val k = as.length
    val mins = Array.fill(k)(p)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      // freshName'd locals — see WinnowFingerprints.doGenCode.
      val k = ctx.freshName("k"); val mins = ctx.freshName("mins")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |int $k = $asRef.length;
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${p}L);
         |int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($asRef[$j] * $h + $bsRef[$j]) % ${p}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All LSH table buckets of one quantized vector in a single pass:
  * `buckets(t) = Σ_b (qv · planes(t*bitsPerTable + b) >= 0 ? 1<<b : 0)`.
  *
  * Exists as a kernel because the unrolled-column formulation (one
  * sign-test column per (table, bit) with the 64 plane coords inlined
  * as literals) generates thousands of lines of per-plane code —
  * Janino compilation alone costs seconds on a cold plan, repeated
  * whenever codegen-cache pressure evicts it (the full bench suite
  * compiles hundreds of stages). Here the tensor is one reference
  * object and the generated code is two nested loops, a few dozen
  * lines regardless of table count.
  *
  * A vector whose length differs from the planes' yields bucket 0 in
  * every table — identical to the column form, where the null dot of
  * ragged arrays fails the `>= 0` test for every bit.
  */
case class PlaneSignBuckets(child: Expression, planes: Array[Array[Long]], bitsPerTable: Int)
    extends UnaryExpression {
  private val numTables = planes.length / bitsPerTable
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val qv = in.asInstanceOf[ArrayData]
    val n = qv.numElements()
    val out = new Array[Int](numTables)
    if (n == planes(0).length) {
      var t = 0
      while (t < numTables) {
        var acc = 0
        var b = 0
        while (b < bitsPerTable) {
          val p = planes(t * bitsPerTable + b)
          var s = 0L
          var i = 0
          while (i < n) { s += qv.getLong(i) * p(i); i += 1 }
          if (s >= 0) acc |= 1 << b
          b += 1
        }
        out(t) = acc
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "long[][]")
    nullSafeCodeGen(ctx, ev, qv => {
      // freshName'd locals — see WinnowFingerprints.doGenCode.
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val acc = ctx.freshName("acc")
      val b = ctx.freshName("b"); val p = ctx.freshName("p")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
         |int $n = $qv.numElements();
         |int[] $out = new int[$numTables];
         |if ($n == $planesRef[0].length) {
         |  for (int $t = 0; $t < $numTables; $t++) {
         |    int $acc = 0;
         |    for (int $b = 0; $b < $bitsPerTable; $b++) {
         |      long[] $p = $planesRef[$t * $bitsPerTable + $b];
         |      long $s = 0L;
         |      for (int $i = 0; $i < $n; $i++) { $s += $qv.getLong($i) * $p[$i]; }
         |      if ($s >= 0) $acc |= 1 << $b;
         |    }
         |    $out[$t] = $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sign-bit pack of a raw array<float> embedding into the two
  * non-negative 32-bit words of the binary-quantization code:
  * out = [bits_lo, bits_hi], bit j-1 of bits_lo set iff dim j
  * (1-based, dims 1-32) is strictly positive as a double (NaN counts
  * as positive — both engines order NaN greatest, see the eval
  * comment), dims 33-64
  * in bits_hi (the axis-aligned special case of hyperplane-LSH sign
  * codes — Charikar'02, public). Two halves because bit 63 of one
  * int64 word is the sign bit and signed-shift semantics differ
  * across engines; two ≤2^32 words reproduce bit-for-bit in DuckDB.
  * Dims beyond 64 are ignored and missing/null dims contribute a 0
  * bit — element-for-element the `aggregate(sequence(1,32), …)` HOF
  * it replaces (interpreted, per-row lambda allocation on the
  * EVERY-VECTOR pack path; ArrayExprsSpec pins kernel ≡ HOF).
  */
case class SignBitsPack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // lazy: child.dataType is only resolvable post-analysis
  private lazy val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SignBitsPack needs array<float> or array<double>, got ${other.catalogString}")
    }

  // Sign test is (v > 0.0 || isNaN(v)): Spark SQL and DuckDB both
  // order NaN GREATER than every numeric, so the HOF this kernel
  // replaced (`CAST(e AS DOUBLE) > 0.0`) set the bit on a NaN dim —
  // raw Java `>` is false for NaN and would silently flip it.
  override def nullSafeEval(in: Any): Any = {
    val qv = in.asInstanceOf[ArrayData]
    val n = math.min(qv.numElements(), 64)
    var lo = 0L
    var hi = 0L
    var i = 0
    while (i < n) {
      if (!qv.isNullAt(i)) {
        val v: Double = if (elemIsDouble) qv.getDouble(i) else qv.getFloat(i).toDouble
        if (v > 0.0 || java.lang.Double.isNaN(v)) {
          if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
        }
      }
      i += 1
    }
    new GenericArrayData(Array(lo, hi))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, qv => {
      // freshName'd locals — see WinnowFingerprints.doGenCode.
      val n = ctx.freshName("n"); val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi"); val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val get = if (elemIsDouble) s"$qv.getDouble($i)" else s"(double) $qv.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($qv.numElements(), 64);
         |long $lo = 0L;
         |long $hi = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$qv.isNullAt($i)) {
         |    double $v = $get;
         |    if ($v > 0.0 || java.lang.Double.isNaN($v)) {
         |      if ($i < 32) $lo |= 1L << $i; else $hi |= 1L << ($i - 32);
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[]{$lo, $hi});
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Dense projection of a quantized array<long> vector against a
  * constant plane tensor: out[j] = Σ_i qv[i]·planes[j][i] — the
  * matrix-multiply kernel behind Johnson-Lindenstrauss random
  * projection (Achlioptas'01 ±1 planes — public). Shares the
  * integer-exact discipline of [[PlaneSignBuckets]] (whose output is
  * the SIGN of these dots): int64 dots reproduce bit-for-bit in
  * DuckDB list arithmetic, so the projection is hash-oracle-able.
  */
case class PlaneProject(child: Expression, planes: Array[Array[Long]])
    extends UnaryExpression {
  private val numPlanes = planes.length
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val qv = in.asInstanceOf[ArrayData]
    val n = qv.numElements()
    val out = new Array[Long](numPlanes)
    if (n == planes(0).length) {
      var j = 0
      while (j < numPlanes) {
        val p = planes(j)
        var s = 0L
        var i = 0
        while (i < n) { s += qv.getLong(i) * p(i); i += 1 }
        out(j) = s
        j += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "long[][]")
    nullSafeCodeGen(ctx, ev, qv => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val p = ctx.freshName("p")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
         |int $n = $qv.numElements();
         |long[] $out = new long[$numPlanes];
         |if ($n == $planesRef[0].length) {
         |  for (int $j = 0; $j < $numPlanes; $j++) {
         |    long[] $p = $planesRef[$j];
         |    long $s = 0L;
         |    for (int $i = 0; $i < $n; $i++) { $s += $qv.getLong($i) * $p[$i]; }
         |    $out[$j] = $s;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Multi-probe LSH probe buckets (Lv et al., VLDB'07 — public): for
  * each table, the exact sign bucket FOLLOWED by query-directed
  * perturbations flipping the lowest-|margin| hyperplane bits — the
  * buckets a near neighbor most likely fell into when it landed just
  * across a close hyperplane. Probing Δ extra buckets per table
  * recovers most of the recall of Δ× more tables at the index size of
  * one.
  *
  * Probe sequence per table (nProbes ≤ 4): exact, flip argmin|dot|,
  * flip 2nd-argmin|dot|, flip both — the first steps of the
  * perturbation-set ordering, sufficient at 4 bits/table where the
  * full sequence would enumerate subsets. Output is flattened
  * `table-major`: probe j of table t sits at t·nProbes + j, so
  * `tbl = idx / nProbes` after a posexplode.
  *
  * QUERY-side only: the data side stays single-bucket (the index is
  * built once; multi-probe multiplies only the per-query probe count,
  * never the index size — the entire point of the technique).
  */
case class PlaneSignProbes(child: Expression, planes: Array[Array[Long]], bitsPerTable: Int, nProbes: Int)
    extends UnaryExpression {
  require(nProbes >= 1 && nProbes <= 4, "probe sequence implemented for nProbes in [1,4]")
  // with a single hyperplane per table the second-margin index m1
  // degenerates to m0 and probes 2/3 would duplicate probe 1 + exact
  require(nProbes == 1 || bitsPerTable >= 2,
    "multi-probe needs >= 2 bits per table (probes 2+ flip the two smallest margins)")
  private val numTables = planes.length / bitsPerTable
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val qv = in.asInstanceOf[ArrayData]
    val n = qv.numElements()
    val out = new Array[Int](numTables * nProbes)
    if (n == planes(0).length) {
      var t = 0
      while (t < numTables) {
        var acc = 0
        var m0 = 0; var m1 = 0
        var d0 = Long.MaxValue; var d1 = Long.MaxValue
        var b = 0
        while (b < bitsPerTable) {
          val p = planes(t * bitsPerTable + b)
          var s = 0L
          var i = 0
          while (i < n) { s += qv.getLong(i) * p(i); i += 1 }
          if (s >= 0) acc |= 1 << b
          val a = math.abs(s)
          if (a < d0) { d1 = d0; m1 = m0; d0 = a; m0 = b }
          else if (a < d1) { d1 = a; m1 = b }
          b += 1
        }
        val base = t * nProbes
        out(base) = acc
        if (nProbes > 1) out(base + 1) = acc ^ (1 << m0)
        if (nProbes > 2) out(base + 2) = acc ^ (1 << m1)
        if (nProbes > 3) out(base + 3) = acc ^ (1 << m0) ^ (1 << m1)
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "long[][]")
    nullSafeCodeGen(ctx, ev, qv => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val acc = ctx.freshName("acc")
      val b = ctx.freshName("b"); val p = ctx.freshName("p")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val m0 = ctx.freshName("m0"); val m1 = ctx.freshName("m1")
      val d0 = ctx.freshName("d0"); val d1 = ctx.freshName("d1")
      val a = ctx.freshName("a"); val base = ctx.freshName("base")
      s"""
         |int $n = $qv.numElements();
         |int[] $out = new int[$numTables * $nProbes];
         |if ($n == $planesRef[0].length) {
         |  for (int $t = 0; $t < $numTables; $t++) {
         |    int $acc = 0;
         |    int $m0 = 0; int $m1 = 0;
         |    long $d0 = Long.MAX_VALUE; long $d1 = Long.MAX_VALUE;
         |    for (int $b = 0; $b < $bitsPerTable; $b++) {
         |      long[] $p = $planesRef[$t * $bitsPerTable + $b];
         |      long $s = 0L;
         |      for (int $i = 0; $i < $n; $i++) { $s += $qv.getLong($i) * $p[$i]; }
         |      if ($s >= 0) $acc |= 1 << $b;
         |      long $a = Math.abs($s);
         |      if ($a < $d0) { $d1 = $d0; $m1 = $m0; $d0 = $a; $m0 = $b; }
         |      else if ($a < $d1) { $d1 = $a; $m1 = $b; }
         |    }
         |    int $base = $t * $nProbes;
         |    $out[$base] = $acc;
         |    if ($nProbes > 1) $out[$base + 1] = $acc ^ (1 << $m0);
         |    if ($nProbes > 2) $out[$base + 2] = $acc ^ (1 << $m1);
         |    if ($nProbes > 3) $out[$base + 3] = $acc ^ (1 << $m0) ^ (1 << $m1);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** BPE token count of one word under a constant merge list: the
  * merges apply in training order, each as a greedy left-to-right
  * non-overlapping pass — exactly the scan `Bpe.applyMerge` folds at
  * training time and `Bpe.encodeWord` replays in the spec.
  *
  * The merge list is a reference object and the whole encode is one
  * virtual call from generated code ([[CodegenContext.addReferenceObj]]),
  * so the distinct-word projection stays inside whole-stage codegen
  * without inlining a per-merge expression chain (16 nested
  * interpreted folds was the alternative).
  */
case class BpeEncodeCount(child: Expression, lefts: Array[String], rights: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = LongType

  @transient private lazy val merged: Array[String] =
    lefts.zip(rights).map { case (l, r) => l + r }

  def tokenCount(wordAny: Any): Long = {
    var cur = wordAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString.split("")
    var i = 0
    while (i < lefts.length) {
      val l = lefts(i); val r = rights(i); val m = merged(i)
      val out = new Array[String](cur.length)
      var n = 0
      var j = 0
      while (j < cur.length) {
        if (j + 1 < cur.length && cur(j) == l && cur(j + 1) == r) { out(n) = m; n += 1; j += 2 }
        else { out(n) = cur(j); n += 1; j += 1 }
      }
      cur = java.util.Arrays.copyOf(out, n)
      i += 1
    }
    cur.length.toLong
  }

  override def nullSafeEval(in: Any): Any = tokenCount(in)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncodeCount].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.tokenCount($w);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Product-quantization encode (Jégou'11): the input vector splits
  * into `numSub` contiguous subvectors; each maps to the index of its
  * nearest (exact integer squared-L2) codebook centroid. `codebooks`
  * is the flattened tensor codebooks(j*ksub + c) = centroid c of
  * subspace j, each of length dim/numSub. A vector whose length is
  * not numSub × subDim yields all-zero codes (degenerate input, same
  * convention as [[PlaneSignBuckets]]).
  *
  * Integer-exact: both vectors and centroids live on the ×10000
  * quantization grid, so squared distances are exact int64 (coords
  * ≤ ~2·10^4 → per-dim squared diff ≤ 1.6·10^9, summed over ≤ 64
  * dims — far under 2^63) and the argmin (ties → lowest index) is
  * deterministic on every platform.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Long]], numSub: Int, ksub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private val subDim = codebooks(0).length

  override def nullSafeEval(in: Any): Any = {
    val qv = in.asInstanceOf[ArrayData]
    val out = new Array[Int](numSub)
    if (qv.numElements() == numSub * subDim) {
      var j = 0
      while (j < numSub) {
        var bestC = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < ksub) {
          val cent = codebooks(j * ksub + c)
          var d = 0L
          var i = 0
          while (i < subDim) {
            val diff = qv.getLong(j * subDim + i) - cent(i)
            d += diff * diff
            i += 1
          }
          if (d < bestD) { bestD = d; bestC = c }
          c += 1
        }
        out(j) = bestC
        j += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqe", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, qv =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($qv);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-query ADC lookup table: lut(j*ksub + c) = dot(query subvector
  * j, codebook centroid c of subspace j) — exact int64 dots on the
  * quantization grid. Computed once per query row; scoring a data
  * vector is then `numSub` array reads ([[PqAdcScore]]) instead of a
  * dim-length dot.
  */
case class PqLut(child: Expression, codebooks: Array[Array[Long]], numSub: Int, ksub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private val subDim = codebooks(0).length

  override def nullSafeEval(in: Any): Any = {
    val qv = in.asInstanceOf[ArrayData]
    val out = new Array[Long](numSub * ksub)
    if (qv.numElements() == numSub * subDim) {
      var j = 0
      while (j < numSub) {
        var c = 0
        while (c < ksub) {
          val cent = codebooks(j * ksub + c)
          var s = 0L
          var i = 0
          while (i < subDim) { s += qv.getLong(j * subDim + i) * cent(i); i += 1 }
          out(j * ksub + c) = s
          c += 1
        }
        j += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pql", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, qv =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($qv);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ADC score: Σ_j lut(j*ksub + codes(j)) — the asymmetric-distance
  * approximation of dot(query, data) from PQ codes. The tight loop is
  * generated inline: per (query, vector) pair this is `numSub` array
  * reads and adds, the whole point of PQ's compressed scan.
  */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    var s = 0L
    var j = 0
    val m = codes.numElements()
    while (j < m) { s += lut.getLong(j * ksub + codes.getInt(j)); j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val s = ctx.freshName("s"); val j = ctx.freshName("j"); val m = ctx.freshName("m")
      s"""
         |long $s = 0L;
         |int $m = $codes.numElements();
         |for (int $j = 0; $j < $m; $j++) { $s += $lut.getLong($j * $ksub + $codes.getInt($j)); }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Argmax-cosine assignment of a quantized vector to a FROZEN centroid
  * table, returned as ONE packed int64: cid·4_000_000 + (sim_ppm +
  * 2_000_000), where sim_ppm = floor(cos·1e6 + 0.5) ∈ [-1e6, 1e6]
  * (decode: cid = p DIV 4e6; sim_ppm = p % 4e6 − 2e6; p ≥ 0 always).
  *
  * Exists as a kernel because the per-centroid Column formulation
  * (`greatest(struct(pairCos(qv, lit(cv_i), …), -i), …)`) inlines k
  * literal-array dot products into the generated projection — at the
  * test k=16 that is already ~200 ms of janino compile per plan, and
  * at a production k (√n — thousands of inverted lists) it would not
  * compile at all. Here the whole scan is one compiled Scala method
  * riding a reference object (the CenteredProject discipline): k·dims
  * multiply-adds per row, O(1) generated code regardless of k.
  *
  * Arithmetic and tie-break are EXACTLY the Column formulation's:
  * cos = (double) longDot(qv, cv) / (norm · cnorm), compared with
  * Double.compare (NaN greatest — Spark's double ordering), ties on
  * cos going to the SMALLEST cid (the max-struct (cos, -cid)
  * convention); pinned kernel ≡ greatest-struct in ArrayExprsSpec +
  * PropertySpec random tables. ONE deliberate edge divergence: on a
  * zero norm the Column formulation's Divide THROWS under ANSI SQL,
  * while this kernel follows raw IEEE — the all-NaN scan keeps the
  * lowest cid with sim_ppm 0 (PropertySpec pins it): a degenerate
  * vector in a 100 TB ingest should land in SOME list deterministically,
  * not abort the job.
  * `cids`/`cents`/`cnorms` are parallel arrays sorted by cid.
  */
case class NearestCentroidPacked(
    left: Expression, right: Expression,
    cids: Array[Int], cents: Array[Array[Long]], cnorms: Array[Double])
    extends BinaryExpression {
  require(cents.nonEmpty && cents.length == cnorms.length && cents.length == cids.length)
  override def dataType: DataType = LongType

  def assign(qvAny: Any, norm: Double): Long = {
    val qv = qvAny.asInstanceOf[ArrayData]
    val dims = qv.numElements()
    var bestCos = Double.NegativeInfinity
    var bestCid = -1
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      // a query/centroid dimensionality mismatch is a WIRING bug —
      // fail loudly rather than return a plausible-looking assignment
      // from a silently truncated dot product (r15 ADVICE)
      if (dims != cv.length)
        throw new IllegalArgumentException(
          s"NearestCentroidPacked: vector has $dims dims, centroid ${cids(c)} has ${cv.length}")
      var dot = 0L
      var j = 0
      val n = dims
      while (j < n) { dot += qv.getLong(j) * cv(j); j += 1 }
      val cos = dot.toDouble / (norm * cnorms(c))
      // Double.compare: NaN sorts greatest (Spark's double ordering);
      // strict > in ascending-cid order keeps the smallest cid on ties
      if (bestCid < 0 || java.lang.Double.compare(cos, bestCos) > 0) {
        bestCos = cos; bestCid = cids(c)
      }
      c += 1
    }
    val simPpm = math.floor(bestCos * 1000000.0 + 0.5).toLong
    bestCid.toLong * 4000000L + (simPpm + 2000000L)
  }

  override def nullSafeEval(qvAny: Any, normAny: Any): Any =
    assign(qvAny, normAny.asInstanceOf[java.lang.Double].doubleValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ncent", this, classOf[NearestCentroidPacked].getName)
    nullSafeCodeGen(ctx, ev, (qv, norm) =>
      s"${ev.value} = $ref.assign($qv, $norm);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Charikar'02 SimHash over 62 bits: bit i of the result is set iff
  * more element hashes have bit i set than clear.
  */
case class SimHash62(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(in: Any): Any = {
    val hs = in.asInstanceOf[ArrayData]
    val counts = new Array[Int](62)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 62) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 62) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      // freshName'd locals — see WinnowFingerprints.doGenCode.
      val counts = ctx.freshName("counts"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val b = ctx.freshName("b"); val out = ctx.freshName("out")
      s"""
         |int[] $counts = new int[62];
         |int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $b = 0; $b < 62; $b++) {
         |    if ((($h >> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 62; $b++) { if ($counts[$b] > 0) $out |= (1L << $b); }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Bloom-filter membership probe of a LongType key against a constant
  * driver-built sketch (`DataFrameStatFunctions.bloomFilter`, a
  * treeAggregate — the explicit form of Spark's own runtime-filter
  * InjectRuntimeFilter lever). The sketch rides the plan as one
  * reference object and the probe is a single virtual call from
  * generated code, so the big-side scan filter stays inside
  * whole-stage codegen. False positives pass (they are removed by the
  * exact verify join downstream); false negatives cannot occur.
  */
case class BloomMightContainLong(
    child: Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter,
) extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(in: Any): Any = bloom.mightContainLong(in.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "bloom", bloom, classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $ref.mightContainLong($k);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 62-bit block-parity perceptual hash of a binary payload: the bytes
  * split into 62 contiguous blocks (byte j belongs to block
  * j*62/n — the same integer-floor mapping the oracle replays) and
  * bit b is the parity of block b's byte sum. Localized byte edits
  * flip only the touched blocks' bits, so near-identical payloads
  * land within small hamming distance, while unrelated payloads
  * differ on ~31 of 62 bits — the block-mean-hash structure of real
  * perceptual hashes with a deterministic, oracle-replayable stub
  * "feature" (the byte sum; a real pHash swaps in DCT coefficients).
  * Payloads shorter than 62 bytes hash block-per-byte (empty blocks
  * contribute parity 0); an empty payload hashes to 0.
  */
case class BlockParityHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  def hashBytes(b: Array[Byte]): Long = {
    val n = b.length
    if (n == 0) return 0L
    val sums = new Array[Long](62)
    var j = 0
    while (j < n) { sums((j.toLong * 62 / n).toInt) += (b(j) & 0xff).toLong; j += 1 }
    var out = 0L
    var i = 0
    while (i < 62) { if ((sums(i) & 1L) == 1L) out |= (1L << i); i += 1 }
    out
  }

  override def nullSafeEval(in: Any): Any = hashBytes(in.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bph", this, classOf[BlockParityHash].getName)
    nullSafeCodeGen(ctx, ev, b => s"${ev.value} = $ref.hashBytes($b);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Centered projection of a ×10⁴-quantized vector onto `ws.length`
  * constant component vectors: out(t) = Σ_i (qv_i/10⁴ − mu_i)·ws(t)(i),
  * summed left-to-right in doubles — the fixed evaluation order that
  * makes the result bit-reproducible and exactly replayable by the
  * spec's plain-Scala loop. A vector whose length differs from mu's
  * yields an all-zero projection (degenerate input, the
  * [[PlaneSignBuckets]] convention).
  */
case class CenteredProject(child: Expression, mu: Array[Double], ws: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def project(in: Any): GenericArrayData = {
    val qv = in.asInstanceOf[ArrayData]
    val n = qv.numElements()
    val out = new Array[Double](ws.length)
    if (n == mu.length) {
      var t = 0
      while (t < ws.length) {
        val w = ws(t)
        var s = 0.0
        var i = 0
        while (i < n) { s += (qv.getLong(i) / 10000.0 - mu(i)) * w(i); i += 1 }
        out(t) = s
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(in: Any): Any = project(in)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cproj", this, classOf[CenteredProject].getName)
    nullSafeCodeGen(ctx, ev, qv => s"${ev.value} = $ref.project($qv);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Content-defined chunk lengths of a binary payload by gear-hash
  * cut-points (the FastCDC family): h = (h<<1) + GEAR(byte); a
  * boundary falls where (h & mask) == 0 once the chunk has reached
  * `minSize`, or unconditionally at `maxSize`. Because the rolling
  * state is a pure function of the recent byte window (the shift ages
  * bytes out of the top), an insertion re-synchronizes within one
  * chunk — downstream boundaries (and so chunk content addresses)
  * are unchanged, which is exactly what fixed-size splitting cannot
  * do and the reason dedup storage chunks this way. The GEAR table is
  * splitmix64 of the byte value — deterministic everywhere. The hash
  * state resets at each cut, so every boundary decision is exactly
  * replayable by the spec's plain-Scala scan.
  */
case class GearCdcChunks(child: Expression, minSize: Int, maskBits: Int, maxSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient lazy val gear: Array[Long] = GearCdcChunks.gearTable
  private val mask: Long = (1L << maskBits) - 1

  def chunkLengths(in: Any): GenericArrayData = {
    val b = in.asInstanceOf[Array[Byte]]
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var h = 0L
    var len = 0
    var i = 0
    while (i < b.length) {
      h = (h << 1) + gear(b(i) & 0xff)
      len += 1
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize) {
        out += len
        h = 0L
        len = 0
      }
      i += 1
    }
    if (len > 0) out += len
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(in: Any): Any = chunkLengths(in)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdc", this, classOf[GearCdcChunks].getName)
    nullSafeCodeGen(ctx, ev, b => s"${ev.value} = $ref.chunkLengths($b);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object GearCdcChunks {
  /** splitmix64(i) for i = 0..255 — the standard public-domain mixer. */
  lazy val gearTable: Array[Long] = Array.tabulate(256) { i =>
    var z = i.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
