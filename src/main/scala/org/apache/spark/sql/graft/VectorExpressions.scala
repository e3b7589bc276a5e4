package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over double arrays —
  * the hot inner loop of similarity search at 100 TB. A codegen'd
  * expression (doGenCode) keeps the whole similarity join inside
  * WholeStageCodegen; a Scala UDF here would box every element per row
  * (reference stores VECTOR columns but has no compute over them —
  * pixels-core/.../vector/VectorColumnVector.java:35-50; this is the
  * beyond-reference ANN path).
  *
  * Lives under org.apache.spark.sql to access the private[sql]
  * AbstractDataType / ExpressionUtils surface, the standard packaging for
  * Catalyst extensions.
  *
  * Semantics (bit-deterministic, mirrors the DuckDB oracle formula):
  * dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))), accumulated in array
  * order. Null on null input, length mismatch, empty or zero-norm input.
  */
/** Shared element-level null scan: ExpectsInputTypes admits
  * array<double> columns whose ELEMENTS are nullable (acceptsType ignores
  * containsNull), and ArrayData.getDouble/getLong silently reads a null
  * slot as 0 — every numeric kernel below must therefore null-propagate
  * explicitly or it would compute with phantom zeros. Standalone object
  * (not a companion) so Janino resolves the static call. */
object VectorKernels {
  def anyNull(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  /** can this (resolved) array-typed child carry null ELEMENTS? False
    * lets the kernels drop the per-row null scan statically — e.g.
    * collect_list/array() outputs prove containsNull=false. Unresolved
    * or non-array children answer true (scan — always safe). */
  def elemsNullable(e: Expression): Boolean =
    if (!e.resolved) true
    else e.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }

  /** delta-varint (LEB128 gaps of dictionary ranks) encoding of a SORTED
    * distinct id array — the compact wire form of a set for verify joins
    * whose payload side is too big to broadcast: ranks are strictly
    * increasing, so each gap is >= 1 and encodes in ~1 byte while the
    * set is reasonably dense in its vocabulary (vs 8 bytes/element for
    * the raw id array and nWords*8 for a fixed-width mask). Ids absent
    * from the dictionary are skipped (callers build the dict from the
    * same corpus, so this is dead in practice but must not corrupt the
    * stream). */
  def sortedRanksVarint(ids: ArrayData, dict: Array[Long],
      mayNull: Boolean): Array[Byte] = {
    val n = ids.numElements()
    val out = new Array[Byte](n * 5 + 1)
    var pos = 0
    var prev = -1
    var i = 0
    while (i < n) {
      if (!(mayNull && ids.isNullAt(i))) {
        val p = java.util.Arrays.binarySearch(dict, ids.getLong(i))
        if (p >= 0) {
          var gap = p - prev
          prev = p
          while ((gap & ~0x7f) != 0) {
            out(pos) = ((gap & 0x7f) | 0x80).toByte; pos += 1; gap >>>= 7
          }
          out(pos) = gap.toByte; pos += 1
        }
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, pos)
  }

  /** exact jaccard of two delta-varint rank streams: set sizes from one
    * terminator-byte scan (high bit clear = one element), intersection
    * from one streaming decode-merge — flat locals only, zero
    * allocation (a nested-def decoder would box every captured var into
    * IntRefs; measured 1.5x on the d03x straddle's 50M pairs). Returns
    * -1.0 for the empty-union case (callers map it to SQL NULL,
    * matching SortedJaccard's 0/0). */
  def varintJaccard(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length; val lb = b.length
    var na = 0L; var nb = 0L; var inter = 0L
    var i = 0
    while (i < la) { if ((a(i) & 0x80) == 0) na += 1; i += 1 }
    i = 0
    while (i < lb) { if ((b(i) & 0x80) == 0) nb += 1; i += 1 }
    var ia = 0; var ib = 0
    var va = -1; var vb = -1
    var doneA = la == 0; var doneB = lb == 0
    if (!doneA) {
      var s = 0; var g = 0; var bt = 0
      while ({ bt = a(ia); ia += 1
        g |= (bt & 0x7f) << s; s += 7; (bt & 0x80) != 0 }) ()
      va += g
    }
    if (!doneB) {
      var s = 0; var g = 0; var bt = 0
      while ({ bt = b(ib); ib += 1
        g |= (bt & 0x7f) << s; s += 7; (bt & 0x80) != 0 }) ()
      vb += g
    }
    while (!doneA && !doneB) {
      if (va == vb) {
        inter += 1
        if (ia >= la) doneA = true
        else {
          var s = 0; var g = 0; var bt = 0
          while ({ bt = a(ia); ia += 1
            g |= (bt & 0x7f) << s; s += 7; (bt & 0x80) != 0 }) ()
          va += g
        }
        if (ib >= lb) doneB = true
        else {
          var s = 0; var g = 0; var bt = 0
          while ({ bt = b(ib); ib += 1
            g |= (bt & 0x7f) << s; s += 7; (bt & 0x80) != 0 }) ()
          vb += g
        }
      } else if (va < vb) {
        if (ia >= la) doneA = true
        else {
          var s = 0; var g = 0; var bt = 0
          while ({ bt = a(ia); ia += 1
            g |= (bt & 0x7f) << s; s += 7; (bt & 0x80) != 0 }) ()
          va += g
        }
      } else {
        if (ib >= lb) doneB = true
        else {
          var s = 0; var g = 0; var bt = 0
          while ({ bt = b(ib); ib += 1
            g |= (bt & 0x7f) << s; s += 7; (bt & 0x80) != 0 }) ()
          vb += g
        }
      }
    }
    val union = na + nb - inter
    if (union == 0L) -1.0 else inter.toDouble / union
  }

  /** fixed-width bitmask of an id set with bit POSITIONS remapped through
    * a permutation: id -> dictionary slot p (binary search) -> bit
    * perm(p). Lets a mask's bit order follow a CANONICAL rank (e.g.
    * document-frequency-first) while the dictionary stays sorted by id
    * value for the O(log V) lookup — the first set bit of two masks'
    * AND is then the canonically-smallest shared element. */
  def idsToMaskPermuted(ids: ArrayData, dict: Array[Long], perm: Array[Int],
      nWords: Int, mayNull: Boolean): Array[Long] = {
    val words = new Array[Long](nWords)
    val n = ids.numElements()
    var i = 0
    while (i < n) {
      if (!(mayNull && ids.isNullAt(i))) {
        val p = java.util.Arrays.binarySearch(dict, ids.getLong(i))
        if (p >= 0) {
          val r = perm(p)
          words(r >> 6) |= 1L << (r & 63)
        }
      }
      i += 1
    }
    words
  }

  /** the canonically-FIRST shared set element (as its id) of two
    * documents' permuted masks, both resolved from a broadcast flat mask
    * table (sorted doc ids + nWords-strided mask words in canonical bit
    * order; canonGids maps canonical rank back to the id). -1 when the
    * docs share nothing; throws on a doc id the table does not carry —
    * the caller builds ids and masks from the same persisted frame, so a
    * miss is a broken invariant, not a data case, and silence here would
    * silently DROP candidate pairs. */
  def maskFirstSharedGid(aId: Long, bId: Long,
      bc: org.apache.spark.broadcast.Broadcast[MaskTable]): Long = {
    val t = bc.value
    val ids = t.ids
    val masks = t.masks
    val nWords = t.nWords
    val ia = java.util.Arrays.binarySearch(ids, aId)
    val ib = java.util.Arrays.binarySearch(ids, bId)
    if (ia < 0 || ib < 0)
      throw new IllegalStateException(
        s"maskFirstSharedGid: doc id ${if (ia < 0) aId else bId} missing " +
          "from the broadcast mask table")
    var w = 0
    val oa = ia * nWords
    val ob = ib * nWords
    while (w < nWords) {
      val and = masks(oa + w) & masks(ob + w)
      if (and != 0L)
        return t.canonGids((w << 6) + java.lang.Long.numberOfTrailingZeros(and))
      w += 1
    }
    -1L
  }

  /** exact jaccard of two documents resolved from the broadcast mask
    * table — word-wise AND/OR popcounts over the stored masks, -1.0 on
    * an empty union (callers map to SQL NULL). With the table already
    * shipped for [[maskFirstSharedGid]], the verify needs NO fetch
    * joins: both sides come off the broadcast, map-side. */
  def maskPairJaccard(aId: Long, bId: Long,
      bc: org.apache.spark.broadcast.Broadcast[MaskTable]): Double = {
    val t = bc.value
    val masks = t.masks
    val nWords = t.nWords
    val ia = java.util.Arrays.binarySearch(t.ids, aId)
    val ib = java.util.Arrays.binarySearch(t.ids, bId)
    if (ia < 0 || ib < 0)
      throw new IllegalStateException(
        s"maskPairJaccard: doc id ${if (ia < 0) aId else bId} missing " +
          "from the broadcast mask table")
    var inter = 0L
    var union = 0L
    var w = 0
    val oa = ia * nWords
    val ob = ib * nWords
    while (w < nWords) {
      val ma = masks(oa + w)
      val mb = masks(ob + w)
      inter += java.lang.Long.bitCount(ma & mb)
      union += java.lang.Long.bitCount(ma | mb)
      w += 1
    }
    if (union == 0L) -1.0 else inter.toDouble / union
  }

  /** the first band (0-based) on which two documents' minhash signatures
    * agree (all bandR rows equal), from a broadcast [[SigTable]]; -1
    * when none does. Throws on a missing doc id — the caller builds the
    * table and the banded rows from the same persisted frame. */
  def firstSharedBand(aId: Long, bId: Long,
      bc: org.apache.spark.broadcast.Broadcast[SigTable]): Int = {
    val t = bc.value
    val ia = java.util.Arrays.binarySearch(t.ids, aId)
    val ib = java.util.Arrays.binarySearch(t.ids, bId)
    if (ia < 0 || ib < 0)
      throw new IllegalStateException(
        s"firstSharedBand: doc id ${if (ia < 0) aId else bId} missing " +
          "from the broadcast signature table")
    val sigs = t.sigs
    val r = t.bandR
    val stride = r * t.nBands
    val oa = ia * stride
    val ob = ib * stride
    var b = 0
    while (b < t.nBands) {
      var k = 0
      var eq = true
      while (eq && k < r) {
        eq = sigs(oa + b * r + k) == sigs(ob + b * r + k)
        k += 1
      }
      if (eq) return b
      b += 1
    }
    -1
  }

  /** [[sortedRanksVarint]] for STRING token sets with an out-of-dict
    * tail: `[LEB128 nExtra][LEB128 rank gap]*`. Tokens found in the
    * sorted dictionary encode as strictly-increasing rank gaps; tokens
    * ABSENT from it are only COUNTED (nExtra) — the wire form for
    * incremental dedup where the dictionary is built once over the
    * corpus and a later batch carries novel tokens: novel tokens can
    * intersect nothing on the corpus side, so |A∩B| needs only the rank
    * streams while |A| = ranks + nExtra stays exact. Input must be a
    * SORTED DISTINCT string array (array_sort(array_distinct(..)) —
    * binary UTF8 order, the same total order the dictionary is sorted
    * by); a non-increasing rank refuses loudly rather than corrupting
    * the stream. */
  def sortedTokenRanksVarint(toks: ArrayData,
      dict: Array[org.apache.spark.unsafe.types.UTF8String],
      mayNull: Boolean): Array[Byte] = {
    val n = toks.numElements()
    val ranks = new Array[Int](n)
    var nr = 0
    var extra = 0
    var i = 0
    while (i < n) {
      if (!(mayNull && toks.isNullAt(i))) {
        val p = java.util.Arrays.binarySearch(
          dict.asInstanceOf[Array[AnyRef]], toks.getUTF8String(i))
        if (p >= 0) {
          if (nr > 0 && p <= ranks(nr - 1))
            throw new IllegalArgumentException(
              "sortedTokenRanksVarint: input array is not sorted distinct")
          ranks(nr) = p; nr += 1
        } else extra += 1
      }
      i += 1
    }
    val out = new Array[Byte](nr * 5 + 10)
    var pos = 0
    var g = extra
    while ((g & ~0x7f) != 0) {
      out(pos) = ((g & 0x7f) | 0x80).toByte; pos += 1; g >>>= 7
    }
    out(pos) = g.toByte; pos += 1
    var prev = -1
    i = 0
    while (i < nr) {
      var gap = ranks(i) - prev
      prev = ranks(i)
      while ((gap & ~0x7f) != 0) {
        out(pos) = ((gap & 0x7f) | 0x80).toByte; pos += 1; gap >>>= 7
      }
      out(pos) = gap.toByte; pos += 1
      i += 1
    }
    java.util.Arrays.copyOf(out, pos)
  }

  /** exact jaccard over two [[sortedTokenRanksVarint]] streams: set
    * sizes = decoded header (out-of-dict count) + terminator-byte count
    * of the gap tail; intersection from one streaming decode-merge over
    * the rank gaps (flat locals, zero allocation — same discipline as
    * [[varintJaccard]]). SOUND ONLY when the two sides' out-of-dict
    * tokens cannot coincide — e.g. one side is the corpus the dictionary
    * was built from (nExtra = 0 by construction). Returns -1.0 on an
    * empty union (callers map to SQL NULL). */
  def varintJaccardEx(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length; val lb = b.length
    var ia = 0; var ib = 0
    var na = 0L; var nb = 0L
    var bt = 0
    if (la > 0) {
      var s = 0; var g = 0L
      while ({ bt = a(ia); ia += 1
        g |= (bt & 0x7f).toLong << s; s += 7; (bt & 0x80) != 0 }) ()
      na = g
    }
    if (lb > 0) {
      var s = 0; var g = 0L
      while ({ bt = b(ib); ib += 1
        g |= (bt & 0x7f).toLong << s; s += 7; (bt & 0x80) != 0 }) ()
      nb = g
    }
    var i = ia
    while (i < la) { if ((a(i) & 0x80) == 0) na += 1; i += 1 }
    i = ib
    while (i < lb) { if ((b(i) & 0x80) == 0) nb += 1; i += 1 }
    var inter = 0L
    var va = -1; var vb = -1
    var doneA = ia >= la; var doneB = ib >= lb
    if (!doneA) {
      var s = 0; var g = 0
      while ({ bt = a(ia); ia += 1
        g |= (bt & 0x7f) << s; s += 7; (bt & 0x80) != 0 }) ()
      va += g
    }
    if (!doneB) {
      var s = 0; var g = 0
      while ({ bt = b(ib); ib += 1
        g |= (bt & 0x7f) << s; s += 7; (bt & 0x80) != 0 }) ()
      vb += g
    }
    while (!doneA && !doneB) {
      if (va == vb) {
        inter += 1
        if (ia >= la) doneA = true
        else {
          var s = 0; var g = 0
          while ({ bt = a(ia); ia += 1
            g |= (bt & 0x7f) << s; s += 7; (bt & 0x80) != 0 }) ()
          va += g
        }
        if (ib >= lb) doneB = true
        else {
          var s = 0; var g = 0
          while ({ bt = b(ib); ib += 1
            g |= (bt & 0x7f) << s; s += 7; (bt & 0x80) != 0 }) ()
          vb += g
        }
      } else if (va < vb) {
        if (ia >= la) doneA = true
        else {
          var s = 0; var g = 0
          while ({ bt = a(ia); ia += 1
            g |= (bt & 0x7f) << s; s += 7; (bt & 0x80) != 0 }) ()
          va += g
        }
      } else {
        if (ib >= lb) doneB = true
        else {
          var s = 0; var g = 0
          while ({ bt = b(ib); ib += 1
            g |= (bt & 0x7f) << s; s += 7; (bt & 0x80) != 0 }) ()
          vb += g
        }
      }
    }
    val union = na + nb - inter
    if (union == 0L) -1.0 else inter.toDouble / union
  }
}

case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // static gate: when the RESOLVED element types prove no nulls exist,
  // the hot loop carries zero per-element null checks (this kernel is
  // pure mults — a null scan would roughly double it on brute paths)
  private lazy val mayHaveNullElems =
    VectorKernels.elemsNullable(left) || VectorKernels.elemsNullable(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0 || b.numElements() != n) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        // fused null check (one pass, only when the type allows nulls):
        // a null element null-propagates the whole similarity
        if (mayHaveNullElems && (a.isNullAt(i) || b.isNullAt(i))) return null
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      val bad = ctx.freshName("bad")
      // fused per-element null check, emitted ONLY when the resolved type
      // allows null elements — the proven-non-null hot paths keep the
      // branch-free multiply loop
      val nullCheck = if (mayHaveNullElems)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n == 0 || $b.numElements() != $n);
         |if (!$bad) {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($bad || $denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |} else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Raw inner product of two double arrays — the MIPS scoring kernel
  * (recommendation-style retrieval ranks by unnormalized dot, not cosine).
  * Same codegen shape as CosineSimilarity minus the norms; accumulates in
  * array order so it bit-matches DuckDB's list_dot_product. Null on null
  * input or length mismatch; empty arrays yield null (no 0-dim vectors).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val mayHaveNullElems =
    VectorKernels.elemsNullable(left) || VectorKernels.elemsNullable(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0 || b.numElements() != n) null
    else {
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (mayHaveNullElems && (a.isNullAt(i) || b.isNullAt(i))) return null
        dot += a.getDouble(i) * b.getDouble(i); i += 1
      }
      java.lang.Double.valueOf(dot)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val bad = ctx.freshName("bad")
      val nullCheck = if (mayHaveNullElems)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n == 0 || $b.numElements() != $n);
         |if (!$bad) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot; }
         |} else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact Jaccard of two SORTED distinct long-id arrays in one merge pass —
  * the per-candidate verify kernel of the similarity self-joins (d02/d03).
  * Spark's `array_intersect`/`array_union` build a hash set per CALL with
  * boxed entries; over millions of candidate pairs the allocation cost
  * dominates the verify stage. The merge loop does zero allocation and
  * stays inside WholeStageCodegen.
  *
  * Inputs MUST be sorted and duplicate-free (the callers sort once per
  * document at aggregation time — `sort_array(collect_list(...))` — which
  * also makes the arrays deterministic). Null on null input; null for two
  * empty arrays (0/0, matching the SQL size/size formula's behavior).
  */
case class SortedJaccard(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val mayHaveNullElems =
    VectorKernels.elemsNullable(left) || VectorKernels.elemsNullable(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (mayHaveNullElems &&
      (VectorKernels.anyNull(a) || VectorKernels.anyNull(b))) return null
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na.toLong + nb - inter
    if (union == 0L) null else java.lang.Double.valueOf(inter.toDouble / union)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      val nullCheck = if (mayHaveNullElems)
        s"""org.apache.spark.sql.graft.VectorKernels.anyNull($a) ||
           |    org.apache.spark.sql.graft.VectorKernels.anyNull($b)""".stripMargin
      else "false"
      s"""
         |if ($nullCheck) {
         |  ${ev.isNull} = true;
         |} else {
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0;
         |long $inter = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $inter++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |long $union = (long) $na + (long) $nb - $inter;
         |if ($union == 0L) { ${ev.isNull} = true; }
         |else { ${ev.value} = (double) $inter / (double) $union; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact Jaccard over two fixed-width Long bitmasks:
  * popcount(AND) / popcount(OR), one fused pass — the per-pair kernel of
  * the dedup verify's mask tiers (d03). Words past the shorter mask's end
  * contribute to the union only (masks are built same-width by the
  * caller; the general formula keeps a width mismatch correct rather
  * than silently wrong). Null on null input or an empty union (0/0,
  * matching SortedJaccard).
  */
case class MaskJaccard(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val mayHaveNullElems =
    VectorKernels.elemsNullable(left) || VectorKernels.elemsNullable(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (mayHaveNullElems &&
      (VectorKernels.anyNull(a) || VectorKernels.anyNull(b))) return null
    val na = a.numElements(); val nb = b.numElements()
    val n = math.min(na, nb)
    var i = 0; var inter = 0L; var union = 0L
    while (i < n) {
      val x = a.getLong(i); val y = b.getLong(i)
      inter += java.lang.Long.bitCount(x & y)
      union += java.lang.Long.bitCount(x | y)
      i += 1
    }
    while (i < na) { union += java.lang.Long.bitCount(a.getLong(i)); i += 1 }
    while (i < nb) { union += java.lang.Long.bitCount(b.getLong(i)); i += 1 }
    if (union == 0L) null else java.lang.Double.valueOf(inter.toDouble / union)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      val nullCheck = if (mayHaveNullElems)
        s"""org.apache.spark.sql.graft.VectorKernels.anyNull($a) ||
           |    org.apache.spark.sql.graft.VectorKernels.anyNull($b)""".stripMargin
      else "false"
      s"""
         |if ($nullCheck) {
         |  ${ev.isNull} = true;
         |} else {
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $n = $na < $nb ? $na : $nb;
         |long $inter = 0L;
         |long $union = 0L;
         |int $i = 0;
         |while ($i < $n) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($i);
         |  $inter += java.lang.Long.bitCount($x & $y);
         |  $union += java.lang.Long.bitCount($x | $y);
         |  $i++;
         |}
         |while ($i < $na) { $union += java.lang.Long.bitCount($a.getLong($i)); $i++; }
         |while ($i < $nb) { $union += java.lang.Long.bitCount($b.getLong($i)); $i++; }
         |if ($union == 0L) { ${ev.isNull} = true; }
         |else { ${ev.value} = (double) $inter / (double) $union; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fixed-width Long bitmask from a list of 1-based bit positions
  * (`collect_list` of dictionary ranks, any order, duplicates fine) —
  * the O(|set| + nWords) mask builder that replaced d03's 64-column
  * pivot aggregate and lets the mask tier extend past 64 words without
  * the aggregate-width codegen cliff. Positions outside
  * [1, nWords * 64] are ignored (the caller's dictionary bounds them by
  * construction; dropping beats throwing mid-stage on a corrupt rank).
  * Null on null input; output elements are never null.
  */
case class PositionsToMask(child: Expression, nWords: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(nWords > 0, "nWords must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private lazy val mayHaveNullElems = VectorKernels.elemsNullable(child)

  override def nullSafeEval(v: Any): Any = {
    val ps = v.asInstanceOf[ArrayData]
    val words = new Array[Long](nWords)
    val n = ps.numElements()
    var i = 0
    while (i < n) {
      if (!(mayHaveNullElems && ps.isNullAt(i))) {
        val p = ps.getInt(i) - 1
        if (p >= 0 && p < nWords * 64) words(p >> 6) |= 1L << (p & 63)
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val words = ctx.freshName("words")
      val skipNull = if (mayHaveNullElems) s"$a.isNullAt($i)" else "false"
      s"""
         |long[] $words = new long[$nWords];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!($skipNull)) {
         |    int $p = $a.getInt($i) - 1;
         |    if ($p >= 0 && $p < ${nWords * 64}) {
         |      $words[$p >> 6] |= 1L << ($p & 63);
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($words);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fixed-width Long bitmask straight from a document's sorted-distinct id
  * array and a sorted dictionary (bit i-1 set iff dict(i-1) present) —
  * the zero-shuffle mask builder: where PositionsToMask needs the ids
  * joined against a rank table and re-grouped per document, this computes
  * the same mask map-side from the already-persisted id arrays with the
  * dictionary riding along as one reference object (the HyperplaneSigs
  * packaging). Binary search per element: O(|set| log V) per row. Ids not
  * in the dictionary are ignored (the caller builds the dictionary FROM
  * the corpus, so misses mean a stale dictionary — dropping beats a wrong
  * bit). Null on null input; output elements are never null.
  */
case class SortedIdsToMask(child: Expression, dict: Array[Long])
  extends UnaryExpression with ExpectsInputTypes {

  require(dict.nonEmpty, "empty dictionary")

  private def nWords: Int = (dict.length + 63) / 64

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private lazy val mayHaveNullElems = VectorKernels.elemsNullable(child)

  override def nullSafeEval(v: Any): Any = {
    val ids = v.asInstanceOf[ArrayData]
    val words = new Array[Long](nWords)
    val n = ids.numElements()
    var i = 0
    while (i < n) {
      if (!(mayHaveNullElems && ids.isNullAt(i))) {
        val p = java.util.Arrays.binarySearch(dict, ids.getLong(i))
        if (p >= 0) words(p >> 6) |= 1L << (p & 63)
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("dict", dict, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val words = ctx.freshName("words")
      val skipNull = if (mayHaveNullElems) s"$a.isNullAt($i)" else "false"
      s"""
         |long[] $words = new long[$nWords];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!($skipNull)) {
         |    int $p = java.util.Arrays.binarySearch($dictRef, $a.getLong($i));
         |    if ($p >= 0) {
         |      $words[$p >> 6] |= 1L << ($p & 63);
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($words);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Delta-varint (LEB128 rank gaps) encoding of a sorted distinct id
  * array against a sorted dictionary — the COMPACT verify payload for
  * set-similarity joins whose payload side exceeds the broadcast gate
  * (d03's sf1 straddle: 50.9M candidate rows each dragging two masks
  * through two exchanges was the row's dominant cost; the varint form is
  * ~1-2 bytes per element vs nWords*8 for the mask and 8 per element for
  * the raw ids). Exactness is unchanged: [[VarintJaccard]] decodes the
  * same rank sets the mask/array kernels compare. */
case class SortedIdsToVarint(child: Expression, dict: Array[Long])
  extends UnaryExpression with ExpectsInputTypes {

  // an EMPTY dictionary is legal (empty corpus with a forced varint
  // tier): every set encodes to an empty stream and VarintJaccard yields
  // NULL on the 0/0 union — the same degradation the mask/array tiers
  // already have, instead of a construction-time require blowing up

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  private lazy val mayHaveNullElems = VectorKernels.elemsNullable(child)

  override def nullSafeEval(v: Any): Any =
    VectorKernels.sortedRanksVarint(
      v.asInstanceOf[ArrayData], dict, mayHaveNullElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("dict", dict, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.VectorKernels
         |  .sortedRanksVarint($a, $dictRef, $mayHaveNullElems);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact Jaccard over two delta-varint rank streams ([[SortedIdsToVarint]]
  * output): one streaming decode-merge per pair, zero allocation — the
  * same |A∩B|/|A∪B| as SortedJaccard/MaskJaccard on the same sets. Null
  * on null input or an empty union (0/0), matching both siblings. */
case class VarintJaccard(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val j = VectorKernels.varintJaccard(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
    if (j < 0.0) null else java.lang.Double.valueOf(j)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      s"""
         |double $j = org.apache.spark.sql.graft.VectorKernels
         |  .varintJaccard($a, $b);
         |if ($j < 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $j; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Bitmask of an id set with bit positions remapped through a
  * permutation ([[VectorKernels.idsToMaskPermuted]]): the mask layout
  * follows a CANONICAL total order (document-frequency-first for
  * PPJoin) while the id dictionary stays value-sorted for the lookup.
  * Jaccard over these masks equals jaccard over the plain
  * [[SortedIdsToMask]] form (popcounts are permutation-invariant). */
case class SortedIdsToMaskPermuted(child: Expression, dict: Array[Long],
    perm: Array[Int], nWords: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private lazy val mayHaveNullElems = VectorKernels.elemsNullable(child)

  override def nullSafeEval(v: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(VectorKernels.idsToMaskPermuted(
        v.asInstanceOf[ArrayData], dict, perm, nWords, mayHaveNullElems))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("dict", dict, "long[]")
    val permRef = ctx.addReferenceObj("perm", perm, "int[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(org.apache.spark.sql.graft.VectorKernels
         |    .idsToMaskPermuted($a, $dictRef, $permRef, $nWords,
         |      $mayHaveNullElems));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** flat per-document mask table for [[PairMinSharedGid]]: sorted doc
  * ids, nWords-strided canonical-order mask words, and the canonical
  * rank -> id map. Shipped as a Spark BROADCAST (one copy per executor,
  * a handle in the task binary), so the unique-emission predicate stays
  * usable well past expression-reference sizes — the gate is executor
  * memory, not plan size. */
final class MaskTable(val ids: Array[Long], val masks: Array[Long],
    val nWords: Int, val canonGids: Array[Long]) extends Serializable

/** The id of the canonically-first shared set element of two documents,
  * resolved from a broadcast flat mask table
  * ([[VectorKernels.maskFirstSharedGid]]) — the unique-emission
  * predicate for PPJoin candidate enumeration: a prefix-join copy at
  * gram g is kept iff g IS the pair's canonically-smallest shared gram,
  * so each candidate pair leaves the join exactly once and the
  * downstream distinct exchange disappears. -1 when nothing is shared. */
case class PairMinSharedGid(left: Expression, right: Expression,
    bc: org.apache.spark.broadcast.Broadcast[MaskTable])
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.maskFirstSharedGid(l.asInstanceOf[Long],
      r.asInstanceOf[Long], bc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("maskTableBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.VectorKernels
         |  .maskFirstSharedGid($a, $b, $bcRef);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** flat per-document MINHASH SIGNATURE table for
  * [[PairFirstSharedBand]]: sorted doc ids plus (nBands * bandR)-strided
  * signature words. Same broadcast shipping rationale as [[MaskTable]]. */
final class SigTable(val ids: Array[Long], val sigs: Array[Long],
    val bandR: Int, val nBands: Int) extends Serializable

/** The index of the FIRST band (0-based) on which two documents' minhash
  * signatures agree, resolved from a broadcast signature table — the
  * unique-emission predicate for LSH band self-joins: a band-join copy
  * at band b survives iff b IS the pair's first shared band, so each
  * candidate pair leaves the join exactly once and the pre-distinct
  * band-hit exchange (one row per shared band, up to nBands per similar
  * pair) disappears. -1 when no band agrees; throws on a doc id the
  * table does not carry (same broken-invariant rationale as
  * [[VectorKernels.maskFirstSharedGid]]). */
case class PairFirstSharedBand(left: Expression, right: Expression,
    bc: org.apache.spark.broadcast.Broadcast[SigTable])
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.firstSharedBand(l.asInstanceOf[Long],
      r.asInstanceOf[Long], bc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("sigTableBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.VectorKernels
         |  .firstSharedBand($a, $b, $bcRef);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact jaccard of two documents' sets resolved from the broadcast
  * mask table ([[VectorKernels.maskPairJaccard]]): with the table
  * already shipped for [[PairMinSharedGid]], the exact verify becomes a
  * map-side expression over the bare (a_id, b_id) candidate stream —
  * no payload fetch joins, no payload exchanges at all. Null on null
  * input or an empty union, matching every sibling jaccard kernel. */
case class PairMaskJaccard(left: Expression, right: Expression,
    bc: org.apache.spark.broadcast.Broadcast[MaskTable])
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val j = VectorKernels.maskPairJaccard(l.asInstanceOf[Long],
      r.asInstanceOf[Long], bc)
    if (j < 0.0) null else java.lang.Double.valueOf(j)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("maskTableBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      s"""
         |double $j = org.apache.spark.sql.graft.VectorKernels
         |  .maskPairJaccard($a, $b, $bcRef);
         |if ($j < 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $j; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Delta-varint rank-stream encoding of a sorted distinct STRING token
  * array against a sorted string dictionary, with an out-of-dict count
  * header ([[VectorKernels.sortedTokenRanksVarint]]) — the compact,
  * EXACT verify payload for incremental dedup (d10): the corpus side
  * encodes once at index build (every token in-dict), a later batch
  * carries novel tokens as a count, and [[VarintJaccardEx]] recovers the
  * exact |A∩B|/|A∪B| because novel tokens can intersect nothing on the
  * corpus side. ~1-2 bytes/token on the wire vs ~8+len bytes for the raw
  * string array the fetch joins previously dragged through two
  * exchanges. */
case class SortedTokensToVarint(child: Expression,
    dict: Array[org.apache.spark.unsafe.types.UTF8String])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  private lazy val mayHaveNullElems = VectorKernels.elemsNullable(child)

  override def nullSafeEval(v: Any): Any =
    VectorKernels.sortedTokenRanksVarint(
      v.asInstanceOf[ArrayData], dict, mayHaveNullElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("dict", dict,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.VectorKernels
         |  .sortedTokenRanksVarint($a, $dictRef, $mayHaveNullElems);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact Jaccard over two [[SortedTokensToVarint]] streams (rank merge +
  * out-of-dict headers): null on null input or an empty union, matching
  * the array/varint siblings. Sound when at most one side can carry
  * out-of-dict tokens (see [[VectorKernels.varintJaccardEx]]). */
case class VarintJaccardEx(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val j = VectorKernels.varintJaccardEx(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
    if (j < 0.0) null else java.lang.Double.valueOf(j)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      s"""
         |double $j = org.apache.spark.sql.graft.VectorKernels
         |  .varintJaccardEx($a, $b);
         |if ($j < 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $j; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All random-hyperplane LSH signatures of one vector in a single pass —
  * `tables` signatures of `bits` sign-bits each, over a flat row-major
  * plane matrix ((t * bits + b) * dim + i). One compact generated loop
  * replaces tables*bits separate DotProduct instances in the signing
  * projection: the per-plan codegen size (and Janino compile time) stays
  * O(1) in tables*bits, and the plane matrix rides along as a single
  * reference object instead of tables*bits array literals.
  * Null on null input; mismatched dimensions (vector length vs matrix
  * size) yield null rather than a partial signature.
  */
case class HyperplaneSigs(child: Expression, planes: Array[Double],
    tables: Int, bits: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(tables > 0 && bits > 0 && bits <= 30 && planes.nonEmpty &&
    planes.length % (tables * bits) == 0,
    "planes must be a non-empty flat (tables*bits) x dim matrix " +
      "(dim = 0 would map every vector to colliding all-zero signatures)")

  private val dim = planes.length / (tables * bits)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val mayHaveNullElems = VectorKernels.elemsNullable(child)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim ||
      (mayHaveNullElems && VectorKernels.anyNull(v))) null
    else {
      val out = new Array[Int](tables)
      var t = 0
      while (t < tables) {
        var sig = 0
        var b = 0
        while (b < bits) {
          val off = (t * bits + b) * dim
          var dot = 0.0
          var i = 0
          while (i < dim) { dot += v.getDouble(i) * planes(off + i); i += 1 }
          if (dot > 0) sig |= (1 << b)
          b += 1
        }
        out(t) = sig
        t += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.addReferenceObj("planes", planes, "double[]")
      val out = ctx.freshName("sigs")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      val nullCheck = if (mayHaveNullElems)
        s" ||\n    org.apache.spark.sql.graft.VectorKernels.anyNull($v)"
      else ""
      s"""
         |if ($v.numElements() != $dim$nullCheck) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[$tables];
         |  for (int $t = 0; $t < $tables; $t++) {
         |    int $sig = 0;
         |    for (int $b = 0; $b < $bits; $b++) {
         |      int $off = ($t * $bits + $b) * $dim;
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        $dot += $v.getDouble($i) * $p[$off + $i];
         |      }
         |      if ($dot > 0) $sig |= (1 << $b);
         |    }
         |    $out[$t] = $sig;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct, ascending, PACKED character-trigram ids of a string: each id
  * packs the trigram's three Unicode code points into 63 bits
  * ((c1<<42)|(c2<<21)|c3 — code points < 2^21), an INJECTIVE encoding of
  * `substring(s, i, 3)`. Set algebra over the ids is therefore exactly
  * set algebra over the trigram strings — no dictionary-encoding join, no
  * hash-collision check, no per-gram string allocation. Equivalent to
  * `array_distinct(transform(sequence(1, length(s)-2), i ->
  * substring(s, i, 3)))` up to element order (ascending here), operating
  * on code points exactly as Spark's `substring`/`length` do. Strings
  * with fewer than 3 code points yield an empty array. */
case class TrigramIds(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TrigramIds.ids(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  // one static call keeps the surrounding operators inside
  // WholeStageCodegen (the helper itself is branchy scalar code that the
  // JIT handles fine; what matters is not breaking the codegen span)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.TrigramIds.ids($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrigramIds {
  def ids(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = u.toString
    val sl = s.length
    // code points (what Spark's substring/length count)
    var n = 0
    var i = 0
    while (i < sl) { i += Character.charCount(s.codePointAt(i)); n += 1 }
    if (n < 3)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    val cps = new Array[Int](n)
    i = 0
    var k = 0
    while (i < sl) {
      val cp = s.codePointAt(i); cps(k) = cp; k += 1; i += Character.charCount(cp)
    }
    val ids = new Array[Long](n - 2)
    var j = 0
    while (j < n - 2) {
      ids(j) = (cps(j).toLong << 42) | (cps(j + 1).toLong << 21) | cps(j + 2).toLong
      j += 1
    }
    java.util.Arrays.sort(ids)
    var m = 0
    var p = 0
    while (p < ids.length) {
      if (m == 0 || ids(m - 1) != ids(p)) { ids(m) = ids(p); m += 1 }
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (m == ids.length) ids else java.util.Arrays.copyOf(ids, m))
  }
}

/** All `n` MinHash signatures of a token-id array in ONE pass: for each
  * hash function i, the minimum over elements x of Spark's
  * `xxhash64(lit(i), x)` — BIT-IDENTICAL to the
  * `array_min(transform(tids, x -> xxhash64(lit(i), x)))` formula (the
  * per-function seed prefix `XXH64.hashInt(i, 42)` is precomputed once),
  * but without n transform-array allocations per row. Null on empty
  * input, matching array_min-of-empty. */
case class MinHashSigs(child: Expression, numHashes: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0,
    s"minhash_sigs needs a positive hash count, got $numHashes")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val mayHaveNullElems = VectorKernels.elemsNullable(child)

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.eval(input.asInstanceOf[ArrayData], numHashes,
      mayHaveNullElems)

  // the kernel lives in a standalone object (NOT the companion): scalac
  // skips the static forwarder when the companion class inherits a method
  // of the same name (Expression.eval), and Janino then cannot resolve the
  // call — the whole stage silently falls back to interpreted execution
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = org.apache.spark.sql.graft.MinHashKernel.eval($a, $numHashes, $mayHaveNullElems);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashKernel {
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  /** per-function seed prefix: Spark's XxHash64 over (int literal i, x)
    * folds i into the 42L seed first — precompute that fold once */
  private def seeds(n: Int): Array[Long] =
    seedCache.computeIfAbsent(n, _ => Array.tabulate(n)(i =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L)))

  def eval(arr: ArrayData, n: Int, checkNulls: Boolean)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val m = arr.numElements()
    if (m == 0) return null // array_min of an empty transform is null
    // a null tid is not a token id: null-propagate rather than hashing a
    // phantom 0L (callers never produce null tids — xxhash64/dense ids
    // over non-null tokens carry containsNull=false, so the hot paths
    // skip this scan statically; checkNulls covers API users)
    if (checkNulls && VectorKernels.anyNull(arr)) return null
    val s = seeds(n)
    val out = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val x = arr.getLong(j)
      var i = 0
      while (i < n) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(x, s(i))
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** All LSH band keys of a token-id array in ONE fused pass: the identical
  * `numHashes` MinHash minima as [[MinHashSigs]] (same seed folding, same
  * XXH64 — candidate sets cannot change), grouped into
  * `numHashes / bandR` structs `(band:int, h0..h{bandR-1}:long)` directly
  * from the accumulator — no intermediate `array<long>` column, no
  * `numHashes` GetArrayItem evaluations, no struct/array expression tree
  * per row (that tree was the dedup family's hottest projection: the
  * 128-min signature pass feeds every band join). Null on empty or
  * null-element input; [[MinHashSigs]] yields an all-null-field struct
  * array there, whose band-key equality is also never true, so candidate
  * emission is identical (and the hot callers' token arrays are non-empty
  * by construction: split() never returns an empty array). */
case class MinHashBands(child: Expression, numHashes: Int, bandR: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0 && bandR > 0 && numHashes % bandR == 0,
    s"minhash_bands needs numHashes divisible by bandR, got $numHashes/$bandR")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(StructField("band", IntegerType, nullable = false) +:
      (0 until bandR).map(r => StructField(s"h$r", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  private lazy val mayHaveNullElems = VectorKernels.elemsNullable(child)

  override def nullSafeEval(input: Any): Any =
    MinHashBandsKernel.eval(input.asInstanceOf[ArrayData], numHashes, bandR,
      mayHaveNullElems)

  // standalone kernel object for the same forwarder reason as MinHashKernel
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = org.apache.spark.sql.graft.MinHashBandsKernel.eval($a, $numHashes, $bandR, $mayHaveNullElems);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBandsKernel {
  def eval(arr: ArrayData, n: Int, bandR: Int, checkNulls: Boolean)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val mins = MinHashKernel.eval(arr, n, checkNulls)
    if (mins == null) return null
    val nBands = n / bandR
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      val row = new Array[Any](1 + bandR)
      row(0) = b
      var r = 0
      while (r < bandR) { row(r + 1) = mins.getLong(b * bandR + r); r += 1 }
      out(b) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(row)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** 32-bit SimHash of a token array in one pass, BIT-IDENTICAL to the
  * engine-portable SQL formula both sides of the oracle compute
  * (per token: md5 hex of the UTF-8 bytes; hex char k >= '8' — i.e. the
  * nibble's high bit — votes +1 on bit k-1, else -1; bit set iff the vote
  * sum is positive; null tokens vote -1 everywhere, matching
  * `when(null >= "8", 1).otherwise(-1)`). Replaces an explode + 32-column
  * aggregation (a full shuffle of the token stream) with a per-row
  * expression. Null on an empty array — the groupBy formulation simply
  * has no row there, so callers filter nulls to match. */
case class Simhash32(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimhashKernel.eval(input.asInstanceOf[ArrayData])

  // standalone kernel object for the same forwarder reason as MinHashKernel
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName, not a hard-coded local: with a non-nullable child the
      // emitted code lands unwrapped at method scope, and two simhash32
      // calls in one projection would declare the same variable twice —
      // a Janino compile error that silently falls the whole stage back
      // to interpreted execution
      val r = ctx.freshName("sh")
      s"""
      |java.lang.Long $r = org.apache.spark.sql.graft.SimhashKernel.eval($a);
      |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
      |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashKernel {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def eval(arr: ArrayData): java.lang.Long = {
    val m = arr.numElements()
    if (m == 0) return null
    val votes = new Array[Int](32)
    val md = mdPool.get()
    var j = 0
    while (j < m) {
      if (arr.isNullAt(j)) {
        var k = 0
        while (k < 32) { votes(k) -= 1; k += 1 }
      } else {
        md.reset()
        val dg = md.digest(arr.getUTF8String(j).getBytes)
        var k = 0
        while (k < 32) {
          val b = dg(k >> 1) & 0xFF
          val nib = if ((k & 1) == 0) b >>> 4 else b & 0xF
          if (nib >= 8) votes(k) += 1 else votes(k) -= 1
          k += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var k = 0
    while (k < 32) { if (votes(k) > 0) fp |= 1L << k; k += 1 }
    java.lang.Long.valueOf(fp)
  }
}

/** Map-side nearest-centroid assignment for the IVF trainer (v03/v06):
  * argmax over K centroids of dot(v, c_k)/(norm * cnorm_k), ties and
  * all-invalid inputs resolving to the LOWEST cid — the exact total order
  * of the max_by(struct(ccos, -cid)) formulation it replaces, computed
  * without the n x K crossJoin row blowup or the per-iteration
  * groupBy(n_id) exchange. The K x dim centroid matrix rides the task
  * binary as a flat literal (K is bounded; at K=8, dim<=1024 this is
  * <=64 KB). A candidate centroid is valid iff its denom != 0 (the
  * `when(denom =!= 0.0, ...)` null semantics of the cosine helper); a
  * vector that is null-element-ridden or of mismatched dimension has no
  * valid candidate and lands in cid 0, exactly where the null-ccos
  * max_by sent it. Null only on null input (callers coalesce to 0). */
case class NearestCentroid(vec: Expression, norm: Expression,
    cents: Array[Double], cnorms: Array[Double])
  extends BinaryExpression with ExpectsInputTypes {

  require(cnorms.nonEmpty && cents.length % cnorms.length == 0,
    "cents must be a flat K x dim matrix matching cnorms")

  private val k = cnorms.length
  private val dim = cents.length / k

  override def left: Expression = vec
  override def right: Expression = norm
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private lazy val mayHaveNullElems = VectorKernels.elemsNullable(vec)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val nn = r.asInstanceOf[Double]
    if (v.numElements() != dim ||
      (mayHaveNullElems && VectorKernels.anyNull(v))) Integer.valueOf(0)
    else {
      var best = 0
      var bestCos = 0.0
      var has = false
      var c = 0
      while (c < k) {
        val denom = nn * cnorms(c)
        if (denom != 0.0) {
          var dot = 0.0
          var i = 0
          val off = c * dim
          while (i < dim) { dot += v.getDouble(i) * cents(off + i); i += 1 }
          val cos = dot / denom
          if (!has || cos > bestCos) { has = true; best = c; bestCos = cos }
        }
        c += 1
      }
      Integer.valueOf(best)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nn) => {
      val cm = ctx.addReferenceObj("cents", cents, "double[]")
      val cn = ctx.addReferenceObj("cnorms", cnorms, "double[]")
      val best = ctx.freshName("best")
      val bestCos = ctx.freshName("bestCos")
      val has = ctx.freshName("has")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val denom = ctx.freshName("denom")
      val cos = ctx.freshName("cos")
      val nullCheck = if (mayHaveNullElems)
        s" ||\n    org.apache.spark.sql.graft.VectorKernels.anyNull($v)"
      else ""
      s"""
         |if ($v.numElements() != $dim$nullCheck) {
         |  ${ev.value} = 0;
         |} else {
         |  int $best = 0; double $bestCos = 0.0; boolean $has = false;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $denom = $nn * $cn[$c];
         |    if ($denom != 0.0) {
         |      double $dot = 0.0;
         |      int $off = $c * $dim;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        $dot += $v.getDouble($i) * $cm[$off + $i];
         |      }
         |      double $cos = $dot / $denom;
         |      if (!$has || $cos > $bestCos) {
         |        $has = true; $best = $c; $bestCos = $cos;
         |      }
         |    }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, norm = newRight)
}

object VectorExpressions {
  def cos_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def simhash32(a: Column): Column =
    ExpressionUtils.column(Simhash32(ExpressionUtils.expression(a)))

  def trigram_ids(s: Column): Column =
    ExpressionUtils.column(TrigramIds(ExpressionUtils.expression(s)))

  def minhash_sigs(a: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSigs(ExpressionUtils.expression(a), numHashes))

  def minhash_bands(a: Column, numHashes: Int, bandR: Int): Column =
    ExpressionUtils.column(MinHashBands(
      ExpressionUtils.expression(a), numHashes, bandR))

  def sorted_jaccard(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedJaccard(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def mask_jaccard(a: Column, b: Column): Column =
    ExpressionUtils.column(MaskJaccard(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def positions_to_mask(ps: Column, nWords: Int): Column =
    ExpressionUtils.column(PositionsToMask(
      ExpressionUtils.expression(ps), nWords))

  def sorted_ids_to_mask(ids: Column, dict: Array[Long]): Column =
    ExpressionUtils.column(SortedIdsToMask(
      ExpressionUtils.expression(ids), dict))

  def sorted_ids_to_varint(ids: Column, dict: Array[Long]): Column =
    ExpressionUtils.column(SortedIdsToVarint(
      ExpressionUtils.expression(ids), dict))

  def varint_jaccard(a: Column, b: Column): Column =
    ExpressionUtils.column(VarintJaccard(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sorted_ids_to_mask_permuted(ids: Column, dict: Array[Long],
      perm: Array[Int], nWords: Int): Column =
    ExpressionUtils.column(SortedIdsToMaskPermuted(
      ExpressionUtils.expression(ids), dict, perm, nWords))

  def pair_min_shared_gid(a: Column, b: Column,
      bc: org.apache.spark.broadcast.Broadcast[MaskTable]): Column =
    ExpressionUtils.column(PairMinSharedGid(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), bc))

  def pair_mask_jaccard(a: Column, b: Column,
      bc: org.apache.spark.broadcast.Broadcast[MaskTable]): Column =
    ExpressionUtils.column(PairMaskJaccard(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), bc))

  def pair_first_shared_band(a: Column, b: Column,
      bc: org.apache.spark.broadcast.Broadcast[SigTable]): Column =
    ExpressionUtils.column(PairFirstSharedBand(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), bc))

  /** dict is sorted HERE (binary UTF8 order — the exact comparator the
    * kernel's binarySearch uses), so index-build and probe encodes can
    * never disagree on rank assignment however the caller ordered it */
  def sorted_tokens_to_varint(toks: Column, dict: Array[String]): Column = {
    val u = dict.map(org.apache.spark.unsafe.types.UTF8String.fromString)
    java.util.Arrays.sort(u.asInstanceOf[Array[AnyRef]])
    ExpressionUtils.column(SortedTokensToVarint(
      ExpressionUtils.expression(toks), u))
  }

  def varint_jaccard_ex(a: Column, b: Column): Column =
    ExpressionUtils.column(VarintJaccardEx(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def hyperplane_sigs(v: Column, planes: Array[Double],
      tables: Int, bits: Int): Column =
    ExpressionUtils.column(HyperplaneSigs(
      ExpressionUtils.expression(v), planes, tables, bits))

  def nearest_centroid(v: Column, norm: Column,
      cents: Array[Double], cnorms: Array[Double]): Column =
    ExpressionUtils.column(NearestCentroid(
      ExpressionUtils.expression(v), ExpressionUtils.expression(norm),
      cents, cnorms))
}
