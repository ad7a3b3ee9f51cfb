package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram count-map kernels for pairwise overlap metrics
  * (ROUGE-style clipped counts).
  *
  * The relational formulation of a clipped-overlap metric explodes
  * every gram occurrence into rows and shuffles the whole gram stream
  * through one or more exchanges. But the metric is fundamentally
  * per-PAIR: all it needs from each document is its gram multiset —
  * a vocabulary-bounded value. These kernels move the gram work into
  * the row itself: [[GramCountsExpr]] folds a document to a
  * `MAP<hash64, count>` in one pass, and [[MapClipSumExpr]] reduces
  * two such maps to `Σ_k min(ca, cb)` — so a consecutive-pair metric
  * becomes one equi self-join of map-valued rows with NO gram-level
  * exchange at all (the gram stream never exists as rows).
  *
  * Keys are FNV-1a 64-bit hashes of the gram text (tokens joined by a
  * single space). 64 bits suffices here — unlike the dedup families'
  * md5 identity keys, a collision only matters when two different
  * grams collide within ONE pair's gram sets, so the exposure is
  * pairs × (grams-per-doc)² / 2⁶⁴ — and hash keys keep the map
  * fixed-width regardless of gram length.
  */
object GramExprs {

  /** `MAP<fnv64(gram), count>` of the document's space-delimited
    * n-grams. Tokenization matches `split(text, " ")` with Spark's
    * default -1 limit: single-space delimiter, empty tokens kept
    * (including between consecutive spaces and at the ends).
    */
  def gramCounts(text: Column, n: Int): Column =
    ColumnBridge.column(GramCountsExpr(ColumnBridge.expression(text), n))

  /** `Σ_k min(a[k], b[k])` over the keys present in BOTH maps — the
    * clipped-overlap reduction of two [[gramCounts]] maps.
    */
  def mapClipSum(a: Column, b: Column): Column =
    ColumnBridge.column(
      MapClipSumExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class GramCountsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"gram length must be >= 1, got $n")

  override def dataType: DataType =
    MapType(LongType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  def compute(u: UTF8String): MapData = {
    val s = u.toString
    // token BOUNDARIES only — tokens are hashed in place, never
    // materialized as substrings. starts(i)..ends(i) delimits token i;
    // split(text, " ") semantics: empties kept, "" is one empty token.
    var nTok = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    var st = 0
    i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        starts(t) = st; ends(t) = i; t += 1; st = i + 1
      }
      i += 1
    }
    val nGrams = nTok - n + 1
    if (nGrams <= 0)
      return new ArrayBasedMapData(
        new GenericArrayData(Array.empty[Any]),
        new GenericArrayData(Array.empty[Any]))
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](nGrams * 2)
    var g = 0
    while (g < nGrams) {
      // FNV-1a over the gram's chars = the n tokens joined by ' ' —
      // identical to hashing the materialized gram string
      var h = FnvOffset
      var k = 0
      while (k < n) {
        if (k > 0) { h ^= ' '.toLong; h *= FnvPrime }
        var p = starts(g + k)
        val e = ends(g + k)
        while (p < e) { h ^= s.charAt(p).toLong; h *= FnvPrime; p += 1 }
        k += 1
      }
      val prev = m.get(h)
      m.put(h, if (prev == null) 1L else prev + 1L)
      g += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey.longValue()
      vals(j) = e.getValue.longValue()
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys),
      new GenericArrayData(vals))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramCounts", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GramCountsExpr = copy(child = newChild)
  override def prettyName: String = "gram_counts"
}

case class MapClipSumExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = MapType(LongType, LongType, valueContainsNull = false)
    def conforms(dt: DataType) = dt match {
      case MapType(LongType, LongType, _) => true
      case _ => false
    }
    if (conforms(left.dataType) && conforms(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires (${ok.simpleString}, ${ok.simpleString}), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  def compute(ma: MapData, mb: MapData): Long = {
    // hash the SMALLER side, probe with the larger — per-row cost is
    // O(|a| + |b|) with one bounded allocation
    val (sm, bg) = if (ma.numElements() <= mb.numElements()) (ma, mb)
      else (mb, ma)
    val nSm = sm.numElements()
    if (nSm == 0) return 0L
    val hm = new java.util.HashMap[java.lang.Long, java.lang.Long](nSm * 2)
    val sk = sm.keyArray()
    val sv = sm.valueArray()
    var i = 0
    while (i < nSm) { hm.put(sk.getLong(i), sv.getLong(i)); i += 1 }
    val nBg = bg.numElements()
    val bk = bg.keyArray()
    val bv = bg.valueArray()
    var sum = 0L
    i = 0
    while (i < nBg) {
      val v = hm.get(bk.getLong(i))
      if (v != null) sum += math.min(v.longValue(), bv.getLong(i))
      i += 1
    }
    sum
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[MapData], b.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mapClipSum", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MapClipSumExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "map_clip_sum"
}
