package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

/** Laws for content-defined chunking: the chunks tile the input, the
  * incremental rolling hash equals the direct window polynomial, and —
  * the property the whole construction exists for — a shared substring
  * produces identical interior chunks no matter where in which document
  * it is embedded.
  */
class CdcExprsSpec extends SparkSpec {
  import spark.implicits._

  private val W = 8
  private val B = 131L
  private val P = 32L

  private val expr = CdcChunksExpr(Literal(UTF8String.fromString(""),
    StringType), W, B, P)

  private def chunksOf(s: String): Seq[(Int, String)] = {
    val arr = expr.compute(UTF8String.fromString(s))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getInt(0), r.getUTF8String(1).toString)
    }
  }

  // direct O(n·w) per-position window polynomial — the oracle SQL's form
  private def bruteStarts(s: String): Seq[Int] = {
    val n = s.length
    val pw = Array.iterate(1L, W)(_ * B).reverse // b^(w-1) .. b^0
    val cuts = (W - 1 until n).filter { i =>
      var h = 0L
      var k = 0
      while (k < W) { h += s.charAt(i - W + 1 + k).toLong * pw(k); k += 1 }
      h % P == 0
    }.map(_ + 1).filter(_ < n)
    0 +: cuts
  }

  private def randAscii(rnd: scala.util.Random, n: Int): String =
    Seq.fill(n)((32 + rnd.nextInt(90)).toChar).mkString

  test("chunks tile the text exactly; starts are the running length sum") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 7, 8, 9, 31, 32, 33, 200, 1000)) {
      val s = randAscii(rnd, n)
      val ch = chunksOf(s)
      assert(ch.map(_._2).mkString == s, s"n=$n")
      assert(ch.head._1 == 0)
      ch.sliding(2).foreach {
        case Seq((st1, c1), (st2, _)) => assert(st2 == st1 + c1.length)
        case _ =>
      }
      if (n > 0) assert(ch.forall(_._2.nonEmpty), s"empty chunk at n=$n")
      else assert(ch == Seq((0, "")))
    }
  }

  test("incremental subtract-first hash ≡ direct window polynomial") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val s = randAscii(rnd, 50 + rnd.nextInt(500))
      assert(chunksOf(s).map(_._1) == bruteStarts(s))
    }
  }

  test("content-defined: a shared block chunks identically at ANY offset") {
    val rnd = new scala.util.Random(99)
    val block = randAscii(rnd, 300)
    val (offA, offB) = (37, 91)
    val docA = randAscii(rnd, offA) + block + randAscii(rnd, 60)
    val docB = randAscii(rnd, offB) + block + randAscii(rnd, 20)
    // cuts whose whole hash window lies inside the block depend only on
    // block content: positions p with offX+W <= p <= offX+|block|
    def interior(doc: String, off: Int): Seq[Int] =
      chunksOf(doc).map(_._1)
        .filter(p => p >= off + W && p <= off + block.length).map(_ - off)
    val (ia, ib) = (interior(docA, offA), interior(docB, offB))
    assert(ia.nonEmpty, "no interior cuts — block too short for the test")
    assert(ia == ib, s"cut sets diverged: $ia vs $ib")
    // ... and fixed-stride chunking provably lacks this property: its
    // grid is anchored at the DOCUMENT origin (multiples of W), so the
    // block is sampled at different relative positions in A and B
    // (offA % W = 5 vs offB % W = 3)
    def strideRel(off: Int): Seq[Int] =
      (0 to off + block.length).filter(p =>
        p % W == 0 && p >= off).map(_ - off)
    assert(strideRel(offA) != strideRel(offB))
  }

  test("codegen path ≡ interpreted compute on the real documents table") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = real
      .select(col("doc_id"), col("text"),
        CdcExprs.cdcChunks(col("text"), W, B, P).as("ch"))
      .as[(Long, String, Seq[(Int, String)])].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, text, ch) =>
      assert(ch == chunksOf(text), s"doc $id")
    }
  }

  test("cdc_chunks stays inside whole-stage codegen") {
    val plan = spark.range(5)
      .select(CdcExprs.cdcChunks(concat(lit("abcdefgh "),
        col("id").cast("string")), W, B, P).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("cdc_chunks")), plan)
  }
}
