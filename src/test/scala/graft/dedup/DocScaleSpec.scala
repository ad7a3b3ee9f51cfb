package graft.dedup

import org.apache.spark.sql.functions._
import graft.{SparkSpec, SparkEntry}

/** Automated decade invariants for the document families, built on
  * [[graft.ScaleCorpus]]'s construction: replica 0 is the source corpus
  * verbatim and replica r>0 token-prefixes every word, so per-replica
  * structure (shingle-set sizes, Jaccard values, per-source span sets,
  * token-count distributions) is PRESERVED while nothing is shared
  * across replicas. Exact consequences a correct implementation must
  * reproduce — and a scale-dependent bug (a pinned threshold, a
  * candidate set that leaks across replicas, an order-sensitive float)
  * cannot:
  *
  *  - exact-pair count at ×N = N × the sf0.1 count (q_prefix_join);
  *  - per-source-pair shared-span counts at ×N = N × sf0.1's matrix
  *    (sources repeat across replicas, spans never do);
  *
  * Cancels (not fails) when the ScaleCorpus dir is absent — the same
  * contract as AnnTriScaleSpec.
  */
class DocScaleSpec extends SparkSpec {
  private val base = "/root/testdata/sf0.1"
  private val sfx1 = sys.env.getOrElse("GRAFT_SFX1_DIR", "/tmp/graft_sfx1")

  private def requireCorpus(): Long = {
    assume(new java.io.File(s"$sfx1/documents.parquet").exists(),
      s"decade gate needs the ScaleCorpus dir at $sfx1")
    val nBase = spark.read.parquet(s"$base/documents.parquet").count()
    val nBig = spark.read.parquet(s"$sfx1/documents.parquet").count()
    assume(nBase > 0 && nBig % nBase == 0 && nBig > nBase,
      s"$sfx1 is not an integer replication of $base ($nBig vs $nBase)")
    nBig / nBase
  }

  test("exact near-dup pairs scale exactly xN across the decade") {
    val n = requireCorpus()
    val basePairs = SparkEntry.queries("q_prefix_join")(spark, base).count()
    val bigPairs = SparkEntry.queries("q_prefix_join")(spark, sfx1).count()
    assert(basePairs > 0)
    assert(bigPairs == n * basePairs,
      s"expected ${n}x$basePairs pairs at the decade, got $bigPairs — " +
        "candidates leak across replicas or a threshold is scale-pinned")
  }

  test("CDC chunking is corpus-size-invariant per doc; duplication " +
      "only grows with the decade") {
    val n = requireCorpus()
    // replica 0 carries the base corpus TEXT verbatim (at doc_id·N) and
    // chunk boundaries are content-defined per doc — so every base doc
    // must chunk IDENTICALLY at x10 (n_chunks equal), while adding N-1
    // replicas can only grow a chunk's corpus-wide occurrence
    // (n_dup_chunks monotone >=). A chunker whose boundaries depended
    // on corpus statistics or partitioning would break the first; a
    // dup counter that leaked or reset across the decade the second.
    val baseRep = SparkEntry.queries("q_substring_dedup")(spark, base)
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"))
      .collect().map(r => r.getLong(0) * n -> (r.getLong(1), r.getLong(2)))
      .toMap
    val big = SparkEntry.queries("q_substring_dedup")(spark, sfx1)
      .filter(col("doc_id") % n === 0) // replica 0: doc_id' = doc_id·N
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(big.keySet == baseRep.keySet)
    baseRep.foreach { case (id, (nc, nd)) =>
      assert(big(id)._1 == nc, s"doc $id re-chunked at the decade")
      assert(big(id)._2 >= nd, s"doc $id lost duplication at the decade")
    }
  }

  test("the cross-source span matrix scales exactly xN per source pair") {
    val n = requireCorpus()
    // the matrix is source-pair-sized — collect once and compare sets,
    // rather than 4 exceptAll jobs re-running the shingle self-join
    val b = SparkEntry.queries("q_source_overlap")(spark, base)
      .withColumn("n_shared", col("n_shared") * n)
      .collect().map(_.toSeq).toSet
    val big = SparkEntry.queries("q_source_overlap")(spark, sfx1)
      .collect().map(_.toSeq).toSet
    assert(b.nonEmpty)
    // exact frame equality both directions (source pairs AND counts)
    assert(big == b,
      s"matrix diverged: extra=${(big -- b).take(3)} " +
        s"missing=${(b -- big).take(3)}")
  }
}
