package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextAnalysis
import graft.multimodal.MultiModal

/** Training-data-pipeline operators over `documents` / `embeddings`:
  * deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity
  * search (brute-force cosine top-k, SRP-LSH ANN), text analysis
  * (token stats, quality, language-ID, fingerprint), multimodal binary
  * metadata. Each op is a `queries` entry; everything SQL-expressible has
  * a DuckDB oracle built from the same md5-based hash constructions so the
  * values match bit-for-bit across engines.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  private def rs(e: String, p: Int = 4): String = {
    val m = math.pow(10, p).toLong
    s"floor(($e)*$m + 0.5)/$m"
  }

  // shared oracle fragments ------------------------------------------------
  /** DuckDB n=2 word-shingle set, mirroring Dedup.shingles(text, 2). */
  private val shSql =
    "list_distinct(list_transform(" +
      "generate_series(0, greatest(len(string_split(text,' '))-2, 0)), " +
      "i -> array_to_string(list_slice(string_split(text,' '), i+1, i+2), ' ')))"

  /** DuckDB n=8 word-shingle list, mirroring Dedup.shingles(text, 8). */
  private val spanShinglesSql =
    "list_distinct(list_transform(" +
      "generate_series(0, greatest(len(string_split(text,' '))-8, 0)), " +
      "i -> array_to_string(list_slice(string_split(text,' '), i+1, i+8), ' ')))"

  /** DuckDB minhash h_s = min over shingles of md5(s || '|' || shingle). */
  private def mhSql(seed: Int): String =
    s"list_min(list_transform(sh, x -> md5('$seed' || '|' || x)))"

  /** Shared CDC pipeline for the substring-dedup pair (report +
    * rewrite): content-defined chunks exploded with their ordinal,
    * digest occurrence counts joined back — one row per chunk instance
    * with (doc_id, ord, clen, k, occ[, chunk]). The occurrence side is
    * corpus-sized (one row per distinct chunk), so the join-back is
    * shuffle-hash co-partitioned on the 128-bit digest, never
    * broadcast; chunk TEXT rides along only when the caller rebuilds
    * documents (`withText`), keeping the report's exchanges digest-only
    * (PlanAuditSpec).
    */
  private def cdcChunkOcc(s: SparkSession, d: String,
      withText: Boolean): DataFrame =
    Dedup.cdcChunkOccurrences(parallelize(documents(s, d)),
      col("doc_id"), col("text"), 8, 131L, 32L, withText)

  /** Minimum maximal-span length (chars) the CDC pair reports/removes. */
  private val CdcMinSpan = 48L

  /** Shared DuckDB CTE chain mirroring [[cdcChunkOcc]]: every
    * content-defined cut reproduced from the per-position window
    * polynomial Σ code·131^k (exact BIGINT — 131^7·121·8 ≈ 8.1e16 <
    * 2^63), then chunks, digest occurrence counts, and the join-back.
    * Ends with `j(doc_id, ord, clen, chunk, occ)`.
    */
  private val cdcChunkCtes =
    """d AS (SELECT doc_id, text, len(text) AS n FROM documents),
      |pos AS (SELECT doc_id, text, n, unnest(range(7, n)) AS i FROM d),
      |hp AS (SELECT doc_id, i + 1 AS cut FROM pos
      |       WHERE i + 1 < n AND (
      |         cast(ord(substring(text, i-6, 1)) AS bigint)*662062621900811 +
      |         cast(ord(substring(text, i-5, 1)) AS bigint)*5053913144281 +
      |         cast(ord(substring(text, i-4, 1)) AS bigint)*38579489651 +
      |         cast(ord(substring(text, i-3, 1)) AS bigint)*294499921 +
      |         cast(ord(substring(text, i-2, 1)) AS bigint)*2248091 +
      |         cast(ord(substring(text, i-1, 1)) AS bigint)*17161 +
      |         cast(ord(substring(text, i,   1)) AS bigint)*131 +
      |         cast(ord(substring(text, i+1, 1)) AS bigint)) % 32 = 0),
      |cuts AS (SELECT doc_id, list_sort(list(cut)) AS cuts
      |         FROM hp GROUP BY 1),
      |st AS (SELECT d.doc_id, d.text, d.n,
      |         [0] || coalesce(c.cuts, []) AS starts
      |       FROM d LEFT JOIN cuts c USING (doc_id)),
      |chx AS (SELECT doc_id, text, n, starts,
      |          unnest(range(len(starts))) AS ord FROM st),
      |ch AS (SELECT doc_id, ord,
      |         cast(coalesce(starts[ord+2], n) - starts[ord+1]
      |           AS bigint) AS clen,
      |         substring(text, starts[ord+1] + 1,
      |           coalesce(starts[ord+2], n) - starts[ord+1]) AS chunk
      |       FROM chx),
      |occ AS (SELECT md5(chunk) AS k, count(*) AS occ
      |        FROM ch GROUP BY 1),
      |j AS (SELECT ch.*, occ.occ FROM ch
      |      JOIN occ ON md5(ch.chunk) = occ.k)""".stripMargin

  /** Blocklist for q_blocklist_filter — corpus words standing in for a
    * badwords list (the C4-style keyword gate); includes terms absent
    * from the corpus so the zero-hit path is exercised too.
    */
  private val BlockWords = Seq("slow", "crash", "leak")

  private val MinhashN = 4       // hashes exposed by q_minhash
  private val LshBands = 4
  private val LshRows = 2        // 8 hashes total for LSH
  // SimHash LSH banding: ⌈64/(3+1)⌉-band pigeonhole minimum for the
  // Hamming ≤ 3 rule; widen (8/16/32 — must keep ≥ 4) for recall
  // margin, or move to a wider fingerprint with fewer, wider bands
  // past ~10⁷ docs (see Dedup.simhashBands). Oracle SQL derives from
  // the same constant, so turning the knob re-verifies end to end.
  private val SimhashBands = 4

  /** ANN/near-dup blocking parameters are FUNCTIONS of corpus size
    * (within-bucket joins are quadratic in occupancy — fixed bits that
    * are fine at 10^5 vectors melt down at 10^9). Targets are chosen so
    * the sf0.01 instantiation (500 embeddings) lands on bits=6 /
    * cells=8 — exactly the literal hyperplane/centroid sets the oracle
    * SQL embeds, so the driver's DuckDB compare stays bit-exact while
    * bench runs at other scale factors get properly scaled blocking.
    */
  private val AnnTargetBucket = 8L
  private val IvfTargetCell = 64L
  // memoized per (session, dir): six ANN queries each need the corpus
  // size for blocking parameters — one metadata-count job total, not one
  // per query construction
  private val embCountCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Long]

  // memoized per (session, dir): q_ngram_lm and q_ppl_buckets share the
  // bigram-NLL aggregation tree, and q_bpe_train / q_bpe_apply share the
  // trained merge table — the localCheckpointed subtrees materialize
  // ONCE per session instead of once per query (≈0.9 s/bench at sf0.1)
  private val nllCache = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String), DataFrame]
  private def ngramDocNllCached(s: SparkSession, d: String): DataFrame =
    nllCache.getOrElseUpdate((s, d), ngramDocNll(s, d))
  private val bpeCache = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame)]
  private def bpeTrained(s: SparkSession, d: String): (DataFrame, DataFrame) =
    bpeCache.getOrElseUpdate((s, d),
      graft.text.BpeTrainer.trainWithVocab(
        parallelize(documents(s, d)), col("text"), merges = 3))

  /** Shared SQL mirror of the marker-argmax language ID: per-language
    * marker-hit scores, and the CASE whose tie-break is LangMarkers
    * order — a language wins if it beats every earlier language
    * strictly and every later one weakly. Used by the q_lang_id and
    * q_lang_eval oracles.
    */
  private lazy val langScoreSql: String =
    TextAnalysis.LangMarkers.map { case (lang, markers) =>
      val in = markers.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(string_split(text,' '), t -> t IN ($in))) AS s_$lang"
    }.mkString(", ")
  private lazy val langPredCaseSql: String = {
    val langs = TextAnalysis.LangMarkers.map(_._1)
    val cases = langs.zipWithIndex.map { case (l, i) =>
      val conds = Seq(s"s_$l > 0") ++
        langs.take(i).map(e => s"s_$l > s_$e") ++
        langs.drop(i + 1).map(e => s"s_$l >= s_$e")
      s"WHEN ${conds.mkString(" AND ")} THEN '$l'"
    }.mkString(" ")
    s"CASE $cases ELSE 'und' END"
  }

  // the 5-gram span-digest INDEX over all documents — q_contamination,
  // q_contaminate_ratio and q_bloom_decontam all probe it; real
  // pipelines persist exactly this index instead of re-shingling the
  // corpus per check, so it materializes once per (session, dir).
  // persist (NOT localCheckpoint): these artifacts outlive any single
  // query, so a lost cached block — an evicted executor, dynamic
  // deallocation, or DedupSpec's deliberate block wipe — must mean
  // "recompute through the retained lineage", never a dead job.
  private val span5Cache = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String), DataFrame]
  private def docSpans5(s: SparkSession, d: String): DataFrame =
    span5Cache.getOrElseUpdate((s, d),
      Dedup.spanDigests(documents(s, d), col("doc_id"), col("text"), 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  private def embCount(s: SparkSession, d: String): Long =
    embCountCache.getOrElseUpdate((s, d), embeddings(s, d).count())
  private val docCountCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Long]
  private def docCount(s: SparkSession, d: String): Long =
    docCountCache.getOrElseUpdate((s, d), documents(s, d).count())

  // Iterative graph artifacts (PageRank ranks, BFS distances) memoized
  // per (session, dir) like span5Cache: the iteration runs once and
  // its bounded (vocabulary/frontier-sized) result lands via
  // Materialize.memo — a parquet read-back, so every consuming query
  // carries a file-scan plan (a retained iteration chain cost ~2 s of
  // DRIVER re-analysis per query even with its caches hit) and the
  // artifact survives total executor-storage loss
  // (BlockLossRecoverySpec wipes every block and re-runs the family).
  private val graphCache = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Engine-neutral unrolled inverse Poisson(1) CDF as SQL text over a
    * column `u` — the bootstrap weight draw. The cutoffs are EXACT
    * decimal literals (Double.toString shortest round-trip), not
    * `exp(-1.0)·Σ1/j!` expressions: decimal→double literal parsing is
    * correctly rounded and therefore identical on every engine,
    * whereas Java's Math.exp and libm's exp may disagree by 1 ulp —
    * at 5·10⁷ draws (the ×100 decade) a uniform landed inside that
    * 1-ulp window and flipped one weight (observed live). The literal
    * IS the spec; both the Spark expr and the DuckDB oracle embed
    * this same string.
    */
  private[graft] lazy val poissonCuts: Seq[Double] = {
    val fact = Array(1L, 1L, 2L, 6L, 24L, 120L, 720L, 5040L, 40320L)
    var s0 = 0.0
    (0 to 8).map { k => s0 += 1.0 / fact(k); math.exp(-1.0) * s0 }
  }
  private[graft] def poissonCaseOn(u: String): String =
    "CASE " + poissonCuts.zipWithIndex.map { case (c, k) =>
      s"WHEN ($u) < ${java.lang.Double.toString(c)} THEN $k "
    }.mkString + "ELSE 9 END"
  private[graft] lazy val poissonCase: String = poissonCaseOn("u")

  /** RBO@10 (p = 0.9) per-doc weight table W(m) = (1−p)·Σ_{d=m..10}
    * p^{d−1}/d in integer micro, rendered as a CASE over the given
    * max-rank expression — the same literal string feeds the Spark
    * expr and the DuckDB oracle, so there is no transcendental or
    * power function on either engine's hot path.
    */
  private[graft] lazy val rboWeightsMicro: IndexedSeq[Long] = {
    val p = 0.9
    (1 to 10).map { m =>
      val w = (m to 10).map(dd => math.pow(p, dd - 1) / dd).sum * (1 - p)
      math.floor(w * 1e6 + 0.5).toLong
    }
  }
  private[graft] def rboWeightCaseOn(m: String): String =
    "CASE " + rboWeightsMicro.zipWithIndex.map { case (w, i) =>
      s"WHEN ($m) = ${i + 1} THEN ${w} " }.mkString + "ELSE 0 END"

  /** The SQL/HOF formulation of the bootstrap weight vector — the
    * portable reference semantics [[graft.functions.BootstrapWeightsExpr]]
    * is law-pinned against (and the shape the DuckDB oracle runs).
    */
  private[graft] lazy val bootstrapWeightsHof: Column = expr(
    s"""transform(flatten(transform(
       |    transform(sequence(0, 24), blk -> md5(concat(
       |      cast(doc_id as string), '|', cast(blk as string)))),
       |    h -> transform(
       |      transform(sequence(0, 3), j ->
       |        cast(conv(substring(h, 1 + 8 * j, 8), 16, 10)
       |          as bigint) / 4294967296.0),
       |      u -> ${poissonCaseOn("u")}))),
       |  w -> cast(w as bigint))""".stripMargin)

  /** JL projection ±1 signs, sign(i, j) = +1 iff the int value of the
    * first 4 hex chars of md5("i_j") is even — precomputed driver-side
    * (r14) with the exact construction the oracle SQL and the previous
    * per-row Spark lambda evaluate, so the values are bit-identical by
    * definition. 256 dims of headroom over the 64-dim suite corpora.
    */
  private lazy val jlSignRow: IndexedSeq[Seq[Long]] =
    (0 until 4).map { j =>
      (0 until 256).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${i}_$j".getBytes("UTF-8"))
          .take(2).map(b => f"$b%02x").mkString
        if (Integer.parseInt(hex, 16) % 2 == 0) 1L else -1L
      }.toSeq
    }

  /** Adjacent-word co-occurrence pairs (a, b), both orders filtered to
    * a != b — the shared edge extraction for the graph-analytics
    * family. Only this step touches the corpus; everything downstream
    * is vocabulary-sized.
    */
  private def cooccurPairs(s: SparkSession, d: String): DataFrame =
    parallelize(documents(s, d))
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("t"),
        explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(element_at(col("t"), col("i")).as("a"),
        element_at(col("t"), col("i") + 1).as("b"))
      .filter(col("a") =!= col("b"))

  /** PageRank over the word co-occurrence graph (damping 0.85, 5
    * synchronous iterations): each iteration is one contribution
    * shuffle keyed on dst plus a co-partitioned node join, and
    * per-iteration ranks are persisted so iteration k+1 reads a
    * materialized k (never an exponentially re-expanded plan). ALL
    * arithmetic is integer pico-units (rank mass = 1e12;
    * floor-division for the damping split), so five chained iterations
    * stay bit-identical across engines — the oracle unrolls the same
    * five steps as CTEs. Graph size is vocabulary², not corpus-sized.
    */
  private def pagerankRanks(s: SparkSession, d: String): DataFrame =
    graphCache.getOrElseUpdate((s, d, "pagerank"), {
      val Scale = 1000000000000L
      val pairs = cooccurPairs(s, d)
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
        .distinct()
        // cached pre-partitioned on src: InMemoryRelation preserves
        // outputPartitioning, so all five iteration joins (on src)
        // reuse it — only the ranks side shuffles per iteration
        .repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val st = deg.agg(count(lit(1)).as("n"))
      var ranks = deg.crossJoin(broadcast(st))
        .select(col("src").as("node"), col("outdeg"), col("n"),
          expr(s"$Scale div n").as("r"))
      val inter = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      for (_ <- 1 to 5) {
        val sums = edges.join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("s_in"))
        ranks = ranks.select(col("node"), col("outdeg"), col("n"))
          .join(sums, col("node") === col("dst"), "left")
          .select(col("node"), col("outdeg"), col("n"),
            (expr(s"(($Scale * 15) div 100) div n") +
              expr("(85 * coalesce(s_in, 0)) div 100")).as("r"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        inter += ranks
      }
      // memoized artifact: land the vocabulary-sized result via
      // Materialize.memo (parquet) — a persisted chain kept its full
      // ~300-node analyzed plan and the DRIVER paid ~2 s of
      // re-analysis per consuming query even though the cache was hit
      // (measured: 2.1 s → 0.05 s per q_pagerank execution), and a
      // localCheckpoint dies with executor storage (the round-6
      // flake; BlockLossRecoverySpec wipes every block and re-runs).
      // With the memo landed, every per-iteration cache can go.
      val out = graft.util.Materialize.memo(ranks, "pagerank_ranks")
      inter.foreach(_.unpersist(false))
      edges.unpersist(false)
      out
    })

  /** 4-hop BFS shortest distances from a deterministic source (the
    * lexicographically smallest word) over the co-occurrence graph —
    * the frontier-expansion iteration (PageRank's traversal sibling):
    * each round relaxes every edge once (dist+1 candidates union the
    * current table, min per node), so round k is one src-keyed join +
    * one node-keyed aggregation — Pregel's superstep as two shuffles.
    * Four rounds bound the work (k-hop neighborhoods, not full
    * transitive closure); unreached nodes simply don't appear, so the
    * output is frontier-sized, never graph-sized.
    */
  private def bfsDists(s: SparkSession, d: String): DataFrame =
    graphCache.getOrElseUpdate((s, d, "bfs"), {
      val pairs = cooccurPairs(s, d)
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val source = edges.agg(min(col("src")).as("node"))
        .withColumn("dist", lit(0L))
      var dists = source.select(col("node"), col("dist"))
      val inter = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      for (_ <- 1 to 4) {
        dists = dists
          .join(edges, col("node") === col("src"))
          .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
          .unionByName(dists)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        inter += dists
      }
      // same memo-landing as pagerankRanks: parquet keeps the plan a
      // file scan and survives storage loss; every superstep cache
      // releases after the landing
      val out = graft.util.Materialize.memo(dists, "bfs_dists")
      inter.foreach(_.unpersist(false))
      edges.unpersist(false)
      out
    })

  /** HITS hubs/authorities (Kleinberg 1999) over the DIRECTED word
    * bigram graph (a → b when a immediately precedes b — the same
    * token pass PageRank symmetrizes, kept directed here so hubs and
    * authorities genuinely differ: hubs precede important words,
    * authorities follow important ones). Three synchronous
    * a ← Aᵀh / h ← A·a rounds; each step is one dst- (resp. src-)
    * keyed contribution shuffle — the PageRank superstep shape, graph
    * size vocabulary², never corpus-sized. ALL arithmetic is exact
    * integer micro-units with L∞ normalization per step
    * (score·10⁶ div max — integral division, so chained iterations
    * stay bit-identical across engines; overflow-safe while the
    * contribution mass Σh stays under ~9·10¹², i.e. vocabularies to
    * ~10⁶ nodes at full micro scores — beyond that, widen the scale).
    * The oracle unrolls the same three rounds as MATERIALIZED CTEs
    * (the q_pca_project lesson: each round references its
    * predecessor more than once, so an un-hinted chain re-inlines
    * exponentially). Landed via Materialize.memo like the other
    * graph artifacts.
    */
  private def hitsScores(s: SparkSession, d: String): DataFrame =
    graphCache.getOrElseUpdate((s, d, "hits"), {
      val edges = cooccurPairs(s, d)
        .select(col("a").as("src"), col("b").as("dst")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
      var scores = nodes
        .select(col("node"), lit(1000000L).as("h"), lit(1000000L).as("a"))
      val inter = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      for (_ <- 1 to 3) {
        val aRaw = edges
          .join(scores.select(col("node"), col("h")),
            col("src") === col("node"))
          .groupBy(col("dst")).agg(sum(col("h")).as("ar"))
        val aNew = aRaw.crossJoin(broadcast(aRaw.agg(max(col("ar")).as("am"))))
          .select(col("dst").as("node"), expr("ar * 1000000 div am").as("a2"))
        val hRaw = edges
          .join(aNew.withColumnRenamed("node", "anode"),
            col("dst") === col("anode"))
          .groupBy(col("src")).agg(sum(col("a2")).as("hr"))
        val hNew = hRaw.crossJoin(broadcast(hRaw.agg(max(col("hr")).as("hm"))))
          .select(col("src").as("node"), expr("hr * 1000000 div hm").as("h2"))
        scores = nodes
          .join(aNew, Seq("node"), "left")
          .join(hNew, Seq("node"), "left")
          .select(col("node"), coalesce(col("h2"), lit(0L)).as("h"),
            coalesce(col("a2"), lit(0L)).as("a"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        inter += scores
      }
      val out = graft.util.Materialize.memo(scores, "hits_scores")
      inter.foreach(_.unpersist(false))
      edges.unpersist(false)
      out
    })

  /** 4-round Bellman–Ford single-source shortest distances over the
    * WEIGHTED directed bigram graph — the weighted sibling of bfsDists
    * (BFS relaxes hop counts; this relaxes additive costs, the shape
    * that carries every "most probable Markov path" question). Edge
    * weight = −ln(c_ab / Σ_b c_ab) in exact micro-nats — the bigram
    * transition surprisal, micro-integerized per EDGE before any sum
    * (the q_ngram_lm ln recipe), so a path cost is a sum of ≤4 longs
    * and min() over equal-cost paths is deterministic on both engines.
    * Each round is one src-keyed join + one node-keyed min — the
    * Pregel superstep as two shuffles, frontier-sized output, with the
    * edge table cached pre-partitioned on src so all four joins reuse
    * one layout (the pagerankRanks discipline). Four rounds bound the
    * work to 4-hop reachability, not transitive closure; the oracle
    * unrolls the same rounds as MATERIALIZED CTEs (each references
    * its predecessor twice — the q_pca_project re-inlining lesson).
    */
  /** The directed bigram transition-count table (a, b, cab) landed
    * once per (session, dir) via Materialize.memo — the ONE corpus
    * pass behind the Markov-chain family (ssspDists' edge weights and
    * q_entropy_rate's mass fold both read this parquet artifact, so
    * the explode+rollup never runs twice in a session).
    */
  private def bigramCounts(s: SparkSession, d: String): DataFrame =
    graphCache.getOrElseUpdate((s, d, "bigram_counts"),
      graft.util.Materialize.memo(
        cooccurPairs(s, d).groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("cab")), "bigram_counts"))

  private def ssspDists(s: SparkSession, d: String): DataFrame =
    graphCache.getOrElseUpdate((s, d, "sssp"), {
      val cnt = bigramCounts(s, d)
        .select(col("a").as("src"), col("b").as("dst"), col("cab"))
      val outm = cnt.groupBy(col("src")).agg(sum(col("cab")).as("outc"))
      val edges = cnt.join(outm, "src")
        .select(col("src"), col("dst"),
          floor(-log(col("cab").cast("double") / col("outc").cast("double"))
            * lit(1e6) + lit(0.5)).cast("long").as("w"))
        .repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var dists = edges.agg(min(col("src")).as("node"))
        .select(col("node"), lit(0L).as("dist"))
      val inter = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      for (_ <- 1 to 4) {
        dists = dists.join(edges, col("node") === col("src"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
          .unionByName(dists.select(col("node"), col("dist")))
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        inter += dists
      }
      val out = graft.util.Materialize.memo(dists, "sssp_dists")
      inter.foreach(_.unpersist(false))
      edges.unpersist(false)
      out
    })

  /** Cluster assignment over the deterministic chain-edge dedup graph —
    * shared by q_dedup_clusters (the assignment itself) and
    * q_dup_survivors (the survivorship rollup over it). Memoized in
    * graphCache like the PageRank/BFS artifacts: the iterative
    * min-label propagation runs once per (session, dir), not once per
    * consuming query per bench pass (the r8 perf_weak finding on
    * q_dup_survivors — its 18× tail was two full propagation reruns).
    */
  private def dupClusters(s: SparkSession, d: String): DataFrame =
    graphCache.getOrElseUpdate((s, d, "dup_clusters"), {
      val docs = documents(s, d).select(col("doc_id"))
      val edges = docs.as("a")
        .join(docs.as("b"),
          col("b.doc_id") === col("a.doc_id") + 1 &&
            col("a.doc_id") % 50 < 5)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      // landed via Materialize.memo like the other graph memos:
      // duplicateClusters' internal default localCheckpoint dies with
      // executor storage, and a memo must outlive that for the session
      graft.util.Materialize.memo(
        Dedup.duplicateClusters(edges), "dup_clusters")
    })

  private def annBits(n: Long): Int =
    Similarity.srpBitsFor(n, AnnTargetBucket)
  private def annProbes(bits: Int): Int = math.max(1, (1 << bits) / 4)
  private def ivfCells(n: Long): Int =
    Similarity.ivfCellsFor(n, IvfTargetCell)
  /** Oracle literal ENVELOPE: the static SQL embeds this many seeded
    * hyperplanes / IVF centroids and slices the first `bits` / `cells`
    * at run time (both generators are prefix-stable in the seed), with
    * bits / cells / k derived from count(*) INSIDE the SQL by the same
    * integer-exact formulas as srpBitsFor / ivfCellsFor / the k-means
    * rule. One SQL text is therefore exact at any corpus size up to
    * 8·2^MaxOracleBits = 32768 vectors (≈ sf0.65) — far past the
    * sf0.001/0.01/0.1 gate scales; the envelope bound is an artifact
    * of literal embedding only, not of the Spark plans (which scale to
    * maxBits=30 / 2^20 cells).
    */
  private val MaxOracleBits = 12
  private val MaxOracleCells = 128
  private val MaxOracleCoarse = 12 // ⌈√MaxOracleCells⌉ + margin

  /** Corpus-derived blocking parameters as a 1-row CTE — cross-join it
    * wherever `bits` / `probes` / `cells` / `kk` / `gcnt` appear.
    * Integer-exact mirrors of srpBitsFor (length(bin(⌈n/8⌉−1)) =
    * ⌈log2⌉), annProbes, ivfCellsFor, the k-means k rule, and
    * ivfCoarseCount (⌊√cells⌋ via floor(sqrt())+the same guarded CASE
    * corrections as Similarity.isqrt, exact at every n).
    */
  private def annParamCte: String =
    s"""ann_p AS (SELECT n, bits,
       |    cast(greatest(1, (1 << bits) // 4) AS int) AS probes,
       |    cells, kk,
       |    cast(greatest(1,
       |      CASE WHEN s0 * s0 > cells THEN s0 - 1
       |           WHEN (s0 + 1) * (s0 + 1) <= cells THEN s0 + 1
       |           ELSE s0 END) AS int) AS gcnt,
       |    cast(greatest(1,
       |      CASE WHEN s1 * s1 > kk THEN s1 - 1
       |           WHEN (s1 + 1) * (s1 + 1) <= kk THEN s1 + 1
       |           ELSE s1 END) AS int) AS gcnt_k
       |  FROM (SELECT n, bits, cells, kk,
       |      cast(floor(sqrt(cast(cells AS double))) AS bigint) AS s0,
       |      cast(floor(sqrt(cast(kk AS double))) AS bigint) AS s1
       |    FROM (SELECT n,
       |      cast(least(30, greatest(4,
       |        CASE WHEN (n + 7) // 8 <= 1 THEN 0
       |             ELSE length(bin((n + 7) // 8 - 1)) END)) AS int)
       |        AS bits,
       |      cast(least(1048576, greatest(4, (n + 63) // 64)) AS int)
       |        AS cells,
       |      cast(greatest(4, n // 125) AS int) AS kk
       |    FROM (SELECT cast(count(*) AS bigint) AS n
       |          FROM embeddings))))""".stripMargin

  /** The MaxOracleBits seeded hyperplanes as one list-of-lists literal
    * CTE; bucket expressions slice `pl[1..bits]`.
    */
  private def annPlanesCte: String = {
    val pl = graft.sim.Similarity.srpPlanes(64, MaxOracleBits)
      .map(_.mkString("[", ", ", "]")).mkString("[\n", ",\n", "]")
    s"ann_pl AS (SELECT $pl AS pl)"
  }

  /** The MaxOracleCells seeded IVF centroids as one literal CTE; cell
    * argmaxes run over `cs[1..cells]`.
    */
  private def ivfCentCte: String = {
    val cs = graft.sim.Similarity.ivfCentroids(64, MaxOracleCells)
      .map(_.mkString("[", ", ", "]")).mkString("[\n", ",\n", "]")
    s"ivf_cs AS (SELECT $cs AS cs)"
  }

  /** The MaxOracleCoarse seeded coarse-quantizer vectors (seed 13,
    * prefix-stable) as one literal CTE; the two-level assignment
    * slices `gs[1..gcnt]`.
    */
  private def ivfCoarseCte: String = {
    val gs = graft.sim.Similarity.srpPlanes(64, MaxOracleCoarse, 13L)
      .map(_.mkString("[", ", ", "]")).mkString("[\n", ",\n", "]")
    s"ivf_gs AS (SELECT $gs AS gs)"
  }

  /** gl[c] = 0-based coarse group of fine cell c (1-based list
    * position): first-max dot of each fine centroid against the coarse
    * vectors — the oracle mirror of Similarity.ivfGroupOf, computed
    * once over the cells×gcnt literal grid.
    */
  private def ivfGroupListCte: String = {
    def gds(vec: String) =
      s"""list_transform(generate_series(1, gcnt),
         |        __g -> list_dot_product($vec, gs[__g]))""".stripMargin
    s"""ivf_gl AS (SELECT list_transform(generate_series(1, cells),
       |    __c -> list_position(${gds("cs[__c]")},
       |      list_max(${gds("cs[__c]")})) - 1) AS gl
       |  FROM ann_p, ivf_cs, ivf_gs)""".stripMargin
  }

  /** Fixed query-term set for the BM25 / RRF retrieval queries. */
  private val Bm25Terms = Seq("hash", "join", "vector")

  // memoized per (session, dir): q_bm25 and q_rrf_fusion both need the
  // per-doc (token count, query-term hits) table — ONE tokenize pass
  // per session serves both rankers and every within-query branch
  // (dl stats, tf, df, score join), the r8 "share the BM25 subtree"
  // advice. Tiny: dl + ≤|terms| hits per doc. cache(), NOT
  // localCheckpoint: the original checkpoint memo had the round-6
  // failure mode — checkpoint blocks die with their executor AND
  // truncate lineage, so one lost executor poisoned BM25/RRF for the
  // rest of the session; the cache recomputes through retained
  // lineage instead (BlockLossRecoverySpec wipes and re-runs q_bm25).
  // A parquet memoPath landing was measured as the alternative and
  // rejected for this artifact: every consumer query re-opened the
  // artifact (driver-side file-index + footer per call), costing
  // ~0.3 s per bm25-family query at sf0.1 vs the in-memory blocks.
  private val bm25BaseCache = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String), DataFrame]
  /** The distributed half of q_source_divergence: ONE corpus token
    * pass folded to (source, md5-bucket, count) — ≤ 256×|sources| rows
    * at any corpus size. Two-level rollup: count (source, word) first
    * so the md5 chain runs once per DISTINCT word per source (at
    * 100 TB that is ~10⁵× fewer hashes than per-token), then fold
    * words into buckets — same counts, the exchange is vocab-bounded
    * per source like q_zipf_slope's. Exposed (package-private) so
    * PlanAuditSpec can pin this plan shape.
    */
  private[graft] def sourceBucketCounts(s: SparkSession, d: String,
      nb: Int): DataFrame =
    parallelize(documents(s, d))
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cw"))
      .withColumn("b", (conv(substring(md5(col("w")), 1, 8), 16, 10)
        .cast("long") % nb).cast("int"))
      .groupBy(col("source"), col("b")).agg(sum(col("cw")).as("c"))

  /** The distributed half of q_heaps_law: per-decile token mass (scan
    * side — no explode, a 10-row map-side agg; deliberately NOT
    * parallelize()d, the round-robin repartition would shuffle the
    * whole text column for a 10-row rollup — measured 0.16 s vs 0.10 s
    * at sf0.1) left-joined with per-decile first-occurrence vocabulary
    * (min(doc_id) per word: the only corpus-sized exchange, the
    * q_zipf_slope precedent, so this branch DOES get the explode
    * parallelized). 10 rows by construction. Package-private for
    * PlanAuditSpec.
    */
  private[graft] def heapsCurveInputs(s: SparkSession, d: String,
      nd: Long): DataFrame = {
    val decOf = (c: String) =>
      expr(s"least(9, ($c * 10) div ${nd}L)").cast("long")
    val toks = documents(s, d)
      .groupBy(decOf("doc_id").as("decile"))
      .agg(sum(graft.text.TextAnalysis.tokenCount(col("text")).cast("long")).as("tk"))
    val vocab = parallelize(documents(s, d))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
      .groupBy(decOf("fd").as("decile"))
      .agg(count(lit(1)).as("nv"))
    toks.join(vocab, Seq("decile"), "left")
  }

  /** Shared scan for the classifier-evaluation family (q_auc,
    * q_pr_curve, q_welch_ttest): every document scored by the fixed
    * logistic quality model (micro-integerized, the q_quality_score
    * column) and labeled by the Gopher rule gate (the q_gopher_filter
    * outcome) in the SAME scan row — no join between score and label,
    * one corpus pass. Mirrors q_ece_calibration's per-row block
    * exactly; the eval metrics differ only in what they fold the
    * (source, qm, pos) rows into.
    */
  private val scoredDocsCache = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String), DataFrame]
  private def scoredLabeledDocs(s: SparkSession, d: String): DataFrame =
    // cache(), NOT localCheckpoint: the memo must recompute through
    // retained lineage when its blocks are lost (evicted executor,
    // another suite's wipe) — a checkpoint's truncated lineage turns
    // any block loss into CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND for every
    // downstream eval query of the session (the round-6 flake
    // BlockLossRecoverySpec pins, re-observed here in round 10)
    scoredDocsCache.getOrElseUpdate((s, d),
      scoredLabeledDocsPlan(s, d).cache())
  private def scoredLabeledDocsPlan(s: SparkSession, d: String): DataFrame = {
    // r15: one-pass native token stats (≡ the split/array_distinct
    // forms — pinned in TextExprsSpec)
    val st = graft.functions.TextExprs.tokenStats(col("text"))
    val nTok = st.getField("n_tok").cast("long")
    val wordChars = (length(col("text")) - (nTok - 1)).cast("long")
    val stopHits = graft.functions.TextExprs
      .tokenSetCount(col("text"), TextAnalysis.Stopwords).cast("long")
    val nDistinct = st.getField("n_distinct").cast("long")
    val keep = !(nTok < 20 || nTok > 1000) &&
      !(wordChars < nTok * 3 || wordChars > nTok * 10) &&
      stopHits >= 2 && nDistinct * 10 >= nTok * 3
    val q = r(lit(1.0) / (lit(1.0) + exp(-(lit(-1.5)
      + col("n_tokens").cast("double") * lit(0.002)
      + col("stopword_ratio") * lit(2.0)
      - col("punct_count").cast("double") * lit(0.01)
      + col("avg_token_len") * lit(0.1)))), 6)
    TextAnalysis.withQuality(parallelize(documents(s, d)), col("text"))
      .select(col("source"),
        floor(q * 1e6 + lit(0.5)).cast("long").as("qm"),
        when(keep, 1L).otherwise(0L).as("pos"))
  }

  private def bm25Base(s: SparkSession, d: String): DataFrame =
    bm25BaseCache.getOrElseUpdate((s, d), bm25BasePlan(s, d).cache())

  /** q_knn_graph's cell assignment, materialized once per invocation
    * (the q_semdedup pattern) so the within-cell pair join's two sides
    * and the in-degree base all read the barrier.
    */
  private def knnAssignment(s: SparkSession, d: String): DataFrame = {
    // two-level quantizer (round 11) — flat argmax over cells ∝ n was
    // the quadratic term that dominated q_knn_graph at the 128k decade
    val nCells = ivfCells(embCount(s, d))
    val cents = Similarity.ivfCentroids(64, nCells)
    val coarse = Similarity.ivfCoarse(64, nCells)
    embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("cell",
        Similarity.ivfAssignTwoLevel(col("v"), cents, coarse))
      .localCheckpoint(false)
  }

  /** q_knn_graph's directed edge selection over a cell assignment —
    * package-private so PlanAuditSpec can pin the TopKPerKey + equi
    * join shape (the query itself consumes it behind a stage barrier).
    */
  private[graft] def knnEdgesPlan(mat: DataFrame): DataFrame = {
    val a = mat.select(col("cell"), col("vec_id").as("ia"),
      col("v").as("va"))
    val b = mat.select(col("cell").as("cb"), col("vec_id").as("ib"),
      col("v").as("vb"))
    val pairs = a.join(b, col("cell") === col("cb") &&
        col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        r(Similarity.cosine(col("va"), col("vb")), 4).as("sim"))
    graft.plans.TopKPerKey(pairs, keys = Seq("ia"),
      order = Seq(("sim", true), ("ib", false)), k = 3)
      .select(col("ia"), col("ib"))
  }

  /** Test hook: assignment for a dir (for auditing knnEdgesPlan). */
  private[graft] def knnAssignmentForAudit(s: SparkSession,
      d: String): DataFrame = knnAssignment(s, d)

  /** The distributed half of q_psi_drift: one event pass folded to the
    * ≤10-row (bucket → era counts) table — bin edges from the exact
    * integer-cents min/max scalars (1-row broadcast join), bucket via
    * integral `div` (Spark's `/` on longs is double division).
    * Package-private so PlanAuditSpec can pin the rollup shape.
    */
  private[graft] def psiBucketCounts(s: SparkSession,
      d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("value"), unix_micros(col("ts")).as("e"))
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val stats = ev.agg(min(col("e")).as("emin"), max(col("e")).as("emax"),
      min(cents).as("cmin"), max(cents).as("cmax"))
    ev.crossJoin(broadcast(stats))
      .select(
        when(col("e") * 2 >= col("emin") + col("emax"), 1L)
          .otherwise(0L).as("era"),
        cents.as("c"), col("cmin"), col("cmax"))
      .select(col("era"), expr(
        "least(9L, (c - cmin) * 10 div (cmax - cmin + 1))").as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("era") === 0L, 1L).otherwise(0L)).as("ca"),
        sum(when(col("era") === 1L, 1L).otherwise(0L)).as("cb"))
  }

  /** The distributed half of q_benford: one orders pass folded to the
    * ≤9-row (leading digit → count) table. The digit comes off the
    * decimal string of the floored total — exact on both engines (no
    * log10 at runtime). Package-private so PlanAuditSpec can pin the
    * rollup shape.
    */
  private[graft] def benfordDigitCounts(s: SparkSession,
      d: String): DataFrame =
    orders(s, d)
      .select(expr("cast(substring(cast(cast(floor(o_totalprice) " +
        "AS bigint) AS string), 1, 1) AS bigint)").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))

  /** Test hook: the un-memoized tokenize pass, so PlanAuditSpec can
    * audit the one-corpus-pass plan the memo lands.
    */
  private[graft] def bm25BasePlan(s: SparkSession, d: String): DataFrame =
    parallelize(documents(s, d))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        filter(col("tk"), t => t.isin(Bm25Terms: _*)).as("hits"))

  /** Per-(doc, term) BM25 contribution in exact micro units, over
    * columns (tf, df, dl, n_docs, tot): idf · tf(k1+1) / (tf + k1(1−b +
    * b·dl/avgdl)) with k1=1.2, b=0.75 — floor-integerized so the
    * per-doc sum is a long add (associative, hash-stable). The oracle
    * SQL mirrors this expression operator for operator.
    */
  private def bm25TermMicro: Column = {
    val avgdl = col("tot").cast("double") / col("n_docs")
    val idf = log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val denom = col("tf").cast("double") +
      lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl)
    floor(idf * (col("tf").cast("double") * lit(2.2)) / denom * lit(1e6)
      + lit(0.5)).cast("long")
  }

  /** DuckDB mirror of [[bm25TermMicro]] + the tf/df/dl/stats CTE chain
    * (shared by the q_bm25 and q_rrf_fusion oracles); `scFilter`
    * narrows the SCORED candidate set (e.g. excluding the query doc) —
    * after tf/df/stats are computed over the full corpus, exactly as
    * the Spark side filters.
    */
  private def bm25CteSql(scFilter: String = ""): String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |dl AS (SELECT doc_id, cast(len(tk) AS bigint) AS dl FROM tk),
       |st AS (SELECT cast(count(*) AS bigint) AS n_docs,
       |         cast(sum(dl) AS bigint) AS tot FROM dl),
       |tf AS (SELECT doc_id, t, cast(count(*) AS bigint) AS tf
       |       FROM (SELECT doc_id, unnest(tk) AS t FROM tk)
       |       WHERE t IN ($terms) GROUP BY 1, 2),
       |df AS (SELECT t, cast(count(*) AS bigint) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT doc_id, cast(sum(cast(floor(
       |    ln((cast(n_docs - df AS double) + 0.5)
       |      / (cast(df AS double) + 0.5) + 1.0)
       |    * (cast(tf AS double) * 2.2)
       |    / (cast(tf AS double) + 1.2 * (0.25
       |        + 0.75 * cast(dl AS double)
       |          / (cast(tot AS double) / n_docs)))
       |    * 1000000.0 + 0.5) AS bigint)) AS bigint) AS score_micro
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (t) CROSS JOIN st
       |  $scFilter GROUP BY 1)""".stripMargin
  }

  /** The scored/labeled document CTE `sc(source, qm, pos)` — the SQL
    * mirror of scoredLabeledDocsPlan (identical double tree inside the
    * floor, identical Gopher gate), shared by the eval-family oracles
    * added after the q_auc/q_pr_curve copies were already in place.
    */
  private def scoredSrcCteSql: String = {
    val nTok = "len(string_split(text,' '))"
    val stop = "len(list_filter(string_split(text,' '), " +
      "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
    val atl = rs(s"cast(length(text) - ($nTok - 1) AS double) / $nTok", 6)
    val swr = rs(s"cast($stop AS double) / $nTok", 6)
    val punct = "(length(text) - " +
      "length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
    val z = s"CAST(-1.5 AS DOUBLE) + cast($nTok AS int) * " +
      s"CAST(0.002 AS DOUBLE) + ($swr) * CAST(2.0 AS DOUBLE) - " +
      s"$punct * CAST(0.01 AS DOUBLE) + ($atl) * CAST(0.1 AS DOUBLE)"
    val q = rs(s"1.0 / (1.0 + exp(-($z)))", 6)
    val keep = s"(NOT ($nTok < 20 OR $nTok > 1000) " +
      s"AND NOT (length(text) - ($nTok - 1) < $nTok * 3 " +
      s"OR length(text) - ($nTok - 1) > $nTok * 10) " +
      s"AND $stop >= 2 " +
      s"AND len(list_distinct(string_split(text,' '))) * 10 " +
      s">= $nTok * 3)"
    s"""sc AS (SELECT source,
       |        cast(floor(($q) * 1000000.0 + 0.5) AS bigint) AS qm,
       |        CASE WHEN $keep THEN 1 ELSE 0 END AS pos
       |      FROM documents)""".stripMargin
  }

  /** Consecutive-doc pair table carrying each side's unigram/bigram
    * count maps and token counts: (id_a, m1a, m2a, na, id_b, m1b, m2b,
    * nb) with id_b = id_a + 1. The per-doc gram work lives IN the row
    * (native one-pass GramCountsExpr → MAP<fnv64, count>) so the gram
    * stream never exists as rows; the only exchange is the doc_id+1
    * self-join of map-valued rows. Shared by the eval-metric pair
    * queries (q_rouge_pairs, q_bleu_pairs).
    */
  private def gramPairJoin(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GramExprs
    val side = parallelize(documents(s, d))
      .select(col("doc_id"),
        GramExprs.gramCounts(col("text"), 1).as("m1"),
        GramExprs.gramCounts(col("text"), 2).as("m2"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
    val x = side.select(col("doc_id").as("id_a"), col("m1").as("m1a"),
      col("m2").as("m2a"), col("n").as("na"))
    val y = side.select(col("doc_id").as("id_b"), col("m1").as("m1b"),
      col("m2").as("m2b"), col("n").as("nb"))
    x.join(y, col("id_b") === col("id_a") + 1)
  }

  /** CTE producing (doc_id, band_idx, band_key) — mirror of Dedup.lshBands
    * with n=2, bands=4, rowsPerBand=2: ONE md5 per shingle, k 16-bit
    * chunk-min hashes (Dedup.chunkMinhash).
    */
  /** The minhash-signature → band CTE chain over a given shingle-list
    * SQL, with `p`-prefixed CTE names so two chains (or a chain plus
    * other CTEs) can coexist in one statement. `bandsChain(shSql, "")`
    * is the historical `bandsCte` body byte-for-byte.
    */
  private def bandsChain(shingleSql: String, p: String): String = {
    val sig = (0 until LshBands * LshRows)
      .map(c => s"list_min(list_transform(dg, d -> substr(d, ${c * 4 + 1}, 4)))")
      .mkString("[", ", ", "]")
    s"""${p}s AS (SELECT doc_id, $shingleSql AS sh FROM documents),
       |${p}dg AS (SELECT doc_id, list_transform(sh, x -> md5(x)) AS dg FROM ${p}s),
       |${p}sig AS (SELECT doc_id, $sig AS sig FROM ${p}dg),
       |${p}bands AS (
       |  SELECT doc_id, b AS band_idx,
       |    md5(array_to_string(list_slice(sig, b*$LshRows+1, b*$LshRows+$LshRows), '')) AS band_key
       |  FROM ${p}sig, (SELECT unnest(generate_series(0, ${LshBands - 1})) AS b))""".stripMargin
  }
  private val bandsCte = s"WITH ${bandsChain(shSql, "")}"

  /** Per-doc bigram-LM negative log-likelihood under the corpus's own
    * bigram model → (doc_id, n_bigrams, nll_sum_micro); shared by
    * q_ngram_lm (the per-doc quality score) and q_ppl_buckets (the
    * decile composition). bi and biC are materialized once (persist
    * MEMORY_AND_DISK — cached blocks with lineage retained, so a lost
    * block recomputes instead of killing every downstream query; this
    * cache outlives single queries, the block-loss exposure window of a
    * session-long artifact): bi feeds both the LM-count derivation and
    * the per-doc join-back, biC feeds both the bigram join and the
    * unigram rollup — without the materialization the scan→explode→agg
    * pipeline is recomputed on every reference (3× in the round-5 plan).
    * The
    * per-bigram surprise is integerized to micro-nats BEFORE summation:
    * long sums are associative, so aggregation order can't drift the
    * hash.
    */
  private def ngramDocNll(s: SparkSession, d: String): DataFrame = {
    val toks = parallelize(documents(s, d))
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
    val bi = toks
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 2)).as("i"))
      .select(col("doc_id"),
        element_at(col("t"), col("i") + 1).as("w1"),
        element_at(col("t"), col("i") + 2).as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val biC = bi.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c")).as("c2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unigram rollup is vocabulary-sized (tens of millions of rows ×
    // 2 columns at 100 TB — hundreds of MB): broadcast it so the
    // bi⋈biC result never reshuffles from (w1,w2) onto w1
    val uniC = broadcast(
      biC.groupBy(col("w1")).agg(sum(col("c2")).as("c1")))
    bi.join(biC, Seq("w1", "w2")).join(uniC, Seq("w1"))
      .select(col("doc_id"), col("c"),
        floor(-log(col("c2").cast("double") / col("c1")) * 1e6 + lit(0.5))
          .cast("long").as("nll_micro"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * col("nll_micro")).as("nll_sum_micro"))
      // the doc-level rollup persists too (3 longs per doc — tiny):
      // q_ppl_buckets consumes it twice (bucket manifest + rank join)
      // and without this each consumer re-ran the bi⋈biC join-agg;
      // persist (not checkpoint) keeps lineage, so a block wipe
      // recomputes — BlockLossRecoverySpec runs q_ppl_buckets
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Exact Jaccard ≥ 0.6 pairs over 8-word shingles via AllPairs prefix
    * filtering — q_prefix_join's engine, reused verbatim as the GROUND
    * TRUTH by q_lsh_recall (grading the approximate funnel against the
    * exact answer, the q_ann_recall pattern for text dedup).
    */
  private def prefixJoinPairs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tau = 0.6
    val sh = parallelize(documents(s, d))
      .select(col("doc_id"), Dedup.shingles(col("text"), 8).as("sh"))
      .localCheckpoint(false) // 3 consumers (rank, verify a/b); ~5 KB/doc
    val tok = sh.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("t"))
    val dfreq = tok.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val pfx = tok.join(dfreq, "t")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("t"))))
      .filter(col("rk") <= col("n") - ceil(col("n") * tau) + 1)
      .select(col("doc_id"), col("t"))
    val cand = pfx.select(col("doc_id").as("id_a"), col("t"))
      .join(pfx.select(col("doc_id").as("id_b"), col("t")), Seq("t"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val inter = graft.functions.StringSim
      .intersectCount(col("sa"), col("sb")).cast("double")
    val jac = r(inter / (size(col("sa")) + size(col("sb")) - inter), 6)
    cand
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sa")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  // memoized per (session, dir): the exact pair set serves BOTH
  // q_prefix_join and q_lsh_recall's ground truth — one corpus pass per
  // session, landed to parquet via Materialize.memo (tiny artifact,
  // storage-loss-proof file-scan plan — the graph-memo pattern).
  // WEAK-keyed by session and holding only the artifact PATH (a cached
  // DataFrame would strongly reference its session through the weak
  // key's value, pinning it forever): a long-lived multi-session
  // process reclaims dead sessions' entries, and a hit re-reads the
  // landed parquet — a trivial file-scan plan, which is the whole point
  // of the memo. Artifacts under the tmpdir default are swept at JVM
  // exit by Materialize's shutdown hook.
  private val prefixPairsCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, String]]()
  private def prefixJoinPairsMemo(s: SparkSession, d: String): DataFrame = {
    val inner = prefixPairsCache.synchronized {
      var m = prefixPairsCache.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, String]
        prefixPairsCache.put(s, m)
      }
      m
    }
    val path = inner.getOrElseUpdate(d,
      graft.util.Materialize.memoPath(prefixJoinPairs(s, d), "prefix_pairs"))
    s.read.parquet(path)
  }

  /** Test hook: the un-memoized pair computation, so PlanAuditSpec can
    * audit the plan the memo lands (the memoized public path is a file
    * scan of the artifact).
    */
  private[graft] def prefixJoinPairsForAudit(s: SparkSession,
      d: String): DataFrame = prefixJoinPairs(s, d)

  /** q_skipgrams' symmetrized (center, context) occurrence stream —
    * exposed so PlanAuditSpec can audit the pair pass. Shape
    * guarantees: the top-3 stop-word pick plans as
    * TakeOrderedAndProject (orderBy+limit: per-partition top-3 then a
    * 3-row merge — never a single-partition WindowExec over the
    * vocabulary); the 3 dropped words are COLLECTED (a bounded scalar
    * artifact, the BPE/centroid precedent) so the compaction is a
    * per-row array filter and pair emission reads adjacent array slots
    * in the same whole-stage-codegen pass, in BOTH directions (4 slots
    * per position) — no anti join, no doc_id window exchange, no token
    * self-join, and no exchange at all inside the pass.
    */
  /** The top-3 stop-word pick (cw desc, w) — separate hook so the
    * audit can pin its TakeOrderedAndProject shape (the collect in
    * [[skipgramLeadPairs]] hides the plan).
    */
  private[graft] def skipgramDrop3(s: SparkSession, d: String): DataFrame =
    parallelize(documents(s, d))
      // per-doc term counts fold in the row (native one-pass kernel),
      // so the explode emits distinct-terms-per-doc rows, not raw
      // tokens, and the rollup sums tf instead of counting occurrences
      .select(explode(
        graft.functions.TextExprs.termCounts(col("text"))).as("tc"))
      .groupBy(col("tc.term").as("w"))
      .agg(sum(col("tc.tf")).as("cw"))
      .orderBy(col("cw").desc, col("w"))
      .limit(3)
      .select(col("w"))

  private[graft] def skipgramLeadPairs(s: SparkSession,
      d: String): DataFrame = {
    import s.implicits._
    val docs = parallelize(documents(s, d))
    val drop3 = skipgramDrop3(s, d).as[String].collect().toSeq
    val ws = filter(split(col("text"), " "),
      x => !x.isin(drop3: _*))
    // ws is consumed in the same codegen stage as the explode — the
    // per-row array never materializes across an exchange. Neighbor
    // lookups are when-guarded (ANSI element_at throws on OOB).
    def slot(off: Int, fwd: Boolean) = {
      val nb = element_at(col("ws"), col("i") + lit(off))
      val (c, x) = if (fwd) (col("wa"), nb) else (nb, col("wa"))
      when(col("i") + off <= size(col("ws")),
        struct(c.as("center"), x.as("context")))
    }
    docs.select(col("doc_id"), ws.as("ws"))
      .select(col("ws"), posexplode(col("ws")).as(Seq("i", "wa")))
      .select(explode(array(
        slot(2, fwd = true), slot(2, fwd = false),
        slot(3, fwd = true), slot(3, fwd = false))).as("p"))
      .filter(col("p").isNotNull)
      .select(col("p.center").as("center"), col("p.context").as("context"))
  }

  /** The verified record-linkage edge set shared by `q_jaro_link`
    * (scored pairs) and `q_linkage_clusters` (components +
    * survivorship): distinct part names with row support, blocked on
    * the leading token, grid-decomposed within blocks
    * ([[gridBlockedPairs]]), Jaro-Winkler-verified at ≥ 0.8 through
    * the native codegen'd expression.
    */
  private def jaroLinkEdges(s: SparkSession, d: String): DataFrame = {
    val names = part(s, d)
      .groupBy(col("p_name").as("nm"))
      .agg(count(lit(1)).as("support"))
      .withColumn("blk", split(col("nm"), " ").getItem(0))
    gridBlockedPairs(names, GridLinkCap)
      .filter(graft.functions.StringSim.jaroWinkler(
        col("name_a"), col("name_b")) >= 0.8)
  }

  /** Per-cell side bound for [[gridBlockedPairs]] — ≤ cap² verify calls
    * per grid cell (~1M at 1024: about a second of Jaro-Winkler work,
    * a healthy task size). Every real block in the test corpora is far
    * below one cap, so the grid degenerates to the plain block join
    * there (1-element explodes); the machinery only spreads out when a
    * block is actually hot.
    */
  private[graft] val GridLinkCap = 1024

  /** Within-block unordered pair join, GRID-DECOMPOSED so no task ever
    * sees more than `cap²` candidate pairs — the de-skew for record
    * linkage when one blocking key goes hot (a stop-word or dominant
    * brand as leading token makes the naive block self-join O(B²) in
    * ONE task). Rows are ranked inside their block by name; chunk
    * `c = (rank−1)/cap` tiles the ordered pair space into cells
    * (cx ≤ cy): the a-side replicates each row to every cell column at
    * or right of its chunk, the b-side to every cell row at or above
    * its chunk, and the join key is the exact cell — so the ordered
    * pair (name_a < name_b, which implies chunk_a ≤ chunk_b under the
    * shared name order) meets in EXACTLY one cell: lossless,
    * exactly-once, and ⌈B/cap⌉² tasks instead of 1.
    * `GridBlockedPairsSpec` pins pair-set ≡ the naive block join and
    * the per-cell occupancy bound on a synthetic hot block.
    *
    * Input columns: `nm`, `support`, `blk`; output:
    * `name_a/name_b/n_a/n_b` for every within-block pair.
    */
  private[graft] def gridBlockedPairs(names: DataFrame,
      cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunked = names
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("blk")).orderBy(col("nm"))))
      .withColumn("bsz", count(lit(1)).over(
        Window.partitionBy(col("blk"))))
      .withColumn("c", ((col("rn") - 1) / cap).cast("int"))
      .withColumn("nch", ceil(col("bsz") / lit(cap.toDouble)).cast("int"))
    val a = chunked.select(col("nm").as("name_a"),
      col("support").as("n_a"), col("blk"), col("c").as("cx"),
      explode(sequence(col("c"), col("nch") - 1)).as("cy"))
    val b = chunked.select(col("nm").as("name_b"),
      col("support").as("n_b"), col("blk").as("blk_b"),
      col("c").as("cy_b"),
      explode(sequence(lit(0), col("c"))).as("cx_b"))
    a.join(b,
      col("blk") === col("blk_b") && col("cx") === col("cx_b") &&
        col("cy") === col("cy_b") && col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"))
  }

  val defs: Map[String, Q] = Map(
    // ---- set-similarity join (AllPairs prefix filtering) ----------------
    // Exact Jaccard >= τ self-join WITHOUT LSH (the deterministic sibling
    // of q_fuzzy_dedup's banded funnel): each doc keeps only its
    // p = n − ⌈τ·n⌉ + 1 globally-rarest shingles under a total order
    // (df asc, shingle asc) — by the prefix-filtering theorem (Bayardo et
    // al., WWW'07 "Scaling Up All Pairs") any pair with overlap ≥ ⌈τ·n⌉
    // must share a prefix token, so the candidate join runs over ~40 % of
    // the token stream and exact verification touches candidates only;
    // never all-pairs. FP safety of ⌈τ·n⌉: a LARGER ceil would SHORTEN
    // the prefix p = n − ⌈τ·n⌉ + 1 (the lossy direction), but with
    // τ=0.6 the double product can only round DOWN past an integer
    // (0.6d < 3/5, so fl(n·0.6d) ≤ n·3/5) — ceil never exceeds the
    // exact ⌈3n/5⌉ and the prefix is never shorter than the theorem
    // needs. Changing τ or the rounding form requires re-checking this
    // direction; PrefixJoinLawsSpec brute-forces it on random corpora.
    // The oracle derives candidates INDEPENDENTLY (pairs sharing ANY
    // shingle — a strict superset of prefix candidates), so a prefix bug
    // that drops a qualifying pair hash-mismatches rather than agreeing.
    "q_prefix_join" -> ((s, d) => prefixJoinPairsMemo(s, d)),

    // ---- asymmetric containment join (quote / subset detection) ---------
    // C(A→B) = |S(A)∩S(B)| / |S(A)| ≥ τ — the metric that finds a doc
    // QUOTED inside a larger one even when symmetric Jaccard is tiny
    // (the long-doc dilution problem exact/near dedup misses). The
    // prefix-filtering theorem applies ASYMMETRICALLY: overlap ≥ ⌈τ·n_a⌉
    // forces sharing one of A's p = n_a − ⌈τ·n_a⌉ + 1 globally-rarest
    // shingles, so only the PROBE side prunes to its prefix while the
    // corpus side keeps its full shingle stream — candidates only,
    // never all-pairs, and lossless (A's non-prefix holds ⌈τ·n_a⌉ − 1
    // shingles, fewer than the required overlap). τ=0.5 is exactly
    // representable, so ⌈n·0.5⌉ has no float-rounding direction to
    // check. Ordered pairs (a≠b, both directions scored — containment
    // is not symmetric). The oracle derives candidates INDEPENDENTLY
    // (pairs sharing ANY shingle, a strict superset), so a prefix bug
    // hash-mismatches rather than agreeing.
    "q_containment" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tau = 0.5
      val sh = parallelize(documents(s, d))
        .select(col("doc_id"), Dedup.shingles(col("text"), 8).as("sh"))
        .localCheckpoint(false) // probe prefix, corpus stream, verify a/b
      val tok = sh.select(col("doc_id"), size(col("sh")).as("n"),
        explode(col("sh")).as("t"))
      val dfreq = tok.groupBy(col("t")).agg(count(lit(1)).as("df"))
      val pfx = tok.join(dfreq, "t")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("t"))))
        .filter(col("rk") <= col("n") - ceil(col("n") * tau) + 1)
        .select(col("doc_id"), col("t"))
      val cand = pfx.select(col("doc_id").as("id_a"), col("t"))
        .join(tok.select(col("doc_id").as("id_b"), col("t")), Seq("t"))
        .filter(col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      val inter = graft.functions.StringSim
      .intersectCount(col("sa"), col("sb")).cast("double")
      cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sa")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sb")), "id_b")
        .select(col("id_a"), col("id_b"),
          r(inter / size(col("sa")), 6).as("containment"))
        .filter(col("containment") >= tau)
    }),

    // ---- LSH funnel recall/precision vs exact ground truth --------------
    // The q_ann_recall pattern for text dedup: the MinHash-LSH candidate
    // funnel (8-shingles, 4 bands × 2 rows — S-curve hit prob
    // 1−(1−J²)⁴ ≈ 0.83 at J=0.6) graded against the EXACT Jaccard≥0.6
    // pair set from the AllPairs prefix join. One integer row:
    // truth/candidate/hit counts plus floor-micro recall and precision —
    // the measurement a pipeline owner uses to size bands/rows before
    // trusting the funnel at 100 TB. Counts are exact and the funnel is
    // deterministic, so the row is hash-stable.
    "q_lsh_recall" -> ((s, d) => {
      // the memoized parquet landing is already a file scan — both its
      // consumers (n_true, hit join) read the artifact, no barrier needed
      val truth = prefixJoinPairsMemo(s, d).select(col("id_a"), col("id_b"))
      val lsh = Dedup.lshCandidatePairs(
        Dedup.lshBands(documents(s, d), col("doc_id"), col("text"), 8,
          LshBands, LshRows))
        .localCheckpoint(false) // consumed by n_cand and the hit join —
                                // without it the band self-join+distinct
                                // subtree appears in both branches
      val hit = lsh.join(truth, Seq("id_a", "id_b"))
      val m = (n: Column, den: Column) =>
        when(den > 0, floor(n * 1000000L / den)).otherwise(lit(-1L))
          .cast("long")
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(lsh.agg(count(lit(1)).as("n_cand")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(col("n_true"), col("n_cand"), col("n_hit"),
          m(col("n_hit"), col("n_true")).as("recall_micro"),
          m(col("n_hit"), col("n_cand")).as("precision_micro"))
    }),

    // ---- cross-source contamination matrix ------------------------------
    // "How much of source A is inside source B" — the curation diagnostic
    // run before mixing corpora: distinct 8-gram spans per source,
    // digest-keyed self-join (md5-width shuffle keys, never raw span
    // strings), shared-span counts per source pair. The same span-digest
    // construction as q_contamination, but source×source instead of
    // corpus×benchmark.
    "q_source_overlap" -> ((s, d) => {
      // r14: shuffle-hash instead of the planner's broadcast (guide
      // §3.1) — the build side here is the CORPUS-SIZED distinct span
      // table (~465k rows at sf0.1, one per (source, 8-gram digest)),
      // and framing + shipping it as a broadcast relation measured
      // slower than co-partitioning both sides on the fixed-width
      // digest (interleaved min-of-4 at sf0.1: 2.21 s broadcast vs
      // 2.00 s shuffle-hash). The subtree still computes on both sides
      // (the analyzer clones a self-join's right side; compute-once
      // via localCheckpoint measured slower — store + extra stages
      // outweigh the saved recompute), but at scale shuffled-on-digest
      // is the only survivable shape anyway: the span table outgrows
      // any broadcast long before 100 TB.
      val sp = parallelize(documents(s, d))
        .select(col("source"),
          explode(Dedup.shingles(col("text"), 8)).as("span"))
        .select(col("source"), md5(col("span")).as("h")).distinct()
      sp.select(col("source").as("src_a"), col("h"))
        .join(sp.select(col("source").as("src_b"), col("h"))
          .hint("shuffle_hash"), Seq("h"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_shared"))
    }),

    // ---- URL canonicalization + URL-level dedup -------------------------
    // The FineWeb/CCNet web-pipeline op: URLs arrive messy (case-mixed
    // scheme/host, explicit default port, tracking params, trailing
    // slash) and URL-level dedup keys on the canonical form. Like the
    // media tables, the INPUT is synthesized deterministically in-query
    // (mixed-case + junk varies per doc_id; colliding path = doc_id%40
    // per source) so the oracle sees identical bytes and real duplicate
    // groups exist. Canonical = lowercase host + port-stripped,
    // slash-trimmed path + the one meaningful param — tracking params
    // (utm_*, fbclid) are dropped by omission of everything not
    // whitelisted. Pure codegen'd string expressions; one canonical-key
    // shuffle.
    "q_url_canon" -> ((s, d) => {
      val id = col("doc_id")
      val url = concat(
        when(id % 2 === 0, lit("HTTPS://")).otherwise(lit("https://")),
        when(id % 3 === 0, upper(col("source"))).otherwise(col("source")),
        lit(".Example.COM"),
        when(id % 5 === 0, lit(":443")).otherwise(lit("")),
        lit("/docs/"), (id % 40).cast("string"),
        when(id % 7 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&page="), (id % 3).cast("string"),
        lit("&fbclid="), id.cast("string"))
      val host = lower(regexp_extract(col("url"), "://([^/:?]+)", 1))
      val path =
        rtrim(regexp_extract(col("url"), "[^/]//[^/?]+(/[^?]*)", 1), "/")
      val page = regexp_extract(col("url"), "[?&]page=([0-9]+)", 1)
      parallelize(documents(s, d))
        .select(id.as("doc_id"), url.as("url"))
        .select(col("doc_id"),
          concat(lit("https://"), host, path, lit("?page="), page)
            .as("canonical_url"))
        .groupBy(col("canonical_url"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
    }),

    // ---- exponential smoothing (EWMA) -----------------------------------
    // Windowed-truncated exponentially weighted moving average over the
    // per-user event series (pandas `ewm(alpha=.25, adjust=True)` over the
    // last 16 observations): numerator Σ xᵢ·βⁿ⁻¹⁻ⁱ and normalizer Σ βᵏ are
    // BOTH evaluated as left-to-right Horner folds over the window-ordered
    // value list — Spark `aggregate(arr, 0.0, (acc,x) → acc·β + x)` and
    // DuckDB `list_reduce` execute the identical op sequence (0·β+x₁ ≡ the
    // reduce's x₁ seed), so the doubles agree bit-for-bit before the 6-dp
    // pin, with no pow() library variance anywhere.
    "q_ewma" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(epochS(col("ts")), col("event_id")).rowsBetween(-15, 0)
      val beta = 0.75
      // r14: the normalizer Σβᵏ depends only on the window LENGTH, so
      // the interpreted per-row Horner fold (HOFs never reach codegen)
      // is replaced by a 17-entry literal lookup computed driver-side
      // with the IDENTICAL left-to-right fold (same IEEE op sequence ⇒
      // bit-identical doubles; the oracle still evaluates its own
      // list_reduce and hash-matches). Only the data-dependent
      // numerator fold remains per row — measured ~15% off the query
      // at sf0.1.
      val normLut = typedLit((0 to 16).map(n =>
        (1 to n).foldLeft(0.0)((acc, _) => acc * beta + 1.0)))
      events(s, d)
        .withColumn("arr", collect_list(col("value")).over(w))
        .select(col("event_id"), col("user_id"),
          r(aggregate(col("arr"), lit(0.0), (acc, x) => acc * beta + x) /
            element_at(normLut, size(col("arr")) + 1), 6)
            .as("ewma"))
    }),

    // ---- text analysis --------------------------------------------------
    // Per-doc Shannon token entropy — the gibberish/boilerplate quality
    // signal (low entropy = repetitive spam, high = natural text):
    // H = ln n − (Σ cᵢ·ln cᵢ)/n over per-doc token counts. Every ln is
    // integerized to micro-nats per DISTINCT count value before the
    // integer-exact sums (the q_ngram_lm recipe), so aggregation order
    // can't move the hash; the only doubles are one final exact-integer
    // division. Two-level aggregation: (doc, tok) partials then the
    // doc rollup — the ANALYZE shape, no Expand.
    "q_token_entropy" -> ((s, d) => {
      val micro = (e: Column) => floor(e * 1e6 + 0.5).cast("long")
      parallelize(documents(s, d))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          sum(col("c") * micro(log(col("c").cast("double"))))
            .as("s_micro"))
        .select(col("doc_id"), col("n_tokens"),
          r((micro(log(col("n_tokens").cast("double"))) * col("n_tokens") -
              col("s_micro")).cast("double") /
            (col("n_tokens").cast("double") * 1e6), 6).as("entropy"))
    }),

    // Shannon entropy RATE of the corpus bigram Markov chain,
    // H(X₂|X₁) = Σ_ab p(ab)·(−ln p(b|a)) — the conditional sibling of
    // q_token_entropy's unigram H (conditioning can only reduce
    // entropy: h_rate ≤ H₁, pinned by the invariants spec). The
    // per-bigram surprisal is EXACTLY the q_sssp edge weight
    // (micro-nats, integerized per edge before any sum — the
    // q_ngram_lm ln recipe), so the entropy mass Σ c_ab·w_ab is one
    // exact long fold over the vocabulary²-sized transition table;
    // only the bigram extraction touches the corpus. The final rate
    // is integral division by the bigram total.
    "q_entropy_rate" -> ((s, d) => {
      val cnt = bigramCounts(s, d)
      val outm = cnt.groupBy(col("a")).agg(sum(col("cab")).as("outc"))
      cnt.join(outm, "a")
        .select(col("cab"),
          (col("cab") * floor(-log(col("cab").cast("double") /
            col("outc").cast("double")) * lit(1e6) + lit(0.5))
            .cast("long")).as("hm"))
        .agg(sum(col("cab")).as("n_bigrams"),
          sum(col("hm")).as("h_mass_micro"))
        .select(col("n_bigrams"), col("h_mass_micro"),
          expr("h_mass_micro div n_bigrams").as("h_rate_micro"))
    }),

    // Gini coefficient of the token frequency distribution — the
    // inequality summary beside q_zipf_slope's power-law fit. The
    // classic formula needs every word's ascending frequency RANK —
    // a global row_number (single-partition WindowExec, the exact
    // shape the r9 verdict flagged on q_skipgrams). Instead the rank
    // sum folds over the frequency-of-frequencies table: words with
    // equal count c form a consecutive rank run (within-run order
    // cancels for equal c), so Σ rank·c = Σ_c c·(a_c·m_c +
    // m_c(m_c+1)/2) with a_c the words below — and the only window
    // walks the DISTINCT-COUNT domain (hundreds of rows at any
    // corpus size; the PSI/ppl-bucket class), never the vocabulary.
    // All masses are exact longs; one double division at the end.
    "q_gini_tokens" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wc = parallelize(documents(s, d))
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val ff = wc.groupBy(col("c")).agg(count(lit(1)).as("m"))
      val win = Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ff.withColumn("a", coalesce(sum(col("m")).over(win), lit(0L)))
        .select((col("c") * (col("a") * col("m") +
          expr("m * (m + 1) div 2"))).as("term"), col("m"),
          (col("c") * col("m")).as("mass"))
        .agg(sum(col("term")).as("s"), sum(col("m")).as("n_vocab"),
          sum(col("mass")).as("n_tokens"))
        .select(col("n_vocab"), col("n_tokens"),
          floor((lit(2L) * col("s") - (col("n_vocab") + lit(1L)) *
            col("n_tokens")).cast("double") /
            (col("n_vocab") * col("n_tokens")).cast("double") *
            lit(1e6) + lit(0.5)).cast("long").as("gini_micro"))
    }),

    // Good-Turing frequency estimation over the word-TRIGRAM table —
    // the unseen-mass and smoothed-count numbers a Katz-backoff
    // language model reads off its n-gram counts: p0 = N1/N
    // (probability mass of never-seen trigrams) and the Turing-
    // smoothed counts c* = (c+1)·m_{c+1}/m_c for the low frequencies
    // (c ≤ 5) where smoothing matters. Trigrams, not unigrams: the
    // corpus vocabulary is closed (31 words at every sf), so only the
    // n-gram domain is sparse enough to HAVE low-frequency classes —
    // exactly why GT smoothing targets n-gram tables in practice.
    // Everything past the gram-count exchange is count-domain-sized,
    // and all ratios are exact integral `div` in micro.
    // Perf disposition (measured): sf0.1 ~0.5 s vs DuckDB 0.10 s is
    // the corpus-explode stage floor — the ratio INVERTS at the
    // decades (×10: 1.19 s vs 1.19 s parity; ×100: 5.2 s vs 14.1 s,
    // 2.7× FASTER) — the q_span_dedup KEEP pattern.
    "q_good_turing" -> ((s, d) => {
      // gram stream never exists as string rows: the native
      // GramCountsExpr emits each doc's MAP<fnv64, count> in one pass
      // (per-doc map-side combine built in), so the corpus exchange
      // carries (long, long) pairs, not 3-token strings — the
      // q_rouge_pairs kernel. Counting by 64-bit digest ≡ counting by
      // gram at any realistic corpus (the md5-digest-key precedent
      // the span-dedup family pins); the oracle counts the strings.
      val wc = parallelize(documents(s, d))
        .select(explode(graft.functions.GramExprs
          .gramCounts(col("text"), 3)).as(Seq("g", "cnt")))
        .groupBy(col("g")).agg(sum(col("cnt")).as("c"))
      // join-free, barrier-free tail: ONE single-partition window
      // over the count domain (the q_gini_tokens class — dozens of
      // rows at any corpus size) provides both the c+1 neighbor
      // (lead, guarded on adjacency) and the global totals
      // (unbounded-frame sums) — the earlier ff-self-join +
      // scalar-cross-join form paid a checkpoint plus two joins for
      // the same rows (measured 0.55 s → 0.35 s at sf0.1)
      import org.apache.spark.sql.expressions.Window
      val ff = wc.groupBy(col("c")).agg(count(lit(1)).as("m"))
      val ord = Window.orderBy(col("c"))
      val all = Window.orderBy(col("c")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      ff.withColumn("m_next",
          when(lead(col("c"), 1).over(ord) === col("c") + lit(1L),
            lead(col("m"), 1).over(ord)).otherwise(lit(0L)))
        .withColumn("n_tokens", sum(col("c") * col("m")).over(all))
        .withColumn("n_vocab", sum(col("m")).over(all))
        .withColumn("n1", coalesce(
          sum(when(col("c") === 1L, col("m"))).over(all), lit(0L)))
        .filter(col("c").between(1L, 5L))
        .select(col("c"), col("m").as("m_c"), col("m_next"),
          expr("((c + 1) * m_next * 1000000L) div m")
            .as("c_star_micro"),
          expr("n1 * 1000000L div n_tokens").as("p0_micro"),
          col("n_tokens"), col("n_vocab"))
    }),

    // Spearman rank correlation (tie-aware) between document length
    // and distinct-token count — "does vocabulary breadth track
    // length". Both variables live on the BOUNDED length domain, so
    // every doc's average rank is a value-domain lookup: the corpus
    // folds once to the joint (x, y) count grid (≤ |domain|² rows at
    // any corpus size), marginal rank tables come from count-domain
    // windows (the q_gini_tokens class — never the corpus), and all
    // five moment sums Σc·f(rx,ry) are exact longs folded map-side
    // over the grid. Doubled ranks (2r = 2·below + ties + 1) keep the
    // tie-average integral; ρ is scale-invariant so the doubling
    // cancels. The one-row result computes ρ in doubles FROM exact
    // longs with the identical IEEE tree as the oracle.
    "q_spearman" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = split(col("text"), " ")
      val grid = documents(s, d)
        .select(size(toks).cast("long").as("x"),
          size(array_distinct(toks)).cast("long").as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint(false) // |domain|²-bounded; 3 consumers (two
                                // rank tables + the moment fold)
      def rankTable(v: String): DataFrame = {
        val win = Window.orderBy(col(v))
          .rowsBetween(Window.unboundedPreceding, -1)
        grid.groupBy(col(v)).agg(sum(col("cnt")).as("t"))
          .withColumn("a", coalesce(sum(col("t")).over(win), lit(0L)))
          .select(col(v), (lit(2L) * col("a") + col("t") + lit(1L))
            .as(s"r$v"))
      }
      grid.join(rankTable("x"), "x").join(rankTable("y"), "y")
        .agg(sum(col("cnt")).as("n_docs"),
          sum(col("cnt") * col("rx")).as("sx"),
          sum(col("cnt") * col("ry")).as("sy"),
          sum(col("cnt") * col("rx") * col("ry")).as("sxy"),
          sum(col("cnt") * col("rx") * col("rx")).as("sxx"),
          sum(col("cnt") * col("ry") * col("ry")).as("syy"))
        .select(col("n_docs"), col("sx"), col("sy"), col("sxy"),
          col("sxx"), col("syy"),
          when(expr("""(cast(n_docs as double) * cast(sxx as double)
                - cast(sx as double) * cast(sx as double))
              * (cast(n_docs as double) * cast(syy as double)
                - cast(sy as double) * cast(sy as double))""")
              <= lit(0.0), lit(0L))
            .otherwise(floor(
              expr("""(cast(n_docs as double) * cast(sxy as double)
                  - cast(sx as double) * cast(sy as double))
                / sqrt((cast(n_docs as double) * cast(sxx as double)
                    - cast(sx as double) * cast(sx as double))
                  * (cast(n_docs as double) * cast(syy as double)
                    - cast(sy as double) * cast(sy as double)))""")
                * lit(1e6) + lit(0.5)).cast("long"))
            .as("rho_micro"))
    }),

    "q_text_stats" -> ((s, d) =>
      TextAnalysis.withQuality(documents(s, d), col("text"))
        .select(col("doc_id"), col("n_tokens"),
          col("n_chars_m").cast("long").as("n_chars_m"),
          col("avg_token_len"), col("stopword_ratio"),
          col("punct_count").cast("long").as("punct_count"))),

    "q_lang_id" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))),

    // Language-ID quality evaluation: confusion matrix of the dataset's
    // lang label vs the marker-argmax prediction — the accuracy view a
    // pipeline checks before trusting the classifier for filtering.
    // Pure per-row scoring + a tiny (labels × labels) aggregation.
    "q_lang_eval" -> ((s, d) =>
      documents(s, d)
        .select(col("lang"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))),

    // Deterministic train/val/test assignment (90/5/5 by md5 bucket —
    // stable across runs, engines, and corpus growth: a doc's split
    // never depends on what else is in the corpus) with per-split
    // per-source composition.
    "q_dataset_split" -> ((s, d) =>
      documents(s, d)
        .withColumn("bucket",
          conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
            .cast("int"))
        .withColumn("split",
          when(col("bucket") < 230, "train")
            .when(col("bucket") < 243, "val").otherwise("test"))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"))),

    // corpus quality filter — the end-cap of the text-analysis pipeline:
    // keep docs passing the length / stopword / punctuation gates
    "q_quality_filter" -> ((s, d) =>
      TextAnalysis.withQuality(documents(s, d), col("text"))
        .filter(col("n_tokens") >= 5 && col("stopword_ratio") <= 0.5 &&
          col("punct_count") <= 50)
        .select(col("doc_id"))),

    // Training-window chunking: each doc split into max-16-token
    // chunks on a stride of 12 (4-token overlap — the sliding-context
    // prep for long documents; seq-packing is the complementary op for
    // SHORT ones). Narrow generate over the token array, no shuffle;
    // chunk text verified by digest so the whole rewrite is checked.
    "q_doc_chunks" -> ((s, d) => {
      val maxTok = 16; val stride = 12
      parallelize(documents(s, d))
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("tk"),
          explode(sequence(lit(0L), expr(
            s"greatest((size(tk) - $maxTok + $stride - 1) div $stride, 0)")))
            .as("c"))
        .select(col("doc_id"), col("c").cast("int").as("chunk_idx"),
          size(slice(col("tk"), (col("c") * stride + 1).cast("int"),
            lit(maxTok))).as("n_tokens"),
          md5(array_join(slice(col("tk"),
            (col("c") * stride + 1).cast("int"), lit(maxTok)), " "))
            .as("chunk_md5"))
    }),

    // Hive-style partitioned corpus layout: curated docs written
    // partitionBy(lang, source), read back with a partition-key filter
    // that must prune at PLANNING time (PartitionFilters in the scan,
    // pinned by PlanAuditSpec) — the layout decision that turns a
    // 100 TB full scan into a directory listing. Values verified
    // against the unpartitioned source of truth.
    "q_partitioned_prune" -> ((s, d) => {
      val path = System.getProperty("java.io.tmpdir") +
        "/graft_part_" + d.replaceAll("[^a-zA-Z0-9]", "_")
      // layout written once per (JVM, source dir): the operator under
      // test is the planning-time PRUNE, and the one-time layout cost
      // amortizing across queries is the production economics (the
      // q_bucketed_join pattern). The memo is JVM-scoped — NOT a
      // filesystem marker — so a regenerated source dataset is
      // re-laid-out by the next session instead of silently serving
      // the stale layout
      // completion barrier, not just a claim: the first caller installs
      // a latch and writes; a concurrent caller that loses the
      // putIfAbsent race awaits the latch instead of reading a layout
      // still being written. A woken waiter re-checks the memo — a
      // FAILED writer removes its entry before counting down, and the
      // waiter then re-enters the loop to retry the write itself
      // (rather than failing its query on a missing/half-written path);
      // a fresh in-progress latch from a racing retry is awaited, not
      // read through.
      var done = false
      while (!done) {
        val gate = new java.util.concurrent.CountDownLatch(1)
        val prior = writtenLayouts.putIfAbsent(path, gate)
        if (prior == null)
          try {
            documents(s, d)
              .select(col("doc_id"), col("n_chars"), col("lang"),
                col("source"))
              // repartition on the partition columns BEFORE partitionBy:
              // one task owns each (lang, source) directory, so the
              // layout is one file per partition instead of tasks ×
              // partitions small files — the 100 TB small-files guard
              .repartition(col("lang"), col("source"))
              .write.mode("overwrite").partitionBy("lang", "source")
              .parquet(path)
            gate.countDown()
            done = true
          } catch { case e: Throwable =>
            writtenLayouts.remove(path) // failed write must not memoize
            gate.countDown() // waiters wake, see no memo, and retry
            throw e
          }
        else {
          prior.await()
          val cur = writtenLayouts.get(path)
          done = cur != null && cur.getCount == 0
        }
      }
      s.read.parquet(path)
        .filter(col("lang") === "en")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars_total"))
    }),

    // Per-source length-distribution quantiles — the curation report
    // shape. EXACT percentiles (linear interpolation at rank p·(n−1),
    // the definition DuckDB's quantile_cont shares), not approximate:
    // Spark's percentile aggregate buffers a value→count map, so its
    // state is bounded by the number of DISTINCT lengths per source —
    // a few thousand — not by rows; that bound is what makes exact
    // quantiles affordable at 100 TB for integer-domain columns.
    "q_length_quantiles" -> ((s, d) =>
      documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          r(expr("percentile(n_chars, 0.5)"), 6).as("median_chars"),
          r(expr("percentile(n_chars, 0.9)"), 6).as("p90_chars"),
          max(col("n_chars")).as("max_chars"))),

    // Sampled quantiles from a mergeable bottom-k-by-hash sketch — the
    // 100 TB distribution report when even q_length_quantiles' bounded
    // value→count percentile state is too wide (float domains,
    // high-cardinality value columns): a deterministic uniform
    // k-sample per group ([[graft.functions.HashSampleExpr]]) rides
    // the aggregation layer's partial/merge machinery — k pairs per
    // map-side partial, one exchange, no window sort, no join-back —
    // and the estimate interpolates the sorted sample at rank p·(m−1),
    // the same formula as the exact report, so it converges to
    // q_length_quantiles as k → group size. The sample is the k
    // smallest DISTINCT (hash, value) pairs (set semantics in both
    // engines), so the result is a pure function of the input set;
    // exact columns ride along for the est-vs-exact comparison (like
    // q_kmv_distinct's), and the rank arithmetic is forced to double
    // on both sides so even the estimates hash-match bit-for-bit.
    "q_sample_quantiles" -> ((s, d) => {
      val k = 64
      def est(p: Double) = {
        val pos = s"cast($p AS double) * (size(vs) - 1)"
        expr(s"cast(element_at(vs, cast(floor($pos) AS int) + 1) AS double)" +
          s" * (1.0 - ($pos - floor($pos))) + " +
          s"cast(element_at(vs, cast(ceil($pos) AS int) + 1) AS double)" +
          s" * ($pos - floor($pos))")
      }
      documents(s, d)
        .select(col("source"),
          conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
            .cast("long").as("h"),
          col("n_chars").cast("long").as("v"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          graft.functions.HashSampleExpr.sample(col("h"), col("v"), k)
            .as("vs"),
          r(expr("percentile(v, 0.5)"), 6).as("median_exact"),
          r(expr("percentile(v, 0.9)"), 6).as("p90_exact"))
        .select(col("source"), col("n_docs"),
          size(col("vs")).cast("long").as("m"),
          r(est(0.5), 6).as("median_est"),
          r(est(0.9), 6).as("p90_est"),
          col("median_exact"), col("p90_exact"))
    }),

    // Gopher-style composite quality gate (Rae et al. 2021 §A1.1-style
    // rule battery): token-count bounds, mean-word-length bounds,
    // minimum stopword evidence, and a distinct-token repetition floor,
    // each reported as a bit in fail_bits so curation can attribute
    // drops per rule. Every compare is integer-exact (lengths cross-
    // multiplied, never divided) — no float boundary can flip a bit
    // between engines. Pure per-row scan work; nothing shuffles.
    "q_gopher_filter" -> ((s, d) => {
      val st = graft.functions.TextExprs.tokenStats(col("text"))
      val nTok = st.getField("n_tok").cast("long")
      // chars in words = total chars minus the n-1 separating spaces
      val wordChars = (length(col("text")) - (nTok - 1)).cast("long")
      val stopHits = graft.functions.TextExprs
        .tokenSetCount(col("text"), TextAnalysis.Stopwords).cast("long")
      val nDistinct = st.getField("n_distinct").cast("long")
      val bTok = when(nTok < 20 || nTok > 1000, 1L).otherwise(0L)
      val bLen = when(wordChars < nTok * 3 || wordChars > nTok * 10, 1L)
        .otherwise(0L)
      val bStop = when(stopHits < 2, 1L).otherwise(0L)
      val bRep = when(nDistinct * 10 < nTok * 3, 1L).otherwise(0L)
      parallelize(documents(s, d))
        .select(col("doc_id"), nTok.as("n_tokens"), stopHits.as("stop_hits"),
          nDistinct.as("n_distinct"),
          (bTok + bLen * 2 + bStop * 4 + bRep * 8).as("fail_bits"))
        .withColumn("keep", col("fail_bits") === 0L)
    }),

    "q_fingerprint" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))),

    // Model-based quality score: a fixed-weight logistic scorer over the
    // withQuality features — the shape of a fastText/linear quality
    // classifier's inference pass (training is out of scope; the weights
    // stand in for a trained model). Pure scan+project, no shuffle; the
    // features are pre-rounded so both engines score identical inputs.
    // Matthews correlation coefficient at the 0.5 threshold — the
    // single-number classifier summary that closes the eval battery
    // (AUC ranks, PR sweeps, ECE calibrates, Brier decomposes, kappa
    // agrees; MCC is the balanced ±1 correlation the others don't
    // give). One pass over the cached scoredLabeledDocs memo folds
    // the exact 2×2; MCC computes in doubles FROM exact longs with
    // the oracle-identical tree (each factor cast before multiplying
    // — the long product would overflow), zero-denominator → 0.
    "q_mcc" -> ((s, d) => {
      val pred = col("qm") >= 500000L
      scoredLabeledDocs(s, d)
        .agg(sum(when(pred && col("pos") === 1L, 1L).otherwise(0L))
            .as("tp"),
          sum(when(pred && col("pos") === 0L, 1L).otherwise(0L))
            .as("fp"),
          sum(when(!pred && col("pos") === 1L, 1L).otherwise(0L))
            .as("fn"),
          sum(when(!pred && col("pos") === 0L, 1L).otherwise(0L))
            .as("tn"))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          expr("(tp + tn) * 1000000L div (tp + fp + fn + tn)")
            .as("acc_micro"),
          expr("""CASE WHEN (cast(tp + fp as double)
                * cast(tp + fn as double) * cast(tn + fp as double)
                * cast(tn + fn as double)) <= 0.0 THEN 0L
              ELSE cast(floor((cast(tp as double) * cast(tn as double)
                  - cast(fp as double) * cast(fn as double))
                / sqrt(cast(tp + fp as double) * cast(tp + fn as double)
                  * cast(tn + fp as double) * cast(tn + fn as double))
                * 1000000.0 + 0.5) as long) END""").as("mcc_micro"))
    }),

    // Dunning log-likelihood-ratio (G²) collocations — the
    // significance-weighted companion to q_pmi_bigrams (PMI over-
    // rewards rare pairs; G² scales with evidence mass, which is why
    // collocation pipelines rank by it). Everything reads the
    // memoized bigram transition table: marginals are table-internal
    // rollups, the 2×2 cell terms obs·ln(obs/exp) integerize to
    // micro-nats per cell BEFORE the ×2 sum (the q_ngram_lm recipe;
    // empty cells contribute exactly 0), top-20 via TakeOrdered.
    "q_llr_colloc" -> ((s, d) => {
      val cnt = bigramCounts(s, d)
      val c1 = cnt.groupBy(col("a")).agg(sum(col("cab")).as("ca"))
      val c2 = cnt.groupBy(col("b")).agg(sum(col("cab")).as("cb"))
      val tot = cnt.agg(sum(col("cab")).as("n"))
      def cell(obs: String, row: String, colm: String): String =
        s"""CASE WHEN ($obs) > 0 THEN ($obs) * cast(floor(
           |  ln(cast($obs as double) * cast(n as double)
           |    / (cast($row as double) * cast($colm as double)))
           |  * 1000000.0 + 0.5) as long) ELSE 0L END""".stripMargin
      cnt.join(c1, "a").join(c2, "b").crossJoin(tot)
        .select(col("a"), col("b"), col("cab"),
          col("ca"), col("cb"), col("n"),
          expr(s"2 * (${cell("cab", "ca", "cb")} + ${cell(
              "ca - cab", "ca", "n - cb")} + ${cell(
              "cb - cab", "n - ca", "cb")} + ${cell(
              "n - ca - cb + cab", "n - ca", "n - cb")})")
            .as("g2_micro"))
        .orderBy(col("g2_micro").desc, col("a"), col("b"))
        .limit(20)
        .select(col("a"), col("b"), col("cab"), col("g2_micro"))
    }),

    // Poisson-bootstrap confidence interval for the mean document
    // length — THE distributed resampling pattern: a classical
    // bootstrap resamples n rows WITH replacement per replicate
    // (impossible to coordinate across executors); the Poisson
    // approximation gives every row an independent Poisson(1) weight
    // per replicate, which is embarrassingly parallel and what
    // production systems actually run. Determinism discipline:
    // "random" is the row's own md5((doc_id, replicate-block)) split
    // into four 32-bit dyadic uniforms (exact in double) pushed
    // through the unrolled inverse Poisson CDF — the threshold
    // literals are the IDENTICAL text on both engines, so every draw
    // bit-for-bit and every retry/engine reproduces the same CI. Per
    // replicate the weighted sums are exact longs; the 100 replicate
    // means collect (bounded by construction) and the percentile
    // endpoints read driver-side.
    "q_bootstrap_ci" -> ((s, d) => {
      // the whole replicate fan-out stays INSIDE the row: 25 md5s per
      // document (4 draws per 32-hex digest), the 100-weight array
      // built by codegen'd HOFs, and the cross-row fold done by the
      // native element-wise VecSumLong aggregate — a 100-long row per
      // partition reaches the exchange, there is NO 100× row explode
      // (measured: explode forms 0.88–1.3 s at sf0.1; this 0.35 s)
      // weights via the native byte-level kernel (law-pinned ≡ the
      // HOF form bootstrapWeightsHof, which the oracle mirrors): the
      // interpreted HOF chain cost ~0.5 s of per-draw substring+conv
      // at sf0.1; the kernel reads digest bytes directly
      val row = documents(s, d)
        .select(graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("x"),
          graft.functions.BootstrapWeightsExpr.bootstrapWeights(
            col("doc_id"), 25, poissonCuts).as("w"))
        .select(col("x"), col("w"),
          expr("transform(w, v -> v * x)").as("wx"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          graft.functions.VecSumLongExpr.vecSumLong(col("w")).as("sw"),
          graft.functions.VecSumLongExpr.vecSumLong(col("wx"))
            .as("swx"))
        .head() // bounded: one row of two 100-long arrays
      val n = row.getLong(0); val sx = row.getLong(1)
      val sw = row.getSeq[Long](2); val swx = row.getSeq[Long](3)
      // max(sw, 1): a replicate can draw all-zero Poisson weights with
      // probability e^-n — vanishing on any real corpus but a /0 crash
      // on a toy one; the guarded replicate degenerates to mean 0,
      // mirrored by greatest(sw, 1) in the oracle SQL
      val means =
        sw.indices.map(i => swx(i) * 1000000L / math.max(sw(i), 1L)).sorted
      s.createDataFrame(Seq((n, sx * 1000000L / n,
          means(4), means(95), means.length.toLong)))
        .toDF("n_docs", "mean_micro", "ci_lo_micro", "ci_hi_micro",
          "n_replicates")
    }),

    // Laplace-noised per-source counts — a DETERMINISTIC seeded-noise
    // release DEMO, NOT differential privacy: the noise is a pure
    // function of the public source name (md5(source) uniform through
    // the inverse Laplace CDF −sign(u−½)·ln(1−2|u−½|)), so adjacent
    // datasets receive identical, fully predictable noise and the
    // mechanism carries NO formal privacy guarantee (a real DP release
    // would draw from a secret per-release seed — and forfeit the
    // cross-engine testability this suite requires). What the query
    // demonstrates is the noised-release PLUMBING: the inverse-CDF
    // shape, micro integerization, and the bounded per-source rollup
    // that keeps the release one row per source at any corpus size.
    "q_dp_counts" -> ((s, d) =>
      documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .select(col("source"), col("n_docs"),
          (expr("""cast(conv(substring(md5(source), 1, 12), 16, 10)
            as bigint)""").cast("double") /
            lit(281474976710656.0)).as("u"))
        .select(col("source"), col("n_docs"),
          floor(expr("""CASE WHEN u < 0.5
              THEN ln(1.0 - 2.0 * (0.5 - u))
              ELSE -ln(1.0 - 2.0 * (u - 0.5)) END""")
            * lit(1e6) + lit(0.5)).cast("long").as("lap_micro"))
        .select(col("source"), col("n_docs"), col("lap_micro"),
          (col("n_docs") * lit(1000000L) + col("lap_micro"))
            .as("noisy_micro"))),

    // Split-conformal prediction threshold — the distribution-free
    // calibration step a filtering pipeline runs before trusting a
    // score cutoff: over the calibration set (Gopher-kept documents),
    // q̂ = the ⌈(n+1)(1−α)⌉-th smallest nonconformity score
    // (α = 0.1), guaranteeing ≥ 90 % coverage with NO distribution
    // assumption. The exact order statistic is found by two-level
    // bucket refinement — the scale-true distributed pattern: one
    // rollup to ≤1001 milli-buckets (bounded BY CONSTRUCTION: the
    // score domain is [0, 10⁶] micro), locate the rank-k bucket
    // driver-side, one filtered rollup of that bucket's ≤1000 exact
    // values, then a final coverage count. Three cheap passes over
    // the cached scoredLabeledDocs memo; no sort, no single-partition
    // window, no corpus-sized collect at any corpus size.
    "q_conformal" -> ((s, d) => {
      val cal = scoredLabeledDocs(s, d).filter(col("pos") === 1L)
        .select((lit(1000000L) - col("qm")).as("sc"))
      val buckets = cal.groupBy(expr("sc div 1000").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .collect() // bounded: <= 1001 rows by score-domain construction
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val n = buckets.map(_._2).sum
      // clamp k ≤ n: for a tiny calibration set ⌈(n+1)·0.9⌉ can exceed
      // n, and the bucket scan would silently never satisfy acc+c ≥ k,
      // reporting a bogus qhat = 0; clamping yields the rank-n (max
      // score) threshold — the conformal keep-all convention — and the
      // oracle mirrors with least(..., count(*))
      val k = math.min(math.ceil((n + 1) * 0.9).toLong, n)
      var acc = 0L; var bSel = 0L; var before = 0L
      buckets.foreach { case (b, c) =>
        if (acc < k && acc + c >= k) { bSel = b; before = acc }
        acc += c
      }
      val inB = cal.filter(expr(s"sc div 1000 = ${bSel}L"))
        .groupBy(col("sc")).agg(count(lit(1)).as("c"))
        .collect() // bounded: <= 1000 distinct micro values
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var acc2 = before; var qhat = 0L; var found = false
      inB.foreach { case (v, c) =>
        acc2 += c
        if (!found && acc2 >= k) { qhat = v; found = true }
      }
      val nCov = cal.filter(col("sc") <= qhat).count()
      s.createDataFrame(Seq((n, k, qhat, nCov, nCov * 1000000L / n)))
        .toDF("n_cal", "k", "qhat_micro", "n_covered", "coverage_micro")
    }),

    // Rendezvous (highest-random-weight) shard assignment — the
    // coordination-free placement a distributed ingest layer uses:
    // every row independently hashes against each shard id and takes
    // the argmax, so assignment needs no directory, survives any
    // partitioning, and — the property that makes it the right tool —
    // adding a shard moves ONLY the rows that rendezvous-prefer the
    // new shard (expected 1/(n+1)), each moving TO it. Computed
    // per-row as one array expression (48-bit md5 weights packed with
    // the shard id, integer max — no explode, no shuffle before the
    // per-shard rollup); the query reports the 16-shard census, the
    // outflow under a 17th shard, and a `bad_moves` violation count
    // the oracle hash PINS at zero (any row that moved anywhere but
    // shard 16 would flip it).
    "q_shard_assign" -> ((s, d) => {
      // r14: the 16-shard weight vector is a PREFIX of the 17-shard
      // one, so the packed weights materialize once per row and both
      // argmaxes read the same array (array_max of the 16-slice ≡ the
      // old assign(16) value by construction) — 17 md5s per row
      // instead of 33; oracle SQL unchanged, hash-gated.
      val weights = expr(
        """transform(sequence(0, 16, 1),
          |  s -> cast(conv(substring(md5(concat(
          |    cast(doc_id as string), '#', cast(s as string))),
          |    1, 12), 16, 10) as bigint) * 32L + s)""".stripMargin)
      documents(s, d)
        .select(col("doc_id"), weights.as("w"))
        .select(pmod(array_max(slice(col("w"), 1, 16)), lit(32L))
            .as("shard"),
          pmod(array_max(col("w")), lit(32L)).as("a17"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("shard") =!= col("a17"), 1L).otherwise(0L))
            .as("moved_out"),
          sum(when(col("shard") =!= col("a17") &&
            col("a17") =!= 16L, 1L).otherwise(0L)).as("bad_moves"))
    }),

    // Curriculum ordering: rank documents by the quality score WITHIN
    // each source and interleave the per-source heads round-robin —
    // the "start training on the best of every source" batch order.
    // The rank window partitions by source (corpus-distributed, never
    // single-partition); the emitted head is rank ≤ 5 per source, a
    // |sources|·5-row result whose (rank, source) pair IS the global
    // curriculum position. Scores integerize to micro before ranking
    // (float order ties are engine hazards); doc_id breaks ties.
    "q_curriculum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val q = r(lit(1.0) / (lit(1.0) + exp(-(lit(-1.5)
        + col("n_tokens").cast("double") * lit(0.002)
        + col("stopword_ratio") * lit(2.0)
        - col("punct_count").cast("double") * lit(0.01)
        + col("avg_token_len") * lit(0.1)))), 6)
      val win = Window.partitionBy(col("source"))
        .orderBy(col("qm").desc, col("doc_id"))
      TextAnalysis.withQuality(parallelize(documents(s, d)), col("text"))
        .select(col("source"), col("doc_id"),
          floor(q * 1e6 + lit(0.5)).cast("long").as("qm"))
        .withColumn("rk", row_number().over(win).cast("long"))
        .filter(col("rk") <= 5L)
        .select(col("rk"), col("source"), col("doc_id"), col("qm"))
    }),

    // Seeded token-dropout augmentation — the deterministic
    // data-augmentation primitive (every engine and every retry must
    // produce the SAME augmented corpus, so "random" is a hash of
    // (doc_id, position), never rand()): drop every token whose
    // 16-bit md5 draw lands in the 1/5 bucket. One pure per-row array
    // expression (filter-with-index HOF — no explode, no shuffle, no
    // state); the full augmented text is in the output, so the oracle
    // hash certifies every kept token and separator.
    "q_token_dropout" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          split(col("text"), " ").as("tk"))
        .select(col("doc_id"), size(col("tk")).cast("long")
          .as("n_tokens"),
          expr("""filter(tk, (t, i) -> cast(conv(substring(md5(
            concat(cast(doc_id as string), ':',
              cast(i + 1 as string))), 1, 4), 16, 10) as int)
            % 5 != 0)""").as("kept"))
        .select(col("doc_id"), col("n_tokens"),
          size(col("kept")).cast("long").as("n_kept"),
          array_join(col("kept"), " ").as("aug_text"))),

    "q_quality_score" -> ((s, d) =>
      TextAnalysis.withQuality(documents(s, d), col("text"))
        .select(col("doc_id"),
          r(lit(1.0) / (lit(1.0) + exp(-(lit(-1.5)
            + col("n_tokens").cast("double") * lit(0.002)
            + col("stopword_ratio") * lit(2.0)
            - col("punct_count").cast("double") * lit(0.01)
            + col("avg_token_len") * lit(0.1)))), 6).as("q_score"))),

    // Calibration report for the quality scorer: is a 0.8-scoring doc
    // actually kept 80% of the time? "Gold" = the Gopher gate outcome
    // (the rule-based reference the model-based scorer approximates),
    // 10 confidence buckets, per-bucket mean confidence vs empirical
    // keep rate, and the Expected Calibration Error
    // ECE = Σ_b (n_b/N)·|acc_b − conf_b|. Both the score and the gate
    // fold in the SAME scan row (no join — one corpus pass to a 10-row
    // aggregate); conf sums are exact BIGINT micro (the score is
    // 6-rounded, so ×10⁶ is integral), the per-bucket gap
    // |n_pos·10⁶ − Σq_micro| is an exact long, and the bucket frame is
    // 10 rows BY CONSTRUCTION — the rate/ECE arithmetic runs
    // driver-side on the collect (the heaps-curve precedent).
    "q_ece_calibration" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val nTok = size(toks).cast("long")
      val wordChars = (length(col("text")) - (nTok - 1)).cast("long")
      val stopHits = graft.functions.TextExprs
        .tokenSetCount(col("text"), TextAnalysis.Stopwords).cast("long")
      val nDistinct = size(array_distinct(toks)).cast("long")
      val keep = !(nTok < 20 || nTok > 1000) &&
        !(wordChars < nTok * 3 || wordChars > nTok * 10) &&
        stopHits >= 2 && nDistinct * 10 >= nTok * 3
      val q = r(lit(1.0) / (lit(1.0) + exp(-(lit(-1.5)
        + col("n_tokens").cast("double") * lit(0.002)
        + col("stopword_ratio") * lit(2.0)
        - col("punct_count").cast("double") * lit(0.01)
        + col("avg_token_len") * lit(0.1)))), 6)
      val buckets = TextAnalysis
        .withQuality(parallelize(documents(s, d)), col("text"))
        .select(least(lit(9), floor(q * 10).cast("int")).as("bucket"),
          floor(q * 1e6 + lit(0.5)).cast("long").as("qm"),
          when(keep, 1L).otherwise(0L).as("pos"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("qm")).as("sum_q"),
          sum(col("pos")).as("n_pos"))
        .collect()
        .map(rr => (rr.getInt(0), rr.getLong(1), rr.getLong(2),
          rr.getLong(3)))
        .sortBy(_._1)
      val nn = buckets.map(_._2).sum
      val num = buckets.map { case (_, _, sq, np) =>
        math.abs(np * 1000000L - sq)
      }.sum
      val ece = math.floor(
        num.toDouble / nn.toDouble / 1e6 * 1e6 + 0.5) / 1e6
      s.createDataFrame(buckets.toSeq.map { case (b, n, sq, np) =>
        (b, n, np,
          math.floor(sq.toDouble / n.toDouble / 1e6 * 1e6 + 0.5) / 1e6,
          math.floor(np.toDouble / n.toDouble * 1e6 + 0.5) / 1e6,
          ece)
      }).toDF("bucket", "n", "n_pos", "conf", "acc", "ece")
    }),

    // Chi-square term selection against the Gopher gate: which
    // vocabulary terms discriminate kept from dropped documents (the
    // classic feature-selection pass before training a quality/lang
    // classifier). One tokenize pass: per doc the DISTINCT terms
    // explode with the doc's label, fold to a vocabulary-sized
    // (term → df, kept-df) table (the zipf/tfidf exchange shape — the
    // corpus token stream never shuffles), rare terms (df<5) drop,
    // and χ² computes in doubles FROM exact longs with the identical
    // IEEE tree as the oracle (totals arrive via the 1-row broadcast
    // scalar join; zero denominator → 0 by convention). Top-20 by
    // (χ², term) plans as TakeOrderedAndProject — never a global
    // sort of the vocabulary.
    "q_chi2_terms" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val nTok = size(toks).cast("long")
      val wordChars = (length(col("text")) - (nTok - 1)).cast("long")
      val stopHits = graft.functions.TextExprs
        .tokenSetCount(col("text"), TextAnalysis.Stopwords).cast("long")
      val nDistinct = size(array_distinct(toks)).cast("long")
      val keep = !(nTok < 20 || nTok > 1000) &&
        !(wordChars < nTok * 3 || wordChars > nTok * 10) &&
        stopHits >= 2 && nDistinct * 10 >= nTok * 3
      val counts = parallelize(documents(s, d))
        .select(when(keep, 1L).otherwise(0L).as("pos"),
          explode(array_distinct(toks)).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("dfc"), sum(col("pos")).as("n1"))
        .filter(col("dfc") >= 5L)
      // totals ride the eval family's cached scored scan — no second
      // corpus pass for two scalars
      val totals = scoredLabeledDocs(s, d)
        .agg(count(lit(1)).as("nn"), sum(col("pos")).as("pp"))
      def d2(c: Column) = c.cast("double")
      val a = d2(col("n1"))
      val b = d2(col("dfc") - col("n1"))
      val c0 = d2(col("pp")) - a
      val e = d2(col("nn") - col("pp")) - b
      val den = (a + b) * (c0 + e) * (a + c0) * (b + e)
      val num = d2(col("nn")) * (a * e - b * c0) * (a * e - b * c0)
      counts.crossJoin(broadcast(totals))
        .select(col("term"), col("n1").as("n11"),
          (col("dfc") - col("n1")).as("n10"),
          when(den === lit(0.0), lit(0.0))
            .otherwise(r(num / den, 4)).as("chi2"))
        .orderBy(col("chi2").desc, col("term")).limit(20)
    }),

    // Isotonic (PAV) calibration of the quality scorer over the ECE
    // report's 10 confidence buckets: the monotone-regression map
    // production rankers apply on top of a miscalibrated score. The
    // corpus folds to the SAME 10-row bucket aggregate as
    // q_ece_calibration (one pass over the eval family's cached
    // scored scan); the pool-adjacent-violators fit then runs
    // driver-side on the bounded collect via the exact minimax
    // characterization fitted_i = max_{j≤i} min_{k≥i} rate(j..k),
    // with every interval rate integer-rounded to micros BEFORE the
    // min/max — the whole fit is Long arithmetic, bit-equal to the
    // oracle's triple-join SQL form of the same formula at any
    // corpus size.
    "q_isotonic_calibration" -> ((s, d) => {
      val buckets = scoredLabeledDocs(s, d)
        .groupBy(expr("least(9L, qm div 100000)").as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .sortBy(_._1)
      def ratioMicro(num: Long, den: Long): Long =
        (2 * num * 1000000L + den) / (2 * den)
      val m = buckets.length
      val cn = buckets.scanLeft(0L)(_ + _._2).tail
      val cp = buckets.scanLeft(0L)(_ + _._3).tail
      def rate(j: Int, k: Int): Long = // inclusive bucket positions
        ratioMicro(cp(k) - (if (j == 0) 0L else cp(j - 1)),
          cn(k) - (if (j == 0) 0L else cn(j - 1)))
      val out = buckets.indices.map { i =>
        val (b, n, np) = buckets(i)
        val fitted = (0 to i).map { j =>
          (i until m).map(k => rate(j, k)).min
        }.max
        (b, n, np, ratioMicro(np, n).toDouble / 1e6,
          fitted.toDouble / 1e6)
      }
      s.createDataFrame(out).toDF("bucket", "n", "n_pos", "raw", "fitted")
    }),

    // Population-Stability-Index drift report over the event stream:
    // split the stream at its time midpoint, histogram `value` into
    // 10 equal-width bins (integer-cents edges — exact on both
    // engines), and PSI = Σ_b (p_a−p_b)·ln(p_a/p_b) with Laplace
    // smoothing — the standard "did the input distribution move"
    // check a pipeline runs between ingestion snapshots. One corpus
    // pass to a ≤10-row (bucket × era) aggregate (the min/max scalars
    // arrive via the 1-row broadcast join); the bucket spine is
    // generated 0..9 so empty bins still contribute their smoothed
    // term; each bucket term is nano-integerized from the identical
    // IEEE double tree before the exact long total. Scale: the only
    // corpus work is two scans folding to scalars/10 rows — the PSI
    // arithmetic is value-domain-sized at any event volume.
    "q_psi_drift" -> ((s, d) => {
      val counts = psiBucketCounts(s, d)
      // the (bucket, era) table is ≤10 rows BY CONSTRUCTION — the
      // spine fill, Laplace terms and total finish driver-side on the
      // bounded collect (the ECE/heaps precedent; the in-frame tail
      // was measured as ~4 extra 10-row stages, 0.78 s vs 0.34 s)
      val got = counts.collect()
        .map(x => x.getLong(0).toInt -> (x.getLong(1), x.getLong(2)))
        .toMap
      val nA = (0 until 10).map(b => got.get(b).map(_._1).getOrElse(0L))
      val nB = (0 until 10).map(b => got.get(b).map(_._2).getOrElse(0L))
      // the smoothing/ln arithmetic is SHARED with the streaming
      // drift monitor (ops.Drift) — batch report ≡ drained monitor
      // is pinned by DriftMonitorSpec
      val (terms, psi) = graft.ops.Drift.psiNanoTerms(nA, nB)
      s.createDataFrame((0 until 10).map(b =>
        (b.toLong, nA(b), nB(b), terms(b), psi)))
        .toDF("bucket", "n_a", "n_b", "psi_nano", "psi")
    }),

    // Two-sample Kolmogorov–Smirnov drift test between the same two
    // event eras as q_psi_drift — the binning-free companion (PSI
    // depends on the 10-bin choice; KS is the sup-norm of the ECDF
    // gap over the raw value domain). One event pass folds to the
    // per-cents (value → era counts) table — bounded by the VALUE
    // DOMAIN (cents of a bounded sensor reading), not the event
    // count, so the cumulative window over distinct cents is a
    // bounded single-partition frame of the q_shuffle_order class at
    // any event volume. D is kept exact: per-cents ECDF gap in
    // integer micro units via integral division (cum·10⁶ div total,
    // overflow-safe to ~9·10¹² events per era), argmax via
    // TakeOrderedAndProject with the min-cents tie-break.
    "q_ks_test" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, d)
        .select(col("value"), unix_micros(col("ts")).as("e"))
      val cts = ev.agg(min(col("e")).as("emin"), max(col("e")).as("emax"))
      val counts = ev.crossJoin(broadcast(cts))
        .select(
          when(col("e") * 2 >= col("emin") + col("emax"), 1L)
            .otherwise(0L).as("era"),
          cents(col("value")).as("c"))
        .groupBy(col("c"))
        .agg(sum(when(col("era") === 0L, 1L).otherwise(0L)).as("ca"),
          sum(when(col("era") === 1L, 1L).otherwise(0L)).as("cb"))
      val w = Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = counts.agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
      counts
        .withColumn("cuma", sum(col("ca")).over(w))
        .withColumn("cumb", sum(col("cb")).over(w))
        .crossJoin(broadcast(tot))
        .select(col("c"), abs(
          expr("cuma * 1000000 div greatest(ta, 1L)") -
            expr("cumb * 1000000 div greatest(tb, 1L)")).as("ks_micro"),
          col("ta"), col("tb"))
        .orderBy(col("ks_micro").desc, col("c")).limit(1)
        .select(col("c").as("at_cents"), col("ks_micro"),
          col("ta").as("n_a"), col("tb").as("n_b"))
    }),

    // Benford first-digit conformance test over order totals — the
    // classic synthetic-/corrupted-batch detector a DQ suite runs on
    // money columns. Leading digit read off the DECIMAL STRING of the
    // floored total (exact on both engines; no runtime log10 — the
    // Benford probabilities are nano-integer literals shared with the
    // oracle verbatim). One orders pass folds map-side to the ≤9-row
    // digit table; the spine fill, expected masses and χ² terms
    // finish driver-side on the bounded collect (ECE/PSI pattern),
    // each term micro-floored from the identical IEEE tree before
    // the exact long total. n.toDouble is exact to 2⁵³ rows.
    "q_benford" -> ((s, d) => {
      val pNano = Array(301029996L, 176091259L, 124938737L, 96910013L,
        79181246L, 66946790L, 57991947L, 51152522L, 45757491L)
      val got = benfordDigitCounts(s, d).collect()
        .map(x => x.getLong(0).toInt -> x.getLong(1)).toMap
      val n = (1 to 9).map(dg => got.getOrElse(dg, 0L))
      val t = n.sum
      val rows = (0 until 9).map { i =>
        val e = t.toDouble * (pNano(i).toDouble / 1e9)
        val diff = n(i).toDouble - e
        ((i + 1).toLong, n(i),
          math.floor(e * 1e6 + 0.5).toLong,
          math.floor(diff * diff / e * 1e6 + 0.5).toLong)
      }
      val chi2 = math.floor(
        rows.map(_._4).sum.toDouble / 1e6 * 1e4 + 0.5) / 1e4
      s.createDataFrame(rows.map(x => (x._1, x._2, x._3, x._4, chi2)))
        .toDF("digit", "n_obs", "exp_micro", "chi2_micro", "chi2")
    }),

    // One-sided CUSUM change-point detection per event series — the
    // WHEN companion to the PSI/KS drift pair (those say whether the
    // distribution moved; CUSUM locates the shift). The textbook
    // recursion C_k = max(0, C_{k-1} + x_k − μ) has the closed form
    // C_k = S_k − min_{0≤j≤k} S_j with S the prefix sum of (x − μ)
    // and the virtual S_0 = 0 folded in via least(0, running min), so
    // it is TWO stock window passes (cumsum + running min) over one
    // sort — no driver recursion, exact integer cents end-to-end
    // (μ per series as integral division, both engines floor on the
    // nonnegative sums). Windows partition by event_type: the
    // per-series history class every time-series op here uses
    // (q_ewma/q_trend_slope disposition); one exchange + one sort,
    // then the per-series argmax folds in the SAME partitioning as a
    // lexicographic struct max — (cusum, −e) picks the peak with the
    // earliest-timestamp tie-break in one partial-aggregable pass, no
    // join-back (the join-back form re-ran the whole window chain:
    // 4 exchanges and two event scans vs 2 and one).
    "q_cusum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, d).select(col("event_type"),
        unix_micros(col("ts")).as("e"), col("event_id"),
        cents(col("value")).as("c"))
      val mu = ev.groupBy(col("event_type"))
        .agg(sum(col("c")).as("tc"), count(lit(1)).as("n"))
        .select(col("event_type"), expr("tc div n").as("mu"), col("n"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("e"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cus = ev.join(broadcast(mu), "event_type")
        .withColumn("s", sum(col("c") - col("mu")).over(w))
        .withColumn("cusum",
          col("s") - least(lit(0L), min(col("s")).over(w)))
      cus.groupBy(col("event_type"))
        .agg(max(struct(col("cusum"), (-col("e")).as("neg_e"))).as("m"),
          max(col("n")).as("n"))
        .select(col("event_type"), (-col("m.neg_e")).as("at_us"),
          col("m.cusum").as("max_cusum"), col("n"))
    }),

    // Autocorrelation function at lags 1..5 per event series — the
    // serial-dependence companion to q_cusum (CUSUM locates a level
    // shift; the ACF says whether the series is white or sticky).
    // Residuals use the SAME integral-division mean as q_cusum
    // (mu = Σc div n, exact cents), so every residual, product, and
    // sum is an exact long on both engines: dc ≤ 5·10⁴ cents ⇒
    // dc² ≤ 2.5·10⁹ and per-series sums stay under 10¹⁴ through
    // ~10⁹-row series — far past any test scale. One exchange + one
    // sort (the per-series window class of q_ewma/q_cusum) carries
    // all five lead() columns; the lag products then fold map-side in
    // the same pass (sum() skips the null tail rows, which is exactly
    // the i ≤ n−l summation bound). The final ratio is one IEEE
    // double division of two exact longs, micro-floored — identical
    // on both engines; a zero denominator (constant series) yields
    // NULL symmetrically.
    "q_acf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, d).select(col("event_type"),
        unix_micros(col("ts")).as("e"), col("event_id"),
        cents(col("value")).as("c"))
      val mu = ev.groupBy(col("event_type"))
        .agg(sum(col("c")).as("tc"), count(lit(1)).as("n"))
        .select(col("event_type"), expr("tc div n").as("mu"), col("n"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("e"), col("event_id"))
      val base = ev.join(broadcast(mu), "event_type")
        .withColumn("dc", col("c") - col("mu"))
      val withLeads = (1 to 5).foldLeft(base)((df, l) =>
        df.withColumn(s"d$l", lead(col("dc"), l).over(w)))
      val aggs = sum(col("dc") * col("dc")).as("den") +:
        (1 to 5).map(l => sum(col("dc") * col(s"d$l")).as(s"num$l"))
      withLeads.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"), aggs: _*)
        .select(col("event_type") +: col("n") +: (1 to 5).map(l =>
          when(col("den") > 0,
            floor(col(s"num$l").cast("double") / col("den").cast("double")
              * lit(1e6) + lit(0.5)).cast("long")).as(s"acf${l}_micro")): _*)
    }),

    // Cohen's kappa inter-labeler agreement per source: labeler A is
    // the Gopher rule gate, labeler B thresholds the logistic quality
    // model at 0.5 — the chance-corrected overlap a curation pipeline
    // reads before swapping one gate for the other. One pass over the
    // shared scoredLabeledDocs memo folds the 2×2 contingency map-side
    // (four CASE counters, source-keyed — the q_auc aggregation
    // class); kappa = (po − pe)/(1 − pe) is then pure arithmetic on
    // exact long counts, with both engines building the identical
    // IEEE double tree before the micro floor. Degenerate agreement
    // (pe = 1: both labelers constant) yields NULL symmetrically.
    "q_cohen_kappa" -> ((s, d) => {
      val agg = scoredLabeledDocs(s, d).groupBy(col("source")).agg(
        count(lit(1)).as("n"),
        sum(when(col("pos") === 1L && col("qm") >= 500000L, 1L)
          .otherwise(0L)).as("n11"),
        sum(when(col("pos") === 1L && col("qm") < 500000L, 1L)
          .otherwise(0L)).as("n10"),
        sum(when(col("pos") === 0L && col("qm") >= 500000L, 1L)
          .otherwise(0L)).as("n01"),
        sum(when(col("pos") === 0L && col("qm") < 500000L, 1L)
          .otherwise(0L)).as("n00"))
      def dbl(c: Column) = c.cast("double")
      val po = dbl(col("n11") + col("n00")) / dbl(col("n"))
      val pa = dbl(col("n11") + col("n10")) / dbl(col("n"))
      val pb = dbl(col("n11") + col("n01")) / dbl(col("n"))
      val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
      agg.select(col("source"), col("n"), col("n11"), col("n10"),
        col("n01"), col("n00"),
        when(lit(1.0) - pe > 0,
          floor((po - pe) / (lit(1.0) - pe) * lit(1e6) + lit(0.5))
            .cast("long")).as("kappa_micro"))
    }),

    // Murphy (1973) Brier-score decomposition per source over the same
    // 10 calibration bins as q_ece_calibration: total Brier plus its
    // reliability / resolution / uncertainty parts — the diagnostic
    // that says whether a bad Brier is miscalibration (reliability) or
    // an undiscriminating model (low resolution). The corpus pass
    // folds to ≤10 rows per source map-side (counts + qm/pos sums +
    // the exact squared-error mass Σ(qm − pos·10⁶)², a long through
    // ~10⁶ docs/source per the q_chi2 integerization discipline); the
    // per-bin reliability/resolution terms nk·(p̄ₖ−ōₖ)² are computed
    // as identical IEEE doubles from those longs and micro-floored
    // BEFORE the cross-bin sum, so the ≤10-term addition is exact
    // long arithmetic (the q_benford/q_chi2 recipe — never a
    // float sum whose order could differ). Note the binned identity
    // brier ≈ rel − res + unc holds only up to within-bin score
    // spread; the invariants spec pins the band.
    "q_brier" -> ((s, d) => {
      val binAgg = scoredLabeledDocs(s, d)
        .groupBy(col("source"),
          least(lit(9L), expr("qm div 100000")).as("bin"))
        .agg(count(lit(1)).as("nk"), sum(col("qm")).as("sp"),
          sum(col("pos")).as("so"),
          sum((col("qm") - col("pos") * lit(1000000L)) *
            (col("qm") - col("pos") * lit(1000000L))).as("sq"))
      val srcAgg = binAgg.groupBy(col("source"))
        .agg(sum(col("nk")).as("n"), sum(col("so")).as("npos"),
          sum(col("sq")).as("sqt"))
      def dbl(c: Column) = c.cast("double")
      val pbark = dbl(col("sp")) / (dbl(col("nk")) * lit(1e6))
      val obark = dbl(col("so")) / dbl(col("nk"))
      val obar = dbl(col("npos")) / dbl(col("n"))
      val relK = floor(dbl(col("nk")) * (pbark - obark) * (pbark - obark)
        * lit(1e6) + lit(0.5)).cast("long")
      val resK = floor(dbl(col("nk")) * (obark - obar) * (obark - obar)
        * lit(1e6) + lit(0.5)).cast("long")
      binAgg.join(broadcast(srcAgg), "source")
        .groupBy(col("source"))
        .agg(max(col("n")).as("n"), max(col("npos")).as("npos"),
          max(col("sqt")).as("sqt"),
          sum(relK).as("rel_mass"), sum(resK).as("res_mass"))
        .select(col("source"), col("n"),
          floor(dbl(col("sqt")) / (dbl(col("n")) * lit(1e12)) * lit(1e6)
            + lit(0.5)).cast("long").as("brier_micro"),
          expr("rel_mass div n").as("reliability_micro"),
          expr("res_mass div n").as("resolution_micro"),
          floor((dbl(col("npos")) / dbl(col("n"))) *
            (lit(1.0) - dbl(col("npos")) / dbl(col("n"))) * lit(1e6)
            + lit(0.5)).cast("long").as("uncertainty_micro"))
    }),

    // Rocchio pseudo-relevance-feedback query expansion: run the
    // shared BM25 ranker for the fixed query, take its top-10 as the
    // pseudo-relevant set, and rank the terms of those docs by
    // tf·idf mass (the relevance-feedback centroid, |R| constant
    // dropped) minus the original query terms — the classic
    // recall-widening step in a retrieval-driven curation loop. The
    // rel set is 10 ids (broadcast); its term table is a few hundred
    // rows; the only corpus-sized work is the document-frequency
    // rollup (vocabulary-sized exchange, the zipf/tfidf shape) that
    // the weight join probes with the broadcast rel-term side. idf is
    // the SAME BM25 idf (micro-integerized before the exact long
    // product) so expansion and ranker agree on term rarity.
    "q_rocchio_expand" -> ((s, d) => {
      val base = bm25Base(s, d)
      val dl = base.select(col("doc_id"), col("dl"))
      val st = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      val tfq = base.select(col("doc_id"), explode(col("hits")).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      val dfq = tfq.groupBy(col("t")).agg(count(lit(1)).as("df"))
      val rel = tfq.join(dl, "doc_id").join(broadcast(dfq), "t")
        .crossJoin(broadcast(st))
        .select(col("doc_id"), bm25TermMicro.as("sm"))
        .groupBy(col("doc_id")).agg(sum(col("sm")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id")).limit(10)
        .select(col("doc_id"))
      val relTf = parallelize(documents(s, d))
        .join(broadcast(rel), "doc_id")
        .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("rtf"))
        .filter(!col("t").isin(Bm25Terms: _*))
      // df rollup SEMI-FILTERED below the aggregation (r11): only the
      // expansion candidates — the few hundred terms of the 10
      // pseudo-relevant docs — matter downstream, so the broadcast
      // rel-term probe sits between the explode and the groupBy and
      // the exchange carries candidate terms only, not the full
      // vocabulary. Inner-join ≡ the old agg-then-join (same term
      // set); at 100 TB this is the difference between a
      // vocabulary-sized and a query-sized df exchange.
      val dfRel = parallelize(documents(s, d))
        .select(explode(array_distinct(TextAnalysis.tokens(col("text"))))
          .as("t"))
        .join(broadcast(relTf), "t")
        .groupBy(col("t"), col("rtf")).agg(count(lit(1)).as("df"))
      val idf = log(((col("n_docs") - col("df")).cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)) + lit(1.0))
      dfRel.crossJoin(broadcast(st))
        .select(col("t").as("term"), col("rtf"), col("df"),
          (floor(idf * 1e6 + lit(0.5)).cast("long") * col("rtf"))
            .as("w_micro"))
        .orderBy(col("w_micro").desc, col("term")).limit(15)
    }),

    // k-NN graph diagnostics over the embedding corpus: assign every
    // vector to its IVF cell (the q_ann_ivf coarse quantizer — cells
    // ∝ n, never all-pairs), draw each vector's top-3 cosine
    // neighbors WITHIN its cell through the TopKPerKey bounded-heap
    // operator, and report the in-degree histogram plus the mutual
    // (reciprocated) edge count — the hub/asymmetry diagnostics read
    // before SemDeDup-style graph pruning. The within-cell pair join
    // is the q_semdedup shape (cell-equi join off one materialized
    // assignment — O(Σ cell²), bounded by the quantizer); in-degrees
    // fold vector-wise; the mutual count is an edge-table self-join
    // on the reversed key. Similarities are 4-rounded before ranking
    // (both engines rank identical doubles; ties break by neighbor
    // id).
    "q_knn_graph" -> ((s, d) => {
      val mat = knnAssignment(s, d)
      // the edge table feeds three consumers (in-degree rollup and
      // both sides of the mutual self-join): a per-execution stage
      // barrier computes TopKPerKey once, not three times
      val edges = knnEdgesPlan(mat).localCheckpoint(false)
      val inDeg = mat.select(col("vec_id"))
        .join(edges.groupBy(col("ib")).agg(count(lit(1)).as("ind")),
          col("vec_id") === col("ib"), "left")
        .select(coalesce(col("ind"), lit(0L)).as("in_deg"))
        .groupBy(col("in_deg")).agg(count(lit(1)).as("n_vecs"))
      val mutual = edges.as("x")
        .join(edges.as("y"), col("x.ia") === col("y.ib") &&
          col("x.ib") === col("y.ia"))
        .filter(col("x.ia") < col("x.ib"))
        .agg(count(lit(1)).as("mutual_pairs"))
      inDeg.crossJoin(broadcast(mutual))
    }),

    // Ranking power of the quality scorer per source: tie-aware
    // Mann–Whitney AUC against the Gopher gate ("does the model rank
    // kept docs above dropped ones, source by source" — the
    // threshold-free companion to q_ece_calibration's calibration
    // view). Exact throughout: rows fold to (source, distinct-score)
    // groups first (≤10⁶+1 groups per source by construction — the
    // score is 6-rounded), the negatives-below prefix runs as a window
    // PARTITIONED BY source (never a global single-partition sort),
    // and 2·U accumulates in BIGINT: 2U = Σ_g [2·p_g·negBelow_g +
    // p_g·neg_g] (whole wins count double, ties count once). The
    // final AUC = U/(P·N) is integer-rounded to micros as
    // (2U·10⁶ + P·N) div (2·P·N) — no float enters until the last
    // cast, so the compare is exact at any corpus size. A source with
    // only one class present has undefined AUC → 0.5 by convention
    // (both engines, same CASE).
    "q_auc" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val g = scoredLabeledDocs(s, d)
        .groupBy(col("source"), col("qm"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
      val w = Window.partitionBy(col("source")).orderBy(col("qm"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val perSrc = g
        .withColumn("nb",
          coalesce(sum(col("n") - col("p")).over(w), lit(0L)))
        .groupBy(col("source"))
        .agg(sum(col("p")).as("n_pos"),
          sum(col("n") - col("p")).as("n_neg"),
          sum(col("p") * 2L * col("nb")
            + col("p") * (col("n") - col("p"))).as("u2"))
      perSrc.select(col("source"), col("n_pos"), col("n_neg"), col("u2"),
        (when(col("n_pos") === 0L || col("n_neg") === 0L, lit(500000L))
          .otherwise(expr(
            "(u2 * 1000000 + n_pos * n_neg) div (2 * n_pos * n_neg)"))
          .cast("double") / lit(1e6)).as("auc"))
    }),

    // Precision/recall/F1 sweep of the quality scorer over the nine
    // decile thresholds — the operating-point companion to q_auc. One
    // corpus pass: each (qm, pos) row fans out to the 9 fixed
    // thresholds (a bounded 9× map-side explode whose partial
    // aggregates collapse to 9 rows BEFORE the exchange — the only
    // shuffle is 9 rows of counters per partition at any corpus
    // size). All counts are exact longs; each ratio is
    // integer-rounded to micros as (2·num·10⁶ + den) div (2·den)
    // with a den=0 guard (empty predicted-positive or gold-positive
    // set → 0 by convention on both engines).
    "q_pr_curve" -> ((s, d) => {
      val pred = col("qm") >= col("t") * 100000L
      val cnt = scoredLabeledDocs(s, d)
        .select(col("qm"), col("pos"),
          explode(sequence(lit(1L), lit(9L))).as("t"))
        .groupBy(col("t"))
        .agg(sum(when(pred && col("pos") === 1L, 1L).otherwise(0L))
            .as("tp"),
          sum(when(pred && col("pos") === 0L, 1L).otherwise(0L))
            .as("fp"),
          sum(when(!pred && col("pos") === 1L, 1L).otherwise(0L))
            .as("fn"))
      def ratioMicro(num: String, den: String): Column =
        when(expr(den) === 0L, lit(0L))
          .otherwise(expr(s"(2 * ($num) * 1000000 + ($den)) " +
            s"div (2 * ($den))"))
          .cast("double") / lit(1e6)
      cnt.select(col("t"), col("tp"), col("fp"), col("fn"),
        ratioMicro("tp", "tp + fp").as("prec"),
        ratioMicro("tp", "tp + fn").as("recall"),
        ratioMicro("2 * tp", "2 * tp + fp + fn").as("f1"))
    }),

    // Welch two-sample t-test on the quality score between every
    // source pair — "are these two sources drawn from the same
    // quality distribution" (the parametric companion to
    // q_source_divergence's distributional JSD). The corpus folds to
    // ONE |sources|-row moment table (n, Σqm, Σqm² — map-side
    // combinable exact longs; Σqm² ≤ 10¹²·n so the sum is overflow-
    // safe past the ×100 decade); that table is ≤|sources| rows AT
    // ANY CORPUS SIZE (the source list is the mixture design's
    // hand-curated set), so the pair expansion runs driver-side on
    // the bounded collect (the q_source_divergence precedent — a
    // self-join formulation was measured and replaced: it either
    // re-scans the corpus on both sides or needs a checkpoint whose
    // truncated lineage dies on block loss). Mean/variance/t/df
    // compute in doubles FROM exact integers with the identical IEEE
    // expression tree as the oracle (+,−,×,÷,sqrt are all correctly-
    // rounded IEEE ops, so the bits agree engine-to-engine; n·Σqm²
    // and (Σqm)² go through double BEFORE multiplying — the long
    // product would overflow at ~3·10⁵ rows per source). Sources
    // with n<2 have no sample variance and are excluded; zero pooled
    // variance → t=0, df=0 by convention on both engines.
    "q_welch_ttest" -> ((s, d) => {
      val stats = scoredLabeledDocs(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("qm")).as("s1"),
          sum(col("qm") * col("qm")).as("s2"))
        .filter(col("n") >= 2L)
        .collect() // bounded: one row per curated source
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
          x.getLong(3)))
        .sortBy(_._1)
      def rd(x: Double, p: Int): Double = {
        val m = math.pow(10, p); math.floor(x * m + 0.5) / m
      }
      val out = for {
        i <- stats.indices; j <- (i + 1) until stats.length
      } yield {
        val (srcA, na, s1a, s2a) = stats(i)
        val (srcB, nb, s1b, s2b) = stats(j)
        val (nad, nbd) = (na.toDouble, nb.toDouble)
        val va = (nad * s2a.toDouble - s1a.toDouble * s1a.toDouble) /
          (nad * (nad - 1.0))
        val vb = (nbd * s2b.toDouble - s1b.toDouble * s1b.toDouble) /
          (nbd * (nbd - 1.0))
        val se2 = va / nad + vb / nbd
        val md = s1a.toDouble / nad - s1b.toDouble / nbd
        val t = if (se2 <= 0.0) 0.0 else md / math.sqrt(se2)
        val df = if (se2 <= 0.0) 0.0
          else se2 * se2 / ((va / nad) * (va / nad) / (nad - 1.0) +
            (vb / nbd) * (vb / nbd) / (nbd - 1.0))
        (srcA, srcB, na, nb, rd(s1a.toDouble / nad / 1e6, 6),
          rd(s1b.toDouble / nbd / 1e6, 6), rd(t, 6), rd(df, 4))
      }
      s.createDataFrame(out).toDF("src_a", "src_b", "n_a", "n_b",
        "mean_a", "mean_b", "t_stat", "df")
    }),

    // Fleiss' kappa over the Gopher filter's four clauses treated as
    // four binary raters — "do the quality gates agree beyond
    // chance", the agreement diagnostic a curation pipeline runs
    // before trusting a composite filter (near-zero kappa means the
    // clauses fire independently; high kappa means they're redundant).
    // One corpus pass folds each document to its keep-vote count
    // x ∈ {0..4}; everything downstream is the 5-row histogram (exact
    // long masses: T = Σx·n_x, S2 = Σn_x·(x² + (4−x)²)), the scalar
    // totals ride the 1-row broadcast cross join, and kappa computes
    // in doubles FROM exact longs with the identical IEEE tree as the
    // oracle. Degenerate P_e = 1 (all votes unanimous one way) yields
    // kappa 0 by convention on both engines.
    "q_fleiss_kappa" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val nTok = size(toks).cast("long")
      val wordChars = (length(col("text")) - (nTok - 1)).cast("long")
      val stopHits = graft.functions.TextExprs
        .tokenSetCount(col("text"), TextAnalysis.Stopwords).cast("long")
      val nDistinct = size(array_distinct(toks)).cast("long")
      val g1 = when(nTok < 20 || nTok > 1000, 0L).otherwise(1L)
      val g2 = when(wordChars < nTok * 3 || wordChars > nTok * 10, 0L)
        .otherwise(1L)
      val g3 = when(stopHits < 2, 0L).otherwise(1L)
      val g4 = when(nDistinct * 10 < nTok * 3, 0L).otherwise(1L)
      val hist = parallelize(documents(s, d))
        .select((g1 + g2 + g3 + g4).as("x"))
        .groupBy(col("x")).agg(count(lit(1)).as("n_x"))
        .localCheckpoint(false) // 5 rows; 2 consumers (rows + totals)
      val tot = hist.agg(sum(col("n_x")).as("n_docs"),
        sum(col("x") * col("n_x")).as("t_keep"),
        sum(col("n_x") * (col("x") * col("x")
          + (lit(4L) - col("x")) * (lit(4L) - col("x")))).as("s2"))
      hist.crossJoin(tot)
        .select(col("x").as("keep_votes"), col("n_x"), col("n_docs"),
          expr("t_keep * 1000000L div (4 * n_docs)").as("p_keep_micro"),
          expr("""CASE WHEN 1.0 - (cast(t_keep as double)
                  / (4.0 * cast(n_docs as double))
                  * (cast(t_keep as double)
                    / (4.0 * cast(n_docs as double)))
                + (1.0 - cast(t_keep as double)
                    / (4.0 * cast(n_docs as double)))
                  * (1.0 - cast(t_keep as double)
                    / (4.0 * cast(n_docs as double)))) <= 0.0
              THEN 0L
              ELSE cast(floor(
                ((cast(s2 as double) - 4.0 * cast(n_docs as double))
                    / (12.0 * cast(n_docs as double))
                  - (cast(t_keep as double)
                      / (4.0 * cast(n_docs as double))
                      * (cast(t_keep as double)
                        / (4.0 * cast(n_docs as double)))
                    + (1.0 - cast(t_keep as double)
                        / (4.0 * cast(n_docs as double)))
                      * (1.0 - cast(t_keep as double)
                        / (4.0 * cast(n_docs as double)))))
                / (1.0 - (cast(t_keep as double)
                    / (4.0 * cast(n_docs as double))
                    * (cast(t_keep as double)
                      / (4.0 * cast(n_docs as double)))
                  + (1.0 - cast(t_keep as double)
                      / (4.0 * cast(n_docs as double)))
                    * (1.0 - cast(t_keep as double)
                      / (4.0 * cast(n_docs as double)))))
                * 1000000.0 + 0.5) as long) END""").as("kappa_micro"))
    }),

    // Cliff's delta between every source pair's length distributions
    // — the ordinal effect size that goes with q_kruskal's "is there
    // any difference" (how OFTEN is a longer than b, not by how
    // much). Exact dominance masses from the same bounded
    // (source, length, count) grid as q_wasserstein: wins =
    // Σ c_a(x)·below_b(x), ties = Σ c_a(x)·c_b(x), losses the
    // complement — all exact longs on the driver-side bounded collect
    // (the q_welch_ttest precedent), conserving wins+ties+losses =
    // n_a·n_b by construction. Only the final δ = (wins−losses)/n_an_b
    // is a double (inputs < 2⁵³, so exact), micro-rounded with the
    // identical tree as the oracle.
    "q_cliffs_delta" -> ((s, d) => {
      val grid = documents(s, d)
        .select(col("source"),
          graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("l"))
        .groupBy(col("source"), col("l")).agg(count(lit(1)).as("c"))
        .collect() // bounded: sources × capped length domain
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      val srcs = grid.map(_._1).distinct.sorted
      val dom = grid.map(_._2).distinct.sorted
      val byLen: Map[String, Map[Long, Long]] = srcs.map { src =>
        src -> grid.filter(_._1 == src).map(x => x._2 -> x._3).toMap
          .withDefaultValue(0L)
      }.toMap
      val cums: Map[String, Map[Long, Long]] = srcs.map { src =>
        var acc = 0L
        src -> dom.map { l => acc += byLen(src)(l); l -> acc }.toMap
      }.toMap
      val totals = srcs.map(src => src -> cums(src)(dom.last)).toMap
      val out = for {
        i <- srcs.indices; j <- (i + 1) until srcs.length
      } yield {
        val (sa, sb) = (srcs(i), srcs(j))
        val (na, nb) = (totals(sa), totals(sb))
        var (wins, ties) = (0L, 0L)
        dom.foreach { l =>
          val ca = byLen(sa)(l)
          wins += ca * (cums(sb)(l) - byLen(sb)(l))
          ties += ca * byLen(sb)(l)
        }
        val losses = na * nb - wins - ties
        val delta = (wins - losses).toDouble / (na.toDouble * nb.toDouble)
        (sa, sb, na, nb, wins, ties, losses,
          math.floor(delta * 1e6 + 0.5).toLong)
      }
      s.createDataFrame(out).toDF("src_a", "src_b", "n_a", "n_b",
        "wins", "ties", "losses", "delta_micro")
    }),

    // Cross-perplexity matrix: every source's bigram stream scored
    // under every OTHER source's add-1-smoothed bigram model —
    // H(a‖b) = Σ_xy c_a(xy)·(−ln p_b(y|x))/N_a, the "which sources
    // speak the same language" diagnostic behind mixture design (the
    // model-based sibling of q_source_divergence's distributional
    // JSD; rows where src_a = src_b are the self-entropy diagonal,
    // which should be each row's minimum). ONE corpus pass folds to
    // the per-source bigram grid — ≤ |sources|·V² rows AT ANY CORPUS
    // SIZE (the vocabulary is closed; a real pipeline caps V the same
    // way), so the |sources|² model sweep runs driver-side on the
    // bounded collect (the q_welch_ttest precedent — a distributed
    // explode×join formulation was measured at 1.1 s against this
    // 0.35 s: the dense V²·|sources|² expansion pays several stage
    // floors for a 400-row result). Per-bigram surprisal integerizes
    // to micro-nats BEFORE the exact long mass fold (the q_ngram_lm
    // recipe); h_cross_micro is an integral division.
    // Perf disposition (measured): sf0.1 ~0.58 s vs DuckDB 0.13 s is
    // the corpus-explode stage floor — the ratio INVERTS at the
    // decades (×10: 2.5 s vs 1.16 s; ×100: 11.9 s vs 14.4 s, Spark
    // FASTER) — the q_span_dedup KEEP pattern.
    "q_cross_perplexity" -> ((s, d) => {
      val grid = parallelize(documents(s, d))
        .select(col("source"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("source"), col("t"),
          explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
        .select(col("source"), element_at(col("t"), col("i")).as("x"),
          element_at(col("t"), col("i") + 1).as("y"))
        .groupBy(col("source"), col("x"), col("y"))
        .agg(count(lit(1)).as("c"))
        .collect() // bounded: |sources| × V² (closed vocabulary)
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3)))
      val srcs = grid.map(_._1).distinct.sorted
      // int-index the bigram and first-word domains once: the pair
      // sweep then runs |sources|²·|support| pure array arithmetic
      // (the boxed (String,String) map-lookup form cost ~0.2 s)
      val bigramId = grid.map(g => (g._2, g._3)).distinct
        .zipWithIndex.toMap
      val firstId = grid.map(_._2).distinct.zipWithIndex.toMap
      val vocab = (grid.map(_._2) ++ grid.map(_._3)).distinct.length
        .toLong
      val nBig = bigramId.size
      val bySrc: Map[String, Array[(Int, Int, Long)]] =
        grid.groupBy(_._1).map { case (src, xs) =>
          src -> xs.map(g =>
            (bigramId((g._2, g._3)), firstId(g._2), g._4)) }
      // per-source surprisal tables over the UNION support, micro-nat
      // integerized once: w[bigram] and the per-first-word counts
      val wTab: Map[String, Array[Long]] = srcs.map { src =>
        val cb = new Array[Long](nBig)
        val oc = new Array[Long](firstId.size)
        bySrc(src).foreach { case (bi, fi, c) =>
          cb(bi) = c; oc(fi) += c }
        val fiOf = new Array[Int](nBig)
        bigramId.foreach { case ((x0, _), bi) => fiOf(bi) = firstId(x0) }
        src -> Array.tabulate(nBig) { bi =>
          math.floor(-math.log((cb(bi) + 1).toDouble /
            (oc(fiOf(bi)) + vocab).toDouble) * 1e6 + 0.5).toLong }
      }.toMap
      val out = for (sa <- srcs; sb <- srcs) yield {
        val ga = bySrc(sa)
        val w = wTab(sb)
        var na = 0L; var mass = 0L; var i = 0
        while (i < ga.length) {
          val (bi, _, ca) = ga(i)
          na += ca; mass += ca * w(bi); i += 1
        }
        (sa, sb, na, mass / na)
      }
      s.createDataFrame(out)
        .toDF("src_a", "src_b", "n_bigrams", "h_cross_micro")
    }),

    // 1-D Wasserstein (earth-mover) distance between every source
    // pair's document-length distributions — the transport-metric
    // companion to q_welch_ttest's parametric t and
    // q_source_divergence's JSD: it sees SHAPE differences the moment
    // tests miss and keeps metric structure JSD lacks. W₁ in 1-D is
    // the exact integral of |F_a − F_b|: the corpus folds once to the
    // (source, length, count) grid (≤ |sources|·|length domain| rows
    // at any corpus size — document length is capped by construction),
    // the pair sweep runs driver-side on the bounded collect (the
    // q_welch_ttest precedent), and the CDF-difference mass
    // Σ|cum_a·n_b − cum_b·n_a|·gap is exact BigInt, so w1_micro is a
    // deterministic integral rounding (matching the oracle's HUGEINT
    // arithmetic bit-for-bit).
    "q_wasserstein" -> ((s, d) => {
      val grid = documents(s, d)
        .select(col("source"),
          graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("l"))
        .groupBy(col("source"), col("l")).agg(count(lit(1)).as("c"))
        .collect() // bounded: sources × capped length domain
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      val totals = grid.groupBy(_._1).map { case (src, xs) =>
        src -> xs.map(_._3).sum }
      val srcs = totals.keys.toSeq.sorted
      val dom = grid.map(_._2).distinct.sorted
      val gaps = dom.zip(dom.tail).map { case (l, nl) => l -> (nl - l) }
      val cums: Map[String, Map[Long, Long]] = srcs.map { src =>
        val byLen = grid.filter(_._1 == src)
          .map(x => x._2 -> x._3).toMap.withDefaultValue(0L)
        var acc = 0L
        src -> dom.map { l => acc += byLen(l); l -> acc }.toMap
      }.toMap
      val out = for {
        i <- srcs.indices; j <- (i + 1) until srcs.length
      } yield {
        val (sa, sb) = (srcs(i), srcs(j))
        val (na, nb) = (totals(sa), totals(sb))
        val mass = gaps.map { case (l, gap) =>
          BigInt((cums(sa)(l) * nb - cums(sb)(l) * na).abs) * gap
        }.sum
        val nab = BigInt(na) * nb
        val w1 = ((mass * 2000000 + nab) / (nab * 2)).toLong
        (sa, sb, na, nb, w1)
      }
      s.createDataFrame(out)
        .toDF("src_a", "src_b", "n_a", "n_b", "w1_micro")
    }),

    // Kruskal–Wallis rank test across ALL sources at once — "do any
    // of the sources differ in length distribution" (the k-sample,
    // rank-based sibling of the pairwise q_welch_ttest; valid without
    // normality). Tie-aware average ranks come from the same bounded
    // length-domain cumulative as q_spearman (doubled-rank integers;
    // the corpus never sees a rank window), per-source rank sums are
    // exact longs, and the H statistic folds driver-side over the
    // ≤|sources| collected rows in sorted order (the q_welch_ttest
    // bounded-collect precedent) with the identical IEEE tree as the
    // oracle's ordered list_reduce. Tie correction
    // C = 1 − Σ(t³−t)/(N³−N) from exact long tie masses; degenerate
    // C=0 (all lengths equal) yields hc=0 by convention on both
    // engines.
    "q_kruskal" -> ((s, d) => {
      // ONE corpus pass to the bounded (source, length, count) grid,
      // then ranks, rank sums, ties, and H all fold driver-side on
      // the collect (the q_welch_ttest / q_cliffs_delta precedent — a
      // window+join+three-action formulation was measured ~0.15 s
      // slower at sf0.1 purely in stage floors for the same rows)
      val grid = documents(s, d)
        .select(col("source"),
          graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("l"))
        .groupBy(col("source"), col("l")).agg(count(lit(1)).as("c"))
        .collect() // bounded: sources × capped length domain
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      val lt: Map[Long, Long] = grid.groupBy(_._2)
        .map { case (l, xs) => l -> xs.map(_._3).sum }
      val sortedL = lt.keys.toSeq.sorted
      val below: Map[Long, Long] = {
        var acc = 0L
        sortedL.map { l => val r = l -> acc; acc += lt(l); r }.toMap
      }
      val rg = grid.groupBy(_._1).map { case (src, xs) =>
        val ng = xs.map(_._3).sum
        val r2 = xs.map { case (_, l, c) =>
          c * (2L * below(l) + lt(l) + 1L) }.sum
        (src, ng, r2)
      }.toSeq.sortBy(_._1)
      val tieSum = lt.values.map(t => t * t * t - t).sum
      val n = rg.map(_._2).sum
      val nd = n.toDouble
      val sFold = rg.foldLeft(0.0) { case (acc, (_, ng, r2)) =>
        val half = r2.toDouble / 2.0
        acc + half * half / ng.toDouble
      }
      val h = 12.0 * sFold / (nd * (nd + 1.0)) - 3.0 * (nd + 1.0)
      val c = 1.0 - tieSum.toDouble / (nd * nd * nd - nd)
      val hc = if (c == 0.0) 0.0 else h / c
      def mic(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
      val out = rg.toSeq.map { case (src, ng, r2) =>
        (src, ng, r2, n, (rg.length - 1).toLong, tieSum, mic(h), mic(hc))
      }
      s.createDataFrame(out).toDF("source", "n_g", "rank2_sum",
        "n_total", "df", "tie_sum", "h_micro", "hc_micro")
    }),

    // Feature-hashing document embedder (the hashing trick): every
    // token hashes into one of 64 dims via md5 with a ±1 sign from the
    // next hex nibble — the classic sparse-featurization bridge from
    // text to the embedding pipeline. Integer components throughout
    // (exact on any engine); the output row is the verifiable summary
    // (component 0, nonzero dims, L2 norm) rather than the array —
    // array cells don't hash stably across engines. One explode + two
    // aggs; only (doc_id, dim) pairs shuffle, never tokens.
    "q_hash_embed" -> ((s, d) => {
      val comp = parallelize(documents(s, d))
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .select(col("doc_id"),
          (conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("int") % 64)
            .as("dim"),
          when(conv(substring(md5(col("tok")), 5, 1), 16, 10)
            .cast("int") % 2 === 0, 1L).otherwise(-1L).as("sgn"))
        .groupBy(col("doc_id"), col("dim"))
        .agg(sum(col("sgn")).as("comp"))
      comp.groupBy(col("doc_id"))
        .agg(sum(when(col("dim") === 0, col("comp")).otherwise(0L)).as("d0"),
          sum(when(col("comp") =!= 0, 1L).otherwise(0L)).as("nnz"),
          sum(col("comp") * col("comp")).as("ss"))
        .select(col("doc_id"), col("d0"), col("nnz"),
          r(sqrt(col("ss").cast("double")), 6).as("l2"))
    }),

    // Johnson–Lindenstrauss random projection of the embedding table
    // to k=4 dims with a deterministic ±1 matrix (sign = md5 parity
    // of the (dim, out-dim) pair — seedless, replay-stable on task
    // retry), plus the distortion report that validates it: pairwise
    // squared distances among a fixed 24-vector sample, original vs
    // projected/k, as micro ratios (JL: E‖y‖² = k·‖x‖² for ±1
    // matrices). Components integerized to exact micro longs BEFORE
    // any arithmetic, so projections and distances are exact integers
    // at every scale; the corpus-wide projection is pinned into the
    // hash via the (n_vecs, Σy²) checksum columns — energy
    // accumulates in DECIMAL(38,0) internally so the sum cannot
    // overflow at any corpus size, but is EMITTED as the BIGINT pair
    // (energy_hi, energy_lo) = (Σ div 10⁹, Σ mod 10⁹): decimal was
    // the suite's only decimal output column and the driver hasher
    // canonicalizes decimal differently between the Spark parquet
    // read and the DuckDB result (round-10 verdict — values were
    // bit-identical, only the representation hashed apart). hi/lo
    // longs stay exact up to 9.2·10²⁷ total energy, far beyond any
    // corpus. Scale: the whole projection is PER-ROW array
    // arithmetic (zip_with/aggregate HOFs against an inline
    // md5-parity sign vector — the explode→(vec_id,j) rollup form
    // paid a corpus-sized shuffle and re-ran the hash per component
    // copy: 0.79 s vs 0.30 s at sf0.1); the checksum folds map-side
    // to one row and the pair frame is sample²-bounded behind a
    // pushed vec_id filter.
    "q_jl_project" -> ((s, d) => {
      val embA = embeddings(s, d).select(col("vec_id"),
        expr("transform(cast(embedding AS array<double>), " +
          "x -> cast(floor(x * 1000000.0 + 0.5) AS bigint))").as("xm"))
      // r14: the ±1 sign matrix depends only on (i, j) — it used to be
      // rebuilt PER ROW as 4×dim interpreted md5+conv+substring lambda
      // calls (HOFs never reach codegen), the query's dominant per-row
      // cost. The identical values (sign = parity of the first 4 hex
      // chars of md5("i_j"), the construction the oracle SQL still
      // computes verbatim) are precomputed once driver-side into a
      // 256-entry literal and sliced to the row's dim; a >256-dim
      // embedding would zip_with null-pad → null output → loud oracle
      // mismatch, never a silent truncation (suite corpora are 64-dim).
      def yExpr(j: Int) = aggregate(
        zip_with(col("xm"),
          slice(typedLit(jlSignRow(j)), lit(1), size(col("xm"))),
          (x, sgn) => x * sgn),
        lit(0L), (acc, x) => acc + x)
      val proj = embA.select(col("vec_id"), col("xm"),
        yExpr(0).as("y0"), yExpr(1).as("y1"),
        yExpr(2).as("y2"), yExpr(3).as("y3"))
      val chk = proj.agg(count(lit(1)).as("n_vecs"),
        sum((col("y0") * col("y0") + col("y1") * col("y1") +
          col("y2") * col("y2") + col("y3") * col("y3"))
          .cast("decimal(38,0)")).as("energy"))
      val sv = proj.filter(col("vec_id") < 24)
      def sq(a: Column, b: Column) = (a - b) * (a - b)
      sv.as("a").join(sv.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
          expr("aggregate(zip_with(a.xm, b.xm, " +
            "(x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)")
            .as("d2_orig"),
          (sq(col("a.y0"), col("b.y0")) + sq(col("a.y1"), col("b.y1")) +
            sq(col("a.y2"), col("b.y2")) + sq(col("a.y3"), col("b.y3")))
            .as("d2_proj"))
        .crossJoin(broadcast(chk))
        .select(col("va"), col("vb"), col("d2_orig"), col("d2_proj"),
          floor(col("d2_proj").cast("double") /
            (greatest(col("d2_orig"), lit(1L)).cast("double") * lit(4.0)) *
            lit(1e6) + lit(0.5)).cast("long").as("dist_micro"),
          col("n_vecs"),
          expr("cast(energy div 1000000000 AS bigint)").as("energy_hi"),
          expr("cast(energy % 1000000000 AS bigint)").as("energy_lo"))
        // sample²-bounded frame (276 rows at 24 vectors): coalesce+sort
        // gives the deterministic order without orderBy's range-sampling
        // pass, which re-executed the corpus-wide projection upstream
        // (measured: orderBy ~1.0 s, this form ~0.3 s at sf0.1)
        .coalesce(1).sortWithinPartitions(col("va"), col("vb"))
    }),

    "q_rolling_fp" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        TextAnalysis.rollingFingerprint(col("text")).as("rfp"))),

    // token counting, both tokenizers: whitespace and the BPE-ish
    // boundary split (GPT-2-style pre-split family). The BPE count
    // equals the number of maximal same-class ([a-zA-Z0-9] vs not) runs,
    // which the oracle recomputes with regexp_extract_all.
    "q_token_count" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("n_ws"),
        // native run-count ≡ size(bpeTokens) (TextExprsSpec) — the regex
        // split + interpreted filter materializes every fragment just to
        // count them
        graft.functions.TextExprs.bpeTokenCount(col("text")).as("n_bpe"))),

    "q_token_hist" -> ((s, d) =>
      documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)),

    // Within-document repetition signals (the Gopher-rule family:
    // fraction of the doc covered by its most frequent bigram, distinct
    // -token ratio) — the per-doc quality gate that catches boilerplate
    // and degenerate repetition before training. Pure explode→two-level
    // agg: map-side partials, shuffles only (doc_id[, bigram]) keys.
    "q_doc_repetition" -> ((s, d) =>
      // every statistic here is per-document, and a document is one
      // row — the native one-pass repetition_stats kernel makes the
      // whole query a scan + project with ZERO shuffles (the previous
      // explode → two groupBys → join paid three). The explode form
      // survives as the equivalence cross-check in TextExprsSpec.
      parallelize(documents(s, d))
        .select(col("doc_id"),
          graft.functions.TextExprs.repetitionStats(col("text")).as("rs"))
        .filter(col("rs.n_tokens") >= 2)
        .select(col("doc_id"),
          col("rs.n_tokens").cast("long").as("n_tokens"),
          col("rs.n_bigrams").cast("long").as("n_bigrams"),
          col("rs.top_bigram").cast("long").as("top_bigram"),
          r(col("rs.top_bigram").cast("double") /
            col("rs.n_bigrams"), 6).as("rep_ratio"),
          r(col("rs.n_distinct").cast("double") /
            col("rs.n_tokens"), 6).as("distinct_ratio"))),

    // Per-source curation stats — the corpus-mix report a pretraining
    // pipeline balances against: volume, language spread, and the
    // exact-duplicate rate per source (dups identified globally by
    // min-id-per-text, the exactDuplicates construction). One window
    // over the text key + one agg by source.
    "q_domain_stats" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("text"))
      documents(s, d)
        .select(col("source"), col("lang"), col("n_chars"), col("doc_id"),
          col("text"))
        .withColumn("kept", min(col("doc_id")).over(w))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("chars_total"),
          sum(when(col("doc_id") =!= col("kept"), 1L).otherwise(0L))
            .as("n_dups"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          col("chars_total"), col("n_dups"),
          r(col("n_dups").cast("double") / col("n_docs"), 6)
            .as("dup_ratio"))
    }),

    // Per-document top-5 TF-IDF terms — the keyword/topic signal a
    // curation pipeline uses for domain tagging and near-topic
    // clustering. Ranked by the integer keys (tf desc, df asc, term)
    // so the ordering is exact on both engines; tfidf itself is
    // emitted 1e-6-rounded.
    "q_tfidf" -> ((s, d) => {
      val scored = TextAnalysis.tfidf(parallelize(documents(s, d)),
        col("doc_id"), col("text"))
      // top-5 terms per doc through the custom TopKPerKey physical
      // operator (bounded per-key heaps, one hash exchange) instead of
      // WindowExec's full partition sort; the (tf desc, df asc, term)
      // order is total within a doc, so the selected set is identical
      // to row_number() <= 5
      graft.plans.TopKPerKey(scored, Seq("doc_id"),
          Seq(("tf", true), ("df", false), ("term", false)), k = 5)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          r(col("tfidf"), 6).as("tfidf"))
    }),

    // Inverted index over the mid-frequency vocabulary (3 ≤ df ≤ 50):
    // token → sorted posting list. The df cap is the 100 TB guard —
    // head-of-vocabulary (stopword) postings grow with the corpus and
    // belong in segmented storage, not a single array cell.
    // (postings emitted comma-joined: the verify hash-compare keys on
    // every output column and array cells don't hash stably across
    // engines — InvertedIndexSpec covers the typed array form.)
    "q_inverted_index" -> ((s, d) =>
      TextAnalysis.invertedIndex(parallelize(documents(s, d)),
        col("doc_id"), col("text"), maxDf = Some(50))
        .filter(col("df").between(3, 50))
        .select(col("token"), col("df"),
          concat_ws(",", col("postings")).as("postings"))),

    // BM25 lexical ranking (Robertson/Lucene form, k1=1.2, b=0.75) for
    // a fixed term set — the retrieval scorer a data pipeline runs for
    // search-quality evals and hard-negative mining. Scale shape: the
    // token stream filters to QUERY TERMS at the scan (the per-doc-term
    // tf table is |hits|-sized, not corpus-sized), df and the corpus
    // stats are tiny broadcasts, and the final ranking is
    // TakeOrderedAndProject. Per-term scores are micro-integerized
    // BEFORE the per-doc sum (long adds are associative), so the hash
    // can't drift with aggregation order; the double expression inside
    // floor() is written operator-for-operator identically in the
    // oracle SQL.
    "q_bm25" -> ((s, d) => {
      val base = bm25Base(s, d)
      val dl = base.select(col("doc_id"), col("dl"))
      val st = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      val tf = base.select(col("doc_id"), explode(col("hits")).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      tf.join(dl, "doc_id").join(broadcast(df), "t").crossJoin(broadcast(st))
        .select(col("doc_id"), bm25TermMicro.as("sm"))
        .groupBy(col("doc_id")).agg(sum(col("sm")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(20)
    }),

    // Out-of-vocabulary rate per source against the corpus's own top-25
    // token vocabulary — the coverage check run before committing to a
    // tokenizer/vocab size. Two corpus passes over the token stream
    // (one to build the vocab — a token-keyed agg then
    // TakeOrderedAndProject — one to score against it), which beats
    // materializing a corpus-sized token table; the vocab joins back as
    // a broadcast, and the per-source rate is exact long floor-division.
    "q_oov_rate" -> ((s, d) => {
      def toks = parallelize(documents(s, d))
        .select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("t"))
      val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("t")).limit(25)
        .select(col("t"), lit(1).as("in_v"))
      toks.join(broadcast(vocab), Seq("t"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("source"), col("n_tokens"), col("n_oov"),
          expr("(n_oov * 1000000) div n_tokens").as("oov_micro"))
    }),

    // Weighted sampling without rand() (Efraimidis–Spirakis A-ES):
    // each doc draws its uniform u from its own md5 (the repo's
    // deterministic-sampling rule — a doc's draw never depends on the
    // rest of the corpus), and the selection key ln(u)/w with
    // w = n_chars makes inclusion probability proportional to weight.
    // Pure scan + TakeOrderedAndProject: no shuffle, no rng state, and
    // re-running on a grown corpus preserves every surviving doc's key.
    // ---- DSIR importance-resampling data selection ----------------------
    // Data Selection via Importance Resampling (Xie et al., NeurIPS'23):
    // score raw docs by how much their hashed-n-gram feature profile
    // looks like a TARGET domain, then keep the best per source. The
    // 100 TB shape: features are 256 hash buckets (md5-derived, both
    // engines bit-identical), so the distribution tables are
    // VALUE-DOMAIN-sized — ln runs on 256 rows only and is micro-nat
    // integerized there (the q_ngram_lm recipe), per-doc importance is
    // an exact BIGINT Σ c_doc(b)·lr_micro(b) via a 256-row broadcast
    // join, and the per-source selection is the custom TopKPerKey
    // operator (per-key heap + one hash exchange — never a global or
    // per-partition full sort). Target = the lexicographically-first
    // source (derived from data, no scale-pinned literal); Laplace
    // (+1)/(N+256) smoothing keeps every bucket finite.
    "q_dsir_select" -> ((s, d) => {
      val nb = 256
      val docs = parallelize(documents(s, d))
      val tok = docs
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w"))
        .withColumn("b", (conv(substring(md5(col("w")), 1, 8), 16, 10)
          .cast("long") % nb).cast("int"))
      val tgt = docs.agg(min(col("source")).as("tgt"))
      val bc = tok.crossJoin(broadcast(tgt)) // 1-row scalar attach
        .groupBy(col("b"))
        .agg(count(lit(1)).as("cr"),
          sum(when(col("source") === col("tgt"), 1L).otherwise(0L))
            .as("ct"))
      // totals are plain token counts — a scan-side aggregate (no
      // explode), so the bucket aggregation above runs exactly once
      // (deriving totals FROM bc would re-run the token pass under it)
      val nTok = graft.text.TextAnalysis.tokenCount(col("text")).cast("long")
      val tot = docs.crossJoin(broadcast(tgt))
        .agg(sum(nTok).as("nr"),
          sum(when(col("source") === col("tgt"), nTok).otherwise(0L))
            .as("nt"))
      val lr = bc.crossJoin(broadcast(tot)) // 256-row × 1-row scalar
        .select(col("b"), floor(
          log(((col("ct") + lit(1.0)) / (col("nt") + lit(nb.toDouble))) /
            ((col("cr") + lit(1.0)) / (col("nr") + lit(nb.toDouble)))) *
            lit(1e6) + lit(0.5)).cast("long").as("lr_micro"))
      val imp = tok.groupBy(col("doc_id"), col("source"), col("b"))
        .agg(count(lit(1)).as("c"))
        .join(broadcast(lr), "b")
        .groupBy(col("doc_id"), col("source"))
        .agg(sum(col("c") * col("lr_micro")).as("imp_micro"),
          sum(col("c")).as("n_tokens"))
      graft.plans.TopKPerKey(imp, keys = Seq("source"),
          order = Seq("imp_micro" -> true, "doc_id" -> false), k = 25)
        .select(col("source"), col("doc_id"), col("n_tokens"),
          col("imp_micro"))
    }),

    // Pre-mixing source-divergence matrix: pairwise Jensen-Shannon
    // divergence between per-source unigram distributions over the
    // SAME 256 md5-hashed feature buckets DSIR uses — "which sources
    // are interchangeable and which add diversity" is the
    // mixture-design companion to q_dsir_select's importance scores
    // and q_source_overlap's verbatim containment. ONE distributed
    // token pass → (source, bucket) counts; that table is ≤ 256×
    // |sources| rows AT ANY CORPUS SIZE (the buckets are fixed, the
    // source list is the mixture design's hand-curated set), so the
    // dense grid / Laplace smoothing / pairwise JSD run driver-side
    // on the collected array (the k×dim centroid precedent) — at
    // 100 TB the corpus pass is still the only distributed work and
    // the collect is still ≤ a few thousand fixed-width rows.
    // Arithmetic is the identical double tree the oracle runs
    // (Laplace p, ln ratio, per-bucket term nano-floored to BIGINT
    // before the pair sum) so the hash compare is exact. JSD is
    // symmetric, bounded by ln 2 — emitted once per unordered pair.
    "q_source_divergence" -> ((s, d) => {
      val nb = 256
      // bounded artifact: ≤ 256×|sources| (source, bucket, count) rows
      val rows = sourceBucketCounts(s, d, nb).collect()
      val bySrc = rows.groupBy(_.getString(0)).map { case (src, rs) =>
        val c = new Array[Long](nb)
        rs.foreach(r => c(r.getInt(1)) = r.getLong(2))
        src -> c
      }
      val srcs = bySrc.keys.toArray.sorted
      // smoothed P per source — same (c + 1) / (n + 256) doubles the
      // distributed form produced
      val p = srcs.map { src =>
        val c = bySrc(src)
        val n = c.sum
        src -> c.map(ci => (ci + 1.0) / (n + nb.toDouble))
      }.toMap
      val out = for {
        i <- srcs.indices; j <- (i + 1) until srcs.length
      } yield {
        val (pa, pb) = (p(srcs(i)), p(srcs(j)))
        var jsdNano = 0L
        var b = 0
        while (b < nb) {
          val m = (pa(b) + pb(b)) / 2.0
          val term = 0.5 * pa(b) * math.log(pa(b) / m) +
            0.5 * pb(b) * math.log(pb(b) / m)
          jsdNano += math.floor(term * 1e9 + 0.5).toLong
          b += 1
        }
        val jsd = math.floor(jsdNano.toDouble / 1e9 * 1e6 + 0.5) / 1e6
        (srcs(i), srcs(j), jsdNano, jsd)
      }
      s.createDataFrame(out).toDF("src_a", "src_b", "jsd_nano", "jsd")
    }),

    "q_weighted_sample" -> ((s, d) => {
      val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("double") + lit(1.0)) / lit(4294967296.0)
      val key = log(u) / col("n_chars").cast("double")
      documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          floor(key * lit(1e9) + lit(0.5)).cast("long").as("key_nano"))
        .orderBy(col("key_nano").desc, col("doc_id"))
        .limit(10)
    }),

    // PageRank over the word co-occurrence graph — the iterative
    // graph-analytics shape (the dedup connected-components' sibling);
    // see pagerankRanks for the iteration + cache-lifecycle design.
    "q_pagerank" -> ((s, d) =>
      pagerankRanks(s, d)
        .select(col("node"), col("r").as("rank_pico"))
        .orderBy(col("rank_pico").desc, col("node"))
        .limit(10)),

    // HITS hubs/authorities over the DIRECTED bigram graph — see
    // hitsScores for the iteration/normalization design. Top-10
    // authorities with their hub scores.
    "q_hits" -> ((s, d) =>
      hitsScores(s, d)
        .select(col("node"), col("a").as("auth_micro"),
          col("h").as("hub_micro"))
        .orderBy(col("auth_micro").desc, col("node"))
        .limit(10)),

    // 4-hop BFS shortest distances over the co-occurrence graph — the
    // frontier-expansion iteration; see bfsDists for the superstep +
    // cache-lifecycle design.
    "q_bfs_hops" -> ((s, d) => bfsDists(s, d)),

    // Weighted single-source shortest paths (4-round Bellman–Ford)
    // over the directed bigram graph, weights = transition surprisal
    // in micro-nats — see ssspDists for the relaxation + memo design.
    "q_sssp" -> ((s, d) =>
      ssspDists(s, d).select(col("node"), col("dist").as("dist_micro"))),

    // Triangle counting + global clustering coefficient over the word
    // co-occurrence graph — the degree-ordered MapReduce algorithm
    // (Suri & Vassilvitskii, WWW'11): every edge is oriented from its
    // lower endpoint under the (degree, name) total order, which bounds
    // each node's out-degree by O(√m), so the wedge self-join is
    // O(m^1.5) worst-case instead of Σdeg² — THE property that keeps
    // the join alive on a power-law graph at 100 TB (the hub node's
    // wedges are generated by its low-degree neighbors, never by the
    // hub). Wedges from the lowest-ranked corner join back against the
    // oriented edge set; each triangle materializes exactly once. The
    // gcc is exact integer micros: 3·Δ·10⁶ div Σ C(deg,2).
    "q_triangles" -> ((s, d) => {
      val pairs = parallelize(documents(s, d))
        .select(split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("t"),
          explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
        .select(element_at(col("t"), col("i")).as("a"),
          element_at(col("t"), col("i") + 1).as("b"))
        .filter(col("a") =!= col("b"))
      val und = pairs
        .select(least(col("a"), col("b")).as("x"),
          greatest(col("a"), col("b")).as("y"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = und.select(col("x").as("v"))
        .union(und.select(col("y").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      // edges carrying both endpoint degrees, oriented low → high rank
      val ed = und
        .join(deg.select(col("v").as("x"), col("deg").as("dx")), "x")
        .join(deg.select(col("v").as("y"), col("deg").as("dy")), "y")
        .select(
          when(col("dx") < col("dy") ||
            (col("dx") === col("dy") && col("x") < col("y")),
            struct(col("x").as("src"), col("y").as("dst"),
              col("dy").as("dd")))
            .otherwise(struct(col("y").as("src"), col("x").as("dst"),
              col("dx").as("dd"))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.dd").as("dd"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // wedges at the lowest-ranked corner: (src)-(b), (src)-(c) with
      // b below c in the same total order → closing edge must be b→c
      val w1 = ed.select(col("src"), col("dst").as("b"), col("dd").as("db"))
      val w2 = ed.select(col("src"), col("dst").as("c"), col("dd").as("dc"))
      val tri = w1.join(w2, "src")
        .filter(col("db") < col("dc") ||
          (col("db") === col("dc") && col("b") < col("c")))
        .join(ed.select(col("src").as("b"), col("dst").as("c")),
          Seq("b", "c"), "left_semi")
        .agg(count(lit(1)).as("n_triangles"))
      val stats = deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
      val ne = und.agg(count(lit(1)).as("n_edges"))
      tri.crossJoin(broadcast(stats)).crossJoin(broadcast(ne))
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          // NULL (not an error) on a wedge-free graph: Spark's div
          // returns NULL at 0 but DuckDB's // raises, so both engines
          // guard explicitly
          when(col("n_wedges") > 0,
            expr("(3 * n_triangles * 1000000) div n_wedges"))
            .as("gcc_micro"))
    }),

    // Frequent 2-itemsets over per-doc word baskets (the A-Priori /
    // market-basket shape): each doc contributes its DISTINCT words,
    // pairs generate per-doc via an index-ordered self-explode — the
    // per-doc cost is bounded by per-basket vocabulary², the bound that
    // makes pair generation tractable at any corpus size (the corpus
    // scales in docs, not basket width). Pairs with support ≥ 5 report
    // exact support counts plus integer-micro lift
    // (support·N·10⁶ div (n_a·n_b)) — confidence/lift without floats.
    "q_itemsets" -> ((s, d) => {
      val minSup = 5L
      val baskets = parallelize(documents(s, d))
        .select(col("doc_id"),
          array_sort(array_distinct(split(col("text"), " "))).as("ws"))
      val singles = baskets
        .select(col("doc_id"), explode(col("ws")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
      // single-word baskets generate no pairs; without the guard
      // sequence(1, 0) yields the DESCENDING [1, 0] and the i=0 row
      // would hit element_at's 1-based index check (DuckDB's
      // range(1, 1) is empty, so the oracle needs no guard)
      val pairs = baskets.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), col("ws"),
          explode(sequence(lit(1), size(col("ws")) - 1)).as("i"))
        .select(col("doc_id"), col("ws"), col("i"),
          explode(expr("slice(ws, i + 1, size(ws) - i)")).as("b"))
        .select(col("doc_id"), element_at(col("ws"), col("i")).as("a"),
          col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSup)
      val tot = baskets.agg(count(lit(1)).as("n_docs"))
      // singles is VOCABULARY-sized — never force-broadcast it (the
      // q_span_dedup lesson); the support≥5 pairs side is small, so
      // AQE broadcasts whichever side actually fits at runtime
      pairs
        .join(singles.select(col("w").as("a"), col("n_w").as("n_a")), "a")
        .join(singles.select(col("w").as("b"), col("n_w").as("n_b")), "b")
        .crossJoin(broadcast(tot))
        .select(col("a"), col("b"), col("support"), col("n_a"),
          col("n_b"),
          expr("(support * n_docs * 1000000) div (n_a * n_b)")
            .as("lift_micro"))
    }),

    // Deterministic global training order — the epoch-shuffle every
    // training run needs, reproducible across reruns and resumable
    // mid-epoch: order = md5(doc_id), rank assigned WITHOUT a global
    // sort. Rows bucket by their digest's first byte (256 uniform
    // buckets); bucket row-counts prefix-sum on the 256-row table, and
    // each bucket ranks locally with its offset added — the same
    // two-level prefix decomposition as q_concurrency, applied to
    // row_number. A new shard appended to the corpus perturbs only its
    // own digests' neighborhoods, not every rank (vs. rand(): no seed
    // coordination, no replay divergence on task retry).
    "q_shuffle_order" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val keyed = documents(s, d)
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("k"))
        .withColumn("bucket",
          conv(substring(col("k"), 1, 2), 16, 10).cast("long"))
      val wb = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = keyed.groupBy(col("bucket"))
        .agg(count(lit(1)).as("bn"))
        .withColumn("offset", coalesce(sum(col("bn")).over(wb), lit(0L)))
        .select(col("bucket"), col("offset"))
      val wl = Window.partitionBy(col("bucket"))
        .orderBy(col("k"), col("doc_id"))
      keyed.join(broadcast(off), "bucket")
        .select(col("doc_id"), col("k"),
          (col("offset") + row_number().over(wl)).as("train_rank"))
    }),

    // 2D Pareto frontier (skyline) of documents under (n_chars ↑,
    // n_words ↑) — "longest AND most word-diverse" corpus picks. The
    // classic sort-scan skyline needs one global order; here it
    // decomposes by VALUE DOMAIN: rows group by exact x (n_chars), the
    // per-x max-y table (distinct-length-sized, bounded by the value
    // domain — not the corpus) takes one small window for the
    // strictly-greater-x prefix max, and each row then decides
    // dominance locally against (prefix_max_y, own-x max y). No
    // corpus-scale sort, no pairwise compare. The oracle is the NOT
    // EXISTS dominance SPEC — algorithm-independent, so the hash
    // proves the decomposition exhaustive.
    "q_skyline" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = parallelize(documents(s, d))
        .select(col("doc_id"), col("n_chars").as("x"),
          graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("y"))
      val perX = docs.groupBy(col("x")).agg(max(col("y")).as("maxy"))
      val wx = Window.orderBy(col("x").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val xTable = perX
        .withColumn("premax", coalesce(max(col("maxy")).over(wx),
          lit(Long.MinValue)))
      docs.join(broadcast(xTable), "x")
        .filter(!(col("premax") >= col("y")) &&
          !(col("maxy") > col("y")))
        .select(col("doc_id"), col("x").as("n_chars"),
          col("y").as("n_words"))
    }),

    // Mutual information between the source and lang columns — the
    // feature-selection / drift-detection staple: MI(X;Y) =
    // Σ (n_xy/N)·ln(N·n_xy/(n_x·n_y)). All counts are exact BIGINTs
    // from three aggregations (cells, marginals); only the final ln
    // runs in doubles, on the cells table (|sources|×|langs| rows —
    // value-domain-sized, never corpus-sized), rounded to 6dp like
    // every float the oracle hashes. Output is per-cell pointwise MI
    // plus exact counts, so the corpus-scale work is three shuffles of
    // grouping keys only.
    "q_mutual_info" -> ((s, d) => {
      val docs = documents(s, d)
      val cells = docs.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_xy"))
      val nx = docs.groupBy(col("source")).agg(count(lit(1)).as("n_x"))
      val ny = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_y"))
      val tot = docs.agg(count(lit(1)).as("n_tot"))
      cells.join(broadcast(nx), "source").join(broadcast(ny), "lang")
        .crossJoin(broadcast(tot))
        .select(col("source"), col("lang"), col("n_xy"), col("n_x"),
          col("n_y"),
          r(col("n_xy").cast("double") / col("n_tot") *
            log(col("n_tot").cast("double") * col("n_xy") /
              (col("n_x").cast("double") * col("n_y"))), 6)
            .as("pmi_contrib"))
    }),

    // Edit-distance≤1 similarity self-join over the corpus vocabulary
    // — FastSS deletion neighborhoods (Bocek et al. 2007): two words
    // are within one edit iff they share a member of their deletion-1
    // neighborhoods (the word itself + each single-char deletion), so
    // the candidate join keys on the md5 digest of the variant — a
    // fixed-width key, |w|+1 variants per word — and only candidates
    // pay the exact levenshtein verify. The quadratic all-pairs compare
    // never happens: at 100 TB the vocabulary is corpus-log-sized and
    // the variant join is the standard spell-correction blocking. The
    // oracle is the SPEC, not the algorithm: a direct levenshtein
    // cross-join in DuckDB — so the hash proves neighborhood
    // completeness (no missed pair) as well as the verify filter.
    "q_editdist_join" -> ((s, d) => {
      // the synthetic vocabulary has NO natural distance-≤1 pairs, so
      // the raw form proves only 0=0 against the oracle; seed a typo'd
      // twin (w || "q") per word — the q_url_canon synthesize-in-query
      // precedent — so the driver row witnesses real pairs at every sf
      // while the oracle still levenshtein-cross-joins the SAME
      // augmented vocabulary (pairs stay algorithm-independent)
      val base = parallelize(documents(s, d))
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0).distinct()
      val vocab = base.union(base.select(concat(col("w"), lit("q")).as("w")))
        .distinct()
      val vars = vocab
        .select(col("w"),
          explode(sequence(lit(0), length(col("w")))).as("i"))
        .select(col("w"), when(col("i") === 0, col("w"))
          .otherwise(expr("concat(substr(w, 1, i - 1), substr(w, i + 1))"))
          .as("v"))
        .select(col("w"), md5(col("v")).as("k")).distinct()
        .localCheckpoint(false)
      vars.select(col("k"), col("w").as("w1"))
        .join(vars.select(col("k"), col("w").as("w2"))
          .hint("shuffle_hash"), "k")
        .filter(col("w1") < col("w2"))
        .select(col("w1"), col("w2")).distinct()
        .filter(levenshtein(col("w1"), col("w2")) <= 1)
        .select(col("w1"), col("w2"),
          levenshtein(col("w1"), col("w2")).cast("long").as("dist"))
    }),

    // Small-file compaction planner (OPTIMIZE's bin-packing step): the
    // file manifest — here the per-(source, lang) shard sizes — is
    // sequentially coalesced into target-sized output bins by a
    // cumulative-sum window: bin = floor(bytes_before / target). The
    // window sorts the MANIFEST (thousands of rows at 100 TB), never
    // data; the plan is what a rewrite job then executes per bin. Next-
    // fit (not first-fit-decreasing) is deliberate: it preserves the
    // manifest's sort order, so a clustered table stays clustered
    // through compaction — the property Z-order layouts depend on.
    "q_compaction_plan" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val target = 8000L
      val files = documents(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(sum(col("n_chars")).as("bytes"), count(lit(1)).as("n_docs"))
      val w = Window.orderBy(col("source"), col("lang"))
      files
        .withColumn("cum", sum(col("bytes")).over(w))
        .withColumn("bin", expr(s"(cum - bytes) div $target"))
        .select(col("source"), col("lang"), col("n_docs"), col("bytes"),
          col("bin"))
    }),

    // Hybrid retrieval via reciprocal-rank fusion (RRF, Cormack et al.
    // 2009): the BM25 lexical ranking and the embedding-cosine
    // semantic ranking for the same query (doc/vec 0) fuse as
    // Σ 1/(60+rank) in exact integer micro units. Each ranker takes
    // its top-100 through TakeOrderedAndProject FIRST, so the global
    // row_number windows run on 100-row tables — never a corpus-wide
    // single-partition sort; the fusion join is a full outer over two
    // tiny rank tables.
    "q_rrf_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // One tokenize pass total, SHARED with q_bm25 via the session
      // memo: without the barrier each of the four consumers (dl
      // stats, tf, df, score join) re-ran the corpus scan + tokenize
      // (the r8 perf_weak finding).
      val base = bm25Base(s, d)
      val dl = base.select(col("doc_id"), col("dl"))
      val st = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      val tf = base.select(col("doc_id"), explode(col("hits")).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      val lexTop = tf.join(dl, "doc_id").join(broadcast(df), "t")
        .crossJoin(broadcast(st))
        .filter(col("doc_id") =!= 0)
        .select(col("doc_id"), bm25TermMicro.as("sm"))
        .groupBy(col("doc_id")).agg(sum(col("sm")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id")).limit(100)
      val lex = lexTop.withColumn("r_lex", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id"))))
        .select(col("doc_id"), col("r_lex"))
      val emb = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
      val semTop = emb.crossJoin(broadcast(qv)).filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          r(Similarity.cosine(col("v"), col("qv")), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(100)
      val sem = semTop.withColumn("r_sem", row_number().over(
        Window.orderBy(col("sim").desc, col("vec_id"))))
        .select(col("vec_id").as("doc_id"), col("r_sem"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(expr("1000000 div (60 + r_lex)"), lit(0L)) +
            coalesce(expr("1000000 div (60 + r_sem)"), lit(0L)))
            .cast("long").as("rrf_micro"),
          coalesce(col("r_lex"), lit(0)).cast("long").as("r_lex"),
          coalesce(col("r_sem"), lit(0)).cast("long").as("r_sem"))
        .orderBy(col("rrf_micro").desc, col("doc_id")).limit(10)
    }),

    // Ranking-quality eval: NDCG@10 per query term over the BM25
    // ranking, graded relevance = raw term frequency (the retrieval
    // eval companion to q_rrf_fusion — same shared bm25Base tokenize
    // pass, same exact-integer bm25TermMicro scores). Both the system
    // top-10 (by score) and the ideal top-10 (by relevance) prune
    // through the TopKPerKey physical operator — per-key bounded
    // heaps, so no corpus-wide sort and no window over an unbounded
    // partition; row_number ranks run AFTER the prune on ≤k rows per
    // term. Per-position gains rel/log2(rank+1) integerize to micro
    // units so each DCG is an exact long sum, and NDCG is one rounded
    // division of two longs.
    "q_ndcg" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.plans.TopKPerKey
      val base = bm25Base(s, d)
      val st = base.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("tot"))
      // tf folds IN the row (hits is already an in-row array and the
      // term list is a literal), carrying dl along — so unlike the
      // explode→groupBy shape there is NO corpus-wide exchange and no
      // dl join-back anywhere: the only shuffles in the whole query
      // are the 3-row df rollup and the (t, mode) prune
      val tf = base.select(col("doc_id"), col("dl"),
        explode(filter(transform(array(Bm25Terms.map(lit): _*),
          t => struct(t.as("t"),
            size(filter(col("hits"), h => h === t)).cast("long")
              .as("tf"))),
          e => e.getField("tf") > 0)).as("e"))
        .select(col("doc_id"), col("dl"),
          col("e.t").as("t"), col("e.tf").as("tf"))
      val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(df), "t").crossJoin(broadcast(st))
        .select(col("t"), col("doc_id"), col("tf"), bm25TermMicro.as("sm"))
      def gain: Column = floor(col("tf").cast("double") /
        log2(col("rk").cast("double") + lit(1.0)) * lit(1e6) + lit(0.5))
        .cast("long")
      // both rankings ride ONE prune/rank/aggregate pass: each scored
      // row explodes into (mode='sys', ord=score) and (mode='ideal',
      // ord=rel), so a single TopKPerKey keyed on (t, mode) prunes
      // both top-10s, one window ranks the |terms|×|modes|×k
      // survivors, and the two DCG sums split back out as conditional
      // aggregates — no second corpus pass, no dcg⋈idcg join
      val both = scored.select(col("t"), col("doc_id"), col("tf"),
        explode(array(
          struct(lit("sys").as("mode"), col("sm").as("ord")),
          struct(lit("ideal").as("mode"), col("tf").as("ord")))).as("e"))
        .select(col("t"), col("doc_id"), col("tf"),
          col("e.mode").as("mode"), col("e.ord").as("ord"))
      val ranked = TopKPerKey(both, Seq("t", "mode"),
          Seq(("ord", true), ("doc_id", false)), 10)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("t"), col("mode"))
            .orderBy(col("ord").desc, col("doc_id"))))
      ranked.groupBy(col("t"))
        .agg(sum(when(col("mode") === "sys", gain).otherwise(lit(0L)))
            .as("dcg_micro"),
          sum(when(col("mode") === "ideal", gain).otherwise(lit(0L)))
            .as("idcg_micro"))
        .select(col("t").as("term"), col("dcg_micro"), col("idcg_micro"),
          r(col("dcg_micro").cast("double") / col("idcg_micro"), 6)
            .as("ndcg"))
    }),

    // MRR@10 retrieval eval: reciprocal rank of the first RELEVANT doc
    // in each term's BM25 top-10, where relevant = "the doc contains
    // ALL query terms" (answers the whole query — deliberately not a
    // tf threshold, which BM25 trivially ranks first). Same shared
    // bm25Base pass and in-row tf as q_ndcg; the all-terms flag folds
    // IN the row off the hits array (zero extra exchanges), the top-10
    // prunes through TopKPerKey, the rank window runs on ≤10 rows per
    // term, and terms whose top-10 has no relevant doc report rr = 0.
    "q_mrr" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.plans.TopKPerKey
      val base = bm25Base(s, d)
      val st = base.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("tot"))
      val tf = base.select(col("doc_id"), col("dl"),
        size(array_distinct(col("hits"))).as("n_terms"),
        explode(filter(transform(array(Bm25Terms.map(lit): _*),
          t => struct(t.as("t"),
            size(filter(col("hits"), h => h === t)).cast("long")
              .as("tf"))),
          e => e.getField("tf") > 0)).as("e"))
        .select(col("doc_id"), col("dl"), col("n_terms"),
          col("e.t").as("t"), col("e.tf").as("tf"))
      val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(df), "t").crossJoin(broadcast(st))
        .select(col("t"), col("doc_id"),
          (col("n_terms") === Bm25Terms.length).as("rel"),
          bm25TermMicro.as("sm"))
      val ranked = TopKPerKey(scored, Seq("t"),
          Seq(("sm", true), ("doc_id", false)), 10)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("t"))
            .orderBy(col("sm").desc, col("doc_id"))))
      ranked.groupBy(col("t"))
        .agg(min(when(col("rel"), col("rk"))).cast("long")
          .as("first_rel_rank"))
        .select(col("t").as("term"),
          coalesce(col("first_rel_rank"), lit(0L)).as("first_rel_rank"),
          coalesce(r(lit(1.0) / col("first_rel_rank").cast("double"), 6),
            lit(0.0)).as("rr"))
    }),

    // Kendall rank correlation between the BM25 top-10 and the raw-tf
    // ordering of the SAME docs — "does the dl-normalized score change
    // the ranking" diagnostic for retrieval eval. The top-10 candidate
    // frame prunes through TopKPerKey off the shared bm25Base pass and
    // lands at a ≤|terms|×10-row localCheckpoint; the pairwise pass is
    // a self-join of that bounded frame (≤45 pairs per term — never
    // corpus-sized), ties excluded from both counts (tau-a on strict
    // agreements over all k(k-1)/2 pairs).
    "q_kendall_tau" -> ((s, d) => {
      import graft.plans.TopKPerKey
      val base = bm25Base(s, d)
      val st = base.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("tot"))
      val tf = base.select(col("doc_id"), col("dl"),
        explode(filter(transform(array(Bm25Terms.map(lit): _*),
          t => struct(t.as("t"),
            size(filter(col("hits"), h => h === t)).cast("long")
              .as("tf"))),
          e => e.getField("tf") > 0)).as("e"))
        .select(col("doc_id"), col("dl"),
          col("e.t").as("t"), col("e.tf").as("tf"))
      val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(df), "t").crossJoin(broadcast(st))
        .select(col("t"), col("doc_id"), col("tf"), bm25TermMicro.as("sm"))
      // bounded landing: ≤ |terms|×10 rows — the self-join below reads
      // it twice, and without the barrier each side re-runs the corpus
      // subtree (DataFrame DAGs don't share subplans)
      val top = TopKPerKey(scored, Seq("t"),
        Seq(("sm", true), ("doc_id", false)), 10).localCheckpoint(false)
      val a = top.select(col("t"), col("doc_id").as("ida"),
        col("tf").as("tfa"), col("sm").as("sma"))
      val b = top.select(col("t"), col("doc_id").as("idb"),
        col("tf").as("tfb"), col("sm").as("smb"))
      a.join(b, Seq("t")).filter(col("ida") < col("idb"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when((col("sma") > col("smb") && col("tfa") > col("tfb")) ||
              (col("sma") < col("smb") && col("tfa") < col("tfb")), 1L)
            .otherwise(0L)).as("n_conc"),
          sum(when((col("sma") > col("smb") && col("tfa") < col("tfb")) ||
              (col("sma") < col("smb") && col("tfa") > col("tfb")), 1L)
            .otherwise(0L)).as("n_disc"))
        .select(col("t").as("term"), col("n_pairs"), col("n_conc"),
          col("n_disc"),
          r((col("n_conc") - col("n_disc")).cast("double") /
            col("n_pairs").cast("double"), 6).as("tau"))
    }),

    // Rank-biased overlap (RBO@10, p = 0.9) between the BM25 and
    // raw-tf orderings of each term's candidate set — the modern
    // top-weighted IR agreement metric beside q_kendall_tau's pair
    // counting. The prefix-intersection sum telescopes into a PER-DOC
    // weight lookup: doc with ranks (ra, rb) joins every prefix depth
    // d ≥ max(ra, rb), so RBO = Σ_docs W(max(ra, rb)) with
    // W(m) = (1−p)·Σ_{d=m..10} p^{d−1}/d — TEN integer-micro literals
    // shared with the oracle (the exp-literal lesson: constants on
    // the wire, not transcendentals). No pair join exists; the rank
    // windows partition by term over the bounded TopKPerKey landing.
    "q_rbo_overlap" -> ((s, d) => {
      import graft.plans.TopKPerKey
      import org.apache.spark.sql.expressions.Window
      val base = bm25Base(s, d)
      val st = base.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("tot"))
      val tf = base.select(col("doc_id"), col("dl"),
        explode(filter(transform(array(Bm25Terms.map(lit): _*),
          t => struct(t.as("t"),
            size(filter(col("hits"), h => h === t)).cast("long")
              .as("tf"))),
          e => e.getField("tf") > 0)).as("e"))
        .select(col("doc_id"), col("dl"),
          col("e.t").as("t"), col("e.tf").as("tf"))
      val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(df), "t").crossJoin(broadcast(st))
        .select(col("t"), col("doc_id"), col("tf"), bm25TermMicro.as("sm"))
      val top = TopKPerKey(scored, Seq("t"),
        Seq(("sm", true), ("doc_id", false)), 10)
      val wa = Window.partitionBy(col("t"))
        .orderBy(col("sm").desc, col("doc_id"))
      val wb = Window.partitionBy(col("t"))
        .orderBy(col("tf").desc, col("doc_id"))
      val wCase = rboWeightCaseOn("greatest(ra, rb)")
      top.withColumn("ra", row_number().over(wa).cast("long"))
        .withColumn("rb", row_number().over(wb).cast("long"))
        .select(col("t"), expr(wCase).as("wm"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_cand"), sum(col("wm")).as("rbo_micro"))
        .select(col("t").as("term"), col("n_cand"), col("rbo_micro"))
    }),

    // Hill tail-index estimator over the trigram frequency
    // distribution — "how heavy is the n-gram tail" (the
    // order-statistic companion to q_zipf_slope's OLS exponent and
    // q_good_turing's low-count table): α̂ = k / Σ_{i≤k} ln(c_(i) /
    // c_(k+1)) on the k = 50 largest counts. Only count VALUES enter,
    // so the count-descending TakeOrdered(51) is hash-stable under
    // gram ties; per-rank surprisals integerize to micro-nats before
    // the exact sum (the q_ngram_lm recipe) and α̂ is an integral
    // division. One corpus gram pass (the fnv64 count-map kernel),
    // one bounded top-k, driver arithmetic on 51 longs.
    "q_hill_tail" -> ((s, d) => {
      val top = parallelize(documents(s, d))
        .select(explode(graft.functions.GramExprs
          .gramCounts(col("text"), 3)).as(Seq("g", "cnt")))
        .groupBy(col("g")).agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc).limit(51)
        .select(col("c")).collect().map(_.getLong(0)) // bounded: 51
      val k = 50L
      val ck1 = top.last
      val sumLn = top.take(50).map { ci =>
        math.floor(math.log(ci.toDouble / ck1.toDouble) * 1e6 + 0.5)
          .toLong
      }.sum
      val alpha = if (sumLn == 0L) 0L else k * 1000000000000L / sumLn
      s.createDataFrame(Seq((k, ck1, sumLn, alpha)))
        .toDF("k", "c_k1", "sum_ln_micro", "alpha_micro")
    }),

    // C4-style span-level dedup report: 8-word spans (distinct within a
    // doc), a span is "duplicated" when ≥2 docs contain it; per doc the
    // span count, duplicated-span count, and ratio. The raw span text is
    // digested to a 128-bit md5 key BEFORE anything shuffles — the
    // groupBy and the join-back both carry fixed-width digests, never
    // 8-word strings (at 100 TB raw-text span keys would push ~8× the
    // corpus volume through the exchange). PlanAuditSpec pins the
    // fixed-width-key property.
    "q_span_dedup" -> ((s, d) => {
      // spans deliberately NOT materialized: the scan→explode→md5
      // pipeline runs on both the totals side and the span-count side,
      // and that is the cheaper plan — MEASURED at 10× (the sfx1
      // corpus) a localCheckpoint barrier here was 5× SLOWER (17 s vs
      // 3.5 s), because storing the exploded corpus-×8 span table
      // costs far more than re-running the codegen'd digest scan.
      // The r10 join-back of the full span stream against the count
      // table is GONE (r11): spans are distinct within a doc, so a
      // span seen once corpus-wide (nd = 1) is owned by exactly one
      // doc and min(doc_id) attributes it — n_dup = n_spans − n_uniq.
      // That turns the corpus-sized digest shuffle + corpus-sized
      // shuffle-hash BUILD side + corpus probe into ONE digest shuffle
      // plus doc-sized map-combined aggregates (sf0.1 min-of-4 under a
      // loaded host: 0.96 s vs 1.02 s for the join-back form — parity
      // at toy scale where the exchange was reused anyway; the removed
      // corpus-sized hash build is the cost that grows with data).
      val spans = parallelize(documents(s, d))
        .select(col("doc_id"),
          explode(Dedup.shingles(col("text"), 8)).as("span"))
        .select(col("doc_id"), md5(col("span")).as("k"))
      // shingles are array_distinct'd per doc, so the per-doc span
      // count is just the array size — the totals side never explodes,
      // hashes, or shuffles span rows at all
      // null-text docs vanish from the spans side via explode(null);
      // filter them here too so the totals side agrees with the r10
      // explode-based row set instead of emitting a null-n_spans row
      val totals = parallelize(documents(s, d))
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(Dedup.shingles(col("text"), 8)).cast("long").as("n_spans"))
      val uniq = spans.groupBy(col("k"))
        .agg(count(lit(1)).as("nd"), min(col("doc_id")).as("d0"))
        .filter(col("nd") === 1)
        .groupBy(col("d0")).agg(count(lit(1)).as("n_uniq"))
      // both sides are doc-keyed aggregates (≈ one row per doc, still
      // corpus-proportional): co-partitioned shuffle-hash, never
      // broadcast — and both arrive already partitioned on their join
      // key, so the join adds no exchange
      totals.join(uniq.hint("shuffle_hash"),
          totals("doc_id") === uniq("d0"), "left")
        .select(col("doc_id"), col("n_spans"),
          (col("n_spans") - coalesce(col("n_uniq"), lit(0L)))
            .as("n_dup_spans"),
          r((col("n_spans") - coalesce(col("n_uniq"), lit(0L)))
            .cast("double") / col("n_spans"), 6).as("dup_ratio"))
    }),

    // C4-style line-level boilerplate REMOVAL (the rewrite, where
    // q_span_dedup is the report): docs split into "lines"
    // (non-overlapping 4-word chunks — the synthetic corpus has no
    // newlines, so the chunk grid stands in for the line structure a
    // web corpus has), a line is boilerplate when it appears in ≥3
    // distinct docs, and each doc is reassembled in original line
    // order without its boilerplate. Only 128-bit md5 digests key the
    // frequency groupBy and the join-back; the reassembly groups by
    // doc_id, so the one text-bearing shuffle carries each line
    // exactly once — the same volume the corpus itself occupies.
    "q_line_dedup" -> ((s, d) => {
      val lineW = 4
      val maxDf = 2 // keep lines in ≤2 docs; ≥3 docs ⇒ boilerplate
      // lines deliberately NOT materialized (r11): with the one-agg
      // reassembly only the df rollup and the join-back consume them,
      // and re-running the codegen'd split/slice/md5 scan measured
      // parity with a localCheckpoint barrier (1.17 vs 1.14 s min at
      // sf0.1) while keeping the lineage an executor-storage loss
      // needs to recompute (the round-6 checkpoint lesson)
      val lines = parallelize(documents(s, d))
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0L),
            expr(s"(size(t) - 1) div $lineW"))).as("i"))
        .select(col("doc_id"), col("i"),
          array_join(slice(col("t"),
            (col("i") * lineW + 1).cast("int"), lit(lineW)), " ")
            .as("line"))
        .withColumn("k", md5(col("line")))
      val df = lines.groupBy(col("k"))
        .agg(countDistinct(col("doc_id")).as("df"))
      // df is corpus-sized (one row per distinct line): shuffle-hash
      // co-partitioned on the digest, never broadcast (q_span_dedup
      // lesson — localCheckpoint loses stats and the planner would
      // otherwise broadcast a corpus-sized side)
      // ONE aggregation computes totals, kept-count, and the filtered
      // reassembly: collect_list skips the nulls `when` leaves for
      // boilerplate lines, so no separate totals pass or outer join is
      // needed — a doc whose every line is boilerplate collects an
      // empty array and joins to "" naturally
      lines.join(df.hint("shuffle_hash"), "k")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("df") <= maxDf, 1L).otherwise(0L)).as("n_kept"),
          array_join(
            transform(array_sort(collect_list(
              when(col("df") <= maxDf, struct(col("i"), col("line"))))),
              x => x.getField("line")), " ").as("clean_text"))
    }),

    // ExactSubstr-style duplicated-span report via content-defined
    // chunking (Lee et al., "Deduplicating Training Data Makes LMs
    // Better"): a Karp–Rabin rolling hash cuts each doc at content-
    // determined anchors (CdcChunksExpr — identical substrings yield
    // identical interior chunks at ANY offset, which fixed-stride
    // windows can't), chunk digests are counted corpus-wide, and runs
    // of duplicated chunks merge gaps-and-islands style into maximal
    // duplicated spans (≥48 chars reported). Scale shape follows
    // q_span_dedup: only 128-bit md5 digests key the occurrence
    // groupBy and the shuffle-hash join-back (never chunk text), the
    // islands window partitions by doc_id, and the chunking itself is
    // one codegen'd pass per doc — the same construction (CDC + digest
    // count) production dedup runs at petabyte scale.
    "q_substring_dedup" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val minSpan = CdcMinSpan
      val j = cdcChunkOcc(s, d, withText = false)
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("ord"))
      val spans = j.filter(col("occ") >= 2)
        .withColumn("island", col("ord") - row_number().over(wDoc))
        .groupBy(col("doc_id"), col("island"))
        .agg(sum(col("clen")).as("span_len"))
        .filter(col("span_len") >= minSpan)
      val tot = j.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("occ") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
          sum(col("clen")).as("total_chars"))
      val sp = spans.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("span_len")).as("removed_chars"))
      tot.join(sp, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
          (col("total_chars") - coalesce(col("removed_chars"), lit(0L)))
            .as("clean_chars"))
    }),

    // ExactSubstr REMOVAL (the rewrite, where q_substring_dedup is the
    // report): same CDC chunks / digest occurrence counts / islands,
    // then each doc reassembled in chunk order WITHOUT the chunks of
    // its ≥48-char duplicated spans. The islands + span lengths come
    // from ONE doc_id-partitioned window pass (conditional running
    // count → island id, island-partitioned sum → span length); the
    // reassembly groups by doc_id, so the single text-bearing shuffle
    // carries each chunk exactly once — corpus volume, the q_line_dedup
    // rule.
    "q_substring_scrub" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val minSpan = CdcMinSpan
      val j = cdcChunkOcc(s, d, withText = true)
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wi = j.withColumn("island",
        when(col("occ") >= 2, col("ord") -
          sum(when(col("occ") >= 2, 1L).otherwise(0L)).over(wDoc)))
      val flagged = wi.withColumn("span_len",
          sum(col("clen")).over(
            Window.partitionBy(col("doc_id"), col("island"))))
        .withColumn("keep",
          col("occ") < 2 || col("span_len") < minSpan)
      flagged.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed_chunks"),
          sum(when(col("keep"), 0L).otherwise(col("clen")))
            .as("removed_chars"),
          array_join(transform(array_sort(collect_list(
            when(col("keep"), struct(col("ord"), col("chunk"))))),
            x => x.getField("chunk")), "").as("clean_text"))
    }),

    // Bigram language-model quality score: per-doc average negative
    // log-likelihood under the corpus's own bigram LM (the classic
    // perplexity-style quality signal; high avg_nll = unusual token
    // sequences). Per-doc bigram counts aggregate FIRST, so only
    // distinct (doc, w1, w2) rows shuffle — never the raw token stream
    // — and the unigram prefix counts derive from the bigram counts
    // (one aggregation tree, exchange-reused). The per-bigram surprise
    // is integerized to micro-nats BEFORE summation: long sums are
    // associative, so aggregation order can't drift the hash.
    "q_ngram_lm" -> ((s, d) =>
      ngramDocNllCached(s, d)
        .select(col("doc_id"), col("n_bigrams"),
          r(col("nll_sum_micro").cast("double") / col("n_bigrams") / 1e6, 6)
            .as("avg_nll"))),

    // Corpus composition by LM-quality decile — the curation view a
    // mixing pipeline balances against: docs ranked by avg bigram NLL
    // (exact integer micro-nat floor, doc_id tie-break → total order
    // both engines share), then per-decile volume and the exact pooled
    // NLL. r12: the global ntile(10) window over per-doc rows is GONE
    // — doc rows are corpus-proportional (10^8+ at 100 TB), the one
    // plan shape WindowLawSpec bans. Replaced by the q_rfm two-level
    // rank decomposition: rows bucket by the milli-nat floor of their
    // key (monotone in the exact micro key, value-domain-sized bucket
    // table), bucket counts prefix-scan on that table, each bucket
    // ranks locally with its offset added, and rank maps to the decile
    // arithmetically from the broadcast doc count (SQL-standard ntile:
    // first n%10 buckets hold one extra row).
    "q_ppl_buckets" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val per = ngramDocNllCached(s, d)
        .withColumn("q", expr("nll_sum_micro div n_bigrams"))
        .withColumn("__b", expr("q div 1000"))
      val wb = Window.orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.orderBy(col("__b")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      // ONE manifest pass: the prefix offsets and the doc total are
      // two frames of the same bucket-table window sort, so the
      // corpus-side table is scanned exactly twice (manifest + rank
      // join) and the manifest costs a single ~20-row window stage
      val off = per.groupBy(col("__b")).agg(count(lit(1)).as("__bn"))
        .withColumn("__off", coalesce(sum(col("__bn")).over(wb), lit(0L)))
        .withColumn("n_docs_all", sum(col("__bn")).over(wAll))
        .select(col("__b"), col("__off"), col("n_docs_all"))
      val wl = Window.partitionBy(col("__b"))
        .orderBy(col("q"), col("doc_id"))
      per.join(broadcast(off), "__b")
        .withColumn("rn", col("__off") + row_number().over(wl))
        .withColumn("decile", expr(
          """cast(CASE
            |  WHEN rn <= (n_docs_all % 10) * ((n_docs_all div 10) + 1)
            |  THEN (rn - 1) div ((n_docs_all div 10) + 1) + 1
            |  ELSE (n_docs_all % 10) +
            |    (rn - (n_docs_all % 10) * ((n_docs_all div 10) + 1) - 1)
            |      div greatest(n_docs_all div 10, 1) + 1
            |END AS int)""".stripMargin))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("bigrams_total"),
          r(sum(col("nll_sum_micro")).cast("double") /
            sum(col("n_bigrams")) / 1e6, 6).as("avg_nll"))
    }),

    // Time-series grid resample with linear interpolation (ops.Resample)
    // — hourly grid per user over the events series; deterministic
    // bracketing (ties by event_id), no extrapolation
    "q_resample" -> ((s, d) =>
      graft.ops.Resample.gridInterpolate(events(s, d), col("user_id"),
          epochS(col("ts")), col("event_id"), col("value"),
          stepSec = 3600L)
        .select(col("k").as("user_id"), col("grid_ts"),
          r(col("v_interp"), 6).as("v_interp"))),

    // F10 — instrument command-string formatting: the BBHI request
    // packets the reference's command client writes
    // (hyperion.py:153-163), re-derived as pure column arithmetic so
    // the DuckDB oracle byte-checks every header field; the spec ties
    // the same hex to the REAL CommandCodec.encodeRequest bytes and
    // drives them through the live InstrumentResponder (S14).
    "q_command_format" -> ((s, _) => {
      val df = s.createDataFrame(CommandTable)
        .toDF("command", "argument", "request_options")
      def hx(c: org.apache.spark.sql.Column) = upper(hex(c))
      def b(c: org.apache.spark.sql.Column) = lpad(hx(c), 2, "0")
      val cLen = length(col("command"))
      val aLen = length(col("argument"))
      val header = concat(
        b(col("request_options")), lit("00"),
        b(cLen % 256), b((cLen / 256).cast("int")),
        b(aLen % 256), b(((aLen / 256).cast("int")) % 256),
        b(((aLen / 65536).cast("int")) % 256),
        b((aLen / 16777216).cast("int")))
      df.select(col("command"), col("argument"), col("request_options"),
        header.as("header_hex"),
        md5(concat(header, hx(col("command")), hx(col("argument"))))
          .as("packet_md5"))
    }),

    // BPE tokenizer TRAINING (3 merge rounds): corpus read once into the
    // word-frequency table, then every round iterates on vocab-sized
    // data only — see BpeTrainer. Output is the merge table a tokenizer
    // ships: hash-checked against a 3-stage unrolled SQL derivation
    // whose merge application folds symbols with the same greedy
    // left-to-right semantics.
    "q_bpe_train" -> ((s, d) => bpeTrained(s, d)._1),

    // BPE APPLY — tokenize the corpus with the trained merges: the
    // post-merge vocabulary (word → symbol count) broadcasts onto the
    // word stream, so applying a tokenizer at 100 TB is one narrow
    // join, never a per-document merge replay. Per-doc output: word
    // count, char count, BPE token count, chars-per-token compression.
    "q_bpe_apply" -> ((s, d) => {
      val docs = parallelize(documents(s, d))
      val (_, vocab) = bpeTrained(s, d)
      val wlen = vocab.select(col("w"), size(col("syms")).as("n_syms"))
      docs.select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("w"))
        .join(broadcast(wlen), "w")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(length(col("w")).cast("long")).as("n_chars"),
          sum(col("n_syms").cast("long")).as("n_bpe_tokens"))
        .select(col("doc_id"), col("n_words"), col("n_chars"),
          col("n_bpe_tokens"),
          r(col("n_chars").cast("double") / col("n_bpe_tokens"), 6)
            .as("chars_per_token"))
    }),

    // Tokenizer fertility per SOURCE — the "how expensive is this
    // source to tokenize" mixture diagnostic (fertility = BPE tokens
    // per word; compression = chars per BPE token): the q_bpe_apply
    // broadcast-vocab join rolled up to the source level, so adding
    // the report costs no new corpus machinery — one explode, one
    // broadcast join, one |sources|-row aggregate.
    "q_bpe_fertility" -> ((s, d) => {
      val docs = parallelize(documents(s, d))
      val (_, vocab) = bpeTrained(s, d)
      val wlen = vocab.select(col("w"), size(col("syms")).as("n_syms"))
      docs.select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("w"))
        .join(broadcast(wlen), "w")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"),
          sum(length(col("w")).cast("long")).as("n_chars"),
          sum(col("n_syms").cast("long")).as("n_bpe_tokens"))
        .select(col("source"), col("n_words"), col("n_chars"),
          col("n_bpe_tokens"),
          r(col("n_bpe_tokens").cast("double") /
            col("n_words").cast("double"), 6).as("fertility"),
          r(col("n_chars").cast("double") /
            col("n_bpe_tokens").cast("double"), 6).as("chars_per_token"))
    }),

    // END-TO-END curation pipeline — the ops composed the way a real
    // corpus build runs them, reported as a per-stage funnel (docs +
    // tokens surviving each stage): normalize → Gopher quality gate →
    // exact dedup (min-id per digest) → line-level boilerplate removal
    // (all-boilerplate docs drop) → 5-gram decontamination vs the
    // benchmark split → deterministic 80% hash sample. Every stage is
    // the same construction as its standalone query, so the funnel is
    // fully SQL-mirrorable; the normalized text is checkpointed once
    // and each rewrite stage feeds the next lazily.
    "q_curation_pipeline" -> ((s, d) => {
      val lineW = 4; val maxDf = 2
      // stage barriers go through Materialize.barrier: localCheckpoint
      // by default, reliable parquet when spark.graft.materializeDir is
      // set (the cluster configuration — executor loss re-reads a
      // landed stage instead of replaying the funnel)
      def bar(df: DataFrame, stage: String): DataFrame =
        graft.util.Materialize.barrier(df, s"curation_${stage}_$d")
      val all = documents(s, d)
      val bench = all.filter(col("doc_id") % 20 === 0)
      val t0 = bar(parallelize(all.filter(col("doc_id") % 20 =!= 0))
        .select(col("doc_id"),
          TextAnalysis.normalizeText(col("text")).as("t")), "normalized")
      // stage 1: Gopher gate (q_gopher_filter's integer-exact rules)
      val st = graft.functions.TextExprs.tokenStats(col("t"))
      val nTok = st.getField("n_tok").cast("long")
      val wordChars = (length(col("t")) - (nTok - 1)).cast("long")
      val stopHits = graft.functions.TextExprs
        .tokenSetCount(col("t"), TextAnalysis.Stopwords).cast("long")
      val nDistinct = st.getField("n_distinct").cast("long")
      val t1 = t0.filter(!(nTok < 20 || nTok > 1000) &&
        !(wordChars < nTok * 3 || wordChars > nTok * 10) &&
        stopHits >= 2 && nDistinct * 10 >= nTok * 3)
      // stage 2: exact dedup, min doc_id survives per digest
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("t")))
      val t2 = t1.withColumn("kid", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("kid")).drop("kid")
      // stage 3: line-level boilerplate removal (q_line_dedup shape)
      val lines = t2.select(col("doc_id"), split(col("t"), " ").as("tk"))
        .select(col("doc_id"), col("tk"),
          explode(sequence(lit(0L),
            expr(s"(size(tk) - 1) div $lineW"))).as("i"))
        .select(col("doc_id"), col("i"),
          array_join(slice(col("tk"),
            (col("i") * lineW + 1).cast("int"), lit(lineW)), " ")
            .as("line"))
        .withColumn("k", md5(col("line")))
      val linesBar = bar(lines, "lines")
      val lineDf = linesBar.groupBy(col("k"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val t3 = bar(linesBar.join(lineDf.hint("shuffle_hash"), "k")
        .groupBy(col("doc_id"))
        .agg(array_join(
          transform(array_sort(collect_list(
            when(col("df") <= maxDf, struct(col("i"), col("line"))))),
            x => x.getField("line")), " ").as("t"))
        .filter(col("t") =!= ""), "rewritten")
      // stage 4: decontaminate the REWRITTEN text against the benchmark
      val corpusSpans = t3
        .select(col("doc_id"), explode(Dedup.shingles(col("t"), 5)).as("sp"))
        .select(col("doc_id"), md5(col("sp")).as("g"))
      val benchSpans = bench
        .select(explode(Dedup.shingles(col("text"), 5)).as("sp"))
        .select(md5(col("sp")).as("g")).distinct()
      val bad = corpusSpans.join(broadcast(benchSpans), "g")
        .select(col("doc_id")).distinct()
      val t4 = t3.join(bad, Seq("doc_id"), "left_anti")
      // stage 5: deterministic 80% hash-bucket sample (no rand())
      val t5 = t4.filter(
        conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("int") < 204)
      def funnel(stage: Int, name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(graft.text.TextAnalysis.tokenCount(col("t")).cast("long")), lit(0L))
              .as("n_tokens"))
          .select(lit(stage).as("stage"), lit(name).as("stage_name"),
            col("n_docs"), col("n_tokens"))
      Seq(funnel(0, "input", t0), funnel(1, "quality", t1),
        funnel(2, "exact_dedup", t2), funnel(3, "line_dedup", t3),
        funnel(4, "decontam", t4), funnel(5, "sample", t5))
        .reduce(_.unionAll(_))
    }),

    // Deterministic per-group reservoir: the m docs with the smallest
    // md5(doc_id) per source — reproducible across runs/engines (no
    // rand()), uniform within each group, and executed by the custom
    // TopKPerKey operator (bounded per-key heaps, one exchange) rather
    // than a WindowExec sort of every group.
    "q_reservoir" -> ((s, d) =>
      graft.plans.TopKPerKey(
        documents(s, d).select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("hk")),
        Seq("source"), Seq(("hk", false), ("doc_id", false)), k = 5)
        .select(col("source"), col("doc_id"))),

    // KMV distinct-count sketch over 8-gram spans (the near-dup-rate
    // denominator a curation pipeline estimates without a full
    // count-distinct shuffle): one pass, k longs per partial, and fully
    // DETERMINISTIC, so even the "approximate" estimate hash-matches
    // the oracle (q_hll_distinct gets the same property from integer
    // register math). kth = the retained theta.
    "q_kmv_distinct" -> ((s, d) => {
      val k = 256
      val spans = parallelize(documents(s, d))
        .select(explode(Dedup.shingles(col("text"), 8)).as("sp"))
        .select(conv(substring(md5(col("sp")), 1, 12), 16, 10)
          .cast("long").as("h"))
      // the sketch alone never needs this distinct (its partials are
      // duplicate-insensitive) — it exists for the exact-count
      // comparison column, and pre-aggregating once beats the Expand
      // plan a countDistinct-next-to-an-aggregate would pay (2× the
      // explode/md5 work). At 100 TB you'd drop `exact_distinct` and
      // with it the only corpus-sized shuffle here.
      val hh = spans.distinct()
      hh.agg(
          graft.functions.KmvSketchExpr.kmv(col("h"), k).as("mins"),
          count(lit(1)).as("exact_distinct"))
        .select(lit(k).as("k"),
          element_at(col("mins"), k).as("kth"),
          r(lit((k - 1).toDouble) * lit(281474976710656.0) /
            element_at(col("mins"), k).cast("double"), 4)
            .as("est_distinct"),
          col("exact_distinct"))
    }),

    // HyperLogLog distinct-count sketch over the same 8-gram spans —
    // the industry-standard cardinality estimator, expressed as pure
    // declarative Spark: register index = top 9 bits of the 48-bit span
    // hash, rank = leading-zero count of the low 39 bits + 1 (via
    // length(bin(x)), identical in DuckDB), and the register build is
    // groupBy(reg).max(rank) — map-side combinable, so the one exchange
    // carries at most m=512 (reg, max-rank) pairs per partition
    // REGARDLESS of corpus size. The harmonic-mean denominator is
    // integerized (sum of 2^(40-M) as BIGINT, exact — no float
    // associativity), so even the estimate hash-matches the oracle;
    // the final alpha*m^2 division is one fixed-order IEEE expression,
    // floor-rounded. `zeros` is emitted so the linear-counting
    // small-range correction (which needs ln) stays a consumer choice
    // instead of a float-determinism hazard in the gate.
    "q_hll_distinct" -> ((s, d) => {
      val p = 9; val m = 1 << p // 512 registers, 48-bit hash: 9 idx + 39 rank bits
      val regs = parallelize(documents(s, d))
        .select(explode(Dedup.shingles(col("text"), 8)).as("sp"))
        .select(conv(substring(md5(col("sp")), 1, 12), 16, 10)
          .cast("long").as("h")).distinct()
        .select(shiftrightunsigned(col("h"), 39).as("reg"),
          col("h").bitwiseAND(lit((1L << 39) - 1)).as("rem"))
        .select(col("reg"),
          when(col("rem") === 0, lit(40))
            .otherwise(lit(40) - length(bin(col("rem")))).as("rank"))
        .groupBy(col("reg"))
        .agg(max(col("rank")).as("mx"), count(lit(1)).as("cnt"))
      regs.agg(
          (sum(expr("shiftleft(cast(1 as bigint), cast(40 - mx as int))")) +
            (lit(m.toLong) - count(lit(1))) * lit(1L << 40)).as("hden"),
          (lit(m.toLong) - count(lit(1))).as("zeros"),
          sum(col("cnt")).as("exact_distinct"))
        .select(lit(m).as("m"), col("zeros"), col("hden"),
          r(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0)) *
            lit(262144.0) * lit(1099511627776.0) /
            col("hden").cast("double"), 4).as("est_distinct"),
          col("exact_distinct"))
    }),

    // HLL MERGEABILITY — the property that makes sketches the right
    // tool at 100 TB: per-source register sets are built ONCE from the
    // data, then any rollup (here: the all-sources union) is an
    // element-wise register max over the ≤ sources×512 sketch rows,
    // never a rescan of the corpus. Because union-of-sketches = sketch-
    // of-union exactly (max is associative/commutative/idempotent), the
    // merged "ALL" row is bit-identical to what q_hll_distinct computes
    // directly over the global span set — asserted cross-query in the
    // invariants spec, and hash-checked here per source AND merged.
    "q_hll_merge" -> ((s, d) => {
      // ONE corpus pass: dedupe spans globally while remembering which
      // sources carry each (collect_set is bounded by the source
      // cardinality, ~20). A naive per-branch derivation (per-source
      // distinct + global distinct + registers) column-prunes into
      // DIFFERENT subtrees, so Spark can't reuse the exchange and the
      // explode+md5 scan runs 3× — measured 2.2× slower at sf0.1.
      val g = parallelize(documents(s, d))
        .select(col("source"),
          explode(Dedup.shingles(col("text"), 8)).as("sp"))
        .select(col("source"),
          conv(substring(md5(col("sp")), 1, 12), 16, 10)
            .cast("long").as("h"))
        .groupBy(col("h"))
        .agg(collect_set(col("source")).as("srcs"))
      val rem = col("h").bitwiseAND(lit((1L << 39) - 1))
      // the synthetic 'ALL' membership row makes the global exact count
      // and per-source register builds share one downstream shape
      val regsAll = g
        .select(explode(array_union(col("srcs"), array(lit("ALL"))))
          .as("source"), col("h"))
        .select(col("source"), shiftrightunsigned(col("h"), 39).as("reg"),
          when(rem === 0, lit(40))
            .otherwise(lit(40) - length(bin(rem))).as("rank"))
        .groupBy(col("source"), col("reg"))
        .agg(max(col("rank")).as("mx"), count(lit(1)).as("cnt"))
        // sketch-sized (≤ sources×512 rows), materialized once: the
        // estimate arm consumes it twice (per-source + merged) and the
        // exact arm once. Exchange reuse already deduplicates most of
        // the shared corpus subtree, so the barrier is a modest win
        // (1.37 → 1.20 s at sf0.1, r9) — kept because the reuse is a
        // planner heuristic and the barrier makes the one-pass shape
        // structural.
        .localCheckpoint(false)
      // the merge itself: 'ALL' registers recomputed from the per-source
      // SKETCH ROWS alone (element-wise max over ≤ sources×512 rows —
      // no corpus rescan); bit-identical to the direct global build by
      // max-associativity, asserted cross-query in the invariants spec
      val perSrc = regsAll.filter(col("source") =!= "ALL")
      val merged = perSrc.groupBy(col("reg")).agg(max(col("mx")).as("mx"))
        .withColumn("source", lit("ALL"))
      val ests = perSrc.select(col("source"), col("mx"))
        .unionByName(merged.select(col("source"), col("mx")))
        .groupBy(col("source"))
        .agg((sum(expr(
            "shiftleft(cast(1 as bigint), cast(40 - mx as int))")) +
          (lit(512L) - count(lit(1))) * lit(1L << 40)).as("hden"))
        .select(col("source"),
          r(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0)) *
            lit(262144.0) * lit(1099511627776.0) /
            col("hden").cast("double"), 4).as("est_distinct"))
      val exacts = regsAll.groupBy(col("source"))
        .agg(sum(col("cnt")).as("exact_distinct"))
      // no orderBy: the gate sorts rows itself, and the extra range
      // exchange would add a whole stage to an already 7-stage plan
      ests.join(exacts, "source")
    }),

    // Count-Min-Sketch heavy hitters: the exact top-20 tokens probed
    // against a 4×256 CMS built in ONE pass over the token stream
    // (native TypedImperativeAggregate — only fixed-size counter
    // arrays shuffle; the vocabulary groupBy here exists solely for
    // the exact-vs-estimate comparison, like q_kmv_distinct's). The
    // md5-chunk hash rows make the estimate engine-reproducible, so
    // even the "approximate" column is hash-checked.
    "q_cms_topk" -> ((s, d) => {
      val depth = 4; val width = 256
      val toks = parallelize(documents(s, d))
        .select(explode(split(col("text"), " ")).as("token"))
      val sk = toks.agg(
        graft.functions.CmsSketchExpr.cms(col("token"), depth, width)
          .as("sk"))
      toks.groupBy(col("token"))
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token"))
        .limit(20)
        .crossJoin(broadcast(sk)) // 1-row sketch scalar
        .select(col("token"), col("exact_cnt"),
          graft.functions.CmsSketchExpr
            .estimate(col("token"), col("sk"), depth, width)
            .as("cms_est"))
    }),

    // CMS candidate pruning — the pattern where the sketch REDUCES
    // work instead of being compared to it: pass 1 builds the grid,
    // pass 2 exact-counts ONLY tokens whose estimate clears N/64.
    // One-sided error makes the candidate set a guaranteed superset of
    // the truly-frequent tokens, and the threshold filter sits BELOW
    // the aggregation exchange — at 100 TB the vocabulary groupBy sees
    // the heavy-hitter occurrences, never the long tail.
    "q_cms_prune" -> ((s, d) => {
      val depth = 4; val width = 256
      val toks = parallelize(documents(s, d))
        .select(explode(split(col("text"), " ")).as("token"))
      val grid = toks.agg(
          graft.functions.CmsSketchExpr.cms(col("token"), depth, width)
            .as("sk"))
        // any grid row sums to the stream length — N without a second pass
        .withColumn("n_total",
          aggregate(slice(col("sk"), 1, width), lit(0L), (a, x) => a + x))
      toks.crossJoin(broadcast(grid))
        .withColumn("est", graft.functions.CmsSketchExpr
          .estimate(col("token"), col("sk"), depth, width))
        .filter(col("est") >= expr("n_total div 64"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("exact_cnt"), min(col("est")).as("cms_est"))
    }),

    // BPE merge step 1: adjacent character-pair frequencies within
    // whitespace tokens, top 30 by (count desc, pair) — the candidate
    // table a byte-pair-encoding tokenizer trainer merges from. Pure
    // explode → codegen'd partial agg → TakeOrderedAndProject; the only
    // shuffle carries 2-char keys.
    "q_bpe_pairs" -> ((s, d) =>
      parallelize(documents(s, d))
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) >= 2)
        .select(col("tok"),
          explode(sequence(lit(1), length(col("tok")) - 1)).as("i"))
        .select(col("tok").substr(col("i"), lit(2)).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(30)),

    // ---- dedup ----------------------------------------------------------
    // the synthetic corpus has no exact duplicates at gate scale, so the
    // raw form proved only 0=0; mirror every 100th doc under a shifted
    // id (synthesize-in-query, the q_url_canon precedent) so the driver
    // row witnesses real dup pairs at every sf — 5 at 500 docs, 50 at
    // 5000 — and still catches any natural duplicates
    "q_dedup_exact" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      // twin ids live in a disjoint high-bit range (1L<<40 ≈ 1.1e12):
      // a fixed +1e6 shift collides with real doc_ids past 1M docs,
      // and because the oracle mirrored the same shift the parity
      // check would pass on corrupted kept_id semantics (ADVICE r12)
      val corpus = docs.union(
        docs.filter(col("doc_id") % 100 === 0)
          .select((col("doc_id") + (1L << 40)).as("doc_id"), col("text")))
      Dedup.exactDuplicates(corpus, col("doc_id"), col("text"))
    }),

    "q_minhash" -> ((s, d) =>
      Dedup.minhashDf(documents(s, d), col("doc_id"), col("text"), 2,
        MinhashN)),

    "q_lsh_bands" -> ((s, d) =>
      Dedup.lshBands(documents(s, d), col("doc_id"), col("text"), 2,
        LshBands, LshRows)),

    "q_lsh_pairs" -> ((s, d) =>
      Dedup.lshCandidatePairs(
        Dedup.lshBands(documents(s, d), col("doc_id"), col("text"), 2,
          LshBands, LshRows))),

    "q_simhash" -> ((s, d) =>
      Dedup.simhashDf(documents(s, d), col("doc_id"), col("text"))),

    // Deterministic hash-bucket subsample (~10 %) — reproducible corpus
    // sampling as a pure scan filter, no rand(), no shuffle
    "q_corpus_sample" -> ((s, d) =>
      Dedup.hashSample(documents(s, d), col("doc_id"), rate256 = 26)
        .select(col("doc_id"))),

    // Stratified sampling: per-source keep rates (50 % / 25 % / 5 % /
    // 10 % default) as one deterministic hash scan-filter — the mix
    // knob a curation pipeline turns per corpus slice.
    "q_stratified_sample" -> ((s, d) =>
      graft.pipeline.Curation.stratifiedSample(documents(s, d),
          col("doc_id"), col("source"),
          Seq("src0" -> 128, "src1" -> 64, "src2" -> 13),
          defaultRate256 = 26)
        .select(col("doc_id"), col("source"), col("lang"))),

    // Weighted upsampling (epoch mixing): src0 ×3, src1 ×2, src2
    // dropped, everything else ×1 — narrow generate, no shuffle.
    "q_data_mix" -> ((s, d) =>
      graft.pipeline.Curation.upsampleMix(documents(s, d), col("source"),
          Seq("src0" -> 3, "src1" -> 2, "src2" -> 0), defaultWeight = 1)
        .select(col("doc_id"), col("source"), col("copy"))),

    // Temperature-resampled mix (the multilingual-LM α-sampling knob,
    // α=0.5): Hamilton-apportioned budget, per-source md5-rank draw,
    // and oversampling by repetition when a small source's allocation
    // exceeds its row count — see Curation.temperatureMix. On the
    // uniform fixture every alloc < n, so pick_rank ≡ prk (the skew
    // branch is exercised by CurationSpec on a 100:1 corpus).
    "q_temperature_mix" -> ((s, d) =>
      graft.pipeline.Curation.temperatureMix(
        parallelize(documents(s, d)).select(col("doc_id"), col("source")),
        "doc_id", "source")),

    // Sequence packing: concatenate each source's docs in doc_id order,
    // cut into 2048-token context bins, report per-bin fill — packing
    // runs per shard (source), never as a global sort.
    "q_seq_packing" -> ((s, d) => {
      val base = parallelize(documents(s, d))
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"))
      graft.pipeline.Curation.packBins(base, col("source"), col("doc_id"),
          col("n_toks"), capacity = 2048L)
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
    }),

    // MinHash Jaccard estimate vs exact Jaccard on consecutive-id pairs:
    // the estimator whose expectation equals the true Jaccard — both the
    // estimate (signature-component agreement) and the exact value are
    // recomputed by the oracle from the same md5 constructions
    "q_minhash_estimate" -> ((s, d) => {
      val k = 8
      val sig = Dedup.minhashDf(documents(s, d), col("doc_id"), col("text"),
          2, k)
        .select(col("doc_id"),
          array((1 to k).map(i => col(s"h$i")): _*).as("sig"))
      val a = sig.select(col("doc_id").as("id_a"), col("sig").as("sa"))
      val b = sig.select(col("doc_id").as("id_b"), col("sig").as("sb"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"),
          r(Dedup.minhashJaccardEstimate(col("sa"), col("sb"), k), 6)
            .as("jaccard_est"))
    }),

    // Dedup clustering: candidate-pair edges → connected components →
    // (doc, cluster head) via iterative min-label propagation. The edge
    // set here is deterministic multi-hop chains (id—id+1 links within
    // 6-doc runs every 50 ids): genuinely transitive components that
    // exercise multi-round propagation while keeping the oracle's
    // recursive-CTE reachability linear (the synthetic corpus's
    // LSH pairs form one dense blob, which is quadratic for the
    // reachability oracle — an oracle-cost bound, not a Spark one; the
    // LSH-edge form runs through the same operator in DedupSpec).
    "q_dedup_clusters" -> ((s, d) => dupClusters(s, d)),

    // Survivorship policy over dedup clusters: per connected component
    // keep the longest doc (doc_id tie-break), report what the rewrite
    // drops. One aggregate over the cluster assignment — the argmax is a
    // lexicographic `max(struct(n_chars, -doc_id))`, so there is no
    // window sort, just map-side-combinable partials per cluster.
    "q_dup_survivors" -> ((s, d) => {
      dupClusters(s, d)
        .join(documents(s, d).select(col("doc_id"), col("n_chars")),
          "doc_id")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars_total"),
          max(struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("m"))
        .select(col("cluster_id"),
          (-col("m.nid")).as("survivor_id"),
          col("m.n_chars").as("survivor_chars"),
          col("n_docs"),
          (col("n_docs") - 1).as("n_removed"),
          (col("chars_total") - col("m.n_chars")).as("chars_removed"))
    }),

    // Winnowing fingerprints (the MOSS document-fingerprint selection):
    // k=4-gram digests, window w=5 → guaranteed detection of any >= 8
    // verbatim shared tokens at ~1/3 the index size of full shingling —
    // the storage/recall dial between exact spans (everything) and
    // MinHash (probabilistic).
    "q_winnowing" -> ((s, d) =>
      Dedup.winnowFingerprints(documents(s, d), col("doc_id"), col("text"),
        k = 4, w = 5)),

    // SimHash near-dup candidate pairs at production width: 64-bit
    // fingerprints, 4 x 16-bit bands — by pigeonhole every pair within
    // hamming distance 3 shares a band, so the band self-join (fixed
    // 16-bit keys, never text) yields ALL near pairs plus a thin
    // random-collision tail, each verified with an exact popcount.
    "q_simhash_pairs" -> ((s, d) => {
      val fp = Dedup.simhash64Df(documents(s, d), col("doc_id"),
        col("text"))
      // r14 disposition — KEEP this double-compute + broadcast shape,
      // settled by interleaved min-of-4 measurement at sf0.1: the
      // fingerprint subtree does run on BOTH self-join sides (the
      // analyzer clones a self-join's right side, so no exchange is
      // ever shared and AQE stage-reuse never fires), but every
      // compute-once alternative measured SLOWER — localCheckpoint
      // barrier 3.82 s, repartition-below-aliases + shuffle-hash
      // 4.00 s, vs 2.97 s for this shape: the single-pass variants
      // serialize compute → shuffle → join, while the broadcast plan
      // overlaps the two subtree stages across idle cores and skips
      // the band-key shuffle entirely. (An integer conv()-chunk vote
      // rewrite also measured slower than the substring+instr probes —
      // rejected.) At production scale the banded table outgrows a
      // broadcast and the planner falls back to the shuffled join on
      // its own; the fingerprint pass is then worth landing once via
      // spark.graft.materializeDir, the measured 100 TB configuration.
      val bands = fp.select(col("doc_id"), col("fp"),
          explode(Dedup.simhashBands(col("fp"), SimhashBands)).as("b"))
        .select(col("doc_id"), col("fp"),
          col("b.band_idx").as("band_idx"), col("b.bv").as("bv"))
      val a = bands.select(col("doc_id").as("id_a"), col("fp").as("fa"),
        col("band_idx"), col("bv"))
      val b = bands.select(col("doc_id").as("id_b"), col("fp").as("fb"),
        col("band_idx"), col("bv"))
      a.join(b, Seq("band_idx", "bv"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("fa"), col("fb"))
        .distinct()
        .select(col("id_a"), col("id_b"),
          bit_count(col("fa").bitwiseXOR(col("fb"))).cast("int")
            .as("hamming"),
          (bit_count(col("fa").bitwiseXOR(col("fb"))) <= 3).as("is_near"))
    }),

    // END-TO-END fuzzy dedup funnel (the MinHash analog of
    // q_curation_pipeline): LSH banding → candidate pairs → exact
    // Jaccard >= 0.5 verification (integer cross-multiplied — no float
    // threshold) → connected components → keep the min-id doc per
    // component. Per-stage counts are the curation report; only LSH
    // candidates ever pay the exact-Jaccard compare.
    "q_fuzzy_dedup" -> ((s, d) => {
      val docs = documents(s, d)
      // stage barriers via Materialize.barrier: reliable parquet when
      // spark.graft.materializeDir is set (see q_curation_pipeline)
      val cand = graft.util.Materialize.barrier(
        Dedup.lshCandidatePairs(
          Dedup.lshBands(docs, col("doc_id"), col("text"), 2,
            LshBands, LshRows)), s"fuzzy_cand_$d")
      val sh = docs.select(col("doc_id"),
        Dedup.shingles(col("text"), 2).as("sh"))
      val inter = graft.functions.StringSim
        .intersectCount(col("sa"), col("sb"))
      val edges = cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sa")),
          "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sb")),
          "id_b")
        .filter(inter * 2 >= size(col("sa")) + size(col("sb")) - inter)
        .select(col("id_a"), col("id_b"))
        .transform(graft.util.Materialize.barrier(_, s"fuzzy_edges_$d"))
      val clusters = Dedup.duplicateClusters(edges)
      // duplicateClusters labels each member with the component's min id,
      // so the survivor IS the label; removed = members with other ids
      val removed = clusters.filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id"))
      val kept = docs.select(col("doc_id"))
        .join(removed, Seq("doc_id"), "left_anti")
      def row(stage: Int, name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n"))
          .select(lit(stage).as("stage"), lit(name).as("stage_name"),
            col("n"))
      Seq(row(0, "input", docs),
        row(1, "candidates", cand),
        row(2, "verified_edges", edges),
        row(3, "clusters", clusters.select(col("cluster_id")).distinct()),
        row(4, "kept_docs", kept))
        .reduce(_.unionAll(_))
    }),

    // n-gram novelty across the deterministic splits — the memorization
    // / leakage check run before trusting an eval number: what fraction
    // of val/test 5-gram spans never occur in train. One shuffle on the
    // 32-byte span digest (per-digest split flags), then a scalar
    // rollup; the train set never materializes as a separate side.
    "q_ngram_novelty" -> ((s, d) => {
      val spl = documents(s, d).select(col("doc_id"),
          conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
            .cast("int").as("b"))
        .select(col("doc_id"),
          when(col("b") < 230, "train").when(col("b") < 243, "val")
            .otherwise("test").as("split"))
      val flags = docSpans5(s, d).join(spl, "doc_id")
        .groupBy(col("g"))
        .agg(max(when(col("split") === "train", 1).otherwise(0)).as("tr"),
          max(when(col("split") === "val", 1).otherwise(0)).as("va"),
          max(when(col("split") === "test", 1).otherwise(0)).as("te"))
      flags.agg(
          sum(col("va")).as("sp_val"),
          sum(col("va") * col("tr")).as("seen_val"),
          sum(col("te")).as("sp_test"),
          sum(col("te") * col("tr")).as("seen_test"))
        .select(explode(array(
          struct(lit("val").as("split"), col("sp_val").as("n_spans"),
            col("seen_val").as("n_seen")),
          struct(lit("test").as("split"), col("sp_test").as("n_spans"),
            col("seen_test").as("n_seen")))).as("x"))
        .select(col("x.split").as("split"), col("x.n_spans").as("n_spans"),
          col("x.n_seen").as("n_seen"),
          r((col("x.n_spans") - col("x.n_seen")).cast("double") /
            col("x.n_spans"), 6).as("novelty"))
    }),

    // Badwords/blocklist gate (the C4-style keyword filter): exact
    // word-boundary occurrence counts from the native one-pass
    // token-set kernel — never a regex over the text. Pure scan work.
    "q_blocklist_filter" -> ((s, d) => {
      val hits = graft.functions.TextExprs
        .tokenSetCount(col("text"), BlockWords).cast("long")
      documents(s, d).select(col("doc_id"), hits.as("n_hits"),
        (hits > 0).as("flagged"))
    }),

    // Token-budget apportionment (largest-remainder / Hamilton): split a
    // global training-token budget across sources proportionally to
    // their token counts, integer-exact — base = floor share, the
    // leftover goes to the largest scaled remainders (source asc ties).
    // All window work runs on the #sources-sized aggregate, never rows.
    "q_token_budget" -> ((s, d) => {
      val B = 100000L
      val tot = documents(s, d).groupBy(col("source"))
        .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long"))
          .as("n_tokens"))
      val all = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
      val ord = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
        .orderBy(col("rem").desc, col("source").asc)
      tot
        .withColumn("t_all", sum(col("n_tokens")).over(all))
        .withColumn("base", expr(s"($B * n_tokens) div t_all"))
        .withColumn("rem", lit(B) * col("n_tokens") - col("base") * col("t_all"))
        .withColumn("leftover", lit(B) - sum(col("base")).over(all))
        .withColumn("rk", row_number().over(ord))
        .select(col("source"), col("n_tokens"), col("base"),
          when(col("rk") <= col("leftover"), 1L).otherwise(0L).as("extra"),
          (col("base") +
            when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as("alloc"))
    }),

    // Zipf's-law fit over the term-frequency table: exact OLS of
    // ln(freq) on ln(rank) for the top 1000 ranks, micro-nat integerized
    // coordinates so the sums are exact longs (the slope divides two
    // exact integers in double — bit-stable). The top-1000 cut is a
    // TakeOrderedAndProject (per-partition heaps + a 1000-row driver
    // merge — the q_bm25 shape), NEVER a full-vocabulary sort: at
    // corpus scale the vocab is 10^8+ terms and a single-partition
    // rank window over it is a one-task bottleneck. Ranking then runs
    // on the bounded 1000-row result. Healthy-corpus signal: slope ≈ -1.
    "q_zipf_slope" -> ((s, d) => {
      val tf = parallelize(documents(s, d))
        .select(explode(split(col("text"), " ")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
      val top = tf.orderBy(col("c").desc, col("t").asc).limit(1000)
      val ord = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("t").asc)
      val pts = top.withColumn("rank", row_number().over(ord))
        .select(
          floor(log(col("rank").cast("double")) * 1e6 + lit(0.5))
            .cast("long").as("x"),
          floor(log(col("c").cast("double")) * 1e6 + lit(0.5))
            .cast("long").as("y"))
      pts.agg(count(lit(1)).as("n_terms"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("n_terms"),
          r((col("n_terms").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n_terms").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")), 6)
            .as("slope"))
    }),

    // Heaps'-law vocabulary-growth curve: cumulative distinct-token
    // count vs cumulative token count over 10 doc_id-prefix deciles,
    // plus the fitted Heaps exponent beta (V ≈ K·n^β; log-log least
    // squares over the 10 points, the q_zipf_slope fit recipe) — the
    // "is more data still adding vocabulary" curation diagnostic.
    // Token first-occurrence = min(doc_id) per word, so the
    // vocabulary rollup is the only corpus-sized exchange (the
    // q_zipf_slope precedent); per-decile token mass comes from the
    // SCAN side (size(split), no second explode), the cumsums run on
    // the 10-row decile frame, and the 1-row fit attaches by
    // broadcast.
    "q_heaps_law" -> ((s, d) => {
      // doc_ids are 0..nd-1; the row count is a bounded scalar (the
      // BPE/centroid collect precedent) — inlining it as a literal
      // spares two scan jobs + two 1-row broadcasts
      val nd = docCount(s, d)
      // the curve is 10 rows BY CONSTRUCTION (deciles) at any corpus
      // size — collect it and run the cumsums + OLS fit driver-side
      // (the centroid/BPE bounded-artifact precedent) instead of
      // paying checkpoint + broadcast-fit + attach jobs on a 10-row
      // frame. Arithmetic mirrors the oracle exactly: ln micro-floored
      // to BIGINT points, integer sums, one double division, r(...,6).
      val curve = heapsCurveInputs(s, d, nd)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) 0L else r.getLong(2)))
        .sortBy(_._1)
      var (ct, cv) = (0L, 0L)
      val cum = curve.map { case (dec, tk, nv) =>
        ct += tk; cv += nv; (dec, ct, cv)
      }
      val pts = cum.map { case (_, t, v) =>
        (math.floor(math.log(t.toDouble) * 1e6 + 0.5).toLong,
          math.floor(math.log(v.toDouble) * 1e6 + 0.5).toLong)
      }
      val np = pts.length.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val beta0 = (np.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (np.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
      val beta = math.floor(beta0 * 1e6 + 0.5) / 1e6
      s.createDataFrame(cum.toSeq.map { case (dec, t, v) =>
        (dec, t, v, beta)
      }).toDF("decile", "cum_tokens", "cum_vocab", "beta")
    }),

    // Moving-average type-token ratio (MATTR, Covington & McFall): the
    // length-independent lexical-diversity score — 20-token windows on a
    // 10-token stride, per-window distinct/size integerized BEFORE the
    // per-doc mean so aggregation order can't drift the hash. Narrow
    // generate per doc, no shuffle beyond the final doc rollup.
    "q_mattr" -> ((s, d) => {
      val W = 20; val S = 10
      parallelize(documents(s, d))
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("tk"),
          when(size(col("tk")) >= W,
            expr(s"(size(tk) - $W) div $S") + 1).otherwise(1L).as("nw"))
        .select(col("doc_id"), col("tk"),
          explode(sequence(lit(0L), col("nw") - 1)).as("i"))
        .select(col("doc_id"),
          slice(col("tk"), (col("i") * S + 1).cast("int"), lit(W))
            .as("win"))
        .select(col("doc_id"),
          expr("(size(array_distinct(win)) * 1000000L) div size(win)")
            .as("ttr_micro"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          sum(col("ttr_micro")).as("sum_micro"))
        .select(col("doc_id"), col("n_windows"),
          r(col("sum_micro").cast("double") / col("n_windows") / 1e6, 6)
            .as("mattr"))
    }),

    // MAD-based robust outlier detection on the events stream: per
    // event_type median and median-absolute-deviation over DOUBLED
    // micro-units (so every percentile midpoint is exactly
    // representable), outliers = |x − med| > 3·MAD. Exact percentiles:
    // Spark's percentile buffers value→count, bounded by distinct
    // values. The per-type medians broadcast back onto the stream.
    // Disposition (r10): the three passes are DEPENDENT by definition
    // (median → deviations → fence), so the toy-scale cost is a stage
    // floor; a localCheckpoint + driver-literal-medians variant
    // measured 0.53 s vs 0.59 s at sf0.1 (inside noise) and was
    // rejected — KEEP the broadcast-join form, which carries no
    // bounded-collect assumption on |event_type|.
    "q_mad_outliers" -> ((s, d) => {
      val base = events(s, d).select(col("event_type"),
        (floor(col("value") * 1e6 + lit(0.5)) * 2).cast("long").as("v2"))
      val med = base.groupBy(col("event_type"))
        .agg(expr("percentile(v2, 0.5)").as("med2"),
          count(lit(1)).as("n_events"))
      val dev = base.join(broadcast(med), "event_type")
        .withColumn("dev2", abs(col("v2").cast("double") - col("med2")))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(dev2, 0.5)").as("mad2"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("n_events")).as("n_events"),
          r(max(col("med2")) / lit(2e6), 6).as("median_value"),
          r(max(col("mad2")) / lit(2e6), 6).as("mad_value"),
          sum(when(col("dev2") > lit(3.0) * col("mad2"), 1L).otherwise(0L))
            .as("n_outliers"))
    }),

    // PCA top-component projection via power iteration — the
    // dimensionality-reduction pass an embedding pipeline runs before
    // ANN indexing. The uncentered second-moment matrix accumulates in
    // ONE native aggregate ([[graft.functions.CovSumMicroExpr]]: d²
    // exact micro longs per partition partial, map-side combined — the
    // corpus never shuffles), the 64×64 matrix collects (bounded at
    // any corpus size), and 8 power iterations run driver-side in
    // EXACT long arithmetic — the matrix-vector products are integer
    // multiply-adds; the only doubles are the n-division and the
    // per-step max-abs rescale, each a single mirrored
    // operation — so the oracle's unrolled 8-CTE chain reproduces the
    // eigenvector bit for bit. Sign fixes to first-nonzero-positive;
    // the projection broadcasts back as a per-row in-order fold (the
    // q_ewma list_reduce seed identity).
    "q_pca_project" -> ((s, d) => {
      val emb = embeddings(s, d).select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val n = embCount(s, d)
      val cs = emb.agg(graft.functions.CovSumMicroExpr
        .covSumMicro(col("v")).as("cs")).head.getSeq[Long](0).toArray
      val dim = math.sqrt(cs.length.toDouble).toInt
      val c = cs.map(s0 => math.floor(s0.toDouble / n + 0.5).toLong)
      var v = Array.fill(dim)(1000000L)
      for (_ <- 0 until 8) {
        val w = Array.tabulate(dim) { i =>
          var acc = 0L; var j = 0
          while (j < dim) { acc += c(i * dim + j) * v(j); j += 1 }
          acc
        }
        val mx = w.map(math.abs).max
        v = w.map(wi =>
          math.floor(wi.toDouble / mx.toDouble * 1e6 + 0.5).toLong)
      }
      if (v.find(_ != 0L).exists(_ < 0L)) v = v.map(x => -x)
      val vLit = array(v.map(x => lit(x.toDouble)): _*)
      emb.select(col("vec_id"),
        r(aggregate(zip_with(col("v"), vLit, (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x) / lit(1e6), 4).as("proj"))
    }),

    // Product-quantization ANN (Jégou et al., TPAMI 2011): 64-dim
    // vectors → m=4 subspaces × 8-code books; candidates are ranked by
    // the ADC score Σ_j (2·q_j·c − ‖c‖²) looked up from an m×8 table —
    // at scale the corpus stores only m bytes per vector and the query
    // never touches raw embeddings. Codebooks are seeded literals
    // (production k-means's them) shared with the oracle; code
    // assignment is argmax(dot − ‖c‖²/2) with first-index ties, exactly
    // the IVF rule.
    "q_pq_ann" -> ((s, d) => {
      val m = 4; val sub = 16; val ks = 8
      val books = (0 until m).map(j =>
        Similarity.ivfCentroids(sub, ks, seed = 100 + j))
      val emb = embeddings(s, d)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
      val qv = emb.filter(col("vec_id") === 0)
        .head().getSeq[Double](1).toArray
      // ADC lookup table, driver-side (m×ks doubles — the thing a real
      // engine computes once per query and broadcasts)
      val tbl: Seq[Seq[Double]] = (0 until m).map { j =>
        val qj = qv.slice(j * sub, (j + 1) * sub)
        books(j).map(c => 2.0 * c.zip(qj).map { case (a, b) => a * b }.sum
          - c.map(x => x * x).sum)
      }
      def assign(vecSlice: Column, book: Seq[Array[Double]]): Column = {
        val scored = book.zipWithIndex.map { case (c, i) =>
          val score = Similarity.dot(vecSlice, array(c.map(lit): _*)) -
            lit(c.map(x => x * x).sum / 2)
          struct((score * -1).as("negscore"), lit(i).as("code"))
        }
        least(scored: _*).getField("code")
      }
      val coded = emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id") +: (0 until m).map(j =>
          assign(slice(col("v"), j * sub + 1, sub), books(j))
            .as(s"c$j")): _*)
      val adc = (0 until m).map(j =>
        element_at(array(tbl(j).map(lit): _*), col(s"c$j") + 1))
        .reduce(_ + _)
      coded.select(col("vec_id"), col("c0"), col("c1"), col("c2"),
          col("c3"), r(adc, 4).as("adc_score"))
        .orderBy(col("adc_score").desc, col("vec_id"))
        .limit(10)
    }),

    // Int8 embedding quantization (the storage/serving compression for
    // a 100 TB vector corpus): per-vector symmetric scale, everything
    // integer — micro-unit components, 127·x − q·scale error numerators
    // — so sums are exact longs regardless of aggregation order; only
    // the final reported RMSE divides. Pure scan work.
    "q_embed_quantize" -> ((s, d) =>
      parallelize(embeddings(s, d))
        .select(col("vec_id"),
          expr("transform(cast(embedding AS array<double>), " +
            "x -> cast(floor(x * 1000000 + 0.5) AS bigint))").as("xm"))
        .select(col("vec_id"), col("xm"),
          expr("array_max(transform(xm, x -> abs(x)))").as("vmax"))
        .filter(col("vmax") > 0)
        .select(col("vec_id"), col("vmax"),
          expr("transform(xm, x -> cast(floor(cast(x AS double) * 127.0" +
            " / vmax + 0.5) AS bigint))").as("q"), col("xm"))
        .select(col("vec_id"), col("vmax"),
          expr("transform(arrays_zip(xm, q), " +
            "p -> 127 * p.xm - p.q * vmax)").as("errn"))
        .select(col("vec_id"), col("vmax"),
          expr("aggregate(errn, 0L, (a, e) -> a + e * e)").as("ssen"),
          expr("array_max(transform(errn, e -> abs(e)))").as("maxe"),
          size(col("errn")).as("n"))
        .select(col("vec_id"), col("vmax").as("vmax_micro"),
          r(sqrt(col("ssen").cast("double") / col("n")) / 127.0 / 1e6, 6)
            .as("rmse"),
          r(col("maxe").cast("double") / 127.0 / 1e6, 6)
            .as("max_abs_err"))),

    // Morton/Z-order layout clustering: interleave two 16-bit
    // coordinates (user, value bucket) into one key, cut the keyspace
    // into files on the top 10 bits, and report per-file coordinate
    // spans — the measurable property that makes Z-ordered layouts
    // prune on BOTH dimensions (each file's x and y spans are ~2^11 of
    // a 2^16 domain, vs. one full-range dimension in any single-sort
    // layout). The interleave is 64 codegen'd bit ops per row, no
    // shuffle until the per-file rollup.
    "q_zorder" -> ((s, d) => {
      val base = events(s, d).select(
        (col("user_id") % 65536).cast("long").as("x"),
        (abs(floor(col("value") * 1000)) % 65536).cast("long").as("y"))
      val z = (0 until 16).map(i =>
        shiftleft(shiftrightunsigned(col("x"), i).bitwiseAND(lit(1L)),
          2 * i).bitwiseOR(
          shiftleft(shiftrightunsigned(col("y"), i).bitwiseAND(lit(1L)),
            2 * i + 1)))
        .reduce(_ bitwiseOR _)
      base.withColumn("zfile", shiftrightunsigned(z, 22))
        .groupBy(col("zfile"))
        .agg(count(lit(1)).as("n_rows"),
          (max(col("x")) - min(col("x"))).as("x_span"),
          (max(col("y")) - min(col("y"))).as("y_span"))
    }),

    // Zone-map pruning estimator: per-file min/max on the predicate
    // column under two layouts — natural arrival order (orderkey
    // ranges) vs. shipdate-sorted — and how many 4096-row files a Q1-
    // style date window could skip in each. The layout-quality number a
    // table-format optimizer (clustering/compaction) is judged by.
    // The sorted layout's zone table never ranks a single row: in the
    // (shipdate, orderkey, linenumber) sort, each day occupies the
    // contiguous global-rank span [offset_d, offset_d + dn_d), so a
    // file's row count, d_min and d_max are EXACT interval overlaps of
    // day spans with [4096·f, 4096·(f+1)) — none of them depend on the
    // within-day order. One day-level rollup (~2.5k keys, map-side
    // partials), a prefix sum on that value-domain-sized table, a
    // sequence() explode into ≤ days+files (day, file) overlap rows,
    // and a tiny groupBy replace the r10 corpus-wide per-day
    // row_number window + broadcast join-back + third corpus scan
    // (measured 1.15 s → ~0.45 s at sf0.1; the window form re-shuffled
    // every row just to throw the ranks away at the file rollup).
    "q_zonemap_prune" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1996-03-31").cast("timestamp")
      def zones(df: DataFrame, name: String): DataFrame =
        df.agg(count(lit(1)).as("n_files"),
            sum(when(col("d_max") < lo || col("d_min") > hi, 1L)
              .otherwise(0L)).as("n_pruned"),
            sum(when(!(col("d_max") < lo || col("d_min") > hi),
              col("f_rows")).otherwise(0L)).as("rows_scanned"))
          .select(lit(name).as("layout"), col("n_files"),
            col("n_pruned"), col("rows_scanned"))
      // (a GROUPING SETS ((file),(day)) single-scan fusion of the two
      // rollups measured 0.64 vs 0.66 s min-of-3 — inside noise; the
      // two pruned scans are not the floor, so the simpler form stays)
      val az = lineitem(s, d)
        .select(expr("l_orderkey div 4096").as("file"), col("l_shipdate"))
        .groupBy(col("file"))
        .agg(count(lit(1)).as("f_rows"),
          min(col("l_shipdate")).as("d_min"),
          max(col("l_shipdate")).as("d_max"))
      val wd = Window.orderBy(col("l_shipdate"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = lineitem(s, d).select(col("l_shipdate"))
        .groupBy(col("l_shipdate"))
        .agg(count(lit(1)).as("dn"))
        .withColumn("o", coalesce(sum(col("dn")).over(wd), lit(0L)))
      val bz = off
        .select(col("l_shipdate"), col("o"), col("dn"),
          explode(expr(
            "sequence(o div 4096, (o + dn - 1) div 4096)")).as("file"))
        .groupBy(col("file"))
        .agg(sum(least(expr("(file + 1) * 4096"), col("o") + col("dn"))
            - greatest(expr("file * 4096"), col("o"))).as("f_rows"),
          min(col("l_shipdate")).as("d_min"),
          max(col("l_shipdate")).as("d_max"))
      zones(az, "by_orderkey").unionAll(zones(bz, "shipdate_sorted"))
    }),

    // Contamination detection: training docs sharing any verbatim
    // 5-token span with the "benchmark set" (every 20th doc, the driver
    // data's stand-in for an eval suite). Exact-span semantics — the
    // complement of the probabilistic MinHash/LSH path.
    "q_contamination" -> ((s, d) => {
      val spans = docSpans5(s, d)
      Dedup.spanOverlapFromSpans(
        spans.filter(col("doc_id") % 20 =!= 0),
        spans.filter(col("doc_id") % 20 === 0))
    }),

    // Graded decontamination: per training doc, the fraction of its
    // distinct 5-gram shingles that appear anywhere in the benchmark
    // set, plus the ≥10% contamination flag (integer-exact compare).
    // The benchmark digest set broadcasts — the standard shape when
    // the eval suite is MBs and the corpus is TBs.
    "q_contaminate_ratio" -> ((s, d) => {
      val spans = docSpans5(s, d)
      Dedup.contaminationRatioFromSpans(
        spans.filter(col("doc_id") % 20 =!= 0),
        spans.filter(col("doc_id") % 20 === 0))
    }),

    // SoftDeDup-style duplication-aware training weights (He et al.,
    // arXiv 2024): instead of dropping near-duplicates, downweight —
    // per doc, "commonness" = mean corpus-wide document frequency of
    // its distinct 5-gram spans, and sampling weight = 1/commonness
    // (micro-integerized: weight_micro = floor(n_spans·10⁶/Σocc+0.5),
    // exact from two longs). Rides the SAME persisted docSpans5 index
    // the decontamination family probes (a real pipeline lands that
    // index once), distinct()ed per doc; the occurrence side is
    // corpus-sized so the join-back is pinned shuffle-hash on the
    // 128-bit digest, exactly the q_span_dedup discipline.
    // Dispositions: a window-over-g variant (one fewer exchange)
    // measured inside noise (r10); r11 measured TWO dup-subset
    // rewrites (join only occ ≥ 2 with Σocc = n_spans + Σ(occ−1)
    // reconstitution; then the same with min(doc_id) singles
    // attribution replacing the totals rollup) — 1.56–1.64 s vs
    // 1.21 s min for this form at sf0.1: the dup fraction is 5% so
    // the exchange-volume saving is real, but each variant adds 2–3
    // stages and stage floors dominate at gate scale. KEEP — settled
    // by measurement at the ×100 decade (r12): hash-exact at 500k
    // docs and 11.45 s vs DuckDB 38.59 s (0.30×) — the inversion
    // completes exactly like the rest of the span family
    // (3.0× at sf0.1 → 1.34× at ×10 → 0.30× at ×100, PERF.md).
    "q_softdedup_weights" -> ((s, d) => {
      val spans = docSpans5(s, d).distinct()
      val occ = spans.groupBy(col("g")).agg(count(lit(1)).as("occ"))
      spans.join(occ.hint("shuffle_hash"), "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"), sum(col("occ")).as("sum_occ"))
        .select(col("doc_id"), col("n_spans"), col("sum_occ"),
          floor(col("n_spans").cast("double") * lit(1e6) /
            col("sum_occ").cast("double") + lit(0.5)).cast("long")
            .as("weight_micro"))
    }),

    // PII scrub: emails and long digit runs redacted with typed
    // placeholders; output is the scrubbed text's md5 so the oracle
    // compares the full rewrite without hauling text through the gate.
    "q_pii_scrub" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        md5(TextAnalysis.scrubPii(col("text"))).as("scrubbed_md5"),
        (TextAnalysis.scrubPii(col("text")) =!= col("text"))
          .as("was_scrubbed"))),

    // Bloom-gated decontamination: the docs sharing NO verbatim 5-gram
    // with the benchmark set, via Bloom pre-filter + exact verify (no
    // false negatives ⇒ bit-identical to the plain anti-join the
    // oracle computes, at fp-fraction of the join volume).
    "q_bloom_decontam" -> ((s, d) => {
      val spans = docSpans5(s, d)
      Dedup.bloomDecontaminateFromSpans(
        spans.filter(col("doc_id") % 20 =!= 0),
        spans.filter(col("doc_id") % 20 === 0))
    }),

    // Corpus-ingest normalization, self-validating: each doc's text is
    // deterministically dirtied (doubled spaces / tab runs / injected
    // control + combining-mark + zero-width chars, by doc_id mod 3),
    // then normalizeText (zero-width strip → native NFC → whitespace
    // collapse → trim) must reconstruct the original (case 2 gains the
    // NFC-composed 'é' — proof the composition actually ran). Pure
    // per-row codegen'd rewrite: nothing shuffles at any scale.
    "q_text_normalize" -> ((s, d) => {
      val m = col("doc_id") % 3
      val dirty = when(m === 0,
          concat(lit("  "), regexp_replace(col("text"), " ", "  ")))
        .when(m === 1,
          concat(regexp_replace(col("text"), " ", "\t "), lit("\t")))
        .otherwise(concat(lit("\u0001"), col("text"),
          lit(" e\u0301\u200B"))) // decomposed e+acute, then zero-width
      val expected = when(m === 2,
        concat(col("text"), lit(" \u00e9"))).otherwise(col("text"))
      parallelize(documents(s, d))
        .select(col("doc_id"), col("text"), dirty.as("dirty"),
          expected.as("exp"))
        .select(col("doc_id"),
          length(col("dirty")).as("n_dirty_chars"),
          TextAnalysis.normalizeText(col("dirty")).as("norm_text"),
          (TextAnalysis.normalizeText(col("dirty")) === col("exp"))
            .as("restored"))
    }),

    // n-gram Jaccard over deterministic pairs (consecutive doc ids) — the
    // LSH-verification kernel with an easily-oracled pair set. Shingle
    // arrays are materialized once per doc BEFORE the self-join (not once
    // per pair side) and the intersection is computed once — profiled 4×
    // cheaper than inlining Dedup.jaccard over raw text columns.
    "q_jaccard_pairs" -> ((s, d) => {
      val sh = parallelize(documents(s, d))
        .select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
      val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sa"))
      val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sb"))
      val inter = graft.functions.StringSim
      .intersectCount(col("sa"), col("sb")).cast("double")
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"),
          r(inter / (size(col("sa")) + size(col("sb")) - inter), 6)
            .as("jaccard"))
    }),

    // Embedding-cosine near-dup: SRP-bucket blocking (same 6-bit bucket)
    // → exact cosine on candidates → threshold. The blocked-join shape is
    // the 100 TB formulation (never all-pairs); the oracle reproduces the
    // EXACT same blocking by embedding the seeded hyperplanes as SQL
    // literals, so bucket assignment and sim agree bit-for-bit.
    "q_embed_neardup" -> ((s, d) => {
      val emb = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("bucket",
          Similarity.srpBucket(col("v"), 64, annBits(embCount(s, d))))
      val mat = emb.localCheckpoint(false)
      val a = mat.select(col("vec_id").as("id_a"), col("v").as("va"),
        col("bucket"))
      val b = mat.select(col("vec_id").as("id_b"), col("v").as("vb"),
        col("bucket").as("bucket_b"))
      a.join(b, col("bucket") === col("bucket_b") &&
          col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          r(Similarity.cosine(col("va"), col("vb")), 4).as("sim"))
        .filter(col("sim") >= 0.2)
    }),

    // ---- similarity search ---------------------------------------------
    "q_cosine_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
      emb.crossJoin(broadcast(q)).filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          r(Similarity.cosine(col("v"), col("qv")), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // MMR (maximal-marginal-relevance) diversified re-ranking — the
    // retrieval op between similarity search and the training batch:
    // take the relevance top-k, then greedily swap redundancy for
    // diversity (score = λ·rel − (1−λ)·max sim to the already-picked,
    // λ = 0.7). The distributed half is exactly q_cosine_topk's scan →
    // project(sim) → TakeOrderedAndProject shortlist (all vectors
    // stream through map tasks; 20 survive); the greedy selection is
    // O(k·|shortlist|) on the bounded collect — the production shape,
    // where ANN prunes and MMR reranks the pool. Every comparison is
    // INTEGER: cosines floor to deci-milli units (the r(·,4) gate
    // convention), λ scales to 7/3, ties break on vec_id — so the
    // pick sequence is engine-exact against the oracle's five chained
    // MATERIALIZED CTEs.
    "q_mmr_rerank" -> ((s, d) => {
      val emb = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>")
          .as("v"))
      val q = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
      val pool = emb.crossJoin(broadcast(q)).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("v"),
          floor(Similarity.cosine(col("v"), col("qv")) * lit(10000.0))
            .cast("long").as("rel"))
        .orderBy(col("rel").desc, col("vec_id")).limit(20)
        .collect() // bounded: the k-sized rerank shortlist
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
          r.getLong(2)))
      def cosDm(a: Array[Double], b: Array[Double]): Long = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          val x = a(i); val y = b(i)
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000.0)
          .toLong
      }
      val selected = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Array[Double], Long, Long, Long)]
      val remaining = scala.collection.mutable.ArrayBuffer(pool: _*)
      for (rank <- 1L to math.min(5L, pool.length.toLong)) {
        val scored = remaining.map { case (id, v, rel) =>
          val ms = if (selected.isEmpty) 0L
            else selected.map(sl => cosDm(v, sl._3)).max
          (id, v, rel, ms, 7L * rel - 3L * ms)
        }
        val best = scored.minBy(x => (-x._5, x._1))
        selected += ((rank, best._1, best._2, best._3, best._4, best._5))
        val idx = remaining.indexWhere(_._1 == best._1)
        remaining.remove(idx)
      }
      s.createDataFrame(selected.toSeq.map(x =>
          (x._1, x._2, x._4, x._5, x._6)))
        .toDF("rnk", "vec_id", "rel_dm", "maxsim_dm", "mmr_score")
    }),

    // Top-PMI bigram association table — the collocation view (which
    // word pairs co-occur beyond chance) used for phrase mining and
    // tokenizer diagnostics. All counts are exact longs; the PMI is
    // one identical double expression over them, micro-nat integerized
    // — the q_ngram_lm recipe for hash-stable "floats".
    "q_pmi_bigrams" -> ((s, d) => {
      val toks = parallelize(documents(s, d))
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
      val bi = toks
        .select(explode(sequence(lit(0), size(col("t")) - 2)).as("i"),
          col("t"))
        .select(element_at(col("t"), col("i") + 1).as("w1"),
          element_at(col("t"), col("i") + 2).as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
        .localCheckpoint(false)
      val uni = parallelize(documents(s, d))
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val nBi = bi.agg(sum(col("c2")).as("n_bi"))
      val nTok = uni.agg(sum(col("cw")).as("n_tok"))
      bi.join(broadcast(uni.withColumnRenamed("w", "w1")
          .withColumnRenamed("cw", "cw1")), "w1")
        .join(broadcast(uni.withColumnRenamed("w", "w2")
          .withColumnRenamed("cw", "cw2")), "w2")
        .crossJoin(broadcast(nBi)).crossJoin(broadcast(nTok))
        .select(col("w1"), col("w2"), col("c2"),
          floor(log(col("c2").cast("double") *
              col("n_tok").cast("double") * col("n_tok").cast("double") /
              (col("n_bi").cast("double") * col("cw1").cast("double") *
                col("cw2").cast("double"))) * 1e6 + 0.5)
            .cast("long").as("pmi_micro"))
        .orderBy(col("c2").desc, col("w1"), col("w2"))
        .limit(30)
    }),

    // Per-source vocabulary overlap (consecutive source pairs) — the
    // distribution-shift check between corpus slices. Vocabularies are
    // bounded (collect_set per source); at 100 TB the same query runs
    // on KMV sketches per source instead of exact sets.
    "q_vocab_overlap" -> ((s, d) => {
      val v = parallelize(documents(s, d))
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .distinct()
        .groupBy(col("source"))
        .agg(collect_set(col("w")).as("vocab"))
        .withColumn("sidx",
          substring(col("source"), 4, 10).cast("int"))
      val a = v.select(col("source").as("src_a"), col("sidx"),
        col("vocab").as("va"))
      val b = v.select(col("sidx").as("sb"), col("source").as("src_b"),
        col("vocab").as("vb"))
      val inter = graft.functions.StringSim
        .intersectCount(col("va"), col("vb")).cast("double")
      a.join(b, col("sb") === col("sidx") + 1)
        .select(col("src_a"), col("src_b"),
          size(col("va")).as("n_a"), size(col("vb")).as("n_b"),
          r(inter / (size(col("va")) + size(col("vb")) - inter), 6)
            .as("jaccard"))
    }),

    // KMV-sketch vocabulary overlap — the 100 TB form of
    // q_vocab_overlap (whose exact plan materializes every source's
    // FULL vocabulary through collect_set): sketch each source's
    // token-hash set with the bottom-k KMV (one pass, ≤ k longs per
    // map-side partial), then estimate Jaccard from the SKETCHES
    // alone with the standard KMV estimator — the k smallest of the
    // union of the two sketches, counting how many live in both
    // (Beyer et al., SIGMOD 2007). Everything after the sketch is
    // integer set arithmetic over 2k longs per source pair, so the
    // estimate is deterministic and the oracle reproduces it
    // bit-for-bit; when a source's set fits inside k the estimator
    // degenerates to EXACT Jaccard (see QueryInvariantsSpec). The set
    // is the 2-gram shingle vocabulary, not single words — the
    // corpus's word vocabulary (~31/source) would be trivially inside
    // any k, while ~900 distinct bigrams per source keep the sketch
    // path live (k < |set|) from sf0.1 up.
    "q_kmv_overlap" -> ((s, d) => {
      val k = 256
      val sk = parallelize(documents(s, d))
        .select(col("source"),
          explode(Dedup.shingles(col("text"), 2)).as("g"))
        .select(col("source"),
          conv(substring(md5(col("g")), 1, 12), 16, 10)
            .cast("long").as("h"))
        .groupBy(col("source"))
        .agg(graft.functions.KmvSketchExpr.kmv(col("h"), k).as("sk"))
        .withColumn("sidx", substring(col("source"), 4, 10).cast("int"))
      val a = sk.select(col("source").as("src_a"), col("sidx"),
        col("sk").as("ska"))
      val b = sk.select(col("sidx").as("sb"), col("source").as("src_b"),
        col("sk").as("skb"))
      val unionK =
        slice(array_sort(array_union(col("ska"), col("skb"))), 1, k)
      val matches = size(array_intersect(unionK,
        array_intersect(col("ska"), col("skb"))))
      a.join(b, col("sb") === col("sidx") + 1)
        .select(col("src_a"), col("src_b"),
          size(col("ska")).as("k_a"), size(col("skb")).as("k_b"),
          matches.cast("long").as("n_match"),
          r(matches.cast("double") / size(unionK), 6).as("jaccard_est"))
    }),

    // Keyword-in-context (concordance) extraction — the corpus
    // inspection tool behind "show me how this term is used": every
    // occurrence of the probe term with ±3 words of context, in
    // position order. Narrow generate + row-local slices, no shuffle;
    // the probe would be a pushed-down contains() pre-filter at scale.
    "q_concordance" -> ((s, d) => {
      val term = "join"; val ctx = 3
      parallelize(documents(s, d))
        .filter(col("text").contains(term)) // cheap pre-filter before split
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("tk"),
          posexplode(col("tk")).as(Seq("pos", "tok")))
        .filter(col("tok") === term)
        .select(col("doc_id"), col("pos").cast("int").as("pos"),
          array_join(slice(col("tk"),
            greatest(col("pos") + 1 - ctx, lit(1)).cast("int"),
            (col("pos") + 1 + ctx -
              greatest(col("pos") + 1 - ctx, lit(1)) + 1).cast("int")), " ")
            .as("context"))
    }),

    // Per-dimension embedding statistics — the drift/health check an
    // embedding pipeline monitors (a dimension whose mean or variance
    // moves is a model or preprocessing change). Elements are
    // integerized to micro-units FIRST so the sums are exact longs
    // (associative — no float-order hash drift); mean/std derive from
    // the exact sums with an identical double expression on both
    // engines. One narrow posexplode, one dim-keyed aggregation.
    "q_embed_stats" -> ((s, d) => {
      val e = parallelize(embeddings(s, d))
        .select(posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "x")))
        .select(col("dim"),
          floor(col("x") * 1e6 + 0.5).cast("long").as("xi"))
      e.groupBy(col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(col("xi")).as("s"), sum(col("xi") * col("xi")).as("ssq"))
        .select(col("dim"), col("n"),
          r(col("s").cast("double") / col("n") / 1e6, 6).as("mean"),
          r(sqrt((col("ssq").cast("double") -
              col("s").cast("double") * col("s").cast("double") / col("n"))
            / col("n")) / 1e6, 6).as("std"))
    }),

    "q_vec_norm" -> ((s, d) =>
      embeddings(s, d).select(col("vec_id"),
        r(Similarity.norm(col("embedding").cast("array<double>")), 6)
          .as("nrm"))),

    // SRP-LSH ANN, query-directed multi-probe — hash-checked: the
    // oracle re-derives the full probe sequence (base bucket,
    // margin-ordered single flips, pairwise flips) from the hyperplane
    // literals in SQL (see annProbeCtes). Lookup-style op: the single
    // query vector is fetched driver-side, probe buckets are literals
    // pushed into the scan filter.
    "q_ann_lsh" -> ((s, d) => {
      val emb = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val qv = emb.filter(col("vec_id") === 0)
        .head().getSeq[Double](1).toArray
      val bits = annBits(embCount(s, d))
      Similarity.annSearch(emb.filter(col("vec_id") =!= 0),
          col("vec_id"), col("v"), qv, dim = 64, nBits = bits,
          nProbes = annProbes(bits), k = 20)
        .select(col("vec_id"), r(col("sim"), 4).as("sim"))
    }),

    // Recall@k of the multi-probe ANN vs exact brute force — the quality
    // of the index is a measured number, not an assertion. Deterministic
    // (seeded hyperplanes, fixed query); hash-checked (both sides of the
    // intersection recomputed in SQL).
    // On THIS synthetic table (near-uniform vectors, top cosines ~0.37 —
    // LSH's worst case) it measures ~0.5 at a 25% scan fraction;
    // SimilaritySpec proves ≥0.9 at the same bits/probes on clustered
    // embeddings, the realistic distribution.
    "q_ann_recall" -> ((s, d) => {
      val emb = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val qv = emb.filter(col("vec_id") === 0)
        .head().getSeq[Double](1).toArray
      val cand = emb.filter(col("vec_id") =!= 0)
      val k = 10
      val bits = annBits(embCount(s, d))
      val probes = annProbes(bits)
      val qCol = array(qv.map(lit): _*)
      val bf = Similarity.bruteForceTopK(cand, col("vec_id"), col("v"),
        qCol, k).select(col("vec_id"))
      val ann = Similarity.annSearch(cand, col("vec_id"), col("v"), qv,
        dim = 64, nBits = bits, nProbes = probes, k = k)
        .select(col("vec_id"))
      ann.join(bf, "vec_id")
        .agg(count(lit(1)).as("n_overlap"))
        .select(lit(k).as("k"), col("n_overlap"),
          (col("n_overlap") / k).as("recall"),
          lit(probes.toDouble / (1 << bits)).as("scan_frac"))
    }),

    // BATCHED ANN — the production retrieval shape: a TABLE of query
    // vectors (ids 0-4) against the bucketed corpus in ONE pass. The
    // corpus is bucketed once; the query rows broadcast with their base
    // buckets; a bucket-equality join prunes candidates; exact cosine
    // re-ranks; per-query top-k runs through the custom TopKPerKey
    // operator (bounded per-key heaps, one exchange) — never a
    // per-query corpus scan, never a global sort. Single probe per
    // query (the oracle-expressible config; the query-directed
    // multi-probe order is driver-side, see q_ann_lsh).
    "q_ann_batch" -> ((s, d) => {
      val bits = annBits(embCount(s, d))
      val emb = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("bucket", Similarity.srpBucket(col("v"), 64, bits))
      val qs = broadcast(emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("bucket").as("qb")))
      val cands = emb.filter(col("vec_id") >= 5)
        .join(qs, col("bucket") === col("qb"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosine(col("v"), col("qv")).as("sim"))
      graft.plans.TopKPerKey(cands, Seq("qid"),
          Seq(("sim", true), ("vec_id", false)), k = 10)
        .select(col("qid"), col("vec_id"), r(col("sim"), 4).as("sim"))
    }),

    // SemDeDup-style semantic dedup: k-means cells as the blocking
    // structure (the same corpus-scaled occupancy rule as the SRP/IVF
    // blocking — k grows with n so within-cell pair counts stay
    // bounded), exact cosine within a cell, keep-min-id per near-dup
    // neighborhood. The oracle re-derives k = max(4, n/125) and the
    // same seeded-k-means construction as q_kmeans_embed from count(*),
    // so the hash gate holds at every SF.
    "q_semdedup" -> ((s, d) => {
      val emb = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val k = math.max(4, (embCount(s, d) / 125).toInt)
      val (assign, _) = Similarity.kmeans(emb, col("vec_id"), col("v"),
        k, iters = 2)
      // assignment materialized once (localCheckpoint, the
      // q_embed_neardup pattern) before the within-cell self-join
      val mat = emb.join(
          assign.select(col("id").as("vec_id"), col("cluster_id")),
          "vec_id")
        .localCheckpoint(false)
      val a = mat.select(col("cluster_id"), col("vec_id").as("id_a"),
        col("v").as("va"))
      val b = mat.select(col("cluster_id").as("cb"),
        col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(b, col("cluster_id") === col("cb") &&
          col("id_a") < col("id_b"))
        .filter(r(Similarity.cosine(col("va"), col("vb")), 4) >= 0.3)
        .groupBy(col("id_b"))
        .agg(min(col("id_a")).as("kept_id"), count(lit(1)).as("n_near"))
        .select(col("id_b").as("dup_id"), col("kept_id"), col("n_near"))
    }),

    // IVF-bucketed ANN, single-probe (the oracle-expressible config;
    // multi-probe via Similarity.ivfProbes is the production path):
    // assign every vector to its max-dot centroid cell, scan only the
    // query's cell, exact-cosine re-rank. Deterministic seeded centroids
    // → the DuckDB oracle reproduces the cell argmax from the same
    // literals, so this one IS hash-checked (unlike SRP multi-probe,
    // whose query-directed probe list is driver-side).
    "q_ann_ivf" -> ((s, d) => {
      // two-level (coarse-quantized) assignment since round 11: flat
      // argmax over cells ∝ n centroids is n·cells dots — QUADRATIC in
      // corpus size (measured ×11.8 wall for ×4 vectors at the
      // 128k-vector decade); the ⌊√cells⌋ coarse level cuts it to
      // n·2√cells with per-cell occupancy (probe cost) unchanged
      val nCells = ivfCells(embCount(s, d))
      val cents = Similarity.ivfCentroids(64, nCells)
      val coarse = Similarity.ivfCoarse(64, nCells)
      val emb = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val qv = emb.filter(col("vec_id") === 0)
        .head().getSeq[Double](1).toArray
      val qCell = Similarity.ivfProbesTwoLevel(qv, cents, coarse, 1).head
      val qCol = array(qv.map(lit): _*)
      emb.filter(col("vec_id") =!= 0)
        .withColumn("cell",
          Similarity.ivfAssignTwoLevel(col("v"), cents, coarse))
        .filter(col("cell") === qCell)
        .select(col("vec_id"),
          r(Similarity.cosine(col("v"), qCol), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // Multi-probe IVF (nprobe=2) under the two-level quantizer: probe
    // the within-group best cell of the query's TWO best coarse groups,
    // exact-cosine re-rank across both — the production recall/scan
    // knob is "probe more coarse lists", never "re-scan the corpus".
    // Hash-checked like q_ann_ivf: the oracle re-derives both coarse
    // argmaxes (mask-the-winner second pass) and both within-group cell
    // argmaxes from the same centroid/coarse literals (first-max
    // tie-breaking at every level in both engines).
    "q_ann_ivf_probe" -> ((s, d) => {
      val nCells = ivfCells(embCount(s, d))
      val cents = Similarity.ivfCentroids(64, nCells)
      val coarse = Similarity.ivfCoarse(64, nCells)
      val emb = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val qv = emb.filter(col("vec_id") === 0)
        .head().getSeq[Double](1).toArray
      val probes = Similarity.ivfProbesTwoLevel(qv, cents, coarse, 2)
      val qCol = array(qv.map(lit): _*)
      emb.filter(col("vec_id") =!= 0)
        .withColumn("cell",
          Similarity.ivfAssignTwoLevel(col("v"), cents, coarse))
        .filter(col("cell").isin(probes: _*))
        .select(col("vec_id"), col("cell"),
          r(Similarity.cosine(col("v"), qCol), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // K-means over the embedding corpus (2 Lloyd iterations,
    // deterministic first-k seeding) — the IVF coarse-quantizer
    // TRAINING step: assignment is the native ArgMaxDot over centroids
    // augmented with a -||c||²/2 bias term (argmin L2 == argmax of the
    // augmented dot), so the per-row hot loop is one compiled call;
    // per-cluster means reuse the VecMean TypedImperativeAggregate
    // (map-side partials). Centroids collect to the driver between
    // iterations — k rows, the same driver-scale as any k-means — and
    // are re-broadcast as expression literals. Element-wise means are
    // 1e-6-rounded on BOTH engines so cross-engine summation order
    // cannot flip an assignment.
    "q_kmeans_embed" -> ((s, d) => {
      val (assign, cents) = Similarity.kmeans(embeddings(s, d),
        col("vec_id"), col("embedding"),
        k = math.max(4, (embCount(s, d) / 125).toInt), iters = 2)
      def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
      val stats = s.createDataFrame(cents.map { case (cid, c) =>
        (cid, c(0), r6(math.sqrt(c.map(x => x * x).sum)))
      }).toDF("cluster_id", "c_first", "c_norm")
      assign.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_vecs"))
        .join(broadcast(stats), "cluster_id")
        .select(col("cluster_id"), col("n_vecs"), col("c_first"),
          col("c_norm"))
    }),

    // Bucket-occupancy skew guard over the SRP blocking (bits scaled by
    // corpus size): the histogram that must be CHECKED before trusting a
    // blocked self-join at a new scale — a hot bucket is quadratic
    // blowup. Exact p99 here for oracle parity; the operator's default
    // is the one-pass percentile_approx sketch.
    "q_bucket_occupancy" -> ((s, d) => {
      val emb = embeddings(s, d)
        .select(col("embedding").cast("array<double>").as("v"))
      val bits = annBits(embCount(s, d))
      Similarity.bucketOccupancy(emb,
          Similarity.srpBucket(col("v"), 64, bits), exactP99 = true)
        .select(col("n_buckets"), col("max_bucket"),
          r(col("p99_bucket")).as("p99_bucket"),
          r(col("avg_bucket")).as("avg_bucket"))
    }),

    // ---- multimodal -----------------------------------------------------
    "q_media_meta" -> ((s, d) =>
      MultiModal.withBinaryMeta(
        MultiModal.asMediaTable(documents(s, d), "doc_id", "text"))
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("header_hex"))),

    // REAL container decode: BMP via javax.imageio, WAV via RIFF parse
    // (video stays an opaque chunk stream — no pure-JVM codec). The
    // oracle recomputes the decoded facts arithmetically from doc_id,
    // so a wrong decode (not just a wrong label) fails the hash gate.
    "q_media_decode" -> ((s, d) =>
      MultiModal.decodeMedia(
          MultiModal.asRealMediaTable(documents(s, d), "doc_id"))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"), col("duration_ms"))),

    // REAL feature extraction over decoded rasters / PCM samples —
    // hash-checked: the deterministic fixture generators make the
    // decoded raster bytes / PCM amplitudes arithmetically
    // reconstructible, so DuckDB recomputes mean/peak over the exact
    // sample sets (BMP row padding excluded, all 3 bands summed).
    "q_media_features" -> ((s, d) =>
      MultiModal.extractFeatures(
          MultiModal.asRealMediaTable(documents(s, d), "doc_id"))
        .toDF()
        .select(col("media_id"), col("kind"),
          r(col("mean_sample"), 4).as("mean_sample"), col("peak_sample"))),

    "q_media_frames" -> ((s, d) => {
      import s.implicits._
      val media = MultiModal.asMediaTable(documents(s, d), "doc_id", "text")
        .as[MultiModal.MediaRow]
      MultiModal.sampleFrames(media, frameBytes = 64, stride = 2)
        .select(col("media_id"), col("frame_idx"),
          octet_length(col("frame_payload")).cast("long").as("frame_bytes"))
    }),

    // REAL multi-frame decode: deterministic animated GIFs (JDK-encoded)
    // → every 2nd frame decoded by the JDK's GIF reader → each decoded
    // frame's DIMENSIONS re-read from the re-encoded BMP payload. The
    // oracle recomputes frame indices and dimensions arithmetically, so
    // a sampler that faked the decode (or returned wrong frames) fails
    // the hash gate. 1-in-10 ids keeps the fixture-encode cost bounded.
    "q_video_frames" -> ((s, d) => {
      import s.implicits._
      val gifs = MultiModal.asGifMediaTable(
        documents(s, d).filter(col("doc_id") % 10 === 0), "doc_id")
      val frames = MultiModal.sampleFrames(gifs, frameBytes = 64, stride = 2)
        .select(col("media_id"), col("frame_idx"), col("frame_payload"))
        .as[(Long, Int, Array[Byte])]
      MultiModal.decodeMedia(
          frames.map { case (id, f, p) =>
            MultiModal.MediaRow(id * 1000 + f, "image", p)
          })
        .toDF()
        .select((col("media_id") / 1000).cast("long").as("media_id"),
          (col("media_id") % 1000).cast("int").as("frame_idx"),
          col("width").as("w"), col("height").as("h"))
    }),

    // Image dedup by perceptual hash: real BMP payloads → header-driven
    // raster decode → 60-bit average hash → exact-hash clusters. The
    // "logo" fixture replays a small recurring image set across many
    // docs (the crawl reality image dedup exists for), so clusters have
    // real multiplicity at every scale. 100 TB shape: the shuffle
    // carries (media_id, 8-byte hash) pairs only — payload bytes never
    // leave the decode stage — and the rollup output is
    // distinct-image-sized, not corpus-sized. The oracle reconstructs
    // the raster arithmetically from the fixture law and re-packs the
    // same 60 bits, so a wrong decode, sample order, or threshold
    // comparison fails the hash gate.
    "q_image_dedup" -> ((s, d) => {
      val media = MultiModal.asLogoMediaTable(
        parallelize(documents(s, d)), "doc_id")
      MultiModal.imageAHash(media)
        .groupBy(col("ahash"))
        .agg(count(lit(1)).as("n_images"),
          min(col("media_id")).as("rep_id"))
    }),

    // Record linkage at the 100 TB shape: collapse rows to DISTINCT
    // entity names FIRST (the name-frequency table — value space, not
    // row space), block on the leading token, and Jaro-Winkler-verify
    // only within blocks — through the grid-decomposed pair join below,
    // so a hot block (a "the"/brand leading token on a web-scale name
    // table) is spread across C×C-bounded cells instead of handing one
    // task O(B²) verify work. The verify runs through the native
    // codegen'd JaroWinklerExpr; support counts tie matches back to row
    // multiplicity. The oracle's jaro_winkler_similarity is
    // bit-identical to the expression (StringSimSpec pins the
    // conventions), so both the >= 0.8 cut and the rounded score match
    // exactly. NOTE a LENGTH bucket cannot losslessly tighten blocking
    // at τ=0.8: jw ≥ 0.8 forces jaro > 0.7 (the boost gate), which
    // bounds only min/max length > 0.1 — a factor-10 band that prunes
    // nothing real; bounded-cell decomposition is the sound de-skew.
    "q_jaro_link" -> ((s, d) =>
      jaroLinkEdges(s, d)
        .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"),
          r(graft.functions.StringSim.jaroWinkler(
            col("name_a"), col("name_b")), 6).as("jw"))),

    // Entity resolution END TO END: the blocked+verified Jaro-Winkler
    // edge set above → connected components (the batched
    // graph-contraction CC, same machinery as q_dedup_clusters —
    // min-label over STRING ids, driver state bounded to loop control)
    // → survivorship per entity cluster: canonical name by (support
    // DESC, name ASC) via one min(struct) aggregate (no window sort),
    // membership and row-mass rollups. This is the operator a linkage
    // pipeline actually ships: blocks bound the verify, the grid
    // bounds the blocks, CC stitches transitive matches, survivorship
    // picks the record to keep.
    "q_linkage_clusters" -> ((s, d) => {
      val edges = jaroLinkEdges(s, d)
        .select(col("name_a").as("id_a"), col("name_b").as("id_b"))
      val cl = Dedup.duplicateClusters(edges)
        .select(col("doc_id").as("nm"), col("cluster_id"))
      val names = part(s, d)
        .groupBy(col("p_name").as("nm"))
        .agg(count(lit(1)).as("support"))
      cl.join(names, "nm")
        .groupBy(col("cluster_id"))
        .agg(
          min(struct((col("support") * -1).as("ns"), col("nm")))
            .getField("nm").as("canonical_nm"),
          count(lit(1)).as("n_names"),
          sum(col("support")).as("total_support"))
    }),

    // BLEU-2 between consecutive-doc pairs (Papineni et al. 2002):
    // modified (clipped) n-gram precisions p1/p2 of the candidate
    // (id_b) against the reference (id_a), brevity penalty when the
    // candidate is shorter, geometric mean via sqrt — BLEU = 0 when
    // either clipped overlap is empty (the unsmoothed sentence
    // definition). Reuses the rouge pair machinery verbatim
    // (gramPairJoin: per-doc MAP<fnv64,count> gram maps folded by the
    // native GramCountsExpr, pairs reduced by MapClipSumExpr — no
    // gram-level exchange anywhere); the single transcendental (the
    // BP exp) is floor-rounded at 6 places like every float output.
    "q_bleu_pairs" -> ((s, d) => {
      import graft.functions.GramExprs
      val j = gramPairJoin(s, d)
        .select(col("id_a"), col("id_b"),
          GramExprs.mapClipSum(col("m1a"), col("m1b")).as("ov1"),
          GramExprs.mapClipSum(col("m2a"), col("m2b")).as("ov2"),
          col("na"), col("nb"))
      val p1 = when(col("nb") > 0,
        col("ov1").cast("double") / col("nb")).otherwise(lit(0.0))
      val p2 = when(col("nb") - 1 > 0,
        col("ov2").cast("double") / (col("nb") - 1)).otherwise(lit(0.0))
      val bp = when(col("nb") >= col("na"), lit(1.0))
        .otherwise(exp(lit(1.0) -
          col("na").cast("double") / col("nb").cast("double")))
      val bleu = when(col("ov1") > 0 && col("ov2") > 0,
        bp * sqrt(p1 * p2)).otherwise(lit(0.0))
      j.select(col("id_a"), col("id_b"),
        r(p1, 6).as("p1"), r(p2, 6).as("p2"),
        r(bp, 6).as("bp"), r(bleu, 6).as("bleu"))
    }),

    // ROUGE-1/ROUGE-2 between consecutive-doc pairs: CLIPPED n-gram
    // overlap (multiset min of per-gram counts — the eval-metric
    // semantics, distinct from q_jaccard_pairs' set semantics), with
    // precision against the candidate (id_b), recall against the
    // reference (id_a), and their F1. The metric is per-PAIR, so the
    // gram work lives IN the row: each doc folds to MAP<fnv64, count>
    // via the native one-pass GramCountsExpr (the CdcChunksExpr
    // pattern) and each consecutive pair reduces two maps with
    // MapClipSumExpr — the gram stream NEVER exists as rows, so there
    // is no gram-level exchange anywhere (the r9 shape shuffled the
    // exploded gram stream twice and self-joined it). The only join is
    // the doc_id+1 self-join of map-valued rows: at scale that is one
    // co-partitioned exchange whose volume equals the gram maps;
    // per-doc totals are n / n−1 scan-side projections. P/R/F1 are
    // single identically-ordered double expressions over exact longs,
    // rounded by the shared floor recipe.
    "q_rouge_pairs" -> ((s, d) => {
      import graft.functions.GramExprs
      val j = gramPairJoin(s, d)
        .select(col("id_a"), col("id_b"), explode(array(
          struct(lit("rouge1").as("metric"),
            GramExprs.mapClipSum(col("m1a"), col("m1b")).as("ov"),
            col("na").as("ta"), col("nb").as("tb")),
          struct(lit("rouge2").as("metric"),
            GramExprs.mapClipSum(col("m2a"), col("m2b")).as("ov"),
            greatest(col("na") - 1, lit(0L)).as("ta"),
            greatest(col("nb") - 1, lit(0L)).as("tb")))).as("e"))
        .select(col("id_a"), col("id_b"), col("e.metric").as("metric"),
          col("e.ov").as("ov"), col("e.ta").as("ta"), col("e.tb").as("tb"))
      val p = when(col("tb") > 0, col("ov") / col("tb")).otherwise(lit(0.0))
      val rr = when(col("ta") > 0, col("ov") / col("ta")).otherwise(lit(0.0))
      val f1 = when(col("ov") > 0,
        lit(2.0) * (col("ov") / col("tb")) * (col("ov") / col("ta")) /
          ((col("ov") / col("tb")) + (col("ov") / col("ta"))))
        .otherwise(lit(0.0))
      j.select(col("id_a"), col("id_b"), col("metric"),
        r(p, 6).as("p"), r(rr, 6).as("rec"), r(f1, 6).as("f1"))
    }),

    // Skip-gram training-pair generation (the word2vec preprocessing
    // step): drop the 3 most-frequent words (deterministic variant of
    // frequency subsampling — rank ties broken by word), re-rank the
    // surviving token stream per doc, then emit (center, context) pairs
    // within window 2 over the COMPACTED stream (word2vec windows move
    // over the subsampled text, not the original positions). Pair
    // generation is an equi-join on (doc_id, rn + k), k exploded from
    // [1, 2]; output is vocabulary² bounded, not corpus-sized.
    "q_skipgrams" -> ((s, d) => {
      // the symmetrized pair table is ONE aggregation over the 4-slot
      // occurrence stream (each position emits its two context words in
      // both directions) — no token self-join, no checkpoint, no
      // union/re-group: count(center, context) directly sums the two
      // directed multiplicities
      skipgramLeadPairs(s, d)
        .groupBy(col("center"), col("context"))
        .agg(count(lit(1)).as("n_pairs"))
    }))

  /** Shared ANN oracle CTEs (bits/probes derived from count(*) via
    * ann_p, planes from the ann_pl envelope): reproduces
    * Similarity.srpProbes EXACTLY in SQL — base bucket from the
    * plane-projection signs, bit order by ascending |margin| (ties by
    * bit index, like Scala's stable sortBy), then base / single-bit
    * flips / pairwise flips in generation order, first `probes` taken
    * (the 1+b+b(b−1)/2 candidates are all distinct, so Scala's
    * `.distinct` is a no-op). Every arithmetic step is exact int/xor
    * or an identically-ordered double op, so probe lists agree
    * bit-for-bit at every SF.
    */
  /** Shared bigram-NLL CTE chain ending at
    * `perdoc(doc_id, n_bigrams, nll_sum_micro)` — the SQL mirror of
    * [[ngramDocNll]], shared by the q_ngram_lm and q_ppl_buckets
    * oracles.
    */
  private def ngramNllCtes: String =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents
      |           WHERE len(string_split(text, ' ')) >= 2),
      |bi AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2,
      |         count(*) AS c
      |       FROM (SELECT doc_id, toks,
      |               unnest(generate_series(1, len(toks) - 1)) AS i
      |             FROM t)
      |       GROUP BY 1, 2, 3),
      |b2 AS (SELECT w1, w2, cast(sum(c) AS bigint) AS c2
      |       FROM bi GROUP BY 1, 2),
      |u1 AS (SELECT w1, cast(sum(c2) AS bigint) AS c1
      |       FROM b2 GROUP BY 1),
      |s AS (SELECT bi.doc_id, bi.c,
      |        cast(floor(-ln(cast(b2.c2 AS double)/c1)*1000000 + 0.5)
      |          AS bigint) AS nll_micro
      |      FROM bi JOIN b2 USING (w1, w2) JOIN u1 USING (w1)),
      |perdoc AS (SELECT doc_id, cast(sum(c) AS bigint) AS n_bigrams,
      |             cast(sum(c*nll_micro) AS bigint) AS nll_sum_micro
      |           FROM s GROUP BY doc_id)""".stripMargin

  /** The command surface the responder serves + two Set commands with
    * arguments (ref property list hyperion.py:699-846); shared by
    * q_command_format and the responder spec.
    */
  val CommandTable: Seq[(String, String, Int)] = Seq(
    ("#GetSerialNumber", "", 0),
    ("#GetInstrumentName", "", 0),
    ("#GetFirmwareVersion", "", 0),
    ("#GetFPGAVersion", "", 0),
    ("#isready", "", 0),
    ("#GetDutChannelCount", "", 0),
    ("#GetMaximumPeakCountPerDutChannel", "", 0),
    ("#SetInstrumentName", "graft-interrogator-1", 0),
    ("#SetLaserScanSpeed", "10", 2))

  /** Unrolled SQL derivation of [[graft.text.BpeTrainer]] (one CTE
    * trio per merge round): pair counts from the current symbol lists,
    * top-1 by (weight desc, p1, p2), then merge application as a
    * `list_reduce` fold over a space-joined accumulator with the same
    * greedy left-to-right semantics as the Spark-side array fold
    * (symbols never contain spaces, so the ' '-suffix test identifies
    * the accumulator's last symbol exactly).
    */
  private def bpeTrainSql(merges: Int): String = {
    val init =
      """w0 AS (SELECT w, cast(count(*) AS bigint) AS cnt
        |       FROM (SELECT unnest(string_split(text, ' ')) AS w
        |             FROM documents) GROUP BY w),
        |v0 AS (SELECT w, cnt,
        |         list_transform(generate_series(1, length(w)),
        |           i -> substr(w, cast(i AS int), 1)) AS syms
        |       FROM w0)""".stripMargin
    val stages = (1 to merges).map { n =>
      s"""p$n AS (SELECT syms[i] AS p1, syms[i+1] AS p2,
         |         cast(sum(cnt) AS bigint) AS wt
         |       FROM (SELECT cnt, syms,
         |               unnest(generate_series(1, len(syms) - 1)) AS i
         |             FROM v${n - 1} WHERE len(syms) >= 2)
         |       GROUP BY 1, 2),
         |m$n AS (SELECT p1, p2, wt FROM p$n
         |        ORDER BY wt DESC, p1, p2 LIMIT 1),
         |v$n AS (SELECT w, cnt,
         |          CASE WHEN len(syms) = 0 THEN syms ELSE string_split(
         |            list_reduce(syms, (acc, x) -> CASE
         |              WHEN acc = m$n.p1 AND x = m$n.p2
         |                THEN m$n.p1 || m$n.p2
         |              WHEN right(acc, length(m$n.p1) + 1) = ' ' || m$n.p1
         |                  AND x = m$n.p2
         |                THEN left(acc, length(acc) - length(m$n.p1) - 1)
         |                  || ' ' || m$n.p1 || m$n.p2
         |              ELSE acc || ' ' || x END), ' ') END AS syms
         |        FROM v${n - 1} CROSS JOIN m$n)""".stripMargin
    }
    s"$init,\n${stages.mkString(",\n")}"
  }

  private def bpeMergeSelect(merges: Int): String =
    (1 to merges)
      .map(n => s"SELECT cast($n AS int) AS step, p1, p2, wt AS weight FROM m$n")
      .mkString("\nUNION ALL\n")

  /** SRP bucket id as a DuckDB expression over a DOUBLE[] column named
    * `colName` — the same seeded hyperplanes as Similarity.srpBucket
    * (via the ann_pl literal CTE), sliced to the corpus-derived `bits`
    * (ann_p), so bucket assignment agrees bit-for-bit at every SF.
    * Requires ann_p and ann_pl in the enclosing FROM.
    */
  private def srpBucketSql(colName: String): String =
    s"""cast(list_sum(list_transform(generate_series(1, bits), b ->
       |    CASE WHEN list_dot_product($colName, pl[b]) > 0
       |         THEN 1 << (b - 1) ELSE 0 END)) AS int)""".stripMargin

  /** Seeded-k-means CTE chain (k = max(4, n/125) derived in-SQL, 2
    * Lloyd iterations), shared by the q_kmeans_embed and q_semdedup
    * oracles: e (typed vectors), c0 (first-k-ids seed), g0/g1 (coarse
    * group of each centroid — the two-level quantizer mirror), a1
    * (coarse-then-fine augmented-dot assignment), cm/c1 (1e-6-rounded
    * element-wise means), a2 (final two-level assignment). Every
    * argmax is ORDER BY dot DESC, index LIMIT 1 — the first-wins tie
    * rule of ArgMaxDotGrouped — and the per-vector coarse pick is
    * restricted to NON-empty groups exactly like the kernel's group
    * table. Grouping dots read the raw 64 components (the +1 bias
    * slot truncates away on the Spark side's min-length dot).
    */
  private def kmeansCtes: String =
    s"""$annParamCte,
       |$ivfCoarseCte,
       |gsr AS (SELECT cast(__g AS int) AS __g
       |        FROM generate_series(1, $MaxOracleCoarse) t(__g), ann_p
       |        WHERE __g <= gcnt_k),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |c0 AS (SELECT cast(rn - 1 AS int) AS j, v
       |       FROM (SELECT v, row_number() OVER (ORDER BY vec_id) AS rn
       |             FROM e) t, ann_p
       |       WHERE t.rn <= ann_p.kk),
       |g0 AS (SELECT j, v,
       |        (SELECT __g - 1 FROM gsr, ivf_gs
       |         ORDER BY list_dot_product(c0.v, gs[__g]) DESC, __g
       |         LIMIT 1) AS grp
       |       FROM c0),
       |a1 AS (SELECT e.vec_id, e.v,
       |        (SELECT g0.j FROM g0
       |         WHERE g0.grp = (SELECT __g - 1 FROM gsr, ivf_gs
       |                         WHERE (__g - 1) IN (SELECT grp FROM g0)
       |                         ORDER BY list_dot_product(e.v, gs[__g])
       |                           DESC, __g
       |                         LIMIT 1)
       |         ORDER BY list_dot_product(e.v, g0.v)
       |           - list_dot_product(g0.v, g0.v)/2 DESC, g0.j
       |         LIMIT 1) AS cell
       |       FROM e),
       |cm AS (SELECT cell, i,
       |         floor(avg(v[i])*1000000 + 0.5)/1000000 AS ci
       |       FROM a1, generate_series(1, 64) t(i)
       |       GROUP BY cell, i),
       |c1 AS (SELECT cell, list(ci ORDER BY i) AS v FROM cm GROUP BY cell),
       |g1 AS (SELECT cell, v,
       |        (SELECT __g - 1 FROM gsr, ivf_gs
       |         ORDER BY list_dot_product(c1.v, gs[__g]) DESC, __g
       |         LIMIT 1) AS grp
       |       FROM c1),
       |a2 AS (SELECT e.vec_id,
       |        (SELECT g1.cell FROM g1
       |         WHERE g1.grp = (SELECT __g - 1 FROM gsr, ivf_gs
       |                         WHERE (__g - 1) IN (SELECT grp FROM g1)
       |                         ORDER BY list_dot_product(e.v, gs[__g])
       |                           DESC, __g
       |                         LIMIT 1)
       |         ORDER BY list_dot_product(e.v, g1.v)
       |           - list_dot_product(g1.v, g1.v)/2 DESC, g1.cell
       |         LIMIT 1) AS cluster_id
       |       FROM e)""".stripMargin

  private def annProbeCtes: String =
    s"""$annParamCte,
       |$annPlanesCte,
       |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
       |      FROM embeddings WHERE vec_id = 0),
       |pj AS (SELECT qv, bits, probes,
       |  list_transform(generate_series(1, bits), b ->
       |    list_dot_product(qv, pl[b])) AS projs
       |  FROM q, ann_p, ann_pl),
       |pr AS (SELECT qv, bits, probes,
       |  cast(list_sum(list_transform(generate_series(1, bits), b ->
       |    CASE WHEN projs[b] > 0 THEN 1 << (b - 1) ELSE 0 END)) AS int)
       |    AS base,
       |  list_transform(list_sort(
       |    list_transform(generate_series(1, bits), b ->
       |      {'m': abs(projs[b]), 'b': b - 1})), s -> s.b) AS bm
       |  FROM pj),
       |probes AS (SELECT qv, list_slice(
       |    list_prepend(base, list_concat(
       |      list_transform(generate_series(1, bits), i ->
       |        xor(base, 1 << bm[i])),
       |      flatten(list_transform(generate_series(1, bits), i ->
       |        list_transform(generate_series(i + 1, bits), j ->
       |          xor(xor(base, 1 << bm[i]), 1 << bm[j])))))),
       |    1, probes) AS ps
       |  FROM pr),
       |bkt AS (SELECT vec_id, v, ${srpBucketSql("v")} AS bucket
       |        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |              FROM embeddings WHERE vec_id <> 0), ann_p, ann_pl)"""
      .stripMargin

  /** JVM-scoped memo of partitioned layouts already written this
    * session (q_partitioned_prune): the path maps to a latch the
    * writer counts down only after the write COMPLETES, so concurrent
    * callers block until the layout is readable rather than racing a
    * half-written directory. A fresh session always rewrites the
    * layout (a regenerated source dataset is never served stale)
    * while repeated bench passes within one session reuse it.
    */
  private val writtenLayouts = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CountDownLatch]()

  /** Exact-truth CTE chain (s/tok/cand/v) over 8-shingles: candidates
    * are the ANY-shared-shingle superset — independent of the Spark
    * plan's prefix filter, complete for any τ > 0 — with the exact
    * array-intersection Jaccard terms. ONE definition shared by the
    * q_prefix_join and q_lsh_recall oracles, so the ground truth the
    * funnel is graded against can never silently diverge from the
    * prefix join's own oracle. `_2` is the jaccard expression over v.
    */
  private val prefixTruthCtes: (String, String) = (
    s"""s AS (SELECT doc_id, $spanShinglesSql AS sh FROM documents),
       |tok AS (SELECT doc_id, unnest(sh) AS t FROM s),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM tok a JOIN tok b ON a.t = b.t
       |           AND a.doc_id < b.doc_id),
       |v AS (SELECT c.id_a, c.id_b,
       |        len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS i,
       |        len(sa.sh) AS na, len(sb.sh) AS nb
       |      FROM cand c JOIN s sa ON sa.doc_id = c.id_a
       |                  JOIN s sb ON sb.doc_id = c.id_b)""".stripMargin,
    "cast(i AS double)/(na + nb - i)")

  val oracle: Map[String, String] = Map(
    // A lossy prefix on the Spark side loses rows against the
    // independent any-shared-shingle truth construction.
    "q_prefix_join" -> {
      val (ctes, jac) = prefixTruthCtes
      s"""WITH $ctes
         |SELECT id_a, id_b, ${rs(jac, 6)} AS jaccard
         |FROM v WHERE ${rs(jac, 6)} >= 0.6""".stripMargin
    },

    "q_token_entropy" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |           FROM documents),
         |c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
         |p AS (SELECT doc_id, cast(sum(c) AS bigint) AS n_tokens,
         |        cast(sum(c * cast(floor(ln(cast(c AS double))*1000000
         |          + 0.5) AS bigint)) AS bigint) AS s_micro
         |      FROM c GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  ${rs("(cast(floor(ln(cast(n_tokens AS double))*1000000 + 0.5) " +
               "AS bigint)*n_tokens - s_micro) / " +
               "(cast(n_tokens AS double)*1000000)", 6)} AS entropy
         |FROM p""".stripMargin,

    "q_source_overlap" ->
      s"""WITH sp AS (SELECT DISTINCT source, md5(t) AS h
         |  FROM (SELECT source, unnest($spanShinglesSql) AS t
         |        FROM documents))
         |SELECT a.source AS src_a, b.source AS src_b,
         |  cast(count(*) AS bigint) AS n_shared
         |FROM sp a JOIN sp b ON a.h = b.h AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,

    // truth from the INDEPENDENT any-shared-shingle candidate superset
    // (the q_prefix_join oracle's construction); the funnel re-derived
    // through the n=8 band chain — same signature algebra as q_lsh_pairs
    "q_lsh_recall" -> {
      val (ctes, jac) = prefixTruthCtes
      s"""WITH $ctes,
         |truth AS (SELECT id_a, id_b FROM v WHERE ${rs(jac, 6)} >= 0.6),
         |${bandsChain(spanShinglesSql, "l")},
         |lshp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM lbands a JOIN lbands b
         |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |           AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |hit AS (SELECT t.id_a FROM truth t JOIN lshp l
         |        ON t.id_a = l.id_a AND t.id_b = l.id_b),
         |m AS (SELECT (SELECT count(*) FROM truth) AS n_true,
         |             (SELECT count(*) FROM lshp) AS n_cand,
         |             (SELECT count(*) FROM hit) AS n_hit)
         |SELECT cast(n_true AS bigint) AS n_true,
         |  cast(n_cand AS bigint) AS n_cand,
         |  cast(n_hit AS bigint) AS n_hit,
         |  cast(CASE WHEN n_true > 0 THEN floor(n_hit * 1000000 / n_true)
         |       ELSE -1 END AS bigint) AS recall_micro,
         |  cast(CASE WHEN n_cand > 0 THEN floor(n_hit * 1000000 / n_cand)
         |       ELSE -1 END AS bigint) AS precision_micro
         |FROM m""".stripMargin
    },

    "q_url_canon" ->
      s"""WITH u AS (SELECT doc_id,
         |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END ||
         |   CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END ||
         |   '.Example.COM' ||
         |   CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
         |   '/docs/' || cast(doc_id % 40 AS varchar) ||
         |   CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END ||
         |   '?utm_source=feed&page=' || cast(doc_id % 3 AS varchar) ||
         |   '&fbclid=' || cast(doc_id AS varchar)) AS url
         |  FROM documents),
         |c AS (SELECT doc_id,
         |  'https://' || lower(regexp_extract(url, '://([^/:?]+)', 1)) ||
         |  rtrim(regexp_extract(url, '[^/]//[^/?]+(/[^?]*)', 1), '/') ||
         |  '?page=' || regexp_extract(url, '[?&]page=([0-9]+)', 1)
         |    AS canonical_url
         |  FROM u)
         |SELECT canonical_url, cast(count(*) AS bigint) AS n_docs,
         |  min(doc_id) AS keeper
         |FROM c GROUP BY 1""".stripMargin,

    // same (tss, event_id) total order, same Horner folds: list_reduce
    // seeds acc with x₁ exactly like Spark's 0·β+x₁ first step; the
    // normalizer folds over a ones-list so its seed is 1.0 on both sides
    "q_ewma" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch(ts) AS tss, value
         |           FROM events),
         |w AS (SELECT event_id, user_id,
         |        list(value) OVER (PARTITION BY user_id
         |          ORDER BY tss, event_id
         |          ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS arr
         |      FROM e)
         |SELECT event_id, user_id,
         |  ${rs("list_reduce(arr, (acc, x) -> acc*0.75 + x) / " +
               "list_reduce(list_transform(arr, x -> cast(1.0 AS double)), " +
               "(acc, o) -> acc*0.75 + o)", 6)} AS ewma
         |FROM w""".stripMargin,

    // same md5-bucket hash, same smoothing, ln micro-integerized on the
    // 256-row bucket table only (identical expression shape), exact
    // BIGINT per-doc sums, row_number mirror of TopKPerKey
    "q_dsir_select" ->
      ("""WITH tok AS (SELECT doc_id, source,
         |    cast(('0x' || substr(md5(w), 1, 8)) AS bigint) % 256 AS b
         |  FROM (SELECT doc_id, source,
         |          unnest(string_split(text, ' ')) AS w FROM documents)),
         |tgt AS (SELECT min(source) AS tgt FROM documents),
         |bc AS (SELECT b, cast(count(*) AS bigint) AS cr,
         |    cast(sum(CASE WHEN source = (SELECT tgt FROM tgt)
         |             THEN 1 ELSE 0 END) AS bigint) AS ct
         |  FROM tok GROUP BY 1),
         |tot AS (SELECT cast(sum(cr) AS bigint) AS nr,
         |    cast(sum(ct) AS bigint) AS nt FROM bc),
         |lr AS (SELECT b, cast(floor(
         |    ln(((ct + 1.0) / (nt + 256.0)) / ((cr + 1.0) / (nr + 256.0)))
         |      * 1000000 + 0.5) AS bigint) AS lr_micro
         |  FROM bc, tot),
         |pd AS (SELECT doc_id, source, b, cast(count(*) AS bigint) AS c
         |  FROM tok GROUP BY 1, 2, 3),
         |imp AS (SELECT doc_id, source,
         |    cast(sum(c * lr_micro) AS bigint) AS imp_micro,
         |    cast(sum(c) AS bigint) AS n_tokens
         |  FROM pd JOIN lr USING (b) GROUP BY 1, 2),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY imp_micro DESC, doc_id) AS rn FROM imp)
         |SELECT source, doc_id, n_tokens, imp_micro
         |FROM rk WHERE rn <= 25""").stripMargin,

    // Same 256-bucket hash as the DSIR oracle; dense grid so empty
    // buckets smooth to rows; the JSD term is the identical double
    // expression tree the Spark side nano-integerizes.
    "q_source_divergence" ->
      (s"""WITH tok AS (SELECT source,
         |    cast(('0x' || substr(md5(w), 1, 8)) AS bigint) % 256 AS b
         |  FROM (SELECT source,
         |          unnest(string_split(text, ' ')) AS w FROM documents)),
         |cnt AS (SELECT source, b, cast(count(*) AS bigint) AS c
         |  FROM tok GROUP BY 1, 2),
         |grid AS (SELECT source, gs.b
         |  FROM (SELECT DISTINCT source FROM documents)
         |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS b) gs),
         |dense AS (SELECT g.source, g.b, coalesce(c.c, 0) AS c
         |  FROM grid g LEFT JOIN cnt c
         |    ON c.source = g.source AND c.b = g.b),
         |tot AS (SELECT source, cast(sum(c) AS bigint) AS n
         |  FROM dense GROUP BY 1),
         |p AS (SELECT d2.source, d2.b, (d2.c + 1.0) / (t.n + 256.0) AS p
         |  FROM dense d2 JOIN tot t USING (source)),
         |terms AS (SELECT a.source AS src_a, b2.source AS src_b,
         |    cast(floor((0.5 * a.p * ln(a.p / ((a.p + b2.p) / 2.0))
         |        + 0.5 * b2.p * ln(b2.p / ((a.p + b2.p) / 2.0)))
         |      * 1000000000.0 + 0.5) AS bigint) AS t_nano
         |  FROM p a JOIN p b2 ON a.b = b2.b AND a.source < b2.source),
         |j AS (SELECT src_a, src_b, cast(sum(t_nano) AS bigint)
         |    AS jsd_nano
         |  FROM terms GROUP BY 1, 2)
         |SELECT src_a, src_b, jsd_nano,
         |  ${rs("cast(jsd_nano AS double) / 1000000000.0", 6)} AS jsd
         |FROM j""").stripMargin,

    "q_weighted_sample" ->
      ("""SELECT doc_id, n_chars,
         |  cast(floor(ln((cast(cast(('0x' ||
         |      substr(md5(cast(doc_id AS varchar)), 1, 8)) AS bigint)
         |      AS double) + 1.0) / 4294967296.0)
         |    / cast(n_chars AS double) * 1000000000.0 + 0.5) AS bigint)
         |    AS key_nano
         |FROM documents ORDER BY key_nano DESC, doc_id
         |LIMIT 10""").stripMargin,

    "q_bfs_hops" -> {
      val relax = (k: Int) =>
        s"""d$k AS (SELECT node, min(dist) AS dist FROM (
           |    SELECT e.dst AS node, p.dist + 1 AS dist
           |      FROM d${k - 1} p JOIN edges e ON p.node = e.src
           |    UNION ALL SELECT node, dist FROM d${k - 1})
           |  GROUP BY 1)"""
      ("""WITH p AS (SELECT string_split(text, ' ') AS t FROM documents
         |  WHERE len(string_split(text, ' ')) >= 2),
         |pr AS (SELECT t[i] AS a, t[i+1] AS b
         |  FROM p, unnest(range(1, len(t))) AS u(i)
         |  WHERE t[i] <> t[i+1]),
         |edges AS (SELECT DISTINCT a AS src, b AS dst FROM pr
         |  UNION SELECT DISTINCT b, a FROM pr),
         |d0 AS (SELECT min(src) AS node, cast(0 AS bigint) AS dist
         |  FROM edges),
         |""" + (1 to 4).map(relax).mkString(",\n") +
        "\nSELECT node, dist FROM d4").stripMargin
    },

    "q_triangles" ->
      ("""WITH p AS (SELECT string_split(text, ' ') AS t FROM documents
         |  WHERE len(string_split(text, ' ')) >= 2),
         |pr AS (SELECT t[i] AS a, t[i+1] AS b
         |  FROM p, unnest(range(1, len(t))) AS u(i)
         |  WHERE t[i] <> t[i+1]),
         |und AS (SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y
         |  FROM pr),
         |deg AS (SELECT v, cast(count(*) AS bigint) AS deg FROM
         |  (SELECT x AS v FROM und UNION ALL SELECT y FROM und)
         |  GROUP BY 1),
         |ed AS (SELECT CASE WHEN dx.deg < dy.deg
         |      OR (dx.deg = dy.deg AND x < y) THEN x ELSE y END AS src,
         |    CASE WHEN dx.deg < dy.deg
         |      OR (dx.deg = dy.deg AND x < y) THEN y ELSE x END AS dst,
         |    CASE WHEN dx.deg < dy.deg
         |      OR (dx.deg = dy.deg AND x < y) THEN dy.deg
         |      ELSE dx.deg END AS dd
         |  FROM und JOIN deg dx ON und.x = dx.v
         |    JOIN deg dy ON und.y = dy.v),
         |tri AS (SELECT cast(count(*) AS bigint) AS n_triangles
         |  FROM (SELECT w1.src, w1.dst AS b, w2.dst AS c
         |      FROM ed w1 JOIN ed w2 ON w1.src = w2.src
         |      WHERE w1.dd < w2.dd
         |        OR (w1.dd = w2.dd AND w1.dst < w2.dst)) w
         |  WHERE EXISTS (SELECT 1 FROM ed
         |    WHERE ed.src = w.b AND ed.dst = w.c)),
         |st AS (SELECT cast(count(*) AS bigint) AS n_nodes,
         |    cast(sum(deg * (deg - 1) // 2) AS bigint) AS n_wedges
         |  FROM deg),
         |ne AS (SELECT cast(count(*) AS bigint) AS n_edges FROM und)
         |SELECT n_nodes, n_edges, n_wedges, n_triangles,
         |  CASE WHEN n_wedges > 0
         |    THEN (3 * n_triangles * 1000000) // n_wedges END
         |    AS gcc_micro
         |FROM tri, st, ne""").stripMargin,

    "q_itemsets" ->
      ("""WITH baskets AS (SELECT doc_id,
         |    list_sort(list_distinct(string_split(text, ' '))) AS ws
         |  FROM documents),
         |singles AS (SELECT w, cast(count(*) AS bigint) AS n_w
         |  FROM (SELECT doc_id, unnest(ws) AS w FROM baskets)
         |  GROUP BY 1),
         |pairs AS (SELECT a, b, cast(count(*) AS bigint) AS support
         |  FROM (SELECT doc_id, ws[i] AS a, unnest(ws[i+1:]) AS b
         |    FROM baskets, unnest(range(1, len(ws))) AS u(i))
         |  GROUP BY 1, 2 HAVING count(*) >= 5),
         |tot AS (SELECT cast(count(*) AS bigint) AS n_docs FROM baskets)
         |SELECT a, b, support, sa.n_w AS n_a, sb.n_w AS n_b,
         |  (support * n_docs * 1000000) // (sa.n_w * sb.n_w)
         |    AS lift_micro
         |FROM pairs JOIN singles sa ON pairs.a = sa.w
         |  JOIN singles sb ON pairs.b = sb.w, tot""").stripMargin,

    "q_shuffle_order" ->
      ("""WITH keyed AS (SELECT doc_id,
         |    md5(cast(doc_id AS varchar)) AS k FROM documents)
         |SELECT doc_id, k,
         |  cast(row_number() OVER (ORDER BY k, doc_id) AS bigint)
         |    AS train_rank
         |FROM keyed""").stripMargin,

    "q_skyline" ->
      ("""WITH docs AS (SELECT doc_id, n_chars AS x,
         |    cast(len(string_split(text, ' ')) AS bigint) AS y
         |  FROM documents)
         |SELECT doc_id, x AS n_chars, y AS n_words FROM docs a
         |WHERE NOT EXISTS (SELECT 1 FROM docs b
         |  WHERE b.x >= a.x AND b.y >= a.y
         |    AND (b.x > a.x OR b.y > a.y))""").stripMargin,

    "q_mutual_info" ->
      ("""WITH cells AS (SELECT source, lang,
         |    cast(count(*) AS bigint) AS n_xy
         |  FROM documents GROUP BY 1, 2),
         |nx AS (SELECT source, cast(count(*) AS bigint) AS n_x
         |  FROM documents GROUP BY 1),
         |ny AS (SELECT lang, cast(count(*) AS bigint) AS n_y
         |  FROM documents GROUP BY 1),
         |tot AS (SELECT cast(count(*) AS bigint) AS n_tot FROM documents)
         |SELECT source, lang, n_xy, n_x, n_y,
         |  floor(cast(n_xy AS double) / n_tot *
         |    ln(cast(n_tot AS double) * n_xy /
         |      (cast(n_x AS double) * n_y)) * 1000000 + 0.5) / 1000000
         |    AS pmi_contrib
         |FROM cells JOIN nx USING (source) JOIN ny USING (lang), tot""")
        .stripMargin,

    "q_editdist_join" ->
      ("""WITH v AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |base AS (SELECT w FROM v WHERE len(w) > 0),
         |vf AS (SELECT w FROM base UNION SELECT w || 'q' FROM base)
         |SELECT a.w AS w1, b.w AS w2,
         |  cast(levenshtein(a.w, b.w) AS bigint) AS dist
         |FROM vf a JOIN vf b ON a.w < b.w
         |WHERE levenshtein(a.w, b.w) <= 1""").stripMargin,

    "q_compaction_plan" ->
      ("""WITH f AS (SELECT source, lang,
         |    cast(sum(n_chars) AS bigint) AS bytes,
         |    cast(count(*) AS bigint) AS n_docs
         |  FROM documents GROUP BY 1, 2)
         |SELECT source, lang, n_docs, bytes,
         |  cast((sum(bytes) OVER (ORDER BY source, lang
         |     ROWS UNBOUNDED PRECEDING) - bytes) // 8000 AS bigint) AS bin
         |FROM f""").stripMargin,

    // PageRank: the five synchronous iterations unrolled as CTE pairs
    // (contribution sums, then the damped update), all integer
    // pico-unit floor-division exactly as the Spark loop
    "q_pagerank" -> {
      val iterCtes = (1 to 5).map { k =>
        s"""s$k AS (SELECT e.dst AS node,
           |    cast(sum(p.r // p.outdeg) AS bigint) AS s_in
           |  FROM edges e JOIN r${k - 1} p ON e.src = p.node GROUP BY 1),
           |r$k AS (SELECT p.node, p.outdeg,
           |    ((1000000000000 * 15) // 100) // st.n
           |      + (85 * coalesce(s.s_in, 0)) // 100 AS r
           |  FROM r${k - 1} p CROSS JOIN st
           |  LEFT JOIN s$k s ON p.node = s.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents
         |           WHERE len(string_split(text, ' ')) >= 2),
         |pr AS (SELECT tk[i] AS a, tk[i+1] AS b
         |       FROM (SELECT tk, unnest(generate_series(1, len(tk)-1)) AS i
         |             FROM t)
         |       WHERE tk[i] <> tk[i+1]),
         |edges AS (SELECT DISTINCT src, dst FROM (
         |          SELECT a AS src, b AS dst FROM pr
         |          UNION ALL SELECT b AS src, a AS dst FROM pr)),
         |deg AS (SELECT src, cast(count(*) AS bigint) AS outdeg
         |        FROM edges GROUP BY 1),
         |st AS (SELECT cast(count(*) AS bigint) AS n FROM deg),
         |r0 AS (SELECT src AS node, outdeg, 1000000000000 // n AS r
         |       FROM deg, st),
         |$iterCtes
         |SELECT node, r AS rank_pico FROM r5
         |ORDER BY rank_pico DESC, node LIMIT 10""".stripMargin
    },

    // HITS: the same directed bigram edges, the same three unrolled
    // a←Aᵀh / h←A·a rounds in exact integer micro units with the
    // identical L∞ integral-division normalization; MATERIALIZED per
    // round (each round is referenced twice downstream — the
    // q_pca_project re-inlining lesson)
    "q_hits" -> {
      val iterCtes = (1 to 3).map { k =>
        s"""ar$k AS MATERIALIZED (SELECT e.dst AS node,
           |    cast(sum(p.h) AS bigint) AS ar
           |  FROM edges e JOIN r${k - 1} p ON e.src = p.node GROUP BY 1),
           |an$k AS MATERIALIZED (SELECT node,
           |    cast(ar * 1000000 // am AS bigint) AS a2
           |  FROM ar$k, (SELECT max(ar) AS am FROM ar$k)),
           |hr$k AS MATERIALIZED (SELECT e.src AS node,
           |    cast(sum(x.a2) AS bigint) AS hr
           |  FROM edges e JOIN an$k x ON e.dst = x.node GROUP BY 1),
           |hn$k AS MATERIALIZED (SELECT node,
           |    cast(hr * 1000000 // hm AS bigint) AS h2
           |  FROM hr$k, (SELECT max(hr) AS hm FROM hr$k)),
           |r$k AS MATERIALIZED (SELECT n.node,
           |    cast(coalesce(hn.h2, 0) AS bigint) AS h,
           |    cast(coalesce(an.a2, 0) AS bigint) AS a
           |  FROM nodes n LEFT JOIN an$k an ON n.node = an.node
           |  LEFT JOIN hn$k hn ON n.node = hn.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents
         |           WHERE len(string_split(text, ' ')) >= 2),
         |pr AS (SELECT tk[i] AS a, tk[i+1] AS b
         |       FROM (SELECT tk, unnest(generate_series(1, len(tk)-1)) AS i
         |             FROM t)
         |       WHERE tk[i] <> tk[i+1]),
         |edges AS MATERIALIZED (SELECT DISTINCT a AS src, b AS dst
         |       FROM pr),
         |nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
         |        SELECT src AS node FROM edges
         |        UNION ALL SELECT dst FROM edges)),
         |r0 AS (SELECT node, cast(1000000 AS bigint) AS h,
         |        cast(1000000 AS bigint) AS a FROM nodes),
         |$iterCtes
         |SELECT node, a AS auth_micro, h AS hub_micro FROM r3
         |ORDER BY auth_micro DESC, node LIMIT 10""".stripMargin
    },

    // SSSP: the same bigram counts, the same micro-nat surprisal
    // weights (ln integerized per edge), four unrolled Bellman–Ford
    // rounds as MATERIALIZED CTEs (each referenced twice per round)
    "q_sssp" -> {
      val iterCtes = (1 to 4).map { k =>
        s"""d$k AS MATERIALIZED (SELECT node, cast(min(dist) AS bigint)
           |    AS dist FROM (
           |      SELECT e.dst AS node, p.dist + e.w AS dist
           |      FROM d${k - 1} p JOIN e ON p.node = e.src
           |      UNION ALL SELECT node, dist FROM d${k - 1})
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents
         |           WHERE len(string_split(text, ' ')) >= 2),
         |pr AS (SELECT tk[i] AS a, tk[i+1] AS b
         |       FROM (SELECT tk, unnest(generate_series(1, len(tk)-1)) AS i
         |             FROM t)
         |       WHERE tk[i] <> tk[i+1]),
         |cnt AS MATERIALIZED (SELECT a AS src, b AS dst,
         |       cast(count(*) AS bigint) AS cab FROM pr GROUP BY 1, 2),
         |om AS (SELECT src, cast(sum(cab) AS bigint) AS outc
         |       FROM cnt GROUP BY 1),
         |e AS MATERIALIZED (SELECT cnt.src, dst,
         |       cast(floor(-ln(cast(cab AS double) / cast(outc AS double))
         |         * 1000000.0 + 0.5) AS bigint) AS w
         |       FROM cnt JOIN om USING (src)),
         |d0 AS (SELECT min(src) AS node, cast(0 AS bigint) AS dist FROM e),
         |$iterCtes
         |SELECT node, dist AS dist_micro FROM d4""".stripMargin
    },

    // entropy rate: the same bigram counts, the same per-edge
    // micro-nat surprisal (the sssp weight), exact long mass fold,
    // integral division by the bigram total
    "q_entropy_rate" ->
      """WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |pr AS (SELECT tk[i] AS a, tk[i+1] AS b
        |       FROM (SELECT tk, unnest(generate_series(1, len(tk)-1)) AS i
        |             FROM t)
        |       WHERE tk[i] <> tk[i+1]),
        |cnt AS (SELECT a, b, cast(count(*) AS bigint) AS cab
        |       FROM pr GROUP BY 1, 2),
        |om AS (SELECT a, cast(sum(cab) AS bigint) AS outc
        |       FROM cnt GROUP BY 1)
        |SELECT cast(sum(cab) AS bigint) AS n_bigrams,
        |  cast(sum(cab * cast(floor(
        |      -ln(cast(cab AS double) / cast(outc AS double))
        |      * 1000000.0 + 0.5) AS bigint)) AS bigint) AS h_mass_micro,
        |  cast(sum(cab * cast(floor(
        |      -ln(cast(cab AS double) / cast(outc AS double))
        |      * 1000000.0 + 0.5) AS bigint)) AS bigint)
        |    // cast(sum(cab) AS bigint) AS h_rate_micro
        |FROM cnt JOIN om USING (a)""".stripMargin,

    // Gini: the same frequency-of-frequencies rank-run fold, the
    // distinct-count window, exact long masses, one double division
    "q_gini_tokens" ->
      """WITH wc AS (SELECT w, cast(count(*) AS bigint) AS c
        |      FROM (SELECT unnest(string_split(text, ' ')) AS w
        |            FROM documents) GROUP BY 1),
        |ff AS (SELECT c, cast(count(*) AS bigint) AS m FROM wc GROUP BY 1),
        |cum AS (SELECT c, m, cast(coalesce(sum(m) OVER (ORDER BY c
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS bigint) AS a FROM ff),
        |ag AS (SELECT cast(sum(c * (a * m + m * (m + 1) // 2))
        |        AS bigint) AS s,
        |      cast(sum(m) AS bigint) AS n_vocab,
        |      cast(sum(c * m) AS bigint) AS n_tokens FROM cum)
        |SELECT n_vocab, n_tokens,
        |  cast(floor(cast(2 * s - (n_vocab + 1) * n_tokens AS double)
        |    / cast(n_vocab * n_tokens AS double)
        |    * 1000000.0 + 0.5) AS bigint) AS gini_micro
        |FROM ag""".stripMargin,

    // Good-Turing: the same trigram frequency-of-frequencies table,
    // c+1 self-join, exact integral `//` micro ratios
    "q_good_turing" ->
      """WITH t AS (SELECT string_split(text, ' ') AS tk
        |      FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |wc AS (SELECT w, cast(count(*) AS bigint) AS c
        |      FROM (SELECT tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS w
        |            FROM (SELECT tk,
        |                  unnest(generate_series(1, len(tk) - 2)) AS i
        |                  FROM t)) GROUP BY 1),
        |ff AS (SELECT c, cast(count(*) AS bigint) AS m FROM wc GROUP BY 1),
        |tot AS (SELECT cast(sum(c * m) AS bigint) AS n_tokens,
        |      cast(sum(m) AS bigint) AS n_vocab,
        |      cast(coalesce(sum(CASE WHEN c = 1 THEN m END), 0)
        |        AS bigint) AS n1 FROM ff)
        |SELECT f.c, f.m AS m_c,
        |  cast(coalesce(f2.m, 0) AS bigint) AS m_next,
        |  cast(((f.c + 1) * coalesce(f2.m, 0) * 1000000) // f.m
        |    AS bigint) AS c_star_micro,
        |  cast(n1 * 1000000 // n_tokens AS bigint) AS p0_micro,
        |  n_tokens, n_vocab
        |FROM ff f LEFT JOIN ff f2 ON f2.c = f.c + 1 CROSS JOIN tot
        |WHERE f.c BETWEEN 1 AND 5""".stripMargin,

    // Spearman: the same joint grid + doubled tie-average ranks from
    // count-domain windows, exact long moment sums, the IDENTICAL
    // double tree (cast points, operand order, sqrt) before the
    // floor-round
    "q_spearman" ->
      """WITH g AS (SELECT
        |        cast(len(string_split(text, ' ')) AS bigint) AS x,
        |        cast(len(list_distinct(string_split(text, ' ')))
        |          AS bigint) AS y,
        |        cast(count(*) AS bigint) AS cnt
        |      FROM documents GROUP BY 1, 2),
        |xr AS (SELECT x, cast(2 * coalesce(sum(t) OVER (ORDER BY x
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        + t + 1 AS bigint) AS rx
        |      FROM (SELECT x, cast(sum(cnt) AS bigint) AS t
        |            FROM g GROUP BY 1)),
        |yr AS (SELECT y, cast(2 * coalesce(sum(t) OVER (ORDER BY y
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        + t + 1 AS bigint) AS ry
        |      FROM (SELECT y, cast(sum(cnt) AS bigint) AS t
        |            FROM g GROUP BY 1)),
        |ag AS (SELECT cast(sum(cnt) AS bigint) AS n_docs,
        |      cast(sum(cnt * rx) AS bigint) AS sx,
        |      cast(sum(cnt * ry) AS bigint) AS sy,
        |      cast(sum(cnt * rx * ry) AS bigint) AS sxy,
        |      cast(sum(cnt * rx * rx) AS bigint) AS sxx,
        |      cast(sum(cnt * ry * ry) AS bigint) AS syy
        |      FROM g JOIN xr USING (x) JOIN yr USING (y))
        |SELECT n_docs, sx, sy, sxy, sxx, syy,
        |  CASE WHEN (cast(n_docs AS double) * cast(sxx AS double)
        |        - cast(sx AS double) * cast(sx AS double))
        |      * (cast(n_docs AS double) * cast(syy AS double)
        |        - cast(sy AS double) * cast(sy AS double)) <= 0.0
        |    THEN cast(0 AS bigint)
        |    ELSE cast(floor((cast(n_docs AS double)
        |          * cast(sxy AS double)
        |        - cast(sx AS double) * cast(sy AS double))
        |      / sqrt((cast(n_docs AS double) * cast(sxx AS double)
        |          - cast(sx AS double) * cast(sx AS double))
        |        * (cast(n_docs AS double) * cast(syy AS double)
        |          - cast(sy AS double) * cast(sy AS double)))
        |      * 1000000.0 + 0.5) AS bigint) END AS rho_micro
        |FROM ag""".stripMargin,

    // BM25: identical double expression inside floor() (bm25CteSql),
    // per-term micro ints summed as longs
    "q_bm25" ->
      s"""WITH ${bm25CteSql()}
         |SELECT doc_id, score_micro FROM sc
         |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,

    "q_oov_rate" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |v AS (SELECT t FROM (SELECT t, count(*) AS cnt FROM tok
        |  GROUP BY 1 ORDER BY cnt DESC, t LIMIT 25))
        |SELECT source, cast(count(*) AS bigint) AS n_tokens,
        |  cast(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS bigint)
        |    AS n_oov,
        |  (cast(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS bigint)
        |    * 1000000) // cast(count(*) AS bigint) AS oov_micro
        |FROM tok LEFT JOIN v ON tok.t = v.t GROUP BY 1""".stripMargin,

    // RRF fusion: both rankers' top-100 and ranks re-derived in SQL;
    // the fused score is exact integer floor-division
    "q_rrf_fusion" ->
      s"""WITH ${bm25CteSql(scFilter = "WHERE doc_id <> 0")},
         |lex AS (SELECT doc_id,
         |    cast(row_number() OVER (ORDER BY score_micro DESC, doc_id)
         |      AS bigint) AS r_lex
         |  FROM (SELECT doc_id, score_micro FROM sc
         |        ORDER BY score_micro DESC, doc_id LIMIT 100)),
         |qe AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |       FROM embeddings WHERE vec_id = 0),
         |sem AS (SELECT vec_id AS doc_id,
         |    cast(row_number() OVER (ORDER BY sim DESC, vec_id)
         |      AS bigint) AS r_sem
         |  FROM (SELECT vec_id,
         |      ${rs("list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)", 4)}
         |        AS sim
         |    FROM embeddings, qe WHERE vec_id <> 0
         |    ORDER BY sim DESC, vec_id LIMIT 100))
         |SELECT doc_id,
         |  cast(coalesce(1000000 // (60 + r_lex), 0)
         |    + coalesce(1000000 // (60 + r_sem), 0) AS bigint) AS rrf_micro,
         |  cast(coalesce(r_lex, 0) AS bigint) AS r_lex,
         |  cast(coalesce(r_sem, 0) AS bigint) AS r_sem
         |FROM lex FULL OUTER JOIN sem USING (doc_id)
         |ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin,

    // Same tf/df/dl/stats chain as bm25CteSql but kept per (doc, term)
    // (the aggregate form would lose the per-term scores NDCG ranks
    // by); identical floor-integerized term score, identical
    // micro-integerized rel/log2(rank+1) gains.
    "q_ndcg" -> {
      val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
      val score =
        """cast(floor(
          |      ln((cast(n_docs - df AS double) + 0.5)
          |        / (cast(df AS double) + 0.5) + 1.0)
          |      * (cast(tf AS double) * 2.2)
          |      / (cast(tf AS double) + 1.2 * (0.25
          |          + 0.75 * cast(dl AS double)
          |            / (cast(tot AS double) / n_docs)))
          |      * 1000000.0 + 0.5) AS bigint)""".stripMargin
      val gain = "cast(floor(cast(tf AS double) " +
        "/ log2(cast(rk AS double) + 1.0) * 1000000.0 + 0.5) AS bigint)"
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk
         |            FROM documents),
         |dl AS (SELECT doc_id, cast(len(tk) AS bigint) AS dl FROM tk),
         |st AS (SELECT cast(count(*) AS bigint) AS n_docs,
         |         cast(sum(dl) AS bigint) AS tot FROM dl),
         |tf AS (SELECT doc_id, t, cast(count(*) AS bigint) AS tf
         |       FROM (SELECT doc_id, unnest(tk) AS t FROM tk)
         |       WHERE t IN ($terms) GROUP BY 1, 2),
         |df AS (SELECT t, cast(count(*) AS bigint) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT t, tf.doc_id, tf, $score AS sm
         |       FROM tf JOIN dl USING (doc_id) JOIN df USING (t)
         |       CROSS JOIN st),
         |sysr AS (SELECT t, tf, cast(row_number() OVER
         |             (PARTITION BY t ORDER BY sm DESC, doc_id)
         |           AS bigint) AS rk
         |         FROM sc),
         |dcg AS (SELECT t, cast(sum($gain) AS bigint) AS dcg_micro
         |        FROM sysr WHERE rk <= 10 GROUP BY 1),
         |idr AS (SELECT t, tf, cast(row_number() OVER
         |            (PARTITION BY t ORDER BY tf DESC, doc_id)
         |          AS bigint) AS rk
         |        FROM sc),
         |idcg AS (SELECT t, cast(sum($gain) AS bigint) AS idcg_micro
         |         FROM idr WHERE rk <= 10 GROUP BY 1)
         |SELECT dcg.t AS term, dcg_micro, idcg_micro,
         |  ${rs("cast(dcg_micro AS double)/idcg_micro", 6)} AS ndcg
         |FROM dcg JOIN idcg USING (t)""".stripMargin
    },

    // MRR@10: relevant = the doc contains ALL query terms; identical
    // score chain, rank window mirror, rr = 1/first relevant rank
    "q_mrr" -> {
      val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
      val score =
        """cast(floor(
          |      ln((cast(n_docs - df AS double) + 0.5)
          |        / (cast(df AS double) + 0.5) + 1.0)
          |      * (cast(tf AS double) * 2.2)
          |      / (cast(tf AS double) + 1.2 * (0.25
          |          + 0.75 * cast(dl AS double)
          |            / (cast(tot AS double) / n_docs)))
          |      * 1000000.0 + 0.5) AS bigint)""".stripMargin
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk
         |            FROM documents),
         |dl AS (SELECT doc_id, cast(len(tk) AS bigint) AS dl FROM tk),
         |st AS (SELECT cast(count(*) AS bigint) AS n_docs,
         |         cast(sum(dl) AS bigint) AS tot FROM dl),
         |tf AS (SELECT doc_id, t, cast(count(*) AS bigint) AS tf
         |       FROM (SELECT doc_id, unnest(tk) AS t FROM tk)
         |       WHERE t IN ($terms) GROUP BY 1, 2),
         |rel AS (SELECT doc_id, count(*) = ${Bm25Terms.length} AS rel
         |        FROM tf GROUP BY 1),
         |df AS (SELECT t, cast(count(*) AS bigint) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT t, tf.doc_id, rel, $score AS sm
         |       FROM tf JOIN dl USING (doc_id) JOIN df USING (t)
         |       JOIN rel USING (doc_id) CROSS JOIN st),
         |rk AS (SELECT t, rel, cast(row_number() OVER
         |           (PARTITION BY t ORDER BY sm DESC, doc_id)
         |         AS bigint) AS rk
         |       FROM sc),
         |fr AS (SELECT t, min(CASE WHEN rel THEN rk END) AS frr
         |       FROM rk WHERE rk <= 10 GROUP BY 1)
         |SELECT t AS term, coalesce(frr, 0) AS first_rel_rank,
         |  coalesce(${rs("1.0 / cast(frr AS double)", 6)}, 0.0) AS rr
         |FROM fr""".stripMargin
    },

    // Kendall tau-a between BM25 top-10 order and raw-tf order over
    // the same docs: identical prune, self-join on unordered pairs,
    // strict agreements only
    "q_kendall_tau" -> {
      val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
      val score =
        """cast(floor(
          |      ln((cast(n_docs - df AS double) + 0.5)
          |        / (cast(df AS double) + 0.5) + 1.0)
          |      * (cast(tf AS double) * 2.2)
          |      / (cast(tf AS double) + 1.2 * (0.25
          |          + 0.75 * cast(dl AS double)
          |            / (cast(tot AS double) / n_docs)))
          |      * 1000000.0 + 0.5) AS bigint)""".stripMargin
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk
         |            FROM documents),
         |dl AS (SELECT doc_id, cast(len(tk) AS bigint) AS dl FROM tk),
         |st AS (SELECT cast(count(*) AS bigint) AS n_docs,
         |         cast(sum(dl) AS bigint) AS tot FROM dl),
         |tf AS (SELECT doc_id, t, cast(count(*) AS bigint) AS tf
         |       FROM (SELECT doc_id, unnest(tk) AS t FROM tk)
         |       WHERE t IN ($terms) GROUP BY 1, 2),
         |df AS (SELECT t, cast(count(*) AS bigint) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT t, tf.doc_id, tf, $score AS sm
         |       FROM tf JOIN dl USING (doc_id) JOIN df USING (t)
         |       CROSS JOIN st),
         |top AS (SELECT t, doc_id, tf, sm FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY t ORDER BY sm DESC, doc_id) AS rk FROM sc)
         |  WHERE rk <= 10)
         |SELECT a.t AS term, cast(count(*) AS bigint) AS n_pairs,
         |  cast(sum(CASE WHEN (a.sm > b.sm AND a.tf > b.tf)
         |             OR (a.sm < b.sm AND a.tf < b.tf)
         |           THEN 1 ELSE 0 END) AS bigint) AS n_conc,
         |  cast(sum(CASE WHEN (a.sm > b.sm AND a.tf < b.tf)
         |             OR (a.sm < b.sm AND a.tf > b.tf)
         |           THEN 1 ELSE 0 END) AS bigint) AS n_disc,
         |  ${rs("cast(sum(CASE WHEN (a.sm > b.sm AND a.tf > b.tf) " +
             "OR (a.sm < b.sm AND a.tf < b.tf) THEN 1 ELSE 0 END) " +
             "- sum(CASE WHEN (a.sm > b.sm AND a.tf < b.tf) " +
             "OR (a.sm < b.sm AND a.tf > b.tf) THEN 1 ELSE 0 END) " +
             "AS double) / cast(count(*) AS double)", 6)} AS tau
         |FROM top a JOIN top b ON a.t = b.t AND a.doc_id < b.doc_id
         |GROUP BY 1""".stripMargin
    },

    // RBO: the same candidate CTEs as q_kendall_tau, both rank
    // windows, the shared micro weight-table CASE on greatest(ra, rb)
    "q_rbo_overlap" -> {
      val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
      val score =
        """cast(floor(
          |      ln((cast(n_docs - df AS double) + 0.5)
          |        / (cast(df AS double) + 0.5) + 1.0)
          |      * (cast(tf AS double) * 2.2)
          |      / (cast(tf AS double) + 1.2 * (0.25
          |          + 0.75 * cast(dl AS double)
          |            / (cast(tot AS double) / n_docs)))
          |      * 1000000.0 + 0.5) AS bigint)""".stripMargin
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk
         |            FROM documents),
         |dl AS (SELECT doc_id, cast(len(tk) AS bigint) AS dl FROM tk),
         |st AS (SELECT cast(count(*) AS bigint) AS n_docs,
         |         cast(sum(dl) AS bigint) AS tot FROM dl),
         |tf AS (SELECT doc_id, t, cast(count(*) AS bigint) AS tf
         |       FROM (SELECT doc_id, unnest(tk) AS t FROM tk)
         |       WHERE t IN ($terms) GROUP BY 1, 2),
         |df AS (SELECT t, cast(count(*) AS bigint) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT t, tf.doc_id, tf, $score AS sm
         |       FROM tf JOIN dl USING (doc_id) JOIN df USING (t)
         |       CROSS JOIN st),
         |top AS (SELECT t, doc_id, tf, sm FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY t ORDER BY sm DESC, doc_id) AS rk FROM sc)
         |  WHERE rk <= 10),
         |r AS (SELECT t,
         |    row_number() OVER (PARTITION BY t
         |      ORDER BY sm DESC, doc_id) AS ra,
         |    row_number() OVER (PARTITION BY t
         |      ORDER BY tf DESC, doc_id) AS rb
         |  FROM top)
         |SELECT t AS term, cast(count(*) AS bigint) AS n_cand,
         |  cast(sum(${rboWeightCaseOn("greatest(ra, rb)")}) AS bigint)
         |    AS rbo_micro
         |FROM r GROUP BY 1""".stripMargin
    },

    // Hill: the same trigram counts, count-descending top-51 (only
    // VALUES survive, so gram ties cannot flip the hash), micro-nat
    // per-rank surprisals, integral division
    "q_hill_tail" ->
      """WITH t AS (SELECT string_split(text, ' ') AS tk
        |      FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |wc AS (SELECT w, cast(count(*) AS bigint) AS c
        |      FROM (SELECT tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS w
        |            FROM (SELECT tk,
        |                  unnest(generate_series(1, len(tk) - 2)) AS i
        |                  FROM t)) GROUP BY 1),
        |top AS (SELECT c FROM wc ORDER BY c DESC LIMIT 51),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC) AS rn
        |      FROM top),
        |k1 AS (SELECT cast(c AS bigint) AS ck1 FROM r WHERE rn = 51),
        |s AS (SELECT cast(sum(cast(floor(
        |        ln(cast(c AS double) / cast(ck1 AS double))
        |        * 1000000.0 + 0.5) AS bigint)) AS bigint) AS sum_ln
        |      FROM r, k1 WHERE rn <= 50)
        |SELECT cast(50 AS bigint) AS k, ck1 AS c_k1,
        |  sum_ln AS sum_ln_micro,
        |  cast(CASE WHEN sum_ln = 0 THEN 0
        |    ELSE 50 * 1000000000000 // sum_ln END AS bigint)
        |    AS alpha_micro
        |FROM k1 CROSS JOIN s""".stripMargin,

    // multi-probe SRP-LSH ANN: probe buckets re-derived in SQL (see
    // annProbeCtes), exact-cosine re-rank on the probed subset; ordered
    // by the UNROUNDED sim exactly as the Spark plan
    "q_ann_lsh" ->
      s"""WITH $annProbeCtes
         |SELECT b.vec_id,
         |  ${rs("list_cosine_similarity(b.v, probes.qv)", 4)} AS sim
         |FROM bkt b, probes
         |WHERE list_contains(probes.ps, b.bucket)
         |ORDER BY list_cosine_similarity(b.v, probes.qv) DESC, b.vec_id
         |LIMIT 20""".stripMargin,

    // recall@10 of the multi-probe ANN vs exact brute force — both sides
    // of the intersection recomputed in SQL
    "q_ann_recall" ->
      s"""WITH $annProbeCtes,
         |bf AS (
         |  SELECT b.vec_id FROM bkt b, q
         |  ORDER BY list_cosine_similarity(b.v, q.qv) DESC, b.vec_id
         |  LIMIT 10),
         |ann AS (
         |  SELECT b.vec_id FROM bkt b, probes
         |  WHERE list_contains(probes.ps, b.bucket)
         |  ORDER BY list_cosine_similarity(b.v, probes.qv) DESC, b.vec_id
         |  LIMIT 10)
         |SELECT cast(10 AS int) AS k, count(*) AS n_overlap,
         |  cast(count(*) AS double) / 10 AS recall,
         |  CAST(0.25 AS DOUBLE) AS scan_frac
         |FROM ann JOIN bf USING (vec_id)""".stripMargin,
    // batched single-probe ANN: per-query bucket + exact re-rank + rank
    // cutoff, ordered by the UNROUNDED sim exactly as the Spark plan
    "q_ann_batch" ->
      s"""WITH $annParamCte,
         |$annPlanesCte,
         |bkt AS (SELECT vec_id, v, ${srpBucketSql("v")} AS bucket
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |        FROM embeddings), ann_p, ann_pl),
         |qs AS (SELECT vec_id AS qid, v AS qv, bucket AS qb
         |       FROM bkt WHERE vec_id < 5),
         |c AS (SELECT * FROM bkt WHERE vec_id >= 5)
         |SELECT qid, vec_id, ${rs("sim0", 4)} AS sim FROM (
         |  SELECT qs.qid, c.vec_id,
         |    list_cosine_similarity(c.v, qs.qv) AS sim0,
         |    row_number() OVER (PARTITION BY qs.qid
         |      ORDER BY list_cosine_similarity(c.v, qs.qv) DESC,
         |        c.vec_id) AS rk
         |  FROM c JOIN qs ON c.bucket = qs.qb)
         |WHERE rk <= 10""".stripMargin,

    // SemDeDup: the same seeded-k-means cells as q_kmeans_embed, exact
    // cosine within a cell at the 1e-4-rounded threshold, keep-min-id
    "q_semdedup" ->
      s"""WITH $kmeansCtes
         |SELECT b.vec_id AS dup_id, min(a.vec_id) AS kept_id,
         |  count(*) AS n_near
         |FROM a2 a JOIN a2 b ON a.cluster_id = b.cluster_id
         |  AND a.vec_id < b.vec_id
         |JOIN e ea ON ea.vec_id = a.vec_id
         |JOIN e eb ON eb.vec_id = b.vec_id
         |WHERE ${rs("list_cosine_similarity(ea.v, eb.v)", 4)} >= 0.3
         |GROUP BY b.vec_id""".stripMargin,

    // span-level dedup: 8-word spans re-derived in SQL with the same
    // distinct-within-doc + md5-digest-key construction as the Spark plan
    "q_span_dedup" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents),
         |sp AS (SELECT DISTINCT doc_id,
         |         md5(array_to_string(list_slice(toks, i+1, i+8), ' ')) AS k
         |       FROM (SELECT doc_id, toks,
         |               unnest(generate_series(0, greatest(len(toks)-8, 0)))
         |                 AS i
         |             FROM t)),
         |c AS (SELECT k, count(*) AS nd FROM sp GROUP BY 1)
         |SELECT sp.doc_id, count(*) AS n_spans,
         |  cast(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS bigint)
         |    AS n_dup_spans,
         |  ${rs("cast(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) " +
              "AS double)/count(*)", 6)} AS dup_ratio
         |FROM sp JOIN c USING (k)
         |GROUP BY sp.doc_id""".stripMargin,

    // line-level boilerplate removal: same 4-word chunk grid, df by
    // distinct docs over md5 digests, ordered string_agg reassembly
    "q_line_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |l AS (SELECT doc_id, i,
        |        array_to_string(list_slice(toks, i*4+1, i*4+4), ' ') AS line
        |      FROM (SELECT doc_id, toks,
        |              unnest(generate_series(0, (len(toks)-1)//4)) AS i
        |            FROM t)),
        |f AS (SELECT md5(line) AS k, count(DISTINCT doc_id) AS df
        |      FROM l GROUP BY 1),
        |kept AS (SELECT l.doc_id, cast(count(*) AS bigint) AS n_kept,
        |           string_agg(l.line, ' ' ORDER BY l.i) AS clean_text
        |         FROM l JOIN f ON md5(l.line) = f.k
        |         WHERE f.df <= 2 GROUP BY 1),
        |tot AS (SELECT doc_id, cast(count(*) AS bigint) AS n_lines
        |        FROM l GROUP BY 1)
        |SELECT tot.doc_id, tot.n_lines,
        |  coalesce(kept.n_kept, 0) AS n_kept,
        |  coalesce(kept.clean_text, '') AS clean_text
        |FROM tot LEFT JOIN kept USING (doc_id)""".stripMargin,

    // CDC substring dedup: the shared cdcChunkCtes chain reproduces
    // every content-defined cut, then the same digest-count / islands
    // algebra as the Spark plan
    "q_substring_dedup" ->
      s"""WITH $cdcChunkCtes,
        |isl AS (SELECT doc_id, ord, clen,
        |          ord - row_number() OVER (PARTITION BY doc_id
        |            ORDER BY ord) AS island
        |        FROM j WHERE occ >= 2),
        |sp AS (SELECT doc_id, island,
        |         cast(sum(clen) AS bigint) AS span_len
        |       FROM isl GROUP BY 1, 2 HAVING sum(clen) >= 48),
        |tot AS (SELECT doc_id, cast(count(*) AS bigint) AS n_chunks,
        |          cast(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END)
        |            AS bigint) AS n_dup_chunks,
        |          cast(sum(clen) AS bigint) AS total_chars
        |        FROM j GROUP BY 1),
        |spa AS (SELECT doc_id, cast(count(*) AS bigint) AS n_spans,
        |          cast(sum(span_len) AS bigint) AS removed_chars
        |        FROM sp GROUP BY 1)
        |SELECT t.doc_id, t.n_chunks, t.n_dup_chunks,
        |  coalesce(s.n_spans, 0) AS n_spans,
        |  coalesce(s.removed_chars, 0) AS removed_chars,
        |  t.total_chars - coalesce(s.removed_chars, 0) AS clean_chars
        |FROM tot t LEFT JOIN spa s USING (doc_id)""".stripMargin,

    // CDC scrub: the shared cdcChunkCtes chain, then ordered
    // reassembly of the kept chunks (string_agg skips the NULLs the
    // CASE leaves for removed chunks — the q_line_dedup construction)
    "q_substring_scrub" ->
      s"""WITH $cdcChunkCtes,
        |w AS (SELECT *, CASE WHEN occ >= 2 THEN ord -
        |         sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY ord
        |                 ROWS UNBOUNDED PRECEDING) END AS island
        |      FROM j),
        |f AS (SELECT *, sum(clen)
        |         OVER (PARTITION BY doc_id, island) AS span_len
        |      FROM w),
        |kp AS (SELECT *, (occ < 2 OR span_len < 48) AS keep FROM f)
        |SELECT doc_id, cast(count(*) AS bigint) AS n_chunks,
        |  cast(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS bigint)
        |    AS n_removed_chunks,
        |  cast(sum(CASE WHEN keep THEN 0 ELSE clen END) AS bigint)
        |    AS removed_chars,
        |  coalesce(string_agg(CASE WHEN keep THEN chunk END, ''
        |    ORDER BY ord), '') AS clean_text
        |FROM kp GROUP BY 1""".stripMargin,

    // bigram-LM NLL: same per-doc-first aggregation tree; the per-bigram
    // surprise is integerized to micro-nats (exact BIGINT) before any
    // sum, so aggregation order can't drift the hash on either engine
    "q_ngram_lm" ->
      s"""WITH $ngramNllCtes
         |SELECT doc_id, n_bigrams,
         |  ${rs("cast(nll_sum_micro AS double)/n_bigrams/1000000", 6)}
         |    AS avg_nll
         |FROM perdoc""".stripMargin,

    // LM-quality decile composition: identical per-doc NLL chain, then
    // ntile over the exact integer ratio with doc_id tie-break
    "q_ppl_buckets" ->
      s"""WITH $ngramNllCtes,
         |dec AS (SELECT doc_id, n_bigrams, nll_sum_micro,
         |          cast(ntile(10) OVER (ORDER BY
         |            nll_sum_micro // n_bigrams, doc_id) AS int) AS decile
         |        FROM perdoc)
         |SELECT decile, count(*) AS n_docs,
         |  cast(sum(n_bigrams) AS bigint) AS bigrams_total,
         |  ${rs("cast(sum(nll_sum_micro) AS double)/sum(n_bigrams)/1000000",
              6)} AS avg_nll
         |FROM dec GROUP BY decile""".stripMargin,

    // fixed-weight logistic quality scorer over the q_text_stats
    // features (pre-rounded, so both engines score identical inputs)
    // MCC: the same scoring/gate CTE as q_auc, exact 2×2, identical
    // cast-before-multiply double tree
    "q_mcc" -> {
      val nTok = "len(string_split(text,' '))"
      val stop = "len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
      val atl = rs(s"cast(length(text) - ($nTok - 1) AS double) / $nTok", 6)
      val swr = rs(s"cast($stop AS double) / $nTok", 6)
      val punct = "(length(text) - " +
        "length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
      val z = s"CAST(-1.5 AS DOUBLE) + cast($nTok AS int) * " +
        s"CAST(0.002 AS DOUBLE) + ($swr) * CAST(2.0 AS DOUBLE) - " +
        s"$punct * CAST(0.01 AS DOUBLE) + ($atl) * CAST(0.1 AS DOUBLE)"
      val q = rs(s"1.0 / (1.0 + exp(-($z)))", 6)
      val keep = s"(NOT ($nTok < 20 OR $nTok > 1000) " +
        s"AND NOT (length(text) - ($nTok - 1) < $nTok * 3 " +
        s"OR length(text) - ($nTok - 1) > $nTok * 10) " +
        s"AND $stop >= 2 " +
        s"AND len(list_distinct(string_split(text,' '))) * 10 " +
        s">= $nTok * 3)"
      s"""WITH sc AS (SELECT
         |    cast(floor(($q) * 1000000.0 + 0.5) AS bigint) AS qm,
         |    CASE WHEN $keep THEN 1 ELSE 0 END AS pos
         |  FROM documents),
         |m AS (SELECT
         |    cast(sum(CASE WHEN qm >= 500000 AND pos = 1
         |      THEN 1 ELSE 0 END) AS bigint) AS tp,
         |    cast(sum(CASE WHEN qm >= 500000 AND pos = 0
         |      THEN 1 ELSE 0 END) AS bigint) AS fp,
         |    cast(sum(CASE WHEN qm < 500000 AND pos = 1
         |      THEN 1 ELSE 0 END) AS bigint) AS fn,
         |    cast(sum(CASE WHEN qm < 500000 AND pos = 0
         |      THEN 1 ELSE 0 END) AS bigint) AS tn
         |  FROM sc)
         |SELECT tp, fp, fn, tn,
         |  cast((tp + tn) * 1000000 // (tp + fp + fn + tn) AS bigint)
         |    AS acc_micro,
         |  CASE WHEN (cast(tp + fp AS double) * cast(tp + fn AS double)
         |      * cast(tn + fp AS double) * cast(tn + fn AS double))
         |      <= 0.0 THEN cast(0 AS bigint)
         |    ELSE cast(floor((cast(tp AS double) * cast(tn AS double)
         |        - cast(fp AS double) * cast(fn AS double))
         |      / sqrt(cast(tp + fp AS double) * cast(tp + fn AS double)
         |        * cast(tn + fp AS double) * cast(tn + fn AS double))
         |      * 1000000.0 + 0.5) AS bigint) END AS mcc_micro
         |FROM m""".stripMargin
    },

    // G² collocations: the same loop-filtered bigram table, marginals
    // from the table itself, identical per-cell micro-nat terms
    "q_llr_colloc" -> {
      def cell(obs: String, row: String, colm: String): String =
        s"""CASE WHEN ($obs) > 0 THEN ($obs) * cast(floor(
           |  ln(cast($obs AS double) * cast(n AS double)
           |    / (cast($row AS double) * cast($colm AS double)))
           |  * 1000000.0 + 0.5) AS bigint) ELSE 0 END""".stripMargin
      s"""WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents
         |           WHERE len(string_split(text, ' ')) >= 2),
         |pr AS (SELECT tk[i] AS a, tk[i+1] AS b
         |       FROM (SELECT tk, unnest(generate_series(1, len(tk)-1))
         |             AS i FROM t)
         |       WHERE tk[i] <> tk[i+1]),
         |cnt AS (SELECT a, b, cast(count(*) AS bigint) AS cab
         |       FROM pr GROUP BY 1, 2),
         |c1 AS (SELECT a, cast(sum(cab) AS bigint) AS ca
         |       FROM cnt GROUP BY 1),
         |c2 AS (SELECT b, cast(sum(cab) AS bigint) AS cb
         |       FROM cnt GROUP BY 1),
         |tot AS (SELECT cast(sum(cab) AS bigint) AS n FROM cnt)
         |SELECT a, b, cab,
         |  cast(2 * (${cell("cab", "ca", "cb")}
         |    + ${cell("ca - cab", "ca", "n - cb")}
         |    + ${cell("cb - cab", "n - ca", "cb")}
         |    + ${cell("n - ca - cb + cab", "n - ca", "n - cb")})
         |    AS bigint) AS g2_micro
         |FROM cnt JOIN c1 USING (a) JOIN c2 USING (b) CROSS JOIN tot
         |ORDER BY g2_micro DESC, a, b LIMIT 20""".stripMargin
    },

    // Poisson bootstrap: identical 48-bit dyadic uniforms, the SAME
    // inverse-CDF string (exact decimal-literal cutoffs — see
    // poissonCase), exact long weighted sums, order statistics over
    // the 100-row replicate table
    "q_bootstrap_ci" -> {
      val caseW = poissonCase
      s"""WITH base AS (SELECT doc_id,
         |    cast(len(string_split(text, ' ')) AS bigint) AS x
         |  FROM documents),
         |e AS (SELECT doc_id, x, unnest(generate_series(0, 99)) AS rep
         |  FROM base),
         |u AS (SELECT rep, x,
         |    cast(('0x' || substr(md5(doc_id || '|' || (rep // 4)),
         |      1 + 8 * (rep % 4), 8)) AS bigint) / 4294967296.0 AS u
         |  FROM e),
         |w AS (SELECT rep, x, $caseW AS w FROM u),
         |m AS (SELECT rep, cast(sum(w) AS bigint) AS sw,
         |    cast(sum(w * x) AS bigint) AS swx FROM w GROUP BY 1),
         |mm AS (SELECT
         |    cast(swx * 1000000 // greatest(sw, 1) AS bigint) AS m,
         |    row_number() OVER (ORDER BY swx * 1000000 // greatest(sw, 1))
         |      AS rn
         |  FROM m),
         |f AS (SELECT cast(count(*) AS bigint) AS n,
         |    cast(sum(x) AS bigint) AS sx FROM base)
         |SELECT n AS n_docs,
         |  cast(sx * 1000000 // n AS bigint) AS mean_micro,
         |  (SELECT m FROM mm WHERE rn = 5) AS ci_lo_micro,
         |  (SELECT m FROM mm WHERE rn = 96) AS ci_hi_micro,
         |  cast(100 AS bigint) AS n_replicates
         |FROM f""".stripMargin
    },

    // seeded Laplace-noise demo (no DP guarantee — noise is a public
    // function of the source name): identical md5 uniform, identical
    // inverse-CDF text, micro-integerized noise
    "q_dp_counts" ->
      """WITH a AS (SELECT source, cast(count(*) AS bigint) AS n_docs,
        |    cast(('0x' || substr(md5(source), 1, 12)) AS bigint)
        |      / 281474976710656.0 AS u
        |  FROM documents GROUP BY 1),
        |l AS (SELECT source, n_docs,
        |    cast(floor((CASE WHEN u < 0.5
        |        THEN ln(1.0 - 2.0 * (0.5 - u))
        |        ELSE -ln(1.0 - 2.0 * (u - 0.5)) END)
        |      * 1000000.0 + 0.5) AS bigint) AS lap_micro
        |  FROM a)
        |SELECT source, n_docs, lap_micro,
        |  cast(n_docs * 1000000 + lap_micro AS bigint) AS noisy_micro
        |FROM l""".stripMargin,

    // conformal: the same scoring/gate CTE as q_auc, rank-k order
    // statistic via a full-sort row_number (the oracle may sort; the
    // engine refines buckets), same ceil((n+1)·0.9) and floor-div
    // coverage
    "q_conformal" -> {
      val nTok = "len(string_split(text,' '))"
      val stop = "len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
      val atl = rs(s"cast(length(text) - ($nTok - 1) AS double) / $nTok", 6)
      val swr = rs(s"cast($stop AS double) / $nTok", 6)
      val punct = "(length(text) - " +
        "length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
      val z = s"CAST(-1.5 AS DOUBLE) + cast($nTok AS int) * " +
        s"CAST(0.002 AS DOUBLE) + ($swr) * CAST(2.0 AS DOUBLE) - " +
        s"$punct * CAST(0.01 AS DOUBLE) + ($atl) * CAST(0.1 AS DOUBLE)"
      val q = rs(s"1.0 / (1.0 + exp(-($z)))", 6)
      val keep = s"(NOT ($nTok < 20 OR $nTok > 1000) " +
        s"AND NOT (length(text) - ($nTok - 1) < $nTok * 3 " +
        s"OR length(text) - ($nTok - 1) > $nTok * 10) " +
        s"AND $stop >= 2 " +
        s"AND len(list_distinct(string_split(text,' '))) * 10 " +
        s">= $nTok * 3)"
      s"""WITH cal AS (SELECT 1000000 -
         |        cast(floor(($q) * 1000000.0 + 0.5) AS bigint) AS sc
         |      FROM documents WHERE $keep),
         |g AS (SELECT cast(count(*) AS bigint) AS n,
         |        cast(least(ceil((count(*) + 1) * 0.9), count(*))
         |          AS bigint) AS k
         |      FROM cal),
         |r AS (SELECT sc,
         |        cast(row_number() OVER (ORDER BY sc) AS bigint) AS rn
         |      FROM cal),
         |qh AS (SELECT cast(min(sc) AS bigint) AS qhat
         |      FROM r, g WHERE rn = k),
         |cov AS (SELECT cast(count(*) AS bigint) AS n_covered
         |      FROM cal, qh WHERE sc <= qhat)
         |SELECT n AS n_cal, k, qhat AS qhat_micro, n_covered,
         |  cast(n_covered * 1000000 // n AS bigint) AS coverage_micro
         |FROM g CROSS JOIN qh CROSS JOIN cov""".stripMargin
    },

    // rendezvous sharding: same 48-bit packed weights, list_max per
    // row, same census/outflow rollup; bad_moves pinned at 0
    "q_shard_assign" -> {
      def assign(n: Int) =
        s"""list_max(list_transform(range(0, $n),
           |    s -> cast(('0x' || substr(md5(
           |      doc_id || '#' || s), 1, 12)) AS bigint) * 32 + s))
           |  % 32""".stripMargin
      s"""WITH a AS (SELECT
         |    cast(${assign(16)} AS bigint) AS shard,
         |    cast(${assign(17)} AS bigint) AS a17
         |  FROM documents)
         |SELECT shard, cast(count(*) AS bigint) AS n_docs,
         |  cast(sum(CASE WHEN shard <> a17 THEN 1 ELSE 0 END)
         |    AS bigint) AS moved_out,
         |  cast(sum(CASE WHEN shard <> a17 AND a17 <> 16
         |    THEN 1 ELSE 0 END) AS bigint) AS bad_moves
         |FROM a GROUP BY 1""".stripMargin
    },

    // curriculum: identical micro score, source-partitioned rank
    // window, per-source top-5
    "q_curriculum" -> {
      val nTok = "len(string_split(text,' '))"
      val stop = "len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
      val atl = rs(s"cast(length(text) - ($nTok - 1) AS double) / $nTok", 6)
      val swr = rs(s"cast($stop AS double) / $nTok", 6)
      val punct = "(length(text) - " +
        "length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
      val z = s"CAST(-1.5 AS DOUBLE) + cast($nTok AS int) * " +
        s"CAST(0.002 AS DOUBLE) + ($swr) * CAST(2.0 AS DOUBLE) - " +
        s"$punct * CAST(0.01 AS DOUBLE) + ($atl) * CAST(0.1 AS DOUBLE)"
      s"""WITH sc AS (SELECT source, doc_id,
         |    cast(floor((${rs(s"1.0 / (1.0 + exp(-($z)))", 6)})
         |      * 1000000.0 + 0.5) AS bigint) AS qm
         |  FROM documents),
         |rk AS (SELECT source, doc_id, qm,
         |    cast(row_number() OVER (PARTITION BY source
         |      ORDER BY qm DESC, doc_id) AS bigint) AS rk
         |  FROM sc)
         |SELECT rk, source, doc_id, qm FROM rk WHERE rk <= 5""".stripMargin
    },

    // dropout: identical (doc_id, 1-based position) 16-bit md5 draw,
    // list_filter's index lambda is 1-based where Spark's is 0-based
    "q_token_dropout" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |      FROM documents),
        |k AS (SELECT doc_id,
        |    cast(len(tk) AS bigint) AS n_tokens,
        |    list_filter(tk, (t, i) -> cast(('0x' || substr(md5(
        |      doc_id || ':' || i), 1, 4)) AS int) % 5 != 0) AS kept
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  cast(len(kept) AS bigint) AS n_kept,
        |  array_to_string(kept, ' ') AS aug_text
        |FROM k""".stripMargin,

    "q_quality_score" -> {
      val nTok = "len(string_split(text,' '))"
      val stop = "len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
      val atl = rs(s"cast(length(text) - ($nTok - 1) AS double) / $nTok", 6)
      val swr = rs(s"cast($stop AS double) / $nTok", 6)
      val punct = "(length(text) - " +
        "length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
      val z = s"CAST(-1.5 AS DOUBLE) + cast($nTok AS int) * " +
        s"CAST(0.002 AS DOUBLE) + ($swr) * CAST(2.0 AS DOUBLE) - " +
        s"$punct * CAST(0.01 AS DOUBLE) + ($atl) * CAST(0.1 AS DOUBLE)"
      s"SELECT doc_id, ${rs(s"1.0 / (1.0 + exp(-($z)))", 6)} AS q_score " +
        "FROM documents"
    },

    // ECE calibration: identical score chain + Gopher keep rule, exact
    // BIGINT bucket sums, the same two-division double trees
    "q_ece_calibration" -> {
      val nTok = "len(string_split(text,' '))"
      val stop = "len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
      val atl = rs(s"cast(length(text) - ($nTok - 1) AS double) / $nTok", 6)
      val swr = rs(s"cast($stop AS double) / $nTok", 6)
      val punct = "(length(text) - " +
        "length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
      val z = s"CAST(-1.5 AS DOUBLE) + cast($nTok AS int) * " +
        s"CAST(0.002 AS DOUBLE) + ($swr) * CAST(2.0 AS DOUBLE) - " +
        s"$punct * CAST(0.01 AS DOUBLE) + ($atl) * CAST(0.1 AS DOUBLE)"
      val q = rs(s"1.0 / (1.0 + exp(-($z)))", 6)
      val keep = s"(NOT ($nTok < 20 OR $nTok > 1000) " +
        s"AND NOT (length(text) - ($nTok - 1) < $nTok * 3 " +
        s"OR length(text) - ($nTok - 1) > $nTok * 10) " +
        s"AND $stop >= 2 " +
        s"AND len(list_distinct(string_split(text,' '))) * 10 " +
        s">= $nTok * 3)"
      s"""WITH sc AS (SELECT $q AS q, $keep AS keep FROM documents),
         |b AS (SELECT least(9, cast(floor(q * 10) AS int)) AS bucket,
         |        cast(floor(q * 1000000.0 + 0.5) AS bigint) AS qm,
         |        CASE WHEN keep THEN 1 ELSE 0 END AS pos
         |      FROM sc),
         |a AS (SELECT bucket, cast(count(*) AS bigint) AS n,
         |        cast(sum(qm) AS bigint) AS sum_q,
         |        cast(sum(pos) AS bigint) AS n_pos
         |      FROM b GROUP BY 1),
         |t AS (SELECT cast(sum(n) AS bigint) AS nn,
         |        cast(sum(abs(n_pos * 1000000 - sum_q)) AS bigint) AS num
         |      FROM a)
         |SELECT bucket, n, n_pos,
         |  ${rs("cast(sum_q AS double) / cast(n AS double) / 1000000.0", 6)}
         |    AS conf,
         |  ${rs("cast(n_pos AS double) / cast(n AS double)", 6)} AS acc,
         |  ${rs("cast(num AS double) / cast(nn AS double) / 1000000.0", 6)}
         |    AS ece
         |FROM a CROSS JOIN t""".stripMargin
    },

    // PSI drift: same midpoint split on exact micros, same
    // integer-cents equal-width bins, same 0..9 spine, the identical
    // Laplace/ln double tree nano-floored per bucket
    "q_psi_drift" -> {
      val pa = "(cast(n_a AS double) + 1.0) / (cast(ta AS double) + 10.0)"
      val pb = "(cast(n_b AS double) + 1.0) / (cast(tb AS double) + 10.0)"
      s"""WITH ev AS (SELECT value, epoch_us(ts) AS e FROM events),
         |st AS (SELECT min(e) AS emin, max(e) AS emax,
         |        min(cast(floor(value * 100 + 0.5) AS bigint)) AS cmin,
         |        max(cast(floor(value * 100 + 0.5) AS bigint)) AS cmax
         |      FROM ev),
         |b AS (SELECT CASE WHEN e * 2 >= emin + emax THEN 1 ELSE 0 END
         |        AS era,
         |        least(9, (cast(floor(value * 100 + 0.5) AS bigint)
         |          - cmin) * 10 // (cmax - cmin + 1)) AS bucket
         |      FROM ev, st),
         |c AS (SELECT bucket,
         |        cast(sum(CASE WHEN era = 0 THEN 1 ELSE 0 END)
         |          AS bigint) AS ca,
         |        cast(sum(CASE WHEN era = 1 THEN 1 ELSE 0 END)
         |          AS bigint) AS cb
         |      FROM b GROUP BY 1),
         |f AS (SELECT sp.bucket, cast(coalesce(ca, 0) AS bigint) AS n_a,
         |        cast(coalesce(cb, 0) AS bigint) AS n_b
         |      FROM (SELECT unnest(generate_series(0, 9)) AS bucket) sp
         |      LEFT JOIN c ON sp.bucket = c.bucket),
         |t AS (SELECT cast(sum(n_a) AS bigint) AS ta,
         |        cast(sum(n_b) AS bigint) AS tb FROM f),
         |w AS (SELECT bucket, n_a, n_b,
         |        cast(floor((($pa) - ($pb)) * ln(($pa) / ($pb))
         |          * 1000000000.0 + 0.5) AS bigint) AS psi_nano
         |      FROM f, t),
         |tt AS (SELECT cast(sum(psi_nano) AS bigint) AS tn FROM w)
         |SELECT bucket, n_a, n_b, psi_nano,
         |  ${rs("cast(tn AS double) / 1000000000.0", 6)} AS psi
         |FROM w, tt""".stripMargin
    },

    // KS test: identical midpoint split and cents integerization;
    // ECDF gap in the same integer-micro units (integral division
    // both sides), same DESC/min-cents tie-broken argmax
    "q_ks_test" ->
      """WITH ev AS (SELECT value, epoch_us(ts) AS e FROM events),
        |st AS (SELECT min(e) AS emin, max(e) AS emax FROM ev),
        |b AS (SELECT CASE WHEN e * 2 >= emin + emax THEN 1 ELSE 0 END
        |        AS era,
        |        cast(floor(value * 100 + 0.5) AS bigint) AS c
        |      FROM ev, st),
        |g AS (SELECT c,
        |        cast(sum(CASE WHEN era = 0 THEN 1 ELSE 0 END)
        |          AS bigint) AS ca,
        |        cast(sum(CASE WHEN era = 1 THEN 1 ELSE 0 END)
        |          AS bigint) AS cb
        |      FROM b GROUP BY 1),
        |cu AS (SELECT c,
        |        cast(sum(ca) OVER (ORDER BY c) AS bigint) AS cuma,
        |        cast(sum(cb) OVER (ORDER BY c) AS bigint) AS cumb
        |       FROM g),
        |t AS (SELECT cast(sum(ca) AS bigint) AS ta,
        |        cast(sum(cb) AS bigint) AS tb FROM g)
        |SELECT c AS at_cents,
        |  cast(abs(cuma * 1000000 // greatest(ta, 1)
        |    - cumb * 1000000 // greatest(tb, 1)) AS bigint) AS ks_micro,
        |  ta AS n_a, tb AS n_b
        |FROM cu, t
        |ORDER BY ks_micro DESC, at_cents LIMIT 1""".stripMargin,

    // Benford: identical string-leading-digit extraction, the same
    // nano-integer probability literals, the identical expected/χ²
    // IEEE trees micro-floored per digit before the exact total
    "q_benford" -> {
      val nObs = "cast(n_obs AS double)"
      s"""WITH o AS (SELECT cast(substring(cast(cast(floor(o_totalprice)
         |        AS bigint) AS varchar), 1, 1) AS bigint) AS digit
         |      FROM orders),
         |g AS (SELECT digit, cast(count(*) AS bigint) AS n_obs
         |      FROM o WHERE digit >= 1 GROUP BY 1),
         |p(digit, p_nano) AS (VALUES (1, 301029996), (2, 176091259),
         |  (3, 124938737), (4, 96910013), (5, 79181246), (6, 66946790),
         |  (7, 57991947), (8, 51152522), (9, 45757491)),
         |f AS (SELECT cast(p.digit AS bigint) AS digit,
         |        cast(p.p_nano AS bigint) AS p_nano,
         |        cast(coalesce(g.n_obs, 0) AS bigint) AS n_obs
         |      FROM p LEFT JOIN g ON p.digit = g.digit),
         |t AS (SELECT cast(sum(n_obs) AS bigint) AS t FROM f),
         |w AS (SELECT digit, n_obs, cast(t AS double)
         |        * (cast(p_nano AS double) / 1000000000.0) AS e
         |      FROM f, t),
         |w2 AS (SELECT digit, n_obs,
         |        cast(floor(e * 1000000.0 + 0.5) AS bigint) AS exp_micro,
         |        cast(floor(($nObs - e) * ($nObs - e) / e * 1000000.0
         |          + 0.5) AS bigint) AS chi2_micro
         |      FROM w),
         |tt AS (SELECT cast(sum(chi2_micro) AS bigint) AS s FROM w2)
         |SELECT digit, n_obs, exp_micro, chi2_micro,
         |  ${rs("cast(s AS double) / 1000000.0", 4)} AS chi2
         |FROM w2, tt""".stripMargin
    },

    // CUSUM: the same closed form S_k − min(0, min_{j≤k} S_j) on the
    // same integer cents, μ as the identical integral division,
    // explicit ROWS frames, the same max/min-timestamp argmax
    "q_cusum" -> {
      val frame = "PARTITION BY event_type ORDER BY e, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) AS e, event_id,
         |        cast(floor(value * 100 + 0.5) AS bigint) AS c
         |      FROM events),
         |mu AS (SELECT event_type,
         |        cast(sum(c) AS bigint) // cast(count(*) AS bigint) AS mu,
         |        cast(count(*) AS bigint) AS n
         |      FROM ev GROUP BY 1),
         |j AS (SELECT ev.event_type, e, event_id, c - mu AS x, n
         |      FROM ev JOIN mu USING (event_type)),
         |cs AS (SELECT event_type, e, event_id, n,
         |        cast(sum(x) OVER ($frame) AS bigint) AS s
         |      FROM j),
         |cu AS (SELECT event_type, e, n,
         |        s - least(0, cast(min(s) OVER ($frame) AS bigint))
         |          AS cusum
         |      FROM cs),
         |mx AS (SELECT event_type, cast(max(cusum) AS bigint)
         |        AS max_cusum FROM cu GROUP BY 1)
         |SELECT cu.event_type, cast(min(e) AS bigint) AS at_us,
         |  cast(max(cusum) AS bigint) AS max_cusum,
         |  cast(max(n) AS bigint) AS n
         |FROM cu JOIN mx ON cu.event_type = mx.event_type
         |  AND cu.cusum = mx.max_cusum
         |GROUP BY 1""".stripMargin
    },

    // ACF: the same integral-division mean, the same (e, event_id)
    // window order carrying five leads, exact long lag-product sums,
    // the identical double division inside floor
    "q_acf" -> {
      val leads = (1 to 5).map(l => s"lead(dc, $l) OVER w AS d$l")
        .mkString(", ")
      val cols = (1 to 5).map(l =>
        s"""CASE WHEN cast(sum(dc * dc) AS bigint) > 0 THEN
           |    cast(floor(cast(cast(sum(dc * d$l) AS bigint) AS double)
           |      / cast(cast(sum(dc * dc) AS bigint) AS double)
           |      * 1000000.0 + 0.5) AS bigint) END AS acf${l}_micro"""
          .stripMargin).mkString(",\n")
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) AS e, event_id,
         |        cast(floor(value * 100 + 0.5) AS bigint) AS c
         |      FROM events),
         |mu AS (SELECT event_type,
         |        cast(sum(c) AS bigint) // cast(count(*) AS bigint) AS mu,
         |        cast(count(*) AS bigint) AS n
         |      FROM ev GROUP BY 1),
         |b AS (SELECT ev.event_type, e, event_id, c - mu AS dc, n
         |      FROM ev JOIN mu USING (event_type)),
         |ld AS (SELECT event_type, n, dc, $leads
         |      FROM b WINDOW w AS (PARTITION BY event_type
         |        ORDER BY e, event_id))
         |SELECT event_type, cast(max(n) AS bigint) AS n,
         |$cols
         |FROM ld GROUP BY 1""".stripMargin
    },

    // Rocchio expansion: the shared bm25 CTE chain picks the same
    // top-10 rel set; tf over rel docs, corpus df, the identical
    // micro-integerized idf, the same top-15 order
    "q_rocchio_expand" -> {
      val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH ${bm25CteSql()},
         |rel AS (SELECT doc_id FROM sc
         |        ORDER BY score_micro DESC, doc_id LIMIT 10),
         |rt AS (SELECT t, cast(count(*) AS bigint) AS rtf
         |      FROM (SELECT unnest(tk) AS t
         |            FROM tk JOIN rel USING (doc_id))
         |      WHERE t NOT IN ($terms) GROUP BY 1),
         |dfa AS (SELECT t, cast(count(*) AS bigint) AS df
         |      FROM (SELECT unnest(list_distinct(tk)) AS t FROM tk)
         |      GROUP BY 1)
         |SELECT rt.t AS term, rtf, df,
         |  cast(floor(ln((cast(n_docs - df AS double) + 0.5)
         |      / (cast(df AS double) + 0.5) + 1.0)
         |    * 1000000.0 + 0.5) AS bigint) * rtf AS w_micro
         |FROM rt JOIN dfa ON rt.t = dfa.t CROSS JOIN st
         |ORDER BY w_micro DESC, term LIMIT 15""".stripMargin
    },

    // k-NN graph: the q_ann_ivf TWO-LEVEL cell argmax from the same
    // centroid/coarse literals, within-cell rank-3 edges, in-degree
    // histogram + mutual-pair self-join — all exact integers past the
    // 4-rounded similarity
    "q_knn_graph" -> {
      def dots(vecExpr: String) =
        s"""list_transform(generate_series(1, cells),
           |          __j -> list_dot_product($vecExpr, cs[__j]))""".stripMargin
      def mgds(vecExpr: String) =
        s"""list_transform(generate_series(1, gcnt), __g ->
           |      CASE WHEN list_contains(gl, __g - 1)
           |           THEN list_dot_product($vecExpr, gs[__g])
           |           ELSE -1e308 END)""".stripMargin
      s"""WITH $annParamCte,
         |$ivfCentCte,
         |$ivfCoarseCte,
         |$ivfGroupListCte,
         |cl AS (
         |  SELECT vec_id, v, list_position(mds, list_max(mds)) - 1 AS cell
         |  FROM (
         |    SELECT vec_id, v,
         |      list_transform(generate_series(1, cells), __j ->
         |        CASE WHEN gl[__j] = vg THEN ds[__j] ELSE -1e308 END)
         |        AS mds
         |    FROM (
         |      SELECT vec_id, v, ds, gl,
         |        list_position(mg, list_max(mg)) - 1 AS vg
         |      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |              ${dots("CAST(embedding AS DOUBLE[])")} AS ds,
         |              ${mgds("CAST(embedding AS DOUBLE[])")} AS mg,
         |              gl
         |            FROM embeddings, ann_p, ivf_cs, ivf_gs, ivf_gl)),
         |      ann_p)),
         |pr AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
         |    ${rs("list_cosine_similarity(a.v, b.v)", 4)} AS sim
         |  FROM cl a JOIN cl b
         |  ON a.cell = b.cell AND a.vec_id <> b.vec_id),
         |rk AS (SELECT ia, ib, row_number() OVER (PARTITION BY ia
         |    ORDER BY sim DESC, ib) AS rn FROM pr),
         |e AS (SELECT ia, ib FROM rk WHERE rn <= 3),
         |ind AS (SELECT ib, cast(count(*) AS bigint) AS ind
         |      FROM e GROUP BY 1),
         |d0 AS (SELECT emb0.vec_id, coalesce(ind.ind, 0) AS ind
         |      FROM (SELECT vec_id FROM embeddings) emb0
         |      LEFT JOIN ind ON emb0.vec_id = ind.ib),
         |h AS (SELECT cast(ind AS bigint) AS in_deg,
         |        cast(count(*) AS bigint) AS n_vecs
         |      FROM d0 GROUP BY 1),
         |m AS (SELECT cast(count(*) AS bigint) AS mutual_pairs
         |      FROM e x JOIN e y ON x.ia = y.ib AND x.ib = y.ia
         |      WHERE x.ia < x.ib)
         |SELECT in_deg, n_vecs, mutual_pairs FROM h, m""".stripMargin
    },

    // chi-square term selection: same distinct-term fan-out, same
    // exact df counts, the identical double χ² tree, same top-20 order
    "q_chi2_terms" -> {
      val nTok = "len(string_split(text,' '))"
      val stop = "len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
      val keep = s"(NOT ($nTok < 20 OR $nTok > 1000) " +
        s"AND NOT (length(text) - ($nTok - 1) < $nTok * 3 " +
        s"OR length(text) - ($nTok - 1) > $nTok * 10) " +
        s"AND $stop >= 2 " +
        s"AND len(list_distinct(string_split(text,' '))) * 10 " +
        s">= $nTok * 3)"
      val chi2 = "cast(nn AS double) * " +
        "((a * e - b * c0) * (a * e - b * c0)) / " +
        "((a + b) * (c0 + e) * (a + c0) * (b + e))"
      s"""WITH lab AS (SELECT CASE WHEN $keep THEN 1 ELSE 0 END AS pos,
         |        text FROM documents),
         |tot AS (SELECT cast(count(*) AS bigint) AS nn,
         |        cast(sum(pos) AS bigint) AS pp FROM lab),
         |td AS (SELECT pos,
         |        unnest(list_distinct(string_split(text, ' '))) AS term
         |      FROM lab),
         |c AS (SELECT term, cast(count(*) AS bigint) AS dfc,
         |        cast(sum(pos) AS bigint) AS n1
         |      FROM td GROUP BY 1 HAVING count(*) >= 5),
         |f AS (SELECT term, n1, dfc - n1 AS n10,
         |        cast(n1 AS double) AS a,
         |        cast(dfc - n1 AS double) AS b,
         |        cast(pp AS double) - cast(n1 AS double) AS c0,
         |        cast(nn - pp AS double) - cast(dfc - n1 AS double) AS e,
         |        nn
         |      FROM c, tot)
         |SELECT term, n1 AS n11, n10,
         |  CASE WHEN (a + b) * (c0 + e) * (a + c0) * (b + e) = 0.0
         |       THEN 0.0 ELSE ${rs(chi2, 4)} END AS chi2
         |FROM f ORDER BY chi2 DESC, term LIMIT 20""".stripMargin
    },

    // isotonic PAV fit: the same 10-row bucket rollup, the same
    // integer micro interval rates, the minimax characterization as a
    // bounded triple join — bit-equal to the driver-side fit
    "q_isotonic_calibration" -> {
      val nTok = "len(string_split(text,' '))"
      val stop = "len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
      val atl = rs(s"cast(length(text) - ($nTok - 1) AS double) / $nTok", 6)
      val swr = rs(s"cast($stop AS double) / $nTok", 6)
      val punct = "(length(text) - " +
        "length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
      val z = s"CAST(-1.5 AS DOUBLE) + cast($nTok AS int) * " +
        s"CAST(0.002 AS DOUBLE) + ($swr) * CAST(2.0 AS DOUBLE) - " +
        s"$punct * CAST(0.01 AS DOUBLE) + ($atl) * CAST(0.1 AS DOUBLE)"
      val q = rs(s"1.0 / (1.0 + exp(-($z)))", 6)
      val keep = s"(NOT ($nTok < 20 OR $nTok > 1000) " +
        s"AND NOT (length(text) - ($nTok - 1) < $nTok * 3 " +
        s"OR length(text) - ($nTok - 1) > $nTok * 10) " +
        s"AND $stop >= 2 " +
        s"AND len(list_distinct(string_split(text,' '))) * 10 " +
        s">= $nTok * 3)"
      s"""WITH sc AS (SELECT
         |        least(9, cast(floor(($q) * 1000000.0 + 0.5) AS bigint)
         |          // 100000) AS bucket,
         |        CASE WHEN $keep THEN 1 ELSE 0 END AS pos
         |      FROM documents),
         |a AS (SELECT bucket, cast(count(*) AS bigint) AS n,
         |        cast(sum(pos) AS bigint) AS np
         |      FROM sc GROUP BY 1),
         |cum AS (SELECT bucket, n, np,
         |        cast(sum(n) OVER (ORDER BY bucket) AS bigint) AS cn,
         |        cast(sum(np) OVER (ORDER BY bucket) AS bigint) AS cp
         |      FROM a),
         |lo AS (SELECT bucket,
         |        cast(coalesce(lag(cn) OVER (ORDER BY bucket), 0)
         |          AS bigint) AS cn0,
         |        cast(coalesce(lag(cp) OVER (ORDER BY bucket), 0)
         |          AS bigint) AS cp0
         |      FROM cum),
         |rt AS (SELECT lo.bucket AS jb, cum.bucket AS kb,
         |        (2 * (cum.cp - lo.cp0) * 1000000 + (cum.cn - lo.cn0))
         |          // (2 * (cum.cn - lo.cn0)) AS rm
         |      FROM lo, cum WHERE lo.bucket <= cum.bucket),
         |mn AS (SELECT rt.jb, i.bucket AS ib, cast(min(rm) AS bigint) AS m
         |      FROM rt, (SELECT bucket FROM a) i
         |      WHERE rt.jb <= i.bucket AND rt.kb >= i.bucket
         |      GROUP BY 1, 2),
         |fit AS (SELECT ib AS bucket, cast(max(m) AS bigint) AS fm
         |      FROM mn GROUP BY 1)
         |SELECT a.bucket, a.n, a.np AS n_pos,
         |  cast((2 * a.np * 1000000 + a.n) // (2 * a.n) AS double)
         |    / 1000000.0 AS raw,
         |  cast(fm AS double) / 1000000.0 AS fitted
         |FROM a JOIN fit ON a.bucket = fit.bucket""".stripMargin
    },

    // tie-aware Mann–Whitney AUC per source: same score/label row,
    // same distinct-score grouping, same negatives-below window
    // (partitioned by source), same integer micro rounding
    "q_auc" -> {
      val nTok = "len(string_split(text,' '))"
      val stop = "len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
      val atl = rs(s"cast(length(text) - ($nTok - 1) AS double) / $nTok", 6)
      val swr = rs(s"cast($stop AS double) / $nTok", 6)
      val punct = "(length(text) - " +
        "length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
      val z = s"CAST(-1.5 AS DOUBLE) + cast($nTok AS int) * " +
        s"CAST(0.002 AS DOUBLE) + ($swr) * CAST(2.0 AS DOUBLE) - " +
        s"$punct * CAST(0.01 AS DOUBLE) + ($atl) * CAST(0.1 AS DOUBLE)"
      val q = rs(s"1.0 / (1.0 + exp(-($z)))", 6)
      val keep = s"(NOT ($nTok < 20 OR $nTok > 1000) " +
        s"AND NOT (length(text) - ($nTok - 1) < $nTok * 3 " +
        s"OR length(text) - ($nTok - 1) > $nTok * 10) " +
        s"AND $stop >= 2 " +
        s"AND len(list_distinct(string_split(text,' '))) * 10 " +
        s">= $nTok * 3)"
      s"""WITH sc AS (SELECT source,
         |        cast(floor(($q) * 1000000.0 + 0.5) AS bigint) AS qm,
         |        CASE WHEN $keep THEN 1 ELSE 0 END AS pos
         |      FROM documents),
         |g AS (SELECT source, qm, cast(count(*) AS bigint) AS n,
         |        cast(sum(pos) AS bigint) AS p
         |      FROM sc GROUP BY 1, 2),
         |wv AS (SELECT source, n, p,
         |        cast(coalesce(sum(n - p) OVER (PARTITION BY source
         |          ORDER BY qm ROWS BETWEEN UNBOUNDED PRECEDING
         |          AND 1 PRECEDING), 0) AS bigint) AS nb
         |      FROM g),
         |a AS (SELECT source, cast(sum(p) AS bigint) AS n_pos,
         |        cast(sum(n - p) AS bigint) AS n_neg,
         |        cast(sum(2 * p * nb + p * (n - p)) AS bigint) AS u2
         |      FROM wv GROUP BY 1)
         |SELECT source, n_pos, n_neg, u2,
         |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0.5
         |       ELSE cast((u2 * 1000000 + n_pos * n_neg)
         |         // (2 * n_pos * n_neg) AS double) / 1000000.0
         |  END AS auc
         |FROM a""".stripMargin
    },

    // Cohen's kappa: the shared scored CTE, the same four CASE
    // counters, the identical (po − pe)/(1 − pe) double tree
    "q_cohen_kappa" ->
      s"""WITH $scoredSrcCteSql,
         |a AS (SELECT source, cast(count(*) AS bigint) AS n,
         |    cast(sum(CASE WHEN pos = 1 AND qm >= 500000 THEN 1 ELSE 0
         |      END) AS bigint) AS n11,
         |    cast(sum(CASE WHEN pos = 1 AND qm < 500000 THEN 1 ELSE 0
         |      END) AS bigint) AS n10,
         |    cast(sum(CASE WHEN pos = 0 AND qm >= 500000 THEN 1 ELSE 0
         |      END) AS bigint) AS n01,
         |    cast(sum(CASE WHEN pos = 0 AND qm < 500000 THEN 1 ELSE 0
         |      END) AS bigint) AS n00
         |  FROM sc GROUP BY 1)
         |SELECT source, n, n11, n10, n01, n00,
         |  CASE WHEN 1.0 - (cast(n11 + n10 AS double) / cast(n AS double)
         |      * (cast(n11 + n01 AS double) / cast(n AS double))
         |      + (1.0 - cast(n11 + n10 AS double) / cast(n AS double))
         |      * (1.0 - cast(n11 + n01 AS double) / cast(n AS double))) > 0
         |    THEN cast(floor((cast(n11 + n00 AS double) / cast(n AS double)
         |      - (cast(n11 + n10 AS double) / cast(n AS double)
         |        * (cast(n11 + n01 AS double) / cast(n AS double))
         |        + (1.0 - cast(n11 + n10 AS double) / cast(n AS double))
         |        * (1.0 - cast(n11 + n01 AS double) / cast(n AS double))))
         |      / (1.0 - (cast(n11 + n10 AS double) / cast(n AS double)
         |        * (cast(n11 + n01 AS double) / cast(n AS double))
         |        + (1.0 - cast(n11 + n10 AS double) / cast(n AS double))
         |        * (1.0 - cast(n11 + n01 AS double) / cast(n AS double))))
         |      * 1000000.0 + 0.5) AS bigint) END AS kappa_micro
         |FROM a""".stripMargin,

    // Brier decomposition: the shared scored CTE, the same 10-bin
    // rollup with exact squared-error mass, per-bin terms floored to
    // micro longs BEFORE the cross-bin sum, integral // n division
    "q_brier" ->
      s"""WITH $scoredSrcCteSql,
         |ba AS (SELECT source, least(9, qm // 100000) AS bin,
         |    cast(count(*) AS bigint) AS nk,
         |    cast(sum(qm) AS bigint) AS sp,
         |    cast(sum(pos) AS bigint) AS so,
         |    cast(sum((qm - pos * 1000000) * (qm - pos * 1000000))
         |      AS bigint) AS sq
         |  FROM sc GROUP BY 1, 2),
         |sa AS (SELECT source, cast(sum(nk) AS bigint) AS n,
         |    cast(sum(so) AS bigint) AS npos,
         |    cast(sum(sq) AS bigint) AS sqt
         |  FROM ba GROUP BY 1),
         |t AS (SELECT ba.source, n, npos, sqt,
         |    cast(floor(cast(nk AS double)
         |      * (cast(sp AS double) / (cast(nk AS double) * 1000000.0)
         |        - cast(so AS double) / cast(nk AS double))
         |      * (cast(sp AS double) / (cast(nk AS double) * 1000000.0)
         |        - cast(so AS double) / cast(nk AS double))
         |      * 1000000.0 + 0.5) AS bigint) AS rel_k,
         |    cast(floor(cast(nk AS double)
         |      * (cast(so AS double) / cast(nk AS double)
         |        - cast(npos AS double) / cast(n AS double))
         |      * (cast(so AS double) / cast(nk AS double)
         |        - cast(npos AS double) / cast(n AS double))
         |      * 1000000.0 + 0.5) AS bigint) AS res_k
         |  FROM ba JOIN sa ON ba.source = sa.source)
         |SELECT source, cast(max(n) AS bigint) AS n,
         |  cast(floor(cast(max(sqt) AS double)
         |    / (cast(max(n) AS double) * 1000000000000.0)
         |    * 1000000.0 + 0.5) AS bigint) AS brier_micro,
         |  cast(sum(rel_k) AS bigint) // cast(max(n) AS bigint)
         |    AS reliability_micro,
         |  cast(sum(res_k) AS bigint) // cast(max(n) AS bigint)
         |    AS resolution_micro,
         |  cast(floor((cast(max(npos) AS double) / cast(max(n) AS double))
         |    * (1.0 - cast(max(npos) AS double) / cast(max(n) AS double))
         |    * 1000000.0 + 0.5) AS bigint) AS uncertainty_micro
         |FROM t GROUP BY 1""".stripMargin,

    // precision/recall/F1 threshold sweep: same 9-threshold fan-out,
    // same exact counters, same (2·num·10⁶ + den) // (2·den) rounding
    "q_pr_curve" -> {
      val nTok = "len(string_split(text,' '))"
      val stop = "len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
      val atl = rs(s"cast(length(text) - ($nTok - 1) AS double) / $nTok", 6)
      val swr = rs(s"cast($stop AS double) / $nTok", 6)
      val punct = "(length(text) - " +
        "length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
      val z = s"CAST(-1.5 AS DOUBLE) + cast($nTok AS int) * " +
        s"CAST(0.002 AS DOUBLE) + ($swr) * CAST(2.0 AS DOUBLE) - " +
        s"$punct * CAST(0.01 AS DOUBLE) + ($atl) * CAST(0.1 AS DOUBLE)"
      val q = rs(s"1.0 / (1.0 + exp(-($z)))", 6)
      val keep = s"(NOT ($nTok < 20 OR $nTok > 1000) " +
        s"AND NOT (length(text) - ($nTok - 1) < $nTok * 3 " +
        s"OR length(text) - ($nTok - 1) > $nTok * 10) " +
        s"AND $stop >= 2 " +
        s"AND len(list_distinct(string_split(text,' '))) * 10 " +
        s">= $nTok * 3)"
      def ratio(num: String, den: String): String =
        s"CASE WHEN ($den) = 0 THEN 0.0 ELSE " +
          s"cast((2 * ($num) * 1000000 + ($den)) // (2 * ($den)) " +
          s"AS double) / 1000000.0 END"
      s"""WITH sc AS (SELECT
         |        cast(floor(($q) * 1000000.0 + 0.5) AS bigint) AS qm,
         |        CASE WHEN $keep THEN 1 ELSE 0 END AS pos
         |      FROM documents),
         |th AS (SELECT unnest(generate_series(1, 9)) AS t),
         |c AS (SELECT t,
         |        cast(sum(CASE WHEN qm >= t * 100000 AND pos = 1
         |          THEN 1 ELSE 0 END) AS bigint) AS tp,
         |        cast(sum(CASE WHEN qm >= t * 100000 AND pos = 0
         |          THEN 1 ELSE 0 END) AS bigint) AS fp,
         |        cast(sum(CASE WHEN qm < t * 100000 AND pos = 1
         |          THEN 1 ELSE 0 END) AS bigint) AS fn
         |      FROM sc, th GROUP BY 1)
         |SELECT t, tp, fp, fn,
         |  ${ratio("tp", "tp + fp")} AS prec,
         |  ${ratio("tp", "tp + fn")} AS recall,
         |  ${ratio("2 * tp", "2 * tp + fp + fn")} AS f1
         |FROM c""".stripMargin
    },

    // Welch t-test source pairs: same exact moment table, the
    // IDENTICAL double expression tree (cast points, operand order,
    // sqrt) so the IEEE bits agree before the floor-round
    "q_welch_ttest" -> {
      val nTok = "len(string_split(text,' '))"
      val stop = "len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
      val atl = rs(s"cast(length(text) - ($nTok - 1) AS double) / $nTok", 6)
      val swr = rs(s"cast($stop AS double) / $nTok", 6)
      val punct = "(length(text) - " +
        "length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
      val z = s"CAST(-1.5 AS DOUBLE) + cast($nTok AS int) * " +
        s"CAST(0.002 AS DOUBLE) + ($swr) * CAST(2.0 AS DOUBLE) - " +
        s"$punct * CAST(0.01 AS DOUBLE) + ($atl) * CAST(0.1 AS DOUBLE)"
      val q = rs(s"1.0 / (1.0 + exp(-($z)))", 6)
      val va = "(cast(n_a AS double) * cast(s2_a AS double) " +
        "- cast(s1_a AS double) * cast(s1_a AS double)) " +
        "/ (cast(n_a AS double) * (cast(n_a AS double) - 1.0))"
      val vb = "(cast(n_b AS double) * cast(s2_b AS double) " +
        "- cast(s1_b AS double) * cast(s1_b AS double)) " +
        "/ (cast(n_b AS double) * (cast(n_b AS double) - 1.0))"
      val se2 = s"($va) / cast(n_a AS double) + ($vb) / cast(n_b AS double)"
      val md = "cast(s1_a AS double) / cast(n_a AS double) " +
        "- cast(s1_b AS double) / cast(n_b AS double)"
      val dfE = s"($se2) * ($se2) / " +
        s"((($va) / cast(n_a AS double)) * (($va) / cast(n_a AS double)) " +
        s"/ (cast(n_a AS double) - 1.0) " +
        s"+ (($vb) / cast(n_b AS double)) * (($vb) / cast(n_b AS double)) " +
        s"/ (cast(n_b AS double) - 1.0))"
      s"""WITH sc AS (SELECT source,
         |        cast(floor(($q) * 1000000.0 + 0.5) AS bigint) AS qm
         |      FROM documents),
         |st AS (SELECT source, cast(count(*) AS bigint) AS n,
         |        cast(sum(qm) AS bigint) AS s1,
         |        cast(sum(qm * qm) AS bigint) AS s2
         |      FROM sc GROUP BY 1 HAVING count(*) >= 2),
         |p AS (SELECT a.source AS src_a, b.source AS src_b,
         |        a.n AS n_a, b.n AS n_b, a.s1 AS s1_a, b.s1 AS s1_b,
         |        a.s2 AS s2_a, b.s2 AS s2_b
         |      FROM st a JOIN st b ON a.source < b.source)
         |SELECT src_a, src_b, n_a, n_b,
         |  ${rs("cast(s1_a AS double) / cast(n_a AS double) / 1000000.0",
              6)} AS mean_a,
         |  ${rs("cast(s1_b AS double) / cast(n_b AS double) / 1000000.0",
              6)} AS mean_b,
         |  ${rs(s"CASE WHEN ($se2) <= 0.0 THEN 0.0 " +
              s"ELSE ($md) / sqrt($se2) END", 6)} AS t_stat,
         |  ${rs(s"CASE WHEN ($se2) <= 0.0 THEN 0.0 ELSE $dfE END", 4)}
         |    AS df
         |FROM p""".stripMargin
    },

    // Wasserstein-1 source pairs: the same (source, length, count)
    // grid, CDF difference integrated over the shared length domain,
    // HUGEINT mass and the identical round-half-up integral division
    "q_wasserstein" ->
      """WITH lc AS (SELECT source,
        |        cast(len(string_split(text, ' ')) AS bigint) AS l,
        |        cast(count(*) AS bigint) AS c
        |      FROM documents GROUP BY 1, 2),
        |src AS (SELECT source, cast(sum(c) AS bigint) AS n
        |      FROM lc GROUP BY 1),
        |xs AS (SELECT DISTINCT l FROM lc),
        |gap AS (SELECT l, lead(l) OVER (ORDER BY l) - l AS g FROM xs),
        |grid AS (SELECT s.source, s.n, x.l,
        |        cast(coalesce(lc.c, 0) AS bigint) AS c
        |      FROM src s CROSS JOIN xs x
        |      LEFT JOIN lc ON lc.source = s.source AND lc.l = x.l),
        |cum AS (SELECT source, n, l,
        |        cast(sum(c) OVER (PARTITION BY source ORDER BY l)
        |          AS bigint) AS cum
        |      FROM grid)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  a.n AS n_a, b.n AS n_b,
        |  cast((2 * sum(cast(abs(a.cum * b.n - b.cum * a.n) AS hugeint)
        |          * g.g) * 1000000
        |      + cast(a.n AS hugeint) * b.n)
        |    // (2 * cast(a.n AS hugeint) * b.n) AS bigint) AS w1_micro
        |FROM cum a
        |JOIN cum b ON a.l = b.l AND a.source < b.source
        |JOIN gap g ON g.l = a.l AND g.g IS NOT NULL
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    // Kruskal-Wallis: the same tie-average doubled ranks from the
    // length-domain cumulative, exact long rank sums, H folded over
    // sources in sorted order (list_reduce ≡ the driver's foldLeft,
    // first element as seed: 0+x₁ = x₁) with the identical double
    // tree before the floor-round
    "q_kruskal" ->
      """WITH lc AS (SELECT source,
        |        cast(len(string_split(text, ' ')) AS bigint) AS l,
        |        cast(count(*) AS bigint) AS c
        |      FROM documents GROUP BY 1, 2),
        |lt AS (SELECT l, cast(sum(c) AS bigint) AS t,
        |        cast(coalesce(sum(sum(c)) OVER (ORDER BY l
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS bigint) AS a
        |      FROM lc GROUP BY l),
        |rg AS (SELECT source, cast(sum(c) AS bigint) AS n_g,
        |        cast(sum(c * (2 * a + t + 1)) AS bigint) AS r2
        |      FROM lc JOIN lt USING (l) GROUP BY 1),
        |gl AS (SELECT cast(sum(n_g) AS bigint) AS n,
        |        cast(count(*) AS bigint) AS k,
        |        list_reduce(list((cast(r2 AS double) / 2.0)
        |            * (cast(r2 AS double) / 2.0) / cast(n_g AS double)
        |          ORDER BY source), (acc, v) -> acc + v) AS s
        |      FROM rg),
        |tie AS (SELECT cast(sum(t * t * t - t) AS bigint) AS tt
        |      FROM lt),
        |hs AS (SELECT n, k, tt,
        |        12.0 * s / (cast(n AS double) * (cast(n AS double)
        |          + 1.0)) - 3.0 * (cast(n AS double) + 1.0) AS h,
        |        1.0 - cast(tt AS double) / (cast(n AS double)
        |          * cast(n AS double) * cast(n AS double)
        |          - cast(n AS double)) AS cc
        |      FROM gl CROSS JOIN tie)
        |SELECT source, n_g, r2 AS rank2_sum, n AS n_total,
        |  cast(k - 1 AS bigint) AS df, tt AS tie_sum,
        |  cast(floor(h * 1000000.0 + 0.5) AS bigint) AS h_micro,
        |  cast(floor((CASE WHEN cc = 0.0 THEN 0.0 ELSE h / cc END)
        |    * 1000000.0 + 0.5) AS bigint) AS hc_micro
        |FROM rg CROSS JOIN hs""".stripMargin,

    // Fleiss' kappa: the same four gate clauses as q_gopher_filter
    // voting keep, 5-row histogram, exact long masses, identical
    // double tree (every sub-expression spelled the same way)
    "q_fleiss_kappa" -> {
      val p = "cast(t_keep AS double) / (4.0 * cast(n_docs AS double))"
      val pe = s"($p * $p + (1.0 - $p) * (1.0 - $p))"
      val pb = "(cast(s2 AS double) - 4.0 * cast(n_docs AS double)) " +
        "/ (12.0 * cast(n_docs AS double))"
      s"""WITH m AS (SELECT
         |    cast(len(string_split(text, ' ')) AS bigint) AS n_tokens,
         |    cast(length(text) - (len(string_split(text, ' ')) - 1)
         |      AS bigint) AS word_chars,
         |    cast(len(list_filter(string_split(text, ' '),
         |      t -> t IN ('the','a','an','of','to','in','and','is','it',
         |                 'that'))) AS bigint) AS stop_hits,
         |    cast(len(list_distinct(string_split(text, ' '))) AS bigint)
         |      AS n_distinct
         |  FROM documents),
         |votes AS (SELECT
         |    cast(CASE WHEN n_tokens < 20 OR n_tokens > 1000
         |         THEN 0 ELSE 1 END
         |     + CASE WHEN word_chars < n_tokens*3
         |            OR word_chars > n_tokens*10 THEN 0 ELSE 1 END
         |     + CASE WHEN stop_hits < 2 THEN 0 ELSE 1 END
         |     + CASE WHEN n_distinct*10 < n_tokens*3 THEN 0 ELSE 1 END
         |      AS bigint) AS x
         |  FROM m),
         |hist AS (SELECT x, cast(count(*) AS bigint) AS n_x
         |  FROM votes GROUP BY 1),
         |tot AS (SELECT cast(sum(n_x) AS bigint) AS n_docs,
         |    cast(sum(x * n_x) AS bigint) AS t_keep,
         |    cast(sum(n_x * (x * x + (4 - x) * (4 - x))) AS bigint) AS s2
         |  FROM hist)
         |SELECT x AS keep_votes, n_x, n_docs,
         |  cast(t_keep * 1000000 // (4 * n_docs) AS bigint)
         |    AS p_keep_micro,
         |  CASE WHEN 1.0 - $pe <= 0.0 THEN cast(0 AS bigint)
         |    ELSE cast(floor(($pb - $pe) / (1.0 - $pe)
         |      * 1000000.0 + 0.5) AS bigint) END AS kappa_micro
         |FROM hist CROSS JOIN tot""".stripMargin
    },

    // Cliff's delta: the same (source, length, count) grid, exact
    // dominance masses over the shared domain, one double division
    "q_cliffs_delta" ->
      """WITH lc AS (SELECT source,
        |        cast(len(string_split(text, ' ')) AS bigint) AS l,
        |        cast(count(*) AS bigint) AS c
        |      FROM documents GROUP BY 1, 2),
        |src AS (SELECT source, cast(sum(c) AS bigint) AS n
        |      FROM lc GROUP BY 1),
        |xs AS (SELECT DISTINCT l FROM lc),
        |grid AS (SELECT s.source, s.n, x.l,
        |        cast(coalesce(lc.c, 0) AS bigint) AS c
        |      FROM src s CROSS JOIN xs x
        |      LEFT JOIN lc ON lc.source = s.source AND lc.l = x.l),
        |cum AS (SELECT source, n, l, c,
        |        cast(sum(c) OVER (PARTITION BY source ORDER BY l)
        |          AS bigint) AS cum
        |      FROM grid),
        |pw AS (SELECT a.source AS src_a, b.source AS src_b,
        |        a.n AS n_a, b.n AS n_b,
        |        cast(sum(a.c * (b.cum - b.c)) AS bigint) AS wins,
        |        cast(sum(a.c * b.c) AS bigint) AS ties
        |      FROM cum a JOIN cum b
        |        ON a.l = b.l AND a.source < b.source
        |      GROUP BY 1, 2, 3, 4)
        |SELECT src_a, src_b, n_a, n_b, wins, ties,
        |  cast(n_a * n_b - wins - ties AS bigint) AS losses,
        |  cast(floor(cast(wins - (n_a * n_b - wins - ties) AS double)
        |    / (cast(n_a AS double) * cast(n_b AS double))
        |    * 1000000.0 + 0.5) AS bigint) AS delta_micro
        |FROM pw""".stripMargin,

    // cross-perplexity: the same per-source bigram grid, add-1
    // model lookups as left joins, per-bigram micro-nat surprisal
    // integerized before the exact mass fold, integral division
    "q_cross_perplexity" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS tk
        |      FROM documents
        |      WHERE len(string_split(text, ' ')) >= 2),
        |pr AS (SELECT source, tk[i] AS x, tk[i+1] AS y
        |      FROM (SELECT source, tk,
        |            unnest(generate_series(1, len(tk) - 1)) AS i
        |            FROM t)),
        |sb AS (SELECT source, x, y, cast(count(*) AS bigint) AS c
        |      FROM pr GROUP BY 1, 2, 3),
        |v AS (SELECT cast(count(DISTINCT w) AS bigint) AS v
        |      FROM (SELECT x AS w FROM sb
        |            UNION ALL SELECT y AS w FROM sb)),
        |om AS (SELECT source, x, cast(sum(c) AS bigint) AS outc
        |      FROM sb GROUP BY 1, 2),
        |srcs AS (SELECT DISTINCT source AS src_b FROM sb)
        |SELECT a.source AS src_a, s.src_b,
        |  cast(sum(a.c) AS bigint) AS n_bigrams,
        |  cast(cast(sum(a.c * cast(floor(-ln(
        |        cast(coalesce(b.c, 0) + 1 AS double)
        |        / cast(coalesce(o.outc, 0) + v.v AS double))
        |      * 1000000.0 + 0.5) AS bigint)) AS bigint)
        |    // cast(sum(a.c) AS bigint) AS bigint) AS h_cross_micro
        |FROM sb a CROSS JOIN srcs s CROSS JOIN v
        |LEFT JOIN sb b ON b.source = s.src_b
        |  AND b.x = a.x AND b.y = a.y
        |LEFT JOIN om o ON o.source = s.src_b AND o.x = a.x
        |GROUP BY 1, 2""".stripMargin,

    // feature-hashing embedder: md5-derived dim + sign, integer
    // components, summary facts (component 0, nnz, L2)
    "q_hash_embed" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |             FROM documents),
         |h AS (SELECT doc_id,
         |        cast(('0x' || substr(md5(tok), 1, 4)) AS int) % 64 AS dim,
         |        CASE WHEN cast(('0x' || substr(md5(tok), 5, 1)) AS int)
         |          % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |      FROM tok),
         |c AS (SELECT doc_id, dim, cast(sum(sgn) AS bigint) AS comp
         |      FROM h GROUP BY 1, 2)
         |SELECT doc_id,
         |  cast(sum(CASE WHEN dim = 0 THEN comp ELSE 0 END) AS bigint)
         |    AS d0,
         |  cast(sum(CASE WHEN comp <> 0 THEN 1 ELSE 0 END) AS bigint)
         |    AS nnz,
         |  ${rs("sqrt(cast(sum(comp*comp) AS double))", 6)} AS l2
         |FROM c GROUP BY doc_id""".stripMargin,

    // JL projection: identical micro integerization, the same md5
    // parity signs, exact integer distances, the identical
    // ratio/checksum trees; energy accumulates in DECIMAL(38,0) on
    // both engines but is emitted as hash-stable BIGINT hi/lo parts
    "q_jl_project" ->
      """WITH em AS (SELECT vec_id, i,
        |        cast(floor(v[i+1] * 1000000.0 + 0.5) AS bigint) AS xm
        |      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |              unnest(generate_series(0, len(embedding)-1)) AS i
        |            FROM embeddings)),
        |pj AS (SELECT vec_id, j, cast(sum(CASE WHEN
        |          cast(('0x' || substr(md5(i || '_' || j), 1, 4)) AS int)
        |          % 2 = 0 THEN xm ELSE -xm END) AS bigint) AS y
        |      FROM em, (SELECT unnest(generate_series(0, 3)) AS j)
        |      GROUP BY 1, 2),
        |chk AS (SELECT cast(count(*) // 4 AS bigint) AS n_vecs,
        |        cast(sum(y * y) AS decimal(38,0)) AS energy FROM pj),
        |sa AS (SELECT vec_id AS v, i, xm FROM em WHERE vec_id < 24),
        |do2 AS (SELECT a.v AS va, b.v AS vb,
        |        cast(sum((a.xm - b.xm) * (a.xm - b.xm)) AS bigint)
        |          AS d2_orig
        |      FROM sa a JOIN sa b ON a.i = b.i AND a.v < b.v
        |      GROUP BY 1, 2),
        |pv AS (SELECT vec_id AS v, j, y FROM pj WHERE vec_id < 24),
        |dp AS (SELECT a.v AS va, b.v AS vb,
        |        cast(sum((a.y - b.y) * (a.y - b.y)) AS bigint) AS d2_proj
        |      FROM pv a JOIN pv b ON a.j = b.j AND a.v < b.v
        |      GROUP BY 1, 2)
        |SELECT do2.va, do2.vb, d2_orig, d2_proj,
        |  cast(floor(cast(d2_proj AS double)
        |    / (cast(greatest(d2_orig, 1) AS double) * 4.0)
        |    * 1000000.0 + 0.5) AS bigint) AS dist_micro,
        |  n_vecs,
        |  cast(energy // 1000000000 AS bigint) AS energy_hi,
        |  cast(energy % 1000000000 AS bigint) AS energy_lo
        |FROM do2 JOIN dp ON do2.va = dp.va AND do2.vb = dp.vb,
        |  chk
        |ORDER BY do2.va, do2.vb""".stripMargin,

    // grid resample: same union + two-directional IGNORE NULLS window
    // walk, same bracketing ties, same interpolation operand order
    "q_resample" -> {
      val ordAsc = "ORDER BY tss, isg, coalesce(id, 9223372036854775807) " +
        "ROWS UNBOUNDED PRECEDING"
      val ordDesc = "ORDER BY tss DESC, isg DESC, " +
        "coalesce(id, 9223372036854775807) DESC ROWS UNBOUNDED PRECEDING"
      s"""WITH obs AS (SELECT user_id AS k, epoch(ts) AS tss,
         |               event_id AS id, value AS v FROM events),
         |b AS (SELECT k, cast(ceil(min(tss)/3600) AS bigint) AS gmin,
         |        cast(floor(max(tss)/3600) AS bigint) AS gmax
         |      FROM obs GROUP BY k),
         |grid AS (SELECT k, cast(g*3600 AS double) AS tss
         |         FROM (SELECT k, unnest(generate_series(gmin, gmax)) AS g
         |               FROM b WHERE gmin <= gmax)),
         |u AS (SELECT k, tss, id, v, 0 AS isg FROM obs
         |      UNION ALL
         |      SELECT k, tss, NULL, NULL, 1 FROM grid),
         |w1 AS (SELECT *,
         |  last_value(v IGNORE NULLS)
         |    OVER (PARTITION BY k $ordAsc) AS prev_v,
         |  last_value(CASE WHEN isg = 0 THEN tss END IGNORE NULLS)
         |    OVER (PARTITION BY k $ordAsc) AS prev_ts
         |  FROM u),
         |w2 AS (SELECT *,
         |  last_value(v IGNORE NULLS)
         |    OVER (PARTITION BY k $ordDesc) AS next_v,
         |  last_value(CASE WHEN isg = 0 THEN tss END IGNORE NULLS)
         |    OVER (PARTITION BY k $ordDesc) AS next_ts
         |  FROM w1)
         |SELECT k AS user_id, cast(tss AS bigint) AS grid_ts,
         |  ${rs("prev_v + (next_v - prev_v) * (tss - prev_ts) / " +
              "(next_ts - prev_ts)", 6)} AS v_interp
         |FROM w2
         |WHERE isg = 1 AND prev_ts IS NOT NULL AND next_ts IS NOT NULL"""
        .stripMargin
    },

    // command packet formatting re-derived byte-by-byte in SQL
    "q_command_format" -> {
      val rows = CommandTable
        .map { case (c, a, o) => s"('$c', '$a', $o)" }.mkString(",\n  ")
      def b(e: String) = s"lpad(upper(hex($e)), 2, '0')"
      val header = Seq(
        b("request_options"), "'00'",
        b("length(command) % 256"), b("length(command) // 256"),
        b("length(argument) % 256"), b("(length(argument) // 256) % 256"),
        b("(length(argument) // 65536) % 256"),
        b("length(argument) // 16777216")).mkString(" || ")
      s"""WITH cmds(command, argument, request_options) AS (VALUES
         |  $rows)
         |SELECT command, argument, request_options, header_hex,
         |  md5(header_hex || upper(hex(command)) || upper(hex(argument)))
         |    AS packet_md5
         |FROM (SELECT *, $header AS header_hex FROM cmds)""".stripMargin
    },

    // BPE trainer: 3 unrolled merge rounds (see bpeTrainSql)
    "q_bpe_train" -> s"WITH ${bpeTrainSql(3)}\n${bpeMergeSelect(3)}",

    // BPE apply: final vocab (v3) symbol counts joined onto the word
    // stream — per-doc tokenization stats
    // NOTE: the shared CTE text is concatenated, never interpolated
    // inside a stripMargin literal — stripMargin would eat one pipe of
    // every `||` in the interpolated SQL
    "q_bpe_apply" ->
      (s"WITH ${bpeTrainSql(3)},\n" +
        s"""wl AS (SELECT w, cast(len(syms) AS int) AS n_syms FROM v3)
           |SELECT doc_id, count(*) AS n_words,
           |  cast(sum(length(w)) AS bigint) AS n_chars,
           |  cast(sum(n_syms) AS bigint) AS n_bpe_tokens,
           |  ${rs("cast(sum(length(w)) AS double)/sum(n_syms)", 6)}
           |    AS chars_per_token
           |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           |      FROM documents) t
           |JOIN wl USING (w)
           |GROUP BY doc_id""".stripMargin),

    // BPE fertility per source: the q_bpe_apply derivation grouped by
    // source (documents carries source directly on the word stream)
    "q_bpe_fertility" ->
      (s"WITH ${bpeTrainSql(3)},\n" +
        s"""wl AS (SELECT w, cast(len(syms) AS int) AS n_syms FROM v3)
           |SELECT source, count(*) AS n_words,
           |  cast(sum(length(w)) AS bigint) AS n_chars,
           |  cast(sum(n_syms) AS bigint) AS n_bpe_tokens,
           |  ${rs("cast(sum(n_syms) AS double)/count(*)", 6)}
           |    AS fertility,
           |  ${rs("cast(sum(length(w)) AS double)/sum(n_syms)", 6)}
           |    AS chars_per_token
           |FROM (SELECT source, unnest(string_split(text, ' ')) AS w
           |      FROM documents) t
           |JOIN wl USING (w)
           |GROUP BY source""".stripMargin),

    // deterministic per-group reservoir: smallest-md5 rows per source
    "q_reservoir" ->
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id, row_number() OVER (PARTITION BY source
        |    ORDER BY md5(cast(doc_id AS varchar)), doc_id) AS rk
        |  FROM documents) WHERE rk <= 5""".stripMargin,

    // KMV sketch: the k smallest distinct 48-bit span hashes and the
    // (k-1)/U(k) estimator, reproduced exactly (ORDER BY h LIMIT k)
    "q_kmv_distinct" ->
      s"""WITH sp AS (SELECT DISTINCT doc_id, sp FROM (
         |  SELECT doc_id, unnest($spanShinglesSql) AS sp FROM documents)),
         |hh AS (SELECT DISTINCT
         |         cast(('0x' || substr(md5(sp), 1, 12)) AS bigint) AS h
         |       FROM sp),
         |mins AS (SELECT h FROM hh ORDER BY h LIMIT 256)
         |SELECT cast(256 AS int) AS k,
         |  (SELECT max(h) FROM mins) AS kth,
         |  ${rs("CAST(255 AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / " +
              "(SELECT max(h) FROM mins)", 4)} AS est_distinct,
         |  (SELECT cast(count(*) AS bigint) FROM hh) AS exact_distinct""".stripMargin,

    // HLL: registers rebuilt from the same 48-bit span hashes (9 index
    // bits, rank = 40 - length(bin(low 39 bits))); harmonic denominator
    // integerized as sum(2^(40-M)) BIGINT so the estimate is bit-exact
    "q_hll_distinct" ->
      s"""WITH sp AS (SELECT DISTINCT doc_id, sp FROM (
         |  SELECT doc_id, unnest($spanShinglesSql) AS sp FROM documents)),
         |hh AS (SELECT DISTINCT
         |         cast(('0x' || substr(md5(sp), 1, 12)) AS bigint) AS h
         |       FROM sp),
         |rr AS (SELECT (h >> 39) AS reg,
         |         CASE WHEN (h & 549755813887) = 0 THEN 40
         |              ELSE 40 - length(bin(h & 549755813887)) END AS rank
         |       FROM hh),
         |regs AS (SELECT reg, max(rank) AS mx,
         |                cast(count(*) AS bigint) AS cnt
         |         FROM rr GROUP BY 1)
         |SELECT cast(512 AS int) AS m,
         |  cast(512 - count(*) AS bigint) AS zeros,
         |  cast(sum(1::BIGINT << (40 - mx))
         |       + (512 - count(*)) * (1::BIGINT << 40) AS bigint) AS hden,
         |  ${rs("CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE)" +
              "+CAST(1.079 AS DOUBLE)/CAST(512.0 AS DOUBLE))" +
              "*CAST(262144.0 AS DOUBLE)*CAST(1099511627776.0 AS DOUBLE)" +
              "/CAST(sum(1::BIGINT << (40 - mx)) + (512 - count(*)) " +
              "* (1::BIGINT << 40) AS DOUBLE)", 4)} AS est_distinct,
         |  cast(sum(cnt) AS bigint) AS exact_distinct
         |FROM regs""".stripMargin,

    // HLL merge: per-source registers + element-wise-max union, same
    // integerized estimator as q_hll_distinct
    "q_hll_merge" ->
      s"""WITH sp AS (SELECT DISTINCT source, sp FROM (
         |  SELECT source, unnest($spanShinglesSql) AS sp FROM documents)),
         |hh AS (SELECT DISTINCT source,
         |         cast(('0x' || substr(md5(sp), 1, 12)) AS bigint) AS h
         |       FROM sp),
         |rr AS (SELECT source, (h >> 39) AS reg,
         |         CASE WHEN (h & 549755813887) = 0 THEN 40
         |              ELSE 40 - length(bin(h & 549755813887)) END AS rank
         |       FROM hh),
         |ps AS (SELECT source, reg, max(rank) AS mx FROM rr GROUP BY 1, 2),
         |al AS (SELECT 'ALL' AS source, reg, max(mx) AS mx
         |       FROM ps GROUP BY reg),
         |regs AS (SELECT source, mx FROM ps
         |         UNION ALL SELECT source, mx FROM al),
         |est AS (SELECT source,
         |  ${rs("CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE)" +
              "+CAST(1.079 AS DOUBLE)/CAST(512.0 AS DOUBLE))" +
              "*CAST(262144.0 AS DOUBLE)*CAST(1099511627776.0 AS DOUBLE)" +
              "/CAST(sum(1::BIGINT << (40 - mx)) + (512 - count(*)) " +
              "* (1::BIGINT << 40) AS DOUBLE)", 4)} AS est_distinct
         |  FROM regs GROUP BY 1),
         |ex AS (SELECT source, cast(count(*) AS bigint) AS exact_distinct
         |       FROM hh GROUP BY 1
         |       UNION ALL
         |       SELECT 'ALL', cast(count(DISTINCT h) AS bigint) FROM hh)
         |SELECT e.source, e.est_distinct, x.exact_distinct
         |FROM est e JOIN ex x USING (source) ORDER BY source""".stripMargin,

    // CMS heavy hitters: cells rebuilt from per-token exact counts via
    // the same md5-chunk hash rows; estimate = min over matching cells
    "q_cms_topk" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |cnt AS (SELECT token, cast(count(*) AS bigint) AS exact_cnt
        |        FROM tok GROUP BY 1),
        |cells AS (SELECT j,
        |    cast(('0x' || substr(md5(token), j*8+1, 8)) AS bigint) % 256
        |      AS cell,
        |    cast(sum(exact_cnt) AS bigint) AS v
        |  FROM cnt, (SELECT unnest(generate_series(0, 3)) AS j)
        |  GROUP BY 1, 2),
        |top AS (SELECT token, exact_cnt FROM cnt
        |        ORDER BY exact_cnt DESC, token LIMIT 20)
        |SELECT t.token, t.exact_cnt, min(c.v) AS cms_est
        |FROM top t JOIN cells c
        |  ON c.cell =
        |    cast(('0x' || substr(md5(t.token), c.j*8+1, 8)) AS bigint) % 256
        |GROUP BY 1, 2""".stripMargin,

    // CMS pruning: estimates from cells rebuilt over exact counts;
    // candidates are tokens clearing the integer N/64 threshold
    "q_cms_prune" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |n AS (SELECT cast(count(*) AS bigint) AS n_total FROM tok),
        |cnt AS (SELECT token, cast(count(*) AS bigint) AS exact_cnt
        |        FROM tok GROUP BY 1),
        |cells AS (SELECT j,
        |    cast(('0x' || substr(md5(token), j*8+1, 8)) AS bigint) % 256
        |      AS cell,
        |    cast(sum(exact_cnt) AS bigint) AS v
        |  FROM cnt, (SELECT unnest(generate_series(0, 3)) AS j)
        |  GROUP BY 1, 2),
        |est AS (SELECT t.token, t.exact_cnt, min(c.v) AS cms_est
        |  FROM cnt t JOIN cells c
        |    ON c.cell =
        |      cast(('0x' || substr(md5(t.token), c.j*8+1, 8)) AS bigint)
        |        % 256
        |  GROUP BY 1, 2)
        |SELECT token, exact_cnt, cms_est FROM est, n
        |WHERE cms_est >= n_total // 64""".stripMargin,

    // BPE merge candidates: adjacent char pairs within whitespace tokens
    "q_bpe_pairs" ->
      """SELECT pair, count(*) AS cnt FROM (
        |  SELECT substr(tok, cast(i AS int), 2) AS pair
        |  FROM (SELECT tok,
        |          unnest(generate_series(1, length(tok) - 1)) AS i
        |        FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |              FROM documents)
        |        WHERE length(tok) >= 2))
        |GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,

    "q_doc_repetition" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents),
         |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram
         |       FROM (SELECT doc_id, toks,
         |               unnest(generate_series(1, len(toks) - 1)) AS i
         |             FROM t WHERE len(toks) >= 2)),
         |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
         |ba AS (SELECT doc_id, max(c) AS top_bigram,
         |         cast(sum(c) AS bigint) AS n_bigrams FROM bc GROUP BY 1),
         |ta AS (SELECT doc_id, count(DISTINCT tk) AS n_distinct,
         |         count(*) AS n_tokens
         |       FROM (SELECT doc_id, unnest(toks) AS tk FROM t) GROUP BY 1)
         |SELECT ba.doc_id, ta.n_tokens, ba.n_bigrams, ba.top_bigram,
         |  ${rs("cast(ba.top_bigram AS double)/ba.n_bigrams", 6)}
         |    AS rep_ratio,
         |  ${rs("cast(ta.n_distinct AS double)/ta.n_tokens", 6)}
         |    AS distinct_ratio
         |FROM ba JOIN ta USING (doc_id)""".stripMargin,

    "q_domain_stats" ->
      s"""WITH k AS (SELECT source, lang, n_chars, doc_id,
         |    min(doc_id) OVER (PARTITION BY text) AS kept FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  count(DISTINCT lang) AS n_langs,
         |  cast(sum(n_chars) AS bigint) AS chars_total,
         |  cast(sum(CASE WHEN doc_id <> kept THEN 1 ELSE 0 END) AS bigint)
         |    AS n_dups,
         |  ${rs("cast(sum(CASE WHEN doc_id <> kept THEN 1 ELSE 0 END) " +
              "AS double)/count(*)", 6)} AS dup_ratio
         |FROM k GROUP BY source""".stripMargin,

    "q_tfidf" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |             FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT doc_id, term, tf, df,
         |  ${rs("tf * ln(CAST(n_docs AS DOUBLE)/df)", 6)} AS tfidf
         |FROM (SELECT t.doc_id, t.term, t.tf, d.df, n.n_docs,
         |        row_number() OVER (PARTITION BY t.doc_id
         |          ORDER BY t.tf DESC, d.df ASC, t.term) AS rk
         |      FROM tf t JOIN df d USING (term) CROSS JOIN n)
         |WHERE rk <= 5""".stripMargin,

    "q_inverted_index" ->
      """WITH tok AS (SELECT DISTINCT doc_id, token
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |        FROM documents))
        |SELECT token, count(*) AS df,
        |  array_to_string(list_sort(list(doc_id)), ',') AS postings
        |FROM tok GROUP BY token
        |HAVING count(*) BETWEEN 3 AND 50""".stripMargin,

    "q_kmeans_embed" ->
      s"""WITH $kmeansCtes
         |SELECT g.cluster_id, g.n_vecs, c1.v[1] AS c_first,
         |  floor(sqrt(list_dot_product(c1.v, c1.v))*1000000 + 0.5)/1000000
         |    AS c_norm
         |FROM (SELECT cluster_id, count(*) AS n_vecs FROM a2 GROUP BY 1) g
         |JOIN c1 ON c1.cell = g.cluster_id""".stripMargin,

    "q_text_stats" -> {
      val nTok = "len(string_split(text,' '))"
      val stop = "len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
      s"""SELECT doc_id, cast($nTok AS int) AS n_tokens,
         | cast(length(text) AS bigint) AS n_chars_m,
         | ${rs(s"cast(length(text) - ($nTok - 1) AS double) / $nTok", 6)}
         |   AS avg_token_len,
         | ${rs(s"cast($stop AS double) / $nTok", 6)} AS stopword_ratio,
         | cast(length(text) -
         |   length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS bigint)
         |   AS punct_count
         |FROM documents""".stripMargin
    },

    "q_lang_id" ->
      (s"SELECT doc_id, $langPredCaseSql AS lang_pred " +
        s"FROM (SELECT doc_id, $langScoreSql FROM documents)"),

    // confusion matrix: dataset label vs marker-argmax prediction
    "q_lang_eval" ->
      (s"SELECT lang, $langPredCaseSql AS lang_pred, " +
        "cast(count(*) AS bigint) AS n " +
        s"FROM (SELECT lang, $langScoreSql FROM documents) " +
        "GROUP BY 1, 2"),

    "q_fingerprint" ->
      ("SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) " +
        "AS fp FROM documents"),

    // deterministic split: same md5 first-byte bucketing
    "q_dataset_split" ->
      """SELECT CASE WHEN b < 230 THEN 'train'
        |            WHEN b < 243 THEN 'val' ELSE 'test' END AS split,
        |  source, cast(count(*) AS bigint) AS n_docs
        |FROM (SELECT source,
        |        cast(('0x' || substr(md5(cast(doc_id AS varchar)), 1, 2))
        |          AS int) AS b
        |      FROM documents)
        |GROUP BY 1, 2""".stripMargin,

    // list_reduce has no init accumulator — prepend the BIGINT zero
    "q_rolling_fp" ->
      ("SELECT doc_id, list_reduce(" +
        "list_prepend(cast(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(text)), " +
        "i -> cast(ascii(substr(text, cast(i AS int), 1)) AS BIGINT))), " +
        "(h, c) -> (h*31 + c) % 1000000007) AS rfp FROM documents"),

    "q_quality_filter" -> {
      val nTok = "len(string_split(text,' '))"
      val stop = "len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a','an','of','to','in','and','is','it','that')))"
      s"""SELECT doc_id FROM (
         | SELECT doc_id, cast($nTok AS int) AS n_tokens,
         |  ${rs(s"cast($stop AS double) / $nTok", 6)} AS stopword_ratio,
         |  length(text) -
         |    length(regexp_replace(text, '[.,;:!?]', '', 'g'))
         |    AS punct_count
         | FROM documents)
         |WHERE n_tokens >= 5 AND stopword_ratio <= 0.5
         | AND punct_count <= 50""".stripMargin
    },

    // chunking: DuckDB floor-division and Spark's div agree here since
    // greatest(...,0) clamps the only negative case (short docs)
    "q_doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |           FROM documents)
        |SELECT doc_id, cast(c AS int) AS chunk_idx,
        |  cast(len(list_slice(tk, c*12+1, c*12+16)) AS int) AS n_tokens,
        |  md5(array_to_string(list_slice(tk, c*12+1, c*12+16), ' '))
        |    AS chunk_md5
        |FROM (SELECT doc_id, tk,
        |        unnest(generate_series(0,
        |          greatest((len(tk) - 16 + 12 - 1)//12, 0))) AS c
        |      FROM t)""".stripMargin,

    // partitioned layout: values checked against the unpartitioned
    // source of truth (pruning itself is a plan property, audited)
    "q_partitioned_prune" ->
      """SELECT source, cast(count(*) AS bigint) AS n_docs,
        |  cast(sum(n_chars) AS bigint) AS chars_total
        |FROM documents WHERE lang = 'en' GROUP BY source""".stripMargin,

    // per-source quantiles: quantile_cont interpolates at rank p·(n−1),
    // the same definition as Spark's exact percentile
    "q_length_quantiles" ->
      s"""SELECT source, cast(count(*) AS bigint) AS n_docs,
         |  min(n_chars) AS min_chars,
         |  ${rs("quantile_cont(n_chars, 0.5)", 6)} AS median_chars,
         |  ${rs("quantile_cont(n_chars, 0.9)", 6)} AS p90_chars,
         |  max(n_chars) AS max_chars
         |FROM documents GROUP BY source""".stripMargin,

    // bottom-k-by-hash uniform sample (k smallest DISTINCT (h, v)
    // pairs per source), quantiles interpolated from the sorted sample
    // at rank p·(m−1) with the SAME forced-double arithmetic the Spark
    // side uses — vs[i] is 1-based like element_at
    "q_sample_quantiles" -> {
      def estSql(p: String): String = {
        val pos = s"cast($p AS double) * (m - 1)"
        s"cast(vs[cast(floor($pos) AS int) + 1] AS double)" +
          s" * (1.0 - ($pos - floor($pos))) + " +
          s"cast(vs[cast(ceil($pos) AS int) + 1] AS double)" +
          s" * ($pos - floor($pos))"
      }
      s"""WITH hv AS (SELECT source,
         |    cast(('0x' || substr(md5(cast(doc_id AS varchar)), 1, 12))
         |      AS bigint) AS h,
         |    cast(n_chars AS bigint) AS v
         |  FROM documents),
         |ranked AS (SELECT source, v, row_number() OVER
         |    (PARTITION BY source ORDER BY h, v) AS rn
         |  FROM (SELECT DISTINCT source, h, v FROM hv)),
         |sl AS (SELECT source, list_sort(list(v)) AS vs,
         |    cast(count(*) AS bigint) AS m
         |  FROM ranked WHERE rn <= 64 GROUP BY source),
         |ex AS (SELECT source, cast(count(*) AS bigint) AS n_docs,
         |    ${rs("quantile_cont(v, 0.5)", 6)} AS median_exact,
         |    ${rs("quantile_cont(v, 0.9)", 6)} AS p90_exact
         |  FROM hv GROUP BY source)
         |SELECT ex.source, ex.n_docs, sl.m,
         |  ${rs(estSql("0.5"), 6)} AS median_est,
         |  ${rs(estSql("0.9"), 6)} AS p90_est,
         |  ex.median_exact, ex.p90_exact
         |FROM ex JOIN sl ON ex.source = sl.source""".stripMargin
    },

    // curation funnel: every stage mirrored as a CTE; per-stage doc +
    // token counts UNION'd in stage order
    "q_curation_pipeline" -> {
      def row(stage: Int, name: String, cte: String) =
        s"SELECT cast($stage AS int) AS stage, '$name' AS stage_name, " +
          "cast(count(*) AS bigint) AS n_docs, " +
          "cast(coalesce(sum(len(string_split(t, ' '))), 0) AS bigint) " +
          s"AS n_tokens FROM $cte"
      """WITH t0 AS (SELECT doc_id,
        |    trim(regexp_replace(
        |      nfc_normalize(regexp_replace(text,
        |        '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g')),
        |      '[\x{00}-\x{20}\x{7F}]+', ' ', 'g')) AS t
        |  FROM documents WHERE doc_id % 20 <> 0),
        |q1 AS (SELECT doc_id, t FROM (
        |    SELECT doc_id, t,
        |      cast(len(string_split(t, ' ')) AS bigint) AS n,
        |      cast(length(t) - (len(string_split(t, ' ')) - 1) AS bigint)
        |        AS wc,
        |      cast(len(list_filter(string_split(t, ' '),
        |        x -> x IN ('the','a','an','of','to','in','and','is','it',
        |                   'that'))) AS bigint) AS sh,
        |      cast(len(list_distinct(string_split(t, ' '))) AS bigint)
        |        AS nd
        |    FROM t0)
        |  WHERE NOT (n < 20 OR n > 1000)
        |    AND NOT (wc < n*3 OR wc > n*10) AND sh >= 2 AND nd*10 >= n*3),
        |e2 AS (SELECT doc_id, t FROM (
        |    SELECT doc_id, t, min(doc_id) OVER (PARTITION BY md5(t)) AS kid
        |    FROM q1)
        |  WHERE doc_id = kid),
        |l AS (SELECT doc_id, i,
        |    array_to_string(list_slice(tk, i*4+1, i*4+4), ' ') AS line
        |  FROM (SELECT doc_id, string_split(t, ' ') AS tk,
        |          unnest(generate_series(0,
        |            (len(string_split(t, ' '))-1)//4)) AS i
        |        FROM e2)),
        |f AS (SELECT md5(line) AS k, count(DISTINCT doc_id) AS df
        |      FROM l GROUP BY 1),
        |t3 AS (SELECT l.doc_id, string_agg(l.line, ' ' ORDER BY l.i) AS t
        |       FROM l JOIN f ON md5(l.line) = f.k
        |       WHERE f.df <= 2 GROUP BY l.doc_id),
        |sp AS (SELECT doc_id, unnest(list_transform(
        |    generate_series(0, greatest(len(string_split(t, ' '))-5, 0)),
        |    i -> md5(array_to_string(
        |      list_slice(string_split(t, ' '), i+1, i+5), ' ')))) AS g
        |  FROM t3),
        |bg AS (SELECT DISTINCT g FROM (
        |  SELECT unnest(list_transform(
        |    generate_series(0, greatest(len(string_split(text, ' '))-5, 0)),
        |    i -> md5(array_to_string(
        |      list_slice(string_split(text, ' '), i+1, i+5), ' ')))) AS g
        |  FROM documents WHERE doc_id % 20 = 0)),
        |bad AS (SELECT DISTINCT sp.doc_id FROM sp JOIN bg USING (g)),
        |t4 AS (SELECT doc_id, t FROM t3
        |       WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
        |t5 AS (SELECT doc_id, t FROM t4
        |  WHERE cast(('0x' || substr(md5(cast(doc_id AS varchar)), 1, 2))
        |    AS int) < 204)
        |""".stripMargin +
        Seq((0, "input", "t0"), (1, "quality", "q1"),
          (2, "exact_dedup", "e2"), (3, "line_dedup", "t3"),
          (4, "decontam", "t4"), (5, "sample", "t5"))
          .map { case (i, n, c) => row(i, n, c) }
          .mkString("", "\nUNION ALL ", "")
    },

    // Gopher gate: the same integer-exact rule battery; stopword hits
    // count duplicates exactly like the token-set kernel
    "q_gopher_filter" ->
      """WITH m AS (SELECT doc_id,
        |  cast(len(string_split(text, ' ')) AS bigint) AS n_tokens,
        |  cast(length(text) - (len(string_split(text, ' ')) - 1) AS bigint)
        |    AS word_chars,
        |  cast(len(list_filter(string_split(text, ' '),
        |    t -> t IN ('the','a','an','of','to','in','and','is','it',
        |               'that'))) AS bigint) AS stop_hits,
        |  cast(len(list_distinct(string_split(text, ' '))) AS bigint)
        |    AS n_distinct
        |  FROM documents)
        |SELECT doc_id, n_tokens, stop_hits, n_distinct,
        |  cast(CASE WHEN n_tokens < 20 OR n_tokens > 1000 THEN 1 ELSE 0 END
        |   + CASE WHEN word_chars < n_tokens*3 OR word_chars > n_tokens*10
        |          THEN 2 ELSE 0 END
        |   + CASE WHEN stop_hits < 2 THEN 4 ELSE 0 END
        |   + CASE WHEN n_distinct*10 < n_tokens*3 THEN 8 ELSE 0 END
        |    AS bigint) AS fail_bits,
        |  (CASE WHEN n_tokens < 20 OR n_tokens > 1000 THEN 1 ELSE 0 END
        |   + CASE WHEN word_chars < n_tokens*3 OR word_chars > n_tokens*10
        |          THEN 2 ELSE 0 END
        |   + CASE WHEN stop_hits < 2 THEN 4 ELSE 0 END
        |   + CASE WHEN n_distinct*10 < n_tokens*3 THEN 8 ELSE 0 END) = 0
        |    AS keep
        |FROM m""".stripMargin,

    "q_token_count" ->
      ("SELECT doc_id, cast(len(string_split(text, ' ')) AS int) AS n_ws, " +
        "cast(len(regexp_extract_all(text, " +
        "'[a-zA-Z0-9]+|[^a-zA-Z0-9]+')) AS int) AS n_bpe FROM documents"),

    "q_token_hist" ->
      ("SELECT token, count(*) AS n FROM (SELECT unnest(string_split(text, " +
        "' ')) AS token FROM documents) GROUP BY 1 " +
        "ORDER BY n DESC, token LIMIT 20"),

    "q_dedup_exact" ->
      (s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + ${1L << 40}, text FROM documents
         |  WHERE doc_id % 100 = 0)
         |SELECT doc_id AS dup_id, kept_id FROM (SELECT doc_id,
         |  min(doc_id) OVER (PARTITION BY md5(text)) AS kept_id
         |  FROM corpus) WHERE doc_id <> kept_id""").stripMargin,

    "q_minhash" -> {
      val hs = (0 until MinhashN)
        .map(i => s"${mhSql(i)} AS h${i + 1}").mkString(", ")
      s"SELECT doc_id, $hs FROM (SELECT doc_id, $shSql AS sh FROM documents)"
    },

    "q_lsh_bands" ->
      (bandsCte + "\nSELECT doc_id, cast(band_idx AS int) AS band_idx, " +
        "band_key FROM bands"),

    "q_lsh_pairs" ->
      (bandsCte + """
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM bands a JOIN bands b
        |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        |  AND a.doc_id < b.doc_id
        |GROUP BY 1, 2""".stripMargin),

    "q_simhash" -> {
      val votes = (0 until 16).map { b =>
        "list_sum(list_transform(list_distinct(string_split(text,' ')), " +
          s"t -> CASE WHEN strpos('89abcdef', substr(md5(t), ${b + 1}, 1)) " +
          s"> 0 THEN 1 ELSE -1 END)) AS v$b"
      }.mkString(", ")
      val fp = (0 until 16)
        .map(b => s"CASE WHEN v$b > 0 THEN ${1 << b} ELSE 0 END")
        .mkString(" + ")
      s"SELECT doc_id, cast($fp AS int) AS fp " +
        s"FROM (SELECT doc_id, $votes FROM documents)"
    },

    "q_corpus_sample" ->
      ("SELECT doc_id FROM documents WHERE " +
        "cast(('0x' || substr(md5(cast(doc_id AS varchar)), 1, 2)) " +
        "AS int) < 26"),

    "q_stratified_sample" ->
      ("SELECT doc_id, source, lang FROM documents WHERE " +
        "cast(('0x' || substr(md5(cast(doc_id AS varchar)), 1, 2)) " +
        "AS int) < CASE WHEN source = 'src0' THEN 128 " +
        "WHEN source = 'src1' THEN 64 WHEN source = 'src2' THEN 13 " +
        "ELSE 26 END"),

    "q_data_mix" ->
      ("SELECT doc_id, source, unnest(generate_series(1, " +
        "CASE WHEN source = 'src0' THEN 3 WHEN source = 'src1' THEN 2 " +
        "WHEN source = 'src2' THEN 0 ELSE 1 END)) AS copy FROM documents"),

    "q_temperature_mix" ->
      ("""WITH cnt AS (SELECT source, cast(count(*) AS bigint) AS n
         |            FROM documents GROUP BY 1),
         |w AS (SELECT source, n,
         |        cast(floor(sqrt(cast(n AS double))*1000000 + 0.5)
         |          AS bigint) AS w
         |      FROM cnt),
         |t AS (SELECT source, n, w,
         |        cast(sum(w) OVER () AS bigint) AS w_all,
         |        cast(sum(n) OVER () AS bigint) // 2 AS t_total
         |      FROM w),
         |a AS (SELECT source, n, w, w_all, t_total,
         |        (t_total * w) // w_all AS base,
         |        t_total*w - ((t_total * w) // w_all)*w_all AS rem
         |      FROM t),
         |l AS (SELECT *,
         |        t_total - cast(sum(base) OVER () AS bigint) AS leftover,
         |        row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
         |      FROM a),
         |alloc AS (SELECT source, n,
         |            base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
         |              AS alloc
         |          FROM l),
         |p AS (SELECT doc_id, source,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY md5(cast(doc_id AS varchar)), doc_id) AS prk
         |      FROM documents),
         |j AS (SELECT p.source, p.doc_id, p.prk, alloc.n,
         |        alloc.alloc // alloc.n
         |          + CASE WHEN p.prk <= alloc.alloc % alloc.n
         |                 THEN 1 ELSE 0 END AS copies
         |      FROM p JOIN alloc USING (source)),
         |e AS (SELECT source, doc_id, prk, n,
         |        unnest(generate_series(1, copies)) AS copy
         |      FROM j)
         |SELECT source, doc_id,
         |       cast((copy - 1) * n + prk AS bigint) AS pick_rank
         |FROM e""")
        .stripMargin,

    "q_seq_packing" ->
      """WITH t AS (SELECT doc_id, source,
        |    cast(len(string_split(text, ' ')) AS bigint) AS n_toks
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_toks,
        |    cast(coalesce(sum(n_toks) OVER (PARTITION BY source
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS bigint) AS cum_before
        |  FROM t)
        |SELECT source, cum_before // 2048 AS bin, count(*) AS n_docs,
        |  cast(sum(n_toks) AS bigint) AS bin_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2""".stripMargin,

    "q_minhash_estimate" -> {
      val sigs = (0 until 8).map(i => mhSql(i))
      val eq = sigs.zip(sigs).zipWithIndex.map { case (_, i) =>
        s"CASE WHEN a.s${i + 1} = b.s${i + 1} THEN 1.0 ELSE 0.0 END"
      }.mkString(" + ")
      val sel = sigs.zipWithIndex
        .map { case (h, i) => s"$h AS s${i + 1}" }.mkString(", ")
      s"""WITH sig AS (
         |  SELECT doc_id, $sel
         |  FROM (SELECT doc_id, $shSql AS sh FROM documents))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  ${rs(s"($eq) / 8", 6)} AS jaccard_est
         |FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1""".stripMargin
    },

    // recursive reachability over the same chain edges; min reachable
    // id per node = component head, however computed
    "q_dedup_clusters" ->
      ("""WITH pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM documents a JOIN documents b
         |    ON b.doc_id = a.doc_id + 1 AND a.doc_id % 50 < 5),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach AS (
         |  WITH RECURSIVE r(src, dst) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src)
         |  SELECT * FROM r)
         |SELECT src AS doc_id, min(dst) AS cluster_id
         |FROM reach GROUP BY 1""").stripMargin,

    // same reachability clusters, then the survivorship aggregate: the
    // rn=1 row under (n_chars DESC, doc_id ASC) is Spark's
    // max(struct(n_chars, -doc_id))
    "q_dup_survivors" ->
      ("""WITH pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM documents a JOIN documents b
         |    ON b.doc_id = a.doc_id + 1 AND a.doc_id % 50 < 5),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach AS (
         |  WITH RECURSIVE r(src, dst) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src)
         |  SELECT * FROM r),
         |cl AS (SELECT src AS doc_id, min(dst) AS cluster_id
         |       FROM reach GROUP BY 1),
         |j AS (SELECT cl.doc_id, cl.cluster_id, d.n_chars
         |      FROM cl JOIN documents d USING (doc_id)),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
         |         ORDER BY n_chars DESC, doc_id ASC) AS rn FROM j)
         |SELECT cluster_id,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
         |  max(CASE WHEN rn = 1 THEN n_chars END) AS survivor_chars,
         |  count(*) AS n_docs, count(*) - 1 AS n_removed,
         |  cast(sum(n_chars) AS bigint)
         |    - max(CASE WHEN rn = 1 THEN n_chars END) AS chars_removed
         |FROM rk GROUP BY 1""").stripMargin,

    // winnowing: identical key encoding (digest || zero-padded 10^8-pos)
    // and the same truncated-frame filter
    "q_winnowing" ->
      ("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents),
         |n AS (SELECT doc_id, toks,
         |        greatest(len(toks) - 4 + 1, 1) AS ng FROM t),
         |g AS (SELECT doc_id, ng, toks,
         |        unnest(generate_series(1, ng)) AS pos FROM n),
         |k AS (SELECT doc_id, ng, pos,
         |        md5(array_to_string(list_slice(toks, pos, pos + 3), ' '))
         |          || lpad(cast(100000000 - pos AS varchar), 9, '0') AS key
         |      FROM g),
         |s AS (SELECT doc_id, ng, pos,
         |        min(key) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS sel
         |      FROM k)
         |SELECT DISTINCT doc_id,
         |  cast(100000000 - cast(substr(sel, 33, 9) AS bigint) AS int)
         |    AS fp_pos,
         |  substr(sel, 1, 32) AS fp
         |FROM s WHERE pos <= greatest(ng - 5 + 1, 1)""").stripMargin,

    "q_simhash_pairs" -> {
      val votes = (0 until 64).map { b =>
        val dig = if (b < 32) "md5(t)" else "md5('1' || t)"
        "list_sum(list_transform(list_distinct(string_split(text,' ')), " +
          s"t -> CASE WHEN strpos('89abcdef', substr($dig, ${b % 32 + 1}, " +
          s"1)) > 0 THEN 1 ELSE -1 END)) AS v$b"
      }.mkString(", ")
      val fold = (0 until 64).map { b =>
        val bit = if (b == 63) "(-9223372036854775807 - 1)"
                  else s"(1::BIGINT << $b)"
        s"(CASE WHEN v$b > 0 THEN $bit ELSE 0::BIGINT END)"
      }.mkString(" | ")
      s"""WITH v AS (SELECT doc_id, $votes FROM documents),
         |fp AS (SELECT doc_id, ($fold) AS fp FROM v),
         |bands AS (SELECT doc_id, fp, b AS band_idx,
         |    (fp >> (${64 / SimhashBands} * b)) &
         |      ${Dedup.simhashBandMask(SimhashBands)} AS bv
         |  FROM fp, (SELECT unnest(generate_series(0,
         |    ${SimhashBands - 1})) AS b)),
         |p AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.fp AS fa, b.fp AS fb
         |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx
         |    AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b,
         |  cast(bit_count(xor(fa, fb)) AS int) AS hamming,
         |  bit_count(xor(fa, fb)) <= 3 AS is_near
         |FROM p""".stripMargin
    },

    // the full funnel: LSH candidates (bandsCte) → exact-Jaccard
    // verification (2·|∩| >= |∪|, integer) → recursive-CTE components →
    // min-id survivors; one count per stage
    "q_fuzzy_dedup" ->
      (bandsCte + s""",
         |cand AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sh2 AS (SELECT doc_id, $shSql AS sh FROM documents),
         |ver AS (
         |  SELECT id_a, id_b
         |  FROM cand
         |    JOIN sh2 sa ON sa.doc_id = id_a
         |    JOIN sh2 sb ON sb.doc_id = id_b
         |  WHERE 2 * len(list_intersect(sa.sh, sb.sh))
         |    >= len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))),
         |fedges AS (
         |  SELECT id_a AS src, id_b AS dst FROM ver
         |  UNION ALL SELECT id_b, id_a FROM ver),
         |fnodes AS (SELECT DISTINCT src AS id FROM fedges),
         |freach AS (
         |  WITH RECURSIVE r(src, dst) AS (
         |    SELECT id, id FROM fnodes
         |    UNION
         |    SELECT r.src, e.dst FROM r JOIN fedges e ON r.dst = e.src)
         |  SELECT * FROM r),
         |fcl AS (SELECT src AS doc_id, min(dst) AS cluster_id
         |        FROM freach GROUP BY 1),
         |removed AS (SELECT doc_id FROM fcl WHERE doc_id <> cluster_id),
         |kept AS (
         |  SELECT d.doc_id FROM documents d
         |  LEFT JOIN removed r ON d.doc_id = r.doc_id
         |  WHERE r.doc_id IS NULL)
         |SELECT cast(stage AS int) AS stage, stage_name, n FROM (
         |  SELECT 0 AS stage, 'input' AS stage_name,
         |    (SELECT count(*) FROM documents) AS n
         |  UNION ALL SELECT 1, 'candidates', (SELECT count(*) FROM cand)
         |  UNION ALL SELECT 2, 'verified_edges', (SELECT count(*) FROM ver)
         |  UNION ALL SELECT 3, 'clusters',
         |    (SELECT count(DISTINCT cluster_id) FROM fcl)
         |  UNION ALL SELECT 4, 'kept_docs', (SELECT count(*) FROM kept))
         |""".stripMargin),

    // same md5-bucket split thresholds as q_dataset_split; span digests
    // exactly like q_contamination's shingle construction
    "q_ngram_novelty" ->
      ("""WITH spl AS (
         |  SELECT doc_id, CASE WHEN b < 230 THEN 'train'
         |    WHEN b < 243 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    cast(('0x' || substr(md5(cast(doc_id AS varchar)), 1, 2))
         |      AS int) AS b FROM documents)),
         |t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |      FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest(list_transform(
         |      generate_series(0, greatest(len(toks) - 5, 0)),
         |      i -> md5(array_to_string(list_slice(toks, i+1, i+5), ' '))))
         |      AS g
         |  FROM t),
         |flags AS (
         |  SELECT g.g,
         |    max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS tr,
         |    max(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS va,
         |    max(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS te
         |  FROM g JOIN spl USING (doc_id) GROUP BY 1),
         |a AS (SELECT cast(sum(va) AS bigint) AS sp_val,
         |    cast(sum(va * tr) AS bigint) AS seen_val,
         |    cast(sum(te) AS bigint) AS sp_test,
         |    cast(sum(te * tr) AS bigint) AS seen_test FROM flags)
         |SELECT 'val' AS split, sp_val AS n_spans, seen_val AS n_seen,
         |  floor(cast(sp_val - seen_val AS double) / sp_val * 1000000
         |    + 0.5) / 1000000 AS novelty FROM a
         |UNION ALL
         |SELECT 'test', sp_test, seen_test,
         |  floor(cast(sp_test - seen_test AS double) / sp_test * 1000000
         |    + 0.5) / 1000000 FROM a""").stripMargin,

    "q_blocklist_filter" -> {
      val in = BlockWords.map(w => s"'$w'").mkString(", ")
      s"""SELECT doc_id,
         |  cast(len(list_filter(string_split(text, ' '),
         |    t -> t IN ($in))) AS bigint) AS n_hits,
         |  len(list_filter(string_split(text, ' '),
         |    t -> t IN ($in))) > 0 AS flagged
         |FROM documents""".stripMargin
    },

    "q_token_budget" ->
      ("""WITH tot AS (
         |  SELECT source,
         |    cast(sum(len(string_split(text, ' '))) AS bigint) AS n_tokens
         |  FROM documents GROUP BY 1),
         |w AS (SELECT source, n_tokens,
         |    cast(sum(n_tokens) OVER () AS bigint) AS t_all FROM tot),
         |b AS (SELECT source, n_tokens,
         |    (100000 * n_tokens) // t_all AS base,
         |    100000 * n_tokens - ((100000 * n_tokens) // t_all) * t_all
         |      AS rem FROM w),
         |l AS (SELECT *, 100000 - cast(sum(base) OVER () AS bigint)
         |    AS leftover,
         |    row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
         |  FROM b)
         |SELECT source, n_tokens, cast(base AS bigint) AS base,
         |  CASE WHEN rk <= leftover THEN 1 ELSE 0 END::bigint AS extra,
         |  cast(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
         |    AS bigint) AS alloc
         |FROM l""").stripMargin,

    "q_zipf_slope" ->
      ("""WITH tf AS (
         |  SELECT t, count(*) AS c FROM (
         |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
         |  GROUP BY 1),
         |rk AS (SELECT c,
         |    row_number() OVER (ORDER BY c DESC, t ASC) AS rank FROM tf),
         |pts AS (SELECT
         |    cast(floor(ln(cast(rank AS double)) * 1000000 + 0.5)
         |      AS bigint) AS x,
         |    cast(floor(ln(cast(c AS double)) * 1000000 + 0.5)
         |      AS bigint) AS y
         |  FROM rk WHERE rank <= 1000),
         |a AS (SELECT count(*) AS n, cast(sum(x) AS bigint) AS sx,
         |    cast(sum(y) AS bigint) AS sy,
         |    cast(sum(x * x) AS bigint) AS sxx,
         |    cast(sum(x * y) AS bigint) AS sxy FROM pts)
         |SELECT n AS n_terms,
         |  floor((cast(n AS double) * cast(sxy AS double)
         |      - cast(sx AS double) * cast(sy AS double))
         |    / (cast(n AS double) * cast(sxx AS double)
         |      - cast(sx AS double) * cast(sx AS double))
         |    * 1000000 + 0.5) / 1000000 AS slope
         |FROM a""").stripMargin,

    // Decile = least(9, (id*10) div n) on BIGINTs both sides; x/y are
    // the zipf-recipe ln micro-integerizations; the fit is the same
    // least-squares expression tree as q_zipf_slope's.
    "q_heaps_law" -> {
      val fitExpr =
        """(cast(np AS double) * cast(sxy AS double)
          |      - cast(sx AS double) * cast(sy AS double))
          |    / (cast(np AS double) * cast(sxx AS double)
          |      - cast(sx AS double) * cast(sx AS double))""".stripMargin
      s"""WITH nd AS (SELECT cast(count(*) AS bigint) AS nd
         |  FROM documents),
         |toks AS (SELECT
         |    cast(least(9, (doc_id * 10) // nd.nd) AS bigint) AS decile,
         |    cast(sum(len(string_split(text, ' '))) AS bigint) AS tk
         |  FROM documents, nd GROUP BY 1),
         |fo AS (SELECT w, min(doc_id) AS fd
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM documents) GROUP BY 1),
         |vocab AS (SELECT
         |    cast(least(9, (fd * 10) // nd.nd) AS bigint) AS decile,
         |    cast(count(*) AS bigint) AS nv
         |  FROM fo, nd GROUP BY 1),
         |curve AS (SELECT t.decile,
         |    cast(sum(t.tk) OVER (ORDER BY t.decile) AS bigint)
         |      AS cum_tokens,
         |    cast(sum(coalesce(v.nv, 0)) OVER (ORDER BY t.decile)
         |      AS bigint) AS cum_vocab
         |  FROM toks t LEFT JOIN vocab v USING (decile)),
         |pts AS (SELECT
         |    cast(floor(ln(cast(cum_tokens AS double)) * 1000000 + 0.5)
         |      AS bigint) AS x,
         |    cast(floor(ln(cast(cum_vocab AS double)) * 1000000 + 0.5)
         |      AS bigint) AS y
         |  FROM curve),
         |fit AS (SELECT cast(count(*) AS bigint) AS np,
         |    cast(sum(x) AS bigint) AS sx, cast(sum(y) AS bigint) AS sy,
         |    cast(sum(x * x) AS bigint) AS sxx,
         |    cast(sum(x * y) AS bigint) AS sxy FROM pts)
         |SELECT decile, cum_tokens, cum_vocab,
         |  ${rs(fitExpr, 6)} AS beta
         |FROM curve CROSS JOIN fit""".stripMargin
    },

    "q_mattr" ->
      ("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
         |           FROM documents),
         |n AS (SELECT doc_id, tk,
         |    CASE WHEN len(tk) >= 20 THEN (len(tk) - 20) // 10 + 1
         |         ELSE 1 END AS nw FROM t),
         |w AS (SELECT doc_id,
         |    list_slice(tk, i * 10 + 1, i * 10 + 20) AS win
         |  FROM n, lateral unnest(generate_series(0, nw - 1)) AS u(i)),
         |m AS (SELECT doc_id,
         |    (len(list_distinct(win)) * 1000000) // len(win) AS ttr_micro
         |  FROM w)
         |SELECT doc_id, count(*) AS n_windows,
         |  floor(cast(sum(ttr_micro) AS double) / count(*) / 1000000
         |    * 1000000 + 0.5) / 1000000 AS mattr
         |FROM m GROUP BY 1""").stripMargin,

    // PCA power iteration: covariance sums rebuilt relationally (the
    // identical per-row floor micro products), 8 unrolled CTE
    // iterations in BIGINT with the same single-double rescale step,
    // same sign rule, same in-order projection fold. Every chained CTE
    // is MATERIALIZED: inlined, each v_k re-evaluates w_k twice (via
    // m_k) and w_k re-evaluates c, so the 8-deep chain explodes to
    // ~2^8 covariance rebuilds (measured 95 s at sf0.01 vs 0.24 s
    // hinted — results bit-identical).
    "q_pca_project" -> {
      val iters = (1 to 8).map { k =>
        val pv = if (k == 1) "v0" else s"v${k - 1}"
        s"""w$k AS MATERIALIZED (SELECT c.i AS i, cast(sum(c.c * $pv.v) AS bigint) AS w
           |  FROM c JOIN $pv ON c.j = $pv.i GROUP BY 1),
           |m$k AS MATERIALIZED (SELECT max(abs(w)) AS mx FROM w$k),
           |v$k AS MATERIALIZED (SELECT i, cast(floor(cast(w AS double)
           |    / cast(mx AS double) * 1000000.0 + 0.5) AS bigint) AS v
           |  FROM w$k, m$k)""".stripMargin
      }.mkString(",\n")
      "WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v\n" +
        "           FROM embeddings),\n" +
        "n AS (SELECT cast(count(*) AS bigint) AS n FROM e),\n" +
        "idx AS (SELECT unnest(generate_series(0, 63)) AS i),\n" +
        "cells AS MATERIALIZED (SELECT ii.i AS i, jj.i AS j,\n" +
        "    cast(sum(cast(floor(e.v[ii.i + 1] * e.v[jj.i + 1]\n" +
        "      * 1000000.0 + 0.5) AS bigint)) AS bigint) AS s\n" +
        "  FROM e, idx ii, idx jj GROUP BY 1, 2),\n" +
        "c AS MATERIALIZED (SELECT i, j,\n" +
        "    cast(floor(cast(s AS double) / cast(n.n AS double) + 0.5)\n" +
        "      AS bigint) AS c\n" +
        "  FROM cells, n),\n" +
        "v0 AS (SELECT i, cast(1000000 AS bigint) AS v FROM idx),\n" +
        iters + ",\n" +
        "sg AS (SELECT CASE WHEN (SELECT v FROM v8 WHERE v <> 0\n" +
        "    ORDER BY i LIMIT 1) < 0 THEN -1 ELSE 1 END AS s),\n" +
        "vf AS (SELECT list(v * sg.s ORDER BY i) AS vl FROM v8, sg)\n" +
        "SELECT vec_id,\n" +
        s"  ${rs("list_reduce(list_transform(generate_series(1, 64), " +
          "k -> e.v[k] * cast(vf.vl[k] AS double)), " +
          "(a, b) -> a + b) / 1000000.0", 4)} AS proj\n" +
        "FROM e, vf"
    },

    "q_pq_ann" -> {
      val m = 4; val sub = 16; val ks = 8
      val books = (0 until m).map(j =>
        graft.sim.Similarity.ivfCentroids(sub, ks, seed = 100 + j))
      def sl(vec: String, j: Int) =
        s"list_slice($vec, ${j * sub + 1}, ${(j + 1) * sub})"
      // per-subspace score lists (dot − ‖c‖²/2) for code assignment
      val dsDefs = (0 until m).map { j =>
        books(j).map(c =>
          s"list_dot_product(${sl("v", j)}, " +
            s"${c.mkString("[", ", ", "]")}) - ${c.map(x => x * x).sum / 2}")
          .mkString("[", ", ", "]") + s" AS ds$j"
      }.mkString(", ")
      val codes = (0 until m)
        .map(j => s"list_position(ds$j, list_max(ds$j)) - 1 AS c$j")
        .mkString(", ")
      // ADC tables 2·q_j·c − ‖c‖² rebuilt from the in-data query vector
      val adc = (0 until m).map { j =>
        val t = books(j).map(c =>
          s"2 * list_dot_product(${sl("qv", j)}, " +
            s"${c.mkString("[", ", ", "]")}) - ${c.map(x => x * x).sum}")
          .mkString("[", ", ", "]")
        s"$t[c$j + 1]"
      }.mkString(" + ")
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id = 0),
         |x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |      FROM embeddings WHERE vec_id <> 0),
         |ds AS (SELECT vec_id, $dsDefs FROM x),
         |coded AS (SELECT vec_id, $codes FROM ds)
         |SELECT vec_id, c0, c1, c2, c3, ${rs(adc, 4)} AS adc_score
         |FROM coded, q
         |ORDER BY adc_score DESC, vec_id LIMIT 10""".stripMargin
    },

    "q_embed_quantize" ->
      ("""WITH x AS (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> cast(floor(x * 1000000 + 0.5) AS bigint)) AS xm
         |  FROM embeddings),
         |v AS (SELECT vec_id, xm,
         |    list_max(list_transform(xm, x -> abs(x))) AS vmax FROM x),
         |qq AS (SELECT vec_id, xm, vmax,
         |    list_transform(xm, x -> cast(floor(cast(x AS double) * 127.0
         |      / vmax + 0.5) AS bigint)) AS q
         |  FROM v WHERE vmax > 0),
         |e AS (SELECT vec_id, vmax,
         |    list_transform(generate_series(1, len(xm)),
         |      i -> 127 * xm[i] - q[i] * vmax) AS errn FROM qq)
         |SELECT vec_id, vmax AS vmax_micro,
         |  """ + rs("sqrt(cast(list_sum(list_transform(errn, x -> x * x))" +
          " AS double) / len(errn)) / 127.0 / 1000000", 6) +
        """ AS rmse,
         |  """ + rs("cast(list_max(list_transform(errn, x -> abs(x)))" +
          " AS double) / 127.0 / 1000000", 6) +
        """ AS max_abs_err
         |FROM e""").stripMargin,

    "q_zorder" -> {
      val terms = (0 until 16).flatMap(i => Seq(
        s"(((x >> $i) & 1) << ${2 * i})",
        s"(((y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
      s"""WITH b AS (SELECT user_id % 65536 AS x,
         |    cast(abs(floor(value * 1000)) AS bigint) % 65536 AS y
         |  FROM events),
         |z AS (SELECT x, y, ($terms) AS zk FROM b)
         |SELECT zk >> 22 AS zfile, count(*) AS n_rows,
         |  max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
         |FROM z GROUP BY 1""".stripMargin
    },

    "q_zonemap_prune" -> {
      def zone(src: String, name: String) =
        s"""SELECT '$name' AS layout, count(*) AS n_files,
           |  cast(sum(CASE WHEN d_max < TIMESTAMP '1996-01-01'
           |      OR d_min > TIMESTAMP '1996-03-31' THEN 1 ELSE 0 END)
           |    AS bigint) AS n_pruned,
           |  cast(sum(CASE WHEN NOT (d_max < TIMESTAMP '1996-01-01'
           |      OR d_min > TIMESTAMP '1996-03-31') THEN f_rows
           |      ELSE 0 END) AS bigint) AS rows_scanned
           |FROM $src""".stripMargin
      s"""WITH a AS (SELECT l_orderkey // 4096 AS file, l_shipdate
         |           FROM lineitem),
         |az AS (SELECT file, count(*) AS f_rows, min(l_shipdate) AS d_min,
         |       max(l_shipdate) AS d_max FROM a GROUP BY 1),
         |br AS (SELECT l_shipdate, row_number() OVER (ORDER BY l_shipdate,
         |         l_orderkey, l_linenumber) AS rn FROM lineitem),
         |b AS (SELECT cast(rn - 1 AS bigint) // 4096 AS file, l_shipdate
         |      FROM br),
         |bz AS (SELECT file, count(*) AS f_rows, min(l_shipdate) AS d_min,
         |       max(l_shipdate) AS d_max FROM b GROUP BY 1)
         |${zone("az", "by_orderkey")}
         |UNION ALL
         |${zone("bz", "shipdate_sorted")}""".stripMargin
    },

    "q_mad_outliers" ->
      ("""WITH base AS (
         |  SELECT event_type,
         |    cast(floor(value * 1000000 + 0.5) * 2 AS bigint) AS v2
         |  FROM events),
         |med AS (SELECT event_type, quantile_cont(v2, 0.5) AS med2,
         |    count(*) AS n_events FROM base GROUP BY 1),
         |dev AS (SELECT base.event_type, n_events, med2,
         |    abs(cast(v2 AS double) - med2) AS dev2
         |  FROM base JOIN med USING (event_type)),
         |mad AS (SELECT event_type, quantile_cont(dev2, 0.5) AS mad2
         |  FROM dev GROUP BY 1)
         |SELECT dev.event_type,
         |  max(n_events) AS n_events,
         |  floor(max(med2) / 2000000 * 1000000 + 0.5) / 1000000
         |    AS median_value,
         |  floor(max(mad2) / 2000000 * 1000000 + 0.5) / 1000000
         |    AS mad_value,
         |  cast(sum(CASE WHEN dev2 > 3.0 * mad2 THEN 1 ELSE 0 END)
         |    AS bigint) AS n_outliers
         |FROM dev JOIN mad USING (event_type) GROUP BY 1""").stripMargin,

    // 5-token spans, partial tail shingle included exactly like
    // explodedShingles (i up to max(len-5, 0), slice end-capped)
    "q_contamination" ->
      ("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest(list_transform(
         |      generate_series(0, greatest(len(toks) - 5, 0)),
         |      i -> md5(array_to_string(list_slice(toks, i+1, i+5), ' '))))
         |      AS g
         |  FROM t)
         |SELECT a.doc_id, b.doc_id AS bench_id
         |FROM g a JOIN g b ON a.g = b.g
         |WHERE a.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
         |GROUP BY 1, 2""").stripMargin,

    // graded decontamination: distinct 5-gram digests per training doc
    // probed against the benchmark digest set; ≥10% flag integer-exact
    "q_contaminate_ratio" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(
         |      generate_series(0, greatest(len(toks) - 5, 0)),
         |      i -> md5(array_to_string(list_slice(toks, i+1, i+5), ' '))))
         |      AS g
         |  FROM t),
         |b AS (SELECT DISTINCT g FROM g WHERE doc_id % 20 = 0)
         |SELECT c.doc_id, count(*) AS n_shingles,
         |  cast(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
         |    AS n_overlap,
         |  ${rs("cast(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) " +
              "AS double)/count(*)", 6)} AS overlap_ratio,
         |  (sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)*10 >= count(*))
         |    AS contaminated
         |FROM g c LEFT JOIN b ON c.g = b.g
         |WHERE c.doc_id % 20 <> 0
         |GROUP BY c.doc_id""".stripMargin,

    // SoftDeDup weights: same distinct 5-gram digest index; occ = docs
    // per span; weight_micro = floor(n·10⁶/Σocc + 0.5) from two longs
    "q_softdedup_weights" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(
         |      generate_series(0, greatest(len(toks) - 5, 0)),
         |      i -> md5(array_to_string(list_slice(toks, i+1, i+5), ' '))))
         |      AS g
         |  FROM t),
         |occ AS (SELECT g, cast(count(*) AS bigint) AS occ
         |        FROM g GROUP BY 1)
         |SELECT doc_id, cast(count(*) AS bigint) AS n_spans,
         |  cast(sum(occ) AS bigint) AS sum_occ,
         |  cast(floor(cast(count(*) AS double) * 1000000.0
         |    / cast(sum(occ) AS double) + 0.5) AS bigint) AS weight_micro
         |FROM g JOIN occ USING (g)
         |GROUP BY doc_id""".stripMargin,

    // Bloom decontamination: the Bloom filter is an exact-preserving
    // optimization, so the oracle is the plain span anti-join
    "q_bloom_decontam" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(
        |      generate_series(0, greatest(len(toks) - 5, 0)),
        |      i -> md5(array_to_string(list_slice(toks, i+1, i+5), ' '))))
        |      AS g
        |  FROM t),
        |bad AS (SELECT DISTINCT a.doc_id
        |        FROM g a JOIN g b ON a.g = b.g
        |        WHERE a.doc_id % 20 <> 0 AND b.doc_id % 20 = 0)
        |SELECT d.doc_id FROM documents d
        |WHERE d.doc_id % 20 <> 0
        |  AND d.doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin,

    // normalization round-trip: same deterministic dirtying (doc_id mod
    // 3), nfc_normalize + RE2 rewrites mirror the Spark pipeline. RE2
    // hex classes are written \x{...} here vs Java's \xNN — same sets.
    "q_text_normalize" ->
      """WITH dirty AS (SELECT doc_id, text,
        |  CASE WHEN doc_id % 3 = 0 THEN '  ' || replace(text, ' ', '  ')
        |       WHEN doc_id % 3 = 1
        |         THEN replace(text, ' ', chr(9) || ' ') || chr(9)
        |       ELSE chr(1) || text || ' e' || chr(769) || chr(8203) END
        |    AS dirty
        |  FROM documents),
        |n AS (SELECT doc_id, text, dirty,
        |  trim(regexp_replace(
        |    nfc_normalize(regexp_replace(dirty,
        |      '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g')),
        |    '[\x{00}-\x{20}\x{7F}]+', ' ', 'g')) AS norm_text
        |  FROM dirty)
        |SELECT doc_id, length(dirty) AS n_dirty_chars, norm_text,
        |  (norm_text = CASE WHEN doc_id % 3 = 2
        |     THEN text || ' ' || chr(233) ELSE text END) AS restored
        |FROM n""".stripMargin,

    "q_pii_scrub" -> {
      // DuckDB '...' literals pass backslashes through verbatim, so the
      // Java pattern strings are valid RE2 as-is
      val scrub = "regexp_replace(regexp_replace(text, " +
        s"'${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'), " +
        s"'${TextAnalysis.DigitRunPattern}', '<NUMBER>', 'g')"
      s"""SELECT doc_id, md5($scrub) AS scrubbed_md5,
         | ($scrub <> text) AS was_scrubbed
         |FROM documents""".stripMargin
    },

    "q_jaccard_pairs" -> {
      val inter = "len(list_filter(a.sh, x -> list_contains(b.sh, x)))"
      s"""WITH s AS (SELECT doc_id, $shSql AS sh FROM documents)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         | ${rs(s"cast($inter AS double) / (len(a.sh) + len(b.sh) - $inter)", 6)}
         |   AS jaccard
         |FROM s a JOIN s b ON b.doc_id = a.doc_id + 1""".stripMargin
    },

    "q_embed_neardup" ->
      // the same seeded hyperplanes srpBucket uses (ann_pl literals),
      // bits derived from count(*) exactly as the Spark plan derives them
      s"""WITH $annParamCte,
         |$annPlanesCte,
         |b AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |         ${srpBucketSql("CAST(embedding AS DOUBLE[])")} AS bucket
         |  FROM embeddings, ann_p, ann_pl)
         |SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         |  ${rs("list_cosine_similarity(a.v, c.v)", 4)} AS sim
         |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
         |WHERE ${rs("list_cosine_similarity(a.v, c.v)", 4)} >= 0.2""".stripMargin,

    "q_ann_ivf" -> {
      // two-level mirror: same seeded fine centroids (ivf_cs) AND
      // coarse vectors (ivf_gs), the per-cell group list (ivf_gl),
      // then per vector: first-max over the coarse dots MASKED to
      // non-empty groups, then first-max over the fine dots masked to
      // that group — every clause replays Similarity.ivfAssignTwoLevel
      // / ArgMaxDotGrouped (index-order dots, first-index ties)
      def dots(vecExpr: String) =
        s"""list_transform(generate_series(1, cells),
           |          __j -> list_dot_product($vecExpr, cs[__j]))""".stripMargin
      def mgds(vecExpr: String) =
        s"""list_transform(generate_series(1, gcnt), __g ->
           |      CASE WHEN list_contains(gl, __g - 1)
           |           THEN list_dot_product($vecExpr, gs[__g])
           |           ELSE -1e308 END)""".stripMargin
      s"""WITH $annParamCte,
         |$ivfCentCte,
         |$ivfCoarseCte,
         |$ivfGroupListCte,
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id = 0),
         |asg AS (
         |  SELECT vec_id, v, list_position(mds, list_max(mds)) - 1 AS cell
         |  FROM (
         |    SELECT vec_id, v,
         |      list_transform(generate_series(1, cells), __j ->
         |        CASE WHEN gl[__j] = vg THEN ds[__j] ELSE -1e308 END)
         |        AS mds
         |    FROM (
         |      SELECT vec_id, v, ds, gl,
         |        list_position(mg, list_max(mg)) - 1 AS vg
         |      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |              ${dots("CAST(embedding AS DOUBLE[])")} AS ds,
         |              ${mgds("CAST(embedding AS DOUBLE[])")} AS mg,
         |              gl
         |            FROM embeddings, ann_p, ivf_cs, ivf_gs, ivf_gl)),
         |      ann_p)),
         |qc AS (
         |  SELECT list_position(mds, list_max(mds)) - 1 AS cell
         |  FROM (
         |    SELECT list_transform(generate_series(1, cells), __j ->
         |        CASE WHEN gl[__j] = vg THEN ds[__j] ELSE -1e308 END)
         |        AS mds
         |    FROM (
         |      SELECT ds, gl, list_position(mg, list_max(mg)) - 1 AS vg
         |      FROM (SELECT ${dots("qv")} AS ds, ${mgds("qv")} AS mg, gl
         |            FROM q, ann_p, ivf_cs, ivf_gs, ivf_gl)),
         |    ann_p))
         |SELECT vec_id, ${rs("list_cosine_similarity(v, qv)", 4)} AS sim
         |FROM asg, q, qc
         |WHERE asg.cell = qc.cell AND vec_id <> 0
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
    },

    // two-level multi-probe: top-2 NON-empty coarse groups via
    // first-max argmax twice (second pass masks the winning group),
    // then the within-group first-max cell of each — mirroring
    // ivfProbesTwoLevel's (-dot, idx) ordering at both levels; when
    // only one non-empty group exists the second probe collapses onto
    // the first (ivfProbesTwoLevel returns one cell there)
    "q_ann_ivf_probe" -> {
      def dots(vecExpr: String) =
        s"""list_transform(generate_series(1, cells),
           |          __j -> list_dot_product($vecExpr, cs[__j]))""".stripMargin
      def mgds(vecExpr: String) =
        s"""list_transform(generate_series(1, gcnt), __g ->
           |      CASE WHEN list_contains(gl, __g - 1)
           |           THEN list_dot_product($vecExpr, gs[__g])
           |           ELSE -1e308 END)""".stripMargin
      def grpArgmax(grpVar: String) =
        s"""list_position(
           |    list_transform(generate_series(1, cells), __j ->
           |      CASE WHEN gl[__j] = $grpVar THEN ds[__j]
           |           ELSE -1e308 END),
           |    list_max(
           |      list_transform(generate_series(1, cells), __j ->
           |        CASE WHEN gl[__j] = $grpVar THEN ds[__j]
           |             ELSE -1e308 END))) - 1""".stripMargin
      s"""WITH $annParamCte,
         |$ivfCentCte,
         |$ivfCoarseCte,
         |$ivfGroupListCte,
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id = 0),
         |asg AS (
         |  SELECT vec_id, v, list_position(mds, list_max(mds)) - 1 AS cell
         |  FROM (
         |    SELECT vec_id, v,
         |      list_transform(generate_series(1, cells), __j ->
         |        CASE WHEN gl[__j] = vg THEN ds[__j] ELSE -1e308 END)
         |        AS mds
         |    FROM (
         |      SELECT vec_id, v, ds, gl,
         |        list_position(mg, list_max(mg)) - 1 AS vg
         |      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |              ${dots("CAST(embedding AS DOUBLE[])")} AS ds,
         |              ${mgds("CAST(embedding AS DOUBLE[])")} AS mg,
         |              gl
         |            FROM embeddings, ann_p, ivf_cs, ivf_gs, ivf_gl)),
         |      ann_p)),
         |qp AS (
         |  SELECT ${grpArgmax("g1")} AS c1,
         |    CASE WHEN list_contains(gl, g2)
         |         THEN ${grpArgmax("g2")}
         |         ELSE ${grpArgmax("g1")} END AS c2
         |  FROM (
         |    SELECT ds, gl, g1,
         |      list_position(mg2, list_max(mg2)) - 1 AS g2
         |    FROM (
         |      SELECT ds, gl, mg,
         |        list_position(mg, list_max(mg)) - 1 AS g1,
         |        list_transform(generate_series(1, gcnt), __g ->
         |          CASE WHEN __g - 1 = list_position(mg, list_max(mg)) - 1
         |               THEN -1e308 ELSE mg[__g] END) AS mg2
         |      FROM (SELECT ${dots("qv")} AS ds, ${mgds("qv")} AS mg, gl
         |            FROM q, ann_p, ivf_cs, ivf_gs, ivf_gl), ann_p)),
         |  ann_p)
         |SELECT vec_id, cast(cell AS int) AS cell,
         |  ${rs("list_cosine_similarity(v, qv)", 4)} AS sim
         |FROM asg, q, qp
         |WHERE (asg.cell = qp.c1 OR asg.cell = qp.c2) AND vec_id <> 0
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
    },

    // same seeded hyperplane literals as q_embed_neardup (corpus-scaled
    // bits); exact p99 (quantile_cont ≡ Spark's sort-based percentile:
    // both interpolate at (n-1)*q)
    "q_bucket_occupancy" ->
      s"""WITH $annParamCte,
         |$annPlanesCte,
         |c AS (
         |  SELECT ${srpBucketSql("CAST(embedding AS DOUBLE[])")} AS bucket,
         |    count(*) AS n
         |  FROM embeddings, ann_p, ann_pl GROUP BY 1)
         |SELECT count(*) AS n_buckets, max(n) AS max_bucket,
         |  ${rs("quantile_cont(n, 0.99)", 4)} AS p99_bucket,
         |  ${rs("avg(n)", 4)} AS avg_bucket
         |FROM c""".stripMargin,

    "q_cosine_topk" ->
      ("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, """ +
        rs("list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)", 4) +
        """ AS sim
          |FROM embeddings, q WHERE vec_id <> 0
          |ORDER BY sim DESC, vec_id LIMIT 10""").stripMargin,

    // MMR: the same deci-milli integer scores, greedy selection as
    // five chained MATERIALIZED CTEs (each references its
    // predecessor's selected set — the q_pca_project re-inlining
    // lesson), ties on vec_id
    "q_mmr_rerank" -> {
      val steps = (2 to 5).map { k =>
        s"""r$k AS MATERIALIZED (
           |  SELECT c.vec_id, c.v, c.rel,
           |    cast(max(floor(list_cosine_similarity(c.v, s.v)
           |      * 10000.0)) AS bigint) AS maxsim
           |  FROM cand c, sel${k - 1} s
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${k - 1})
           |  GROUP BY c.vec_id, c.v, c.rel),
           |s$k AS MATERIALIZED (
           |  SELECT vec_id, v, rel, maxsim,
           |    cast(7 * rel - 3 * maxsim AS bigint) AS score
           |  FROM r$k ORDER BY 7 * rel - 3 * maxsim DESC, vec_id
           |  LIMIT 1),
           |sel$k AS MATERIALIZED (
           |  SELECT * FROM sel${k - 1} UNION ALL SELECT * FROM s$k)"""
          .stripMargin
      }.mkString(",\n")
      val fin = (1 to 5).map { k =>
        s"SELECT cast($k AS bigint) AS rnk, vec_id, rel AS rel_dm, " +
          s"maxsim AS maxsim_dm, score AS mmr_score FROM s$k"
      }.mkString("\nUNION ALL ")
      s"""WITH cand AS MATERIALIZED (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    cast(floor(list_cosine_similarity(
         |      CAST(embedding AS DOUBLE[]), qv) * 10000.0) AS bigint)
         |      AS rel
         |  FROM embeddings,
         |    (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |     FROM embeddings WHERE vec_id = 0) q
         |  WHERE vec_id <> 0
         |  ORDER BY rel DESC, vec_id LIMIT 20),
         |s1 AS MATERIALIZED (
         |  SELECT vec_id, v, rel, cast(0 AS bigint) AS maxsim,
         |    cast(7 * rel AS bigint) AS score
         |  FROM cand ORDER BY 7 * rel DESC, vec_id LIMIT 1),
         |sel1 AS MATERIALIZED (SELECT * FROM s1),
         |$steps
         |$fin""".stripMargin
    },

    "q_vec_norm" ->
      (s"SELECT vec_id, ${rs("sqrt(list_sum(list_transform(" +
        "CAST(embedding AS DOUBLE[]), x -> x*x)))", 6)} AS nrm " +
        "FROM embeddings"),

    // PMI: identical double expression over exact counts, micro-nat
    // integerized before output
    "q_pmi_bigrams" ->
      """WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (SELECT tk[i] AS w1, tk[i+1] AS w2,
        |         cast(count(*) AS bigint) AS c2
        |       FROM (SELECT tk, unnest(generate_series(1, len(tk)-1)) AS i
        |             FROM t)
        |       GROUP BY 1, 2),
        |uni AS (SELECT w, cast(count(*) AS bigint) AS cw FROM (
        |          SELECT unnest(string_split(text, ' ')) AS w
        |          FROM documents) GROUP BY 1),
        |nb AS (SELECT cast(sum(c2) AS bigint) AS n_bi FROM bi),
        |nt AS (SELECT cast(sum(cw) AS bigint) AS n_tok FROM uni)
        |SELECT w1, w2, c2,
        |  cast(floor(ln(cast(c2 AS double) *
        |      cast(n_tok AS double) * cast(n_tok AS double) /
        |      (cast(n_bi AS double) * cast(u1.cw AS double) *
        |        cast(u2.cw AS double))) * 1000000 + 0.5) AS bigint)
        |    AS pmi_micro
        |FROM bi JOIN uni u1 ON bi.w1 = u1.w
        |        JOIN uni u2 ON bi.w2 = u2.w, nb, nt
        |ORDER BY c2 DESC, w1, w2 LIMIT 30""".stripMargin,

    // vocab overlap: exact per-source vocab sets, consecutive pairs
    "q_vocab_overlap" ->
      s"""WITH v AS (SELECT source,
         |    cast(substr(source, 4) AS int) AS sidx,
         |    list(DISTINCT w) AS vocab
         |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
         |        FROM documents)
         |  GROUP BY 1, 2)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  cast(len(a.vocab) AS int) AS n_a,
         |  cast(len(b.vocab) AS int) AS n_b,
         |  ${rs("cast(len(list_intersect(a.vocab, b.vocab)) AS double) / " +
              "(len(a.vocab) + len(b.vocab) - " +
              "len(list_intersect(a.vocab, b.vocab)))", 6)} AS jaccard
         |FROM v a JOIN v b ON b.sidx = a.sidx + 1""".stripMargin,

    // KMV overlap: same 48-bit md5 bigram-shingle hashes, per-source
    // bottom-256 via row_number, union bottom-k + two-sided
    // membership — pure integer set arithmetic, so est matches Spark
    // bit-for-bit
    "q_kmv_overlap" ->
      s"""WITH h AS (SELECT DISTINCT source,
         |    cast(('0x' || substr(md5(g), 1, 12)) AS bigint) AS h
         |  FROM (SELECT source, unnest($shSql) AS g
         |        FROM documents)),
         |sk AS (SELECT source, h FROM (
         |    SELECT source, h, row_number() OVER
         |      (PARTITION BY source ORDER BY h) AS rn FROM h)
         |  WHERE rn <= 256),
         |s AS (SELECT source, cast(substr(source, 4) AS int) AS sidx,
         |    list_sort(list(h)) AS sk, cast(count(*) AS int) AS ksz
         |  FROM sk GROUP BY 1, 2),
         |u AS (SELECT a.source AS src_a, b.source AS src_b,
         |    a.sk AS ska, b.sk AS skb, a.ksz AS k_a, b.ksz AS k_b,
         |    list_slice(list_sort(list_distinct(list_concat(a.sk, b.sk))),
         |      1, 256) AS uk
         |  FROM s a JOIN s b ON b.sidx = a.sidx + 1)
         |SELECT src_a, src_b, k_a, k_b,
         |  cast(len(list_intersect(uk, list_intersect(ska, skb)))
         |    AS bigint) AS n_match,
         |  ${rs("cast(len(list_intersect(uk, list_intersect(ska, skb))) " +
              "AS double) / len(uk)", 6)} AS jaccard_est
         |FROM u""".stripMargin,

    // concordance: same ±3 window; generate_subscripts is 1-based vs
    // posexplode's 0-based pos — aligned with o-1
    "q_concordance" ->
      """SELECT doc_id, cast(o - 1 AS int) AS pos,
        |  array_to_string(
        |    list_slice(tk, greatest(o - 3, 1), o + 3), ' ') AS context
        |FROM (SELECT doc_id, tk, unnest(tk) AS tok,
        |        generate_subscripts(tk, 1) AS o
        |      FROM (SELECT doc_id, string_split(text, ' ') AS tk
        |            FROM documents))
        |WHERE tok = 'join'""".stripMargin,

    // per-dimension stats: micro-unit integerized sums (exact longs),
    // identical double mean/std derivation. unnest ordinality is
    // 1-based; Spark posexplode is 0-based — align with o-1
    "q_embed_stats" ->
      s"""WITH e AS (SELECT cast(o - 1 AS int) AS dim,
         |    cast(floor(x*1000000 + 0.5) AS bigint) AS xi
         |  FROM (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
         |          generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS o
         |        FROM embeddings)),
         |a AS (SELECT dim, cast(count(*) AS bigint) AS n,
         |        cast(sum(xi) AS bigint) AS s,
         |        cast(sum(xi*xi) AS bigint) AS ssq
         |      FROM e GROUP BY 1)
         |SELECT dim, n,
         |  ${rs("cast(s AS double)/n/1000000", 6)} AS mean,
         |  ${rs("sqrt((cast(ssq AS double) - " +
              "cast(s AS double)*cast(s AS double)/n)/n)/1000000", 6)}
         |    AS std
         |FROM a""".stripMargin,

    "q_media_meta" ->
      ("SELECT doc_id AS media_id, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "cast(octet_length(encode(text)) AS bigint) AS n_bytes, " +
        "lower(substr(hex(encode(text)), 1, 16)) AS header_hex " +
        "FROM documents"),

    // frame sampling arithmetic recomputed over the payload length
    // (series bound 8191 ≫ max frames/doc; DuckDB lacks lateral
    // generate_series so over-generate + filter)
    "q_media_frames" ->
      ("""SELECT doc_id AS media_id, cast(f AS int) AS frame_idx,
         | cast(least(64, octet_length(encode(text)) - f*64) AS bigint)
         |   AS frame_bytes
         |FROM documents, generate_series(0, 8191, 2) t(f)
         |WHERE f < greatest(octet_length(encode(text)) // 64, 1)""").stripMargin,

    // decoded-feature facts recomputed arithmetically: image samples are
    // the non-padding BMP pixel bytes (fr*rowSize + x*3 + b offsets,
    // value (id*31 + offset) % 256, x*3+b flattened to j in [0, 3w));
    // audio samples are |((id*7 + i) % 65536) - 32768|; video → NULL.
    // Integer sums are exact, single double division in both engines.
    "q_media_features" ->
      ("""WITH base AS (
         |  SELECT doc_id,
         |    1 + doc_id % 13 AS w, 1 + doc_id % 7 AS h,
         |    ((3*(1 + doc_id % 13) + 3) // 4) * 4 AS rowsize,
         |    16 + doc_id % 33 AS ns
         |  FROM documents),
         |feat AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN
         |      flatten(list_transform(generate_series(0, h - 1), fr ->
         |        list_transform(generate_series(0, 3*w - 1), j ->
         |          (doc_id*31 + fr*rowsize + j) % 256)))
         |    WHEN doc_id % 3 = 1 THEN
         |      list_transform(generate_series(0, ns - 1), i ->
         |        abs((doc_id*7 + i) % 65536 - 32768))
         |    END AS samples
         |  FROM base)
         |SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         |  """ + rs("cast(list_sum(samples) AS double) / len(samples)", 4) +
        """ AS mean_sample,
          |  cast(list_max(samples) AS int) AS peak_sample
          |FROM feat""").stripMargin,

    // frame_idx 0,2,4 of nFrames = 2 + id%4; dims w = 2+id%5, h = 1+id%3
    "q_video_frames" ->
      ("""SELECT doc_id AS media_id, cast(f AS int) AS frame_idx,
         | cast(2 + doc_id % 5 AS int) AS w,
         | cast(1 + doc_id % 3 AS int) AS h
         |FROM documents, generate_series(0, 4, 2) t(f)
         |WHERE doc_id % 10 = 0 AND f < 2 + doc_id % 4""").stripMargin,

    // Decoded facts recomputed arithmetically: BMP size = 54 + h*rowSize
    // (rows padded to 4 bytes), WAV size = 44 + 2n, duration follows the
    // decoder's exact op order ((2n)/blockAlign/rate*1000) so the double
    // bits match.
    "q_media_decode" ->
      ("""SELECT doc_id AS media_id,
         | CASE WHEN doc_id % 3 = 0 THEN 'image'
         |      WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         | cast(CASE
         |   WHEN doc_id % 3 = 0 THEN
         |     54 + (1 + doc_id % 7) * ((3*(1 + doc_id % 13) + 3) // 4 * 4)
         |   WHEN doc_id % 3 = 1 THEN 44 + 2*(16 + doc_id % 33)
         |   ELSE 64 + doc_id % 128 END AS bigint) AS n_bytes,
         | cast(CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 13 END AS int)
         |   AS width,
         | cast(CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 7 END AS int)
         |   AS height,
         | CASE WHEN doc_id % 3 = 1 THEN
         |   cast(2*(16 + doc_id % 33) AS double) / 2 / 8000 * 1000
         | END AS duration_ms
         |FROM documents""").stripMargin,

    // The logo fixture's raster reconstructed arithmetically (seed =
    // doc_id % 37; file-order non-padding bytes (s*31 + fr*rowsize + j)
    // % 256), then the exact 60-bit average-hash packing: bit k set iff
    // px[k*n/60] * n > sum(px) — integer-exact, so the packed BIGINT
    // matches the decoder's hash bit-for-bit.
    "q_image_dedup" ->
      ("""WITH dims AS (
         |  SELECT doc_id, doc_id % 37 AS s,
         |    1 + (doc_id % 37) % 13 AS w, 1 + (doc_id % 37) % 7 AS h,
         |    ((3*(1 + (doc_id % 37) % 13) + 3) // 4) * 4 AS rowsize
         |  FROM documents),
         |px AS (
         |  SELECT doc_id,
         |    flatten(list_transform(generate_series(0, h - 1), fr ->
         |      list_transform(generate_series(0, 3*w - 1), j ->
         |        (s*31 + fr*rowsize + j) % 256))) AS p
         |  FROM dims),
         |hs AS (
         |  SELECT doc_id,
         |    cast(list_sum(list_transform(generate_series(0, 59), k ->
         |      CASE WHEN p[((k * len(p)) // 60) + 1] * len(p) > list_sum(p)
         |           THEN (1::BIGINT << k) ELSE 0 END)) AS bigint) AS ahash
         |  FROM px)
         |SELECT ahash, cast(count(*) AS bigint) AS n_images,
         |  cast(min(doc_id) AS bigint) AS rep_id
         |FROM hs GROUP BY 1""").stripMargin,

    // candidates INDEPENDENTLY derived (any shared shingle — a strict
    // superset of the asymmetric prefix candidates), verify = exact
    // list intersection over the probe side's shingle count
    "q_containment" ->
      (s"""WITH s AS (SELECT doc_id, $spanShinglesSql AS sh FROM documents),
         |tok AS (SELECT doc_id, unnest(sh) AS t FROM s),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM tok a JOIN tok b
         |           ON a.t = b.t AND a.doc_id <> b.doc_id),
         |v AS (SELECT id_a, id_b,
         |        len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS i,
         |        len(sa.sh) AS na
         |      FROM cand
         |      JOIN s sa ON sa.doc_id = id_a
         |      JOIN s sb ON sb.doc_id = id_b)
         |SELECT id_a, id_b,
         |  ${rs("cast(i AS double) / na", 6)} AS containment
         |FROM v WHERE ${rs("cast(i AS double) / na", 6)} >= 0.5"""
        ).stripMargin,

    // same verified edge set as q_jaro_link, then recursive reachability
    // components (the q_dedup_clusters construction over STRING ids) and
    // the survivorship rollup: canonical by (support DESC, name ASC)
    "q_linkage_clusters" ->
      (s"""WITH n AS (SELECT p_name AS nm,
         |    cast(count(*) AS bigint) AS support,
         |    string_split(p_name, ' ')[1] AS blk
         |  FROM part GROUP BY 1, 3),
         |e0 AS (SELECT a.nm AS id_a, b.nm AS id_b
         |       FROM n a JOIN n b ON a.blk = b.blk AND a.nm < b.nm
         |       WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.8),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM e0
         |          UNION ALL SELECT id_b, id_a FROM e0),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach AS (
         |  WITH RECURSIVE r(src, dst) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src)
         |  SELECT * FROM r),
         |cl AS (SELECT src AS nm, min(dst) AS cluster_id
         |       FROM reach GROUP BY 1),
         |j AS (SELECT cl.nm, cl.cluster_id, n.support
         |      FROM cl JOIN n USING (nm)),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
         |         ORDER BY support DESC, nm ASC) AS rn FROM j)
         |SELECT cluster_id,
         |  max(CASE WHEN rn = 1 THEN nm END) AS canonical_nm,
         |  cast(count(*) AS bigint) AS n_names,
         |  cast(sum(support) AS bigint) AS total_support
         |FROM rk GROUP BY 1""").stripMargin,

    // jaro_winkler_similarity is bit-identical to JaroWinklerExpr
    // (same conventions: empty -> 0, boost iff jaro > 0.7, prefix cap
    // 4), so the threshold cut and the rounded score agree exactly.
    "q_jaro_link" ->
      (s"""WITH n AS (SELECT p_name AS nm,
         |    cast(count(*) AS bigint) AS support,
         |    string_split(p_name, ' ')[1] AS blk
         |  FROM part GROUP BY 1, 3)
         |SELECT a.nm AS name_a, b.nm AS name_b,
         |  a.support AS n_a, b.support AS n_b,
         |  ${rs("jaro_winkler_similarity(a.nm, b.nm)", 6)} AS jw
         |FROM n a JOIN n b ON a.blk = b.blk AND a.nm < b.nm
         |WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.8""").stripMargin,

    // Clipped n-gram precisions over exact BIGINT counts; the BP exp
    // and the sqrt geometric mean written as the identical double
    // expression trees the Spark side evaluates.
    "q_bleu_pairs" -> {
      val p1 = "CASE WHEN nb > 0 THEN cast(ov1 AS double)/nb ELSE 0.0 END"
      val p2 = "CASE WHEN nb - 1 > 0 THEN cast(ov2 AS double)/(nb - 1) " +
        "ELSE 0.0 END"
      val bp = "CASE WHEN nb >= na THEN 1.0 ELSE " +
        "exp(1.0 - cast(na AS double)/cast(nb AS double)) END"
      val bleu = s"CASE WHEN ov1 > 0 AND ov2 > 0 THEN ($bp) " +
        s"* sqrt(($p1) * ($p2)) ELSE 0.0 END"
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
         |           FROM documents),
         |u AS (SELECT doc_id, 1 AS n, unnest(t) AS g FROM t),
         |b AS (SELECT doc_id, 2 AS n,
         |        unnest(list_transform(generate_series(0, len(t) - 2),
         |          i -> array_to_string(list_slice(t, i + 1, i + 2), ' ')))
         |          AS g
         |      FROM t WHERE len(t) >= 2),
         |g AS (SELECT * FROM u UNION ALL SELECT * FROM b),
         |c AS (SELECT doc_id, n, g, cast(count(*) AS bigint) AS c
         |      FROM g GROUP BY 1, 2, 3),
         |ovl AS (SELECT a.doc_id AS id_a, b2.doc_id AS id_b, a.n,
         |          cast(sum(least(a.c, b2.c)) AS bigint) AS ov
         |        FROM c a JOIN c b2 ON b2.g = a.g AND b2.n = a.n
         |          AND b2.doc_id = a.doc_id + 1
         |        GROUP BY 1, 2, 3),
         |lens AS (SELECT doc_id, cast(len(t) AS bigint) AS n FROM t),
         |pairs AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
         |            lx.n AS na, ly.n AS nb
         |          FROM documents x
         |          JOIN documents y ON y.doc_id = x.doc_id + 1
         |          JOIN lens lx ON lx.doc_id = x.doc_id
         |          JOIN lens ly ON ly.doc_id = y.doc_id),
         |j AS (SELECT p.id_a, p.id_b, p.na, p.nb,
         |        coalesce(o1.ov, 0) AS ov1, coalesce(o2.ov, 0) AS ov2
         |      FROM pairs p
         |      LEFT JOIN ovl o1 ON o1.id_a = p.id_a AND o1.id_b = p.id_b
         |        AND o1.n = 1
         |      LEFT JOIN ovl o2 ON o2.id_a = p.id_a AND o2.id_b = p.id_b
         |        AND o2.n = 2)
         |SELECT id_a, id_b, ${rs(p1, 6)} AS p1, ${rs(p2, 6)} AS p2,
         |  ${rs(bp, 6)} AS bp, ${rs(bleu, 6)} AS bleu
         |FROM j""".stripMargin
    },

    // Clipped (multiset-min) n-gram overlap; P/R/F1 as the identical
    // double expression order over exact BIGINT counts.
    "q_rouge_pairs" -> {
      val p = "CASE WHEN tb > 0 THEN cast(ov AS double)/tb ELSE 0.0 END"
      val rc = "CASE WHEN ta > 0 THEN cast(ov AS double)/ta ELSE 0.0 END"
      val f1 = "CASE WHEN ov > 0 THEN 2.0 * (cast(ov AS double)/tb) * " +
        "(cast(ov AS double)/ta) / ((cast(ov AS double)/tb) + " +
        "(cast(ov AS double)/ta)) ELSE 0.0 END"
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
         |           FROM documents),
         |u AS (SELECT doc_id, 'rouge1' AS metric, unnest(t) AS g FROM t),
         |b AS (SELECT doc_id, 'rouge2' AS metric,
         |        unnest(list_transform(generate_series(0, len(t) - 2),
         |          i -> array_to_string(list_slice(t, i + 1, i + 2), ' ')))
         |          AS g
         |      FROM t WHERE len(t) >= 2),
         |g AS (SELECT * FROM u UNION ALL SELECT * FROM b),
         |c AS (SELECT doc_id, metric, g, cast(count(*) AS bigint) AS c
         |      FROM g GROUP BY 1, 2, 3),
         |tot AS (SELECT doc_id, metric, cast(sum(c) AS bigint) AS tot
         |        FROM c GROUP BY 1, 2),
         |ovl AS (SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
         |          a.metric AS metric,
         |          cast(sum(least(a.c, b2.c)) AS bigint) AS ov
         |        FROM c a JOIN c b2 ON b2.g = a.g AND b2.metric = a.metric
         |          AND b2.doc_id = a.doc_id + 1
         |        GROUP BY 1, 2, 3),
         |pairs AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, nn.metric
         |          FROM documents x
         |          JOIN documents y ON y.doc_id = x.doc_id + 1,
         |          (VALUES ('rouge1'), ('rouge2')) nn(metric)),
         |j AS (SELECT p.id_a, p.id_b, p.metric,
         |        coalesce(ovl.ov, 0) AS ov, coalesce(ta.tot, 0) AS ta,
         |        coalesce(tb.tot, 0) AS tb
         |      FROM pairs p
         |      LEFT JOIN ovl ON ovl.id_a = p.id_a AND ovl.id_b = p.id_b
         |        AND ovl.metric = p.metric
         |      LEFT JOIN tot ta ON ta.doc_id = p.id_a
         |        AND ta.metric = p.metric
         |      LEFT JOIN tot tb ON tb.doc_id = p.id_b
         |        AND tb.metric = p.metric)
         |SELECT id_a, id_b, metric, ${rs(p, 6)} AS p,
         |  ${rs(rc, 6)} AS rec, ${rs(f1, 6)} AS f1
         |FROM j""".stripMargin
    },

    // Same deterministic subsampling (drop the 3 most-frequent words,
    // ties by word), same compacted re-ranking, same window-2 pairs.
    "q_skipgrams" ->
      ("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
         |           FROM documents),
         |tok AS (SELECT doc_id, unnest(t) AS w,
         |          unnest(range(len(t))) AS pos FROM t),
         |freq AS (SELECT w, count(*) AS cw FROM tok GROUP BY 1),
         |dropped AS (SELECT w FROM (
         |    SELECT w, row_number() OVER (ORDER BY cw DESC, w) AS rk
         |    FROM freq) WHERE rk <= 3),
         |kept AS (SELECT doc_id, w,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
         |  FROM tok WHERE w NOT IN (SELECT w FROM dropped)),
         |prs AS (SELECT a.w AS wa, b.w AS wb
         |  FROM kept a CROSS JOIN (VALUES (1), (2)) ks(k)
         |  JOIN kept b ON b.doc_id = a.doc_id AND b.rn = a.rn + ks.k),
         |d AS (SELECT wa AS center, wb AS context FROM prs
         |      UNION ALL SELECT wb, wa FROM prs)
         |SELECT center, context, cast(count(*) AS bigint) AS n_pairs
         |FROM d GROUP BY 1, 2""").stripMargin)
}
