package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph-based ANN — the remaining family on the quantization/routing
  * ladder (the NSW/HNSW shape behind Lucene, Vespa and pgvector's
  * index): a bounded-degree neighbor GRAPH replaces the coarse
  * quantizer, and search is greedy BEAM expansion from fixed entry
  * points, touching O(entries + rounds·beam·degree) vectors per probe
  * instead of Nprobe/Nlist of the corpus.
  *
  * Three halves, graded separately:
  *  - BUILD ([[buildEdges]]): an LSH-BLOCKED approximate k-NN graph
  *    plus [[LongLinks]] deterministic long-range links (r13 verdict
  *    task 2 — the all-pairs baseline retired to the spec-side truth
  *    [[buildEdgesExactKnn]]). Candidates come from the sign-LSH
  *    bucket rule ([[BuildTables]] tables × [[BuildPlanes]] bits, the
  *    [[Similarity.lshBucket]] plane family), refined to the top-[[M]]
  *    by exact cosine — bucket-equality joins and linear passes only,
  *    never corpus×corpus, so the build survives 100 TB the same way
  *    the dedup LSH family does (planes scale ~log N to bound bucket
  *    sizes); the graph is a stored artifact like IVF's centroids.
  *    Symmetrization (knn ∪ reverse-knn) is load-bearing: directed
  *    k-NN graphs strand low-in-degree nodes, the classic NSW
  *    navigability fix.
  *  - SEARCH ([[graphTopK]]): [[Rounds]] rounds of {take the [[Beam]]
  *    best visited, expand their edges, score, dedup}, a fixed-depth
  *    unroll of HNSW's layer-0 loop (fixed depth so both engines run
  *    the IDENTICAL expansion; the termination heuristic is a serving
  *    knob, not semantics). Every expansion is a key-equality join
  *    (frontier broadcast against the edge list; candidates
  *    key-joined to vectors); nothing corpus×corpus in the search
  *    path.
  *  - MAINTENANCE ([[graphInsert]]): batch insert wires new vectors
  *    through the stored graph at the wider [[InsertBeam]] — never a
  *    rebuild.
  *
  * Determinism: cosines via the fold-exact [[Similarity.dot]] with
  * per-vector norms folded once ([[Similarity.cosinePre]]); every
  * top-N (graph ranks, beam, final ranks) ties-broken by id; the
  * visited set dedups on (probe, node, cosine) where cosine is a pure
  * function of the pair — bit-identical in both engines. In-gate
  * honesty: [[graphTopKGate]] asserts recall floors on BOTH embedding
  * regimes, [[graphInsertGate]] asserts the wiring-recall floor.
  */
object GraphAnn {

  /** Out-degree of the directed k-NN build (symmetrized ≤ 2·M). */
  val M = 8

  /** Long-range links per node — NSW's small-world ingredient. A pure
    * k-NN graph DISCONNECTS on clustered data (every edge is
    * intra-cluster, so a beam can never leave the entry points'
    * clusters — measured: recall collapses on the mixture-of-centers
    * fixture) and percolates poorly on iid data (measured 0.35@sf0.1
    * with knn-only edges). Each node adds [[LongLinks]] deterministic
    * pseudo-random jumps dst = rank⁻¹(fnv1a64("long:<seed>:<src>") mod
    * N) — Kleinberg-style shortcuts that make the graph connected and
    * give the beam cluster-crossing hops; both engines derive the
    * identical links from the identical hash.
    */
  val LongLinks = 2

  /** Fixed entry points: vec_id ∈ [0, Entries) — deterministic, and
    * multi-entry is the standard local-minimum mitigation.
    */
  val Entries = 4

  val Beam = 8

  /** Insert-time beam — HNSW's efConstruction > efSearch: wiring
    * quality is paid once per vector at write time, so the maintenance
    * path searches twice as wide as serving.
    */
  val InsertBeam = 16

  val Rounds = 4
  val K = 5

  /** Recall floors per regime, recallBounds discipline: iid is the
    * navigability worst case (floors prove survival), the clustered
    * mixture is the regime neighbor graphs exist for (floor proves the
    * graph actually NAVIGATES). Pinned under the min measured across
    * sf0.001/0.01/0.1 with margin — measured values print in-gate.
    */
  val RecallFloorIid = 0.4
  val RecallFloorClustered = 0.9

  private def asDouble(emb: Column): Column =
    transform(emb, x => x.cast("double"))

  /** Partition count for the CACHED corpus frame, derived from the
    * input's byte size (optimizer file stats — no job), not from the
    * session's shuffle parallelism (r17, guide §2 "scale-adaptive
    * partitioning"): the cached frame's partitioning is pinned for the
    * whole gate (AQE cannot re-partition cached plans), and every beam
    * round and refinement join schedules one task per cached
    * partition. At core-count partitioning a 2000-vector corpus paid
    * 33-task scans in every one of ~70 jobs — the r16 scaling block's
    * "slower at 32 cores than 8" signature. Floor 8 keeps the build's
    * exact-cosine refinement parallel at gate scale; ~32 MB per
    * partition above it keeps 100 TB corpora at healthy task sizes.
    */
  private def basePartsFor(emb: DataFrame): Int = {
    val bytes = emb.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = (bytes / BigInt(32L * 1024 * 1024)).toLong
    math.max(8L, math.min(target, 200000L)).toInt
  }

  private def baseOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
      .repartition(basePartsFor(emb), col("vec_id"))

  /** Sign-LSH blocking config for the graph BUILD: [[BuildTables]]
    * independent tables of [[BuildPlanes]] hyperplane bits each
    * (the [[Similarity.lshBucket]] family — plane ids
    * `tbl·BuildPlanes + p`, so the build's plane set is disjoint from
    * none and identical in both engines). Candidate pairs are vectors
    * sharing a (table, bucket) key — the banded-LSH candidate rule the
    * dedup family uses — refined to the top-[[M]] by exact cosine.
    * Recall dials up with tables, candidate cost down with planes;
    * at 100 TB planes grows ~log N so per-bucket size (and therefore
    * per-node candidate count) stays bounded.
    */
  val BuildPlanes = 6
  val BuildTables = 12

  /** Expected per-bucket occupancy the exact refinement can afford:
    * with 2^planes buckets per table, candidate generation inside one
    * bucket is O(occupancy²) pairs, so occupancy must stay bounded as
    * the corpus grows. Calibrated to the pinned config: 2000 vectors /
    * 2^6 buckets ≈ 31 per bucket.
    */
  val BuildBucketTarget = 32L

  /** Planes for a corpus of `n` vectors — the "planes grow ~log₂ N"
    * claim as CODE, not scaladoc (r14 verdict task 2): the smallest
    * plane count whose 2^planes buckets hold occupancy ≤
    * [[BuildBucketTarget]], floored at [[BuildPlanes]]. Every gate
    * corpus (≤ 2048 vectors at sf0.1, including the clustered fixture
    * and the insert gate's old split) reproduces the pinned 6-plane
    * config EXACTLY, so pins, floors and the static oracle SQL are
    * bit-identical (GraphAnnSpec pins this function at three Ns).
    * Tables stay [[BuildTables]]: the table count is the recall knob
    * (independent retries of the same blocking), not a load knob — it
    * does not need to scale with n. Decided from the `n` the build
    * already counts — no extra job (the r14 sizing-probe lesson).
    */
  private[graft] def buildPlanesFor(n: Long): Int = {
    // ceil-divide so occupancy n/2^planes never exceeds the target
    val buckets =
      math.max(1L, (n + BuildBucketTarget - 1L) / BuildBucketTarget)
    val needed = if (buckets <= 1L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1L)
    math.max(BuildPlanes, needed)
  }

  /** Corpus size up to which the pinned gate config (12 tables /
    * 6 planes / 4 rounds) is reproduced exactly; above it the three
    * knobs widen together. 2048 = the largest n where 6 planes already
    * satisfy the occupancy bound, so the pivot is derived from the
    * plane rule, not a second tuning constant.
    */
  private[graft] val AdaptPivot = 2048L

  private def log2ceil(x: Long): Int =
    if (x <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x - 1L)

  /** LSH tables for a corpus of `n` vectors. Occupancy-bounded planes
    * alone do NOT hold iid recall as n grows: per-node candidate count
    * stays tables×occupancy while the corpus grows, so the covered
    * FRACTION collapses (measured in the r15 scale bench: recall
    * 0.505 at n=4000, 0.359 at n=8000 with tables pinned at 12 — the
    * honesty floor caught it). Tables therefore grow +4 per corpus
    * doubling past [[AdaptPivot]]: per-node candidates ≈
    * tables(n)·occupancy ≈ O(log n), total build O(n log n) — the ANN
    * literature's cost shape, still never corpus×corpus.
    */
  private[graft] def buildTablesFor(n: Long): Int =
    BuildTables + 4 * log2ceil(
      (n + AdaptPivot - 1L) / AdaptPivot)

  /** Beam rounds for a corpus of `n` vectors: graph diameter grows
    * ~log n, so the search deepens one round per corpus doubling past
    * [[AdaptPivot]]. Gate Ns keep [[Rounds]] exactly (the oracle's
    * unrolled CTE blocks depend on it).
    */
  private[graft] def roundsFor(n: Long): Int =
    Rounds + log2ceil((n + AdaptPivot - 1L) / AdaptPivot)

  /** Beam width (HNSW's efSearch) for a corpus of `n` vectors. Deeper
    * rounds alone do NOT hold iid recall as n grows: the r16 extended
    * scale sweep measured 0.69 → 0.49 → 0.29 at 16k/32k/64k with beam
    * pinned at [[Beam]], and refining the EDGES (NN-descent) moved
    * those numbers by less than a point — at fixed beam the search
    * visits rounds·beam·degree ≈ 1.4k nodes whether the corpus is 2k
    * or 64k, so the visited FRACTION collapses and near-tie density
    * (which grows with n in the iid regime) drowns the frontier. The
    * HNSW practice is ef growing with n at iid-like hardness: +4 per
    * corpus doubling past [[AdaptPivot]], the same shape as the
    * tables law — visited ≈ O(log² n), still independent of corpus
    * size in absolute terms. Gate corpora keep [[Beam]] exactly (the
    * oracle's unrolled beam CTEs depend on it).
    */
  private[graft] def beamFor(n: Long): Int =
    Beam + 4 * log2ceil((n + AdaptPivot - 1L) / AdaptPivot)

  /** Entry-point count for a corpus of `n` vectors. A single-layer
    * NSW has no routing gradient on a FLAT inter-cluster landscape
    * (iid-random cluster centers are all mutually ~orthogonal, so no
    * frontier scores meaningfully closer to the probe's cluster than
    * another): reaching the right one of K clusters through uniform
    * long links is a coupon-collector, and the r16 constant-occupancy
    * clustered sweep measured exactly that decay (1.0 → 0.967 →
    * 0.832 at 16/64/256 centers). HNSW's answer is its hierarchy — a
    * coarse sampled layer routes first; the single-layer analogue
    * (Malkov's NSW multi-entry practice) seeds the beam from a
    * deterministic O(√n) id sample scored once per probe: worst-case
    * routing becomes a covered-sample problem (ids 0..E-1 hit every
    * mod-partitioned cluster), the beam prunes to [[beamFor]]
    * immediately, and structured landscapes still route through the
    * graph. O(√n) per probe keeps serving sublinear; gate corpora
    * keep [[Entries]] exactly (the oracle's entry CTE depends on it).
    */
  private[graft] def entriesFor(n: Long): Long =
    if (n <= AdaptPivot) Entries.toLong
    else math.max(Entries.toLong,
      4L * math.ceil(math.sqrt(n.toDouble)).toLong)

  /** Blocked approximate M-NN graph plus [[LongLinks]] pseudo-random
    * long-range links over a [[baseOf]] frame. Since r14 the knn half
    * is LSH-BLOCKED (r13 verdict task 2): sign-LSH bucket assignment →
    * bucket-equality candidate join → exact cosine refinement to
    * top-M — linear passes and key-equality joins only, never
    * corpus×corpus; the exact build remains available as
    * [[buildEdgesExactKnn]] (the spec-side truth which
    * GraphAnnSpec's edge-recall floor measures the blocked build
    * against). The rank⁻¹ lookup resolving a long link's hash to an
    * actual id (no density assumption on vec_id) goes through
    * [[rankedIds]] — distributed above [[RankDistThreshold]], a
    * one-partition window below it where the shuffle would cost more
    * than it saves.
    */
  /** Corpora at or above this size rank through the distributed
    * [[graft.Dist.globalRowNumber]]; below it the one-partition window
    * is cheaper (the distributed pass pays a range-partition sample +
    * shuffle + counts job — ~1.5s of fixed cost per build at gate
    * scale, pure overhead on a 2k-vector corpus). Both forms are
    * bit-identical (DistSpec + the rank test below), so the switch is
    * pure cost policy, never semantics — the same discipline as
    * [[graft.sources.VersionedLake]]'s fresh-id allocation.
    */
  private[graft] val RankDistThreshold = 2000000L

  /** Dense rank of the corpus ids (0-based, ordered by vec_id) — the
    * long-link resolver's rank⁻¹ table. Above [[RankDistThreshold]]
    * the pass is distributed ([[graft.Dist.globalRowNumber]]), so the
    * build never serializes a 100 TB corpus through one partition.
    */
  private[graft] def rankedIds(base: DataFrame, n: Long): DataFrame = {
    val ids = base.select(col("vec_id").as("dst"))
    if (n >= RankDistThreshold)
      graft.Dist.globalRowNumber(ids, Seq(col("dst")), 32, "r")
        .select(col("dst"), (col("r") - 1).as("r"))
    else
      ids.withColumn("r",
        row_number().over(Window.orderBy(col("dst"))).cast("long") - 1)
  }

  /** NN-descent refinement rounds for a corpus of `n` vectors. The
    * occupancy-bounded LSH seed CANNOT hold iid edge recall on its
    * own: planes grow ~log₂ n to keep buckets bounded, so the
    * per-table collision probability of a typical iid nearest
    * neighbor decays EXPONENTIALLY in planes while tables grow only
    * linearly (+4 per doubling) — the exponential wins, and the r16
    * extended scale bench measured exactly that (beam recall 0.69 at
    * 16k vectors → 0.49 at 32k → 0.30 at 64k, through the floor).
    * The standard distributed fix is NN-descent (Dong et al., WWW'11;
    * the pynndescent/NGT build): the true k-NN graph is a fixed point
    * of "my neighbor's neighbors are my candidates", so each round
    * joins the current directed top-M with itself through the shared
    * endpoint and re-refines by exact cosine — key-equality joins
    * only, candidates ≤ n·(3m)² per round, converging in 2-3 rounds
    * from any seed with signal. Zero rounds at or below
    * [[AdaptPivot]]: gate corpora reproduce the pinned config (and
    * its unrolled oracle SQL) bit-identically; one round at 4k, two
    * at 8k, capped at [[DescentMaxRounds]] from 16k up — convergence
    * depth is a property of the graph's fixed point, not of n.
    */
  val DescentMaxRounds = 3

  private[graft] def descentRoundsFor(n: Long): Int =
    math.min(DescentMaxRounds,
      log2ceil((n + AdaptPivot - 1L) / AdaptPivot))

  /** One NN-descent pass over a directed top-M edge frame: symmetrize
    * (reverse edges capped at 2m per node — the bounded analogue of
    * NN-descent's reverse-neighbor sampling, keeping a hub's
    * candidate fan-out ≤ (3m)² instead of in-degree²), join the
    * capped adjacency with itself through the shared midpoint, union
    * the current edges, and keep the exact-cosine top-m per source.
    * Each round's output is eagerly materialized: the round frame is
    * referenced three times downstream (reverse + midpoint join +
    * union), so a lazy chain would re-execute the whole build
    * 3^rounds times (the beamSearch lesson).
    */
  private[graft] def nnDescent(base: DataFrame, knn0: DataFrame,
      m: Int, rounds: Int): DataFrame = {
    if (rounds <= 0) return knn0
    val a = base.select(col("vec_id").as("src"), col("v").as("av"),
      col("nrm").as("anrm"))
    val b = base.select(col("vec_id").as("dst"), col("v").as("bv"),
      col("nrm").as("bnrm"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cosine").desc, col("dst"))
    val rw = Window.partitionBy(col("src")).orderBy(col("dst"))
    var knn = graft.Caching.materialize(knn0)
    (1 to rounds).foreach { _ =>
      val rev = knn.select(col("dst").as("src"), col("src").as("dst"))
        .withColumn("rn", row_number().over(rw))
        .filter(col("rn") <= 2 * m).drop("rn")
      val sym = knn.unionByName(rev).distinct()
      val non = sym.select(col("src"), col("dst").as("mid"))
        .join(sym.select(col("src").as("mid"), col("dst")), Seq("mid"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
      val cands = knn.unionByName(non).distinct()
      knn = graft.Caching.materialize(
        cands.join(a, Seq("src")).join(b, Seq("dst"))
          .select(col("src"), col("dst"),
            Similarity.cosinePre(Similarity.dot(col("av"), col("bv")),
              col("anrm"), col("bnrm")).as("cosine"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= m)
          .select(col("src"), col("dst")))
    }
    knn
  }

  private[graft] def buildEdges(base: DataFrame, m: Int = M,
      nOpt: Option[Long] = None): DataFrame = {
    val n = nOpt.getOrElse(base.count())
    val knn = nnDescent(base,
      buildKnnBlocked(base, m, buildPlanesFor(n), buildTablesFor(n),
        dstCapFor(n)),
      m, descentRoundsFor(n))
    val ranked = rankedIds(base, n)
    val longe = base.select(col("vec_id").as("src"))
      .withColumn("seed",
        explode(sequence(lit(0), lit(LongLinks - 1))))
      .withColumn("r", pmod(call_function("fnv1a64",
        concat(lit("long:"), col("seed").cast("string"), lit(":"),
          col("src").cast("string"))), lit(n)))
      .join(ranked, Seq("r"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    val fwd = knn.unionByName(longe)
    fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** The EXACT M-NN build (corpus broadcast against itself) — the
    * pre-r14 [[buildEdges]], retained as the spec-side truth: the
    * blocked build's directed knn edges are measured against these in
    * GraphAnnSpec's edge-recall floor. Never on the gate path — the
    * gate builds blocked, and the gate-level recall floors
    * ([[RecallFloorIid]] / [[RecallFloorClustered]]) hold end-to-end.
    */
  private[graft] def buildEdgesExactKnn(base: DataFrame,
      m: Int = M): DataFrame = {
    val a = base.select(col("vec_id").as("src"), col("v").as("av"),
      col("nrm").as("anrm"))
    val b = base.select(col("vec_id").as("dst"), col("v").as("bv"),
      col("nrm").as("bnrm"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cosine").desc, col("dst"))
    a.join(broadcast(b), col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        Similarity.cosinePre(Similarity.dot(col("av"), col("bv")),
          col("anrm"), col("bnrm")).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= m)
      .select(col("src"), col("dst"))
  }

  /** The blocked build's directed knn half alone (no long links, no
    * symmetrization) — what GraphAnnSpec compares against
    * [[buildEdgesExactKnn]].
    */
  /** Per-(table, bucket) cap on the candidate (dst) side of the
    * blocked build, active only above [[AdaptPivot]]. The occupancy
    * bound assumes iid-ish bucket balance; adversarially clustered
    * data (a near-duplicate cluster larger than a bucket's fair
    * share lands ENTIRELY in one bucket per table — all its sign
    * patterns agree) makes candidate generation O(cluster²): the r16
    * scale sweep measured the 64k near-dup fixture's build at 96s
    * where iid took 31s. Capping the dst side at 4× the occupancy
    * target — members chosen by a deterministic fnv1a64 rank over
    * (table, bucket, id), identical in both engines — bounds the
    * join at O(n·tables·cap) for ANY skew; every node still appears
    * as src (keeps its candidate set), and NN-descent's
    * neighbor-of-neighbor rounds recover the pairs the sample
    * missed. None at gate Ns: the pinned build (and its oracle SQL)
    * stays bit-identical.
    */
  private[graft] def dstCapFor(n: Long): Option[Int] =
    if (n <= AdaptPivot) None else Some(4 * BuildBucketTarget.toInt)

  private[graft] def buildKnnBlocked(base: DataFrame,
      m: Int = M, planes: Int = BuildPlanes,
      tables: Int = BuildTables,
      dstCap: Option[Int] = None): DataFrame = {
    val dim = base.select(size(col("v"))).head().getInt(0)
    val bucketed = base.select(col("vec_id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          Similarity.lshBucket(col("v"), planes, t, dim)
            .as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl"), col("tb.bucket"))
    val dstSide = dstCap.fold(bucketed) { cap =>
      val cw = Window.partitionBy(col("tbl"), col("bucket"))
        .orderBy(col("hr"), col("vec_id"))
      bucketed
        .withColumn("hr", call_function("fnv1a64",
          concat(col("tbl").cast("string"), lit(":"),
            col("bucket").cast("string"), lit(":"),
            col("vec_id").cast("string"))))
        .withColumn("cr", row_number().over(cw))
        .filter(col("cr") <= cap)
        .select(col("vec_id"), col("tbl"), col("bucket"))
    }
    val cand = bucketed
      .join(dstSide.select(col("tbl"), col("bucket"),
        col("vec_id").as("dst")), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("dst"))
      .select(col("vec_id").as("src"), col("dst"))
      .distinct()
    val a = base.select(col("vec_id").as("src"), col("v").as("av"),
      col("nrm").as("anrm"))
    val b = base.select(col("vec_id").as("dst"), col("v").as("bv"),
      col("nrm").as("bnrm"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cosine").desc, col("dst"))
    cand.join(a, Seq("src")).join(b, Seq("dst"))
      .select(col("src"), col("dst"),
        Similarity.cosinePre(Similarity.dot(col("av"), col("bv")),
          col("anrm"), col("bnrm")).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= m)
      .select(col("src"), col("dst"))
  }

  /** The beam loop shared by serving ([[graphTopK]]) and index
    * maintenance ([[graphInsert]]): from per-probe `entries`
    * (probe_id, node), run [[Rounds]] rounds of {beam-[[Beam]] best
    * visited, expand `edges`, score against `base`, dedup}, and rank
    * the final visited set. Every step is a key-equality join; the
    * frontier (≤ probes·Beam rows) broadcasts against the edge list.
    */
  /** `resultFilter`: allowed node ids — the filtered-HNSW serving
    * shape: the beam NAVIGATES the full graph (a filter-blind frontier
    * keeps the graph navigable at any selectivity), and only allowed
    * nodes may enter the emitted top-k. A key-equality left-semi join
    * applied once, after the rounds.
    */
  private def beamSearch(base: DataFrame, edges: DataFrame,
      probes: DataFrame, entries: DataFrame, k: Int,
      beam: Int = Beam, rounds: Int = Rounds,
      resultFilter: Option[DataFrame] = None): DataFrame = {
    // (probe_id, node) → scored (probe_id, node, cosine)
    def score(cands: DataFrame): DataFrame = cands
      .join(base.select(col("vec_id").as("node"), col("v"),
        col("nrm")), Seq("node"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("node"),
        Similarity.cosinePre(Similarity.dot(col("pv"), col("v")),
          col("pnrm"), col("nrm")).as("cosine"))
    // Per-round EAGER materialization is load-bearing — the Spark twin
    // of the oracle's MATERIALIZED CTE pin: each round references its
    // predecessor twice (frontier + union), so a lazy chain re-executes
    // the whole prior plan 2^rounds times (measured ~17s → ~4s on the
    // sf0.1 gate). Round frames are probe-bounded (≤ probes ·
    // (entries + rounds·beam·degree) rows); blocks release via
    // Caching.releaseAll between queries.
    var visited = graft.Caching.materialize(score(entries))
    val bw = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("node"))
    (1 to rounds).foreach { _ =>
      val frontier = visited
        .withColumn("rn", row_number().over(bw))
        .filter(col("rn") <= beam)
        .select(col("probe_id"), col("node"))
      val cands = broadcast(
          frontier.select(col("probe_id"), col("node").as("src")))
        .join(edges, Seq("src"))
        .select(col("probe_id"), col("dst").as("node"))
        .distinct()
      visited = graft.Caching.materialize(
        visited.unionByName(score(cands)).distinct())
    }
    resultFilter.fold(visited)(a =>
        visited.join(a.select(col("node")), Seq("node"), "left_semi"))
      .filter(col("node") =!= col("probe_id"))
      .withColumn("rank", row_number().over(bw).cast("int"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"),
        col("node").as("neighbor_id"), col("cosine"))
  }

  def graphTopK(emb: DataFrame, k: Int = K): DataFrame = {
    val base = baseOf(emb)
    graft.Caching.withCached(base) {
      val n = base.count() // cached: one cheap job, reused by the build
      val edges = buildEdges(base, M, Some(n))
      graft.Caching.withCached(edges) {
        val probes = base.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("probe_id"), col("v").as("pv"),
            col("nrm").as("pnrm"))
        val entries = probes.select(col("probe_id"),
          explode(sequence(lit(0L), lit(entriesFor(n) - 1L))).as("node"))
        beamSearch(base, edges, probes, entries, k,
          beam = beamFor(n), rounds = roundsFor(n))
      }
    }
  }

  /** Measured recall@k of an already-computed [[graphTopK]] frame vs
    * the exact brute-force ranks on the same embedding frame. Takes
    * the search OUTPUT (eagerly checkpointed by withCached) rather
    * than recomputing it, so the gate's returned rows and its iid
    * recall share ONE search run.
    */
  private def recallOf(out: DataFrame, emb: DataFrame, k: Int): Double = {
    val truth = Similarity.bruteForceTopK(emb, k)
      .select(col("probe_id"), col("neighbor_id"))
    // one job: intersect().count() + truth.count() re-executed the
    // exact brute-force subtree twice (r17, guide §1.2)
    val (hits, total) = graft.Dist.hitsAndTotal(
      out.select(col("probe_id"), col("neighbor_id")), truth)
    if (total == 0) 1.0 else hits.toDouble / total
  }

  /** [[graphTopK]] plus the in-gate recall honesty checks on BOTH
    * embedding regimes (the ann_recall_bounds discipline): iid — the
    * navigability worst case — against [[RecallFloorIid]], and the
    * mixture-of-centers clustered fixture — the regime neighbor graphs
    * exist for, where the long links must carry the beam ACROSS
    * clusters — against [[RecallFloorClustered]]. Candidate collapse
    * (a disconnected graph, a broken expansion join) cannot ship as a
    * quietly-wrong-but-plausible neighbor list.
    */
  /** Once-per-corpus memo of the clustered-regime recall — the
    * dedup_clusters stored-artifact discipline applied to the honesty
    * fixture (r14 verdict task 7): the clustered fixture is a PURE
    * function of the corpus (deterministic mixture-of-centers), so its
    * build + search + exact truth measure the same number every run;
    * the first run per corpus key measures it, later runs in the same
    * process REUSE the cached measurement (no re-measurement — the
    * floor check on a repeat run is against the first run's number;
    * a fresh-JVM run, i.e. every driver gate run, always measures).
    * The gate's emitted
    * rows and the iid floor always come from a fresh search over the
    * REAL corpus — only the fixture's re-measurement is shared.
    */
  private val clusteredRecallStore =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def graphTopKGate(emb: DataFrame,
      corpusKey: Option[String] = None): DataFrame = {
    val out = graphTopK(emb, K)
    val iid = recallOf(out, emb, K)
    def measureClustered(): Double = {
      val fx = Similarity.clusteredFixture(emb)
      recallOf(graphTopK(fx, K), fx, K)
    }
    val clustered = corpusKey match {
      case Some(k) => clusteredRecallStore
        .computeIfAbsent(k, _ => measureClustered()).doubleValue()
      case None => measureClustered()
    }
    System.err.println(f"[ann_graph_topk] recall@$K iid=$iid%.3f " +
      f"(floor $RecallFloorIid) clustered=$clustered%.3f " +
      f"(floor $RecallFloorClustered)")
    require(iid >= RecallFloorIid,
      f"graph-ANN iid recall@$K $iid%.3f under floor $RecallFloorIid")
    require(clustered >= RecallFloorClustered,
      f"graph-ANN clustered recall@$K $clustered%.3f under floor " +
        f"$RecallFloorClustered")
    out
  }

  /** Recall floor for the FILTERED graph search vs the exact filtered
    * truth. Pinned under the min measured across sf0.001/0.01/0.1 with
    * margin; measured values print in-gate. Filtering costs recall vs
    * the unfiltered search only through allowed-set thinning of the
    * visited set, so the iid floor carries.
    */
  val FilteredRecallFloor = 0.4

  /** FILTERED graph search — the production serving composition
    * (metadata predicate × graph index, the filtered-HNSW shape;
    * `ann_filtered_topk`'s pre-filter strategy is the exact-scan twin):
    * the beam navigates the FULL graph — filter-blind navigation keeps
    * the index navigable at any predicate selectivity — and the
    * metadata filter gates only which visited nodes may enter the
    * emitted top-k (one key-equality semi join after the rounds).
    * The filter rule is shared with ann_filtered_topk: allowed =
    * documents with `lang = 'en'`, ids joined to vec_id.
    */
  def graphTopKFiltered(docs: DataFrame, emb: DataFrame,
      lang: String = "en", k: Int = K): DataFrame = {
    val allowed = docs.filter(col("lang") === lang)
      .select(col("doc_id").as("node"))
    val base = baseOf(emb)
    graft.Caching.withCached(base) {
      val n = base.count()
      val edges = buildEdges(base, M, Some(n))
      graft.Caching.withCached(edges) {
        val probes = base.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("probe_id"), col("v").as("pv"),
            col("nrm").as("pnrm"))
        val entries = probes.select(col("probe_id"),
          explode(sequence(lit(0L), lit(entriesFor(n) - 1L))).as("node"))
        beamSearch(base, edges, probes, entries, k,
          beam = beamFor(n), rounds = roundsFor(n),
          resultFilter = Some(allowed))
      }
    }
  }

  /** [[graphTopKFiltered]] plus the in-gate recall honesty check vs
    * the EXACT filtered truth (allowed-only brute force — the
    * ann_filtered_topk rule, so the truth itself is oracle-licensed).
    */
  def graphTopKFilteredGate(docs: DataFrame, emb: DataFrame): DataFrame = {
    val out = graphTopKFiltered(docs, emb)
    val truth = graft.operators.Retrieval.filteredTopK(docs, emb)
      .select(col("probe_id"), col("neighbor_id"))
    // one job instead of two executions of the exact filtered truth
    val (hits, total) = graft.Dist.hitsAndTotal(
      out.select(col("probe_id"), col("neighbor_id")), truth)
    val recall = if (total == 0) 1.0 else hits.toDouble / total
    System.err.println(f"[ann_graph_filtered] filtered recall@$K=" +
      f"$recall%.3f ($hits/$total) floor=$FilteredRecallFloor")
    require(recall >= FilteredRecallFloor,
      f"filtered graph recall@$K $recall%.3f under floor " +
        f"$FilteredRecallFloor")
    out
  }

  /** Deterministic old/new split for the maintenance gate: vec_id ≡ 3
    * (mod 5) plays the newly-arrived 20% batch (the
    * dedup_incremental bucket convention).
    */
  val BatchMod = 5L
  val BatchRem = 3L

  /** Wiring-quality floor for [[graphInsert]]: fraction of the M new
    * edges that are true M-NN of their node over the old corpus.
    * Pinned under the min measured across sf0.001/0.01/0.1 with
    * margin; measured values print in-gate.
    */
  val InsertRecallFloor = 0.4

  /** INCREMENTAL index maintenance — the HNSW insert path, which is
    * why graph indexes win at serving time: adding a batch does NOT
    * rebuild the graph. Each new vector beam-searches the STORED old
    * graph (the same [[beamSearch]] serving runs, probes = the batch)
    * and wires itself to the top-[[M]] of its visited set; reverse
    * edges and degree compaction are the background-merge half of the
    * contract (same split as the lake's MOR story). Cost is
    * O(batch · rounds·beam·degree) — never O(corpus), never a rebuild.
    *
    * Emits the wiring itself: (new_id, rank, neighbor_id, cosine), M
    * rows per batch vector. In-gate honesty: wiring recall vs the
    * exact M-NN of each batch vector over the old corpus is asserted
    * against [[InsertRecallFloor]] — a beam that stops navigating
    * cannot ship plausible-but-wrong adjacency.
    */
  def graphInsert(emb: DataFrame, m: Int = M): DataFrame = {
    val old = emb.filter(pmod(col("vec_id"), lit(BatchMod)) =!= BatchRem)
    val batch = emb.filter(pmod(col("vec_id"), lit(BatchMod)) === BatchRem)
    val base = baseOf(old)
    graft.Caching.withCached(base) {
      val n = base.count()
      val edges = buildEdges(base, M, Some(n))
      graft.Caching.withCached(edges) {
        val probes = baseOf(batch)
          .select(col("vec_id").as("probe_id"), col("v").as("pv"),
            col("nrm").as("pnrm"))
        // entry points = first Entries ids OF THE OLD CORPUS (the
        // fixed-id rule could land on batch members); kilobyte-scale
        // driver state, like IVF's centroids
        val entryIds = base.select(col("vec_id"))
          .orderBy(col("vec_id")).limit(Entries)
          .collect().map(_.getLong(0))
        val entries = probes.select(col("probe_id"))
          .withColumn("node", explode(lit(entryIds)))
        // insert searches twice as wide as serving (InsertBeam =
        // 2·Beam at gate scale), and the factor rides the adaptive law
        beamSearch(base, edges, probes, entries, m, 2 * beamFor(n),
          rounds = roundsFor(n))
          .withColumnRenamed("probe_id", "new_id")
      }
    }
  }

  /** [[graphInsert]] plus the in-gate wiring-recall check. */
  def graphInsertGate(emb: DataFrame): DataFrame = {
    val out = graphInsert(emb)
    // exact M-NN truth of each batch vector over the old corpus —
    // batch broadcast against the old side, the bruteforce license
    val old = baseOf(
      emb.filter(pmod(col("vec_id"), lit(BatchMod)) =!= BatchRem))
    val batch = baseOf(
      emb.filter(pmod(col("vec_id"), lit(BatchMod)) === BatchRem))
      .select(col("vec_id").as("new_id"), col("v").as("pv"),
        col("nrm").as("pnrm"))
    val w = Window.partitionBy(col("new_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val truth = old.join(broadcast(batch), col("vec_id") =!= col("new_id"))
      .select(col("new_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosinePre(Similarity.dot(col("pv"), col("v")),
          col("pnrm"), col("nrm")).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= M)
      .select(col("new_id"), col("neighbor_id"))
    // one job instead of two executions of the exact M-NN truth
    val (hits, total) = graft.Dist.hitsAndTotal(
      out.select(col("new_id"), col("neighbor_id")), truth)
    val recall = if (total == 0) 1.0 else hits.toDouble / total
    System.err.println(f"[ann_graph_incremental] wiring recall@$M=" +
      f"$recall%.3f ($hits/$total) floor=$InsertRecallFloor")
    require(recall >= InsertRecallFloor,
      f"graph insert wiring recall@$M $recall%.3f under floor " +
        f"$InsertRecallFloor")
    out
  }

  /** Full DuckDB oracle: the LSH-blocked knn build (sign-bucket CTEs
    * shared with [[Similarity.signBucketCtesSql]] so the two engines'
    * bucket rules cannot drift), then the [[Rounds]] beam rounds
    * unrolled as CTE blocks (frontier → expand → score → dedup),
    * exactly the kmeans-unroll discipline of [[Ivf.kmeansCtesSql]].
    * Norms fold once in `nv` so the candidate refinement pays one dot
    * per pair, not three. Every CTE is pinned MATERIALIZED: each round
    * references its predecessor twice (frontier + union), so inlined
    * CTEs re-evaluate the whole chain 2^rounds times — with the knn
    * build at the bottom, that took the sf0.1 oracle from 7s
    * (materialized) past 300s.
    */
  private def oracleCos(p: String, n: String): String =
    s"list_dot_product($p.pv, $n.v) / ($p.pnrm * $n.nrm)"

  /** Shared oracle text — corpus (vec/nv) + graph build
    * (knn/long-links/edges), the corpus filtered by `vecWhere`
    * (serving: the whole table; maintenance: the old split).
    */
  private def oracleBuildCtes(vecWhere: String): String =
    s"""${Similarity.signBucketCtesSql(BuildPlanes, BuildTables, vecWhere)},
       nv AS (
         SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM vec),
       cand AS (
         SELECT DISTINCT ba.vec_id AS src, bb.vec_id AS dst
         FROM buckets ba JOIN buckets bb
           ON ba.tbl = bb.tbl AND ba.bucket = bb.bucket
         WHERE ba.vec_id <> bb.vec_id),
       knn AS (
         SELECT src, dst FROM (
           SELECT c.src, c.dst,
             row_number() OVER (PARTITION BY c.src ORDER BY
               list_dot_product(a.v, b.v) / (a.nrm * b.nrm) DESC,
               c.dst) AS rn
           FROM cand c
           JOIN nv a ON a.vec_id = c.src
           JOIN nv b ON b.vec_id = c.dst)
         WHERE rn <= $M),
       rankedv AS (
         SELECT vec_id AS dst, row_number() OVER (ORDER BY vec_id) - 1 AS r
         FROM vec),
       nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vec),
       longh AS (
         -- the FNV fold lands in a PROJECTED column so the longe join
         -- below is a plain equi-join on r; folding inside the join
         -- condition degrades to a nested-loop join that re-evaluates
         -- the fold per candidate pair (measured 30x on the full gate)
         SELECT v.vec_id AS src,
           ((${OracleFnv.ofText(
              "'long:' || CAST(s.seed AS VARCHAR) || ':' || CAST(v.vec_id AS VARCHAR)")}
             % (SELECT n FROM nn)) + (SELECT n FROM nn))
             % (SELECT n FROM nn) AS r
         FROM vec v CROSS JOIN unnest(range(0, $LongLinks)) AS s(seed)),
       longe AS (
         SELECT h.src, rk.dst FROM longh h JOIN rankedv rk USING (r)
         WHERE h.src <> rk.dst),
       fwd AS (
         SELECT src, dst FROM knn UNION ALL SELECT src, dst FROM longe),
       edges AS (
         SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM fwd
           UNION ALL SELECT dst AS src, src AS dst FROM fwd))"""

  /** Shared oracle text — the [[Rounds]] beam rounds unrolled (frontier
    * → expand → score → dedup); splices after a `probes` and `v0` CTE.
    */
  private def oracleRoundCtes(beam: Int): String = (1 to Rounds).map { i =>
    s"""f$i AS (
         SELECT probe_id, node FROM (
           SELECT probe_id, node, row_number() OVER (PARTITION BY probe_id
             ORDER BY cosine DESC, node) AS rn
           FROM v${i - 1})
         WHERE rn <= $beam),
       c$i AS (
         SELECT DISTINCT f.probe_id, e.dst AS node
         FROM f$i f JOIN edges e ON e.src = f.node),
       s$i AS (
         SELECT c.probe_id, c.node, ${oracleCos("p", "n")} AS cosine
         FROM c$i c
         JOIN probes p USING (probe_id)
         JOIN nv n ON n.vec_id = c.node),
       v$i AS (
         SELECT DISTINCT probe_id, node, cosine FROM (
           SELECT * FROM v${i - 1} UNION ALL SELECT * FROM s$i))"""
  }.mkString(",\n       ")

  val graphTopKSql: String =
    s"""WITH ${oracleBuildCtes("")},
       probes AS (
         SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm
         FROM nv WHERE vec_id % 50 = 0),
       v0 AS (
         SELECT p.probe_id, n.vec_id AS node, ${oracleCos("p", "n")} AS cosine
         FROM probes p JOIN nv n ON n.vec_id < $Entries),
       ${oracleRoundCtes(Beam)}
       SELECT probe_id,
         CAST(row_number() OVER (PARTITION BY probe_id
           ORDER BY cosine DESC, node) AS INT) AS rank,
         node AS neighbor_id, cosine
       FROM v$Rounds
       WHERE node <> probe_id
       QUALIFY rank <= $K
       ORDER BY probe_id, rank"""
      .replace(" AS (", " AS MATERIALIZED (")

  /** Filtered-search oracle: the identical build + beam rounds, the
    * allowed set joined only into the FINAL rank — mirroring the
    * engine's filter-blind navigation exactly.
    */
  val graphTopKFilteredSql: String =
    s"""WITH ${oracleBuildCtes("")},
       fallowed AS (
         SELECT doc_id AS vec_id FROM documents WHERE lang = 'en'),
       probes AS (
         SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm
         FROM nv WHERE vec_id % 50 = 0),
       v0 AS (
         SELECT p.probe_id, n.vec_id AS node, ${oracleCos("p", "n")} AS cosine
         FROM probes p JOIN nv n ON n.vec_id < $Entries),
       ${oracleRoundCtes(Beam)}
       SELECT probe_id,
         CAST(row_number() OVER (PARTITION BY probe_id
           ORDER BY cosine DESC, node) AS INT) AS rank,
         node AS neighbor_id, cosine
       FROM v$Rounds
       JOIN fallowed f ON f.vec_id = v$Rounds.node
       WHERE node <> probe_id
       QUALIFY rank <= $K
       ORDER BY probe_id, rank"""
      .replace(" AS (", " AS MATERIALIZED (")

  val graphInsertSql: String =
    s"""WITH ${oracleBuildCtes(s" WHERE vec_id % $BatchMod <> $BatchRem")},
       bvec AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         FROM embeddings WHERE vec_id % $BatchMod = $BatchRem),
       probes AS (
         SELECT vec_id AS probe_id, v AS pv,
           sqrt(list_dot_product(v, v)) AS pnrm
         FROM bvec),
       v0 AS (
         SELECT p.probe_id, n.vec_id AS node, ${oracleCos("p", "n")} AS cosine
         FROM probes p CROSS JOIN (
           SELECT vec_id, v, nrm FROM nv ORDER BY vec_id LIMIT $Entries) n),
       ${oracleRoundCtes(InsertBeam)}
       SELECT probe_id AS new_id,
         CAST(row_number() OVER (PARTITION BY probe_id
           ORDER BY cosine DESC, node) AS INT) AS rank,
         node AS neighbor_id, cosine
       FROM v$Rounds
       QUALIFY rank <= $M
       ORDER BY new_id, rank"""
      .replace(" AS (", " AS MATERIALIZED (")

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String)
      => DataFrame] = Map(
    "ann_graph_topk" -> ((s, d) =>
      graphTopKGate(Tables.embeddings(s, d), Some(d))
        .orderBy(col("probe_id"), col("rank"))),
    "ann_graph_incremental" -> ((s, d) =>
      graphInsertGate(Tables.embeddings(s, d))
        .orderBy(col("new_id"), col("rank"))),
    "ann_graph_filtered" -> ((s, d) =>
      graphTopKFilteredGate(Tables.documents(s, d),
          Tables.embeddings(s, d))
        .orderBy(col("probe_id"), col("rank"))))

  def oracles: Map[String, String] = Map(
    "ann_graph_topk" -> graphTopKSql,
    "ann_graph_incremental" -> graphInsertSql,
    "ann_graph_filtered" -> graphTopKFilteredSql)
}
