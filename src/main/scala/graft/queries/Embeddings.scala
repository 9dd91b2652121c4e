package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Similarity search over the `embeddings` table (driver north-star):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path.
  *
  * Scale notes: e1 is the exact O(|Q|·|V|) scan — correct baseline, and at
  * 100 TB it is what you run per-bucket, not globally. The query side is
  * broadcast (small by construction); the big side streams — no shuffle of
  * the vector corpus at all, and the per-query top-k is a bounded-size
  * window after a (q_id)-keyed shuffle of |Q|·k candidate rows only after
  * local pre-pruning. e2 buckets vectors by hyperplane sign bits so each
  * query compares against a Hamming-ball of buckets — the IVF/LSH ANN
  * pattern (8 sign bits here, more at scale); buckets are joinable keys,
  * skew-safe (cap or salt hot buckets).
  * Dot products run in double with sequential folds, bit-identical to the
  * DuckDB oracle's list_sum.
  */
object Embeddings extends QueryGroup {

  /** Sequential double dot product — the native codegen `vec_dot`
    * expression (functions/VecDot.scala): same left-to-right fold as the
    * `aggregate(zip_with(...))` formulation and DuckDB's `list_sum`
    * (bit-identical), but compiled to a primitive loop inside whole-stage
    * codegen instead of per-element lambda interpretation. */
  private[graft] def dot(a: Column, b: Column): Column =
    graft.functions.VecDot.dotCol(a, b)

  private[graft] def norm(a: Column): Column = sqrt(dot(a, a))

  private val sqlDot =
    "list_sum(list_transform(range(1, len(%s)+1), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)))"
  private[graft] def sqlDotOf(a: String, b: String) = sqlDot.format(a, a, b)

  private val LshBits = 8

  /** e2 probes all buckets within this Hamming distance of the query's
    * bucket. (bits=8, radius=4) measured recall@5 = 0.889 at sf0.01 vs
    * (6, 2)'s 0.578 — the sweep also showed (6,3) 0.867, (7,3) 0.733,
    * (8,3) 0.578: at a fixed candidate budget, MORE bits + wider probe
    * beats fewer bits because the finer buckets concentrate true
    * neighbors in the low-Hamming shells. */
  private val ProbeRadius = 4

  /** Embedding dimensionality, baked into e2's literal hyperplanes. If the
    * table's actual dimension differed, vec_dot would return null on the
    * mismatch and every projection sign would read false — EmbeddingsSpec
    * asserts the data matches this constant so that failure is explicit. */
  val EmbDim = 64

  /** e2's fixed ±1 hyperplane weights — parity of the shared portable hash
    * of "p:i" (TextFunctions.portableHash60), computed at plan-build time
    * and embedded as LITERAL arrays in both the Spark plan and the DuckDB
    * oracle (the weights depend only on (plane, dim), so hashing per row
    * would be waste). */
  private def planeWeights(p: Int): Seq[Double] =
    (0 until EmbDim).map { i =>
      if (graft.functions.TextFunctions.portableHash60(s"$p:$i") % 2 == 0) 1.0 else -1.0
    }

  /** Hard ceiling on the √N centroid/codebook sample: beyond ~65k
    * vectors the sample stops growing, capping d8/e4 assignment at
    * N·256 and e5's encode at N·16·256 — strictly LINEAR in the corpus
    * (k=256 per subspace is the standard production PQ codebook sizing;
    * past the cap, recall is bought with probes/shortlist depth or
    * two-level assignment, not centroid count). Below the cap the √N
    * rule keeps recall honest on small corpora. Mirrored literally in
    * [[sqlCentStats]]. */
  private[graft] val MaxCentroids = 256L

  /** Deterministic min(√N, [[MaxCentroids]]) centroid/codebook sample
    * for d8/e4/e5: admit vec_ids with
    * pmod(portableHash(vec_id), n_vecs) < k_cent, where
    * k_cent = min(ceil(√n_vecs), MaxCentroids). Unlike the previous
    * `vec_id % 20` rule (sample grows linearly with the corpus), the
    * admitted count tracks √N and then CAPS — at 100 TB the codebook is
    * bounded and every sampling consumer is linear in the corpus
    * (SCALE.md's measured-exponents section: e5's 1.08 tail is the √N
    * term this cap removes at scale). The (n_vecs, k_cent) scalars ride
    * in as a broadcast 1-row aggregate computed from `counted` (one row
    * per vector) — no driver-side count(), no collect. `df` is the
    * frame to gate (may be multi-row per vec_id, e.g. e5's subspace
    * slices). Deterministic under any partitioning; the DuckDB oracle
    * applies [[sqlCentGate]], the exact same rule.
    *
    * `seed` distinguishes INDEPENDENT samples of the same size: the
    * default 'cent:' set doubles as IVF centroids and the raw-PQ
    * codebook; the residual-PQ codebook (IvfIndex v5) MUST train on a
    * different sample ('pq:'), because every 'cent:' vector's residual
    * is identically zero — its nearest centroid is itself — and a
    * codebook of zero vectors cannot rank anything. */
  private[graft] def sqrtSample(df: org.apache.spark.sql.DataFrame,
      counted: org.apache.spark.sql.DataFrame,
      seed: String = "cent:"): org.apache.spark.sql.DataFrame =
    df.crossJoin(broadcast(counted
        .agg(count(lit(1)).as("n_vecs"))
        .select(col("n_vecs"),
          least(ceil(sqrt(col("n_vecs"))).cast("long"),
            lit(MaxCentroids)).as("k_cent"))))
      .filter(pmod(graft.functions.TextFunctions.portableHash(
        col("vec_id").cast("string"), seed), col("n_vecs")) < col("k_cent"))
      .drop("n_vecs", "k_cent")

  /** DuckDB twin of [[sqrtSample]]'s admission predicate; pair with
    * [[sqlCentStats]] in the FROM clause. */
  private[graft] val sqlCentGate =
    "(CAST(concat('0x', substr(md5(concat('cent:', CAST(vec_id AS VARCHAR))),1,15)) AS BIGINT) % n_vecs) < k_cent"

  /** The 'pq:'-seeded twin of [[sqlCentGate]] — the residual-PQ
    * codebook's training sample (disjoint seed, same size law). */
  private[graft] val sqlPqGate =
    "(CAST(concat('0x', substr(md5(concat('pq:', CAST(vec_id AS VARCHAR))),1,15)) AS BIGINT) % n_vecs) < k_cent"

  /** DuckDB twin of the broadcast (n_vecs, k_cent) stats row. */
  private[graft] val sqlCentStats =
    s"(SELECT count(*) AS n_vecs, least(CAST(ceil(sqrt(count(*))) AS BIGINT), $MaxCentroids) AS k_cent FROM embeddings) stats"

  /** e4's IVF candidate stage, factored out so t30's hybrid retrieval
    * runs the SAME index definition (sqrtSample centroids, lowest-id tie
    * assignment, 8-probe search, exact re-scoring) instead of a drifting
    * copy. Input: `vn(vec_id, ne)` normalized corpus, `q(q_id, q_ne)`
    * normalized queries. Output: (q_id, vec_id, cos) — exact cosines
    * over the vectors of the probed cells, the query itself excluded,
    * null/NaN screened (NaN would top Double.compare).
    *
    * Scale: the centroid table is the min(√N, [[MaxCentroids]]) sample,
    * broadcast twice (assignment, probe selection); the one corpus-sized
    * shuffle is the probes⋈assign cell join, keyed on cid — cost follows
    * the probed cells, not the corpus. */
  private[graft] def ivfCandidates(vn: org.apache.spark.sql.DataFrame,
      q: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // the index DEFINITIONS (centroid sample, lowest-cid-tie assignment,
    // probe selection) live in ops/IvfIndex — ONE definition shared by
    // this live path and the e14 persisted index, never a drifting copy
    val cents = graft.ops.IvfIndex.centroidsOf(vn)
    val assign = graft.ops.IvfIndex.assignCells(vn, cents)
    val probes = graft.ops.IvfIndex.probeSelect(q, cents, nProbe = graft.ops.IvfIndex.NProbe)
    probes
      .join(assign, "cid")
      .filter(col("vec_id") =!= col("q_id"))
      .join(q, "q_id")
      .join(vn.select(col("vec_id"), col("ne")), "vec_id")
      .select(col("q_id"), col("vec_id"),
        call_function("vec_dot", col("q_ne"), col("ne")).as("cos"))
      // null/NaN scores rank nowhere (NaN would top Double.compare)
      .filter(col("cos").isNotNull && !isnan(col("cos")))
  }

  /** The index-build CTE prefix (`n` normalized corpus → `c` centroids →
    * `avb`/`assign` cell assignment) — ONE text composed by EVERY IVF
    * oracle (e4/e14/t30 via [[sqlIvfScored]], e15's two-level chain), so
    * a change to the shared index definition cannot drift between them. */
  /** The normalized-corpus CTE every embedding oracle opens with. */
  private[graft] val sqlNormCte: String = s"""n AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(${sqlDotOf("embedding", "embedding")})) AS ne
          FROM embeddings)"""

  private[graft] val sqlIvfIndexCtes: String = s"""$sqlNormCte,
        c AS (SELECT vec_id AS cid, ne AS ce FROM n, $sqlCentStats WHERE $sqlCentGate),
        avb AS (
          SELECT n.vec_id, c.cid,
                 list_sum(list_transform(range(1, len(ne)+1), i -> ne[i] * ce[i])) AS cos
          FROM n CROSS JOIN c),
        assign AS (
          SELECT vec_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rnk
            FROM avb) WHERE rnk = 1)"""

  /** Shared exact-rescore CTE: probed cells' vectors, query excluded —
    * expects `probes(q_id, cid)`, `assign`, `q`, `n` in scope. */
  private[graft] val sqlIvfScoredCte: String = """scored AS (
          SELECT p.q_id, a.vec_id,
                 list_sum(list_transform(range(1, len(q.qe)+1), i -> q.qe[i] * n.ne[i])) AS cos
          FROM probes p
          JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.q_id
          JOIN q ON q.q_id = p.q_id
          JOIN n ON n.vec_id = a.vec_id)"""

  /** Shared top-5 tail over `scored`. */
  private[graft] val sqlScoredTop5Tail: String = """
        SELECT q_id, vec_id, floor(cos * 1000000) / 1000000.0 AS score, rn
        FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
              FROM scored)
        WHERE rn <= 5"""

  /** The shared index prefix → `q` (caller-supplied body, must yield
    * (q_id, qe); may reference `n`) → `qc`/`probes` (8-probe): everything
    * up to the probed-cell set, shared by the exact rescore
    * ([[sqlIvfScored]]) and the ADC serve (e16's oracle). */
  private[graft] def sqlIvfProbes(qCteBody: String): String = s"""$sqlIvfIndexCtes,
        q AS ($qCteBody),
        qc AS (
          SELECT q.q_id, c.cid,
                 list_sum(list_transform(range(1, len(qe)+1), i -> qe[i] * ce[i])) AS cos
          FROM q CROSS JOIN c),
        probes AS (
          SELECT q_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cid ASC) AS rnk
            FROM qc) WHERE rnk <= ${graft.ops.IvfIndex.NProbe})"""

  /** DuckDB twin of [[ivfCandidates]]: [[sqlIvfProbes]] →
    * `scored(q_id, vec_id, cos)`. ONE oracle text for e4, e14, and t30. */
  private[graft] def sqlIvfScored(qCteBody: String): String =
    s"""${sqlIvfProbes(qCteBody)},
        $sqlIvfScoredCte"""

  /** e4's full oracle — also e14's verbatim: the persisted-index probe
    * must reproduce the live IVF result bit-for-bit. */
  private[graft] val sqlIvfTop5: String = s"""
        WITH ${sqlIvfScored("SELECT vec_id AS q_id, ne AS qe FROM n WHERE vec_id % 10 = 0")}
        $sqlScoredTop5Tail"""

  /** e15's oracle: the TWO-LEVEL probe chain — the same index build
    * (n/c/avb/assign) as [[sqlIvfScored]], plus the coarse level over the
    * centroid set (hash-gate sample under the 'coarse:' seed, mirroring
    * IvfIndex.coarseOf), the centroid→group argmax, the query's
    * top-[[graft.ops.IvfIndex.NCoarseProbe]] groups, and probe selection
    * restricted to the probed groups' member centroids. Every argmax
    * ties to the lowest id, as everywhere. */
  private[graft] val sqlIvfTwoLevelTop5: String = {
    val nCoarse = graft.ops.IvfIndex.NCoarseProbe
    val maxCoarse = graft.ops.IvfIndex.MaxCoarse
    val nProbe = graft.ops.IvfIndex.NProbe
    s"""
        WITH $sqlIvfIndexCtes,
        cstats AS (SELECT count(*) AS n_cent,
                          least(CAST(ceil(sqrt(count(*))) AS BIGINT), $maxCoarse) AS k_coarse
                   FROM c),
        g AS (SELECT cid AS gid, ce AS ge FROM c, cstats
              WHERE (CAST(concat('0x', substr(md5(concat('coarse:', CAST(cid AS VARCHAR))),1,15)) AS BIGINT)
                     % n_cent) < k_coarse),
        cgs AS (
          SELECT c.cid, g.gid,
                 list_sum(list_transform(range(1, len(ce)+1), i -> ce[i] * ge[i])) AS cos
          FROM c CROSS JOIN g),
        cg AS (
          SELECT cid, gid FROM (
            SELECT *, row_number() OVER (PARTITION BY cid ORDER BY cos DESC, gid ASC) AS rnk
            FROM cgs) WHERE rnk = 1),
        q AS (SELECT vec_id AS q_id, ne AS qe FROM n WHERE vec_id % 10 = 0),
        qgs AS (
          SELECT q.q_id, g.gid,
                 list_sum(list_transform(range(1, len(qe)+1), i -> qe[i] * ge[i])) AS cos
          FROM q CROSS JOIN g),
        qg AS (
          SELECT q_id, gid FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, gid ASC) AS rnk
            FROM qgs) WHERE rnk <= $nCoarse),
        qc AS (
          SELECT qg.q_id, cg.cid,
                 list_sum(list_transform(range(1, len(q.qe)+1), i -> q.qe[i] * c.ce[i])) AS cos
          FROM qg JOIN cg USING (gid)
          JOIN c ON c.cid = cg.cid
          JOIN q ON q.q_id = qg.q_id),
        probes AS (
          SELECT q_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cid ASC) AS rnk
            FROM qc) WHERE rnk <= $nProbe),
        $sqlIvfScoredCte
        $sqlScoredTop5Tail"""
  }

  /** Shared PQ oracle CTEs (require `n` in scope): subspace slices →
    * codebook (`cent` — the same 'cent:' hash-gate sample as the IVF
    * centroids, so one sampled id set serves both roles) → per-vector
    * codes → per-query ADC LUTs (queries = vec_id % 10 = 0, the shared
    * query set). Mirrors IvfIndex.subspacesOf / codebookOf / encodeCodes /
    * queryLut over RAW subvectors — e5's IndexPQ oracle (no cell, no
    * residual); the persisted IVFPQ side quantizes residuals instead
    * ([[sqlResidualPqCtes]], same machinery over r = ne − ce). */
  private[graft] val sqlPqCtes: String = s"""sub AS (
          SELECT vec_id, s, ne[(s-1)*4+1:s*4] AS sv
          FROM n, unnest(range(1, 17)) AS t(s)),
        cent AS (
          SELECT s, dense_rank() OVER (PARTITION BY s ORDER BY vec_id) AS rnk, sv AS cv
          FROM sub, $sqlCentStats WHERE $sqlCentGate),
        enc AS (
          SELECT sub.vec_id, sub.s, cent.rnk,
                 list_sum(list_transform(range(1, 5),
                   i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) AS d2
          FROM sub JOIN cent ON sub.s = cent.s),
        code1 AS (
          SELECT vec_id, s, rnk FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, rnk ASC) AS rn
            FROM enc) WHERE rn = 1),
        codes AS (SELECT vec_id, list(rnk ORDER BY s) AS cds FROM code1 GROUP BY vec_id),
        lut0 AS (
          SELECT sub.vec_id AS q_id, sub.s, cent.rnk,
                 list_sum(list_transform(range(1, 5), i -> sv[i] * cv[i])) AS dp
          FROM sub JOIN cent ON sub.s = cent.s
          WHERE sub.vec_id % 10 = 0),
        lut1 AS (SELECT q_id, s, list(dp ORDER BY rnk) AS dps FROM lut0 GROUP BY q_id, s),
        lut AS (SELECT q_id, list(dps ORDER BY s) AS l FROM lut1 GROUP BY q_id)"""

  /** Shared PQ serving tail (requires `n` + the caller's ADC scoring body
    * yielding (q_id, vec_id, adc)): top-[[graft.ops.IvfIndex.PqShortlist]]
    * ADC shortlist → exact re-rank from full-precision vectors → top-5. */
  private[graft] def sqlPqServe(adcsBody: String): String = s"""adcs AS ($adcsBody),
        short AS (
          SELECT q_id, vec_id FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id ASC) AS rn
            FROM adcs) WHERE rn <= ${graft.ops.IvfIndex.PqShortlist}),
        rerank AS (
          SELECT sh.q_id, sh.vec_id,
                 list_sum(list_transform(range(1, 65), i -> a.ne[i] * b.ne[i])) AS cos
          FROM short sh
          JOIN n a ON a.vec_id = sh.q_id
          JOIN n b ON b.vec_id = sh.vec_id)
        SELECT q_id, vec_id, floor(cos * 1000000) / 1000000.0 AS score, rn
        FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
              FROM rerank)
        WHERE rn <= 5"""

  /** The RESIDUAL-PQ CTEs (FAISS IndexIVFPQ by_residual — what the
    * persisted index stores): residual r = ne − ce(assigned cid) per
    * vector, subspace slices of r, the codebook trained on the residual
    * slices of the 'pq:'-gated sample (NOT 'cent:' — those ids are the
    * centroids, whose residuals are zero), per-vector codes, and
    * per-query LUTs over RAW query slices (the centroid term is added
    * back in the ADC body, not baked into the LUT). Requires `n`, `c`,
    * `assign`, `q` in scope — mirrors IvfIndex.residualsOf/subspacesOf/
    * codebookOf/encodeCodes/queryLut. */
  private[graft] val sqlResidualPqCtes: String = s"""r AS (
          SELECT a.vec_id,
                 list_transform(range(1, len(n.ne)+1), i -> n.ne[i] - c.ce[i]) AS rne
          FROM assign a JOIN n ON n.vec_id = a.vec_id JOIN c ON c.cid = a.cid),
        rsub AS (
          SELECT vec_id, s, rne[(s-1)*4+1:s*4] AS sv
          FROM r, unnest(range(1, 17)) AS t(s)),
        rcent AS (
          SELECT s, dense_rank() OVER (PARTITION BY s ORDER BY vec_id) AS rnk, sv AS cv
          FROM rsub, $sqlCentStats WHERE $sqlPqGate),
        renc AS (
          SELECT rsub.vec_id, rsub.s, rcent.rnk,
                 list_sum(list_transform(range(1, 5),
                   i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) AS d2
          FROM rsub JOIN rcent ON rsub.s = rcent.s),
        rcode1 AS (
          SELECT vec_id, s, rnk FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, rnk ASC) AS rn
            FROM renc) WHERE rn = 1),
        rcodes AS (SELECT vec_id, list(rnk ORDER BY s) AS cds FROM rcode1 GROUP BY vec_id),
        qrsub AS (
          SELECT q_id, s, qe[(s-1)*4+1:s*4] AS qv
          FROM q, unnest(range(1, 17)) AS t(s)),
        rlut0 AS (
          SELECT qrsub.q_id, qrsub.s, rcent.rnk,
                 list_sum(list_transform(range(1, 5), i -> qv[i] * cv[i])) AS dp
          FROM qrsub JOIN rcent ON qrsub.s = rcent.s),
        rlut1 AS (SELECT q_id, s, list(dp ORDER BY rnk) AS dps FROM rlut0 GROUP BY q_id, s),
        rlut AS (SELECT q_id, list(dps ORDER BY s) AS l FROM rlut1 GROUP BY q_id)"""

  /** e16's oracle: the IVFPQ serve — the shared IVF probe selection
    * ([[sqlIvfProbes]], e4/e14's text verbatim), RESIDUAL ADC restricted
    * to the probed cells' members (the probed centroid's query dot —
    * `qc.cos`, already computed by probe selection — added back per the
    * by_residual reconstruction), then the shared shortlist →
    * exact-re-rank tail. */
  private[graft] val sqlIvfPqTop5: String = s"""
        WITH ${sqlIvfProbes("SELECT vec_id AS q_id, ne AS qe FROM n WHERE vec_id % 10 = 0")},
        $sqlResidualPqCtes,
        ${sqlPqServe(s"""
          SELECT p.q_id, a.vec_id,
                 qc.cos + list_sum(list_transform(range(1, 17), s -> l[s][cds[s]])) AS adc
          FROM probes p
          JOIN qc ON qc.q_id = p.q_id AND qc.cid = p.cid
          JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.q_id
          JOIN rcodes ON rcodes.vec_id = a.vec_id
          JOIN rlut ON rlut.q_id = p.q_id""")}"""

  /** e18's oracle: the e14 probe chain with the metadata filter applied
    * to BOTH sides the way the served path does — label-0 queries, and
    * candidates restricted to label-1 vectors BEFORE scoring (the
    * pre-filter contract: a matching neighbor can never be displaced
    * from the top-5 by a filtered-out one). Probe selection runs
    * unfiltered against the full pinned centroid sample, like erasure:
    * the quantizer is a trained artifact, the filter is member
    * metadata. */
  private[graft] val sqlIvfFilteredTop5: String = s"""
        WITH ${sqlIvfProbes(
    """SELECT n.vec_id AS q_id, n.ne AS qe FROM n
           JOIN embeddings e ON e.vec_id = n.vec_id
           WHERE n.vec_id % 10 = 0 AND e.label = 0""")},
        scored AS (
          SELECT p.q_id, a.vec_id,
                 list_sum(list_transform(range(1, len(q.qe)+1), i -> q.qe[i] * n.ne[i])) AS cos
          FROM probes p
          JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.q_id
          JOIN embeddings el ON el.vec_id = a.vec_id AND el.label = 1
          JOIN q ON q.q_id = p.q_id
          JOIN n ON n.vec_id = a.vec_id)
        $sqlScoredTop5Tail"""

  /** e19's oracle: the e14 probe chain over a POST-SPLIT index — the
    * heaviest cell (max members, ties to the lowest cid) is retired and
    * its members re-assigned between the two 'split:'-hash-minimal
    * member seeds (parent centroid vector excluded from seed
    * eligibility, [[graft.ops.IvfIndex.split]]'s fresh-id rule); probe
    * selection then runs against the post-split centroid set. Every
    * argmax ties to the lowest id, as everywhere. */
  private[graft] val sqlIvfSplitTop5: String = s"""
        WITH $sqlIvfIndexCtes,
        counts AS (SELECT cid, count(*) AS cnt FROM assign GROUP BY cid),
        heavy AS (SELECT cid FROM counts ORDER BY cnt DESC, cid ASC LIMIT 1),
        seeds AS (
          SELECT a.vec_id, n.ne
          FROM assign a JOIN heavy h ON a.cid = h.cid
          JOIN n ON n.vec_id = a.vec_id
          WHERE a.vec_id <> h.cid
          ORDER BY CAST(concat('0x', substr(md5(concat('split:', CAST(a.vec_id AS VARCHAR))),1,15)) AS BIGINT) ASC,
                   a.vec_id ASC
          LIMIT 2),
        c2 AS (
          SELECT cid, ce FROM c WHERE cid NOT IN (SELECT cid FROM heavy)
          UNION ALL
          SELECT vec_id AS cid, ne AS ce FROM seeds),
        re0 AS (
          SELECT a.vec_id, s.vec_id AS cid,
                 list_sum(list_transform(range(1, len(n.ne)+1), i -> n.ne[i] * s.ne[i])) AS cos
          FROM assign a JOIN heavy h ON a.cid = h.cid
          JOIN n ON n.vec_id = a.vec_id
          CROSS JOIN seeds s),
        re AS (
          SELECT vec_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rnk
            FROM re0) WHERE rnk = 1),
        assign2 AS (
          SELECT a.vec_id, a.cid FROM assign a
          WHERE a.cid NOT IN (SELECT cid FROM heavy)
          UNION ALL SELECT vec_id, cid FROM re),
        q AS (SELECT vec_id AS q_id, ne AS qe FROM n WHERE vec_id % 10 = 0),
        qc AS (
          SELECT q.q_id, c2.cid,
                 list_sum(list_transform(range(1, len(qe)+1), i -> qe[i] * ce[i])) AS cos
          FROM q CROSS JOIN c2),
        probes AS (
          SELECT q_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cid ASC) AS rnk
            FROM qc) WHERE rnk <= ${graft.ops.IvfIndex.NProbe}),
        scored AS (
          SELECT p.q_id, a.vec_id,
                 list_sum(list_transform(range(1, len(q.qe)+1), i -> q.qe[i] * n.ne[i])) AS cos
          FROM probes p
          JOIN assign2 a ON a.cid = p.cid AND a.vec_id <> p.q_id
          JOIN q ON q.q_id = p.q_id
          JOIN n ON n.vec_id = a.vec_id)
        $sqlScoredTop5Tail"""

  /** e20's oracle: the e14 probe chain over a POST-MERGE index — the
    * smallest cell (min members, ties to the lowest cid) is retired and
    * its members re-assign to the nearest REMAINING centroid by the
    * shared lowest-id-tie argmax; probe selection then runs against the
    * reduced centroid set. */
  private[graft] val sqlIvfMergeTop5: String = s"""
        WITH $sqlIvfIndexCtes,
        counts AS (SELECT cid, count(*) AS cnt FROM assign GROUP BY cid),
        small AS (SELECT cid FROM counts ORDER BY cnt ASC, cid ASC LIMIT 1),
        c2 AS (SELECT cid, ce FROM c WHERE cid NOT IN (SELECT cid FROM small)),
        re0 AS (
          SELECT a.vec_id, c2.cid,
                 list_sum(list_transform(range(1, len(n.ne)+1), i -> n.ne[i] * c2.ce[i])) AS cos
          FROM assign a JOIN small sm ON a.cid = sm.cid
          JOIN n ON n.vec_id = a.vec_id
          CROSS JOIN c2),
        re AS (
          SELECT vec_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rnk
            FROM re0) WHERE rnk = 1),
        assign2 AS (
          SELECT a.vec_id, a.cid FROM assign a
          WHERE a.cid NOT IN (SELECT cid FROM small)
          UNION ALL SELECT vec_id, cid FROM re),
        q AS (SELECT vec_id AS q_id, ne AS qe FROM n WHERE vec_id % 10 = 0),
        qc AS (
          SELECT q.q_id, c2.cid,
                 list_sum(list_transform(range(1, len(qe)+1), i -> qe[i] * ce[i])) AS cos
          FROM q CROSS JOIN c2),
        probes AS (
          SELECT q_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cid ASC) AS rnk
            FROM qc) WHERE rnk <= ${graft.ops.IvfIndex.NProbe}),
        scored AS (
          SELECT p.q_id, a.vec_id,
                 list_sum(list_transform(range(1, len(q.qe)+1), i -> q.qe[i] * n.ne[i])) AS cos
          FROM probes p
          JOIN assign2 a ON a.cid = p.cid AND a.vec_id <> p.q_id
          JOIN q ON q.q_id = p.q_id
          JOIN n ON n.vec_id = a.vec_id)
        $sqlScoredTop5Tail"""

  /** e21's maintenance bands: TIGHT (split above 1.25×T, merge below
    * 0.6×T) so the sweep actually exercises splits AND merges on the
    * shipped test corpora — their cell-occupancy spread sits well inside
    * the production 4×/¼× default band, which would no-op here. The
    * policy code is band-agnostic; the constants are shared verbatim by
    * the Spark call and the oracle text. */
  private val E21HiNum = 5
  private val E21HiDen = 4
  private val E21LoNum = 3
  private val E21LoDen = 5

  /** One maintenance ROUND of the e21 oracle, generically: from the
    * previous round's centroid set `cPrev(cid, ce)` and assignment
    * `aPrev(vec_id, cid)`, detect heavies (cnt·hiDen > T·hiNum, ≥3
    * members) and smalls (cnt·loDen < T·loNum, zero-member cells
    * included via the LEFT JOIN), split heavies between their two
    * 'split:'-hash-minimal non-parent member seeds (per-cell window —
    * e19's rule batched), re-home small cells' members to the nearest
    * post-split centroid, and emit `c_m$i` / `a_m$i`. Every argmax ties
    * to the lowest id; T = ⌈n/k⌉ in exact integer arithmetic — all of
    * it mirrors IvfIndex.maintain verbatim. An in-band round degrades
    * to the identity (empty heavy/small sets). */
  private def sqlMaintainRound(i: Int, cPrev: String, aPrev: String,
      hiNum: Int, hiDen: Int, loNum: Int, loDen: Int): String = s"""cnt$i AS (
          SELECT cid, count(*) AS cnt FROM $aPrev GROUP BY cid),
        bd$i AS (
          SELECT CAST(((SELECT count(*) FROM $aPrev) + (SELECT count(*) FROM $cPrev) - 1)
                      // (SELECT count(*) FROM $cPrev) AS BIGINT) AS t),
        hv$i AS (
          SELECT cid FROM cnt$i, bd$i
          WHERE cnt * $hiDen > t * $hiNum AND cnt >= 3),
        sm$i AS (
          SELECT c.cid FROM $cPrev c
          LEFT JOIN cnt$i ct ON ct.cid = c.cid
          CROSS JOIN bd$i
          WHERE coalesce(ct.cnt, 0) * $loDen < t * $loNum
            AND c.cid NOT IN (SELECT cid FROM hv$i)),
        sd$i AS (
          SELECT parent, vec_id, ne FROM (
            SELECT a.cid AS parent, a.vec_id, n.ne,
                   row_number() OVER (PARTITION BY a.cid ORDER BY
                     CAST(concat('0x', substr(md5(concat('split:', CAST(a.vec_id AS VARCHAR))),1,15)) AS BIGINT) ASC,
                     a.vec_id ASC) AS rk
            FROM $aPrev a JOIN hv$i h ON a.cid = h.cid
            JOIN n ON n.vec_id = a.vec_id
            WHERE a.vec_id <> a.cid)
          WHERE rk <= 2),
        c_m$i AS (
          SELECT cid, ce FROM $cPrev
          WHERE cid NOT IN (SELECT cid FROM hv$i)
            AND cid NOT IN (SELECT cid FROM sm$i)
          UNION ALL SELECT vec_id AS cid, ne AS ce FROM sd$i),
        rs0$i AS (
          SELECT a.vec_id, s.vec_id AS cid,
                 list_sum(list_transform(range(1, len(n.ne)+1), x -> n.ne[x] * s.ne[x])) AS cos
          FROM $aPrev a JOIN hv$i h ON a.cid = h.cid
          JOIN n ON n.vec_id = a.vec_id
          JOIN sd$i s ON s.parent = a.cid),
        rs$i AS (
          SELECT vec_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rnk
            FROM rs0$i) WHERE rnk = 1),
        rm0$i AS (
          SELECT a.vec_id, c2.cid,
                 list_sum(list_transform(range(1, len(n.ne)+1), x -> n.ne[x] * c2.ce[x])) AS cos
          FROM $aPrev a JOIN sm$i smm ON a.cid = smm.cid
          JOIN n ON n.vec_id = a.vec_id
          CROSS JOIN c_m$i c2),
        rm$i AS (
          SELECT vec_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rnk
            FROM rm0$i) WHERE rnk = 1),
        a_m$i AS (
          SELECT vec_id, cid FROM $aPrev
          WHERE cid NOT IN (SELECT cid FROM hv$i)
            AND cid NOT IN (SELECT cid FROM sm$i)
          UNION ALL SELECT vec_id, cid FROM rs$i
          UNION ALL SELECT vec_id, cid FROM rm$i)"""

  /** e22's oracle: the e14 probe chain over a ONCE-maintained index —
    * ONE generic policy round unrolled from the shared index CTEs.
    * This is the twin-gate form of e21: the two-round oracle spills
    * ~80 GB of DuckDB state at the 10× hot-cell twin's 20k vectors
    * (SCALE.md round 13), while one round keeps the CTE tree bounded,
    * so MAINTENANCE itself is hash-checked under real skew instead of
    * structurally argued. Identical bands, identical policy SQL —
    * [[sqlMaintainRound]] is shared verbatim with e21's oracle. */
  private[graft] val sqlIvfMaintainOnceTop5: String = s"""
        WITH $sqlIvfIndexCtes,
        ${sqlMaintainRound(1, "c", "assign", E21HiNum, E21HiDen, E21LoNum, E21LoDen)},
        q AS (SELECT vec_id AS q_id, ne AS qe FROM n WHERE vec_id % 10 = 0),
        qcf AS (
          SELECT q.q_id, c2.cid,
                 list_sum(list_transform(range(1, len(qe)+1), x -> qe[x] * ce[x])) AS cos
          FROM q CROSS JOIN c_m1 c2),
        probes AS (
          SELECT q_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cid ASC) AS rnk
            FROM qcf) WHERE rnk <= ${graft.ops.IvfIndex.NProbe}),
        scored AS (
          SELECT p.q_id, a.vec_id,
                 list_sum(list_transform(range(1, len(q.qe)+1), x -> q.qe[x] * n.ne[x])) AS cos
          FROM probes p
          JOIN a_m1 a ON a.cid = p.cid AND a.vec_id <> p.q_id
          JOIN q ON q.q_id = p.q_id
          JOIN n ON n.vec_id = a.vec_id)
        $sqlScoredTop5Tail"""

  /** e21's oracle: the e14 probe chain over a TWICE-MAINTAINED index —
    * two generic policy rounds unrolled from the shared index CTEs,
    * then probe selection against the final centroid set and the exact
    * rescore over the final assignment. */
  private[graft] val sqlIvfMaintainTop5: String = s"""
        WITH $sqlIvfIndexCtes,
        ${sqlMaintainRound(1, "c", "assign", E21HiNum, E21HiDen, E21LoNum, E21LoDen)},
        ${sqlMaintainRound(2, "c_m1", "a_m1", E21HiNum, E21HiDen, E21LoNum, E21LoDen)},
        q AS (SELECT vec_id AS q_id, ne AS qe FROM n WHERE vec_id % 10 = 0),
        qcf AS (
          SELECT q.q_id, c2.cid,
                 list_sum(list_transform(range(1, len(qe)+1), x -> qe[x] * ce[x])) AS cos
          FROM q CROSS JOIN c_m2 c2),
        probes AS (
          SELECT q_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cid ASC) AS rnk
            FROM qcf) WHERE rnk <= ${graft.ops.IvfIndex.NProbe}),
        scored AS (
          SELECT p.q_id, a.vec_id,
                 list_sum(list_transform(range(1, len(q.qe)+1), x -> q.qe[x] * n.ne[x])) AS cos
          FROM probes p
          JOIN a_m2 a ON a.cid = p.cid AND a.vec_id <> p.q_id
          JOIN q ON q.q_id = p.q_id
          JOIN n ON n.vec_id = a.vec_id)
        $sqlScoredTop5Tail"""

  /** e17's erasure predicate — the GDPR request applied to the index. */
  private[graft] val sqlErasedPred = "vec_id % 7 = 3"

  /** e17's oracle: the e14 probe chain over the REDUCED member set —
    * queries and candidates exclude erased vectors, while probe selection
    * still runs against the FULL pinned centroid sample (erasure removes
    * member data, never un-trains the quantizer — FAISS remove_ids). */
  private[graft] val sqlIvfErasedTop5: String = s"""
        WITH ${sqlIvfProbes(
    s"SELECT vec_id AS q_id, ne AS qe FROM n WHERE vec_id % 10 = 0 AND NOT ($sqlErasedPred)")},
        scored AS (
          SELECT p.q_id, a.vec_id,
                 list_sum(list_transform(range(1, len(q.qe)+1), i -> q.qe[i] * n.ne[i])) AS cos
          FROM probes p
          JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.q_id
                       AND NOT (${sqlErasedPred.replace("vec_id", "a.vec_id")})
          JOIN q ON q.q_id = p.q_id
          JOIN n ON n.vec_id = a.vec_id)
        $sqlScoredTop5Tail"""

  def defs: Map[String, QueryDef] = Map(
    // E1: brute-force cosine top-5 for every label-0 query vector.
    // Vectors are L2-normalized ONCE up front (cosine = plain dot after),
    // so each of the |Q|·|V| pairs costs one 64-element fold instead of
    // three; the corpus is repartitioned so the scoring scan parallelizes
    // even from a single small parquet file.
    "e1_cosine_topk" -> QueryDef(
      build = (s, d) => {
        val vn = Tables.embeddings(s, d)
          .transform(Tables.spread)
          // plain norm, deliberately: wrapping it in nullif (a CaseWhen)
          // disables codegen subexpression elimination, so the 64-element
          // normalize lambda re-evaluates sqrt(vec_dot) per element —
          // measured 4x on e5. A zero-norm vector aborts loudly here —
          // Spark 4 ANSI raises DIVIDE_BY_ZERO for double 0/0 too
          // (pinned in EmbeddingsSpec's NaN-posture test). A NaN/Inf
          // COMPONENT is the silent path instead: x/NaN propagates NaN
          // with no error, and NaN out-ranks every real cosine under
          // Double.compare — closed by the !isnan ranking filters
          // downstream plus the e8 pre-flight validator
          // (ops/CorpusContract) a pipeline runs before this job.
          .withColumn("nrm", norm(col("embedding")))
          .select(col("vec_id"), col("label"),
            transform(col("embedding"), x => x.cast("double") / col("nrm")).as("ne"))
        val q = vn.filter(col("label") === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
        val scored = vn.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            call_function("vec_dot", col("q_ne"), col("ne")).as("cos"))
        // Map-side bounded top-k: only |Q|·partitions·5 candidates shuffle
        // (vs every scored pair through a row_number window — the r1
        // scale-killer). Rank order (cos DESC, vec_id ASC) is total, so the
        // result is deterministic and identical to the window formulation.
        scored
          // null/NaN scores rank nowhere (NaN would top Double.compare)
          .filter(col("cos").isNotNull && !isnan(col("cos")))
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(s"""
        WITH n AS (
          SELECT vec_id, label,
                 list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(${sqlDotOf("embedding", "embedding")})) AS ne
          FROM embeddings),
        q AS (SELECT vec_id AS q_id, ne AS qe FROM n WHERE label = 0),
        pairs AS (
          SELECT q_id, vec_id,
                 list_sum(list_transform(range(1, len(qe)+1), i -> qe[i] * ne[i])) AS cos
          FROM q CROSS JOIN n
          WHERE vec_id <> q_id),
        ranked AS (
          SELECT q_id, vec_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
          FROM pairs)
        SELECT q_id, vec_id, floor(cos * 1000000) / 1000000.0 AS score, rn
        FROM ranked WHERE rn <= 5"""),
      bench = true),

    // E2: ANN via random-hyperplane multi-probe LSH — 8 sign bits (256
    // buckets) from fixed ±1 hyperplanes; each query probes its own bucket
    // plus all buckets within Hamming distance 4 (163 of 256), then ranks
    // by exact cosine inside the probed set. Bit count and probe radius
    // scale with corpus: at 100 TB you'd use 16-24 bits + radius-1/2
    // probes so each query touches ~1k-vector buckets (the sweep above
    // shows why bits should grow with the corpus, not the radius). The plane weights depend only
    // on (plane, dim), so they are PRECOMPUTED md5-parity literals
    // embedded in both the Spark plan and the DuckDB oracle — the whole
    // index is deterministic arithmetic and fully hash-checked (recall
    // additionally gated vs exact in EmbeddingsSpec).
    "e2_ann_lsh_buckets" -> QueryDef(
      build = (s, d) => {
        def signedProj(vec: Column, p: Int): Column =
          call_function("vec_dot", vec.cast("array<double>"),
            array(planeWeights(p).map(lit): _*))
        def bucket(vec: Column): Column =
          (0 until LshBits).map(p =>
            when(signedProj(vec, p) > 0, lit(1L << p)).otherwise(lit(0L)))
            .reduce(_ + _)
        val probeMasks = (0 until (1 << LshBits))
          .filter(m => Integer.bitCount(m) <= ProbeRadius)
        val v = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"), bucket(col("embedding")).as("bkt"))
        val q = v.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            explode(array(probeMasks.map(m => col("bkt").bitwiseXOR(lit(m.toLong))): _*))
              .as("bkt"))
        v.join(q, "bkt")
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            try_divide(dot(col("q_vec"), col("embedding")),
              norm(col("q_vec")) * norm(col("embedding"))).as("cos"))
          // null/NaN scores rank nowhere (NaN would top Double.compare)
          .filter(col("cos").isNotNull && !isnan(col("cos")))
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some {
        def wlit(p: Int) = planeWeights(p).mkString("[", ", ", "]")
        def sqlProj(vecExpr: String, p: Int) =
          s"list_sum(list_transform(range(1, ${EmbDim + 1}), i -> CAST($vecExpr[i] AS DOUBLE) * (${wlit(p)})[i]))"
        val sqlBucket = (0 until LshBits).map(p =>
          s"CASE WHEN ${sqlProj("embedding", p)} > 0 THEN ${1L << p} ELSE 0 END")
          .mkString(" + ")
        val masks = (0 until (1 << LshBits)).filter(m => Integer.bitCount(m) <= ProbeRadius)
          .mkString("[", ", ", "]")
        s"""
        WITH v AS (
          SELECT vec_id, embedding, CAST($sqlBucket AS BIGINT) AS bkt
          FROM embeddings),
        q AS (
          SELECT v.vec_id AS q_id, v.embedding AS q_vec, xor(v.bkt, m.msk) AS bkt
          FROM v, unnest($masks) AS m(msk)
          WHERE v.vec_id % 10 = 0),
        scored AS (
          SELECT q.q_id, v.vec_id,
                 ${sqlDotOf("q.q_vec", "v.embedding")} /
                 (sqrt(${sqlDotOf("q.q_vec", "q.q_vec")}) * sqrt(${sqlDotOf("v.embedding", "v.embedding")})) AS cos
          FROM q JOIN v USING (bkt)
          WHERE v.vec_id <> q.q_id)
        SELECT q_id, vec_id, floor(cos * 1000000) / 1000000.0 AS score, rn
        FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
              FROM scored)
        WHERE rn <= 5"""
      }),

    // E4: ANN via IVF (inverted file index) — the OTHER standard ANN scale
    // path next to e2's LSH. Centroids are a deterministic hash-threshold
    // corpus sample sized ~√N (sqrtSample — production IVF trains them
    // offline; the index shape is identical), every vector is assigned to
    // its nearest centroid (one broadcast scoring pass + one keyed argmax
    // shuffle), and each query probes its 8 nearest centroids' buckets
    // only. Every step is deterministic arithmetic, so unlike most ANN
    // indexes this one is FULLY oracle-checked. At 100 TB the √N sizing
    // holds as-is; the probe join stays keyed on centroid id (probe count tunes recall/cost), hot buckets salt like any
    // skewed key.
    "e4_ann_ivf" -> QueryDef(
      build = (s, d) => {
        // normalization IS the shared index definition (IvfIndex
        // .normalized): e14's PERSISTED `ne` must stay bit-identical to
        // this live frame, so neither side may drift — the plain-norm /
        // ANSI-abort / !isnan rationale lives there and at e1 above
        val vn = graft.ops.IvfIndex.normalized(
          Tables.embeddings(s, d).transform(Tables.spread))
        val q = vn.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
        ivfCandidates(vn, q)
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(sqlIvfTop5)),

    // E14: ANN against the PERSISTED IVF index (ops/IvfIndex) — the
    // production serving regime e4 only simulates: centroids + inverted
    // lists are VersionedTable artifacts built ONCE per corpus
    // (IvfIndex.ensure caches by corpus fingerprint), and the query is a
    // probe-only read — zero corpus scans, zero assignment work, the
    // probed cells pruned into the cells scan via a bounded (≤
    // MaxCentroids) pushed IN-filter. The measured t30 crossover
    // (SCALE.md) motivates this split: the per-run N·k_cent assignment
    // pass dominates every live ANN query; amortizing it across query
    // batches is what a vector index IS.
    //
    // Shares e4's exact definitions (IvfIndex.assignCells/probeSelect)
    // and e4's oracle verbatim — the correctness claim IS that a probe
    // of the persisted index reproduces the live-computed IVF result
    // bit-for-bit. Queries are read from the index itself (the inverted
    // lists store normalized vectors for exact re-scoring).
    // Incremental appends assign against the pinned centroid set —
    // rebuild parity proven in IvfIndexSpec.
    "e14_ann_ivf_persisted" -> QueryDef(
      build = (s, d) => {
        val root = graft.ops.IvfIndex.ensure(s, d)
        // q feeds probeCandidates TWICE (probe selection + the re-score
        // join) — checkpoint once or the cells parquet scans an extra
        // time per consumer (|Q| = corpus/10 rows, cheap to pin)
        val q = graft.ops.IvfIndex.cells(s, root)
          .filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
          .localCheckpoint(true)
        graft.ops.IvfIndex.probeCandidates(s, root, q)
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(sqlIvfTop5),
      bench = true),

    // E15: TWO-LEVEL probe of the same persisted index — the e5 note's
    // "two-level assignment" made real: a coarse hash-gate sample of the
    // CENTROID set (min(√k_cent, 64) group vectors, IvfIndex.coarseOf)
    // routes each query to its 4 nearest groups, and probe selection
    // scores only those groups' member centroids. Query-side centroid
    // work drops from k_cent to k_coarse + probed-group members — the
    // level that matters when the cell count itself is the bottleneck
    // (a 100 TB index wants ~10⁶ cells; scoring every cell vector per
    // query is level-1's hidden linear term). Deterministic arithmetic
    // end to end (every argmax ties to the lowest id), so unlike
    // production coarse quantizers this one is FULLY oracle-checked;
    // recall vs the single-level e14 is spec-gated in IvfIndexSpec.
    "e15_ann_ivf_two_level" -> QueryDef(
      build = (s, d) => {
        val root = graft.ops.IvfIndex.ensure(s, d)
        // q feeds the coarse scoring, the candidate scoring, and the
        // re-score join — checkpoint once (the e14 rationale)
        val q = graft.ops.IvfIndex.cells(s, root)
          .filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
          .localCheckpoint(true)
        graft.ops.IvfIndex.probeCandidatesTwoLevel(s, root, q)
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(sqlIvfTwoLevelTop5),
      bench = true),

    // E5: ANN via product quantization + asymmetric distance computation
    // (ADC) — the memory-compression scale path next to e2 (LSH) and e4
    // (IVF): each 64-dim float vector compresses to 16 codebook indices
    // (256 B → 16 B at byte width), and the ADC pass scores CODES via a
    // per-query lookup table, never touching raw corpus vectors. Codebooks
    // are a deterministic corpus sample per subspace (production PQ trains
    // them offline — the index shape is identical). Encode = one broadcast
    // join + keyed argmin; ADC = broadcast the |Q|·16·k LUTs and fold 16
    // array lookups per (query, vector) — row-local, map-side bounded
    // top-k, so only |Q|·partitions·50 rows shuffle. The ADC top-50
    // shortlist is then re-ranked EXACTLY (the standard PQ serving
    // pipeline: at 100 TB the full-precision pass touches |Q|·50 vectors,
    // not the corpus — measured recall@5 0.889 on the e1-shared queries vs ADC-only ~0.44). Every
    // step is deterministic arithmetic → fully oracle-checked; recall
    // additionally gated vs exact in EmbeddingsSpec.
    "e5_pq_adc_topk" -> QueryDef(
      build = (s, d) => {
        // EVERY PQ definition (subspace slicer, codebook sample, encoder,
        // query LUT, ADC fold) is IvfIndex's — the same machinery the
        // persisted IVFPQ side (e16) runs, here over RAW subvectors
        // (IndexPQ: no cell, so no residual; e16 feeds residualsOf
        // through the identical functions). Encode and LUT are row-local
        // folds over the broadcast nested codebook (r15): only the √N
        // codebook SAMPLE is ever sliced into subspace rows, so the
        // former |V|·NSub exploded checkpoint is gone. The tiny codebook
        // checkpoints once (it feeds the encoder and the LUT). vn itself
        // stays lineage-visible (NOT checkpointed) so the column-pruned
        // parquet scan under the re-rank joins remains auditable in the
        // final plan (PushdownSpec reads its ReadSchema).
        val vn = graft.ops.IvfIndex.normalized(
          Tables.embeddings(s, d).transform(Tables.spread))
        val cents = graft.ops.IvfIndex
          .codebookOf(graft.ops.IvfIndex.subspacesOf(vn), vn)
          .localCheckpoint(true)
        val codes = graft.ops.IvfIndex.encodeCodes(vn, cents)
        val lut = graft.ops.IvfIndex.queryLut(
          vn.filter(col("vec_id") % 10 === 0)
            .select(col("vec_id").as("q_id"), col("ne").as("qe")),
          cents)
        // ADC: approx cos(q, v) = Σ_s LUT[s][code_v[s]] — 16 lookups per
        // pair, corpus vectors reduced to their codes; keep a top-50
        // shortlist per query
        val shortlist = codes.crossJoin(broadcast(lut))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            graft.ops.IvfIndex.adcScore(col("lut"), col("codes")).as("adc"))
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(
            graft.ops.IvfIndex.PqShortlist)(col("adc"), col("vec_id")).as("top"))
          .select(col("q_id"), explode(col("top.id")).as("vec_id"))
        // exact re-rank of the shortlist only (|Q|·50 full-precision dots).
        // The !isnan guard here costs |Q|·50 rows, not the corpus: a NaN
        // vector that rode a NaN adc into the shortlist is dropped before
        // it can top the final ranking (the hot ADC pass itself stays
        // unguarded — the e8 pre-flight validator is the contract gate).
        shortlist
          .join(vn.select(col("vec_id").as("q_id"), col("ne").as("q_ne")), "q_id")
          .join(vn, "vec_id")
          .select(col("q_id"), col("vec_id"),
            call_function("vec_dot", col("q_ne"), col("ne")).as("cos"))
          .filter(!isnan(col("cos")))
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(s"""
        WITH $sqlNormCte,
        $sqlPqCtes,
        ${sqlPqServe("""
          SELECT q_id, vec_id,
                 list_sum(list_transform(range(1, 17), s -> l[s][cds[s]])) AS adc
          FROM codes CROSS JOIN lut
          WHERE vec_id <> q_id""")}"""),
      bench = true),

    // E16: IVFPQ serve from the PERSISTED index — the production vector-DB
    // read path (FAISS IndexIVFPQ.search): e14's probe selection against
    // the pinned centroids, then ADC over the probed cells' STORED
    // RESIDUAL codes (the index's ne-free compressed scan; by_residual —
    // the codes quantize x − centroid(cid), and the probed centroid's
    // query dot, already computed by probe selection, is added back), a
    // top-50 shortlist, and an exact re-rank from the stored
    // full-precision vectors. ZERO corpus reads and zero training/encode
    // work at query time — both the coarse quantizer (e14's win over e4)
    // and the PQ encode (e5's dominant cost) are paid once at build. The
    // whole chain is deterministic arithmetic, so unlike production IVFPQ
    // it is FULLY oracle-checked; recall vs the exact-rescore e14 is
    // additionally spec-gated (IvfIndexSpec, where the residual encoding
    // is measured against the raw encoding it replaced), and the
    // codes-only scan's ReadSchema is plan-pinned (PushdownSpec).
    "e16_ann_ivfpq_persisted" -> QueryDef(
      build = (s, d) => {
        val root = graft.ops.IvfIndex.ensure(s, d)
        // q feeds probe selection, the LUT build, and the re-score join —
        // checkpoint once (the e14 rationale)
        val q = graft.ops.IvfIndex.cells(s, root)
          .filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
          .localCheckpoint(true)
        graft.ops.IvfIndex.probeCandidatesPq(s, root, q)
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(sqlIvfPqTop5),
      bench = true),

    // E17: GDPR erasure reaching the PERSISTED index — the round-trip a
    // compliance pipeline runs: erase every matching vector from the
    // inverted lists (one logical-delete commit over a cached erased twin
    // of the index — IvfIndex.ensureErased, so repeated runs probe a
    // stable post-erasure head and the shared e14/e15/e16 index is never
    // mutated), then serve: probes never return an erased id. Centroids
    // and codebook stay pinned (trained artifacts, not member data).
    // Hard-delete materialization (compact) and rebuild-parity are
    // spec-proven in IvfIndexSpec.
    "e17_gdpr_index_erasure" -> QueryDef(
      build = (s, d) => {
        val root = graft.ops.IvfIndex.ensureErased(s, d, sqlErasedPred)
        // post-erasure cells: the erased queries are gone with the rest
        val q = graft.ops.IvfIndex.cells(s, root)
          .filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
          .localCheckpoint(true)
        graft.ops.IvfIndex.probeCandidates(s, root, q)
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(sqlIvfErasedTop5)),

    // E18: FILTERED search served from the PERSISTED index — the vector-DB
    // "metadata filter" read path (FAISS IDSelector / the WHERE clause of
    // every production vector store): label-0 queries retrieve their
    // top-5 among label-1 vectors ONLY. The index stores `label` beside
    // each inverted-list entry, so the predicate pushes into the cells
    // scan NEXT TO the cid prune (parquet row groups skip on both —
    // plan-pinned in PushdownSpec) and non-matching vectors never enter
    // the scoring join: PRE-filtering, not a post-scoring drop — a top-5
    // cut before the filter would silently lose matching neighbors
    // (e12 is the live-compute twin of this contract; this is it served
    // at probe cost). Zero corpus reads, like e14.
    "e18_ann_ivf_filtered" -> QueryDef(
      build = (s, d) => {
        val root = graft.ops.IvfIndex.ensure(s, d)
        val q = graft.ops.IvfIndex.cells(s, root)
          .filter(col("vec_id") % 10 === 0 && col("label") === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
          .localCheckpoint(true)
        graft.ops.IvfIndex.probeCandidates(s, root, q,
            candWhere = Some("label = 1"))
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(sqlIvfFilteredTop5),
      bench = true),

    // E19: hot-cell SPLIT maintenance — the index-side skew remedy
    // (SPFresh's LIRE split; SCALE.md names it as the fix once a cell
    // outgrows every join-side mitigation): retire the heaviest inverted
    // list, promote two of its members to fresh centroids, re-assign the
    // members between them, then serve. The split is three O(cell)+
    // O(metadata) versioned commits — never a corpus or table rewrite —
    // and the probe afterwards is the standard e14 contract against the
    // post-split centroid set. Deterministic end to end (hash-minimal
    // seeds, lowest-id argmax ties), so unlike production splitters it
    // is FULLY oracle-checked; IvfIndexSpec additionally proves member
    // preservation, nearest-seed re-assignment parity, both fragments
    // strictly smaller than the parent, and that time travel still
    // audits the pre-split index. Runs against a cached derived twin —
    // the shared e14/e15/e16 index is never mutated.
    "e19_ann_cell_split" -> QueryDef(
      build = (s, d) => {
        val root = graft.ops.IvfIndex.deriveTwin(s, d, "split-heaviest") { tmp =>
          val heavy = graft.ops.IvfIndex.cells(s, tmp)
            .groupBy(col("cid")).count()
            .collect().map(r => (r.getLong(0), r.getLong(1)))
            .sortBy { case (cid, cnt) => (-cnt, cid) }.head._1
          graft.ops.IvfIndex.split(s, tmp, heavy)
        }
        val q = graft.ops.IvfIndex.cells(s, root)
          .filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
          .localCheckpoint(true)
        graft.ops.IvfIndex.probeCandidates(s, root, q)
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(sqlIvfSplitTop5)),

    // E20: cell MERGE maintenance — e19's dual, completing the SPFresh-
    // style index lifecycle this engine now serves end to end (build →
    // append/stream → erase → split → merge): a cell too small to earn
    // its probe slot is retired and its members re-assign to the nearest
    // REMAINING centroid by the same argmax that placed every other
    // vector, so the result is exactly "the same quantizer minus one
    // centroid". O(cell) + O(metadata) commits, fully oracle-checked,
    // served from a cached derived twin like e17/e19.
    "e20_ann_cell_merge" -> QueryDef(
      build = (s, d) => {
        val root = graft.ops.IvfIndex.deriveTwin(s, d, "merge-smallest") { tmp =>
          val small = graft.ops.IvfIndex.cells(s, tmp)
            .groupBy(col("cid")).count()
            .collect().map(r => (r.getLong(0), r.getLong(1)))
            .sortBy { case (cid, cnt) => (cnt, cid) }.head._1
          graft.ops.IvfIndex.merge(s, tmp, small)
        }
        val q = graft.ops.IvfIndex.cells(s, root)
          .filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
          .localCheckpoint(true)
        graft.ops.IvfIndex.probeCandidates(s, root, q)
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(sqlIvfMergeTop5)),

    // E21: AUTOMATIC index maintenance — the policy pass over e19/e20's
    // manual primitives (SPFresh's background maintainer): each sweep
    // detects every cell outside an occupancy band from the persisted
    // cellstats artifact (no scan), splits the heavies between their
    // hash-minimal member seeds, re-homes the smalls' members to the
    // nearest surviving centroid, and commits the WHOLE sweep behind one
    // atomic centroid flip (staged gen+1 rows + fresh seed cids — a live
    // prober sees exactly the pre- or post-sweep index). Two sweeps run
    // here (bands tightened to exercise both actions on this corpus —
    // see E21HiNum), matching the oracle's two generically-unrolled
    // policy rounds; a converged sweep commits NOTHING, which is the
    // idempotence IvfIndexSpec pins alongside convergence on a planted
    // hot-cell corpus. Served from a cached derived twin like e17/e19.
    "e21_ann_index_maintain" -> QueryDef(
      build = (s, d) => {
        // the band constants are INPUTS of the twin body — key them
        // (deriveTwin's contract: a cache hit skips the body entirely)
        val root = graft.ops.IvfIndex.deriveTwin(s, d,
          s"maintain-2sweep-$E21HiNum-$E21HiDen-$E21LoNum-$E21LoDen") { tmp =>
          graft.ops.IvfIndex.maintain(s, tmp, E21HiNum, E21HiDen, E21LoNum, E21LoDen)
          graft.ops.IvfIndex.maintain(s, tmp, E21HiNum, E21HiDen, E21LoNum, E21LoDen)
        }
        val q = graft.ops.IvfIndex.cells(s, root)
          .filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
          .localCheckpoint(true)
        graft.ops.IvfIndex.probeCandidates(s, root, q)
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(sqlIvfMaintainTop5)),

    // E22: e21's TWIN-GATE variant — the identical automatic-maintenance
    // policy, ONE sweep instead of two. Exists so the maintenance path
    // itself is ORACLE-CHECKED on the 10× hot-cell skew twin: e21's
    // two-round unrolled oracle spills ~80 GB of DuckDB state at 20k
    // vectors (an oracle-cost limit — SCALE.md round 13), which kept
    // maintenance out of the twin hash gate; the one-round form bounds
    // the CTE tree and passes the same type-strict selfcheck everywhere,
    // twin included. Same bands, same policy code, same serve tail.
    "e22_ann_maintain_single_sweep" -> QueryDef(
      build = (s, d) => {
        val root = graft.ops.IvfIndex.deriveTwin(s, d,
          s"maintain-1sweep-$E21HiNum-$E21HiDen-$E21LoNum-$E21LoDen") { tmp =>
          graft.ops.IvfIndex.maintain(s, tmp, E21HiNum, E21HiDen, E21LoNum, E21LoDen)
        }
        val q = graft.ops.IvfIndex.cells(s, root)
          .filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
          .localCheckpoint(true)
        graft.ops.IvfIndex.probeCandidates(s, root, q)
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(sqlIvfMaintainOnceTop5)),

    // E8: pre-flight corpus-contract validation — the one-scan gate a
    // pipeline runs BEFORE launching the embedding family (e1/e2/e4/e5/e7,
    // d8) on a fresh corpus: per-violation-class counts for null vectors,
    // null elements, wrong dimension, NaN/Inf components, and zero-norm
    // vectors, plus an is_valid verdict. All-aggregate (map-side
    // combinable, single-row combine), so at 100 TB it costs one corpus
    // scan and fails in minutes instead of NaN-poisoning hour ten of a
    // ranking job. ops/CorpusContract.assertValid is the throwing form.
    "e8_corpus_contract" -> QueryDef(
      build = (s, d) => graft.ops.CorpusContract.validate(
        Tables.embeddings(s, d), "embedding", EmbDim),
      oracle = Some(s"""
        SELECT *,
               (n_null_vec + n_null_elem + n_bad_dim + n_nonfinite + n_zero_norm) = 0 AS is_valid
        FROM (
          SELECT count(*) AS n_vecs,
                 count(*) FILTER (WHERE embedding IS NULL) AS n_null_vec,
                 count(*) FILTER (WHERE embedding IS NOT NULL
                   AND len(list_filter(embedding, x -> x IS NULL)) > 0) AS n_null_elem,
                 count(*) FILTER (WHERE embedding IS NOT NULL
                   AND len(embedding) <> $EmbDim) AS n_bad_dim,
                 count(*) FILTER (WHERE embedding IS NOT NULL
                   AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) > 0) AS n_nonfinite,
                 count(*) FILTER (WHERE embedding IS NOT NULL AND len(embedding) = $EmbDim
                   AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0
                   AND ${sqlDotOf("embedding", "embedding")} = 0.0) AS n_zero_norm
          FROM embeddings)""")),

    // E3: embedding-cosine near-duplicate detection — same-label blocks,
    // cosine ≥ 0.3 → similar pair (threshold sized to the synthetic corpus).
    "e3_embedding_neardup" -> QueryDef(
      build = (s, d) => {
        val vn = Tables.embeddings(s, d)
          .transform(Tables.spread)
          // plain norm, deliberately: wrapping it in nullif (a CaseWhen)
          // disables codegen subexpression elimination, so the 64-element
          // normalize lambda re-evaluates sqrt(vec_dot) per element —
          // measured 4x on e5. A zero-norm vector aborts loudly here
          // (ANSI DIVIDE_BY_ZERO covers double 0/0 — EmbeddingsSpec pins
          // it); a NaN/Inf component instead propagates a NaN cosine
          // silently, which floors to 0L (floor(NaN) is 0, not an error)
          // and fails the ≥0.3 threshold — corrupt pairs drop out rather
          // than emit. The e8 pre-flight validator is the gate that
          // names such corruption instead of hiding it.
          .withColumn("nrm", norm(col("embedding")))
          .select(col("label"), col("vec_id"),
            transform(col("embedding"), x => x.cast("double") / col("nrm")).as("ne"))
        val a = vn.select(col("label"), col("vec_id").as("a_id"), col("ne").as("a_ne"))
        val b = vn.select(col("label"), col("vec_id").as("b_id"), col("ne").as("b_ne"))
        a.join(b, "label")
          .filter(col("a_id") < col("b_id"))
          .select(col("label"), col("a_id"), col("b_id"),
            (floor(call_function("vec_dot", col("a_ne"), col("b_ne")) * 1000000) / 1000000.0).as("cos"))
          .filter(col("cos") >= 0.3)
      },
      oracle = Some(s"""
        WITH n AS (
          SELECT label, vec_id,
                 list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(${sqlDotOf("embedding", "embedding")})) AS ne
          FROM embeddings),
        pairs AS (
          SELECT a.label AS label, a.vec_id AS a_id, b.vec_id AS b_id,
                 list_sum(list_transform(range(1, len(a.ne)+1), i -> a.ne[i] * b.ne[i])) AS cos
          FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        SELECT label, a_id, b_id,
               floor(cos * 1000000) / 1000000.0 AS cos
        FROM pairs
        WHERE floor(cos * 1000000) / 1000000.0 >= 0.3""")),

    // E6: one exact Lloyd's (k-means) iteration — the clustering primitive
    // behind cluster-balanced corpus sampling and SemDeDup-style curation
    // (d8 consumes centroids like these). Seeds are the k lowest vec_ids
    // (deterministic, SF-portable); each vector goes to the argmin squared-
    // L2 centroid (tie → lowest cid), and the update step emits the new
    // per-dimension centroid means plus member counts.
    //
    // Exactness: dist = <v,v> - 2<v,c> + <c,c> with the same sequential
    // double folds as e1 (bit-identical on both engines; a seed's distance
    // to itself is exactly 0.0, so no cluster can come out empty). The
    // update mean floor-scales each component to integer micros BEFORE
    // summing, so the cross-member sum is integer (order-independent under
    // any partitioning) and the final division is one double op from exact
    // integers on both sides.
    //
    // Scale: all k centroids ride ONE broadcast row (sorted struct array),
    // so assignment is a row-local fold — the corpus embeddings are never
    // shuffled at all (a groupBy-argmin formulation would exchange a full
    // vector per row; .explain showed exactly that, which is why this is a
    // fold). The only shuffle in the whole query is the (cluster, dim)-
    // keyed update of integer micros, which partial-aggregates to k·dim
    // rows per task. At 100 TB you raise k and iterate: each Lloyd round
    // is one k-row broadcast + one combinable micro shuffle.
    "e6_kmeans_step" -> QueryDef(
      build = (s, d) => {
        import graft.ops.KMeans
        val k = 8
        // repartition = local-parallelism shim for the single small test
        // file (same as e1); a real multi-split scan needs no exchange
        val v = Tables.embeddings(s, d)
          .transform(Tables.spread)
          .select(col("vec_id"), col("embedding"))
        // the oracle checks the shared ops/KMeans kernel directly: one
        // zero-shuffle fold assignment + one integer-micro mean update
        KMeans.updateMicro(KMeans.assign(v, KMeans.seedCentroids(v, k)))
      },
      oracle = Some(s"""
        WITH c0 AS (
          SELECT vec_id AS cid, embedding AS ce
          FROM embeddings ORDER BY vec_id ASC LIMIT 8),
        scored AS (
          SELECT v.vec_id, c.cid, v.embedding,
                 ${sqlDotOf("v.embedding", "v.embedding")}
                   - 2.0 * ${sqlDotOf("v.embedding", "c.ce")}
                   + ${sqlDotOf("c.ce", "c.ce")} AS dist
          FROM embeddings v CROSS JOIN c0 c),
        assigned AS (
          SELECT vec_id, cid, embedding,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY dist ASC, cid ASC) AS rn
          FROM scored),
        comps AS (
          SELECT cid AS cluster_id, r.i - 1 AS dim,
                 CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000000.0) AS BIGINT) AS micro
          FROM assigned CROSS JOIN range(1, ${EmbDim + 1}) r(i)
          WHERE rn = 1)
        SELECT cluster_id, CAST(dim AS BIGINT) AS dim,
               count(*) AS n_members,
               CAST(sum(micro) AS BIGINT) AS sum_micro,
               CAST(sum(micro) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0) AS c_val
        FROM comps GROUP BY cluster_id, dim"""),
      bench = true),

    // E7: cluster-balanced diversity sample — the downstream USE of e6's
    // clustering in a curation pipeline: an equal-sized, deterministic
    // per-cluster sample (5 per cluster, lowest vec_id first) so a
    // training mix draws evenly across embedding-space regions instead of
    // oversampling the dense ones. Assignment is the shared ops/KMeans
    // zero-shuffle fold; the embedding is DROPPED before the per-cluster
    // rank, so the only shuffle moves (cluster_id, vec_id) pairs — 16
    // bytes a row at any corpus size — and Spark's WindowGroupLimit
    // forwards at most 5 rows per cluster from each map task (the w8
    // pattern). rank() by vec_id is a total order: fully deterministic.
    "e7_cluster_sample" -> QueryDef(
      build = (s, d) => {
        import graft.ops.KMeans
        val v = Tables.embeddings(s, d)
          .transform(Tables.spread)
          .select(col("vec_id"), col("embedding"))
        val assigned = KMeans.assign(v, KMeans.seedCentroids(v, 8))
          .select(col("cluster_id"), col("vec_id"))
        assigned
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("cluster_id")).orderBy(col("vec_id").asc)))
          .filter(col("rn") <= 5)
          .withColumn("rn", col("rn").cast("long"))
      },
      oracle = Some(s"""
        WITH c0 AS (
          SELECT vec_id AS cid, embedding AS ce
          FROM embeddings ORDER BY vec_id ASC LIMIT 8),
        scored AS (
          SELECT v.vec_id, c.cid,
                 ${sqlDotOf("v.embedding", "v.embedding")}
                   - 2.0 * ${sqlDotOf("v.embedding", "c.ce")}
                   + ${sqlDotOf("c.ce", "c.ce")} AS dist
          FROM embeddings v CROSS JOIN c0 c),
        assigned AS (
          SELECT vec_id, cid AS cluster_id,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY dist ASC, cid ASC) AS pick
          FROM scored)
        SELECT cluster_id, vec_id,
               CAST(row_number() OVER (PARTITION BY cluster_id
                 ORDER BY vec_id ASC) AS BIGINT) AS rn
        FROM assigned WHERE pick = 1
        QUALIFY rn <= 5""")),

    // E9: per-cluster SIMPLIFIED silhouette — the cluster-quality monitor
    // a curation pipeline runs after e6/d8 before trusting the clustering
    // for sampling decisions. Per point: a = Euclidean distance to its
    // own (nearest) centroid, b = distance to the nearest OTHER centroid,
    // s = (b − a) / b — the centroid-based silhouette (Hamerly's
    // simplification: b is the runner-up CENTROID, never a pairwise
    // neighbor scan, so it stays one broadcast fold per row at any corpus
    // size). Because a is the minimum by construction, s ∈ [0, 1]: low
    // average ⇒ boundary-heavy cluster (bad split), high ⇒ well
    // separated. Per-point s is floor-scaled to micros BEFORE the sum
    // (the e6 integer discipline — cross-member double sums would be
    // partition-order-dependent), so the per-cluster mean is one double
    // division from exact integers.
    //
    // Scale: the corpus never shuffles — assignment + runner-up ride the
    // same single broadcast centroid row as e6; the only exchange is the
    // cluster_id-keyed rollup of (count, long) pairs, partial-aggregated
    // to k rows per task. sqrt args are clamped at 0 because the
    // vv − 2·v·c + c·c float form can dip an ulp below zero for
    // near-centroid points (sqrt of that would be NaN on BOTH engines —
    // clamped identically in the oracle).
    "e9_cluster_silhouette" -> QueryDef(
      build = (s, d) => {
        import graft.ops.KMeans
        val v = Tables.embeddings(s, d)
          .transform(Tables.spread)
          .select(col("vec_id"), col("embedding"))
        val da = sqrt(greatest(col("dist"), lit(0.0)))
        val db = sqrt(greatest(col("dist2"), lit(0.0)))
        KMeans.assignRunnerUp(v, KMeans.seedCentroids(v, 8))
          // identical twin centroids would give b = 0 (= a); the
          // literature convention for an ambiguous point is s = 0, and
          // CaseWhen's lazy branches keep the 0/0 off ANSI's radar
          .withColumn("s_micro",
            floor(when(db === 0.0, lit(0.0)).otherwise((db - da) / db)
              * 1000000.0).cast("long"))
          .groupBy("cluster_id")
          .agg(count(lit(1)).as("n_members"),
            sum(col("s_micro")).as("sum_micro"))
          .withColumn("avg_silhouette",
            col("sum_micro").cast("double") /
              (col("n_members").cast("double") * 1000000.0))
      },
      oracle = Some(s"""
        WITH c0 AS (
          SELECT vec_id AS cid, embedding AS ce
          FROM embeddings ORDER BY vec_id ASC LIMIT 8),
        scored AS (
          SELECT v.vec_id, c.cid,
                 ${sqlDotOf("v.embedding", "v.embedding")}
                   - 2.0 * ${sqlDotOf("v.embedding", "c.ce")}
                   + ${sqlDotOf("c.ce", "c.ce")} AS dist
          FROM embeddings v CROSS JOIN c0 c),
        ranked AS (
          SELECT vec_id, cid, dist,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY dist ASC, cid ASC) AS rn
          FROM scored),
        pair AS (
          SELECT a.vec_id, a.cid AS cluster_id,
                 sqrt(greatest(a.dist, 0.0)) AS da,
                 sqrt(greatest(b.dist, 0.0)) AS db
          FROM ranked a JOIN ranked b
            ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
        sil AS (
          SELECT cluster_id,
                 CAST(floor(CASE WHEN db = 0.0 THEN 0.0
                   ELSE (db - da) / db END * 1000000.0) AS BIGINT) AS s_micro
          FROM pair)
        SELECT cluster_id, count(*) AS n_members,
               CAST(sum(s_micro) AS BIGINT) AS sum_micro,
               CAST(sum(s_micro) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * 1000000.0) AS avg_silhouette
        FROM sil GROUP BY cluster_id""")),

    // E10: scalar-quantization (int8) candidate scan + exact re-rank —
    // the rescoring-tier quantization every production vector store runs
    // (Lucene/faiss SQ8): per-DIMENSION corpus min/max → each component
    // floor-mapped to an integer code 0..255, candidates ranked by the
    // all-integer code dot product, then ONLY the top-50 shortlist gets
    // the full-precision cosine. Complementary to e5's PQ (4-bit-per-
    // component codebooks, sub-linear tier) — SQ keeps per-dim fidelity
    // so the shortlist is near-exact while the scan touches 1 byte/dim
    // instead of 4 (the 100 TB win is memory bandwidth, and integer
    // scoring is exact → the shortlist boundary is hash-stable, no
    // float-tie risk where it matters).
    //
    // Scale: dim stats are a 64-row broadcast (explode is map-side-
    // combinable min/max, never a wide shuffle); code build is row-local
    // after the broadcast join; the candidate scan is the same bounded
    // map-side topK as e1 (|Q|·partitions·50 rows shuffle, never a
    // global window); exact re-rank moves |Q|·50 vectors. Compose with
    // e4's IVF routing when the scan itself must go sub-linear. The
    // quantize step is an indexed transform over the stored embedding
    // against the broadcast pos-sorted stats array — nothing wider than
    // the 64-row stats ever shuffles; ADC integer ties break on vec_id
    // ASC in both engines.
    "e10_sq_rescore" -> QueryDef(
      build = (s, d) => {
        val v = Tables.embeddings(s, d).transform(Tables.spread)
          .localCheckpoint(true) // feeds the code pipeline + both rescore sides
        // dim stats: explode streams straight into the 64-group map-side
        // partial (single consumer — no checkpoint, no wide shuffle)
        val stats = v
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("pos"), col("col").cast("double").as("x"))
          .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
        // ONE row carrying the pos-sorted (mn, mx) array — broadcast it
        // and quantize ROW-LOCALLY with an indexed transform over the
        // stored embedding. The former explode→per-(vec,pos) stats join→
        // groupBy(vec_id) collect_list round-trip shuffled |V|·64 struct
        // rows twice (plus a per-row array_sort) only to reassemble an
        // array this computes in place (r15, guide §2.3/§2.4: the stats
        // are 64 rows of metadata — decide row-locally, shuffle nothing).
        val statsRow = stats
          .agg(array_sort(collect_list(struct(col("pos"), col("mn"), col("mx")))).as("st"))
        val codes = v.crossJoin(broadcast(statsRow))
          .select(col("vec_id"),
            transform(col("embedding"), (x, i) => {
              val st = element_at(col("st"), i + 1)
              val mn = st.getField("mn")
              val mx = st.getField("mx")
              when(mx === mn, lit(0.0))
                .otherwise(least(
                  floor((x.cast("double") - mn) / (mx - mn) * 255.0),
                  lit(255.0)))
            }).as("qv"))
          // feeds the query filter AND the corpus scan side — without the
          // cut the stats agg + quantize transform run per consumer
          .localCheckpoint(true)
        val qs = codes.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("q_id"), col("qv").as("qc"))
        val shortlist = codes.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            call_function("vec_dot", col("qc"), col("qv")).as("adc"))
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(50)(col("adc"), col("vec_id")).as("top"))
          .select(col("q_id"), explode(col("top.id")).as("vec_id"))
        val vn = graft.ops.IvfIndex.normalized(v)
        shortlist
          .join(vn.select(col("vec_id").as("q_id"), col("ne").as("q_ne")), "q_id")
          .join(vn, "vec_id")
          .select(col("q_id"), col("vec_id"),
            call_function("vec_dot", col("q_ne"), col("ne")).as("cos"))
          .filter(!isnan(col("cos")))
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      oracle = Some(s"""
        WITH ex AS (
          SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
          FROM embeddings, unnest(range(1, len(embedding)+1)) AS u(i)),
        st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex GROUP BY 1),
        codes AS (
          SELECT vec_id,
                 list(CASE WHEN mx = mn THEN 0.0
                      ELSE least(floor((x - mn) / (mx - mn) * 255), 255.0) END
                      ORDER BY pos) AS qv
          FROM ex JOIN st USING (pos) GROUP BY vec_id),
        qs AS (SELECT vec_id AS q_id, qv AS qc FROM codes WHERE vec_id % 10 = 0),
        adc AS (
          SELECT q_id, vec_id,
                 list_sum(list_transform(range(1, len(qc)+1),
                   i -> qc[i] * qv[i])) AS adc
          FROM qs CROSS JOIN codes WHERE vec_id <> q_id),
        short AS (
          SELECT q_id, vec_id FROM (
            SELECT q_id, vec_id,
                   row_number() OVER (PARTITION BY q_id
                     ORDER BY adc DESC, vec_id ASC) AS rn
            FROM adc) WHERE rn <= 50),
        n AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(${sqlDotOf("embedding", "embedding")})) AS ne
          FROM embeddings),
        res AS (
          SELECT s.q_id, s.vec_id,
                 list_sum(list_transform(range(1, len(q.ne)+1),
                   i -> q.ne[i] * v.ne[i])) AS cos
          FROM short s JOIN n q ON q.vec_id = s.q_id
          JOIN n v ON v.vec_id = s.vec_id),
        ranked AS (
          SELECT q_id, vec_id, cos,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, vec_id ASC) AS rn
          FROM res WHERE NOT isnan(cos))
        SELECT q_id, vec_id, floor(cos * 1000000) / 1000000.0 AS score, rn
        FROM ranked WHERE rn <= 5"""),
      bench = true),

    // E11: Matryoshka (dimension-truncation) retrieval audit — the third
    // quantization axis next to e5's PQ (subspace codebooks) and e10's SQ
    // (per-dim int8): score a cheap shortlist on the first-32-dim PREFIX
    // (re-normalized, as MRL-trained embedders intend), rerank the top-50
    // shortlist with full 64-dim cosine, and report per-query recall@10
    // against the exact full-dim top-10. On this synthetic corpus (iid
    // dims — the WORST case for truncation, since real MRL training
    // front-loads information) measured mean recall@10 at sf0.01 is
    // 0.70 with prefix=32/shortlist=50 vs 0.435 at prefix=16 — the
    // recall-vs-dims curve a deployment would sweep before picking a
    // truncation point.
    //
    // Scale: prefix scoring reads HALF the vector bytes (at 100 TB the
    // shortlist pass is bandwidth-bound, so truncation is a ~2× scan
    // win); both passes are broadcast-query × corpus scans feeding
    // map-side BoundedTopK — only |Q|·partitions·k candidate rows ever
    // shuffle, and the rerank touches |Q|·50 rows. A zero-norm PREFIX
    // aborts loudly (double 0/0 raises under ANSI); NaN components are
    // screened by the !isnan ranking filters + the e8 pre-flight.
    "e11_matryoshka_recall" -> QueryDef(
      build = (s, d) => {
        val pfx = 32; val short = 50; val k = 10
        val vn = Tables.embeddings(s, d).transform(Tables.spread)
          .withColumn("nrm", norm(col("embedding")))
          .withColumn("pref", slice(col("embedding"), 1, pfx))
          .withColumn("pnrm", norm(col("pref")))
          .select(col("vec_id"), col("label"),
            transform(col("embedding"), x => x.cast("double") / col("nrm")).as("ne"),
            transform(col("pref"), x => x.cast("double") / col("pnrm")).as("pe"))
          // four consumers (queries, two scan passes, rerank) with
          // differing projections — checkpoint once or the normalize
          // pipeline runs per consumer
          .localCheckpoint(true)
        val q = vn.filter(col("label") === 1)
          .select(col("vec_id").as("q_id"), col("ne").as("qne"), col("pe").as("qpe"))
        def topIds(scored: org.apache.spark.sql.DataFrame, kk: Int) = scored
          .filter(col("vec_id") =!= col("q_id"))
          // isNotNull too: isnan(NULL) is false in Spark, so a bare
          // !isnan would pass a NULL score straight into BoundedTopK's
          // no-null input contract (e1/e12 carry the same guard pair)
          .filter(col("sc").isNotNull && !isnan(col("sc")))
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(kk)(col("sc"), col("vec_id")).as("top"))
          .select(col("q_id"), explode(col("top.id")).as("vec_id"))
        val exact = topIds(
          vn.crossJoin(broadcast(q.select(col("q_id"), col("qne"))))
            .select(col("q_id"), col("vec_id"), dot(col("qne"), col("ne")).as("sc")), k)
        val shortlist = topIds(
          vn.crossJoin(broadcast(q.select(col("q_id"), col("qpe"))))
            .select(col("q_id"), col("vec_id"), dot(col("qpe"), col("pe")).as("sc")), short)
        val rerank = topIds(
          shortlist
            .join(q.select(col("q_id"), col("qne")), "q_id")
            .join(vn.select(col("vec_id"), col("ne")), "vec_id")
            .select(col("q_id"), col("vec_id"), dot(col("qne"), col("ne")).as("sc")), k)
        exact
          .join(rerank.withColumn("hit", lit(1)), Seq("q_id", "vec_id"), "left")
          .groupBy(col("q_id"))
          .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
          .select(col("q_id"), col("n_hit"),
            (col("n_hit") / k.toDouble).as("recall_at_10"))
      },
      oracle = Some(s"""
        WITH n AS (
          SELECT vec_id, label,
                 list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(${sqlDotOf("embedding", "embedding")})) AS ne,
                 list_transform(range(1, 33),
                   i -> CAST(embedding[i] AS DOUBLE) / sqrt(list_sum(list_transform(range(1, 33),
                        j -> CAST(embedding[j] AS DOUBLE) * CAST(embedding[j] AS DOUBLE))))) AS pe
          FROM embeddings),
        q AS (SELECT vec_id AS q_id, ne AS qne, pe AS qpe FROM n WHERE label = 1),
        exact AS (
          SELECT q_id, vec_id FROM (
            SELECT q_id, vec_id,
                   row_number() OVER (PARTITION BY q_id
                     ORDER BY sc DESC, vec_id ASC) AS rn
            FROM (SELECT q_id, vec_id,
                    list_sum(list_transform(range(1, 65), i -> qne[i] * ne[i])) AS sc
                  FROM q CROSS JOIN n WHERE vec_id <> q_id)
            WHERE NOT isnan(sc)) WHERE rn <= 10),
        short AS (
          SELECT q_id, vec_id FROM (
            SELECT q_id, vec_id,
                   row_number() OVER (PARTITION BY q_id
                     ORDER BY sc DESC, vec_id ASC) AS rn
            FROM (SELECT q_id, vec_id,
                    list_sum(list_transform(range(1, 33), i -> qpe[i] * pe[i])) AS sc
                  FROM q CROSS JOIN n WHERE vec_id <> q_id)
            WHERE NOT isnan(sc)) WHERE rn <= 50),
        rerank AS (
          SELECT q_id, vec_id FROM (
            SELECT q_id, vec_id,
                   row_number() OVER (PARTITION BY q_id
                     ORDER BY sc DESC, vec_id ASC) AS rn
            FROM (SELECT s.q_id, s.vec_id,
                    list_sum(list_transform(range(1, 65), i -> qne[i] * nn.ne[i])) AS sc
                  FROM short s JOIN q USING (q_id) JOIN n nn ON s.vec_id = nn.vec_id)
            WHERE NOT isnan(sc)) WHERE rn <= 10)
        SELECT e.q_id, CAST(count(r.vec_id) AS BIGINT) AS n_hit,
               count(r.vec_id) / 10.0 AS recall_at_10
        FROM exact e LEFT JOIN rerank r ON e.q_id = r.q_id AND e.vec_id = r.vec_id
        GROUP BY 1""")),

    // E12: metadata-FILTERED vector search — top-5 cosine neighbors where
    // both query and candidate must satisfy a document predicate
    // (lang = 'en' AND n_chars >= 300). The production "filtered ANN"
    // workload: RAG retrieval with a tenant/language/recency filter.
    //
    // Scale: the filter applies BEFORE any pair forms (pre-filtering, not
    // post-filtering) — the predicate lives on the metadata table, pushes
    // into its parquet scan, and reaches the vector corpus as a key-only
    // semi join (broadcast here; a doc-keyed semi join at 100 TB — or
    // free, when embeddings are stored inline with their metadata). The
    // O(|Q|·|V'|) scoring scan then runs over the SURVIVORS |V'|, so a
    // 1 % predicate cuts scoring 10^4× vs post-filtering the top-k (which
    // also under-fills k — the classic post-filter recall hole). Scoring
    // itself is e1's shape: broadcast queries, corpus streams, map-side
    // BoundedTopK shuffles |Q|·partitions·5 candidate rows only.
    "e12_filtered_ann" -> QueryDef(
      build = (s, d) => {
        val keys = Tables.documents(s, d)
          .filter(col("lang") === "en" && col("n_chars") >= 300)
          .select(col("doc_id").as("vec_id"))
        val vn = Tables.embeddings(s, d)
          .transform(Tables.spread)
          .join(broadcast(keys), "vec_id")
          .withColumn("nrm", norm(col("embedding")))
          .select(col("vec_id"), col("label"),
            transform(col("embedding"), x => x.cast("double") / col("nrm")).as("ne"))
        // q and the corpus both read the frame above, so its scan+join
        // runs twice — DELIBERATELY not checkpointed (unlike d4/e5):
        // materializing the whole filtered corpus would be a 100 TB
        // barrier, while the q-side re-scan is cheap (label + key
        // filters push into it) and the corpus side streams once.
        // Same posture as e1.
        val q = vn.filter(col("label") === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
        vn.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            call_function("vec_dot", col("q_ne"), col("ne")).as("cos"))
          // null/NaN scores rank nowhere (NaN would top Double.compare)
          .filter(col("cos").isNotNull && !isnan(col("cos")))
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("vec_id"),
            (floor(col("col.score") * 1000000) / 1000000.0).as("score"),
            (col("pos") + 1).cast("long").as("rn"))
      },
      bench = true,
      oracle = Some(s"""
        WITH keys AS (
          SELECT doc_id AS vec_id FROM documents
          WHERE lang = 'en' AND n_chars >= 300),
        n AS (
          SELECT vec_id, label,
                 list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(${sqlDotOf("embedding", "embedding")})) AS ne
          FROM embeddings JOIN keys USING (vec_id)),
        q AS (SELECT vec_id AS q_id, ne AS qe FROM n WHERE label = 0),
        pairs AS (
          SELECT q_id, vec_id,
                 list_sum(list_transform(range(1, len(qe)+1), i -> qe[i] * ne[i])) AS cos
          FROM q CROSS JOIN n
          WHERE vec_id <> q_id),
        ranked AS (
          SELECT q_id, vec_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
          FROM pairs
          WHERE cos IS NOT NULL AND NOT isnan(cos))
        SELECT q_id, vec_id, floor(cos * 1000000) / 1000000.0 AS score, rn
        FROM ranked WHERE rn <= 5""")),

    // E13: MMR diversity re-ranking (Carbonell & Goldstein 1998) — from
    // each query's exact top-20 shortlist, greedily select 5 results
    // maximizing λ·rel(c) − (1−λ)·max_{s∈picked} sim(c, s) with λ = 0.7:
    // the de-duplicating re-rank every production retrieval/RAG stack
    // runs after ANN (near-identical chunks crowd out coverage
    // otherwise). The empty-set round uses max_sim(∅) = 0, so ONE
    // formula covers all five rounds.
    //
    // Exactness: rel and pairwise sims are floor-scaled micro-cos longs,
    // and λ rides as the exact integer pair (70, 30) — every greedy
    // round is pure integer arithmetic with a total (mmr DESC, vec_id)
    // order, so the pick sequence is deterministic and hash-verifiable
    // against 4 unrolled oracle rounds (the gr1 unrolled-CTE pattern).
    //
    // Scale: the corpus appears ONLY as two streams — the e1-shaped
    // scoring pass (broadcast queries, map-side BoundedTopK) and one
    // enrich pass probing the broadcast |Q|·20 shortlist (never a
    // corpus shuffle or corpus broadcast). The greedy rounds then run
    // INSIDE one row-local higher-order expression over the per-query
    // collected shortlist (a 20-element array, ~10 KB/row): all five
    // picks, including the pairwise max-sim terms, are computed in a
    // single distributed pass with zero extra jobs. This replaced the
    // round-9..13 shape (per-round DataFrame join + window + eager
    // localCheckpoint = ~20 sequential ~80 ms scheduler rounds, 5.6 s
    // at sf0.1 dominated by job launch, and a checkpointed |Q|·20·19
    // sim table that was pure overhead). Sims are computed lazily per
    // round — greedy MMR only ever needs sim(candidate, picked), ≤
    // 20·(1+2+3+4) dots per query vs the 190 the materialized table
    // paid — and the per-query state is O(k·dim), so the operator
    // scales with the WORKLOAD (|Q|) while the corpus cost stays e1's.
    "e13_mmr_rerank" -> QueryDef(
      build = (s, d) => {
        val vn = Tables.embeddings(s, d)
          .transform(Tables.spread)
          .withColumn("nrm", norm(col("embedding")))
          .select(col("vec_id"), col("label"),
            transform(col("embedding"), x => x.cast("double") / col("nrm")).as("ne"))
        // NOT checkpointed (the e1/e12 posture): the corpus touches the
        // plan exactly twice, both as STREAMS — the scoring pass below
        // and the one shortlist-enrich pass (broadcast probe) after it.
        val q = vn.filter(col("label") === 0)
          .select(col("vec_id").as("q_id"), col("ne").as("q_ne"))
        val short = vn.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            call_function("vec_dot", col("q_ne"), col("ne")).as("cos"))
          .filter(col("cos").isNotNull && !isnan(col("cos")))
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(20)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), explode(col("top")).as("c"))
          .select(col("q_id"), col("c.id").as("vec_id"),
            floor(col("c.score") * 1000000).cast("long").as("rel"))
        // ONE corpus pass enriches the |Q|·20 shortlist with its vectors:
        // the corpus streams against the broadcast shortlist probe (never
        // a corpus shuffle or corpus broadcast) — everything downstream
        // is |Q|·20, collected to one ~10 KB array row per query.
        val shortV = vn.select(col("vec_id"), col("ne"))
          .join(broadcast(short), "vec_id")
        val grouped = shortV.groupBy(col("q_id"))
          .agg(collect_list(struct(col("vec_id"), col("rel"), col("ne"))).as("cs"))
        // All five greedy rounds as one row-local expression. Exactness
        // contract with the oracle: sims are vec_dot (sequential fold ≡
        // DuckDB list_sum) floor-scaled to micro-cos BIGINTs, mmr is pure
        // integer arithmetic (70·rel − 30·max_sim), and the argmax folds
        // left-to-right with the total (mmr DESC, vec_id ASC) order — the
        // same pick the old per-round row_number window produced. A round
        // with no remaining candidates contributes NULL, filtered before
        // append, and later rounds keep their own rank t (the old loop's
        // literal-t semantics). max-sim starts at Long.MinValue: for t≥2
        // the picked set is non-empty, so greatest() always sees ≥1 real
        // sim before the candidate's mmr forms.
        val pickT = "STRUCT<vec_id: BIGINT, pick_rank: BIGINT, mmr: BIGINT, ne: ARRAY<DOUBLE>>"
        def argmax(xs: String) = s"""
          aggregate($xs, CAST(NULL AS $pickT),
            (b, s) -> CASE WHEN b IS NULL OR s.mmr > b.mmr
                            OR (s.mmr = b.mmr AND s.vec_id < b.vec_id)
                       THEN s ELSE b END)"""
        val round1 = argmax(s"""
          transform(cs, c -> named_struct(
            'vec_id', c.vec_id, 'pick_rank', CAST(1 AS BIGINT),
            'mmr', 70 * c.rel, 'ne', c.ne))""")
        val roundT = argmax(s"""
          transform(
            filter(cs, c -> NOT exists(acc, p -> p.vec_id = c.vec_id)),
            c -> named_struct(
              'vec_id', c.vec_id, 'pick_rank', CAST(t AS BIGINT),
              'mmr', 70 * c.rel - 30 * aggregate(acc,
                CAST(-9223372036854775808 AS BIGINT),
                (m, p) -> greatest(m,
                  CAST(floor(vec_dot(c.ne, p.ne) * 1000000) AS BIGINT))),
              'ne', c.ne))""")
        grouped
          .withColumn("picks", expr(s"""
            aggregate(sequence(2, 5),
              filter(array($round1), x -> x IS NOT NULL),
              (acc, t) -> concat(acc,
                filter(array($roundT), x -> x IS NOT NULL)))"""))
          .select(col("q_id"), explode(col("picks")).as("p"))
          .select(col("q_id"), col("p.vec_id").as("vec_id"),
            col("p.pick_rank").as("pick_rank"), col("p.mmr").as("mmr"))
      },
      // benched since round 9: the MMR round machinery (checkpoint-cut
      // greedy rounds) had no regression tripwire — its measured-flat
      // scaling only stays flat while the checkpoint placement holds
      bench = true,
      oracle = Some(s"""
        WITH n AS (
          SELECT vec_id, label,
                 list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(${sqlDotOf("embedding", "embedding")})) AS ne
          FROM embeddings),
        q AS (SELECT vec_id AS q_id, ne AS qe FROM n WHERE label = 0),
        sc AS (
          SELECT q_id, vec_id,
                 list_sum(list_transform(range(1, len(qe)+1), i -> qe[i] * ne[i])) AS cos
          FROM q CROSS JOIN n WHERE vec_id <> q_id),
        short AS (
          SELECT q_id, vec_id, CAST(floor(cos * 1000000) AS BIGINT) AS rel
          FROM (SELECT q_id, vec_id, cos,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, vec_id ASC) AS rn
                FROM sc WHERE cos IS NOT NULL AND NOT isnan(cos))
          WHERE rn <= 20),
        pr AS (
          SELECT s1.q_id, s1.vec_id AS a, s2.vec_id AS b,
                 CAST(floor(list_sum(list_transform(range(1, len(na.ne)+1),
                   i -> na.ne[i] * nb.ne[i])) * 1000000) AS BIGINT) AS sim
          FROM short s1 JOIN short s2
            ON s1.q_id = s2.q_id AND s1.vec_id <> s2.vec_id
          JOIN n na ON na.vec_id = s1.vec_id
          JOIN n nb ON nb.vec_id = s2.vec_id),
        p1 AS (
          SELECT q_id, vec_id, 70 * rel AS mmr FROM
            (SELECT q_id, vec_id, rel, row_number() OVER (PARTITION BY q_id
               ORDER BY rel DESC, vec_id) AS rn FROM short) WHERE rn = 1),
        c2 AS (
          SELECT s.q_id, s.vec_id, s.rel, max(pr.sim) AS msim
          FROM short s
          JOIN pr ON pr.q_id = s.q_id AND pr.a = s.vec_id
          JOIN p1 ON p1.q_id = pr.q_id AND p1.vec_id = pr.b
          WHERE NOT EXISTS (SELECT 1 FROM p1 x
            WHERE x.q_id = s.q_id AND x.vec_id = s.vec_id)
          GROUP BY 1, 2, 3),
        p2 AS (
          SELECT q_id, vec_id, mmr FROM
            (SELECT q_id, vec_id, 70 * rel - 30 * msim AS mmr,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY 70 * rel - 30 * msim DESC, vec_id) AS rn FROM c2)
          WHERE rn = 1),
        sel2 AS (SELECT q_id, vec_id FROM p1 UNION ALL SELECT q_id, vec_id FROM p2),
        c3 AS (
          SELECT s.q_id, s.vec_id, s.rel, max(pr.sim) AS msim
          FROM short s
          JOIN pr ON pr.q_id = s.q_id AND pr.a = s.vec_id
          JOIN sel2 ON sel2.q_id = pr.q_id AND sel2.vec_id = pr.b
          WHERE NOT EXISTS (SELECT 1 FROM sel2 x
            WHERE x.q_id = s.q_id AND x.vec_id = s.vec_id)
          GROUP BY 1, 2, 3),
        p3 AS (
          SELECT q_id, vec_id, mmr FROM
            (SELECT q_id, vec_id, 70 * rel - 30 * msim AS mmr,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY 70 * rel - 30 * msim DESC, vec_id) AS rn FROM c3)
          WHERE rn = 1),
        sel3 AS (SELECT q_id, vec_id FROM sel2 UNION ALL SELECT q_id, vec_id FROM p3),
        c4 AS (
          SELECT s.q_id, s.vec_id, s.rel, max(pr.sim) AS msim
          FROM short s
          JOIN pr ON pr.q_id = s.q_id AND pr.a = s.vec_id
          JOIN sel3 ON sel3.q_id = pr.q_id AND sel3.vec_id = pr.b
          WHERE NOT EXISTS (SELECT 1 FROM sel3 x
            WHERE x.q_id = s.q_id AND x.vec_id = s.vec_id)
          GROUP BY 1, 2, 3),
        p4 AS (
          SELECT q_id, vec_id, mmr FROM
            (SELECT q_id, vec_id, 70 * rel - 30 * msim AS mmr,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY 70 * rel - 30 * msim DESC, vec_id) AS rn FROM c4)
          WHERE rn = 1),
        sel4 AS (SELECT q_id, vec_id FROM sel3 UNION ALL SELECT q_id, vec_id FROM p4),
        c5 AS (
          SELECT s.q_id, s.vec_id, s.rel, max(pr.sim) AS msim
          FROM short s
          JOIN pr ON pr.q_id = s.q_id AND pr.a = s.vec_id
          JOIN sel4 ON sel4.q_id = pr.q_id AND sel4.vec_id = pr.b
          WHERE NOT EXISTS (SELECT 1 FROM sel4 x
            WHERE x.q_id = s.q_id AND x.vec_id = s.vec_id)
          GROUP BY 1, 2, 3),
        p5 AS (
          SELECT q_id, vec_id, mmr FROM
            (SELECT q_id, vec_id, 70 * rel - 30 * msim AS mmr,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY 70 * rel - 30 * msim DESC, vec_id) AS rn FROM c5)
          WHERE rn = 1)
        SELECT q_id, vec_id, CAST(k AS BIGINT) AS pick_rank,
               CAST(mmr AS BIGINT) AS mmr
        FROM (
          SELECT q_id, vec_id, 1 AS k, mmr FROM p1
          UNION ALL SELECT q_id, vec_id, 2, mmr FROM p2
          UNION ALL SELECT q_id, vec_id, 3, mmr FROM p3
          UNION ALL SELECT q_id, vec_id, 4, mmr FROM p4
          UNION ALL SELECT q_id, vec_id, 5, mmr FROM p5)"""))
  )
}
