"""Dedup (exact / minhash-LSH / simhash) and embedding similarity search."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from grenier_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs_with_plants(spark):
    """sf0.01 documents + planted near-duplicates: for 10 docs append a copy
    with the last word dropped (near-dup) and one exact copy."""
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text").where("length(text) > 100").limit(200)
    base = docs.toPandas()
    plants = base.head(10).copy()
    near = plants.copy()
    near["doc_id"] = near.doc_id + 1_000_000
    near["text"] = near.text.str.rsplit(" ", n=1).str[0]
    exact = plants.copy()
    exact["doc_id"] = exact.doc_id + 2_000_000
    full = pd.concat([base, near, exact], ignore_index=True)
    return spark.createDataFrame(full)


def test_exact_dup_groups(spark, docs_with_plants):
    groups = dedup.exact_dup_groups(docs_with_plants).toPandas()
    assert len(groups) == 10
    assert (groups.n_copies == 2).all()
    for r in groups.itertuples():
        assert r.keep_id + 2_000_000 in r.all_ids


def test_exact_dup_groups_salt_split_caps_ids(spark):
    """A dup cluster larger than max_ids: n_copies stays exact, all_ids is
    exactly the max_ids smallest ids, and the salt-split two-stage shape
    (no window) produces the same set at any n_salts."""
    rows = [(i, "same text here") for i in range(250)] + [(1000, "unique")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n_salts in (1, 8, 64):
        g = dedup.exact_dup_groups(df, max_ids=100,
                                   n_salts=n_salts).toPandas()
        assert len(g) == 1
        r = g.iloc[0]
        assert r.n_copies == 250 and r.keep_id == 0
        assert list(r.all_ids) == list(range(100))
    assert "Window" not in dedup.exact_dup_groups(df)._jdf \
        .queryExecution().executedPlan().toString()


def test_token_seq_dup_members(spark):
    """Dedup keyed on the pre-tokenized payload: duplicates = identical
    token ARRAYS. Covers the serialization contract (comma-joined decimals
    are unambiguous: [1,23] != [12,3]; prefixes differ), the NULL-array
    singleton rule, and duplicate EMPTY arrays."""
    rows = [(1, [5, -7, 9]), (2, [5, -7, 9]),   # dup pair
            (3, [5, -7]),                       # prefix: NOT a dup
            (10, [1, 23]), (11, [12, 3]),       # join-ambiguity probe
            (4, None), (5, None),               # NULLs: singletons, kept
            (6, []), (7, [])]                   # empty arrays ARE equal
    df = spark.createDataFrame(rows, "doc_id long, tokens array<long>")
    got = dedup.token_seq_dup_members(df).toPandas()
    assert sorted(got.doc_id) == [1, 2, 6, 7]
    by_id = got.set_index("doc_id")
    assert bool(by_id.loc[1, "is_keep"]) and not bool(by_id.loc[2, "is_keep"])
    assert bool(by_id.loc[6, "is_keep"]) and not bool(by_id.loc[7, "is_keep"])
    assert by_id.loc[1, "n_tok"] == 3 and by_id.loc[6, "n_tok"] == 0
    assert by_id.loc[1, "seq_hash"] == by_id.loc[2, "seq_hash"]
    assert by_id.loc[1, "seq_hash"] != by_id.loc[6, "seq_hash"]


def test_token_seq_dedup_keep_first(spark):
    rows = [(1, [5, -7, 9], "a"), (2, [5, -7, 9], "b"), (3, [5, -7], "c"),
            (4, None, "d"), (5, None, "e"), (6, [], "f"), (7, [], "g")]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<long>, extra string")
    kept = dedup.token_seq_dedup_keep_first(df).toPandas()
    assert sorted(kept.doc_id) == [1, 3, 4, 5, 6]
    # full rows survive, survivor = lowest id of each group
    assert set(kept.columns) == {"doc_id", "tokens", "extra"}
    assert kept.set_index("doc_id").loc[1, "extra"] == "a"


def test_minhash_lsh_finds_planted_neardups(spark, docs_with_plants):
    sigs = dedup.minhash_signatures(docs_with_plants, n_hashes=64, seed=42)
    pairs = dedup.lsh_candidate_pairs(sigs, min_est_jaccard=0.5)
    verified = dedup.exact_jaccard_for_pairs(
        docs_with_plants, pairs).toPandas()
    found = {(r.id_a, r.id_b) for r in verified.itertuples()
             if r.jaccard >= 0.7}
    for base_id in spark.createDataFrame(
            [(i,) for i in range(10)], "i int").toPandas().i:
        pass
    planted = {(int(a), int(a) + 1_000_000)
               for a in verified.id_a.unique() if a < 1_000_000}
    # every planted near-dup pair (doc, doc+1M) must be recovered
    got_bases = {int(r.id_a) for r in verified.itertuples()
                 if r.id_b == r.id_a + 1_000_000 and r.jaccard >= 0.7}
    base_ids = set(
        docs_with_plants.where("doc_id >= 1000000 and doc_id < 2000000")
        .select((F.col("doc_id") - 1_000_000).alias("b")).toPandas().b)
    assert base_ids <= got_bases, base_ids - got_bases
    # estimated jaccard correlates with exact
    err = (verified.est_jaccard - verified.jaccard).abs()
    assert err.mean() < 0.15


def test_minhash_signatures_deterministic(spark, docs_with_plants):
    s1 = dedup.minhash_signatures(docs_with_plants.limit(20), seed=1) \
        .orderBy("doc_id").toPandas()
    s2 = dedup.minhash_signatures(docs_with_plants.limit(20).repartition(4),
                                  seed=1).orderBy("doc_id").toPandas()
    for a, b in zip(s1.sig, s2.sig):
        assert list(a) == list(b)


def test_simhash_finds_neardups_and_is_deterministic(spark, docs_with_plants):
    fps = dedup.simhash64(docs_with_plants)
    cands = dedup.simhash_candidates(fps, max_hamming=3).toPandas()
    # exact copies have identical simhash -> hamming 0, must all be found
    pairs = {(r.id_a, r.id_b): r.hamming for r in cands.itertuples()}
    exact_pairs = [(a, a + 2_000_000) for a in
                   docs_with_plants.where("doc_id >= 2000000")
                   .select((F.col("doc_id") - 2_000_000).alias("b"))
                   .toPandas().b]
    for p in exact_pairs:
        assert p in pairs and pairs[p] == 0, p
    fps2 = dedup.simhash64(docs_with_plants.repartition(5)).orderBy("doc_id")
    fps1 = fps.orderBy("doc_id")
    assert fps1.toPandas().simhash.tolist() == fps2.toPandas().simhash.tolist()


def test_simhash_banding_invariant_output(spark, docs_with_plants):
    """The verified pair set is identical for any valid block count
    (pigeonhole completeness) — the 8-block scale layout may be swapped in
    without touching results."""
    fps = dedup.simhash64(docs_with_plants)
    p4 = {(r.id_a, r.id_b, r.hamming) for r in
          dedup.simhash_candidates(fps, max_hamming=3, n_blocks=4).collect()}
    p8 = {(r.id_a, r.id_b, r.hamming) for r in
          dedup.simhash_candidates(fps, max_hamming=3, n_blocks=8).collect()}
    assert p4 == p8 and len(p4) >= 10


def _random_fps(spark, n):
    from grenier_spark.core.bits import splitmix64

    ids = np.arange(n, dtype=np.uint64)
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": ids.astype(np.int64),
        "simhash": splitmix64(ids + np.uint64(0xD1CE)).view(np.int64)}))


def test_simhash_candidate_volume_scales_linearly(spark):
    """VERDICT r2 #2 'done' criterion: with anchors >= log2(N) bits the
    candidate count is bounded ~linearly in N (O(1) expected bucket
    occupancy), while the fixed 4x16 layout's candidates grow ~N^2/65k.

    Random fingerprints: every candidate is a bucket collision, none
    survive the hamming<=3 verify, so the candidate-stage count isolates
    the banding's join volume."""
    import math

    n, occ = 10_000, 0.001
    b_scale = dedup.simhash_blocks_for(2 * n, target_occupancy=occ)
    assert b_scale > 4  # the helper must actually widen the anchors
    n_tables = math.comb(b_scale, b_scale - 3)
    counts = {}
    for nn in (n, 2 * n):
        fps = _random_fps(spark, nn)
        for blocks in (4, b_scale):
            counts[(nn, blocks)] = dedup.simhash_candidate_pairs(
                fps, n_blocks=blocks).count()
        # the linear bound the occupancy target buys: expected candidates
        # <= n_tables * N * occ / 2 (4x slack for Poisson noise)
        assert counts[(nn, b_scale)] <= max(20, 2 * n_tables * nn * occ)
    # the fixed 4x16 layout violates that same per-N linear bound by
    # orders of magnitude (candidates ~ C(N,2)*4/65536, i.e. quadratic:
    # ~4x growth when N doubles)
    assert counts[(2 * n, 4)] > 20 * (2 * n_tables * 2 * n * occ)
    assert counts[(2 * n, 4)] > 3.0 * counts[(n, 4)] > 0
    assert counts[(2 * n, b_scale)] < counts[(2 * n, 4)] / 50


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_cosine_topk_matches_numpy(spark, embeddings):
    queries = (embeddings.orderBy("vec_id").limit(3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = similarity.cosine_topk(embeddings, queries, k=5).toPandas()
    pdf = embeddings.orderBy("vec_id").toPandas()
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in [0, 1, 2]:
        sims = mat_n @ mat_n[qid]
        order = np.lexsort((pdf.vec_id.to_numpy(), -sims))[:5]
        expect = list(pdf.vec_id.to_numpy()[order])
        gotq = list(got[got.query_id == qid].sort_values("rank").vec_id)
        assert gotq == expect, (qid, gotq, expect)


def test_lsh_topk_recall(spark, embeddings):
    queries = (embeddings.orderBy("vec_id").limit(5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = similarity.cosine_topk(embeddings, queries, k=10).toPandas()
    # synthetic random embeddings have weak cosine structure: near-neighbor
    # sims sit close to the bulk, so recall needs many short bands
    approx = similarity.lsh_topk(embeddings, queries, k=10,
                                 bands=32, band_bits=4, seed=42).toPandas()
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls


def test_lsh_topk_deterministic(spark, embeddings):
    queries = (embeddings.orderBy("vec_id").limit(2)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    a = similarity.lsh_topk(embeddings, queries, k=5, seed=7).toPandas()
    b = similarity.lsh_topk(embeddings.repartition(7), queries, k=5,
                            seed=7).toPandas()
    key = ["query_id", "rank"]
    assert a.sort_values(key).vec_id.tolist() == \
        b.sort_values(key).vec_id.tolist()


def test_ngram_jaccard_pairs_exact_values(spark):
    """Hand-computed 3-gram Jaccard on tiny docs: doc1 'a b c d' has
    shingles {abc, bcd}; doc2 'a b c d e' has {abc, bcd, cde} ->
    J = 2/3; doc3 shares nothing; doc4 too short for any shingle."""
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d e"), (3, "x y z w"), (4, "a b")],
        "doc_id long, text string")
    got = dedup.ngram_word_jaccard_pairs(df, tau=0.5).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.id_a, r.id_b, r.inter, r.union_sz) == (1, 2, 2, 3)
    assert r.jaccard == round(2 / 3, 6)


def test_ngram_containment_pairs_exact_values(spark):
    """Hand-computed containment: doc1 'a b c d' ({abc, bcd}) is fully
    contained in doc2 'a b c d e f' ({abc, bcd, cde, def}) -> C = 2/2 = 1
    while Jaccard is only 0.5; doc3 half-overlaps doc1 (shares bcd only:
    C = 1/2, below tau)."""
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d e f"), (3, "b c d z")],
        "doc_id long, text string")
    got = dedup.ngram_containment_pairs(df, tau=0.8).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.id_a, r.id_b, r.inter, r.n_a, r.n_b) == (1, 2, 2, 2, 4)
    assert r.containment == 1.0
    # same docs under Jaccard at the same tau: nothing survives
    assert len(dedup.ngram_word_jaccard_pairs(df, tau=0.8).toPandas()) == 0


def test_ngram_jaccard_recovers_exact_dups(spark, docs_with_plants):
    """Exact copies have Jaccard 1.0; near-dups (last word dropped) stay
    above 0.8 for 100+-word docs."""
    got = dedup.ngram_word_jaccard_pairs(docs_with_plants, tau=0.8).toPandas()
    exact = got[got.jaccard == 1.0]
    plants = {(int(r.id_a), int(r.id_a) + 2_000_000) for r in exact.itertuples()
              if r.id_b == r.id_a + 2_000_000}
    assert len(plants) == 10


def test_cosine_neardup_pairs_exact_values(spark):
    """Orthogonal vs parallel vs 45-degree vectors."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [0.0, 1.0]), (4, [1.0, 1.0])],
        "vec_id long, embedding array<double>")
    got = similarity.cosine_neardup_pairs(df, tau=0.9).toPandas()
    assert set(zip(got.id_a, got.id_b)) == {(1, 2)}
    assert (got.cos_sim == 1.0).all()
    lower = similarity.cosine_neardup_pairs(df, tau=0.7).toPandas()
    assert set(zip(lower.id_a, lower.id_b)) == \
        {(1, 2), (1, 4), (2, 4), (3, 4)}
    forty5 = lower[lower.id_b == 4]
    assert np.allclose(forty5.cos_sim, round(1 / np.sqrt(2), 6))


def test_cosine_neardup_pairs_guards_corpus_wide_calls(spark):
    """The all-pairs exact verify stage must refuse an accidental
    corpus-wide call (N^2 pairs is the one scale-killer in the suite) —
    explicit allow_all_pairs=True overrides (VERDICT r3 #3)."""
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="ALL-PAIRS"):
        similarity.cosine_neardup_pairs(df, tau=0.9, max_rows=5)
    out = similarity.cosine_neardup_pairs(
        df, tau=0.9, max_rows=5, allow_all_pairs=True).toPandas()
    assert len(out) > 0  # override really runs the join


def test_lsh_topk_rademacher_recall_and_determinism(spark, embeddings):
    """The SQL-oracle-able Rademacher variant must hit the same recall bar
    as the gaussian one and be partitioning-invariant."""
    queries = (embeddings.orderBy("vec_id").limit(5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = similarity.cosine_topk(embeddings, queries, k=10).toPandas()
    approx = similarity.lsh_topk_rademacher(
        embeddings, queries, k=10, bands=32, band_bits=4, seed=42).toPandas()
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls
    again = similarity.lsh_topk_rademacher(
        embeddings.repartition(7), queries, k=10,
        bands=32, band_bits=4, seed=42).toPandas()
    key = ["query_id", "rank"]
    assert approx.sort_values(key).vec_id.tolist() == \
        again.sort_values(key).vec_id.tolist()


def test_winnow_fingerprints_properties(spark):
    """Winnowing guarantees (SWA 2003): identical docs -> identical
    fingerprint sets; a shared substring of length >= k + window - 1
    contributes >= 1 shared fingerprint; short docs -> empty."""
    from grenier_spark.operators.textstats import winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base), (2, base), (3, base + " with a different tail here"),
            (4, "zzz"), (5, "completely unrelated content xyzw qrst uvab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: set(r.fps) for r in df.select(
        "doc_id", winnow_fingerprints("text").alias("fps")).collect()}
    assert got[1] == got[2] and len(got[1]) > 0
    assert len(got[1] & got[3]) >= 1          # shared prefix survives
    assert got[4] == set()                    # shorter than k
    assert len(got[1] & got[5]) == 0          # disjoint content


def test_ivf_topk_planted_copies_and_determinism(spark, embeddings):
    """IVF-flat: a perturbed copy of a vector must land in its source's
    cell (near-identical cosine profile to the centroids) and come back as
    the top-1 neighbor when queried; results are partitioning-invariant."""
    import pandas as pd

    base = embeddings.orderBy("vec_id").limit(40).toPandas()
    plants = base.head(5).copy()
    plants["vec_id"] = plants.vec_id + 1_000_000
    plants["embedding"] = plants.embedding.map(
        lambda v: [float(v[0]) + 0.05] + [float(x) for x in v[1:]])
    base["embedding"] = base.embedding.map(
        lambda v: [float(x) for x in v])
    full = spark.createDataFrame(pd.concat([base, plants],
                                           ignore_index=True))
    queries = (full.where("vec_id >= 1000000")
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = similarity.ivf_topk(full, queries, k=3, n_centroids=8,
                              n_probe=2).toPandas()
    for qid in queries.toPandas().query_id:
        top = got[(got.query_id == qid) & (got["rank"] == 1)]
        # rank 1 is the planted copy itself (cos 1.0); rank 2 its source
        nxt = got[(got.query_id == qid) & (got["rank"] == 2)]
        assert int(top.vec_id.iloc[0]) == int(qid)
        assert int(nxt.vec_id.iloc[0]) == int(qid) - 1_000_000, qid

    again = similarity.ivf_topk(full.repartition(7), queries, k=3,
                                n_centroids=8, n_probe=2).toPandas()
    key = ["query_id", "rank"]
    assert got.sort_values(key).vec_id.tolist() == \
        again.sort_values(key).vec_id.tolist()


def test_ivf_kmeans_refinement_beats_sampling(spark):
    """VERDICT r2 #6: Lloyd-refined centroids (ivf_refine_centroids) beat
    the lowest-id sampled quantizer at fixed n_probe on clustered data.

    Adversarial-for-sampling layout: 8 Gaussian blobs on the unit sphere,
    ids ordered so the 16 LOWEST ids all sit in blob 0 — the sampled
    quantizer gets 16 near-identical centroids and its cells carve noise,
    while 5 Lloyd iterations separate the blobs."""
    rng = np.random.default_rng(7)
    dim, n_blobs, per_blob = 16, 8, 125
    centers = rng.standard_normal((n_blobs, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    blob = np.repeat(np.arange(n_blobs), per_blob)
    # ids 0..124 are blob 0 -> the 16 lowest-id vectors are one blob
    vecs = centers[blob] + 0.15 * rng.standard_normal((len(blob), dim))
    vdf = spark.createDataFrame(pd.DataFrame(
        {"vec_id": np.arange(len(blob), dtype=np.int64),
         "embedding": [v.tolist() for v in vecs]}))
    qidx = rng.choice(len(blob), size=10, replace=False)
    qdf = spark.createDataFrame(pd.DataFrame(
        {"query_id": np.arange(10, dtype=np.int64),
         "embedding": [vecs[i].tolist() for i in qidx]}))

    truth = similarity.cosine_topk(vdf, qdf, k=10).toPandas()
    want = {q: set(g.vec_id) for q, g in truth.groupby("query_id")}

    def recall(res):
        got = {q: set(g.vec_id) for q, g in res.groupby("query_id")}
        return np.mean([len(got.get(q, set()) & want[q]) / len(want[q])
                        for q in want])

    sampled = recall(similarity.ivf_topk(
        vdf, qdf, k=10, n_centroids=16, n_probe=2).toPandas())
    C = similarity.ivf_refine_centroids(vdf, n_centroids=16, n_iter=5)
    refined = recall(similarity.ivf_topk(
        vdf, qdf, k=10, n_centroids=16, n_probe=2, centroids=C).toPandas())
    assert refined > sampled + 0.1, (refined, sampled)
    assert refined >= 0.9, refined


def test_connected_components_chain_and_singletons(spark):
    """Min-label propagation: a 4-chain collapses to its min id (needs 3
    propagation rounds — true transitivity, not one-hop), disjoint pairs
    stay separate, isolated nodes become singletons."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in
                                   [1, 2, 3, 4, 10, 11, 20, 21, 99]],
                                  "id long")
    got = {r.id: r.component_id for r in
           dedup.connected_components(edges, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 20: 20, 21: 20, 99: 99}


def test_connected_components_raises_on_nonconvergence(spark):
    """A component whose diameter exceeds max_iter must fail loudly —
    silent truncation would report one chain as several components."""
    chain = spark.createDataFrame([(i, i + 1) for i in range(6)],
                                  "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iter=2).collect()
    # the same chain converges with enough rounds
    got = dedup.connected_components(chain, max_iter=10).toPandas()
    assert set(got.component_id) == {0}


def _union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min member id
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ms) for ms in comp.values() for n in ms}


def test_star_components_match_union_find_random_graphs(spark):
    """Large-star/small-star vs an exact union-find on random sparse
    graphs with shuffled non-contiguous ids (min-id labels must NOT
    depend on ids being dense or ordered)."""
    rng = np.random.default_rng(7)
    for trial in range(3):
        ids = rng.permutation(10_000)[:120] * 13 + 5
        n_edges = int(rng.integers(30, 140))
        edges = [(int(ids[rng.integers(len(ids))]),
                  int(ids[rng.integers(len(ids))]))
                 for _ in range(n_edges)]
        exp = _union_find_components(edges, [int(i) for i in ids])
        out = dedup.connected_components_star(
            spark.createDataFrame(edges, "id_a long, id_b long"),
            nodes=spark.createDataFrame([(int(i),) for i in ids],
                                        "id long"))
        got = {r.id: r.component_id for r in out.collect()}
        out.unpersist()
        assert got == exp, f"trial {trial}"


def test_star_components_resolve_deep_path_in_log_rounds(spark):
    """A 300-node path has diameter 299: min-label propagation would need
    ~300 iterations, the star rounds halve diameter — 300 nodes must
    resolve within 12 rounds (2^12 >> 300) to one component."""
    short = spark.createDataFrame([(i, i + 1) for i in range(49)],
                                  "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(short, max_iter=3).collect()
    chain = spark.createDataFrame([(i, i + 1) for i in range(299)],
                                  "id_a long, id_b long")
    out = dedup.connected_components_star(chain, max_rounds=12)
    got = out.toPandas()
    out.unpersist()
    assert len(got) == 300 and set(got.component_id) == {0}


def test_star_components_singletons_and_empty_edges(spark):
    nodes = spark.createDataFrame([(5,), (9,), (42,)], "id long")
    empty = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup.connected_components_star(empty, nodes=nodes)
    got = {r.id: r.component_id for r in out.collect()}
    out.unpersist()
    assert got == {5: 5, 9: 9, 42: 42}


# -- incremental ingest dedup ----------------------------------------------

def test_ingest_dedup_exact_even_under_heavy_false_positives(spark):
    """The Bloom only routes; the verification joins decide. With a
    deliberately undersized filter (huge fpr) the output must STILL equal
    the brute-force content anti-join, and no true dup may ever slip
    through (no false negatives by construction)."""
    import pandas as pd

    from grenier_spark.core.bloom import Bloom, params_for
    from grenier_spark.operators.dedup import (bloom_of_corpus,
                                               incremental_ingest_dedup)

    ex_rows = [(i, f"existing document number {i} body") for i in range(300)]
    new_rows = ([(1000 + i, f"existing document number {i} body")
                 for i in range(0, 60)]          # 60 true dups
                + [(2000 + i, f"fresh document {i}") for i in range(200)])
    existing = spark.createDataFrame(
        pd.DataFrame(ex_rows, columns=["doc_id", "text"]))
    new = spark.createDataFrame(
        pd.DataFrame(new_rows, columns=["doc_id", "text"]))

    for expected, fpr in ((300, 0.01), (4, 0.5)):  # sane and absurd sizing
        blob = bloom_of_corpus(existing, expected_docs=expected, fpr=fpr)
        out = incremental_ingest_dedup(existing, new, blob).toPandas()
        got = dict(zip(out.doc_id, out.is_new))
        assert all(got[1000 + i] is np.bool_(False) or not got[1000 + i]
                   for i in range(60))            # every dup caught
        assert all(got[2000 + i] for i in range(200)), fpr  # exactness
    # sizing sanity: the corpus filter reports a fill-based cardinality
    # in the right ballpark when sized correctly
    bf = Bloom.from_bytes(bloom_of_corpus(existing, expected_docs=300,
                                          fpr=0.01))
    assert abs(bf.cardinality() - 300) / 300 < 0.15
    m, _ = params_for(300, 0.01)
    assert bf.m == m


def test_ingest_dedup_bloom_maintained_by_or_merge_across_appends(spark):
    """The coverage contract under corpus growth: a stale filter misses
    docs appended after it was built (and the miss-is-new shortcut then
    under-reports dups), so ingest maintains the filter by OR-merging a
    partial built over each appended batch — after the merge the dup is
    caught again."""
    import pandas as pd

    from grenier_spark.core.bloom import Bloom
    from grenier_spark.operators.dedup import (bloom_of_corpus,
                                               incremental_ingest_dedup)

    old = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(100), "text": [f"doc {i}" for i in range(100)]}))
    appended = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(100, 120),
         "text": [f"doc {i}" for i in range(100, 120)]}))
    grown = old.unionByName(appended)
    new = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [500], "text": ["doc 110"]}))  # dup of an appended doc

    stale = bloom_of_corpus(old, expected_docs=200, fpr=0.01)
    out = incremental_ingest_dedup(grown, new, stale).toPandas()
    assert bool(out.is_new[0])  # stale filter -> contract violated -> miss

    part = bloom_of_corpus(appended, expected_docs=200, fpr=0.01)
    merged = Bloom.from_bytes(stale)
    merged.merge(Bloom.from_bytes(part))
    out = incremental_ingest_dedup(grown, new,
                                   merged.to_bytes()).toPandas()
    assert not bool(out.is_new[0])  # maintained filter catches the dup

    # first-ever ingest: an EMPTY corpus yields a valid all-zero filter
    # and everything is new
    empty = old.where("doc_id < 0")
    blob0 = bloom_of_corpus(empty, expected_docs=200, fpr=0.01)
    out = incremental_ingest_dedup(empty, new, blob0).toPandas()
    assert bool(out.is_new[0])


def test_ingest_dedup_tolerates_null_text(spark):
    """NULL-text rows must not crash the probe (NaN batch) and must come
    out is_new=true, matching batch dedup's NULL-keep semantics."""
    import pandas as pd

    from grenier_spark.operators.dedup import (bloom_of_corpus,
                                               incremental_ingest_dedup)

    existing = spark.createDataFrame(
        pd.DataFrame([(i, f"corpus doc {i}") for i in range(50)],
                     columns=["doc_id", "text"]))
    new = spark.createDataFrame(
        pd.DataFrame([(100, "corpus doc 7"), (101, None),
                      (102, "brand new"), (103, None)],
                     columns=["doc_id", "text"]))
    blob = bloom_of_corpus(existing, expected_docs=50, fpr=0.01)
    out = dict(zip(*(lambda p: (p.doc_id, p.is_new))(
        incremental_ingest_dedup(existing, new, blob).toPandas())))
    assert not out[100]
    assert out[101] and out[102] and out[103]


def test_simhash_exact_match_keying_w64(spark, docs_with_plants):
    """max_hamming=0 with n_blocks=1 is legal (single 64-bit block =
    exact-fingerprint equality): the all-ones mask must not overflow."""
    from grenier_spark.operators import dedup

    fps = dedup.simhash64(docs_with_plants)
    got = dedup.simhash_candidates(fps, max_hamming=0, n_blocks=1)
    pdf = got.toPandas()
    # exact copies share the fingerprint -> present with hamming 0
    assert (pdf.hamming == 0).all()
    assert len(pdf) >= 1


def test_bloom_of_hash_index_matches_text_built_filter(spark):
    """A filter built from the md5-hex index must be byte-identical to one
    built from the raw text (same 64 probe bits), so either feeds the
    stream/batch probes interchangeably."""
    import pandas as pd

    from grenier_spark.operators.dedup import (bloom_of_corpus,
                                               bloom_of_hash_index)
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        pd.DataFrame([(i, f"doc body {i}") for i in range(80)],
                     columns=["doc_id", "text"]))
    idx = docs.select(F.md5("text").alias("content_hash"))
    a = bloom_of_corpus(docs, expected_docs=80, fpr=0.01)
    b = bloom_of_hash_index(idx, expected_docs=80, fpr=0.01)
    assert a == b


def test_zero_norm_vectors_never_rank_or_match(spark):
    """An all-zero embedding must not surface as anyone's neighbor (NaN
    cosine would rank above every real score) nor pass the near-dup tau."""
    import pandas as pd

    from grenier_spark.operators.similarity import (cosine_neardup_pairs,
                                                    cosine_topk, lsh_topk)

    rng = np.random.default_rng(3)
    vecs = [rng.standard_normal(16).astype("float32") for _ in range(20)]
    vecs[7] = np.zeros(16, dtype="float32")
    vdf = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(20), "embedding": [list(map(float, v))
                                                         for v in vecs]}),
        "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "embedding":
                      [list(map(float, rng.standard_normal(16)))]}),
        "query_id long, embedding array<float>")
    top = cosine_topk(vdf, qdf, k=5).toPandas()
    assert 7 not in set(top.vec_id) and top.cos_sim.notna().all()
    ltop = lsh_topk(vdf, qdf, k=5, bands=4, band_bits=4, dim=16).toPandas()
    assert 7 not in set(ltop.vec_id)
    pairs = cosine_neardup_pairs(vdf, tau=0.0).toPandas()
    assert not ((pairs.id_a == 7) | (pairs.id_b == 7)).any()


def test_fuzzy_contamination_cross_table(spark, docs_with_plants):
    """Cross-table MinHash decontamination: an eval set made of lightly
    edited train docs is flagged pair-for-pair; an unrelated eval doc and a
    NULL-text eval doc flag nothing; est/jaccard respect thresholds."""
    import pandas as pd

    from grenier_spark.operators.decontam import fuzzy_contamination

    train = docs_with_plants.where("doc_id < 1000000")
    base = train.orderBy("doc_id").limit(6).toPandas()
    ev = base.copy()
    ev["eval_id"] = ev.doc_id + 9_000_000
    ev["text"] = ev.text.str.rsplit(" ", n=1).str[0]
    extra = pd.DataFrame({
        "eval_id": [9_900_000, 9_900_001],
        "doc_id": [0, 0],
        "text": ["completely unrelated benchmark prompt about nothing",
                 None]})
    ev = pd.concat([ev, extra], ignore_index=True)[["eval_id", "text"]]
    eval_df = spark.createDataFrame(ev, "eval_id long, text string")

    out = fuzzy_contamination(train, eval_df, tau=0.7).toPandas()
    got = set(zip(out.doc_id, out.eval_id))
    assert {(d, d + 9_000_000) for d in base.doc_id} <= got
    assert not (out.eval_id >= 9_900_000).any()
    assert (out.est_jaccard >= 0.5).all() and (out.jaccard >= 0.7).all()
    # md5/raw-band oracle variant finds the same planted pairs
    out2 = fuzzy_contamination(train, eval_df, tau=0.7, word_hash="md5",
                               hash_buckets=False).toPandas()
    assert {(d, d + 9_000_000) for d in base.doc_id} <= \
        set(zip(out2.doc_id, out2.eval_id))


# -- exact substring-span dedup (Lee et al. 2022) ----------------------------

def _brute_span_stats(texts, k, min_count=2):
    """Pure-python reference for duplicated_span_stats."""
    from collections import Counter

    docs, cnt = {}, Counter()
    for i, t in texts.items():
        if t is None:
            continue
        ws = [w for w in t.split(" ") if w != ""]
        if len(ws) < k:
            continue
        wins = [" ".join(ws[p:p + k]) for p in range(len(ws) - k + 1)]
        docs[i] = (len(ws), wins)
        cnt.update(wins)
    out = {}
    for i, (n_words, wins) in docs.items():
        dup_pos = [p + 1 for p, s in enumerate(wins) if cnt[s] >= min_count]
        if not dup_pos:
            continue
        spans, start, prev = [], dup_pos[0], dup_pos[0]
        for p in dup_pos[1:]:
            if p - prev > k:
                spans.append((start, prev + k - 1))
                start = p
            prev = p
        spans.append((start, prev + k - 1))
        dup_words = sum(e - s + 1 for s, e in spans)
        out[i] = (n_words, len(wins), len(dup_pos), len(spans), dup_words,
                  round(dup_words / n_words, 6))
    return out


def _span_frame_to_dict(pdf):
    return {int(r.doc_id): (int(r.n_words), int(r.n_windows),
                            int(r.n_dup_windows), int(r.n_spans),
                            int(r.dup_words), float(r.dup_word_frac))
            for r in pdf.itertuples()}


def test_duplicated_spans_match_brute_force_and_duckdb(spark):
    """Random low-vocab corpus (forced window collisions, within- and
    cross-doc): Spark == pure-python reference == DuckDB twin, row for
    row, including island merging of overlapping/adjacent windows."""
    import duckdb
    import random

    rng = random.Random(77)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = {i: " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(2, 30)))
             for i in range(30)}
    texts[30] = None
    texts[31] = ""
    exp = _brute_span_stats(texts, k=3)
    assert len(exp) >= 10  # the corpus must actually collide

    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    got = _span_frame_to_dict(
        dedup.duplicated_span_stats(df, k=3).toPandas())
    assert got == exp

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(sorted(texts.items()),
                                      columns=["doc_id", "text"]))
    duck = _span_frame_to_dict(con.execute(
        dedup.duplicated_span_stats_sql("SELECT doc_id, text FROM docs",
                                        k=3)).df())
    assert duck == exp


def test_duplicated_spans_hand_cases(spark):
    """Known-answer shapes: a full copy (one whole-doc span), a frankendoc
    whose prefix/suffix copy disjoint regions (two spans, correctly NOT
    merged across the unique separator), and within-doc repetition."""
    a = " ".join(f"w{i}" for i in range(1, 21))          # w1..w20, unique
    texts = {
        0: a,
        1: a,                                            # full copy of 0
        2: " ".join(f"w{i}" for i in range(1, 6))        # w1..w5 (prefix)
           + " qq1 qq2 "                                 # unique separator
           + " ".join(f"w{i}" for i in range(12, 19)),   # w12..w18 (middle)
        3: "r1 r2 r3 r1 r2 r3 r1 r2 r3",                 # within-doc repeat
    }
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    got = _span_frame_to_dict(
        dedup.duplicated_span_stats(df, k=3).toPandas())
    assert got == _brute_span_stats(texts, k=3)
    # docs 0/1: every window duplicated -> ONE span covering all 20 words
    assert got[0] == (20, 18, 18, 1, 20, 1.0)
    assert got[0] == got[1]
    # doc 2: two disjoint copied regions -> exactly 2 spans
    assert got[2][3] == 2
    # doc 3: self-repetition alone marks it duplicated, one merged span
    assert got[3][3] == 1 and got[3][4] == 9


def test_duplicated_spans_min_count_and_short_docs(spark):
    texts = {0: "a b c d", 1: "a b c d", 2: "a b c d", 3: "x y"}
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    # min_count=4 > the 3 copies -> nothing is duplicated
    assert dedup.duplicated_span_stats(df, k=3, min_count=4).count() == 0
    # min_count=3 -> all three copies report; the 2-word doc never appears
    got = _span_frame_to_dict(
        dedup.duplicated_span_stats(df, k=3, min_count=3).toPandas())
    assert set(got) == {0, 1, 2}


def _brute_remove_spans(texts, k, min_count=2):
    """Pure-python reference for remove_dup_spans (canonical-first)."""
    from collections import defaultdict

    docs, where = {}, defaultdict(list)
    for i in sorted(texts):
        t = texts[i]
        if t is None:
            continue
        ws = [w for w in t.split(" ") if w != ""]
        if len(ws) < k:
            continue
        docs[i] = ws
        for p in range(len(ws) - k + 1):
            where[" ".join(ws[p:p + k])].append((i, p + 1))
    out = {}
    for i, ws in docs.items():
        red = sorted(p for p in range(1, len(ws) - k + 2)
                     if len(occ := where[" ".join(ws[p - 1:p - 1 + k])])
                     >= min_count and min(occ) < (i, p))
        if not red:
            continue
        spans, start, prev = [], red[0], red[0]
        for p in red[1:]:
            if p - prev > k:
                spans.append((start, prev + k - 1))
                start = p
            prev = p
        spans.append((start, prev + k - 1))
        cov = {q for s, e in spans for q in range(s, e + 1)}
        cleaned = " ".join(w for j, w in enumerate(ws, 1) if j not in cov)
        out[i] = (len(ws), sum(e - s + 1 for s, e in spans), cleaned)
    return out


def test_remove_dup_spans_matches_brute_force_and_duckdb(spark):
    """Canonical-first removal on a random low-vocab corpus: Spark ==
    pure-python reference == DuckDB twin (ids kept, removed word counts,
    reassembled text byte-for-byte)."""
    import duckdb
    import random

    rng = random.Random(123)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = {i: " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(2, 25)))
             for i in range(25)}
    texts[25] = None
    exp = _brute_remove_spans(texts, k=3)
    assert len(exp) >= 8

    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    pdf = dedup.remove_dup_spans(df, k=3).toPandas()
    got = {int(r.doc_id): (int(r.n_words), int(r.n_removed_words),
                           r.cleaned) for r in pdf.itertuples()}
    assert got == exp

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(sorted(texts.items()),
                                      columns=["doc_id", "text"]))
    dpdf = con.execute(dedup.remove_dup_spans_sql(
        "SELECT doc_id, text FROM docs", k=3)).df()
    duck = {int(r.doc_id): (int(r.n_words), int(r.n_removed_words),
                            r.cleaned) for r in dpdf.itertuples()}
    assert duck == exp


def test_remove_dup_spans_hand_cases(spark):
    """Canonical occurrence survives; copies are gutted; partial copies
    lose exactly the copied span; self-repetition keeps its first run."""
    a = " ".join(f"w{i}" for i in range(1, 13))          # w1..w12
    texts = {
        0: a,                                            # canonical
        1: a,                                            # full copy
        2: "u1 u2 " + " ".join(f"w{i}" for i in range(1, 6)) + " u3 u4",
        3: "r1 r2 r3 r1 r2 r3",                          # self-repeat, k=3
    }
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    pdf = dedup.remove_dup_spans(df, k=3).toPandas()
    got = {int(r.doc_id): (int(r.n_removed_words), r.cleaned)
           for r in pdf.itertuples()}
    assert got == {i: (r, c) for i, (_, r, c) in
                   _brute_remove_spans(texts, k=3).items()}
    assert 0 not in got                  # canonical doc untouched
    assert got[1] == (12, "")            # full copy gutted to empty
    assert got[2] == (5, "u1 u2 u3 u4")  # exactly the copied w1..w5 span
    # doc 3: windows 1..4; window 4 ('r1 r2 r3') duplicates window 1 ->
    # span [4, 6] removed, the FIRST run survives
    assert got[3] == (3, "r1 r2 r3")


def test_prefiltered_span_stats_identical_to_plain(spark):
    """The CMS-prefiltered variant returns EXACTLY the plain operator's
    rows on a collision-heavy random corpus — and stays exact under a
    deliberately undersized width=16 sketch (massive overcounting only
    inflates the candidate set; the exact verify kills every false
    positive), the same exactness-under-pressure contract as the Bloom
    ingest dedup."""
    import random

    rng = random.Random(321)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = {i: " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(2, 30)))
             for i in range(40)}
    texts[40] = None
    texts[41] = ""
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    plain = (dedup.duplicated_span_stats(df, k=3).toPandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert len(plain) >= 15  # the corpus must actually collide
    rem_plain = (dedup.remove_dup_spans(df, k=3).toPandas()
                 .sort_values("doc_id").reset_index(drop=True))
    for width in (1 << 16, 16):
        pre = (dedup.duplicated_span_stats_prefiltered(
                   df, k=3, width=width).toPandas()
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(pre, plain[pre.columns],
                                      check_dtype=False)
        rem_pre = (dedup.remove_dup_spans(df, k=3, prefilter_width=width)
                   .toPandas()
                   .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(rem_pre, rem_plain[rem_pre.columns],
                                      check_dtype=False)


def test_prefiltered_span_stats_empty_and_clean_corpora(spark):
    # all-unique corpus: no dup rows from either path
    clean = spark.createDataFrame(
        [(i, f"a{i} b{i} c{i} d{i}") for i in range(10)],
        "doc_id long, text string")
    assert dedup.duplicated_span_stats_prefiltered(clean, k=3).count() == 0
    # empty input falls back cleanly
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.duplicated_span_stats_prefiltered(empty, k=3).count() == 0


def test_prefilter_candidate_volume_tracks_duplication(spark):
    """The quantitative point of the CMS prefilter: on a 5000-doc corpus
    where ~2% of docs are full copies, the candidate set is a few percent
    of all window occurrences (bounded by true duplication + CMS collision
    noise), so the exact-count shuffle carries ~50x fewer rows. Also
    re-checks exactness at this size against the planted truth."""
    n_docs, n_dup = 5000, 100
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(20)))
            for i in range(n_docs - n_dup)]
    # 100 copies of doc 0 (one dup cluster)
    base = rows[0][1]
    rows += [(n_docs + i, base) for i in range(n_dup)]
    df = spark.createDataFrame(sorted(rows), "doc_id long, text string")

    # measure the candidate volume with the operator's own pieces
    from grenier_spark.core.countmin import CountMin
    from grenier_spark.operators.dedup import (_window_key_col,
                                               duplicated_span_stats_prefiltered)

    k, width = 4, 1 << 20
    keys = (df.select(F.explode(_window_key_col("text", k)).alias("wk"))
            .toPandas().wk.to_numpy("int64"))
    cm = CountMin(4, width, seed=21)
    cm.update_batch(keys.view(np.uint64))
    n_candidates = int((cm.query(keys.view(np.uint64)) >= 2).sum())
    n_windows = len(keys)
    true_dup_occ = (n_dup + 1) * 17  # 101 copies x 17 windows each
    assert n_candidates >= true_dup_occ  # superset, never undercounts
    assert n_candidates <= true_dup_occ + 0.01 * n_windows  # FP noise only
    assert n_candidates / n_windows < 0.05  # the 20x+ shuffle reduction

    got = (duplicated_span_stats_prefiltered(df, k=k, width=width)
           .toPandas())
    assert len(got) == n_dup + 1  # exactly the planted cluster reports
    assert (got.dup_word_frac == 1.0).all()


def test_semdedup_clusters_within_cells(spark):
    """SemDeDup: within-cell near-dup groups collapse to their lowest id;
    cross-cell near-dups are invisible BY DESIGN (the paper's
    within-cluster approximation); zero vectors survive as singletons."""
    base = np.array([[1.0, 0.0, 0.0, 0.0],
                     [0.0, 1.0, 0.0, 0.0]])
    rows = []
    # ids 0/1 are the sampled centroids (lowest ids, n_centroids=2)
    rows.append((0, base[0].tolist()))
    rows.append((1, base[1].tolist()))
    # 10/11: tight near-dups of centroid 0's direction -> one component
    rows.append((10, (base[0] + np.array([0.0, 0.01, 0.0, 0.0])).tolist()))
    rows.append((11, (base[0] + np.array([0.0, 0.012, 0.0, 0.0])).tolist()))
    # 20: alone near centroid 1 -> singleton
    rows.append((20, (base[1] + np.array([0.01, 0.0, 0.0, 0.0])).tolist()))
    # 30: zero vector -> never edges, singleton
    rows.append((30, [0.0, 0.0, 0.0, 0.0]))
    vdf = spark.createDataFrame(pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1] for r in rows]}))
    got = similarity.semdedup(vdf, tau=0.99, n_centroids=2)
    pdf = got.toPandas().set_index("vec_id").sort_index()
    got.unpersist()
    # 0, 10, 11 share cell 0 and cosine ~1 -> component 0, keep 0
    assert pdf.loc[0, "component_id"] == 0 and bool(pdf.loc[0, "kept"])
    assert pdf.loc[10, "component_id"] == 0 and not bool(pdf.loc[10, "kept"])
    assert pdf.loc[11, "component_id"] == 0 and not bool(pdf.loc[11, "kept"])
    # 1 and 20 share cell 1 and cosine ~1 -> component 1, keep 1
    assert pdf.loc[1, "component_id"] == 1 and bool(pdf.loc[1, "kept"])
    assert pdf.loc[20, "component_id"] == 1 and not bool(pdf.loc[20, "kept"])
    # the zero vector is its own component
    assert pdf.loc[30, "component_id"] == 30 and bool(pdf.loc[30, "kept"])
    # exactly one kept representative per component
    per_comp = pdf.groupby("component_id")["kept"].sum()
    assert (per_comp == 1).all()

    # partitioning invariance: same output from a different layout
    again = similarity.semdedup(vdf.repartition(5), tau=0.99, n_centroids=2)
    pdf2 = again.toPandas().set_index("vec_id").sort_index()
    again.unpersist()
    assert pdf[["cell", "component_id", "kept"]].equals(
        pdf2[["cell", "component_id", "kept"]])


def test_semdedup_cross_cell_pairs_do_not_edge(spark):
    """Two near-identical vectors forced into DIFFERENT cells stay in
    different components — documents the SemDeDup approximation."""
    # centroids (ids 0,1) at 45 degrees around the x=y diagonal; the two
    # near-dup vectors straddle the diagonal so each snaps to its own cell
    rows = [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]),
        (10, [1.0, 0.99]),   # cell 0 side
        (11, [0.99, 1.0]),   # cell 1 side; cos(10, 11) ~ 0.9998
    ]
    vdf = spark.createDataFrame(pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1] for r in rows]}))
    got = similarity.semdedup(vdf, tau=0.99, n_centroids=2)
    pdf = got.toPandas().set_index("vec_id").sort_index()
    got.unpersist()
    assert pdf.loc[10, "cell"] != pdf.loc[11, "cell"]
    assert pdf.loc[10, "component_id"] != pdf.loc[11, "component_id"]


def test_pq_encode_matches_numpy(spark, embeddings):
    """PQ codes == a direct numpy reimplementation of the normalized
    round-6 subspace argmin (ties to the lowest code)."""
    C = similarity.pq_codebooks(embeddings, m=4, ksub=16, dim=64)
    assert C.shape == (4, 16, 16)
    got = {r["vec_id"]: list(r["codes"])
           for r in similarity.pq_encode(embeddings, C).collect()}
    pdf = embeddings.orderBy("vec_id").toPandas()
    mat = np.asarray([np.asarray(v, np.float64) for v in pdf.embedding])
    n = np.linalg.norm(mat, axis=1)
    mat = mat / np.where(n == 0, 1.0, n)[:, None]
    for i, vid in enumerate(pdf.vec_id):
        exp = []
        for j in range(4):
            sub = mat[i, j * 16:(j + 1) * 16]
            d = ((sub[None, :] - C[j]) ** 2).sum(axis=1)
            # same |x|^2+|c|^2-2xc decomposition as the impl, rounded
            d6 = np.round((sub * sub).sum() + (C[j] * C[j]).sum(axis=1)
                          - 2.0 * (C[j] @ sub), 6)
            exp.append(int(np.argmin(d6)))
            assert abs(d6[exp[-1]] - round(float(d.min()), 6)) < 2e-6
        assert got[vid] == exp, vid


def test_pq_topk_shortlist_recall_and_determinism(spark, embeddings):
    """The production IVFADC shape (ADC shortlist + exact re-rank) holds
    >=0.9 recall@10 even on worst-case isotropic vectors, and is
    partitioning-invariant."""
    queries = (embeddings.orderBy("vec_id").limit(5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = similarity.cosine_topk(embeddings, queries, k=10).toPandas()
    approx = similarity.pq_topk(embeddings, queries, k=10, m=8, ksub=16,
                                shortlist=100, dim=64).toPandas()
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls

    again = similarity.pq_topk(embeddings.repartition(7), queries, k=10,
                               m=8, ksub=16, shortlist=100,
                               dim=64).toPandas()
    key = ["query_id", "rank"]
    assert approx.sort_values(key).vec_id.tolist() == \
        again.sort_values(key).vec_id.tolist()


def test_pq_topk_planted_copy_is_top1(spark, embeddings):
    """A perturbed copy quantizes to (nearly) its source's codes and the
    re-rank surfaces it as the top neighbor."""
    base = embeddings.orderBy("vec_id").limit(40).toPandas()
    plants = base.head(3).copy()
    plants["vec_id"] = plants.vec_id + 1_000_000
    plants["embedding"] = plants.embedding.map(
        lambda v: [float(v[0]) + 0.05] + [float(x) for x in v[1:]])
    base["embedding"] = base.embedding.map(lambda v: [float(x) for x in v])
    full = spark.createDataFrame(pd.concat([base, plants],
                                           ignore_index=True))
    queries = (full.where("vec_id >= 1000000")
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = similarity.pq_topk(full, queries, k=3, m=4, ksub=16,
                             shortlist=20, dim=64).toPandas()
    for qid in queries.toPandas().query_id:
        top = got[(got.query_id == qid) & (got["rank"] == 1)]
        nxt = got[(got.query_id == qid) & (got["rank"] == 2)]
        assert int(top.vec_id.iloc[0]) == int(qid)
        assert int(nxt.vec_id.iloc[0]) == int(qid) - 1_000_000, qid


def test_pq_validation_errors(spark, embeddings):
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_codebooks(embeddings, m=5, ksub=16, dim=64)
    with pytest.raises(ValueError, match="need >="):
        similarity.pq_codebooks(embeddings.limit(3), m=4, ksub=16, dim=64)


def test_ivfpq_topk_recall_and_partitioning_invariance(spark, embeddings):
    """The composed IVF-PQ path: recall@10 vs brute force stays >= 0.7 per
    query (cell routing adds the standard IVF miss on isotropic vectors)
    with mean >= 0.8, and the whole chain is partitioning-invariant."""
    queries = (embeddings.orderBy("vec_id").limit(5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = similarity.cosine_topk(embeddings, queries, k=10).toPandas()
    approx = similarity.ivfpq_topk(embeddings, queries, k=10,
                                   n_centroids=16, n_probe=6, m=8,
                                   ksub=16, shortlist=100, dim=64).toPandas()
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    assert min(recalls) >= 0.7 and np.mean(recalls) >= 0.8, recalls

    again = similarity.ivfpq_topk(embeddings.repartition(7), queries, k=10,
                                  n_centroids=16, n_probe=6, m=8,
                                  ksub=16, shortlist=100, dim=64).toPandas()
    key = ["query_id", "rank"]
    assert approx.sort_values(key).vec_id.tolist() == \
        again.sort_values(key).vec_id.tolist()


def test_ivfpq_topk_planted_copy_is_top1(spark, embeddings):
    """A perturbed copy routes to its source's cell, quantizes to (nearly)
    the same codes, and the exact re-rank surfaces it as top-1."""
    base = embeddings.orderBy("vec_id").limit(40).toPandas()
    plants = base.head(3).copy()
    plants["vec_id"] = plants.vec_id + 1_000_000
    plants["embedding"] = plants.embedding.map(
        lambda v: [float(v[0]) + 0.05] + [float(x) for x in v[1:]])
    base["embedding"] = base.embedding.map(lambda v: [float(x) for x in v])
    full = spark.createDataFrame(pd.concat([base, plants],
                                           ignore_index=True))
    queries = (full.where("vec_id >= 1000000")
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = similarity.ivfpq_topk(full, queries, k=3, n_centroids=8,
                                n_probe=4, m=4, ksub=16, shortlist=20,
                                dim=64).toPandas()
    for qid in queries.toPandas().query_id:
        top = got[(got.query_id == qid) & (got["rank"] == 1)]
        assert int(top.vec_id.iloc[0]) == int(qid)


def test_corpus_doc_diff_multiset_semantics(spark):
    """corpus_doc_diff: an edited doc counts as one add + one remove;
    within-version duplicate content diffs by multiset counts; word
    counts use string_split semantics (empty tokens included)."""
    import pandas as pd

    from grenier_spark.operators.versiondiff import corpus_doc_diff

    old = spark.createDataFrame(pd.DataFrame({
        "source": ["w"] * 4,
        "text": ["a b", "a b", "c", "edited v1"]}))
    new = spark.createDataFrame(pd.DataFrame({
        "source": ["w"] * 4,
        "text": ["a b", "c", "edited v2", "brand  new"]}))
    r = corpus_doc_diff(old, new).collect()[0]
    # "a b" 2->1: one removed, one common; "c" kept; edit: 1 add + 1 rm;
    # "brand  new" added
    assert r.n_docs_added == 2 and r.n_docs_removed == 2
    assert r.n_docs_common == 2
    assert r.wc_old == 2 + 2 + 1 + 2
    assert r.wc_new == 2 + 1 + 2 + 3  # double space -> empty token


def test_corpus_doc_diff_one_sided_sources(spark):
    """A source present in only one version must still get a report row
    (fully-added source: wc_old == 0; fully-removed: wc_new == 0)."""
    import pandas as pd

    from grenier_spark.operators.versiondiff import corpus_doc_diff

    old = spark.createDataFrame(pd.DataFrame(
        {"source": ["a", "gone"], "text": ["x y", "old only"]}))
    new = spark.createDataFrame(pd.DataFrame(
        {"source": ["a", "fresh"], "text": ["x y", "brand new src"]}))
    rows = {r.source: r for r in corpus_doc_diff(old, new).collect()}
    assert set(rows) == {"a", "gone", "fresh"}
    assert rows["fresh"].n_docs_added == 1 and rows["fresh"].wc_old == 0
    assert rows["fresh"].wc_new == 3
    assert rows["gone"].n_docs_removed == 1 and rows["gone"].wc_new == 0
    assert rows["gone"].wc_old == 2


# --------------------------------------------- pre-tokenized payload chain

def test_token_minhash_neardup_finds_planted_pairs(spark):
    """North-rule payload: near-dup over (doc_id, tokens array<int>) — a
    planted copy with the first 3 tokens dropped must be recovered with
    the expected exact Jaccard (windows (n-2) vs (n-5), intersection
    n-5 on distinct shingles of a repeat-free token stream)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    rows = []
    for i in range(30):
        toks = rng.choice(50_000, size=40, replace=False).astype("int64")
        rows.append((i, toks.tolist()))
        if i < 6:
            rows.append((i + 10_000_000, toks[3:].tolist()))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id",
                                                           "tokens"]))
    res = dedup.token_minhash_neardup(df, w=3, tau=0.7).toPandas()
    planted = res[(res.id_b - res.id_a) == 10_000_000]
    assert set(planted.id_a) == set(range(6))
    # repeat-free stream: 38 vs 35 distinct shingles, all 35 shared
    assert np.allclose(planted.jaccard, 35 / 38)
    # no spurious cross pairs between unrelated random docs
    assert len(res) == len(planted)


def test_token_shingle_rows_match_md5_text_chain(spark):
    """Feeding md5-low64 word ids as the token array must reproduce the
    text chain's shingles exactly — the two paths share one fold."""
    import pandas as pd

    from grenier_spark.operators.dedup import (_md5_shingle_rows,
                                               token_shingle_rows)
    from grenier_spark.functions.hashing import md5_tokens_col

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d e f", "one two three four", "x y"]}))
    via_text = (_md5_shingle_rows(docs, "text", "doc_id", 3)
                .orderBy("doc_id", "shingle").toPandas())
    tok = docs.select("doc_id", md5_tokens_col("text").alias("tokens"))
    via_tokens = (token_shingle_rows(tok, "tokens", "doc_id", 3)
                  .orderBy("doc_id", "shingle").toPandas())
    pd.testing.assert_frame_equal(via_text, via_tokens)
    # doc 3 has < w words: no shingles from either path
    assert 3 not in set(via_tokens.doc_id)
