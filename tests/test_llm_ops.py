"""Quality-property tests for sketch-based operators (no SQL oracle):
MinHash recall vs exact Jaccard, LSH ANN recall vs brute force, fingerprint
dedup-key property, simhash sanity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.operators import similarity as sim
from m13_sparkstreaming_python_azure_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from m13_sparkstreaming_python_azure_spark.operators.text import with_fingerprint


def test_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", n=3, threshold=0.35, max_doc_freq=50
        ).collect()
    }
    mh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", shingle_k=3, threshold=0.2
        ).collect()
    }
    if exact:
        recall = len(exact & mh) / len(exact)
        # b=16,r=4 → collision prob at s=0.35 is ~0.85; require most found
        assert recall >= 0.6, (recall, exact - mh)
    # verification step guarantees no false positives below threshold
    for r in minhash_lsh_pairs(docs, "doc_id", threshold=0.2).collect():
        assert r.jaccard_sim >= 0.2


def test_minhash_md5_family_portable_and_equivalent(spark, sf_dir):
    """The r9 portable md5 hash family: (a) _mh_hash('md5') matches a
    pure-Python hashlib reference (the property the DuckDB gate oracle
    relies on); (b) the md5-family pipeline finds the same verified pair
    set as the xxhash64 family on the fixture (both are exact-verified;
    candidate recall at these parameters covers the same true pairs)."""
    import hashlib

    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.operators.dedup import _mh_hash

    rows = (
        spark.createDataFrame(
            [("alpha beta gamma",), ("x y",), ("",)], "s string"
        )
        .select(_mh_hash(7, F.col("s"), "md5").alias("h"), "s")
        .collect()
    )
    for r in rows:
        want = int(hashlib.md5(f"7:{r['s']}".encode()).hexdigest()[:15], 16)
        assert r["h"] == want, r["s"]

    docs = load_table(spark, sf_dir, "documents")
    xx = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", shingle_k=3, threshold=0.2
        ).collect()
    }
    md = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", shingle_k=3, threshold=0.2, hash_family="md5"
        ).collect()
    }
    # both exact-verified; on the fixture the two candidate families
    # cover the same true pairs
    assert md == xx


def test_minhash_disk_tables_match_memory_path(spark, sf_dir, tmp_path):
    """The materialized signature/shingle-table path (production default)
    and the in-memory persist path share hash family and verification —
    their pair output must be IDENTICAL (VERDICT r1 done-criterion)."""
    from m13_sparkstreaming_python_azure_spark.operators.dedup import (
        minhash_pairs_from_tables,
        write_minhash_tables,
    )

    docs = load_table(spark, sf_dir, "documents")
    mem = sorted(
        (r.id_a, r.id_b, r.jaccard_sim)
        for r in minhash_lsh_pairs(
            docs, "doc_id", threshold=0.2, shingle_store="memory"
        ).collect()
    )
    disk = sorted(
        (r.id_a, r.id_b, r.jaccard_sim)
        for r in minhash_lsh_pairs(
            docs, "doc_id", threshold=0.2, shingle_store="disk",
            work_dir=str(tmp_path / "mh"),
        ).collect()
    )
    assert mem == disk and len(disk) > 0

    # the written tables are reusable directly (index shape: one tokenize,
    # many consumers) and reproduce the same pairs
    shp, bp = (str(tmp_path / "mh" / d) for d in ("shingles", "bands"))
    again = sorted(
        (r.id_a, r.id_b, r.jaccard_sim)
        for r in minhash_pairs_from_tables(spark, shp, bp, threshold=0.2).collect()
    )
    assert again == disk


def test_exact_dedup_removes_injected_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    survivors = exact_dedup(dup, "doc_id")
    assert survivors.count() == docs.count()
    # canonical survivor = min id → all original ids
    assert survivors.filter(F.col("doc_id") >= 100000).count() == 0


def test_fingerprint_is_dedup_key(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    fp = with_fingerprint(dup)
    # equal text ⇒ equal fingerprint: every hash appears exactly twice
    counts = fp.groupBy("fp_exact").count().select("count").distinct().collect()
    assert [r["count"] for r in counts] == [2]


def test_simhash_identical_docs_zero_distance(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20)
    dup = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    pairs = simhash_pairs(dup, "doc_id", max_hamming=0).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    expected = {(r.doc_id, r.doc_id + 100000) for r in docs.collect()}
    assert expected <= found


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, probes, k=10).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in sim.lsh_ann_topk(emb, probes, k=10, dim=64, bits=4, tables=16).collect()
    }
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.5, recall
    # self-match must always survive LSH (identical vector, identical buckets)
    assert all((q, q) in lsh for q in range(10))
    # the portable rademacher-md5 family (the r9 hash-gate variant) must
    # hold the same recall floor and the self-match invariant
    rad = {
        (r.query_id, r.neighbor_id)
        for r in sim.lsh_ann_topk(
            emb,
            probes,
            k=10,
            dim=64,
            bits=4,
            tables=16,
            plane_family="rademacher-md5",
        ).collect()
    }
    rad_recall = len(bf & rad) / len(bf)
    assert rad_recall >= 0.5, rad_recall
    assert all((q, q) in rad for q in range(10))


def test_ivf_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, probes, k=10).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_ann_topk(emb, probes, k=10, n_cells=16, nprobe=8).collect()
    }
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.5, recall
    # a probe vector always lands in its own assigned cell → self-match kept
    assert all((q, q) in ivf for q in range(10))


def test_ivf_centroids_deterministic(spark, sf_dir):
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    c1 = sim.train_ivf_centroids(emb, n_cells=8, sample_size=500, seed=7)
    c2 = sim.train_ivf_centroids(emb, n_cells=8, sample_size=500, seed=7)
    assert np.allclose(c1, c2)
    # unit-norm codebook
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ivf_codebook_survives_partition_skew(spark):
    """Codebook training must sample across ALL partitions, not take the
    head of the first ones (VERDICT r1): on a fixture whose partitions are
    cluster-pure in ingest order (partition 0 = cluster A only, partition
    1 = cluster B only), a limit()-trained codebook would never see
    cluster B and assign everything to a few cells. Assert both clusters
    land in distinct dominant cells and population is balanced."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = [(i, (np.array([5.0, 0, 0, 0]) + rng.normal(0, 0.1, 4)).tolist()) for i in range(800)]
    b = [(i + 800, (np.array([0, 5.0, 0, 0]) + rng.normal(0, 0.1, 4)).tolist()) for i in range(800)]
    # two cluster-pure partitions in ingest order — the skew trap
    df = spark.createDataFrame(a, "vec_id long, embedding array<double>").coalesce(1).union(
        spark.createDataFrame(b, "vec_id long, embedding array<double>").coalesce(1)
    )
    cents = sim.train_ivf_centroids(df, n_cells=4, sample_size=200, seed=42)
    # both clusters must be representable: their directions map to
    # DIFFERENT nearest centroids (a head-sample codebook collapses them)
    dir_a = np.array([1.0, 0, 0, 0])
    dir_b = np.array([0, 1.0, 0, 0])
    cell_a = int(np.argmax(cents @ dir_a))
    cell_b = int(np.argmax(cents @ dir_b))
    assert cell_a != cell_b
    # and the assignment over the full corpus is balanced: no cell holds
    # more than 70% of rows (with a head sample, one cluster's cells
    # absorb ~100%)
    vecs = np.stack([row[1] for row in a + b])
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    assign = np.argmax(vecs @ cents.T, axis=1)
    top_share = max(np.bincount(assign, minlength=4)) / len(assign)
    assert top_share <= 0.7, top_share


def test_bruteforce_self_similarity_is_one(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top1 = (
        sim.brute_force_topk(emb, probes, k=1)
        .select("query_id", "neighbor_id", "cosine_sim")
        .collect()
    )
    for r in top1:
        assert r.query_id == r.neighbor_id
        assert abs(r.cosine_sim - 1.0) < 1e-5


def test_chunk_udtf_matches_expression_chunker(spark, sf_dir):
    """The Python-UDTF chunker (the escape hatch for real tokenizers) must
    produce exactly the expression chunker's output."""
    from m13_sparkstreaming_python_azure_spark.operators.chunking import (
        chunk_documents,
        chunk_documents_udtf,
    )

    docs = load_table(spark, sf_dir, "documents").limit(100)
    want = sorted(tuple(r) for r in chunk_documents(docs).collect())
    got = sorted(tuple(r) for r in chunk_documents_udtf(docs).collect())
    assert got == want
    assert len(got) > 0


def test_hash_split_proportions_and_stability(spark, sf_dir):
    """Hash split: ~90/5/5 proportions, and membership is a pure function
    of (salt, id) — re-running or re-partitioning never moves a document."""
    from m13_sparkstreaming_python_azure_spark.operators.chunking import (
        hash_split,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    s1 = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    s2 = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(7)).collect()
    }
    assert s1 == s2
    n = len(s1)
    frac_train = sum(v == "train" for v in s1.values()) / n
    assert 0.8 < frac_train < 0.97


def test_training_data_pipeline_example(spark, sf_dir, tmp_path):
    """The end-to-end curation example runs and each stage only shrinks
    the corpus; output is hive-partitioned by split with all three splits
    readable."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "training_data_pipeline",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "training_data_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "train_out")
    stats = mod.run(spark, sf_dir, out)
    assert stats["quality_kept"] <= stats["raw_docs"]
    assert stats["after_exact_dedup"] <= stats["quality_kept"]
    assert stats["after_near_dedup"] <= stats["after_exact_dedup"]
    assert stats["chunks_written"] > 0
    assert 0 < stats["train_chunks"] < stats["chunks_written"]
    assert 1 <= stats["embedding_clusters"] <= 4
    splits = {
        r["split"]
        for r in spark.read.parquet(out).select("split").distinct().collect()
    }
    assert splits == {"train", "val", "test"}


def test_connected_components_path_graph(spark):
    """A 200-node path must collapse to one component within the default
    round budget — pointer jumping gives O(log n) rounds where plain edge
    relaxation would need 200."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "id_a long, id_b long"
    )
    comp = connected_components(edges)
    labels = {r["component"] for r in comp.collect()}
    assert labels == {0}
    assert comp.count() == 200


def test_connected_components_disjoint(spark):
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    got = {
        (r["node"], r["component"]) for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_udaf_weighted_mean_matches_jvm_expression(spark, sf_dir):
    """The pandas GROUPED_AGG UDAF (r9: integer-grid quantized sums)
    must equal the JVM expression computing the SAME grid math exactly —
    int64 sums are fold-order free, so this is == not approx — and stay
    within grid tolerance of the unquantized JVM weighted mean."""
    from m13_sparkstreaming_python_azure_spark.queries.llm import (
        q_udaf_weighted_stats,
    )

    got = {
        r["event_type"]: r
        for r in q_udaf_weighted_stats(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    grid = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.sum(
                F.floor(
                    (F.col("value") * F.abs("value")) * 1e4 + F.lit(0.5)
                ).cast("long")
            ).alias("wsum_grid"),
            F.sum(
                F.floor(F.abs("value") * 1e4 + F.lit(0.5)).cast("long")
            ).alias("wnorm_grid"),
        )
        .collect()
    }
    raw = {
        r["event_type"]: r["wmean"]
        for r in ev.groupBy("event_type")
        .agg(
            (F.sum(F.col("value") * F.abs("value")) / F.sum(F.abs("value"))).alias("wmean")
        )
        .collect()
    }
    assert got.keys() == grid.keys() == raw.keys()
    for k in got:
        assert got[k]["wsum_grid"] == grid[k]["wsum_grid"], k
        assert got[k]["wnorm_grid"] == grid[k]["wnorm_grid"], k
        assert got[k]["wmean"] == grid[k]["wsum_grid"] / grid[k]["wnorm_grid"], k
        # grid error bound: each term off by <= .5e-4
        assert abs(got[k]["wmean"] - raw[k]) < 1e-3 * max(1.0, abs(raw[k])), k


def test_ivf_persisted_index_matches_inmemory_and_prunes(spark, sf_dir, tmp_path):
    """The cell-partitioned on-disk index must return exactly what the
    in-memory IVF path returns (same codebook seed), and its probe scan
    must carry a partition filter on cell — disk-level pruning, the whole
    point of persisting the layout."""
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_ann_topk_from_index,
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path, n_cells=8, seed=42)
    mem = ivf_ann_topk(
        emb, probes, k=5, n_cells=8, nprobe=3, seed=42
    ).collect()
    disk_df = ivf_ann_topk_from_index(spark, path, probes, k=5, nprobe=3)
    disk = disk_df.collect()
    assert sorted(map(tuple, mem)) == sorted(map(tuple, disk))
    # partition pruning: the scan's plan must filter on the partition col
    plan = disk_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan.replace("\n", ""), plan[:1500]
    import os

    cells = [d for d in os.listdir(path) if d.startswith("cell=")]
    assert len(cells) == 8


def test_kmeans_lloyd_invariants(spark, sf_dir):
    """Every vector is assigned to one of the k seed-initialized
    clusters, and one Lloyd refinement never increases the total
    within-cluster squared distance (the Lloyd monotonicity property)."""
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.operators.clustering import (
        assign_clusters,
        kmeans_assignments,
        recompute_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    k = 4
    out = kmeans_assignments(emb, k=k, iterations=2)
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    clusters = {r["cluster"] for r in out.select("cluster").distinct().collect()}
    assert clusters <= set(range(k))

    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    init = sorted(
        (int(r["cid"]), list(r["v"]))
        for r in vecs.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cid"), "v")
        .collect()
    )

    def total_cost(assigned, centroids):
        cmap = {cid: c for cid, c in centroids}
        rows = assigned.collect()
        vmap = {r["vec_id"]: r["v"] for r in rows}
        cost = 0.0
        for r in rows:
            c = cmap[r["cluster"]]
            v = vmap[r["vec_id"]]
            cost += sum((x - y) ** 2 for x, y in zip(v, c))
        return cost

    a1 = assign_clusters(vecs, init)
    cost1 = total_cost(a1, init)
    cents2 = recompute_centroids(a1)
    a2 = assign_clusters(vecs, cents2)
    cost2 = total_cost(a2, cents2)
    assert cost2 <= cost1 + 1e-6, (cost1, cost2)


def test_repetition_stats_edge_cases(spark):
    from m13_sparkstreaming_python_azure_spark.operators.text import (
        with_repetition_stats,
    )

    df = spark.createDataFrame(
        [
            (1, ""),                      # empty → zeros, no div-by-zero
            (2, "word"),                  # single token → no bigrams
            (3, "spam spam spam spam"),   # fully repeated
            (4, "a b a b a b"),           # repeated bigram "a b"
            (5, None),                    # null text behaves like empty
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in with_repetition_stats(df).collect()
    }
    assert rows[1]["n_tokens"] == 0 and rows[1]["dup_word_frac"] == 0.0
    assert rows[2]["top_bigram_count"] == 0 and rows[2]["top_unigram_frac"] == 1.0
    assert rows[3]["dup_word_frac"] == 0.75
    assert rows[3]["top_unigram_frac"] == 1.0 and rows[3]["top_bigram_frac"] == 1.0
    # "a b a b a b": bigrams = [a b, b a, a b, b a, a b] → top = 3 of 5
    assert rows[4]["top_bigram_count"] == 3
    assert rows[4]["top_bigram_frac"] == 3 / 5
    assert rows[5]["n_tokens"] is None or rows[5]["n_tokens"] == 0


def test_pack_sequences_fills_bins_contiguously(spark):
    """Packing invariants: per (shard, bin), docs are id-contiguous; every
    bin except a shard's last starts at offset < budget and holds ≥ budget
    tokens once its straddling tail is counted; offsets equal the running
    token count mod budget; no document is lost or duplicated."""
    from m13_sparkstreaming_python_azure_spark.operators.chunking import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (7 + (i * 13) % 40))) for i in range(200)],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, budget=100, n_shards=4).collect()
    assert len(out) == 200 and len({r["doc_id"] for r in out}) == 200
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["shard"] == r["doc_id"] % 4
            assert r["bin_id"] == cum // 100
            assert r["offset_in_bin"] == cum % 100
            cum += r["n_tokens"]
        # every non-final bin spans the full budget (contiguous fill)
        last_bin = rows[-1]["bin_id"]
        for b in range(last_bin):
            binned = [r for r in rows if r["bin_id"] == b]
            tokens_in = sum(r["n_tokens"] for r in binned)
            assert tokens_in + binned[0]["offset_in_bin"] >= 100


def test_ivf_sample_is_partition_layout_independent(spark, sf_dir):
    """ADVICE r3 #5: the bottom-k hash sample must not depend on the
    runtime partition layout. The per-partition prune keeps each
    partition's own bottom-sample_size — exact by the pigeonhole bound
    (the global bottom-k takes at most k rows from one partition) — so
    1-partition, 32-partition, and skewed layouts must train identical
    codebooks."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    base = sim.train_ivf_centroids(emb, n_cells=8, sample_size=300, seed=11)
    for layout in (emb.coalesce(1), emb.repartition(32), emb.repartition(5, "vec_id")):
        alt = sim.train_ivf_centroids(layout, n_cells=8, sample_size=300, seed=11)
        assert np.allclose(base, alt)
