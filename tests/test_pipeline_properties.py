"""Metamorphic / invariant tests for the plans.pipeline_ops operators —
semantic properties the DuckDB oracle parity cannot express (the oracle
would share a bug that violates them, as tests/test_recon_properties.py
does for the recon API).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reconciliation_hive_data_spark.plans import pipeline_ops as P


def test_clusters_are_min_labeled_partitions(spark, sf_dir):
    """Every cluster_id is the minimum doc_id of its members, every member
    appears exactly once, and the reported size matches the membership."""
    rows = P.x_dedup_clusters(spark, sf_dir).collect()
    assert rows, "fixture guarantees at least one version chain"
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    all_docs = [d for ms in by_cluster.values() for d in ms]
    assert len(all_docs) == len(set(all_docs))  # a doc is in ONE cluster
    for cid, members in by_cluster.items():
        assert cid == min(members)
        sizes = {r.cluster_size for r in rows if r.cluster_id == cid}
        assert sizes == {len(members)}


def test_clusters_deep_chain_fully_merges(spark, sf_dir):
    """doc_id % 250 == 0 docs form 6-member version chains of diameter 5
    (X, X+1M, X+2M, X+3M, X+4M, X+5M linked consecutively). A propagation
    loop that stops after a fixed small round count under-merges these;
    the fixed-point loop must report all six members under cluster_id X."""
    rows = P.x_dedup_clusters(spark, sf_dir).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
    deep_roots = {
        r.cluster_id for r in rows if r.cluster_id % 250 == 0 and r.cluster_id < 1000000
    }
    assert deep_roots, "fixture guarantees at least one deep chain"
    for root in deep_roots:
        expected = {root + off for off in (0, 1000000, 2000000, 3000000, 4000000, 5000000)}
        assert by_cluster[root] == expected


def test_clusters_members_share_identical_text(spark, sf_dir):
    """Edges link identical-text versions, so every component must be
    text-homogeneous — a mixed cluster means propagation leaked."""
    clusters = P.x_dedup_clusters(spark, sf_dir)
    docs = P._documents3(spark, sf_dir).select(
        "doc_id", F.md5("text").alias("h")
    )
    n_mixed = (
        clusters.join(docs, "doc_id")
        .groupBy("cluster_id")
        .agg(F.countDistinct("h").alias("nh"))
        .filter(F.col("nh") > 1)
        .count()
    )
    assert n_mixed == 0


def test_stratified_sample_is_deterministic_and_bounded(spark, sf_dir):
    from reconciliation_hive_data_spark.catalog import load

    kept = P.x_sample_stratified(spark, sf_dir)
    a = {r.doc_id for r in kept.collect()}
    b = {r.doc_id for r in P.x_sample_stratified(spark, sf_dir).collect()}
    assert a == b  # no RNG state anywhere

    docs = load(spark, sf_dir, "documents")
    non_en = docs.filter(F.col("lang") != "en").count()
    assert kept.filter(F.col("lang") != "en").count() == non_en  # rate 1.0 strata intact
    en_total = docs.filter(F.col("lang") == "en").count()
    en_kept = kept.filter(F.col("lang") == "en").count()
    # md5 is uniform: 3σ binomial envelope around the 50% target
    assert abs(en_kept - 0.5 * en_total) <= 3 * (en_total * 0.25) ** 0.5 + 1


def test_pii_scrub_fires_exactly_twice_per_doc(spark, sf_dir):
    """The fixture injects exactly one email + one phone per doc and the
    word-soup corpus contains neither pattern — any other count means the
    regexes over- or under-match."""
    bad = (
        P.x_text_pii(spark, sf_dir)
        .filter(F.col("n_redactions") != 2)
        .count()
    )
    assert bad == 0


def test_domain_mix_is_a_probability_allocation(spark, sf_dir):
    rows = P.x_domain_mix(spark, sf_dir).collect()
    assert rows
    total_w = sum(r.mix_weight for r in rows)
    assert abs(total_w - 1.0) < 1e-9
    assert all(r.token_budget >= 0 for r in rows)
    assert sum(r.token_budget for r in rows) <= 100_000_000


def test_incremental_admits_exactly_the_revised_delta(spark, sf_dir):
    """Re-crawled verbatim docs (original id % 20 == 0) must be rejected;
    revised docs must all be admitted."""
    admitted = {r.doc_id for r in P.x_dedup_incremental(spark, sf_dir).collect()}
    assert admitted, "fixture delta always contains revised docs"
    for did in admitted:
        assert (did - 1_000_000) % 20 != 0
    from reconciliation_hive_data_spark.catalog import load

    docs = load(spark, sf_dir, "documents")
    revised = {
        r.doc_id + 1_000_000
        for r in docs.filter(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 20 != 0)
        ).collect()
    }
    assert admitted == revised


def test_url_dedup_canonical_form_and_survivors(spark, sf_dir):
    rows = P.x_dedup_url(spark, sf_dir).collect()
    assert rows, "tracking-param variants guarantee merges"
    for r in rows:
        assert r.n_copies > 1
        assert not r.curl.startswith(("http://", "https://", "www."))
        assert "?" not in r.curl and "#" not in r.curl
        assert r.curl == r.curl.lower()
        assert not r.curl.endswith("/")


def test_repetition_features_are_valid_fractions(spark, sf_dir):
    df = P.x_text_repetition(spark, sf_dir)
    n_bad = df.filter(
        (F.col("dup_word_frac") < 0)
        | (F.col("dup_word_frac") >= 1)
        | (F.col("top_word_frac") <= 0)
        | (F.col("top_word_frac") > 1)
        | (F.col("dup_2gram_frac") < 0)
        | (F.col("dup_2gram_frac") >= 1)
    ).count()
    assert n_bad == 0


def test_decontaminate_flags_the_synthetic_duplicate(spark, sf_dir):
    """doc 0 is in the eval slice (0 % 97 == 0) and its verbatim copy
    1000000 is in training — the copy must surface fully contaminated."""
    rows = {r.doc_id: r for r in P.x_decontaminate(spark, sf_dir).collect()}
    assert 1_000_000 in rows
    assert rows[1_000_000].contamination == 1.0
    for r in rows.values():
        assert 0 < r.contamination <= 1.0
        assert 0 < r.n_hits <= r.n_grams


def test_eval_split_is_a_deterministic_partition(spark, sf_dir):
    """Every doc gets exactly one split, assignment is stable across
    runs, and the 3σ binomial envelope holds around 80/10/10."""
    from reconciliation_hive_data_spark.catalog import load

    rows = P.x_eval_split(spark, sf_dir).collect()
    again = P.x_eval_split(spark, sf_dir).collect()
    assert {(r.doc_id, r.split) for r in rows} == {(r.doc_id, r.split) for r in again}
    n = load(spark, sf_dir, "documents").count()
    assert len(rows) == n
    counts = {"train": 0, "val": 0, "test": 0}
    for r in rows:
        counts[r.split] += 1
    for split, p_target in (("train", 0.8), ("val", 0.1), ("test", 0.1)):
        sigma = (n * p_target * (1 - p_target)) ** 0.5
        assert abs(counts[split] - p_target * n) <= 3 * sigma + 1


def test_indexed_near_dedup_equals_recompute(spark, sf_dir):
    """x_dedup_near_indexed reads persisted shingle/signature indexes; its
    output must be pair-for-pair identical to the fully oracle-checked
    recompute form — this equality IS its correctness check (stronger
    than a rows-only count)."""
    from reconciliation_hive_data_spark.plans.llm import x_dedup_near

    indexed = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in P.x_dedup_near_indexed(spark, sf_dir).collect()
    }
    direct = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in x_dedup_near(spark, sf_dir).collect()
    }
    assert indexed == direct
    assert indexed  # the dup fixture guarantees pairs


def test_partsupp_fixture_is_sf_portable(spark, sf_dir):
    """The derived partsupp must hold its invariants at ANY scale factor:
    <= 2 suppliers per part (2 modular slots, minus collisions), every
    supplier key inside the real supplier range, costs in the documented
    2-dp money band, availqty in [1, 999]."""
    from pyspark.sql import functions as F

    from reconciliation_hive_data_spark.catalog import load
    from reconciliation_hive_data_spark.plans.tpch import _partsupp

    ps = _partsupp(spark, sf_dir)
    n_supp = load(spark, sf_dir, "supplier").count()
    stats = ps.agg(
        F.count("*").alias("n"),
        F.countDistinct("ps_partkey").alias("parts"),
        F.max("ps_suppkey").alias("max_sk"),
        F.min("ps_suppkey").alias("min_sk"),
        F.min("ps_supplycost").alias("min_c"),
        F.max("ps_supplycost").alias("max_c"),
        F.min("ps_availqty").alias("min_q"),
        F.max("ps_availqty").alias("max_q"),
    ).first()
    n_parts = load(spark, sf_dir, "part").count()
    assert stats["parts"] == n_parts
    assert n_parts <= stats["n"] <= 2 * n_parts
    assert 0 <= stats["min_sk"] and stats["max_sk"] < n_supp
    assert 10.0 <= stats["min_c"] and stats["max_c"] <= 99.99
    assert 1 <= stats["min_q"] and stats["max_q"] <= 999
    per_part_max = (
        ps.groupBy("ps_partkey").count().agg(F.max("count")).first()[0]
    )
    assert per_part_max <= 2
