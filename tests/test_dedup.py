"""Dedup operators: exact, MinHash+LSH, Jaccard verify, SimHash."""

from pyspark.sql import functions as F

from traits_data_spark.operators.dedup import (
    exact_dedup,
    jaccard_verify,
    minhash_lsh_candidates,
    simhash64,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different text about spark engines"),
        (5, "THE  quick   brown fox jumps over the lazy dog"),  # ws/case dup
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_normalizes_whitespace_and_case(spark):
    out = exact_dedup(_docs(spark), "text", "doc_id").collect()
    by_keep = {r["keep_id"]: r["dup_count"] for r in out}
    assert by_keep[1] == 3  # docs 1, 2, 5 collapse
    assert by_keep[3] == 1
    assert by_keep[4] == 1


def test_lsh_finds_near_duplicates(spark):
    cand = minhash_lsh_candidates(
        _docs(spark), "text", "doc_id", num_hashes=16, bands=8
    )
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (1, 2) in pairs and (1, 5) in pairs  # exact dups always collide
    assert (1, 3) in pairs  # near dup with 8 bands of 2


def test_lsh_bucket_cap_drops_degenerate_buckets(spark):
    df = _docs(spark)
    full = minhash_lsh_candidates(df, "text", "doc_id", 16, 8).count()
    capped = minhash_lsh_candidates(
        df, "text", "doc_id", 16, 8, max_bucket_size=1
    ).count()
    assert capped == 0 < full


def test_lsh_plan_has_single_join(spark):
    """The melted formulation joins once regardless of band count."""
    cand = minhash_lsh_candidates(
        _docs(spark), "text", "doc_id", 16, 8, max_bucket_size=None
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) == 1


def test_jaccard_verify_scores(spark):
    df = _docs(spark)
    cand = minhash_lsh_candidates(df, "text", "doc_id", 16, 8)
    ver = jaccard_verify(cand, df, "text", "doc_id", threshold=0.0)
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ver.collect()}
    assert j[(1, 2)] == 1.0
    assert 0.5 < j[(1, 3)] < 1.0
    strict = jaccard_verify(cand, df, "text", "doc_id", threshold=0.99)
    pairs = {(r["id_a"], r["id_b"]) for r in strict.collect()}
    assert (1, 3) not in pairs


def test_simhash_near_dups_have_small_hamming(spark):
    from traits_data_spark.operators.dedup import hamming_dist

    out = simhash64(_docs(spark), "text", "doc_id")
    sims = {r["id"]: r["simhash"] for r in out.collect()}
    assert sims[1] == sims[2] == sims[5]  # identical after normalization
    df = spark.createDataFrame(
        [(sims[1], sims[3]), (sims[1], sims[4])], ["a", "b"]
    )
    d = df.select(hamming_dist(F.col("a"), F.col("b")).alias("d")).collect()
    near, far = d[0]["d"], d[1]["d"]
    assert near < far


def test_word_ngrams_and_token_jaccard(spark):
    from traits_data_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        word_ngrams,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    grams = df.select(word_ngrams("text", n=3).alias("g")).collect()[0]["g"]
    assert grams == ["a b c", "b c d"]

    docs = _docs(spark)
    cand = minhash_lsh_candidates(docs, "text", "doc_id", 16, 8)
    out = ngram_jaccard_pairs(cand, docs, "text", "doc_id", n=3, threshold=0.0)
    j = {(r["id_a"], r["id_b"]): r["ngram_jaccard"] for r in out.collect()}
    assert j[(1, 2)] == 1.0
    assert 0.0 < j[(1, 3)] < 1.0


def test_simhash_near_dups_banding(spark):
    from traits_data_spark.operators.dedup import simhash_near_dups

    out = simhash_near_dups(_docs(spark), "text", "doc_id", bands=4, max_hamming=6)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    # the exact-dup cluster (1,2,5) collides at distance 0
    assert pairs[(1, 2)] == 0 and pairs[(1, 5)] == 0 and pairs[(2, 5)] == 0
    # on 9-token docs one changed word flips many simhash bits, so the
    # near-dup (1,3) is beyond max_hamming=6 — and the unrelated doc 4
    # must never appear
    assert all(4 not in p for p in pairs)
    assert all(h <= 6 for h in pairs.values())


def test_connected_components_transitive_chain(spark):
    """A path graph a-b-c-d needs multiple propagation rounds; all
    nodes must converge to the min id even though (a,d) is no pair."""
    from traits_data_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (50, 60)], ["id_a", "id_b"]
    )
    comp = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert comp == {10: 10, 20: 10, 30: 10, 40: 10, 50: 50, 60: 50}


def test_dedup_clusters_singletons_and_canonical(spark):
    from traits_data_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 4)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(2, 3)], ["id_a", "id_b"])
    rows = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in dedup_clusters(docs, pairs, "doc_id").collect()
    }
    assert rows == {1: (1, True), 2: (2, True), 3: (2, False), 4: (4, True)}


def test_ngram_decontaminate_overlap_counts(spark):
    from traits_data_spark.operators.dedup import ngram_decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares 3-grams with bench 100
            (2, "totally unrelated words here"),
            (3, "quick brown fox runs away"),   # shares one 3-gram
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox sleeps"), (101, "nothing in common")],
        ["bench_id", "text"],
    )
    out = {
        r["id"]: (r["overlap_ngrams"], r["matched_bench_docs"])
        for r in ngram_decontaminate(
            corpus, bench, "text", "doc_id", "bench_id", n=3
        ).collect()
    }
    # doc 1: "the quick brown" + "quick brown fox" both in bench 100
    assert out[1] == (2, 1)
    # doc 3: "quick brown fox" only
    assert out[3] == (1, 1)
    assert 2 not in out


def test_dedup_clusters_best_by_quality(spark):
    from traits_data_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5)], ["doc_id", "quality"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    rows = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in dedup_clusters(docs, pairs, "doc_id", best_by="quality").collect()
    }
    # one cluster {1,2,3}; doc 2 wins on quality despite not being min id
    assert rows == {1: (1, False), 2: (1, True), 3: (1, False)}


def test_incremental_lsh_matches_full_rerun(spark):
    """old-candidates ∪ incremental(new vs banded(old)) must equal a
    full re-run over old+new — history never re-hashed."""
    from traits_data_spark.operators.dedup import (
        banded_signatures,
        incremental_lsh_candidates,
        minhash_lsh_candidates,
    )

    docs = _docs(spark)  # ids 1..5 with dup/near-dup structure
    old = docs.filter("doc_id <= 3")
    new = docs.filter("doc_id > 3")
    params = dict(num_hashes=16, bands=4)

    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            docs, "text", "doc_id", max_bucket_size=None, **params
        ).collect()
    }
    old_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            old, "text", "doc_id", max_bucket_size=None, **params
        ).collect()
    }
    inc = {
        (r["id_a"], r["id_b"])
        for r in incremental_lsh_candidates(
            new,
            banded_signatures(old, "text", "doc_id", **params),
            "text",
            "doc_id",
            max_bucket_size=None,
            **params,
        ).collect()
    }
    assert old_pairs | inc == full
    assert old_pairs.isdisjoint(inc)


def test_dedup_lines_keep_first(spark):
    from traits_data_spark.operators.dedup import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared\nbeta"),
            (2, "shared\ngamma"),      # 'shared' already seen in doc 1
            (3, "shared"),             # loses its only line → drops out
            (4, None),                 # null text drops up front
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_lines"] == 3
    assert rows[1]["kept_lines"] == 3
    assert rows[1]["clean_text"] == "alpha\nshared\nbeta"
    assert rows[2]["n_lines"] == 2
    assert rows[2]["kept_lines"] == 1
    assert rows[2]["clean_text"] == "gamma"


def test_dedup_lines_drop_frequent(spark):
    from traits_data_spark.operators.dedup import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "boiler\nunique1"),
            (2, "boiler\nunique2"),
            (3, "boiler\nunique3"),
        ],
        ["doc_id", "text"],
    )
    out = dedup_lines(docs, mode="drop_frequent", max_occurrences=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    # 'boiler' occurs 3 > 2 times → removed from ALL documents
    assert all(rows[i]["clean_text"] == f"unique{i}" for i in (1, 2, 3))
    assert all(rows[i]["kept_lines"] == 1 for i in (1, 2, 3))


def test_dedup_lines_preserves_order_and_duplicate_lines_within_doc(spark):
    from traits_data_spark.operators.dedup import dedup_lines

    # the SAME line twice inside one doc: keep_first keeps only the
    # earliest occurrence corpus-wide, even within a document
    docs = spark.createDataFrame([(7, "x\ny\nx\nz")], ["doc_id", "text"])
    r = dedup_lines(docs).collect()[0]
    assert r["clean_text"] == "x\ny\nz"
    assert r["n_lines"] == 4
    assert r["kept_lines"] == 3


def test_dedup_lines_bad_mode(spark):
    import pytest as _pytest

    from traits_data_spark.operators.dedup import dedup_lines

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        dedup_lines(docs, mode="nope")


def test_substring_dup_profile_hand_computed(spark):
    from pyspark.sql import Row

    from traits_data_spark.operators.dedup import substring_dup_profile

    quote = " ".join(f"q{i}" for i in range(20))  # 20-word shared passage
    a = quote + " " + " ".join(f"a{i}" for i in range(10))
    b = " ".join(f"b{i}" for i in range(10)) + " " + quote
    c = " ".join(f"c{i}" for i in range(30))
    short = "too short"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=a), Row(doc_id=2, text=b),
         Row(doc_id=3, text=c), Row(doc_id=4, text=short)]
    )
    out = {r["doc_id"]: r for r in substring_dup_profile(df, window=16).collect()}
    assert 4 not in out  # below the window size
    assert out[3]["dup_windows"] == 0
    # the shared 20-word passage contributes exactly 20-16+1 = 5
    # duplicated windows to each of A and B
    assert out[1]["dup_windows"] == 5
    assert out[2]["dup_windows"] == 5
    assert out[1]["n_windows"] == 30 - 16 + 1
    assert out[1]["dup_bp"] == 5 * 10000 // 15


def test_substring_dup_profile_same_doc_repeat(spark):
    from pyspark.sql import Row

    from traits_data_spark.operators.dedup import substring_dup_profile

    passage = " ".join(f"w{i}" for i in range(16))
    doc = passage + " sep " + passage  # verbatim self-repeat
    df = spark.createDataFrame([Row(doc_id=1, text=doc)])
    row = substring_dup_profile(df, window=16).collect()[0]
    # both copies of the 16-word window hash identically
    assert row["dup_windows"] >= 2


def test_remove_dup_substrings_hand_computed(spark):
    from traits_data_spark.operators.dedup import remove_dup_substrings

    shared = "s1 s2 s3 s4 s5"  # 5-token passage shared by docs 1 and 2
    docs = spark.createDataFrame(
        [
            (1, "a1 a2 a3 a4 a5 a6 " + shared),
            (2, "b1 b2 " + shared + " b3 b4"),
            (3, "x y z"),  # shorter than the window: untouched
            (4, None),     # null text drops up front
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in remove_dup_substrings(docs, window=4).collect()
    }
    assert set(out) == {1, 2, 3}
    # doc 1 holds the first corpus-order occurrence of every shared
    # window → fully intact
    assert out[1]["n_tokens"] == 11
    assert out[1]["kept_tokens"] == 11
    assert out[1]["clean_text"] == "a1 a2 a3 a4 a5 a6 " + shared
    # doc 2's two shared windows (starts 3 and 4) are non-first; their
    # union covers exactly the 5 shared tokens
    assert out[2]["n_tokens"] == 9
    assert out[2]["kept_tokens"] == 4
    assert out[2]["clean_text"] == "b1 b2 b3 b4"
    assert out[3]["clean_text"] == "x y z"


def test_remove_dup_substrings_within_doc_repeat(spark):
    from traits_data_spark.operators.dedup import remove_dup_substrings

    # verbatim self-repeat: the second copy of the 4-token passage is
    # removed even inside a single document
    docs = spark.createDataFrame(
        [(7, "p1 p2 p3 p4 zz p1 p2 p3 p4")], ["doc_id", "text"]
    )
    r = remove_dup_substrings(docs, window=4).collect()[0]
    assert r["n_tokens"] == 9
    assert r["kept_tokens"] == 5
    assert r["clean_text"] == "p1 p2 p3 p4 zz"


def test_remove_dup_substrings_full_copy_drops_out(spark):
    from traits_data_spark.operators.dedup import remove_dup_substrings

    # doc 9 is an exact copy of doc 8: its single window is non-first,
    # every token is covered, so it vanishes from the output entirely
    docs = spark.createDataFrame(
        [(8, "f1 f2 f3 f4"), (9, "f1 f2 f3 f4")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in remove_dup_substrings(docs, window=4).collect()}
    assert set(out) == {8}
    assert out[8]["kept_tokens"] == 4


def test_remove_dup_substrings_bad_window(spark):
    import pytest as _pytest

    from traits_data_spark.operators.dedup import remove_dup_substrings

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        remove_dup_substrings(docs, window=1)


def test_bloom_decontaminate_matches_exact(spark, documents):
    import pyspark.sql.functions as F
    from traits_data_spark.operators.dedup import (
        bloom_decontaminate,
        ngram_decontaminate,
    )

    bench = documents.filter(F.col("source") == "src0")
    corpus = documents.filter(F.col("source") != "src0")
    want = {
        tuple(r)
        for r in ngram_decontaminate(
            corpus, bench, "text", "doc_id", "doc_id", n=4, min_overlap=2
        ).collect()
    }
    got = {
        tuple(r)
        for r in bloom_decontaminate(
            corpus, bench, "text", "doc_id", "doc_id", n=4, min_overlap=2
        ).collect()
    }
    assert got == want and want
    # a deliberately undersized Bloom floods the verify join with false
    # positives; the output must STILL be exact (prefilter-only contract)
    tiny = {
        tuple(r)
        for r in bloom_decontaminate(
            corpus, bench, "text", "doc_id", "doc_id",
            n=4, min_overlap=2, m_bits=1 << 9, k_hashes=2,
        ).collect()
    }
    assert tiny == want


def test_containment_catches_subset_jaccard_misses(spark):
    import pyspark.sql.functions as F
    from traits_data_spark.operators.dedup import (
        containment_verify,
        jaccard_verify,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from a warm windowsill in the late afternoon sun"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " " + ("completely different trailing content "
                              "padding the page with navigation boilerplate "
                              "and footer links and more and more text ") * 5),
            (3, "unrelated text about spark physical plans and shuffles"),
        ],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    cont = {
        (r.id_a, r.id_b): r
        for r in containment_verify(
            cand, docs, "text", "doc_id", threshold=0.9
        ).collect()
    }
    # doc 1 is fully contained in doc 2 -> containment ~1.0 even though
    # jaccard is diluted by doc 2's extra content
    assert (1, 2) in cont and cont[(1, 2)].containment_a >= 0.9
    assert cont[(1, 2)].jaccard < 0.5
    assert (1, 3) not in cont
    # jaccard_verify at the same bar prunes the pair (by design)
    jac = jaccard_verify(cand, docs, "text", "doc_id", threshold=0.9).collect()
    assert not [r for r in jac if (r.id_a, r.id_b) == (1, 2)]


# ---------------------------------------------------------------------------
# Incremental exact dedup against a persisted content-hash index
# ---------------------------------------------------------------------------

def test_incremental_exact_dedup_matches_sequential_replay(spark, tmp_path):
    from traits_data_spark.operators.dedup import (
        content_hash_index,
        extend_content_index,
        incremental_exact_dedup,
        normalized_text,
    )

    rows = [
        (1, "alpha beta"),
        (2, "ALPHA   beta"),        # exact dup of 1 after normalization
        (3, "gamma delta"),
        # batch 1
        (10, "alpha beta"),         # already in history -> dropped
        (11, "epsilon zeta"),       # new content -> kept
        (12, "Epsilon  ZETA"),      # in-batch dup of 11 -> dropped (11 < 12)
        # batch 2
        (20, "epsilon zeta"),       # kept by batch 1 -> dropped
        (21, "eta theta"),          # new -> kept
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    history = docs.filter(F.col("doc_id") < 10)
    b1 = docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
    b2 = docs.filter(F.col("doc_id") >= 20)

    index_path = str(tmp_path / "content_index")
    content_hash_index(history, "text", "doc_id").write.parquet(index_path)

    idx0 = spark.read.parquet(index_path)
    kept1 = incremental_exact_dedup(b1, idx0, "text", "doc_id")
    idx1 = extend_content_index(idx0, kept1, "doc_id")
    kept2 = incremental_exact_dedup(b2, idx1, "text", "doc_id")

    assert {r.doc_id for r in kept1.collect()} == {11}
    assert {r.doc_id for r in kept2.collect()} == {21}
    # index after both batches covers every distinct content exactly once
    final = idx1.unionByName(
        kept2.select("content_hash", F.col("doc_id").alias("min_id"))
    )
    hashes = [r.content_hash for r in final.collect()]
    assert len(hashes) == len(set(hashes)) == 4

    # first-seen-wins: content already in history keeps its original id
    # even when the batch re-sends it under a smaller one
    small = spark.createDataFrame([(0, "gamma delta")], "doc_id long, text string")
    assert incremental_exact_dedup(small, idx0, "text", "doc_id").count() == 0


def test_incremental_exact_dedup_broadcast_off_parity(spark, documents):
    """broadcast_batch=False (the bulk-backfill escape hatch) must
    return the identical kept set."""
    from traits_data_spark.operators.dedup import (
        content_hash_index,
        incremental_exact_dedup,
    )

    docs = documents.select("doc_id", "text")
    history = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    index = content_hash_index(history, "text", "doc_id")
    on = {
        r.doc_id
        for r in incremental_exact_dedup(
            batch, index, "text", "doc_id"
        ).collect()
    }
    off = {
        r.doc_id
        for r in incremental_exact_dedup(
            batch, index, "text", "doc_id", broadcast_batch=False
        ).collect()
    }
    assert on == off and on


def test_incremental_exact_dedup_never_shuffles_history(spark, documents):
    """The steady-state plan streams the index map-side: no Exchange
    directly over the index scan when the batch broadcasts."""
    from traits_data_spark.operators.dedup import (
        content_hash_index,
        incremental_exact_dedup,
    )

    docs = documents.select("doc_id", "text")
    index = content_hash_index(
        docs.filter(F.col("doc_id") % 3 != 0), "text", "doc_id"
    )
    kept = incremental_exact_dedup(
        docs.filter(F.col("doc_id") % 3 == 0), index, "text", "doc_id"
    )
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # both index-touching joins are broadcast joins, never sort-merge
    assert "SortMergeJoin" not in plan


def test_incremental_exact_dedup_replayed_batch(spark):
    """The kept output (which carries content_hash) must be ingestible
    as a batch itself — replay/backfill safety."""
    from traits_data_spark.operators.dedup import (
        content_hash_index,
        incremental_exact_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    idx = content_hash_index(docs, "text", "doc_id")
    kept = incremental_exact_dedup(
        spark.createDataFrame([(5, "new stuff")], "doc_id long, text string"),
        idx,
        "text",
        "doc_id",
    )
    # re-ingest the kept rows (content_hash column present): all seen,
    # and the reserved-name drop announces itself
    import pytest as _pytest

    with _pytest.warns(UserWarning, match="content_hash"):
        replay = incremental_exact_dedup(
            kept,
            idx.unionByName(
                kept.select("content_hash", F.col("doc_id").alias("min_id"))
            ),
            "text",
            "doc_id",
        )
    assert replay.count() == 0
