"""Property tests for the approximate north-star ops (no SQL oracle by
nature): MinHash-LSH vs exact Jaccard, LSH-ANN recall vs brute force,
SimHash determinism, multimodal stub determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_data_pipeline_spark.catalog import load
from aws_data_pipeline_spark.operators import dedup, multimodal, similarity


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    exact = {
        (r.doc1, r.doc2)
        for r in dedup.jaccard_pairs(d, "doc_id", k=5, threshold=0.8).collect()
    }
    lsh = {
        (r.doc1, r.doc2)
        for r in dedup.minhash_lsh_pairs(
            d, "doc_id", k=5, num_perm=16, bands=4, threshold=0.8
        ).collect()
    }
    # precision is exact by construction (candidates verified with true
    # jaccard); recall at j>=0.8 with 4 bands of 4 rows is ~1-(1-0.8^4)^4≈0.98
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.9


def test_ann_lsh_recall(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(q, e, k=5).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_topk_lsh(q, e, k=5, n_planes=4).collect()
    }
    # 4 planes -> 16 buckets; same-bucket collision for near vectors is high
    # but not guaranteed — require a sane recall floor, not perfection
    assert len(ann & brute) / len(brute) >= 0.3
    # every ANN result must still be a real corpus vector, ranked 1..5
    assert all(1 <= r.rank <= 5 for r in similarity.ann_topk_lsh(q, e, k=5).collect())


def test_ann_ivf_recall(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(q, e, k=5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(q, e, k=5, n_cells=8, nprobe=4).collect()
    }
    # probing half the cells: most true neighbors should land in a probed cell
    assert len(ivf & brute) / len(brute) >= 0.5
    assert all(
        1 <= r.rank <= 5
        for r in similarity.ivf_topk(q, e, k=5, n_cells=8, nprobe=4).collect()
    )


def test_simhash_deterministic_and_close_on_neardups(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    h1 = {r.doc: r.simhash for r in dedup.simhash(d, "doc_id").collect()}
    h2 = {r.doc: r.simhash for r in dedup.simhash(d, "doc_id").collect()}
    assert h1 == h2  # deterministic across runs
    # identical text -> identical simhash
    two = d.limit(1).select(F.lit(1).alias("doc_id"), "text").unionByName(
        d.limit(1).select(F.lit(2).alias("doc_id"), "text")
    )
    vals = [r.simhash for r in dedup.simhash(two, "doc_id").collect()]
    assert vals[0] == vals[1]


def test_multimodal_stub_deterministic(spark, sf_dir):
    d = load(spark, sf_dir, "documents").limit(50)
    media = multimodal.synthesize_media(d, "doc_id")
    f1 = sorted(map(tuple, multimodal.decode_features(media).collect()))
    f2 = sorted(map(tuple, multimodal.decode_features(media).collect()))
    assert f1 == f2
    assert all(row[2] == 16 for row in f1)  # md5 payload is 16 bytes
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_real(media)


def test_ivf_persisted_index(spark, sf_dir, tmp_path):
    """build once / query many: the persisted index returns the same results
    as the inline ivf_topk with the same quantizer params, and the probe scan
    prunes to the probed cell partitions."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(e, idx, n_cells=8)
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.ivf_topk_indexed(spark, q, idx, k=5, nprobe=4).collect()
    }
    inline = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.ivf_topk(q, e, k=5, n_cells=8, nprobe=4).collect()
    }
    assert got == inline
    # second query batch reuses the index without retraining
    q2 = e.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 15))
    out2 = similarity.ivf_topk_indexed(spark, q2, idx, k=3, nprobe=2)
    assert out2.groupBy("query_id").count().filter(F.col("count") != 3).isEmpty()


def test_pii_scrub_patterns(spark):
    """Pattern semantics on crafted strings — and dialect equivalence: the
    DuckDB oracle (RE2) must count and scrub exactly like Spark (Java regex),
    since the registry query only exercises the zero-redaction path."""
    import duckdb

    from aws_data_pipeline_spark.operators import scrub
    from aws_data_pipeline_spark.plans.llm import _pii_count_sql, _pii_scrub_sql

    rows = [
        (0, "contact bob.smith+x@example.co.uk or visit https://a.b/c?d=1 now"),
        (1, "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.255 done"),
        (2, "no pii here at all"),
        (3, "double email a@b.io c@d.org and 1.2.3.4"),
        (4, "see (https://a.com), then [x](https://b.org/p) next"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.clean_text, r.n_redactions)
        for r in scrub.redact_pii(df).collect()
    }
    assert got[0] == ("contact <EMAIL> or visit <URL> now", 2)
    assert got[1] == ("ssn <SSN> phone <PHONE> ip <IP> done", 3)
    assert got[2] == ("no pii here at all", 0)
    assert got[3] == ("double email <EMAIL> <EMAIL> and <IP>", 3)
    # trailing punctuation survives the URL scrub (parens stay balanced,
    # the markdown link keeps its closing bracket)
    assert got[4] == ("see (<URL>), then [x](<URL>) next", 2)

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        oracle = con.execute(
            f"SELECT doc_id, {_pii_scrub_sql()}, {_pii_count_sql()} FROM t"
        ).fetchall()
    finally:
        con.close()
    for doc_id, clean, n in oracle:
        assert got[doc_id] == (clean, n), (doc_id, clean, n)


def test_decontaminate_planted(spark):
    """A train doc embedding a verbatim 8-gram from the benchmark is flagged;
    clean docs (including one shorter than 8 tokens) are not."""
    from aws_data_pipeline_spark.operators import text as tx

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (1, "intro words then alpha beta gamma delta epsilon zeta eta theta closing"),
            (2, "completely different content with no overlap whatsoever in any window"),
            (3, "short doc"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.n_shared_ngrams, r.contaminated) for r in
           tx.decontaminate(train, bench, n=8).collect()}
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_repetition_stats_hand_computed(spark):
    from aws_data_pipeline_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z w"), (3, "q")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in tx.repetition_stats(df).collect()}
    # doc 1: 5 tokens, 2 distinct -> dup 0.6; bigrams [ab, ba, ab, ba] -> top 2/4
    assert got[1].n_tokens == 5
    assert abs(got[1].dup_token_fraction - 0.6) < 1e-12
    assert abs(got[1].top_bigram_fraction - 0.5) < 1e-12
    # doc 2: all distinct -> dup 0; every bigram unique -> 1/3
    assert got[2].dup_token_fraction == 0.0
    assert abs(got[2].top_bigram_fraction - 1 / 3) < 1e-12
    # doc 3: single token -> no bigrams
    assert got[3].n_tokens == 1
    assert got[3].top_bigram_fraction == 0.0


def test_connected_components_chain(spark):
    """Transitivity: A-B and B-C (no A-C edge) must land in ONE cluster with
    the min id canonical; isolated docs stay singletons."""
    from aws_data_pipeline_spark.operators import dedup

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(7)], ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (3, 4)], ["doc1", "doc2"]
    )
    got = {
        r.doc_id: (r.canonical_doc_id, r.is_duplicate)
        for r in dedup.cluster_assignments(docs, pairs).collect()
    }
    assert got == {
        0: (0, False),
        1: (1, False),
        2: (1, True),
        3: (1, True),
        4: (1, True),
        5: (5, False),
        6: (5, True),
    }


def test_connected_components_matches_union_find(spark, sf_dir):
    """Spark label propagation == plain union-find on the collected pair
    list (independent implementation)."""
    from aws_data_pipeline_spark.operators import dedup
    from aws_data_pipeline_spark.plans.common import T

    d = T(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(d, "doc_id", k=5, threshold=0.8)
    edge_list = [(r.doc1, r.doc2) for r in pairs.collect()]

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min id in component: one more pass normalizes path halving
    expected = {n: find(n) for n in parent}

    got = {
        r.doc_id: r.canonical_doc_id
        for r in dedup.cluster_assignments(d, pairs).collect()
    }
    for n, c in expected.items():
        assert got[n] == c, (n, c, got[n])
    for n, c in got.items():
        if n not in expected:
            assert c == n


def test_neardup_pairs_lsh_matches_allpairs(spark, sf_dir):
    """The registered banded-LSH pair finder must emit EXACTLY the all-pairs
    baseline's pairs (precision is exact by construction — verified cosine —
    and at r=4/b=32 the per-pair recall at sim>=0.45 is ~0.9998; this pins
    the empirical 100% on the deterministic seeded planes + fixed corpus,
    which is what the driver's oracle hash requires)."""
    e = load(spark, sf_dir, "embeddings")
    exact = {
        (r.id1, r.id2) for r in similarity.neardup_pairs(e, threshold=0.45).collect()
    }
    lsh = {
        (r.id1, r.id2)
        for r in similarity.neardup_pairs_lsh(e, threshold=0.45).collect()
    }
    assert lsh == exact
    assert exact  # non-vacuous: the corpus does contain qualifying pairs


def test_neardup_pairs_lsh_plan_is_equi_join(spark, sf_dir):
    """The LSH formulation must plan as a (shuffled/broadcast) HASH equi-join
    — never the BroadcastNestedLoopJoin the all-pairs theta join degrades to."""
    e = load(spark, sf_dir, "embeddings")
    plan = similarity.neardup_pairs_lsh(e, threshold=0.45)._jdf.queryExecution().executedPlan().toString()
    assert "HashJoin" in plan
    allpairs_plan = similarity.neardup_pairs(e, threshold=0.45)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in allpairs_plan  # the shape we replaced


def _hot_shingle_corpus(spark):
    """Stopword-heavy corpus: every doc opens with the same 6-token
    boilerplate (a hot shingle shared by all 40 docs), then a unique tail —
    except docs 0/1 which are true near-duplicates of each other."""
    boiler = "terms of service apply to everyone"
    rows = []
    for i in range(40):
        if i in (0, 1):
            tail = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
        else:
            tail = " ".join(f"tok{i}_{j}" for j in range(12))
        rows.append((i, f"{boiler} {tail}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_hot_shingle_skew_guard(spark):
    d = _hot_shingle_corpus(spark)
    # the boilerplate shingles really are hot: bucket size == corpus size,
    # far beyond the cap we test with — so the guard is exercised for real
    from aws_data_pipeline_spark.operators.text import shingles, tokens

    idx = d.select(
        F.col("doc_id"), F.explode(shingles(tokens(F.col("text")), 5)).alias("s")
    )
    hot = idx.groupBy("s").count().agg(F.max("count")).collect()[0][0]
    assert hot == 40

    uncapped = {
        (r.doc1, r.doc2)
        for r in dedup.jaccard_pairs(d, "doc_id", threshold=0.8, max_bucket=None).collect()
    }
    capped = {
        (r.doc1, r.doc2)
        for r in dedup.jaccard_pairs(d, "doc_id", threshold=0.8, max_bucket=10).collect()
    }
    # above-threshold pairs survive the guard: near-dups share many
    # discriminative shingles, so dropping boilerplate buckets loses nothing
    assert capped == uncapped == {(0, 1)}


def test_simhash_numpy_matches_reference_loop(spark):
    """The vectorized simhash (np.unique + unpackbits + reduceat) must be
    bit-identical to the definitional per-token md5 vote loop, including on
    empty text, None, unicode, repeated tokens, and long docs."""
    import hashlib

    def ref(text):
        votes = [0] * 64
        for tok in str(text).lower().split(" "):
            h = int.from_bytes(
                hashlib.md5(tok.encode()).digest()[:8], "big", signed=False
            )
            for bit in range(64):
                votes[bit] += 1 if (h >> bit) & 1 else -1
        val = 0
        for bit in range(64):
            if votes[bit] > 0:
                val |= 1 << bit
        return val - (1 << 64) if val >= 1 << 63 else val

    texts = [
        "hello world foo bar",
        "",
        "a",
        "the quick brown fox jumps over the lazy dog",
        "x " * 500 + "y",
        None,
        "Ünïcôdé tøkens här",
        "dup dup dup dup",
        "  leading double  spaces ",
        "MiXeD CaSe ToKeNs",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc"]: r["simhash"] for r in dedup.simhash(df, "doc_id").collect()}
    assert got == {i: ref(t) for i, t in enumerate(texts)}


def test_registry_ivf_resident_equals_persisted(spark, sf_dir):
    """The resident (embedding_ann_ivf) and persisted (embedding_ann_ivf_indexed)
    searches share ONE trained quantizer (the on-disk index — seeded KMeans is
    not bit-deterministic across fits, so retraining would diverge) and must
    return identical rows."""
    from aws_data_pipeline_spark.plans import load_registry

    reg = load_registry()
    from aws_data_pipeline_spark.plans import DEMOTED

    assert reg is not None  # load_registry() populates DEMOTED
    a = {
        tuple(r)
        for r in DEMOTED["embedding_ann_ivf"].spark_fn(spark, sf_dir).collect()
    }
    b = {
        tuple(r)
        for r in DEMOTED["embedding_ann_ivf_indexed"]  # demoted r10
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert a == b and len(a) > 0


def test_registry_pq_resident_equals_persisted(spark, sf_dir):
    """The resident (embedding_ann_pq, demoted) and persisted
    (embedding_ann_pq_indexed) searches share ONE set of stored codebooks
    and code rows (the on-disk index — _pq_corpus reads both from it, the
    _ivf_index single-source-of-truth rule) and must return identical
    rows; the index itself is the append-maintained shape (build on the
    vec_id%10!=7 slice, append the rest under stored codebooks)."""
    from aws_data_pipeline_spark.plans import DEMOTED, load_registry

    reg = load_registry()
    a = {
        tuple(r)
        for r in DEMOTED["embedding_ann_pq"].spark_fn(spark, sf_dir).collect()
    }
    b = {
        tuple(r)
        for r in DEMOTED["embedding_ann_pq_indexed"]  # demoted r11
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert a == b and len(a) > 0


def test_registry_text_index_probe_equals_resident(spark, sf_dir):
    """The persisted corpus LSH index probe (text_neardup_index_probe) must
    return exactly the rows of its resident, SQL-oracled twin
    (incremental_neardup_pairs) — same md5-portable params, same new/corpus
    split, index read from disk instead of re-derived."""
    from aws_data_pipeline_spark.plans import load_registry

    reg = load_registry()
    a = {
        tuple(r)
        for r in reg["incremental_neardup_pairs"].spark_fn(spark, sf_dir).collect()
    }
    b = {
        tuple(r)
        for r in reg["text_neardup_index_probe"].spark_fn(spark, sf_dir).collect()
    }
    assert a == b and len(a) > 0


def test_choose_lsh_params_rule():
    """choose_lsh_params: bucket bound holds, recall formula satisfied,
    deeper codes for bigger corpora."""
    import math

    r, b = similarity.choose_lsh_params(10**9, 0.45, target_recall=0.999)
    assert 10**9 / 2**r <= 10_000
    p = 1.0 - math.acos(0.45) / math.pi
    assert 1.0 - (1.0 - p**r) ** b >= 0.999
    r2, _ = similarity.choose_lsh_params(10**12, 0.45, target_recall=0.999)
    assert r2 > r
    # tiny corpus: no pruning needed, one row per band suffices
    r3, b3 = similarity.choose_lsh_params(1000, 0.45)
    assert r3 == 1 and b3 >= 1


def test_choose_minhash_params_rule():
    """choose_minhash_params: S-curve midpoint lands at/below the threshold,
    and at the registered query's threshold (0.8) it reproduces the
    registered banding (16 perms, 4 bands of 4)."""
    from aws_data_pipeline_spark.operators.dedup import choose_minhash_params

    n, b = choose_minhash_params(0.8)
    assert (n, b) == (16, 4)
    for thr in (0.3, 0.5, 0.7, 0.9):
        n, b = choose_minhash_params(thr)
        r = n // b
        assert (1.0 / b) ** (1.0 / r) <= thr + 1e-12


def test_neardup_lsh_verify_modes_agree(spark, sf_dir):
    """The bucket-verify (dense-collision) and pair-join (sparse-collision)
    candidate paths must emit identical pairs — same bands, same exact JVM
    verify, different shuffle shapes."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = {tuple(r) for r in
         similarity.neardup_pairs_lsh(e, threshold=0.45, verify="bucket").collect()}
    b = {tuple(r) for r in
         similarity.neardup_pairs_lsh(e, threshold=0.45, verify="pairs").collect()}
    assert a == b


def test_line_dedup_removes_boilerplate(spark):
    """Line-level dedup: repeated boilerplate lines survive only at their
    first corpus-wide occurrence; unique lines always survive; a document
    of pure boilerplate collapses to empty."""
    from aws_data_pipeline_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nunique alpha\nFOOTER"),
            (2, "COOKIE BANNER\nunique beta\nFOOTER"),
            (3, "COOKIE BANNER\nFOOTER"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert got[1].clean_text == "COOKIE BANNER\nunique alpha\nFOOTER"
    assert got[1].n_lines == 3 and got[1].n_lines_kept == 3
    assert got[2].clean_text == "unique beta"
    assert got[2].n_lines == 3 and got[2].n_lines_kept == 1
    assert got[3].clean_text == "" and got[3].n_lines_kept == 0
    # deterministic under repartitioning
    again = {r.doc_id: r.clean_text
             for r in line_dedup(docs.repartition(7)).collect()}
    assert again == {k: v.clean_text for k, v in got.items()}


def test_gopher_flags_rules(spark):
    """Each Gopher rule trips on its designed violation and only that one
    (plus the composite); a clean document passes everything."""
    from aws_data_pipeline_spark.operators.text import gopher_quality_flags

    base = ("the quick brown fox jumps over a lazy dog near of river bank "
            "while birds sing and wind moves through tall green trees today "
            "making gentle sounds everyone enjoys during warm summer days")
    docs = spark.createDataFrame(
        [
            (1, base),                                  # clean: passes all
            (2, "too short to pass"),                   # < 30 words
            (3, " ".join(f"w{i}" for i in range(35))),  # no stopwords
            (4, "the a " + "word " * 37 + "word"),      # repetition
            (5, "the a " + "#$%! " * 10 + " ".join(f"w{i}" for i in range(28))),
            (6, "the a " + "x " * 37 + "y"),            # mean word len < 3
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_quality_flags(docs).collect()}
    assert got[1].passes_gopher
    assert all(
        getattr(got[1], f)
        for f in ("flag_word_count", "flag_mean_word_len", "flag_stopwords",
                  "flag_repetition", "flag_symbol_ratio")
    )
    assert not got[2].flag_word_count and not got[2].passes_gopher
    assert got[3].flag_word_count and not got[3].flag_stopwords
    assert not got[4].flag_repetition and got[4].flag_stopwords
    assert not got[5].flag_symbol_ratio and got[5].symbol_ratio > 0.1
    assert not got[6].flag_mean_word_len and got[6].mean_word_len < 3.0
    for d in (2, 3, 4, 5, 6):
        assert not got[d].passes_gopher


def test_semantic_dedup_greedy_marks_and_chain(spark):
    """Greedy SemDeDup marks: lower-id in-threshold neighbor => duplicate;
    canonical is the LOWEST such neighbor; chains mark every non-minimum
    member even when the canonical is itself marked (documented greedy
    semantics, not transitive CC)."""
    import math

    def vec(*coords):
        v = [0.0] * 64
        for i, c in enumerate(coords):
            v[i] = c
        return v

    a55 = math.radians(55)
    a110 = math.radians(110)
    rows = [
        (0, vec(1.0, 0.0)),
        (1, vec(math.cos(a55), math.sin(a55))),      # 55deg from v0 -> dup(0)
        (2, vec(0.0, 0.0, 1.0)),                     # orthogonal -> unique
        (3, vec(0.0, 0.0, 0.9, 0.436)),              # cos ~0.9 to v2 -> dup(2)
        (4, vec(-1.0, 0.0)),                         # anti-parallel -> unique
        (5, vec(math.cos(a110), math.sin(a110))),    # 110deg from v0, 55 from v1
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r
        for r in similarity.semantic_dedup_flags(e, threshold=0.45).collect()
    }
    assert not got[0].is_semdup and got[0].canonical_id == 0
    assert got[1].is_semdup and got[1].canonical_id == 0
    assert not got[2].is_semdup and got[2].canonical_id == 2
    assert got[3].is_semdup and got[3].canonical_id == 2
    assert not got[4].is_semdup and got[4].canonical_id == 4
    # chain: v5 is within threshold of v1 only — marked, canonical 1,
    # even though v1 itself is marked (greedy, not transitive)
    assert got[5].is_semdup and got[5].canonical_id == 1


def test_embedding_decontamination_planted(spark):
    """A training vector planted near a benchmark vector is flagged; an
    orthogonal one is not; the benchmark side never flags itself (it is
    not in the train frame)."""
    import math

    def vec(*coords):
        v = [0.0] * 64
        for i, c in enumerate(coords):
            v[i] = c
        return v

    bench = spark.createDataFrame(
        [(0, vec(1.0, 0.0))], "vec_id long, embedding array<float>"
    )
    a30 = math.radians(30)
    train = spark.createDataFrame(
        [
            (10, vec(math.cos(a30), math.sin(a30))),  # 30deg -> contaminated
            (11, vec(0.0, 0.0, 1.0)),                 # orthogonal -> clean
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r.contaminated
        for r in similarity.embedding_decontamination(
            train, bench, threshold=0.45
        ).collect()
    }
    assert got == {10: True, 11: False}


def test_quality_classifier_separates_planted_classes(spark):
    """LR quality filter: clean-prose positives and junk negatives (disjoint
    vocabularies) must separate with wide margin; scoring is deterministic
    under repartitioning."""
    from pyspark.sql import functions as F2

    from aws_data_pipeline_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )

    rows = (
        [(i, "clean prose with the usual words flowing nicely along", True)
         for i in range(20)]
        + [(100 + i, "spam spam buy now click here zzz qqq xxx", False)
           for i in range(20)]
        + [(200, "clean prose with the usual words plus click here spam", None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_good boolean")
    labeled = df.filter(F2.col("is_good").isNotNull())
    model = train_quality_classifier(labeled, F2.col("is_good"))
    # force the session's lazy ObservationManager into existence: a model
    # fresh from fit() carries a training summary holding the live
    # SparkSession, and scoring via model.transform would serialize that
    # (non-serializable) state into the task closure — the literal-
    # coefficient scorer must be immune (the r13 regression this pins)
    from pyspark.sql import Observation

    obs = Observation()
    df.observe(obs, F2.count(F2.lit(1)).alias("n")).collect()
    assert obs.get["n"] == len(rows)
    got = {r.doc_id: r.p_target for r in score_quality(model, df).collect()}
    assert got[0] > 0.9 and got[100] < 0.1
    # the mixed doc lands strictly between the classes
    assert got[100] < got[200] < got[0]
    again = {
        r.doc_id: r.p_target
        for r in score_quality(model, df.repartition(7)).collect()
    }
    assert got == again


def test_unigram_logprob_ranks_rare_token_docs_higher(spark):
    """A document of corpus-rare tokens must carry a higher average
    negative log-prob than one of corpus-common tokens; scores are
    deterministic under repartitioning."""
    from aws_data_pipeline_spark.operators.text import unigram_logprob

    rows = (
        [(i, "common words appear in every single document here") for i in range(10)]
        + [(100, "zyx wvu tsr qpo nml kji hgf edc")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.avg_neg_logprob for r in unigram_logprob(df).collect()}
    assert got[100] > got[0] > 0
    again = {
        r.doc_id: r.avg_neg_logprob
        for r in unigram_logprob(df.repartition(5)).collect()
    }
    assert got == again


def _py_duplicate_spans(docs: dict[int, str], k: int) -> set[tuple[int, int, int]]:
    """Reference model for duplicate_spans: count every positional k-gram
    across the corpus, mark windows whose gram occurs >1 times, merge
    overlapping marked windows (positions <= k-1 apart) into maximal spans."""
    from collections import Counter

    toks = {d: t.lower().split(" ") for d, t in docs.items()}
    counts = Counter(
        tuple(t[i : i + k])
        for t in toks.values()
        for i in range(len(t) - k + 1)
    )
    spans = set()
    for d, t in toks.items():
        hit_pos = [
            i + 1
            for i in range(len(t) - k + 1)
            if counts[tuple(t[i : i + k])] > 1
        ]
        run: list[int] = []
        for p in hit_pos + [None]:
            if run and (p is None or p - run[-1] > k - 1):
                spans.add((d, run[0], run[-1] - run[0] + k))
                run = []
            if p is not None:
                run.append(p)
    return spans


def test_duplicate_spans_matches_python_model(spark):
    """Planted corpus: a shared 10-token phrase inside two docs, an
    in-document repeat, and clean docs — Spark output must equal the
    pure-Python window-merge model exactly, including span boundaries."""
    from aws_data_pipeline_spark.operators.dedup import (
        duplicate_span_stats,
        duplicate_spans,
    )

    phrase = "the quick brown fox jumps over the lazy sleeping dog"
    rep = "alpha beta gamma delta epsilon zeta eta theta"
    docs = {
        0: f"intro words here {phrase} and some unique trailing tail",
        1: f"{phrase} starts this one with different following content entirely",
        2: f"{rep} middle filler goes right here {rep}",
        3: "completely unique document with no repeated window content at all",
        4: "another clean one whose tokens never form a duplicated eight gram",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_tokens)
        for r in duplicate_spans(df, k=8).collect()
    }
    assert got == _py_duplicate_spans(docs, 8)

    stats = {r.doc_id: r for r in duplicate_span_stats(df, k=8).collect()}
    assert set(stats) == set(docs)  # every doc present, clean ones zeroed
    assert stats[3].n_dup_spans == 0 and stats[3].dup_frac == 0.0
    for d in (0, 1, 2):
        assert stats[d].dup_tokens == sum(
            n for dd, _, n in got if dd == d
        )
        assert stats[d].n_tokens == len(docs[d].split(" "))
        assert stats[d].dup_frac == stats[d].dup_tokens / stats[d].n_tokens


def test_duplicate_spans_random_property(spark):
    """Randomized corpora from a tiny vocabulary (forces genuine k-gram
    collisions) agree with the Python model across seeds."""
    import random

    from aws_data_pipeline_spark.operators.dedup import duplicate_spans

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    for _ in range(3):
        docs = {
            d: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
            for d in range(12)
        }
        df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        got = {
            (r.doc_id, r.span_start, r.span_tokens)
            for r in duplicate_spans(df, k=4).collect()
        }
        assert got == _py_duplicate_spans(docs, 4)


def test_duplicate_spans_against_index_equals_full_recompute(spark, tmp_path):
    """The incremental span probe must report EXACTLY the spans the full
    recompute over corpus UNION batch reports for the batch docs — on a
    crafted fixture (cross-corpus phrase, batch-internal repeat, clean doc)
    and on random tiny-vocabulary corpora; and the index append is
    idempotent and makes later batches see earlier ones."""
    import random

    from aws_data_pipeline_spark.operators.dedup import (
        append_to_kgram_index,
        build_kgram_index,
        duplicate_spans,
        duplicate_spans_against_index,
    )

    def spans(df):
        return {
            (r.doc_id, r.span_start, r.span_tokens) for r in df.collect()
        }

    phrase = "the quick brown fox jumps over the lazy sleeping dog"
    rep = "alpha beta gamma delta epsilon zeta eta theta"
    corpus_docs = [
        (0, f"corpus opener {phrase} and unique corpus trailing content"),
        (1, "a fully unique corpus document with no duplicated window"),
    ]
    batch_docs = [
        (10, f"batch doc quoting {phrase} with novel surrounding text"),
        (11, f"{rep} separated by some middle filler words {rep}"),
        (12, "a clean batch document matching nothing anywhere at all"),
    ]
    corpus = spark.createDataFrame(corpus_docs, "doc_id long, text string")
    batch = spark.createDataFrame(batch_docs, "doc_id long, text string")
    idx = str(tmp_path / "kgram_idx")
    build_kgram_index(corpus, idx, k=8)
    got = spans(duplicate_spans_against_index(spark, batch, idx))
    full = spans(
        duplicate_spans(corpus.unionByName(batch), k=8, hot_mod=None).filter(
            F.col("doc_id") >= 10
        )
    )
    assert got == full and got  # non-vacuous
    assert 12 not in {d for d, _, _ in got}

    # randomized equivalence: small vocab forces genuine k-gram collisions
    rng = random.Random(11)
    vocab = ["a", "b", "c", "d"]
    for _ in range(2):
        cd = [(d, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 30))))
              for d in range(8)]
        bd = [(d, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 30))))
              for d in range(100, 106)]
        c = spark.createDataFrame(cd, "doc_id long, text string")
        b = spark.createDataFrame(bd, "doc_id long, text string")
        p = str(tmp_path / f"ki{rng.random()}")
        build_kgram_index(c, p, k=4)
        got = spans(duplicate_spans_against_index(spark, b, p))
        want = spans(
            duplicate_spans(c.unionByName(b), k=4, hot_mod=None).filter(
                F.col("doc_id") >= 100
            )
        )
        assert got == want

    # maintenance: append batch 1, then a near-copy in batch 2 is caught
    append_to_kgram_index(batch, idx)
    append_to_kgram_index(batch, idx)  # replayed append: no duplicates
    hashes = spark.read.parquet(f"{idx}/hashes")
    assert hashes.count() == hashes.distinct().count()
    echo = spark.createDataFrame(
        [(20, f"later arrival repeating {rep} from batch one")],
        "doc_id long, text string",
    )
    got2 = spans(duplicate_spans_against_index(spark, echo, idx))
    assert {d for d, _, _ in got2} == {20}


def test_duplicate_spans_hot_hash_cap(spark):
    """A pathological hot k-gram (the same boilerplate line planted across
    hundreds of documents) must produce IDENTICAL output with the hot-hash
    cap engaged at full-sample rate (hot_mod=1: the hot hash is provably
    flagged and bypasses the count-over-window), at the default sampled
    rate, and with the cap disabled (hot_mod=None) — the guard changes the
    physical shape only, never the result. hot_min < 2 is rejected: one
    sampled row cannot prove a duplicate."""
    import pytest

    from aws_data_pipeline_spark.operators.dedup import duplicate_spans

    boiler = "all rights reserved contact us for terms of service today"
    docs = {
        d: f"doc {d} unique preamble token{d} {boiler} tail{d} closing words"
        for d in range(300)
    }
    docs[900] = "a fully unique document with no duplicated window at all here"
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    runs = {
        mode: {
            (r.doc_id, r.span_start, r.span_tokens)
            for r in duplicate_spans(df, k=8, hot_mod=mode).collect()
        }
        for mode in (None, 1, 256)
    }
    assert runs[None] == runs[1] == runs[256]
    assert runs[None] == _py_duplicate_spans(docs, 8)
    # the boilerplate really is hot: every planted doc carries a span
    assert {d for d, _, _ in runs[None]} == set(range(300))
    with pytest.raises(ValueError):
        duplicate_spans(df, k=8, hot_mod=4, hot_min=1).collect()


def test_grouped_quantiles_exact_and_sketch(spark, sf_dir):
    """Exact nearest-rank quantiles match a Python sort model on real data;
    the percentile_approx scale path stays within its rank-error bound."""
    from aws_data_pipeline_spark.operators.aggregate import grouped_quantiles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        r.source: r for r in grouped_quantiles(docs, ["source"], "n_chars").collect()
    }
    rows = docs.select("source", "n_chars").collect()
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.n_chars)
    import math

    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        assert exact[src].n_rows == n
        for p, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")):
            assert getattr(exact[src], col) == vals[math.ceil(p * n) - 1]

    approx = {
        r.source: r
        for r in grouped_quantiles(
            docs, ["source"], "n_chars", approx=True, accuracy=10_000
        ).collect()
    }
    # accuracy=10_000 on groups of ~a hundred docs: the sketch is exact up
    # to rank granularity — allow one rank of slack either side
    for src, vals in by_src.items():
        n = len(vals)
        for p, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")):
            r = math.ceil(p * n) - 1
            lo = vals[max(0, r - 1)]
            hi = vals[min(n - 1, r + 1)]
            assert lo <= getattr(approx[src], col) <= hi


def test_training_shards_deterministic_balanced_uncorrelated(spark):
    """Shard routing and within-shard order are deterministic under
    repartitioning, shards are hash-balanced, every position 1..|shard| is
    used exactly once, and the order is uncorrelated with doc_id order."""
    from aws_data_pipeline_spark.operators.sampling import training_shards

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = training_shards(df, "doc_id", n_shards=8).collect()
    again = training_shards(df.repartition(13), "doc_id", n_shards=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == set(range(8))
    for shard, rows in by_shard.items():
        assert 2000 / 8 * 0.7 < len(rows) < 2000 / 8 * 1.3  # hash balance
        assert sorted(r.pos for r in rows) == list(range(1, len(rows) + 1))
        ids_in_order = [r.doc_id for r in sorted(rows, key=lambda r: r.pos)]
        assert ids_in_order != sorted(ids_in_order)  # actually shuffled
    # a different seed is a fresh permutation
    other = {
        (r.doc_id, r.shard, r.pos)
        for r in training_shards(df, "doc_id", n_shards=8, seed="shard-v2").collect()
    }
    assert other != {(r.doc_id, r.shard, r.pos) for r in out}


def test_incremental_neardup_matches_full_cross_pairs(spark, sf_dir):
    """Probing the corpus index with a new batch finds exactly the
    full-corpus LSH pairs that cross the boundary; the persisted index
    returns the identical result and enforces its recorded parameters."""
    from aws_data_pipeline_spark.operators.dedup import (
        _banded_keys,
        _signatures_from_sets,
        build_lsh_text_index,
        minhash_lsh_pairs,
        neardup_against_corpus,
        neardup_against_index,
        shingle_sets,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)

    full = minhash_lsh_pairs(docs, "doc_id", k=5, num_perm=16, bands=4, threshold=0.8)
    expected = {
        (r.doc2, r.doc1) if r.doc2 % 10 == 7 else (r.doc1, r.doc2)
        for r in full.collect()
        if (r.doc1 % 10 == 7) != (r.doc2 % 10 == 7)
    }

    corpus_sets = shingle_sets(corpus, "doc_id", "text", 5)
    corpus_bands = _banded_keys(_signatures_from_sets(corpus_sets, 16), 4, 4)
    got = neardup_against_corpus(new, corpus_sets, corpus_bands, threshold=0.8)
    assert {(r.new_id, r.corpus_id) for r in got.collect()} == expected

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        build_lsh_text_index(corpus, tmp)
        via_index = neardup_against_index(spark, new, tmp)
        assert {(r.new_id, r.corpus_id) for r in via_index.collect()} == expected


def test_incremental_cluster_assignments_planted(spark):
    """Planted scenario covering every canonical rule: adopt-min-corpus-
    canonical (direct and transitive through a batch chain), the two-corpus
    bridge (adopts the smaller, history untouched), batch-only components,
    and unmatched singletons."""
    from aws_data_pipeline_spark.operators.dedup import (
        incremental_cluster_assignments,
    )

    new = spark.createDataFrame(
        [(i,) for i in (101, 102, 103, 104, 105, 106)], "doc_id long"
    )
    cross = spark.createDataFrame(
        [(101, 2), (103, 10), (103, 20)], "new_id long, corpus_id long"
    )
    new_pairs = spark.createDataFrame(
        [(101, 102), (104, 105)], "doc1 long, doc2 long"
    )
    corpus_assign = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 10), (20, 20)],
        "doc_id long, canonical_doc_id long",
    )
    got = {
        r.doc_id: (r.canonical_doc_id, r.is_duplicate)
        for r in incremental_cluster_assignments(
            new, cross, new_pairs, corpus_assign
        ).collect()
    }
    assert got == {
        101: (1, True),    # direct match -> corpus canonical
        102: (1, True),    # transitive through 101
        103: (10, True),   # bridges clusters 10 and 20 -> min canonical
        104: (104, False), # batch-only component, min new id = self
        105: (104, True),  # batch-only component member
        106: (106, False), # unmatched singleton
    }


def test_incremental_cluster_assignments_matches_model(spark, sf_dir):
    """On real data, incremental assignment equals a union-find model
    applying the documented rule (min matched corpus canonical, else min
    batch id, else self) to the same pair inputs."""
    from aws_data_pipeline_spark.operators.dedup import (
        _banded_keys,
        _signatures_from_sets,
        cluster_assignments,
        incremental_cluster_assignments,
        minhash_lsh_pairs,
        neardup_against_corpus,
        shingle_sets,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    corpus_pairs = minhash_lsh_pairs(corpus, "doc_id", threshold=0.8)
    corpus_assign = cluster_assignments(corpus, corpus_pairs)
    corpus_sets = shingle_sets(corpus, "doc_id", "text", 5)
    cross = neardup_against_corpus(
        new, corpus_sets, _banded_keys(_signatures_from_sets(corpus_sets, 16), 4, 4)
    )
    new_pairs = minhash_lsh_pairs(new, "doc_id", threshold=0.8)
    got = {
        r.doc_id: (r.canonical_doc_id, r.is_duplicate)
        for r in incremental_cluster_assignments(
            new, cross, new_pairs, corpus_assign
        ).collect()
    }

    canon = {r.doc_id: r.canonical_doc_id for r in corpus_assign.collect()}
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    new_ids = [r.doc_id for r in new.select("doc_id").collect()]
    for i in new_ids:
        find(i * 2 + 1)  # encode new ids as odd, corpus canonicals as even
    for r in cross.collect():
        union(r.new_id * 2 + 1, canon[r.corpus_id] * 2)  # canon as even
    for r in new_pairs.collect():
        union(r.doc1 * 2 + 1, r.doc2 * 2 + 1)
    comp: dict[int, list[int]] = {}
    for i in new_ids:
        comp.setdefault(find(i * 2 + 1), []).append(i)
    for r in cross.collect():
        comp.setdefault(find(canon[r.corpus_id] * 2), [])
    expected = {}
    roots_canon: dict[int, list[int]] = {}
    for r in cross.collect():
        roots_canon.setdefault(find(canon[r.corpus_id] * 2), []).append(
            canon[r.corpus_id]
        )
    for root, members in comp.items():
        canons = roots_canon.get(root, [])
        label = min(canons) if canons else min(members, default=None)
        for m in members:
            expected[m] = (label, label != m)
    assert got == expected


def test_cluster_bridges_reports_connected_canonicals(spark):
    """The bridge report lists exactly the distinct-canonical pairs a batch
    connects — the planted scenario bridges clusters 10 and 20 through new
    doc 103 and leaves cluster 1 unbridged."""
    from aws_data_pipeline_spark.operators.dedup import cluster_bridges

    cross = spark.createDataFrame(
        [(101, 2), (103, 10), (103, 20)], "new_id long, corpus_id long"
    )
    new_pairs = spark.createDataFrame(
        [(101, 102), (104, 105)], "doc1 long, doc2 long"
    )
    corpus_assign = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 10), (20, 20)],
        "doc_id long, canonical_doc_id long",
    )
    got = {
        (r.canonical_a, r.canonical_b)
        for r in cluster_bridges(cross, new_pairs, corpus_assign).collect()
    }
    assert got == {(10, 20)}
    # a three-way bridge reports all pairs of its component
    cross3 = spark.createDataFrame(
        [(201, 1), (201, 10), (202, 20), (201, 30), (202, 30)],
        "new_id long, corpus_id long",
    )
    corpus_assign3 = spark.createDataFrame(
        [(1, 1), (10, 10), (20, 20), (30, 30)],
        "doc_id long, canonical_doc_id long",
    )
    empty_pairs = spark.createDataFrame([], "doc1 long, doc2 long")
    got3 = {
        (r.canonical_a, r.canonical_b)
        for r in cluster_bridges(cross3, empty_pairs, corpus_assign3).collect()
    }
    assert got3 == {(1, 10), (1, 20), (1, 30), (10, 20), (10, 30), (20, 30)}


def test_winsorized_scale_hand_computed(spark):
    """Winsorization on a crafted group: the outlier saturates at p95, the
    scaled values span [0, 1] on the clipped range, and a degenerate
    single-value group scales to NULL."""
    from aws_data_pipeline_spark.operators.aggregate import winsorized_scale

    rows = [("a", float(v)) for v in range(1, 20)] + [("a", 1000.0)]
    rows += [("b", 7.0), ("b", 7.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, "src string, v double")
    got = {
        (r.src, r.v): (r.v_winsorized, r.v_scaled)
        for r in winsorized_scale(df, ["src"], "v").collect()
    }
    # group a: n=20 -> p05 = value at ceil(1.0)=rank 1 = 1.0; p95 = rank 19 = 19.0
    assert got[("a", 1000.0)] == (19.0, 1.0)   # outlier clipped to p95
    assert got[("a", 1.0)] == (1.0, 0.0)
    assert got[("a", 10.0)] == (10.0, (10.0 - 1.0) / 18.0)
    # group b: p05 == p95 == 7 -> degenerate, scaled NULL
    assert got[("b", 7.0)] == (7.0, None)


def test_grouped_quantiles_null_contract(spark):
    """NULL values are excluded from ranking AND from n_rows on BOTH paths
    (matching percentile_approx, which skips NULLs); NULL group keys are
    kept as their own group and winsorized_scale's null-safe join retains
    their rows; p outside (0,1) is rejected (p1.0 would be a dotted name)."""
    import pytest

    from aws_data_pipeline_spark.operators.aggregate import (
        grouped_quantiles,
        winsorized_scale,
    )

    rows = [("a", float(v)) for v in range(1, 11)] + [("a", None)] * 5
    rows += [(None, 3.0), (None, 5.0), (None, 7.0)]
    df = spark.createDataFrame(rows, "src string, v double")
    exact = {r.src: r for r in grouped_quantiles(df, ["src"], "v").collect()}
    approx = {
        r.src: r
        for r in grouped_quantiles(df, ["src"], "v", approx=True).collect()
    }
    # NULL values neither shift the quantiles nor inflate n_rows
    assert exact["a"].n_rows == approx["a"].n_rows == 10
    assert exact["a"].p50 == 5.0  # rank ceil(.5*10)=5 over non-null values
    # NULL group key is a real group, identically on both paths
    assert exact[None].n_rows == approx[None].n_rows == 3
    assert exact[None].p50 == 5.0
    # winsorized rows with NULL keys survive the null-safe join
    w = winsorized_scale(df.filter(F.col("v").isNotNull()), ["src"], "v")
    assert w.filter(F.col("src").isNull()).count() == 3
    with pytest.raises(ValueError):
        grouped_quantiles(df, ["src"], "v", ps=(0.5, 1.0))
    # a group whose EVERY value is NULL is absent on BOTH paths...
    allnull = df.unionByName(
        spark.createDataFrame([("z", None)] * 3, "src string, v double")
    )
    for ap in (False, True):
        got = {r.src for r in grouped_quantiles(allnull, ["src"], "v", approx=ap).collect()}
        assert got == {"a", None}
    # ...but its rows still COME BACK from winsorized_scale (left join):
    # value passes through unclipped, scaled is NULL
    wz = winsorized_scale(allnull, ["src"], "v").filter(F.col("src") == "z")
    assert wz.count() == 3
    assert all(r.v_scaled is None for r in wz.collect())
    # small p stays fixed-point (no 'p-05' scientific-notation junk), and
    # name collisions are rejected instead of silently duplicated
    tiny = grouped_quantiles(df, ["src"], "v", ps=(0.00001, 0.5))
    assert "p00001" in tiny.columns and "p50" in tiny.columns
    with pytest.raises(ValueError):
        grouped_quantiles(df, ["src"], "v", ps=(0.5, 0.50))


def test_write_training_shards_layout(spark, tmp_path):
    """The shard write produces one ordered file per shard=N directory:
    rows appear in pos order (the training order), and the union of shards
    is exactly the input."""
    import glob

    import pyarrow.parquet as pq

    from aws_data_pipeline_spark.operators.sampling import write_training_shards

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("payload")
    )
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", n_shards=4)
    seen = set()
    for shard in range(4):
        files = glob.glob(f"{path}/shard={shard}/*.parquet")
        assert len(files) == 1  # one task per shard -> one ordered file
        t = pq.read_table(files[0])
        pos = t.column("pos").to_pylist()
        assert pos == sorted(pos) and pos[0] == 1  # training order on disk
        ids = t.column("doc_id").to_pylist()
        assert ids != sorted(ids)  # shuffled relative to collection order
        payload = t.column("payload").to_pylist()
        assert all(p == i * 2 for i, p in zip(ids, payload))
        seen.update(ids)
    assert seen == set(range(500))


def test_write_training_shards_rematerialize_and_duplicate_ids(spark, tmp_path):
    """Re-materializing to the same path with fewer shards must leave NO
    stale shard= directories (the write is a static overwrite, overriding
    the session's dynamic default), and duplicate-id inputs land exactly
    once per input row — no join fan-out — at distinct positions."""
    import glob

    from aws_data_pipeline_spark.operators.sampling import write_training_shards

    path = str(tmp_path / "shards")
    df8 = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("payload")
    )
    write_training_shards(df8, path, "doc_id", n_shards=8)
    assert len(glob.glob(f"{path}/shard=*")) == 8
    write_training_shards(df8, path, "doc_id", n_shards=2)
    assert len(glob.glob(f"{path}/shard=*")) == 2  # no stale epoch-1 dirs
    assert spark.read.parquet(path).count() == 200

    dup = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "doc_id long, payload string"
    )
    write_training_shards(dup, str(tmp_path / "dup"), "doc_id", n_shards=2)
    back = spark.read.parquet(str(tmp_path / "dup"))
    assert back.count() == 3  # one output row per input row, not 2x2+1
    one = back.filter(F.col("doc_id") == 1)
    assert one.count() == 2
    # distinct positions even for identical ids
    assert one.select("shard", "pos").distinct().count() == 2


def test_embedding_index_probe_matches_full_cross_pairs(spark, sf_dir, tmp_path):
    """The embedding index probe finds exactly the full-run LSH pairs that
    cross the new/corpus boundary, with identical exact-cosine sims."""
    from aws_data_pipeline_spark.operators.similarity import (
        build_embedding_lsh_index,
        embedding_neardup_against_index,
        neardup_pairs_lsh,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    new = e.filter(F.col("vec_id") % 10 == 3)
    corpus = e.filter(F.col("vec_id") % 10 != 3)

    full = neardup_pairs_lsh(e, threshold=0.45)
    expected = {
        (r.id2, r.id1) if r.id2 % 10 == 3 else (r.id1, r.id2)
        for r in full.collect()
        if (r.id1 % 10 == 3) != (r.id2 % 10 == 3)
    }
    idx = str(tmp_path / "eidx")
    build_embedding_lsh_index(corpus, idx)
    got = embedding_neardup_against_index(spark, new, idx, threshold=0.45)
    assert {(r.new_id, r.corpus_id) for r in got.collect()} == expected
    # sims are the exact JVM cosine, all at or above threshold
    assert all(r.sim >= 0.45 for r in got.collect())


def test_source_overlap_smoke_and_values(spark):
    """source_overlap went untested (an unimported helper made every call a
    NameError); pin it: two sources sharing one 8-gram-rich phrase report
    exactly its gram count as shared, containment = shared / smaller."""
    from aws_data_pipeline_spark.operators.dedup import source_overlap

    phrase = " ".join(f"w{i}" for i in range(12))  # 5 distinct 8-grams
    docs = [
        (1, "a", phrase + " " + " ".join(f"a{i}" for i in range(20))),
        (2, "b", phrase + " " + " ".join(f"b{i}" for i in range(30))),
        (3, "c", " ".join(f"c{i}" for i in range(15))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    rows = {(r.source_a, r.source_b): r for r in source_overlap(df, k=8).collect()}
    ab = rows[("a", "b")]
    assert ab.n_shared == 5  # the 12-token phrase's 8-grams only
    # source a: 32 tokens -> 25 distinct 8-grams (the smaller side)
    assert abs(ab.containment - 5 / 25) < 1e-12
    assert ("a", "c") not in rows and ("b", "c") not in rows  # nothing shared


def test_source_overlap_three_way_bucket(spark):
    """Pin the r13 one-pass bucket expansion for buckets wider than a
    pair: a phrase shared by THREE sources must emit all C(3,2) ordered
    pairs with the same shared count, and each source's gram universe
    (the membership rows) must still count its private grams."""
    from aws_data_pipeline_spark.operators.dedup import source_overlap

    phrase = " ".join(f"w{i}" for i in range(10))  # 3 distinct 8-grams
    docs = [
        (1, "a", phrase + " " + " ".join(f"a{i}" for i in range(10))),
        (2, "b", phrase + " " + " ".join(f"b{i}" for i in range(20))),
        (3, "c", phrase + " " + " ".join(f"c{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    rows = {(r.source_a, r.source_b): r for r in source_overlap(df, k=8).collect()}
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(r.n_shared == 3 for r in rows.values())
    # universes: 20/30/40 tokens -> 13/23/33 distinct 8-grams; containment
    # divides by the smaller side of each pair
    assert abs(rows[("a", "b")].containment - 3 / 13) < 1e-12
    assert abs(rows[("a", "c")].containment - 3 / 13) < 1e-12
    assert abs(rows[("b", "c")].containment - 3 / 23) < 1e-12


def test_minhash_short_docs_no_blowup(spark):
    """Documents shorter than k tokens have NO shingles — they must be
    EXCLUDED from signatures (all-NULL signatures would make every short
    doc a candidate of every other and 0/0-abort the verify under ANSI),
    and exact_dedup must not cluster NULL-text docs together."""
    from aws_data_pipeline_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame(
        [
            (1, "tiny doc"),
            (2, "another short"),
            (3, "also wee"),
            (10, base),
            (11, base + " tail"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc1, r.doc2)
        for r in minhash_lsh_pairs(df, "doc_id", k=5, threshold=0.8).collect()
    }
    assert pairs == {(10, 11)}  # short docs pair with nothing, no crash

    nulls = spark.createDataFrame(
        [(1, None), (2, None), (3, "real"), (4, "real")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.canonical_doc_id, r.is_duplicate)
           for r in exact_dedup(nulls, "doc_id").collect()}
    assert got[1] == (1, False) and got[2] == (2, False)  # no NULL cluster
    assert got[3] == (3, False) and got[4] == (3, True)


def test_training_shards_rejects_reserved_column_names(spark):
    """Reserved id-frame names must fail loudly: select('*', shard, ...)
    over an input that already has 'shard'/'pos'/'__ord' would silently
    duplicate the column and misroute or crash downstream."""
    import pytest

    from aws_data_pipeline_spark.operators.sampling import training_shards

    df = spark.createDataFrame(
        [(1, 0), (2, 1)], "doc_id long, shard int"
    )
    with pytest.raises(ValueError, match="reserve"):
        training_shards(df, "doc_id", 4, keep_cols=True)
    # keep_cols=False only carries the id column — a clashing PAYLOAD
    # column is dropped by the select and is fine...
    assert training_shards(df, "doc_id", 4).count() == 2
    # ...but an id column named like a reserved output is not
    with pytest.raises(ValueError, match="reserve"):
        training_shards(df.select("shard"), "shard", 4)


def test_bm25_scores_ranking_properties(spark):
    """BM25 invariants on planted docs: more occurrences of a term score
    higher at equal length; longer docs score lower at equal tf (b>0 length
    normalization); a rare term outweighs a ubiquitous one; docs with no
    query term are absent."""
    from aws_data_pipeline_spark.operators.text import bm25_scores

    docs = [
        # corpus term "common" everywhere -> low idf; "rare" once
        (0, "rare pad pad pad"),
        (1, "common pad pad pad"),
        (2, "common common pad pad"),  # same dl as 1, higher tf
        (3, "common pad pad pad pad pad pad pad"),  # same tf as 1, longer
        (4, "pad pad pad pad"),  # no query terms
        (5, "common filler filler filler"),
        (6, "common filler filler filler"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = bm25_scores(df, ("rare", "common"))
    got = {r["doc_id"]: r for r in out.collect()}
    assert 4 not in got and set(got) == {0, 1, 2, 3, 5, 6}
    # tf monotonicity at equal dl
    assert got[2]["bm25_score"] > got[1]["bm25_score"]
    # length normalization at equal tf
    assert got[1]["bm25_score"] > got[3]["bm25_score"]
    # rare term beats common term at identical tf/dl
    assert got[0]["bm25_score"] > got[1]["bm25_score"]
    assert got[0]["n_matched_terms"] == 1
    assert got[2]["n_matched_terms"] == 1


def test_bm25_rejects_bad_query_terms(spark):
    import pytest as _pytest

    from aws_data_pipeline_spark.operators.text import bm25_scores

    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bm25_scores(df, ())
    with _pytest.raises(ValueError):
        bm25_scores(df, ("a", "a"))


def test_pq_codebooks_deterministic_and_codes_valid(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    b1 = similarity.train_pq_codebooks(e, m=8, ks=16, seed=42)
    b2 = similarity.train_pq_codebooks(e, m=8, ks=16, seed=42)
    assert b1 == b2  # driver-side Lloyd's is bit-deterministic under a seed
    assert len(b1) == 8 and all(len(b) == 16 for b in b1)
    assert all(len(c) == 8 for b in b1 for c in b)
    codes = similarity.pq_encode(e, b1).collect()
    assert len(codes) == e.count()
    assert all(len(r.codes) == 8 and all(0 <= c < 16 for c in r.codes) for r in codes)
    # encode is deterministic too (same codebooks -> same codes)
    again = similarity.pq_encode(e, b1).collect()
    assert {r.id: r.codes for r in codes} == {r.id: r.codes for r in again}


def test_pq_adc_recall_and_rerank_refines(spark, sf_dir):
    """PQ ADC recall floors on the (near-random, hardest-case) synthetic
    embeddings, and the FAISS-style exact re-rank must refine, not degrade:
    measured ADC≈0.18 / rerank-40≈0.64 at 500 vectors."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    books = similarity.train_pq_codebooks(e, m=8, ks=16, seed=42)
    codes = similarity.pq_encode(e, books)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(q, e, k=5).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in similarity.pq_topk(q, e, books, k=5, corpus_codes=codes).collect()
    }
    rr = {
        (r.query_id, r.neighbor_id)
        for r in similarity.pq_topk(
            q, e, books, k=5, corpus_codes=codes, rerank=40
        ).collect()
    }
    assert len(adc & brute) / len(brute) >= 0.1
    assert len(rr & brute) / len(brute) >= 0.5
    assert len(rr & brute) >= len(adc & brute)
    # ranks well-formed
    out = similarity.pq_topk(q, e, books, k=5, corpus_codes=codes).collect()
    assert all(1 <= r.rank <= 5 for r in out)


def test_pq_planted_clusters_high_recall(spark):
    """On clustered data (the realistic regime — real embedding corpora are
    not uniform), PQ with exact re-rank recovers nearly all true
    neighbors."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 64))
    rows = []
    vid = 0
    for ci in range(8):
        for _ in range(30):
            v = centers[ci] + rng.normal(scale=0.05, size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") % 30 == 0)  # one query per cluster
    books = similarity.train_pq_codebooks(df, m=8, ks=16, seed=42)
    codes = similarity.pq_encode(df, books)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(q, df, k=5).collect()
    }
    rr = {
        (r.query_id, r.neighbor_id)
        for r in similarity.pq_topk(
            q, df, books, k=5, corpus_codes=codes, rerank=30
        ).collect()
    }
    assert len(rr & brute) / len(brute) >= 0.9


def test_psi_drift_detects_planted_shift(spark):
    """PSI sanity on planted distributions: identical slices give ~0 total
    PSI; a shifted current slice gives a clearly positive one; bins with
    an empty current side stay finite (floored proportions)."""
    from aws_data_pipeline_spark.operators.quality import psi_drift

    base = spark.createDataFrame(
        [(float(i % 100),) for i in range(2000)], "x double"
    )
    same = psi_drift(base, base, "x", bins=10).collect()
    assert abs(sum(r.psi_contribution for r in same)) < 1e-9
    shifted = spark.createDataFrame(
        [(float(i % 100) + 60.0,) for i in range(2000)], "x double"
    )
    rows = psi_drift(base, shifted, "x", bins=10).collect()
    total = sum(r.psi_contribution for r in rows)
    assert total > 0.2  # the "investigate" threshold, decisively crossed
    import math

    assert all(math.isfinite(r.psi_contribution) for r in rows)
    # the low bins lost all current mass yet stay finite
    assert any(r.n_curr == 0 and r.n_base > 0 for r in rows)


def test_psi_drift_approx_error_bound(spark, sf_dir):
    """The 100 TB PSI path (approx=True: approx_percentile sketch edges)
    against the exact twin, on real orders data — the
    approx_distinct_customers pattern. With sketch accuracy A, each edge's
    RANK is off by at most 1/A of the baseline, so at most bins/A of
    either side's mass can change bins; the resulting total-PSI divergence
    must stay far inside the 0.2 'investigate' decision band, i.e. the
    approx monitor reaches the same conclusions the exact one does."""
    from pyspark.sql import functions as F

    from aws_data_pipeline_spark.operators.quality import psi_drift

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.where(F.year("o_orderdate") <= 1995).select(
        F.col("o_totalprice").alias("x")
    )
    curr = o.where(F.year("o_orderdate") >= 1998).select(
        F.col("o_totalprice").alias("x")
    )
    exact = sum(
        r.psi_contribution for r in psi_drift(base, curr, "x", bins=10).collect()
    )
    approx = sum(
        r.psi_contribution
        for r in psi_drift(base, curr, "x", bins=10, approx=True).collect()
    )
    assert abs(approx - exact) < 0.02  # << the 0.2 decision threshold
    # identical slices still read as ~0 drift through the sketch
    same = sum(
        r.psi_contribution
        for r in psi_drift(base, base, "x", bins=10, approx=True).collect()
    )
    assert abs(same) < 1e-6


def test_remove_duplicate_spans_surgical(spark):
    """Planted-boilerplate surgical removal: the shared 8-gram region is
    excised from both docs, novel prefixes/suffixes survive, and a doc
    with no duplicated spans passes through verbatim (modulo whitespace
    tokenization)."""
    from aws_data_pipeline_spark.operators.dedup import remove_duplicate_spans

    boiler = " ".join(f"b{i}" for i in range(10))  # 10 shared tokens
    docs = [
        (1, f"alpha beta gamma {boiler} delta"),
        (2, f"zeta {boiler} eta theta iota"),
        (3, "totally novel words only here once upon a time"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicate_spans(df, k=8).collect()}
    assert out[3].n_removed_tokens == 0
    assert out[3].cleaned_text == docs[2][1]
    # both planted docs lose exactly the 10 boilerplate tokens
    assert out[1].n_removed_tokens == 10
    assert out[2].n_removed_tokens == 10
    assert out[1].cleaned_text == "alpha beta gamma delta"
    assert out[2].cleaned_text == "zeta eta theta iota"


def test_remove_duplicate_spans_preserves_case(spark):
    """Detection is lowercased (dedup contract) but reconstruction must
    return the ORIGINAL casing — a training corpus scrubbed of spans must
    not come back case-folded."""
    from aws_data_pipeline_spark.operators.dedup import remove_duplicate_spans

    boiler = " ".join(f"B{i}" for i in range(10))
    docs = [
        (1, f"The API Returns JSON {boiler}"),
        (2, f"{boiler} Unrelated Mixed Case Tail"),
        (3, "Totally Novel Words Only Here Once Upon A Time"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicate_spans(df, k=8).collect()}
    assert out[3].cleaned_text == docs[2][1]  # verbatim, case intact
    assert out[1].cleaned_text == "The API Returns JSON"
    assert out[2].cleaned_text == "Unrelated Mixed Case Tail"
    # lower/upper variants of the same boilerplate still detect as dups
    mixed = [(1, f"lead {boiler.lower()} tail one"),
             (2, f"pre {boiler.upper()} post two")]
    df2 = spark.createDataFrame(mixed, "doc_id long, text string")
    out2 = {r.doc_id: r for r in remove_duplicate_spans(df2, k=8).collect()}
    assert out2[1].n_removed_tokens == 10 and out2[2].n_removed_tokens == 10
    assert out2[1].cleaned_text == "lead tail one"
    assert out2[2].cleaned_text == "pre post two"


def test_remove_duplicate_spans_custom_id_col(spark):
    from aws_data_pipeline_spark.operators.dedup import remove_duplicate_spans

    boiler = " ".join(f"b{i}" for i in range(9))
    df = spark.createDataFrame(
        [(10, f"x {boiler}"), (20, f"y {boiler}")], "id long, text string"
    )
    out = {r.id: r for r in remove_duplicate_spans(df, id_col="id", k=8).collect()}
    assert out[10].cleaned_text == "x" and out[20].cleaned_text == "y"


def test_sq8_stats_encode_reconstruct(spark, sf_dir):
    """SQ8 train stats are deterministic (pure min/max — no seed), codes
    are valid smallints in [0, 255], a constant dimension encodes to 0
    and reconstructs to its min, and the whole chain is closed-form
    reproducible in plain Python (the property the value oracle rests
    on)."""
    import math

    e = load(spark, sf_dir, "embeddings")
    mins, scales = similarity.sq8_train_stats(e)
    mins2, scales2 = similarity.sq8_train_stats(e)
    assert mins == mins2 and scales == scales2
    dim = len(e.first().embedding)
    assert len(mins) == dim and len(scales) == dim
    codes = similarity.sq8_encode(e, mins, scales).collect()
    assert len(codes) == e.count()
    assert all(
        len(r.codes) == dim and all(0 <= c <= 255 for c in r.codes)
        for r in codes
    )
    # Python model of the encode chain matches the JVM expression exactly
    raw = {r.vec_id: [float(x) for x in r.embedding] for r in e.collect()}
    for r in codes[:20]:
        want = [
            0
            if scales[d] == 0.0
            else min(255, max(0, int(math.floor((raw[r.id][d] - mins[d]) / scales[d] + 0.5))))
            for d in range(dim)
        ]
        assert list(r.codes) == want, r.id
    # constant dimension: scale 0 -> code 0 -> reconstruct to the min
    df = spark.createDataFrame(
        [(1, [1.0, 7.0]), (2, [2.0, 7.0])], "vec_id long, embedding array<double>"
    )
    m, s = similarity.sq8_train_stats(df)
    assert s[1] == 0.0
    enc = {r.id: list(r.codes) for r in similarity.sq8_encode(df, m, s).collect()}
    assert enc[1][1] == 0 and enc[2][1] == 0
    recon = {
        r.id: list(r.rv)
        for r in similarity.sq8_encode(df, m, s)
        .withColumn("rv", similarity.sq8_reconstruct(F.col("codes"), m, s))
        .collect()
    }
    assert recon[1][1] == 7.0 and recon[2][1] == 7.0  # constant dim -> its min


def test_sq8_recall_and_rerank(spark, sf_dir):
    """Asymmetric SQ8 search is near-exact on real-valued corpora
    (per-dim error <= scale/2): measured recall@5 = 1.0 on the synthetic
    corpus; assert a 0.9 floor to stay robust to testdata regeneration.
    The exact re-rank path must be well-formed and never degrade."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(q, e, k=5).collect()
    }
    sq = {
        (r.query_id, r.neighbor_id)
        for r in similarity.sq8_topk(q, e, k=5).collect()
    }
    rr = {
        (r.query_id, r.neighbor_id)
        for r in similarity.sq8_topk(q, e, k=5, rerank=40).collect()
    }
    assert len(sq & brute) / len(brute) >= 0.9
    assert len(rr & brute) >= len(sq & brute)
    out = similarity.sq8_topk(q, e, k=5).collect()
    assert all(1 <= r.rank <= 5 for r in out)


def test_strip_markup_semantics(spark):
    """The documented strip rules on crafted strings: block contents vanish
    (not just tags), entities unescape exactly once with amp LAST, runs of
    whitespace collapse, tag-only input strips to empty."""
    from aws_data_pipeline_spark.operators.text import strip_markup

    cases = [
        # script/style CONTENT removed, incl. a '<' inside the script body
        ("<script>if (1 < 2) alert('x')</script>keep", "keep"),
        ("<style>p { color: red }</style>keep", "keep"),
        # comments vanish; generic tags become spaces, then collapse
        ("a<!-- hidden -->b", "a b"),
        ("<h1>Title</h1><p>body text</p>", "Title body text"),
        # entity ordering: &amp;lt; is the AUTHOR writing "&lt;" — one
        # unescape only, never the double-unescape to "<"
        ("&amp;lt; &lt; &gt; &quot;q&quot; &#39;s&#39; a&nbsp;b", "&lt; < > \"q\" 's' a b"),
        # whitespace runs (tabs/newlines) collapse; ends trim
        ("  a\t\tb\n\nc  ", "a b c"),
        # tag-only document strips to empty
        ("<html><body></body></html>", ""),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "id long, text string"
    )
    got = {
        r["id"]: r["clean_text"]
        for r in strip_markup(df).select("id", "clean_text").collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_normalize_unicode_semantics(spark):
    """NFC composes decomposed sequences, leaves composed text alone, and
    the form parameter switches behavior (NFKC folds compatibility chars
    that NFC must preserve). None-safe."""
    from aws_data_pipeline_spark.operators.text import normalize_unicode

    rows = [
        (0, "café"),      # decomposed -> café
        (1, "café"),       # already composed: unchanged
        (2, "ﬁne"),        # ligature fi: NFC keeps, NFKC folds to "fine"
        (3, None),
    ]
    # source-integrity guard: if an editor/VCS filter ever NFC-normalizes
    # this file, row 0 silently stops testing composition — fail loudly
    assert ord(rows[0][1][-1]) == 0x301 and ord(rows[1][1][-1]) == 0xE9
    df = spark.createDataFrame(rows, "id long, text string")
    nfc = {
        r["id"]: r["n"]
        for r in normalize_unicode(df, out_col="n").select("id", "n").collect()
    }
    assert nfc[0] == "café" and len(nfc[0]) == 4
    assert nfc[1] == "café"
    assert nfc[2] == "ﬁne"
    assert nfc[3] is None
    nfkc = {
        r["id"]: r["n"]
        for r in normalize_unicode(df, out_col="n", form="NFKC")
        .select("id", "n")
        .collect()
    }
    assert nfkc[2] == "fine"


def test_edit_distance_dedup_semantics(spark):
    """Character-level verify catches what Jaccard-style token sets blur:
    a typo'd twin passes the ratio gate, a same-topic-different-text pair
    does not, and the ratio value is the exact normalized Levenshtein."""
    from aws_data_pipeline_spark.operators import dedup

    base = " ".join(f"tok{i}" for i in range(40))
    typo = base.replace("tok7", "tok7x").replace("tok21", "tok2l")
    other = " ".join(f"tok{i}" for i in range(20)) + " " + " ".join(
        f"zz{i}" for i in range(20)
    )
    df = spark.createDataFrame(
        [(1, base), (2, typo), (3, other)], "doc_id long, text string"
    )
    pairs = {
        (r.doc1, r.doc2): r.edit_ratio
        for r in dedup.edit_distance_dedup_pairs(
            df, "doc_id", max_edit_ratio=0.1, hash_fn="md5"
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
    # normalized ratio == lev/max(len): two single-char insertions... the
    # replace adds 1 char ('tok7x') and substitutes 1 ('tok2l'), lev = 2
    assert abs(pairs[(1, 2)] - 2 / max(len(base), len(typo))) < 1e-12


def test_hard_negative_topk_band_semantics(spark):
    """The mined set is exactly the band: a near-duplicate (sim≈1) is
    EXCLUDED (it would be a latent positive), a mid-similarity vector is
    the hard negative, an orthogonal one falls below the floor."""
    from aws_data_pipeline_spark.operators.similarity import hard_negative_topk

    q = [1.0, 0.0, 0.0, 0.0]
    near_dup = [0.99, 0.01, 0.0, 0.0]           # sim ~0.9999 -> excluded (>= hi)
    hard = [0.35, 0.937, 0.0, 0.0]              # sim = 0.35  -> mined
    easy = [0.0, 0.0, 1.0, 0.0]                 # sim = 0     -> excluded (< lo)
    df = spark.createDataFrame(
        [(0, q), (1, near_dup), (2, hard), (3, easy)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.query_id, r.neighbor_id)
        for r in hard_negative_topk(
            df.filter(F.col("vec_id") == 0), df, k=3, lo=0.25, hi=0.45
        ).collect()
    }
    assert got == {(0, 2)}


def test_strip_accents_semantics(spark):
    """Marks fold regardless of representation (composed == decomposed
    after folding), non-decomposable letters survive, plain-base marks
    drop, None-safe."""
    from aws_data_pipeline_spark.operators.text import strip_accents

    rows = [
        (0, "café"),        # composed
        (1, "café"),       # decomposed — same fold as row 0
        (2, "Ærø łódź"),  # Ærø łódź: Æ/ø/ł survive
        (3, "x́y"),         # mark on plain base drops
        (4, None),
    ]
    # source-integrity guard (the NFC test's rule): row 1 must stay decomposed
    assert ord(rows[1][1][-1]) == 0x301
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["f"]
        for r in strip_accents(df, out_col="f").select("id", "f").collect()
    }
    assert got[0] == got[1] == "cafe"
    assert got[2] == "Ærø łodz"
    assert got[3] == "xy"
    assert got[4] is None


def test_composed_roots_warm_path_identity(spark, sf_dir):
    """The _composed_roots cache (r8 verdict item 4): a second probe
    against an unchanged corpus hits the resolved-roots cache — no
    re-ensure, no currency re-check — and returns rows identical to the
    cold probe. The cache stores RESOLVED version dirs and keys on source
    state, so a state flip would evict (the _PQ_CACHE rule)."""
    from aws_data_pipeline_spark.plans import llm as L
    from aws_data_pipeline_spark.plans import load_registry

    reg = load_registry()
    L._CC_ROOTS.clear()
    cold = {
        tuple(r)
        for r in reg["embedding_ann_ivfpq"].spark_fn(spark, sf_dir).collect()
    }
    assert len(L._CC_ROOTS) == 1
    (key, (roots, books)) = next(iter(L._CC_ROOTS.items()))
    assert key[1] == sf_dir and key[2] == "ivfpq_c8_m8_ks16"
    # roots are stored resolved: index_root is identity on each; the
    # cached artifact is the PQ codebooks (m lists of ks centroids)
    from aws_data_pipeline_spark.sources.parquet import index_root

    assert all(index_root(spark, r) == r for r in roots)
    assert len(books) == 8 and all(len(b) == 16 for b in books)

    # poison the ensure path: a warm probe must not call it
    sentinel = L._CC_ROOTS.copy()
    warm = {
        tuple(r)
        for r in reg["embedding_ann_ivfpq"].spark_fn(spark, sf_dir).collect()
    }
    assert warm == cold and len(cold) > 0
    assert L._CC_ROOTS == sentinel  # same entry, no rebuild/eviction

    # simulate a corpus state flip: the live key is gone (state changed),
    # a superseded entry for the same corpus+tag remains — the next probe
    # misses, evicts the superseded entry, and re-ensures under the new
    # state (the _PQ_CACHE eviction rule; eviction runs on miss)
    stale_key = (key[0], key[1], key[2], ("superseded",))
    L._CC_ROOTS.clear()
    L._CC_ROOTS[stale_key] = (roots, books)
    refreshed = {
        tuple(r)
        for r in reg["embedding_ann_ivfpq"].spark_fn(spark, sf_dir).collect()
    }
    assert stale_key not in L._CC_ROOTS
    assert L._CC_ROOTS[key][0] == roots  # re-ensure found the same builds
    assert refreshed == cold


def test_composed_roots_out_of_band_deletion_reensures(spark, sf_dir):
    """The warm path's freshness probe (r9 advisory): deleting an index
    OUT OF BAND (nothing flips _src_state) must not leave warm probes
    serving memoized roots into raw parquet path errors — the zone_exists
    probe on the cached roots misses, evicts, and re-ensures (rebuild).
    Dead-application keys are evicted on the insert, so a long-lived
    multi-corpus driver can't grow the memo without bound."""
    import re
    import shutil

    from aws_data_pipeline_spark.plans import DEMOTED, llm as L
    from aws_data_pipeline_spark.plans import load_registry

    reg = {**load_registry(), **DEMOTED}  # tier-agnostic (rotations move it)
    L._CC_ROOTS.clear()
    cold = {
        tuple(r)
        for r in reg["embedding_ann_ivfsq8"].spark_fn(spark, sf_dir).collect()
    }
    (key, (roots, stats)) = next(iter(L._CC_ROOTS.items()))
    # out-of-band deletion of the cell-codes index (markers included)
    shutil.rmtree(re.sub(r"/v\d+$", "", roots[2]))
    # and a fake dead-application entry that must not survive the insert
    dead = ("application_dead_0000", key[1], key[2], key[3])
    L._CC_ROOTS[dead] = (("gone",), None)
    warm = {
        tuple(r)
        for r in reg["embedding_ann_ivfsq8"].spark_fn(spark, sf_dir).collect()
    }
    assert warm == cold  # re-ensured and rebuilt, not a path error
    assert dead not in L._CC_ROOTS
    assert key in L._CC_ROOTS


def test_ensure_memo_out_of_band_deletion_reensures(spark, sf_dir):
    """_ensure_memo's warm hit carries the same zone_exists freshness
    probe: out-of-band deletion of a memoized build-once index triggers
    re-ensure (rebuild) on the next call instead of a missing-path read."""
    import shutil

    from aws_data_pipeline_spark.plans import llm as L

    idx = L._ensure_kgram_index(spark, sf_dir)
    assert any(isinstance(v, str) and v == idx for v in L._ENSURE_MEMO.values())
    shutil.rmtree(idx)
    again = L._ensure_kgram_index(spark, sf_dir)
    assert again == idx
    from aws_data_pipeline_spark.sources.parquet import zone_exists

    assert zone_exists(spark, f"{idx}/src_meta")  # rebuilt, marker restored


def test_choose_ivfpq_params_rules():
    """The derivation rules themselves: FAISS sqrt sizing with the k-means
    training clamp, subvector-of-8 m, linear-spread nprobe when the caller
    says the data is near-random, 100 TB-scale sanity."""
    p = similarity.choose_ivfpq_params(240, 64)
    assert p == {
        "n_cells": 6, "nprobe": 2, "m": 8, "ks": 16, "rerank": 40,
        "train_fraction": 1.0,
    }
    # near-random data: high recall honestly requires sweeping most cells
    hard = similarity.choose_ivfpq_params(240, 64, clustered=False,
                                          target_recall=0.9)
    assert hard["nprobe"] == 6  # ceil(0.9 * 6)
    # a 1e9-vector, 768-d corpus: sqrt sizing, bounded training fraction,
    # m divides dim with ~8-dim subvectors
    big = similarity.choose_ivfpq_params(1_000_000_000, 768, k=10)
    assert big["n_cells"] == 31623 and big["m"] == 96
    assert big["nprobe"] == 7906  # 25% of cells
    assert 0 < big["train_fraction"] < 0.01
    assert big["rerank"] == 80
    # m always divides dim, even awkward dims
    for dim in (17, 50, 96, 100):
        m = similarity.choose_ivfpq_params(10_000, dim)["m"]
        assert dim % m == 0
    import pytest

    with pytest.raises(ValueError):
        similarity.choose_ivfpq_params(0, 64)
    with pytest.raises(ValueError):
        similarity.choose_ivfpq_params(100, 64, target_recall=0.0)


def test_choose_ivfpq_params_meets_recall_floor(spark, tmp_path):
    """The r8 verdict's acceptance test: params DERIVED (not hand-tuned)
    for the planted-cluster fixture drive the full persisted IVF-PQ
    composed search to the pinned ≥0.9 recall@5 floor — the same floor
    the hand-tuned pq_topk planted test pins."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 64))
    rows = []
    vid = 0
    for ci in range(8):
        for _ in range(30):
            v = centers[ci] + rng.normal(scale=0.05, size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") % 30 == 0)  # one query per cluster

    p = similarity.choose_ivfpq_params(len(rows), 64, k=5)
    ivf = str(tmp_path / "ivf")
    pq = str(tmp_path / "pq")
    cc = str(tmp_path / "cc")
    similarity.build_ivf_index(
        df, ivf, n_cells=p["n_cells"], seed=42,
        train_fraction=p["train_fraction"],
    )
    similarity.build_pq_index(df, pq, m=p["m"], ks=p["ks"], seed=42)
    similarity.build_ivfpq_cell_codes(spark, ivf, pq, cc)
    got = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivfpq_topk_indexed(
            spark, q, ivf, pq, k=5, nprobe=p["nprobe"], rerank=p["rerank"],
            cell_codes_path=cc,
        ).collect()
    }
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(q, df, k=5).collect()
    }
    assert len(got & brute) / len(brute) >= 0.9


def test_hard_negative_indexed_equals_exact_planted(spark, tmp_path):
    """The ANN-backed miner equals the brute-force miner when scan_k
    covers the slacked band: planted geometry — one near-dup (excluded
    >= hi), one hard negative (mined), one easy negative (excluded < lo)
    — through a real persisted SQ8 index."""
    from aws_data_pipeline_spark.operators import similarity as S

    q = [1.0, 0.0, 0.0, 0.0]
    near_dup = [0.99, 0.01, 0.0, 0.0]
    hard = [0.35, 0.937, 0.0, 0.0]
    easy = [0.0, 0.0, 1.0, 0.0]
    df = spark.createDataFrame(
        [(0, q), (1, near_dup), (2, hard), (3, easy)],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "sq8")
    S.build_sq8_index(df, idx)
    got = {
        (r.query_id, r.neighbor_id)
        for r in S.hard_negative_topk_indexed(
            spark, df.filter(F.col("vec_id") == 0), idx, k=3, lo=0.25, hi=0.45
        ).collect()
    }
    assert got == {(0, 2)}


def test_hard_negative_derived_slack_wide_range_corpus(spark, tmp_path):
    """The DERIVED band slack (2*sq8_error_norm/||r||) keeps band members
    a fixed 0.05 slack provably loses: one outlier dimension (a single
    vector at 1000) inflates that dim's scale to ~3.9, so a band member
    holding 1.9 there (mid-grid — maximal quantization error) reconstructs
    with its dim-3 mass dropped entirely and its ADC cosine lands near
    1.0 while its true cosine is ~0.43. The fixed 0.05 window around
    [0.25, 0.45) excludes it; the derived per-row bound covers the ~0.57
    ADC error with margin and the exact re-rank restores the true band."""
    from aws_data_pipeline_spark.operators import similarity as S

    q = [1.0, 0.0, 0.0, 0.0]
    band_member = [0.9, 0.0, 0.0, 1.9]  # cos=0.428 in [0.25,0.45)
    outlier = [0.0, 0.0, 0.0, 1000.0]  # cos=0, widens dim-3 scale
    easy = [0.0, 1.0, 0.0, 0.0]  # cos=0
    df = spark.createDataFrame(
        [(0, q), (1, band_member), (2, outlier), (3, easy)],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "sq8_wide")
    S.build_sq8_index(df, idx)
    queries = df.filter(F.col("vec_id") == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.hard_negative_topk(
            queries, df, k=3, lo=0.25, hi=0.45
        ).collect()
    }
    assert exact == {(0, 1)}  # the fixture plants exactly one band member
    derived = {
        (r.query_id, r.neighbor_id)
        for r in S.hard_negative_topk_indexed(
            spark, queries, idx, k=3, lo=0.25, hi=0.45
        ).collect()
    }
    assert derived == exact
    fixed = {
        (r.query_id, r.neighbor_id)
        for r in S.hard_negative_topk_indexed(
            spark, queries, idx, k=3, lo=0.25, hi=0.45, band_slack=0.05
        ).collect()
    }
    assert (0, 1) not in fixed  # the hand-tuned constant loses it
    # the IVF-composed miner shares the same derived-slack column
    ivf = str(tmp_path / "ivf_wide")
    S.build_ivf_index(df, ivf, n_cells=2, seed=42, train_fraction=1.0)
    composed = {
        (r.query_id, r.neighbor_id)
        for r in S.hard_negative_topk_ivfsq8(
            spark, queries, ivf, idx, k=3, lo=0.25, hi=0.45, nprobe=2
        ).collect()
    }
    assert composed == exact


def test_registry_hard_negative_indexed_pair(spark, sf_dir):
    """The demoted indexed miner returns the same rows as its promoted
    exact twin on the registry corpus (the ANN candidates cover the band
    at this scale; at 100 TB the cap/slack trade is the documented
    contract, not an identity claim)."""
    from aws_data_pipeline_spark.plans import DEMOTED, load_registry

    reg = load_registry()
    exact = {
        tuple(r)
        for r in reg["hard_negative_topk"].spark_fn(spark, sf_dir).collect()
    }
    indexed = {
        tuple(r)
        for r in reg["hard_negative_topk_indexed"]  # seated r11
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert indexed == exact and len(exact) > 0


def test_hard_negative_ivfsq8_full_coverage_equals_exact(spark, sf_dir, tmp_path):
    """With nprobe = n_cells (no cell loss), slack covering ADC error, and
    scan_k covering the band, the IVF-composed miner returns EXACTLY the
    brute-force miner's rows — the identity that pins the composition; at
    lower nprobe the result is a subset (unprobed cells are unreachable
    by design, never extra rows)."""
    from aws_data_pipeline_spark.operators import similarity as S

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    ivf = str(tmp_path / "ivf")
    sq8 = str(tmp_path / "sq8")
    S.build_ivf_index(e, ivf, n_cells=8, seed=42, train_fraction=0.5)
    S.build_sq8_index(e, sq8)
    exact = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in S.hard_negative_topk(q, e, k=3, lo=0.25, hi=0.45).collect()
    }
    full = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in S.hard_negative_topk_ivfsq8(
            spark, q, ivf, sq8, k=3, lo=0.25, hi=0.45, nprobe=8
        ).collect()
    }
    assert full == exact and len(exact) > 0
    # pruned probe: pairs are a subset of the exact miner's CANDIDATE band
    # (ranks can shift as unreachable members drop out)
    pruned_pairs = {
        (r.query_id, r.neighbor_id)
        for r in S.hard_negative_topk_ivfsq8(
            spark, q, ivf, sq8, k=3, lo=0.25, hi=0.45, nprobe=2, scan_k=1000
        ).collect()
    }
    band_pairs = {
        (r.query_id, r.neighbor_id)
        for r in S.hard_negative_topk(q, e, k=10**6, lo=0.25, hi=0.45).collect()
    }
    assert pruned_pairs <= band_pairs


def test_registry_hard_negative_ivfsq8_runs(spark, sf_dir):
    """The cell-pruned miner (rows-only seat since r12) runs through the
    shared ivfsq8 root seat and returns a subset of the exact miner's
    band pairs."""
    from aws_data_pipeline_spark.plans import DEMOTED, load_registry

    reg = {**load_registry(), **DEMOTED}  # tier-agnostic
    got = {
        (r.query_id, r.neighbor_id)
        for r in reg["hard_negative_topk_ivfsq8"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    # k caps both sides, so with cell pruning the mined set is a PAIR-level
    # subset only when ranks align; assert the weaker always-true
    # invariant: every mined pair is a true band member
    from aws_data_pipeline_spark.operators import similarity as S

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    all_band = {
        (r.query_id, r.neighbor_id)
        for r in S.hard_negative_topk(
            e.filter(F.col("vec_id") < 10), e, k=10**6, lo=0.25, hi=0.45
        ).collect()
    }
    assert got <= all_band and len(got) > 0


def test_ks_drift_exact_statistic_and_degenerate_cases(spark):
    """ks_drift on planted samples equals the numpy-exact two-sample D
    (max |ECDF diff| over pooled distinct values, smallest attaining value
    reported); identical slices give exactly 0; an empty cohort raises."""
    import numpy as np
    import pytest

    from aws_data_pipeline_spark.operators.quality import ks_drift

    a_vals = [float((i * 13) % 50) for i in range(300)]
    b_vals = [float((i * 7) % 50) + 10.0 for i in range(200)]
    a = spark.createDataFrame([(v,) for v in a_vals], "x double")
    b = spark.createDataFrame([(v,) for v in b_vals], "x double")
    row = ks_drift(a, b, "x").collect()[0]
    av, bv = np.sort(np.array(a_vals)), np.sort(np.array(b_vals))
    pooled = np.unique(np.concatenate([av, bv]))
    fa = np.searchsorted(av, pooled, side="right") / len(av)
    fb = np.searchsorted(bv, pooled, side="right") / len(bv)
    d = np.round(np.abs(fa - fb), 9)
    assert row.ks_stat == d.max()
    assert row.at_value == pooled[int(np.argmax(d))]  # argmax -> first max
    assert (row.n_base, row.n_curr) == (300, 200)

    same = ks_drift(a, a, "x").collect()[0]
    assert same.ks_stat == 0.0

    empty = spark.createDataFrame([], "x double")
    with pytest.raises(ValueError, match="empty cohort"):
        ks_drift(a, empty, "x")


def test_chisq_drift_contributions(spark):
    """chisq_drift: identical category mixes give all-zero contributions; a
    planted shift gives the hand-computed 2xC chi-squared terms; a category
    absent from one cohort contributes its full expected mass."""
    from aws_data_pipeline_spark.operators.quality import chisq_drift

    base = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20, "x string"
    )
    same = chisq_drift(base, base, "x").collect()
    assert {r.chisq_contribution for r in same} == {0.0}

    curr = spark.createDataFrame(
        [("a",)] * 20 + [("b",)] * 60 + [("d",)] * 20, "x string"
    )
    rows = {r.category: r for r in chisq_drift(base, curr, "x").collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    # hand-check one cell: category c, n_base=20 n_curr=0, row_tot=20,
    # tb=100 tc=100 -> e_b=10, e_c=10, contribution = 10 + 10 = 20
    assert rows["c"].n_base == 20 and rows["c"].n_curr == 0
    assert rows["c"].chisq_contribution == 20.0
    assert rows["d"].chisq_contribution == 20.0  # mirror case
    total = sum(r.chisq_contribution for r in rows.values())
    assert total > 9.488  # chi2 critical value at df=3, alpha=0.05


def test_mmr_rerank_diversifies_and_reduces_to_similarity(spark):
    """MMR semantics on planted geometry: two tight clusters near the
    query plus an off-axis point — plain top-3 returns the three cluster-A
    clones; MMR at lambda=0.5 picks one representative per cluster before
    the second clone; lambda=1 reduces exactly to similarity ranking; a
    numpy reference model reproduces the picks; determinism across
    repartitions."""
    import numpy as np

    from aws_data_pipeline_spark.operators import similarity as S

    rows = [
        (0, [1.0, 0.0, 0.0]),        # query
        (1, [0.99, 0.10, 0.0]),      # cluster A (closest to q)
        (2, [0.99, 0.11, 0.0]),      # A clone
        (3, [0.99, 0.12, 0.0]),      # A clone
        (4, [0.80, -0.55, 0.0]),     # cluster B
        (5, [0.80, -0.56, 0.0]),     # B clone
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    cand = S.brute_force_topk(q, df, k=5)  # all 5 candidates, ranked

    plain = [
        r.neighbor_id
        for r in S.mmr_rerank(spark, q, cand, df, k=3, lambda_=1.0)
        .orderBy("mmr_rank")
        .collect()
    ]
    top3 = [
        r.neighbor_id for r in cand.filter(F.col("rank") <= 3).orderBy("rank").collect()
    ]
    assert plain == top3 == [1, 2, 3]  # lambda=1 == similarity ranking

    div = [
        r.neighbor_id
        for r in S.mmr_rerank(spark, q, cand, df, k=3, lambda_=0.5)
        .orderBy("mmr_rank")
        .collect()
    ]
    assert div[0] == 1  # first pick is always the most relevant
    assert div[1] in (4, 5)  # second pick jumps clusters (A clones redundant)

    # numpy reference model over the same rounded-9dp greedy
    vecs = {i: np.array(v) for i, v in rows}
    qv = vecs[0]
    cands = [1, 2, 3, 4, 5]
    sim = lambda a, b: round(
        float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 9
    )
    def mmr_score(c, selected):
        if not selected:  # first pick: pure relevance (redundancy is -inf)
            return round(0.5 * sim(qv, vecs[c]), 9)
        red = max(sim(vecs[c], vecs[s]) for s in selected)
        return round(0.5 * sim(qv, vecs[c]) - 0.5 * red, 9)

    selected, remaining = [], list(cands)
    while remaining and len(selected) < 3:
        best = max(remaining, key=lambda c: (mmr_score(c, selected), -c))
        selected.append(best)
        remaining.remove(best)
    assert div == selected

    # partitioning independence
    again = [
        r.neighbor_id
        for r in S.mmr_rerank(
            spark, q, cand.repartition(7), df.repartition(5), k=3, lambda_=0.5
        )
        .orderBy("mmr_rank")
        .collect()
    ]
    assert again == div


def test_retrieval_metrics_hand_computed(spark):
    """retrieval_metrics on a crafted case: full hit, partial hit with the
    first true neighbor at rank 3 (mrr = 1/3), zero hits (mrr 0.0), and a
    truth set smaller than k (recall denominator = |truth|, not k)."""
    from aws_data_pipeline_spark.operators.similarity import retrieval_metrics

    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2), (3, 30, 1), (4, 40, 1)],
        "query_id long, neighbor_id long, rank int",
    )
    results = spark.createDataFrame(
        [
            (1, 10, 1), (1, 11, 2),          # q1: both truth rows hit
            (2, 99, 1), (2, 98, 2), (2, 20, 3),  # q2: first hit at rank 3
            (3, 77, 1), (3, 78, 2),          # q3: no hits
            (4, 40, 1), (4, 41, 2),          # q4: truth has ONE row (< k)
        ],
        "query_id long, neighbor_id long, rank int",
    )
    got = {r.query_id: r for r in retrieval_metrics(results, truth, k=5).collect()}
    assert (got[1].hits, got[1].recall_at_k, got[1].mrr) == (2, 1.0, 1.0)
    assert (got[2].hits, got[2].mrr) == (1, 1.0 / 3.0)
    assert got[2].recall_at_k == 0.5
    assert (got[3].hits, got[3].recall_at_k, got[3].mrr) == (0, 0.0, 0.0)
    assert (got[4].hits, got[4].recall_at_k, got[4].mrr) == (1, 1.0, 1.0)
    # ndcg via the 9-dp-unit discounts: u(p) = round(1e9/log2(p+1))
    import math

    u = lambda p: round(1e9 / math.log2(p + 1))
    assert got[1].ndcg == 1.0  # perfect order -> DCG == IDCG
    assert got[2].ndcg == float(u(3)) / float(u(1) + u(2))
    assert got[3].ndcg == 0.0
    assert got[4].ndcg == 1.0  # single truth row hit at rank 1


def test_fuzzy_link_recovers_snippet_provenance(spark, sf_dir):
    """Provenance attribution end-to-end on the real corpus: 20-token
    excerpts link back to their source document at rank 1 for >=90% of
    snippets (the residue is excerpts whose source has a near-duplicate
    twin sharing the excerpt's shingles — a tie the id break may award
    to the twin, which is correct linkage behavior, not a miss)."""
    from aws_data_pipeline_spark.plans import DEMOTED, load_registry

    reg = {**load_registry(), **DEMOTED}  # tier-agnostic
    rows = reg["provenance_fuzzy_link"].spark_fn(spark, sf_dir).collect()
    top1 = {r.snippet_id: r.doc_id for r in rows if r.rank == 1}
    assert top1, "no snippet produced any match"
    hit = sum(1 for s, d in top1.items() if s == d)
    assert hit / len(top1) >= 0.9
    # ranks are 1..3 per snippet, jaccards weakly decreasing within one
    per = {}
    for r in rows:
        per.setdefault(r.snippet_id, []).append((r.rank, r.jaccard))
    for sid, rs in per.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        assert all(a[1] >= b[1] for a, b in zip(rs, rs[1:]))


def test_fuzzy_link_hot_shingle_cap_keeps_jaccard_honest(spark):
    """The cap semantics on the asymmetric case: a boilerplate shingle
    held by every corpus row is excluded from BOTH universes, so the
    capped score equals the hand-computed Jaccard over the kept universe
    (not a deflated one), and a query sharing ONLY boilerplate has no
    match evidence at all (absent, not zero-scored)."""
    from aws_data_pipeline_spark.operators.linkage import fuzzy_link

    boiler = "terms of service apply"  # 4 tokens -> two 3-gram shingles
    corpus = spark.createDataFrame(
        [(i, f"{boiler} unique corpus document number {i} content")
         for i in range(5)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [
            (100, "unique corpus document number 3 content"),
            (101, boiler),  # boilerplate-only: must vanish under the cap
        ],
        "qid long, text string",
    )
    out = fuzzy_link(
        queries, corpus, "qid", "doc_id", k=3, top=1, max_bucket=3
    ).collect()
    assert {r.qid for r in out} == {100}
    (m,) = out
    assert m.doc_id == 3 and m.rank == 1
    # kept universes: the 10-token docs differ only in their last two
    # shingles, so 6 of doc 3's 8 shingles are held by all 5 docs (> cap
    # 3) and leave both universes; kept doc shingles = 2, kept query
    # shingles = 2 (of its 4), intersection = 2 -> an honest 1.0 over
    # the kept universe, NOT a deflated 2/(4+8-2)
    assert m.jaccard == 1.0

    # cap off: boilerplate shingles count again, every doc matches 101
    full = fuzzy_link(
        queries, corpus, "qid", "doc_id", k=3, top=5, max_bucket=None
    ).collect()
    assert {r.doc_id for r in full if r.qid == 101} == {0, 1, 2, 3, 4}


def test_volume_anomalies_median_mad_semantics(spark):
    """Planted feed-volume anomalies: a half-empty day and a doubled day
    flag against the median/MAD envelope while ordinary jitter does not;
    the robust pair itself matches the hand-computed values exactly (the
    whole point: one dead day must not drag the center the way a mean
    would)."""
    from aws_data_pipeline_spark.operators.quality import volume_anomalies

    counts = {0: 98, 1: 99, 2: 100, 3: 100, 4: 101, 5: 102, 6: 5, 7: 300}
    rows = [(b,) for b, n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "day int")
    out = {
        r.bucket: r
        for r in volume_anomalies(df, F.col("day"), out_bucket="bucket")
        .collect()
    }
    assert len(out) == 8
    # med = median(98,99,100,100,101,102,5,300) = 100 (middle pair 100,100)
    # deviations sorted: 0,0,1,1,2,2,95,200 -> mad = (1+2)/2 = 1.5
    assert all(r.med == 100.0 and r.mad == 1.5 for r in out.values())
    assert out[6].deviation == 95.0 and out[7].deviation == 200.0
    assert {b for b, r in out.items() if r.is_anomaly} == {6, 7}
    # threshold is exact: a deviation of exactly 5*mad must NOT flag
    assert not (7.5 * 1 > 5 * 1.5)


def test_mutual_best_match_is_one_to_one_and_high_precision(spark):
    """The mutual-best decision rule on a planted many-to-one geometry:
    three near-identical queries all best-match ONE corpus record, but
    only the mutually-best pair survives (the corpus record's own best
    query), so the output is a partial matching — every id appears at
    most once on its side; a clean 1:1 pair elsewhere links normally."""
    from aws_data_pipeline_spark.operators.linkage import (
        fuzzy_link,
        mutual_best_match,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [
            # three variants of record 1; qid 10 is the closest (exact)
            (10, "alpha beta gamma delta epsilon zeta"),
            (11, "alpha beta gamma delta epsilon"),
            (12, "alpha beta gamma delta"),
            # clean 1:1 partner for record 2
            (20, "one two three four five six"),
        ],
        "qid long, text string",
    )
    # per-query top-1 produces the many-to-one merge mutuality prevents
    link = fuzzy_link(queries, corpus, "qid", "doc_id", k=3, top=1)
    assert {r.qid: r.doc_id for r in link.collect()} == {
        10: 1, 11: 1, 12: 1, 20: 2,
    }
    out = mutual_best_match(queries, corpus, "qid", "doc_id", k=3)
    got = {(r.qid, r.doc_id) for r in out.collect()}
    assert got == {(10, 1), (20, 2)}
    rows = out.collect()
    assert len({r.qid for r in rows}) == len(rows)
    assert len({r.doc_id for r in rows}) == len(rows)


def test_collocation_pmi_ranks_true_collocation_first(spark):
    """Planted collocation geometry: a pair that ONLY occurs together
    ('san francisco') outranks an equally frequent pair whose members
    also occur apart ('the cat') — the marginals discount PMI exists to
    apply; values match the Python model evaluating the identical IEEE
    expression sequence, and the hapax guard drops sub-min_count pairs."""
    import math

    from aws_data_pipeline_spark.operators.text import collocation_pmi

    # PMI sorts by c_ab/(c_a*c_b) at fixed totals: san-francisco's
    # members occur ONLY together (5/25), cat-and's also apart (5/50),
    # the-cat's doubly so (5/150) — a strict planted order
    docs = (
        [("san francisco",)] * 5
        + [("the cat sat",)] * 5
        + [("the dog sat",)] * 5
        + [("cat and the",)] * 5
        + [("rare pair",)] * 2  # below min_count: must not appear
    )
    df = spark.createDataFrame(docs, "text string")
    out = {(r.w1, r.w2): r for r in collocation_pmi(df, min_count=5).collect()}
    assert ("rare", "pair") not in out
    assert all(r.n_ab >= 5 for r in out.values())

    # python model: same counts, same float-op order, same 9-dp snap
    N, B = 59, 37
    def model(c, ca, cb):
        return round(math.log(((c / B) / (ca / N)) / (cb / N)) * 1e9) / 1e9

    assert out[("san", "francisco")].pmi == model(5, 5, 5)
    assert out[("the", "cat")].pmi == model(5, 15, 10)
    assert out[("san", "francisco")].pmi > out[("the", "cat")].pmi
    by_rank = sorted(out.values(), key=lambda r: r.rank)
    assert (by_rank[0].w1, by_rank[0].w2) == ("san", "francisco")
    assert [r.rank for r in by_rank] == list(range(1, len(by_rank) + 1))


def test_k_anonymize_suppresses_small_cohorts_only(spark):
    """Suppression semantics: rows in under-k quasi-identifier cohorts
    drop, every surviving cohort has >= k rows, survivors are
    byte-identical input rows (no generalization), and the audit frame's
    flags name exactly the suppressed combinations."""
    from aws_data_pipeline_spark.operators.scrub import (
        k_anonymity_audit,
        k_anonymize,
    )

    rows = (
        [(30, "A", i) for i in range(5)]
        + [(30, "B", i) for i in range(2)]   # under k=3: suppressed
        + [(40, "A", i) for i in range(3)]
        + [(50, "C", 0)]                     # singleton: suppressed
    )
    df = spark.createDataFrame(rows, "nation int, seg string, payload int")
    audit = {
        (r.nation, r.seg): r
        for r in k_anonymity_audit(df, ["nation", "seg"], k=3).collect()
    }
    assert {c for c, r in audit.items() if r.at_risk} == {(30, "B"), (50, "C")}
    assert audit[(30, "A")].n_rows == 5 and not audit[(30, "A")].at_risk

    safe = k_anonymize(df, ["nation", "seg"], k=3)
    got = sorted(map(tuple, safe.collect()))
    assert got == sorted(
        [(30, "A", i) for i in range(5)] + [(40, "A", i) for i in range(3)]
    )
    sizes = safe.groupBy("nation", "seg").count().collect()
    assert all(r["count"] >= 3 for r in sizes)


def test_temporal_split_embargo_purges_the_gap(spark):
    """The embargo contract: train strictly before the boundary, test at
    or after test_start, NOTHING from the gap (the leakage window a
    lookback feature would otherwise straddle), null timestamps absent,
    and the edge instants land on the documented sides."""
    from aws_data_pipeline_spark.operators.sampling import (
        temporal_split_embargo,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-10 00:00:00"),
            (2, "2024-01-19 23:59:59"),
            (3, "2024-01-20 00:00:00"),  # embargo start: dropped
            (4, "2024-01-22 12:00:00"),  # inside embargo: dropped
            (5, "2024-01-24 23:59:59"),  # last embargo instant: dropped
            (6, "2024-01-25 00:00:00"),  # test_start edge: test
            (7, "2024-02-01 00:00:00"),
            (8, None),
        ],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r.id: r.split
        for r in temporal_split_embargo(
            df, "ts", "2024-01-20", "2024-01-25"
        ).collect()
    }
    assert out == {1: "train", 2: "train", 6: "test", 7: "test"}


def test_temporal_split_embargo_rejects_bad_bounds(spark):
    """Transposed or unparseable bounds raise up front instead of
    silently labeling post-boundary rows 'train' (first-when-wins CASE)
    or dropping everything via a null cast."""
    import pytest

    from aws_data_pipeline_spark.operators.sampling import (
        temporal_split_embargo,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00")], "id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="train_end <= test_start"):
        temporal_split_embargo(df, "ts", "2024-03-01", "2024-02-01")
    with pytest.raises(ValueError, match="parseable"):
        temporal_split_embargo(df, "ts", "not-a-date", "2024-02-01")


def test_cohort_retention_hand_computed(spark):
    """Planted cohort geometry: two cohorts with known comeback patterns
    — the triangle's counts and exact fractions match by hand, offset 0
    always equals the cohort size, and a user's multiple events in one
    period count once."""
    from aws_data_pipeline_spark.operators.aggregate import cohort_retention

    rows = [
        # cohort 2024-01-01: users 1,2,3; user 1 returns day1+day2,
        # user 2 returns day2 (twice that day: distinct), user 3 never
        (1, "2024-01-01 08:00:00"), (1, "2024-01-02 08:00:00"),
        (1, "2024-01-03 08:00:00"),
        (2, "2024-01-01 09:00:00"), (2, "2024-01-03 09:00:00"),
        (2, "2024-01-03 10:00:00"),
        (3, "2024-01-01 10:00:00"),
        # cohort 2024-01-02: user 4 only
        (4, "2024-01-02 11:00:00"), (4, "2024-01-03 11:00:00"),
        (None, "2024-01-01 00:00:00"),  # no identity, no cohort
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (str(r.cohort), r.period_offset): (r.n_active, r.n_cohort, r.retention)
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    assert out == {
        ("2024-01-01", 0): (3, 3, 1.0),
        ("2024-01-01", 1): (1, 3, 1 / 3),
        ("2024-01-01", 2): (2, 3, 2 / 3),
        ("2024-01-02", 0): (1, 1, 1.0),
        ("2024-01-02", 1): (1, 1, 1.0),
    }


def test_event_transitions_hand_computed(spark):
    """Planted flows: per-user consecutive pairs count with the
    (ts, tiebreak) total order, first events contribute nothing, and
    each from-row's probabilities are exact fractions summing to 1."""
    from aws_data_pipeline_spark.operators.aggregate import event_transitions

    rows = [
        (1, "2024-01-01 00:00:00", "view", 1),
        (1, "2024-01-01 00:01:00", "click", 2),
        (1, "2024-01-01 00:02:00", "buy", 3),
        (2, "2024-01-01 00:00:00", "view", 4),
        (2, "2024-01-01 00:01:00", "click", 5),
        (2, "2024-01-01 00:02:00", "view", 6),
        # same-timestamp tie decided by event_id: view(7) then click(8)
        (3, "2024-01-01 00:00:00", "view", 7),
        (3, "2024-01-01 00:00:00", "click", 8),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in event_transitions(
            df, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert out == {
        ("view", "click"): (3, 1.0),
        ("click", "buy"): (1, 0.5),
        ("click", "view"): (1, 0.5),
    }


def test_rfm_scores_bands_and_segments(spark):
    """Planted geometry: 10 customers with monotone recency/frequency/
    monetary so every quintile band is predictable; the best customer is
    a champion, the stalest+rarest a lost, and monetary matches the
    decimal-exact sum convention."""
    from aws_data_pipeline_spark.operators.aggregate import rfm_scores

    rows = []
    # customer k: (10 - k) orders, most recent on day k+1 of Jan 2024,
    # amounts 100*(k+1) each — so k=9 is most recent but rarest/…
    # instead plant independent monotone metrics: customer k has k+1
    # orders, last order on 2024-01-(k+1), each worth 100.0*(k+1)
    from datetime import date

    for k in range(10):
        for j in range(k + 1):
            rows.append((k, date(2024, 1, k + 1), 100.0 * (k + 1)))
    df = spark.createDataFrame(rows, "cust long, d date, amt double")
    out = {
        r.cust: r
        for r in rfm_scores(
            df, "cust", "d", "amt", anchor="2024-01-31"
        ).collect()
    }
    assert len(out) == 10
    # recency: cust 9 most recent (Jan 10 -> 21 days), cust 0 stalest
    # (Jan 1 -> 30 days)
    assert out[9].recency_days == 21 and out[0].recency_days == 30
    # all three metrics are monotone in k -> every score is the same
    # quintile band: k in {0,1} -> 1 ... {8,9} -> 5
    for k, r in out.items():
        band = k // 2 + 1
        assert (r.r_score, r.f_score, r.m_score) == (band, band, band), (k, r)
    assert out[9].segment == "champion" and out[8].segment == "champion"
    assert out[0].segment == "lost" and out[1].segment == "lost"
    assert out[5].segment == "regular"
    # monetary: decimal-exact sum, one double cast
    assert out[9].monetary == 100.0 * 10 * 10
    assert out[9].frequency == 10


def test_event_paths_trigram_discovery(spark):
    """Planted journeys: the dominant 3-step path wins rank 1 with the
    exact count; a user's trailing pair starts no trigram; null types
    are dropped before the window (no phantom paths across them)."""
    from datetime import datetime as dt

    from aws_data_pipeline_spark.operators.aggregate import event_paths

    rows = []
    # three users walk view>click>buy; one walks view>click>view
    for u, kinds in [
        (1, ["view", "click", "buy"]),
        (2, ["view", "click", "buy"]),
        (3, ["view", "click", "buy", "view"]),
        (4, ["view", "click", "view"]),
        (5, ["view", None, "click", "buy"]),  # null dropped -> v>c>b
    ]:
        for i, k in enumerate(kinds):
            rows.append((u, dt(2024, 1, 1, 0, i), k, i))
    df = spark.createDataFrame(rows, "u long, ts timestamp, k string, i long")
    got = [
        (r.path, r.n, r.rank)
        for r in event_paths(df, "u", "ts", "k", "i").collect()
    ]
    assert got[0] == ("view > click > buy", 4, 1)
    assert ("click > buy > view", 1, 2) in got
    assert ("view > click > view", 1, 3) in got  # path-ASC tie-break
    assert len(got) == 3


def test_interarrival_stats_exact_microseconds(spark):
    """Planted cadence: type A every 60s with one 600s hole, type B a
    single event (no gap, absent) — mean/p50/p95 computed on exact µs."""
    from datetime import datetime as dt, timedelta as td

    from aws_data_pipeline_spark.operators.aggregate import (
        interarrival_stats,
    )

    t0 = dt(2024, 1, 1)
    rows = [("A", t0 + td(seconds=s), i) for i, s in enumerate([0, 60, 120, 720, 780])]
    rows.append(("B", t0, 99))
    df = spark.createDataFrame(rows, "k string, ts timestamp, i long")
    out = {r.event_type: r for r in interarrival_stats(df, "k", "ts", "i").collect()}
    assert set(out) == {"A"}
    a = out["A"]
    assert a.n_gaps == 4
    # gaps: 60, 60, 600, 60 seconds -> mean 195 s, p50 (rank 2 of 4) 60 s,
    # p95 (rank ceil(3.8)=4) 600 s
    assert a.mean_gap_us == 195_000_000.0
    assert a.p50_us == 60_000_000 and a.p95_us == 600_000_000


def test_referential_integrity_counts_orphans_and_null_fks(spark):
    """Planted topology: 2 matched children, 1 orphan, 1 null FK — each
    lands in exactly one bucket and the row reconciles to n_child."""
    from aws_data_pipeline_spark.operators.quality import (
        referential_integrity,
    )

    child = spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "c"), (None, "d")], "fk long, v string"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = referential_integrity(child, parent, ["fk"], ["pk"], "c->p").collect()[0]
    assert (r.relationship, r.n_child, r.n_null_fk, r.n_matched, r.n_orphans) == (
        "c->p", 4, 1, 2, 1
    )


def test_golden_records_survivorship_rules(spark):
    """Planted clusters: each rule picks the arg-max record's VALUE with
    ties broken toward the lowest id (partitioning-independent), and a
    cross-attribute rule carries another column of the winning record;
    all rules fold in one grouped pass (single aggregate plan)."""
    from pyspark.sql import functions as F

    from aws_data_pipeline_spark.operators.linkage import golden_records

    df = spark.createDataFrame(
        [
            # entity 1: ids 10,11,12
            (1, 10, "Ann", 50.0, "AUTO"),
            (1, 11, "Annabelle", 90.0, "BIKE"),
            (1, 12, "Annabelle", 90.0, "CAR"),  # bal tie -> lower id wins
            # entity 2: single record
            (2, 20, "Bo", 10.0, "SHIP"),
        ],
        "e long, rid long, name string, bal double, seg string",
    )
    out = {
        r.e: r
        for r in golden_records(
            df,
            "e",
            "rid",
            {
                "name": ("name", F.length("name")),
                "best_bal": ("bal", F.col("bal")),
                "rich_seg": ("seg", F.col("bal")),
            },
        ).collect()
    }
    g1, g2 = out[1], out[2]
    assert g1.n_records == 3
    assert g1.name == "Annabelle"          # longest, tie -> id 11
    assert g1.best_bal == 90.0
    assert g1.rich_seg == "BIKE"           # the TIED-bal winner is id 11
    assert (g2.name, g2.best_bal, g2.rich_seg, g2.n_records) == (
        "Bo", 10.0, "SHIP", 1
    )


def test_conversion_latency_planted_geometry(spark):
    """Planted conversions: user A converts twice (first purchase wins
    per click), user B's purchase is outside the window, user C never
    converts — count/mean/quantiles computed on exact microseconds."""
    from datetime import datetime as dt, timedelta as td

    from aws_data_pipeline_spark.operators.aggregate import (
        conversion_latency,
    )

    t0 = dt(2024, 1, 1)
    rows = [
        # user 1: click 1 -> purchases at +30s (first) and +60s
        (1, 10, "click", t0),
        (1, 11, "purchase", t0 + td(seconds=30)),
        (1, 12, "purchase", t0 + td(seconds=60)),
        # user 1: click 2 -> purchase at +90s (only the later purchase
        # is in ITS window: +60s event precedes it)
        (1, 13, "click", t0 + td(seconds=45)),
        # user 2: purchase 20 min after the click — outside 10 min
        (2, 20, "click", t0),
        (2, 21, "purchase", t0 + td(minutes=20)),
        # user 3: click, no purchase
        (3, 30, "click", t0),
    ]
    df = spark.createDataFrame(rows, "u long, eid long, k string, ts timestamp")
    out = conversion_latency(
        df, "u", "ts", "k", "eid", "click", "purchase", 600
    ).collect()
    assert len(out) == 1
    r = out[0]
    # click 10 -> 30s; click 13 -> first purchase after it is +60s, 15s
    assert r.n_conversions == 2
    assert r.mean_latency_us == (30_000_000 + 15_000_000) / 2.0
    assert r.p50_us == 15_000_000   # rank ceil(0.5*2)=1 of sorted {15s,30s}
    assert r.p90_us == 30_000_000   # rank ceil(0.9*2)=2


def test_referential_integrity_same_name_fk_pk(spark):
    """The common real-world naming: FK and PK columns BOTH called
    order_id. The parent keys are re-aliased before the join, so the
    condition never hits AMBIGUOUS_REFERENCE (the r12 ADVICE repro),
    and the counts match the differently-named case."""
    from aws_data_pipeline_spark.operators.quality import (
        referential_integrity,
    )

    child = spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "c"), (None, "d")],
        "order_id long, v string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "order_id long")
    r = referential_integrity(
        child, parent, ["order_id"], ["order_id"], "c->p"
    ).collect()[0]
    assert (r.relationship, r.n_child, r.n_null_fk, r.n_matched, r.n_orphans) == (
        "c->p", 4, 1, 2, 1
    )


def test_conversion_latency_empty_input_returns_zero_row(spark):
    """Empty-input contract (VERDICT r12 item 3): no conversions is an
    ANSWER — one row with n_conversions=0 and null mean/quantiles, the
    same shape the SQL twin's grand aggregate produces — never an empty
    frame a caller can't tell from 'no data'. Covers both the
    empty-source case and the nobody-converts case."""
    from aws_data_pipeline_spark.operators.aggregate import (
        conversion_latency,
    )

    empty = spark.createDataFrame(
        [], "u long, eid long, k string, ts timestamp"
    )
    out = conversion_latency(
        empty, "u", "ts", "k", "eid", "click", "purchase", 600
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_conversions == 0
    assert r.mean_latency_us is None
    assert r.p50_us is None and r.p90_us is None

    # events exist but none convert (click without purchase)
    from datetime import datetime as dt

    noconv = spark.createDataFrame(
        [(1, 10, "click", dt(2024, 1, 1))],
        "u long, eid long, k string, ts timestamp",
    )
    r2 = conversion_latency(
        noconv, "u", "ts", "k", "eid", "click", "purchase", 600
    ).collect()
    assert len(r2) == 1 and r2[0].n_conversions == 0


def test_src_state_memo_recounts_on_content_change(spark, tmp_path):
    """_src_state's row-count memo is keyed on the zone's full listing
    (files, bytes, max mtime): unchanged files serve the memoized count
    without a Spark action; any append/rewrite flips the key and
    re-counts — so the memo can never outlive what the staleness marker
    records."""
    from aws_data_pipeline_spark.plans.llm import _SRC_COUNT_MEMO, _src_state

    sf = str(tmp_path)
    spark.range(5).select(F.col("id").alias("doc_id")).write.parquet(
        f"{sf}/documents.parquet"
    )
    s1 = _src_state(spark, sf, "documents")
    assert s1[0] == 5
    hits = [k for k in _SRC_COUNT_MEMO if k[1] == sf]
    assert len(hits) == 1 and _SRC_COUNT_MEMO[hits[0]] == 5
    assert _src_state(spark, sf, "documents") == s1  # memo hit, same value
    spark.range(5).select(F.col("id").alias("doc_id")).write.mode(
        "append"
    ).parquet(f"{sf}/documents.parquet")
    s2 = _src_state(spark, sf, "documents")
    assert s2[0] == 10  # listing flipped -> recounted
    assert s2[1] != s1[1] or s2[2] != s1[2]
