"""llm_extra golden/property tests + ST8 replay equality."""

import tempfile

from pyspark.sql import functions as F

from ipydataclean_spark.operators.llm_extra import cluster_pairs, fingerprints, language_id
from ipydataclean_spark.operators.qhelp import documents_dup


def test_l2j_threshold_sweep_monotone_and_nonvacuous(spark, sf_dir):
    """The dedup tuning table must be NON-VACUOUS: every savings metric
    is monotonically non-increasing in the threshold (a stricter cutoff
    never drops more), strictly decreases somewhere on the fixture (a
    constant table teaches a deployment nothing — the 0.5-0.8 sweep
    failed exactly this way), and at each tau the keep-one accounting
    is internally consistent (n_docs_dropped = n_dup_docs -
    n_dup_clusters; every dup cluster has >= 2 docs)."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = sorted(
        QUERIES["l2j_dedup_threshold_sweep"]["fn"](spark, sf_dir).collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == 4
    for col in ("n_pairs", "n_dup_clusters", "n_dup_docs", "n_docs_dropped", "chars_dropped"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals, reverse=True), f"{col} not non-increasing: {vals}"
    assert rows[0].n_pairs > rows[-1].n_pairs > 0, "sweep vacuous: no threshold discriminates"
    for r in rows:
        assert r.n_docs_dropped == r.n_dup_docs - r.n_dup_clusters
        assert r.n_dup_docs >= 2 * r.n_dup_clusters
        assert r.chars_dropped > 0


def test_l43_substring_spans_known_corpus(spark, tmp_path):
    """Hand-built corpus pins the span semantics exactly: shared-gram
    positions merge into maximal spans iff <= 3 apart (touching
    coverage), split across a gap, docs with no shared grams are
    absent, and a fully-shared doc scores dup_frac 1.0."""
    from ipydataclean_spark.operators.llm_extra import l43_substring_dup_spans

    rows = [
        (1, "a b c d e f g h"),                      # shares a-b-c-d-e with 2
        (2, "x y a b c d e q"),                      # same run, offset
        (3, "m n o p q r s t"),                      # nothing shared
        (4, "a b c z1 z2 z3 z4 z5 a b c"),           # two disjoint spans
        (6, "a b c"),                                # exactly one shared gram
    ]
    # ids avoid doc_id % 5 == 0 so documents_dup injects no copies
    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "mini")
    df.write.parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in l43_substring_dup_spans(spark, d).collect()}
    assert set(got) == {1, 2, 4, 6}, "doc 3 shares no gram and must be absent"
    a = got[1]
    assert (a.n_spans, a.dup_words, a.longest_span, a.n_words) == (1, 5, 5, 8)
    b = got[2]
    assert (b.n_spans, b.dup_words, b.longest_span, b.n_words) == (1, 5, 5, 8)
    dd = got[4]
    assert (dd.n_spans, dd.dup_words, dd.longest_span, dd.n_words) == (2, 6, 3, 11)
    e = got[6]
    assert (e.n_spans, e.dup_words, e.n_words) == (1, 3, 3)
    assert e.dup_frac == 1.0


def test_l43_substring_spans_fixture_sanity(spark, sf_dir):
    """On the fixture the injected verbatim copies (doc_id % 5 == 0 and
    their +1000000 twins) must be FULLY covered (dup_frac 1.0), and the
    table must discriminate — some doc has 0 < dup_frac < 1."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    got = {r.doc_id: r for r in
           QUERIES["l43_substring_dup_spans"]["fn"](spark, sf_dir).collect()}
    twins = [d for d in got if d >= 1000000]
    assert twins
    for t in twins:
        assert got[t].dup_frac == 1.0, f"verbatim twin {t} not fully covered"
        orig = t - 1000000
        assert orig in got and got[orig].dup_frac == 1.0
    assert any(0.0 < r.dup_frac < 1.0 for r in got.values()), "table vacuous"


def test_cluster_pairs_components(spark):
    """Known graph: {1,2,3} chained, {10,11}, {20} isolated."""
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 20)], ["id"])
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["a", "b"])
    got = {r.id: r.cluster_id for r in cluster_pairs(ids, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_injected_dups_cluster_with_base(spark, sf_dir):
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    docs = documents_dup(spark, sf_dir)
    pairs = QUERIES["l2_minhash_lsh"]["fn"](spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    labels = cluster_pairs(docs.select(F.col("doc_id").alias("id")), pairs)
    lab = {r.id: r.cluster_id for r in labels.collect()}
    injected = [(d, d + 1000000) for d in range(0, 500, 5) if d + 1000000 in lab]
    same = sum(1 for a, b in injected if lab[a] == lab[b])
    assert same / len(injected) >= 0.95


def test_language_id_on_distinct_corpora(spark):
    """Controlled multilingual corpus: the n-gram profile must separate
    languages with genuinely different character statistics."""
    en = ["the quick brown fox jumps over the lazy dog near the river bank",
          "she sells sea shells by the sea shore every sunny morning"]
    de = ["der schnelle braune fuchs springt ueber den faulen hund am fluss",
          "sie verkauft muscheln am meeresufer an jedem sonnigen morgen"]
    fr = ["le renard brun rapide saute par dessus le chien paresseux pres de la riviere",
          "elle vend des coquillages au bord de la mer chaque matin ensoleille"]
    train = spark.createDataFrame(
        [(t, "en") for t in en] + [(t, "de") for t in de] + [(t, "fr") for t in fr],
        ["text", "lang"],
    )
    test = spark.createDataFrame(
        [
            (0, "the fox and the dog ran over the sunny shore", "en"),
            (1, "der hund und der fuchs springen am sonnigen morgen", "de"),
            (2, "le chien et le renard sautent pres de la mer", "fr"),
        ],
        ["doc_id", "text", "expected"],
    )
    got = {r.doc_id: r.predicted_lang for r in language_id(train, test.select("doc_id", "text")).collect()}
    expect = {r.doc_id: r.expected for r in test.collect()}
    assert got == expect


def test_fingerprints_identical_for_normalized_dups(spark, sf_dir):
    """Injected dups differ only by case/padding → identical normalized
    text → identical winnowing fingerprint sets."""
    docs = documents_dup(spark, sf_dir)
    fp = {r.doc_id: sorted(r.fp) for r in fingerprints(docs).collect()}
    pairs = [(d, d + 1000000) for d in range(0, 500, 5)]
    assert all(fp[a] == fp[b] for a, b in pairs if b in fp)


def test_stream_stream_join_replay(spark, sf_dir):
    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.streaming.stream import events_stream, purchase_click_join

    batch = purchase_click_join(load_table(spark, sf_dir, "events"))
    expect = sorted(tuple(r) for r in batch.collect())
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            purchase_click_join(events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName("t_ss_join")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(tuple(r) for r in spark.table("t_ss_join").collect())
    assert got == expect


def test_ivf_knn_recall(spark, sf_dir):
    """IVF(nprobe=4/16) must recover most exact top-5 neighbors — the
    fixture embeddings are label-clustered, so cells align with true
    neighborhoods."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    exact_rows = QUERIES["l3_knn_exact"]["fn"](spark, sf_dir).collect()
    ivf_rows = QUERIES["l3c_knn_ivf"]["fn"](spark, sf_dir).collect()
    exact_sets = {}
    for r in exact_rows:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    ivf_sets = {}
    for r in ivf_rows:
        ivf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & ivf_sets.get(q, set())) / len(exact_sets[q]) for q in exact_sets
    ]
    # deterministic pipeline: measured 0.84 mean / 0.8 min — pin a floor
    # close to it (the old 0.5 floor could mask a halved recall)
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    assert min(recalls) >= 0.6, recalls


def test_countmin_heavy_hitters(spark, sf_dir):
    """CMS guarantees on the documents fixture: estimate >= exact for
    every heavy hitter, overshoot within e*N/width, and the estimate
    is deterministic across runs (fixed xxhash64 seeds)."""
    import math

    from pyspark.sql import functions as F

    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.operators.llm import tokens_col
    from ipydataclean_spark.operators.llm_extra import (
        countmin_estimate,
        countmin_sketch,
        l14_countmin_heavy_hitters,
    )

    df = l14_countmin_heavy_hitters(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 15
    assert all(r.cms_within_bound == 1 for r in rows)

    # the tighter e*N/width guarantee, pinned on the raw sketch API
    occ = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens_col("text")).alias("tok"))
        .where(F.length("tok") > 0)
    )
    n_total = occ.count()
    exact = {r.tok: r.exact_count for r in rows}
    sketch = countmin_sketch(occ)
    cand = occ.sparkSession.createDataFrame([(t,) for t in exact], ["tok"])
    est = {r.tok: r.cms_estimate for r in countmin_estimate(sketch, cand).collect()}
    bound = math.e * n_total / 1024
    for tok, exact_n in exact.items():
        assert est[tok] >= exact_n, (tok, est[tok], exact_n)
        assert est[tok] - exact_n <= bound, (tok, est[tok], exact_n, bound)
    # deterministic across runs (fixed xxhash64 seeds)
    again = {r.tok: r.cms_estimate for r in countmin_estimate(sketch, cand).collect()}
    assert again == est


def test_pq_knn_recall(spark, sf_dir):
    """PQ/ADC (4 subspaces, 16 codes, rerank 100) must recover most
    exact top-5 neighbors — codes are lossy but the exact re-rank of
    the ADC-ranked head restores the ordering."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    exact_rows = QUERIES["l3_knn_exact"]["fn"](spark, sf_dir).collect()
    pq_rows = QUERIES["l3e_knn_pq"]["fn"](spark, sf_dir).collect()
    exact_sets = {}
    for r in exact_rows:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    pq_sets = {}
    for r in pq_rows:
        pq_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & pq_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    assert min(recalls) >= 0.6, recalls


def test_knn_facade_strategies_agree(spark, sf_dir):
    """functions.knn facade: auto dispatch picks exact at fixture size;
    every strategy returns the same schema and ≥0.6 recall vs exact."""
    from ipydataclean_spark.functions.knn import choose_strategy, knn
    from ipydataclean_spark.operators.qhelp import T
    from pyspark.sql import functions as F

    assert choose_strategy(1_000) == "exact"
    assert choose_strategy(1_000_000) == "lsh"
    assert choose_strategy(1_000_000, stored_table=True) == "ivf"
    assert choose_strategy(100_000_000) == "pq"

    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 3)
    exact = knn(emb, q, strategy="auto")  # auto -> exact at 500 vectors
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(exact_sets) == {0, 1, 2}
    for strat in ("lsh", "ivf", "pq"):
        got = knn(emb, q, strategy=strat)
        assert got.columns == ["query_id", "neighbor_id", "cos_sim"]
        sets = {}
        for r in got.collect():
            sets.setdefault(r.query_id, set()).add(r.neighbor_id)
        recalls = [
            len(exact_sets[k] & sets.get(k, set())) / len(exact_sets[k])
            for k in exact_sets
        ]
        assert sum(recalls) / len(recalls) >= 0.6, (strat, recalls)


def test_ivf_stored_index_prunes_partitions(spark, sf_dir, tmp_path):
    """The persisted IVF index answers identically to the in-memory
    form, and the probe scan lists ONLY probed cells (static partition
    pruning visible as PartitionFilters on the cell key)."""
    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.operators.ivf import ivf_knn, ivf_knn_stored, ivf_write
    from ipydataclean_spark.plans import formatted_plan

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    ivf_write(emb, f"{tmp_path}/ivf")
    stored = ivf_knn_stored(spark, f"{tmp_path}/ivf", queries)
    mem = ivf_knn(emb, queries)
    got = {(r.query_id, r.neighbor_id) for r in stored.collect()}
    want = {(r.query_id, r.neighbor_id) for r in mem.collect()}
    assert got == want
    plan = formatted_plan(stored)
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters")[1][:120]


def test_dedup_keep_best_prefers_base_doc(spark, sf_dir):
    """c30: every injected dup cluster (base doc + padded/upper twin)
    must keep the BASE doc — the shorter, un-padded copy — and
    singleton clusters keep themselves."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["c30_dedup_keep_best"]["fn"](spark, sf_dir).collect()
    by_cluster = {r.cluster_id: r for r in rows}
    # injected twins: doc d (d % 5 == 0) twins with d + 1000000;
    # min-label clustering labels that cluster with the base id
    dup_clusters = [r for r in rows if r.cluster_size >= 2]
    assert dup_clusters, "fixture should produce dup clusters"
    for r in dup_clusters:
        # the survivor is always an original (the twin is longer by
        # padding); clusters may merge several similar base docs, so
        # only a pure base+twin pair pins survivor == base exactly
        assert r.survivor_id < 1000000, (r.cluster_id, r.survivor_id)
        if r.cluster_size == 2 and r.cluster_id % 5 == 0:
            assert r.survivor_id == r.cluster_id
    singles = [r for r in rows if r.cluster_size == 1]
    for r in singles[:50]:
        assert r.survivor_id == r.cluster_id


def test_ivf_append_and_drift(spark, sf_dir, tmp_path):
    """Incremental IVF maintenance: build on half the corpus, append
    the rest against the FROZEN centroids. Appended vectors are
    searchable through the same partition-pruned probe path, per-cell
    membership equals a fresh assignment of the full corpus to the
    build-time centroids, and the drift metric matches an independent
    DuckDB computation over the written index files (oracle check)."""
    import duckdb

    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.operators.ivf import (
        assign_cells,
        ivf_append,
        ivf_drift,
        ivf_knn_stored,
        ivf_write,
    )
    from ipydataclean_spark.plans import formatted_plan

    emb = load_table(spark, sf_dir, "embeddings")
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    mid = ids[len(ids) // 2]
    base, extra = emb.where(F.col("vec_id") < mid), emb.where(F.col("vec_id") >= mid)
    path = f"{tmp_path}/ivf"
    ivf_write(base, path)
    ivf_append(spark, path, extra)

    # membership: stored cells == fresh assignment of ALL vectors to
    # the frozen (build-time) centroids
    cents = spark.read.parquet(f"{path}/centroids")
    want = {
        (r.vec_id, r.cell) for r in assign_cells(emb, cents).select("vec_id", "cell").collect()
    }
    got = {
        (r.vec_id, r.cell)
        for r in spark.read.parquet(f"{path}/cells").select("vec_id", "cell").collect()
    }
    assert got == want

    # appended vectors are reachable via the pruned probe path
    queries = emb.where(F.col("vec_id") < 3)
    stored = ivf_knn_stored(spark, path, queries)
    rows = stored.collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    assert any(r.neighbor_id >= mid for r in rows), "no appended vector ever surfaced"
    plan = formatted_plan(stored)
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters")[1][:120]

    # drift metric vs an independent DuckDB computation on the index files
    drift = {r.cell: (r.n_members, r.mean_d2) for r in ivf_drift(spark, path).collect()}
    con = duckdb.connect()
    oracle = con.execute(
        "WITH m AS (SELECT cell, embedding FROM read_parquet(?, hive_partitioning = 1)), "
        "c AS (SELECT cid, centroid FROM read_parquet(?)), "
        "d AS (SELECT cell, list_sum(list_transform(list_zip(m.embedding, c.centroid), "
        "z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))^2)) AS d2 "
        "FROM m JOIN c ON m.cell = c.cid) "
        "SELECT cell, COUNT(*) AS n, AVG(d2) AS mean_d2 FROM d GROUP BY cell "
        "UNION ALL SELECT -1, COUNT(*), AVG(d2) FROM d ORDER BY cell",
        [f"{path}/cells/*/*.parquet", f"{path}/centroids/*.parquet"],
    ).fetchall()
    assert set(drift) == {int(c) for c, _, _ in oracle}
    for cell, n, mean_d2 in oracle:
        sn, sm = drift[int(cell)]
        assert sn == n, (cell, sn, n)
        assert abs(sm - mean_d2) <= 1e-6, (cell, sm, mean_d2)


def test_ivf_filtered_probe(spark, sf_dir, tmp_path):
    """Filtered vector search over the stored index: the label
    predicate rides the cells scan (pushed filter + partition filter),
    results honor the filter, and recall vs the exact filtered search
    stays high at raised nprobe."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.operators.ivf import ivf_knn_stored, ivf_write
    from ipydataclean_spark.operators.llm import l3g_knn_filtered
    from ipydataclean_spark.plans import pushed_filters

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    ivf_write(emb, path, n_cells=8, meta_cols=("label",))
    lbl = emb.where("vec_id = 0").select("label").first()[0]
    out = ivf_knn_stored(
        spark, path, emb.where("vec_id = 0"), k_neighbors=5, nprobe=8,
        where=F.col("label") == lbl,
    )
    rows = out.collect()
    assert rows, "filtered probe returned nothing"
    stored = {r.vec_id: r.label for r in spark.read.parquet(path + "/cells").select("vec_id", "label").collect()}
    assert all(stored[r.neighbor_id] == lbl for r in rows)
    # the label predicate reaches the scan
    filters = " ".join(pushed_filters(out))
    assert "label" in filters, filters
    # recall vs exact filtered top-5 (nprobe=8 of 8 cells = exhaustive)
    exact_rows = [
        r.neighbor_id
        for r in l3g_knn_filtered(spark, sf_dir).collect()
        if r.query_id == 0
    ]
    got_ids = [r.neighbor_id for r in rows]
    assert set(got_ids) == set(exact_rows)


def test_l29_injected_copies_fully_repeated(spark, sf_dir):
    """Every injected near-copy (doc_id >= 1000000 normalizes to its
    original's bytes) must score shared_frac == 1.0 and be flagged —
    the doc-level readout of cross-doc span duplication — while the
    corpus as a whole must NOT be degenerate (some docs score low)."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = {
        r.doc_id: r
        for r in QUERIES["l29_repeated_gram_fraction"]["fn"](spark, sf_dir).collect()
    }
    copies = [r for d, r in rows.items() if d >= 1000000]
    assert copies, "no injected copies in the result"
    assert all(r.shared_frac == 1.0 and r.is_near_dup for r in copies)
    # fractions are valid and the flag matches the threshold everywhere
    for r in rows.values():
        assert 0.0 <= r.shared_frac <= 1.0
        assert r.is_near_dup == (r.shared_frac >= 0.95)
        assert 0 <= r.n_shared <= r.n_grams
    # discrimination: the flag must split the corpus non-trivially —
    # every copy+original pair flagged, the template-noise majority not
    flagged = sum(1 for r in rows.values() if r.is_near_dup)
    assert 2 * len(copies) <= flagged < len(rows) // 2, flagged


def test_inc4_incremental_minhash_goldens(spark, sf_dir):
    """inc4: every injected copy of a HISTORY doc (orig < 400, so its
    bands are in the stored index) must classify near_dup_of_history
    with a history match at estimated Jaccard 1.0 (normalization makes
    copies token-identical); every est-1.0 match must survive exact
    verification with HIGH true shingle overlap (est 1.0 is an
    estimate — 16 agreeing minima allow a near-but-not-exact match,
    observed on template pairs in this corpus); novel docs carry NULL
    match columns."""
    from ipydataclean_spark.functions.text import norm_text_col
    from ipydataclean_spark.registry import QUERIES, load_all
    from ipydataclean_spark.operators.qhelp import documents_dup

    load_all()
    out = {r.doc_id: r for r in QUERIES["inc4_incremental_minhash"]["fn"](spark, sf_dir).collect()}
    texts = {
        r.doc_id: r.t
        for r in documents_dup(spark, sf_dir)
        .select("doc_id", norm_text_col("text").alias("t"))
        .collect()
    }

    def sh(s):
        w = s.split(" ")
        return {tuple(w[i : i + 3]) for i in range(len(w) - 2)}

    hist_copies = [d for d in out if d >= 1000000 and (d - 1000000) % 5 == 0 and d - 1000000 < 400]
    assert hist_copies, "no copies of history docs in the delta"
    for d in hist_copies:
        r = out[d]
        assert r.status == "near_dup_of_history", (d, r)
        assert r.matched_id is not None and r.matched_id < 400, (d, r)
        assert r.best_est == 1.0, (d, r)
    # est-1.0 matches must survive exact verification
    for d, r in out.items():
        if r.status == "near_dup_of_history" and r.best_est == 1.0:
            a, b = sh(texts[d]), sh(texts[r.matched_id])
            assert a and b, (d, r.matched_id)
            j = len(a & b) / len(a | b)
            assert j >= 0.8, (d, r.matched_id, j)
        if r.status == "novel":
            assert r.matched_id is None and r.best_est is None, (d, r)
    # the delta universe is complete and statuses are binary
    assert set(out) == {d for d in texts if d >= 400}
    assert {r.status for r in out.values()} <= {"near_dup_of_history", "novel"}


def test_pipeline_span_curation_accounting(spark, sf_dir):
    """Stage accounting must be internally consistent and non-vacuous:
    exactly the 100 injected verbatim copies fall to exact dedup
    (stage order! span-cutting first would also empty the originals),
    survivors split exactly into span-dropped + kept, and the word
    ledger balances (retained = total - cut, all non-negative, some
    words actually cut on the boilerplate-heavy fixture)."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    r = QUERIES["pipeline_span_curation"]["fn"](spark, sf_dir).first()
    assert r.n_docs_in == 600 and r.n_exact_dropped == 100
    assert r.n_survivors == r.n_docs_in - r.n_exact_dropped
    assert r.n_span_dropped + r.n_kept == r.n_survivors
    assert r.words_retained == r.kept_words_total - r.words_cut
    assert 0 < r.words_cut < r.kept_words_total
    assert r.n_kept > 0 and r.n_span_dropped > 0


def test_l45_domain_report_reconciles_with_l2i(spark, sf_dir):
    """The per-source attribution must reconcile EXACTLY with l2i's
    cluster-size report (same certified pipeline, different slice):
    total docs, docs dropped, and chars dropped agree, and every
    source's drops are bounded by its doc count."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    by_src = QUERIES["l45_domain_dedup_report"]["fn"](spark, sf_dir).collect()
    by_size = QUERIES["l2i_dedup_savings"]["fn"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in by_src) == sum(r.n_docs for r in by_size) == 600
    dropped_src = sum(r.n_docs_dropped for r in by_src)
    dropped_size = sum(r.n_docs - r.n_clusters for r in by_size)
    assert dropped_src == dropped_size > 0
    assert sum(r.chars_dropped for r in by_src) == sum(r.chars_dropped for r in by_size)
    for r in by_src:
        assert 0 <= r.n_docs_dropped < r.n_docs
        assert 0 <= r.chars_dropped <= r.chars_total


def test_l43b_exact_sibling_equals_gram_islands_golden(spark, tmp_path):
    """The sorted-suffix EXACT recompute (Lee-et-al mechanism) must
    produce the identical span table to the gram-island production
    path on the hand corpus — pinning l43's semantics against an
    independent implementation (verdict r08 #4)."""
    from ipydataclean_spark.operators.llm_extra import (
        l43_substring_dup_spans,
        l43b_exact_dup_spans,
    )

    rows = [
        (1, "a b c d e f g h"),
        (2, "x y a b c d e q"),
        (3, "m n o p q r s t"),
        (4, "a b c z1 z2 z3 z4 z5 a b c"),
        (6, "a b c"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "mini43b")
    df.write.parquet(f"{d}/documents.parquet")
    a = sorted(map(tuple, l43_substring_dup_spans(spark, d).collect()))
    b = sorted(map(tuple, l43b_exact_dup_spans(spark, d).collect()))
    assert a == b
    assert a, "golden corpus produced no spans"


def test_l43b_exact_sibling_equals_gram_islands_fixture(spark, sf_dir):
    """Full-frame equality on the real fixture (including the injected
    verbatim twins) — the audit that l43's windows and l43b's interval
    merge agree on every doc, span count, and word total."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    a = sorted(map(tuple, QUERIES["l43_substring_dup_spans"]["fn"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["l43b_exact_dup_spans"]["fn"](spark, sf_dir).collect()))
    assert a == b
    assert len(a) > 100, "fixture span table suspiciously small"


def test_l53_containment_catches_excerpts_jaccard_misses(spark, sf_dir):
    """Every injected half-doc excerpt must surface with containment
    1.0 while its Jaccard sits well below the whole-doc threshold —
    the asymmetric-measure payoff, and the reason a containment pass
    exists at all."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["l53_containment_pairs"]["fn"](spark, sf_dir).collect()
    exc = {r.doc_b - 4000000: r for r in rows if r.doc_b >= 4000000
           and r.doc_b - 4000000 == r.doc_a}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = {r.doc_id for r in docs.where("doc_id % 7 = 3").collect()}
    missing = expected - set(exc)
    assert not missing, f"excerpt pairs missing: {sorted(missing)[:5]}"
    for d, r in exc.items():
        assert r.containment == 1.0, f"excerpt {d}: containment {r.containment}"
        assert r.jaccard < 0.75, f"excerpt {d}: jaccard {r.jaccard} suspiciously high"
    assert any(r.jaccard < 0.6 for r in exc.values()), (
        "no excerpt below the whole-doc Jaccard threshold — fixture vacuous"
    )


def test_l52_perplexity_tiers_ordered_and_balanced(spark, sf_dir):
    """Per language: three tiers, sizes balanced to ±1 (NTILE), score
    ordering head > middle > tail, and keep covers exactly head+middle
    — the CCNet policy, verifiable from the report alone."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["l52_perplexity_buckets"]["fn"](spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert len(by_lang) >= 3
    for lang, tiers in by_lang.items():
        assert [t.bucket for t in sorted(tiers, key=lambda t: t.bucket)] == [1, 2, 3]
        sizes = [t.n_docs for t in tiers]
        assert max(sizes) - min(sizes) <= 1, f"{lang}: unbalanced {sizes}"
        t1, t2, t3 = sorted(tiers, key=lambda t: t.bucket)
        assert t1.mean_logprob >= t2.mean_logprob >= t3.mean_logprob
        assert t1.keep and t2.keep and not t3.keep
        assert (t1.tier, t2.tier, t3.tier) == ("head", "middle", "tail")


def test_l54_cluster_cohesion_consistent(spark, sf_dir):
    """Cluster audit invariants: edges never exceed possible pairs,
    density in (0, 1], min <= mean jac, every jac >= tau, and the
    injected verbatim twins form perfect cliques (density 1.0 at
    jac 1.0 for their 2-clusters)."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["l54_dedup_cluster_quality"]["fn"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.size >= 2
        assert 1 <= r.n_edges <= r.possible_pairs
        assert 0.0 < r.edge_density <= 1.0
        assert r.min_jac <= r.mean_jac
        assert r.min_jac >= 0.9
    twins = [r for r in rows if r.size == 2 and r.cluster_id % 5 == 0
             and r.cluster_id < 1000000]
    assert twins, "no verbatim twin clusters surfaced"
    for r in twins:
        assert r.edge_density == 1.0 and r.min_jac == 1.0


def test_l58_planted_translation_pair_is_mutual_top_margin(spark, tmp_path):
    """A planted en/de pair with near-identical embeddings must mine as
    each other's rank-1 match, mutual, and sit at the TOP of the margin
    ordering — the hubness correction must not displace a true pair on
    a clean fixture."""
    from ipydataclean_spark.operators.llm_extra import l58_bitext_margin_mining

    def vec(axis, dim=16):
        # shared base + one unique axis: every cross pair has the SAME
        # background cosine, so the only margin signal is the plant
        v = [1.0] * dim
        v[axis] += 0.3 * dim**0.5
        return [float(x) for x in v]

    en = [(i, vec(i)) for i in range(5)]
    de = [(10 + i, vec(5 + i)) for i in range(5)]
    # planted pair: en 0 and de 10 share (almost) the same vector
    de[0] = (10, [x + 0.001 for x in vec(0)])
    docs = [(i, f"en doc {i}", "en", "t", 8) for i, _ in en] + [
        (i, f"de doc {i}", "de", "t", 8) for i, _ in de
    ]
    d = str(tmp_path / "mini58")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [(i, v, 0) for i, v in en + de],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{d}/embeddings.parquet")

    rows = l58_bitext_margin_mining(spark, d).collect()
    assert len(rows) == 5 and len({r.src_id for r in rows}) == 5
    top = rows[0]
    assert (top.src_id, top.tgt_id, top.mutual) == (0, 10, 1)
    assert top.cos_sim > 0.999
    assert top.margin > max(r.margin for r in rows[1:])


def test_l58_fixture_invariants(spark, sf_dir):
    """One forward match per en doc; mutual is 0/1 with at least one
    mutual pair; margin descends; every tgt is a de doc."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["l58_bitext_margin_mining"]["fn"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb_ids = {r.vec_id for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()}
    n_en = docs.where("lang = 'en'").where(docs.doc_id.isin(emb_ids)).count()
    de_ids = {r.doc_id for r in docs.where("lang = 'de'").collect()}
    assert len(rows) == n_en == len({r.src_id for r in rows})
    assert all(r.tgt_id in de_ids for r in rows)
    assert all(r.mutual in (0, 1) for r in rows)
    assert any(r.mutual == 1 for r in rows), "no mutual pairs on fixture"
    margins = [r.margin for r in rows]
    assert margins == sorted(margins, reverse=True)


def test_d21_planted_label_error_is_the_only_flag(spark, tmp_path):
    """Three tight, well-separated label clusters plus ONE vector with a
    deliberately wrong label: the detector must flag exactly the planted
    error (majority = its cluster's true label, n_agree 0) and clear
    every clean vector with n_agree 5."""
    from ipydataclean_spark.operators.llm_extra import d21_knn_label_noise

    rows = []
    for c in range(3):  # clusters on orthogonal axes, tiny jitter
        for j in range(8):
            v = [0.0] * 9
            v[3 * c] = 1.0
            v[3 * c + 1] = 0.01 * j
            vid = (c * 8 + j) * 10  # all ids % 10 == 0 -> all audited
            label = 9 if (c == 0 and j == 0) else c  # planted error at id 0
            rows.append((vid, [float(x) for x in v], label))
    d = str(tmp_path / "mini21")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")

    out = {r.vec_id: r for r in d21_knn_label_noise(spark, d).collect()}
    assert len(out) == 24
    planted = out[0]
    assert planted.flagged == 1 and planted.majority_label == 0 and planted.n_agree == 0
    for vid, r in out.items():
        if vid == 0:
            continue
        # neighbors of cluster-0 members include the mislabeled one
        assert r.flagged == 0, (vid, r)
        assert r.majority_label == r.label
        assert r.n_agree >= 4


def test_d21_fixture_invariants(spark, sf_dir):
    """Report invariants on the real fixture: the audit slice is exactly
    vec_id % 10 == 0, n_agree within [0, k], and the flag is literally
    (label != majority_label)."""
    from ipydataclean_spark.operators.llm_extra import _D21_K
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["d21_knn_label_noise"]["fn"](spark, sf_dir).collect()
    expected = {
        r.vec_id
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        if r.vec_id % 10 == 0
    }
    assert {r.vec_id for r in rows} == expected
    for r in rows:
        assert 0 <= r.n_agree <= _D21_K
        assert r.flagged == int(r.label != r.majority_label)


def test_d22_pairs_equal_l4_and_conflict_flag_consistent(spark, sf_dir):
    """d22's kernel threshold mode must reproduce l4_sim_join_exact's
    pair set EXACTLY (two independent implementations of the same
    τ-join: in-plan fold cross join vs vectorized kernel), and the
    conflict flag must be literally (label_a != label_b), with both
    flag values present on the fixture."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    d22 = QUERIES["d22_neardup_label_conflict"]["fn"](spark, sf_dir).collect()
    l4 = QUERIES["l4_sim_join_exact"]["fn"](spark, sf_dir).collect()
    assert {(r.vec_a, r.vec_b, r.cos_sim) for r in d22} == {
        (r.vec_a, r.vec_b, r.cos_sim) for r in l4
    }
    assert d22
    for r in d22:
        assert r.conflict == int(r.label_a != r.label_b)
    assert any(r.conflict for r in d22), "no conflicting near-dups on fixture"


def test_d23_planted_isolate_is_top_outlier(spark, tmp_path):
    """Three tight clusters plus one vector orthogonal to everything:
    the isolate must rank as the single top outlier, and every
    clustered vector's knn_mean_cos must sit far above it."""
    from ipydataclean_spark.operators.llm_extra import d23_embedding_outliers

    rows = []
    for c in range(3):
        for j in range(8):
            v = [0.0] * 10
            v[3 * c] = 1.0
            v[3 * c + 1] = 0.01 * j
            rows.append((c * 8 + j, [float(x) for x in v], c))
    iso = [0.0] * 10
    iso[9] = 1.0
    rows.append((99, [float(x) for x in iso], 7))
    d = str(tmp_path / "mini23")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")

    out = d23_embedding_outliers(spark, d).collect()
    assert out[0].vec_id == 99 and out[0].label == 7
    assert out[0].outlier_score > 0.9
    assert all(r.outlier_score < 0.2 for r in out[1:])
    for r in out:
        assert abs(r.outlier_score - (1.0 - r.knn_mean_cos)) < 1e-15


def test_l64_split_has_zero_pair_leakage_where_naive_leaks(spark, sf_dir):
    """The cluster-aware split must put every cosine-τ pair on ONE
    side (zero crossings); the naive per-doc md5 coin on the same
    fixture crosses at least one pair — the measured reason the
    operator exists. Cluster labels must agree pairwise with d22's
    independently-computed pair set."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    split = {r.vec_id: r for r in QUERIES["l64_leakage_free_split"]["fn"](spark, sf_dir).collect()}
    pairs = [
        (r.vec_a, r.vec_b)
        for r in QUERIES["d22_neardup_label_conflict"]["fn"](spark, sf_dir).collect()
    ]
    assert pairs
    for a, b in pairs:
        assert split[a].cluster_id == split[b].cluster_id, (a, b)
        assert split[a].split == split[b].split, (a, b)

    import hashlib

    thr = int(0.2 * (1 << 24))
    naive = lambda x: int(hashlib.md5(f"l64:{x}".encode()).hexdigest()[:6], 16) < thr  # noqa: E731
    assert any(naive(a) != naive(b) for a, b in pairs), (
        "naive split leaks nothing on this fixture — pin vacuous"
    )
    assert {r.split for r in split.values()} == {"train", "test"}
    frac = sum(1 for r in split.values() if r.split == "test") / len(split)
    assert 0.05 < frac < 0.45, frac


def test_pipeline_embedding_curation_funnel_consistent(spark, sf_dir):
    """Funnel invariants: monotone attrition per label through outlier
    cut and dedup, sampled <= after_dedup, train+test == sampled, and
    the outlier stage drops exactly ceil(n/100) rows overall. (The
    stage-3 exact-balance property is carried by the driver's oracle
    hash — the twin recomputes the quota draw value-for-value — and by
    the standalone l60 test; this pin covers the funnel accounting.)"""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["pipeline_embedding_curation"]["fn"](spark, sf_dir).collect()
    assert len(rows) >= 5
    import math

    n_raw = sum(r.n_raw for r in rows)
    n_s1 = sum(r.n_after_outlier for r in rows)
    assert n_raw - n_s1 == math.ceil(n_raw / 100.0)
    for r in rows:
        assert r.n_raw >= r.n_after_outlier >= r.n_after_dedup >= 0
        assert r.n_sampled <= r.n_after_dedup
        assert r.n_train + r.n_test == r.n_sampled
    assert sum(r.n_after_dedup for r in rows) < n_s1, "dedup stage vacuous"
    assert sum(r.n_test for r in rows) > 0


def test_topk_kernel_rejects_zero_norm_embeddings(spark):
    """A zero-norm vector makes cosine NaN, where the kernel's NaN
    exclusion would silently diverge from the oracle's NaN-greatest
    ordering — the contract is to fail loud on both sides of the
    join (review r09c)."""
    import pytest

    from ipydataclean_spark.functions.knn import topk_per_row_exact

    good = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5])], "id long, emb array<float>"
    )
    bad = spark.createDataFrame(
        [(3, [0.0, 0.0])], "id long, emb array<float>"
    )
    with pytest.raises(ValueError, match="zero-norm"):
        topk_per_row_exact(good, good.unionByName(bad), 2)
    with pytest.raises(Exception, match="zero-norm"):
        # part-side guard raises inside the worker kernel
        topk_per_row_exact(good.unionByName(bad), good, 2).collect()


def test_inc7_classifies_delta_against_history_only(spark, sf_dir):
    """The delta report covers exactly the vec_id % 4 == 3 slice, best
    matches point INTO the history slice, both statuses appear on the
    fixture, and the status is literally (best_cos >= SIM_TAU). A dup's
    kNN-mean must include its near-copy (mean >= best/k lower bound)."""
    from ipydataclean_spark.operators.llm import SIM_TAU
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["inc7_incremental_embedding"]["fn"](spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    delta = {r.vec_id for r in emb if r.vec_id % 4 == 3}
    hist = {r.vec_id for r in emb if r.vec_id % 4 < 3}
    assert {r.vec_id for r in rows} == delta
    statuses = {r.status for r in rows}
    assert statuses == {"dup_of_history", "novel"}
    from ipydataclean_spark.operators.incremental import _INC7_K

    for r in rows:
        assert r.best_hist_id in hist
        # the mean includes best as one of its k terms, so it is
        # bounded below by best/k minus the other terms' worst case;
        # with cosines in [-1, 1]: mean >= (best - (k-1)) / k
        assert r.knn_mean_cos >= (r.best_cos - (_INC7_K - 1)) / _INC7_K - 1e-9
        assert r.best_cos >= r.knn_mean_cos
        assert r.status == (
            "dup_of_history" if r.best_cos >= SIM_TAU else "novel"
        )


def test_d24_names_the_leak_and_the_fix(spark, sf_dir):
    """The audit's two rows must agree with the d22 pair count, show
    ZERO crossings for the cluster split, a NONZERO crossing count for
    the doc split on this fixture, and a consistent fraction."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = {r.method: r for r in QUERIES["d24_split_leakage"]["fn"](spark, sf_dir).collect()}
    assert set(rows) == {"cluster_hash", "doc_hash"}
    n_pairs = QUERIES["d22_neardup_label_conflict"]["fn"](spark, sf_dir).count()
    for r in rows.values():
        assert r.n_pairs == n_pairs
        assert r.crossing_frac == r.n_crossing / r.n_pairs
    assert rows["cluster_hash"].n_crossing == 0
    assert rows["doc_hash"].n_crossing > 0
