"""BPE merge training — classic-corpus merges, greedy-overlap semantics,
DuckDB oracle parity."""

import duckdb
import pytest

from nci_seronet_proc_data_validator_spark.operators.bpe import (
    bpe_train,
    bpe_train_oracle_sql,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_classic_merges(spark):
    out = [tuple(r) for r in bpe_train(
        _docs(spark, ["low low low lower lower lowest",
                      "new newer newest wide wider"]),
        n_merges=4).collect()]
    # 'lo' (6: three lows + two lowers + lowest), then 'low' (6),
    # then 'er' (4: lower x2, newer, wider), then 'er</w>' (4)
    assert out == [(1, "l", "o", "lo", 6), (2, "lo", "w", "low", 6),
                   (3, "e", "r", "er", 4), (4, "er", "</w>", "er</w>", 4)]


def test_overlapping_pairs_merge_greedily(spark):
    # 'aaaa': pairs (a,a) x3 -> greedy leftmost merge gives 'aa aa',
    # weight counts ALL adjacent occurrences (3) like classic BPE
    out = [tuple(r) for r in bpe_train(_docs(spark, ["aaaa"]),
                                       n_merges=2).collect()]
    assert out[0] == (1, "a", "a", "aa", 3)
    # after round 1 the word is 'aa aa </w>' (classic greedy, NOT the
    # under-merged 'aa a a'); round-2 candidates (aa,aa) and (aa,</w>)
    # tie at 1 and '<' sorts before 'a', so (aa,</w>) wins
    assert out[1][1:4] == ("aa", "</w>", "aa</w>")


def test_matches_duckdb_oracle(spark, sf_dir):
    from nci_seronet_proc_data_validator_spark.sources.readers import (
        read_table,
    )
    docs = read_table(spark, sf_dir, "documents")
    got = [tuple(r) for r in bpe_train(docs, n_merges=6)
           .orderBy("step").collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = [tuple(r) for r in
            con.execute(bpe_train_oracle_sql(n_merges=6)).fetchall()]
    assert got == want
    assert len(got) == 6


def test_validates_args(spark):
    with pytest.raises(ValueError):
        bpe_train(_docs(spark, ["x"]), n_merges=0)


# ---- property: engine output == a naive reference BPE trainer ----------

def _naive_bpe(texts, n_merges):
    """Classic BPE (Sennrich alg. 1) on lowercase [a-z]+ words:
    overlap-counted pair frequencies, greedy leftmost non-overlapping
    merge, ties on the pair string ascending."""
    import re
    from collections import Counter
    words = Counter(w for t in texts for w in re.findall(r"[a-z]+",
                                                         t.lower()))
    seqs = {w: [*w, "</w>"] for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        counts = Counter()
        for w, freq in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += freq
        if not counts:
            break
        top = min(counts.items(), key=lambda kv: (-kv[1],
                                                  f"{kv[0][0]} {kv[0][1]}"))
        (a, b), cnt = top
        merges.append((step, a, b, a + b, cnt))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def test_property_matches_naive_reference(spark):
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=5)
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    # 5 examples ≈ 10 s of suite time; each example runs 4 full Spark
    # merge rounds, so examples are expensive and 5 random corpora plus
    # the deterministic unit tests above cover the merge-order contract
    @settings(max_examples=5, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=4))
    def check(texts):
        got = [tuple(r) for r in
               bpe_train(_docs(spark, texts), n_merges=4)
               .orderBy("step").collect()]
        assert got == _naive_bpe(texts, 4)

    check()


def test_window_crossing_matches_naive_reference(spark, monkeypatch):
    """Training past the materialization window crosses the r13 windowed
    boundary (persist swap, unpersist-after-successor ordering,
    replace-chain reset) — pin that the merges on the far side of the
    window are still the classic greedy sequence. The window is patched
    to 3 so a 10-merge run actually materializes (twice): the r14
    payback-horizon trigger only fires when a full window of later
    rounds remains, so at the default window of 8 a 10-merge run — like
    the registered 12-merge query — never materializes at all. The
    corpus is built so at least 10 distinct merges exist."""
    from nci_seronet_proc_data_validator_spark.operators import bpe as _bpe
    monkeypatch.setattr(_bpe, "_MATERIALIZE_EVERY", 3)
    texts = ["low low low lower lower lowest newest",
             "new newer newest wide wider widest",
             "deep deeper deepest steep steeper"]
    got = [tuple(r) for r in bpe_train(_docs(spark, texts), n_merges=10)
           .orderBy("step").collect()]
    want = _naive_bpe(texts, 10)
    assert got == want
    assert len(got) == 10            # the window must not truncate


def test_bench_scale_merge_count_never_materializes(spark):
    """The r14 payback-horizon contract: a 12-merge training (the
    registered query's scale) stays strictly on the un-materialized
    replace-chain plan — no mid-training persist, values unchanged."""
    from nci_seronet_proc_data_validator_spark.operators import bpe as _bpe
    texts = ["low low low lower lower lowest newest",
             "new newer newest wide wider widest",
             "deep deeper deepest steep steeper"]
    calls = []
    docs = _docs(spark, texts)
    # patch the CONCRETE class (pyspark.sql.classic overrides the base
    # pyspark.sql.DataFrame.persist, so patching the base intercepts
    # nothing)
    cls = type(docs)
    orig = cls.persist

    def counting(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    cls.persist = counting
    try:
        got = [tuple(r) for r in
               bpe_train(docs, n_merges=12)
               .orderBy("step").collect()]
    finally:
        cls.persist = orig
    assert got == _naive_bpe(texts, 12)
    # exactly ONE persist: the word-frequency table itself — the windowed
    # mid-training materialization must not fire at 12 merges
    assert len(calls) == 1


def test_encode_applies_merges_in_order(spark):
    from nci_seronet_proc_data_validator_spark.operators.bpe import (
        bpe_encode,
    )
    docs = _docs(spark, ["low lower"])
    # hand model: merge (l,o) then (lo,w) -> 'low' = [low </w>],
    # 'lower' = [low e r </w>]
    out = {r["doc_id"]: (r["n_bpe_tokens"], r["seq_hash"])
           for r in bpe_encode(docs, [("l", "o"), ("lo", "w")]).collect()}
    import hashlib
    exp = "low </w> low e r </w>"
    assert out[0] == (6, hashlib.md5(exp.encode()).hexdigest())


def test_encode_empty_model_is_chars(spark):
    from nci_seronet_proc_data_validator_spark.operators.bpe import (
        bpe_encode,
    )
    out = bpe_encode(_docs(spark, ["ab"]), []).collect()[0]
    assert out["n_bpe_tokens"] == 3              # a, b, </w>
