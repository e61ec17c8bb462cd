"""BM25 ranking (operators/search.py) and deterministic stratified
sampling (operators/sampling.py)."""

import math

import pytest

from nci_seronet_proc_data_validator_spark.operators.sampling import (
    stratified_sample,
)
from nci_seronet_proc_data_validator_spark.operators.search import bm25_topk


def test_bm25_scores_exact(spark):
    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat dog dog"), (3, "bird bird bird")],
        "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in bm25_topk(docs, ["cat"]).collect()}
    assert set(out) == {1, 2}            # doc 3 has no query terms
    assert out[1]["rank"] == 1 and out[2]["rank"] == 2
    # N=3, df=2, dl=avgdl=3 -> idf=ln(1.6); k1=1.2, b=0.75
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    s1 = idf * 2 * 2.2 / (2 + 1.2)       # tf=2
    s2 = idf * 1 * 2.2 / (1 + 1.2)       # tf=1
    assert out[1]["score6"] == pytest.approx(s1, abs=1e-6)
    assert out[2]["score6"] == pytest.approx(s2, abs=1e-6)


def test_bm25_rare_term_outweighs_common(spark):
    # 'rare' appears in 1 of 20 docs, 'common' in all 20: the rare-term
    # doc must outrank docs with only the common term.
    rows = [(i, "common filler words here") for i in range(19)]
    rows.append((99, "rare common"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(docs, ["rare", "common"], top_n=3).collect()
    assert top[0]["doc_id"] == 99


def test_stratified_sample_deterministic_and_partition_invariant(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    rates, default = {"en": 0.5}, 0.1

    def ids(df):
        return sorted(r["doc_id"] for r in
                      stratified_sample(df, "lang", rates, default)
                      .collect())

    a = ids(docs)
    b = ids(docs.repartition(13, "lang"))
    assert a == b                        # layout-independent
    en = sum(1 for i in a if i % 2 == 0)
    de = len(a) - en
    # 500 candidates each; md5 buckets ~uniform
    assert 200 < en < 300
    assert 20 < de < 80


def test_mixture_sample_water_filling(spark):
    """Target-mixture sampling: the stratum scarcest relative to its
    share keeps 100% (threshold 10000 bp), others downsample so the
    kept corpus approximates the requested proportions; strata outside
    the mix drop entirely; integer thresholds are layout-invariant."""
    from nci_seronet_proc_data_validator_spark.operators.sampling import (
        mixture_sample)
    rows = ([(i, "en") for i in range(800)]
            + [(i, "de") for i in range(800, 1000)]
            + [(i, "zh") for i in range(1000, 1100)])
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    # want 50/50 en/de; de (200 docs vs 800 en) binds -> de keeps all,
    # en cut to bp = floor(lim*w/n) = floor(4000000*5000/800) ... exact:
    # lim = min(800*10000//5000, 200*10000//5000) = min(1600, 400) = 400
    # bp_en = 400*5000//800 = 2500; bp_de = 400*5000//200 = 10000
    out = mixture_sample(docs, "lang", {"en": 0.5, "de": 0.5}).collect()
    langs = {}
    for r in out:
        langs.setdefault(r["lang"], set()).add(r["doc_id"])
    assert "zh" not in langs                      # outside the mix
    assert len(langs["de"]) == 200                # binding stratum: all
    assert 150 < len(langs["en"]) < 250           # ~25% of 800
    # determinism across partition layouts
    again = mixture_sample(docs.repartition(7, "lang"), "lang",
                           {"en": 0.5, "de": 0.5}).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}


def test_mixture_sample_validates_shares(spark):
    from nci_seronet_proc_data_validator_spark.operators.sampling import (
        mixture_sample)
    docs = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    import pytest
    with pytest.raises(ValueError):
        mixture_sample(docs, "lang", {})
    with pytest.raises(ValueError):
        mixture_sample(docs, "lang", {"en": 0.0})


def test_temperature_sample_upweights_rare(spark):
    """sqrt-temperature flattening: the rarest stratum keeps 100%, and
    kept fractions order inversely to stratum frequency; weights are
    integer-exact floor(sqrt(n))."""
    from nci_seronet_proc_data_validator_spark.operators.sampling import (
        temperature_sample)
    rows = ([(i, "common") for i in range(400)]
            + [(i + 1000, "mid") for i in range(100)]
            + [(i + 2000, "rare") for i in range(16)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(df, "lang").groupBy("lang").count().collect()
    k = {r["lang"]: r["count"] for r in kept}
    # binding stratum: min over n*BP/floor(sqrt n) -> rare (16*1e4/4)
    assert k["rare"] == 16  # 100% of the rarest
    frac = {g: k.get(g, 0) / n
            for g, n in (("common", 400), ("mid", 100), ("rare", 16))}
    assert frac["rare"] == 1.0
    assert frac["mid"] > frac["common"]  # flattening, not proportional
    # determinism: partition layout does not change the sample
    k2 = {r["lang"]: r["count"]
          for r in temperature_sample(df.repartition(13), "lang")
          .groupBy("lang").count().collect()}
    assert k == k2


def test_temperature_sample_rarest_kept_when_w_not_divides(spark):
    """ADVICE round 3: with n=10, w=floor(sqrt(10))=3, w does not divide
    n*BP — floor water-fill gave bp=BP-1 and silently dropped ~1bp of
    the binding stratum. Ceiling division must keep ALL of it."""
    from nci_seronet_proc_data_validator_spark.operators.sampling import (
        temperature_sample)
    # doc_id 11064 hashes to bucket 9999 under the 's:' salt — the one
    # row a bp=9999 cut would drop; it must survive.
    rows = ([(i, "common") for i in range(900)]
            + [(i + 5000, "rare") for i in range(9)] + [(11064, "rare")])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    k = {r["lang"]: r["count"] for r in
         temperature_sample(df, "lang").groupBy("lang").count().collect()}
    assert k["rare"] == 10  # exactly 100%, not "~100% minus 1bp"


def test_rrf_fuse_exact_fractions_and_consensus(spark):
    """RRF: consensus doc beats any single-channel #1; scores equal the
    hand-computed Σ 1/(60+rank) via the exact common-denominator path."""
    import math

    from nci_seronet_proc_data_validator_spark.operators.search import (
        rrf_fuse)
    mk = lambda rows: spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rank int")
    # doc 7 is rank 2 everywhere; docs 1/2/3 top one channel each
    r1 = mk([(0, 1, 1), (0, 7, 2), (0, 4, 3)])
    r2 = mk([(0, 2, 1), (0, 7, 2), (0, 5, 3)])
    r3 = mk([(0, 3, 1), (0, 7, 2), (0, 6, 3)])
    got = {r["neighbor_id"]: (r["rrf6"], r["rank"])
           for r in rrf_fuse([r1, r2, r3], top_k=10).collect()}
    assert got[7][1] == 1                      # consensus wins
    assert got[7][0] == round(3 / 62, 6)
    assert got[1][0] == round(1 / 61, 6)
    lcm = math.lcm(*range(61, 71))
    assert got[7][0] == round((3 * (lcm // 62)) / lcm, 6)
    # single-channel docs tie on score; ties break by id
    assert [got[i][1] for i in (1, 2, 3)] == [2, 3, 4]
