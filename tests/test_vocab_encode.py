"""Vocabulary build + token-id encoding (operators/training.py) — the
text→training-tokens step. Oracle-checked in-test (DuckDB); pytest-only
(driver registry capped at 50, COVERAGE.md)."""

import duckdb
import pytest

from nci_seronet_proc_data_validator_spark.operators.training import (
    build_vocab,
    vocab_encode,
    vocab_encode_oracle_sql,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_vocab_encode_matches_duckdb(spark, docs):
    vocab = build_vocab(docs, n=10)
    got = (vocab_encode(docs, vocab).orderBy("doc_id").toPandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    want = (con.execute(vocab_encode_oracle_sql(10))
            .fetchdf().sort_values("doc_id").reset_index(drop=True))
    assert len(got) == len(want) > 0
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    assert got["n_unk"].tolist() == want["n_unk"].tolist()
    assert [list(x) for x in got["token_ids"]] == \
           [list(x) for x in want["token_ids"]]
    # a 10-token vocab must leave some tokens unknown
    assert got["n_unk"].sum() > 0


def test_vocab_encode_semantics(spark):
    rows = [(1, "the cat the cat dog"), (2, "zebra the"), (3, "!!!")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = build_vocab(df, n=2)   # 'the' (3) -> id 1, 'cat' (2) -> id 2
    v = {r["token"]: r["token_id"] for r in vocab.collect()}
    assert v == {"the": 1, "cat": 2}
    enc = {r["doc_id"]: r for r in vocab_encode(df, vocab).collect()}
    assert enc[1]["token_ids"] == [1, 2, 1, 2, 0]     # dog -> unk
    assert enc[1]["n_tokens"] == 5 and enc[1]["n_unk"] == 1
    assert enc[2]["token_ids"] == [0, 1]              # zebra -> unk
    # punctuation-only doc survives as an empty encoding (pack_sequences
    # keeps n_tok=0 docs; a join must not lose them)
    assert enc[3]["token_ids"] == [] and enc[3]["n_tokens"] == 0
    plan = (vocab_encode(df, vocab)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_precomputed_hooks_match_self_tokenized_paths(spark):
    """The r13 shared-aggregate hooks (build_vocab(tok_counts=...),
    vocab_encode(toks=...)) must be value-identical to the functions'
    own tokenize scans — q_vocab_pipeline feeds both from one persisted
    aggregate, so a drift here silently corrupts the whole pipeline."""
    from pyspark.sql import functions as F

    from nci_seronet_proc_data_validator_spark.operators.dedup import (
        tokens as _tokens)

    rows = [(1, "the cat the cat dog"), (2, "zebra the zebra"), (3, "!!!")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = df.select(
        F.col("doc_id"), F.posexplode(_tokens("text")).alias("pos", "token"))
    tok_counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"))   # extra col: ignored

    plain_vocab = build_vocab(df, n=3)
    hook_vocab = build_vocab(df, n=3, tok_counts=tok_counts)
    as_set = lambda v: {tuple(r) for r in
                        v.select("token", "n_occ", "token_id").collect()}
    assert as_set(plain_vocab) == as_set(hook_vocab)

    enc = lambda d: {r["doc_id"]: (list(r["token_ids"]), r["n_tokens"],
                                   r["n_unk"]) for r in d.collect()}
    assert enc(vocab_encode(df, plain_vocab)) == \
        enc(vocab_encode(df, plain_vocab, toks=toks))
