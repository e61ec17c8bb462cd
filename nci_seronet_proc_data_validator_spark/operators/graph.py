"""Connected components over a near-duplicate pair graph — turns pairwise
dedup output (MinHash LSH / n-gram Jaccard / embedding LSH) into cluster
assignments, the form a training-data pipeline actually consumes (keep one
doc per cluster).

Spark-first shape: iterative min-label propagation expressed as DataFrame
joins — each round is one keyed equi-join plus one keyed aggregation, both
shuffling on the node id, with AQE free to coalesce/skew-split. Rounds
needed = graph diameter, which for near-dup graphs is tiny (clusters are
dense cliques-ish; single digits in practice). The label frontier is
persisted per round and the lineage truncated with ``localCheckpoint``
every few rounds so a long run cannot accumulate an unbounded plan — the
standard alternating large-star/small-star optimization (Kiveris et al.)
drops in here if a workload ever shows high-diameter components.

Driver involvement per round is one ``count()`` of changed labels
(convergence test) — an aggregate scalar, not data collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 5


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """Cluster ids for every node appearing in ``pairs``.

    Returns ``(id, cluster_id)`` where ``cluster_id`` is the minimum node
    id in the component — a deterministic canonical representative.
    """
    e = pairs.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    # Eager checkpoint, not persist: the edge set is orders smaller than
    # the corpus that produced it, and truncating lineage here keeps every
    # iteration's plan at "two cached inputs + a join" — otherwise Catalyst
    # re-optimizes the full upstream (LSH) plan once per round, which at
    # any scale turns driver planning time into the per-round floor.
    e = (e.union(e.select(F.col("dst").alias("src"),
                          F.col("src").alias("dst")))
         .distinct().localCheckpoint())
    labels = (e.select(F.col("src").alias("id")).distinct()
              .withColumn("label", F.col("id")).persist())
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for it in range(max_iter):
        nbr_min = (e.join(labels.withColumnRenamed("id", "src"), "src")
                   .groupBy(F.col("dst").alias("id"))
                   .agg(F.min("label").alias("nbr_min")))
        new_labels = (labels.join(nbr_min, "id", "left")
                      .select("id",
                              F.least(F.col("label"),
                                      F.coalesce("nbr_min", "label"))
                              .alias("label")))
        # Path halving (pointer jumping): label <- label[label]. One more
        # keyed join per round, but convergence drops from O(diameter)
        # rounds to O(log diameter) — at cluster scale rounds are the
        # synchronization barriers, so fewer rounds beats leaner rounds.
        # Invariant label[x] <= x makes the shortcut monotone-safe.
        lab2 = new_labels.select(F.col("id").alias("lid"),
                                 F.col("label").alias("label2"))
        new_labels = (new_labels
                      .join(lab2, new_labels["label"] == lab2["lid"], "left")
                      .select("id",
                              F.least(F.col("label"),
                                      F.coalesce("label2", "label"))
                              .alias("label")))
        if (it + 1) % _CHECKPOINT_EVERY == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        # Convergence without a compare-join: labels only ever decrease,
        # so any change strictly lowers sum(label) — one scalar aggregate
        # per round (which also materializes the persisted frontier).
        new_sum = new_labels.agg(F.sum("label")).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    e.unpersist()
    return labels.select("id", F.col("label").alias("cluster_id"))


def keep_canonical(corpus: DataFrame, components: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """The dedup pipeline's terminal step: drop every clustered document
    except its canonical representative (``cluster_id`` — the component's
    min id). One broadcast-able anti-join against the (tiny) non-canonical
    id set; untouched documents pass through by construction."""
    losers = components.filter(
        F.col("id") != F.col("cluster_id")).select("id")
    return corpus.join(F.broadcast(losers),
                       corpus[id_col] == losers["id"], "left_anti")


def keep_canonical_oracle_sql(pairs_sql: str, corpus: str = "documents",
                              id_col: str = "doc_id") -> str:
    """Oracle for ``keep_canonical`` over ``connected_components`` of the
    pair graph produced by ``pairs_sql``."""
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach AS (
  SELECT src AS id, src AS root FROM edges
  UNION
  SELECT e.dst AS id, r.root AS root
  FROM reach r JOIN edges e ON e.src = r.id),
cc AS (SELECT id, min(root) AS cluster_id FROM reach GROUP BY id)
SELECT c.{id_col}, c.lang
FROM {corpus} c
WHERE c.{id_col} NOT IN (SELECT id FROM cc WHERE id <> cluster_id)
ORDER BY c.{id_col}
"""


def connected_components_oracle_sql(pairs_sql: str,
                                    id_alias: str = "doc_id") -> str:
    """Recursive-CTE oracle: min reachable node id per node over the
    symmetrized edge set produced by ``pairs_sql`` (any query emitting
    ``id_a``/``id_b``)."""
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach AS (
  SELECT src AS id, src AS root FROM edges
  UNION
  SELECT e.dst AS id, r.root AS root
  FROM reach r JOIN edges e ON e.src = r.id)
SELECT id AS {id_alias}, min(root) AS cluster_id
FROM reach GROUP BY id ORDER BY 1
"""
