"""Connected components over near-dup pairs (large-star/small-star).

The dedup last mile: pair lists -> transitive clusters -> one kept
representative. Verified against a driver-side union-find on random
graphs (including long chains, which need the O(log^2 n) contraction
to converge — a one-hop min-propagation would not).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.pipeline.dedup import (connected_components,
                                                 neardup_clusters)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _check(spark, pairs):
    pdf = pd.DataFrame(pairs, columns=["id_a", "id_b"])
    got = {r["id"]: r["component"]
           for r in connected_components(
               spark.createDataFrame(pdf)).collect()}
    assert got == _union_find(pairs)


def test_cc_random_graphs(spark):
    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 120
        m = [30, 100, 250][trial]
        pairs = [(int(a), int(b)) for a, b in rng.randint(0, n, (m, 2))
                 if a != b]
        _check(spark, pairs)


def test_cc_long_chain(spark):
    # a 64-node path: worst case for propagation depth
    _check(spark, [(i, i + 1) for i in range(63)])
    # two chains meeting at their high ends
    _check(spark, [(i, i + 1) for i in range(20)]
           + [(100 + i, 101 + i) for i in range(20)] + [(20, 120)])


def test_cc_duplicate_and_reversed_edges(spark):
    _check(spark, [(5, 9), (9, 5), (5, 9), (9, 30), (2, 1)])


def test_neardup_clusters_representatives(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(10))}))
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2, 7], "id_b": [2, 4, 8]}))
    out = neardup_clusters(docs, pairs, "doc_id").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    comp = dict(zip(out.doc_id, out.component))
    keep = dict(zip(out.doc_id, out.keep))
    # transitive cluster {1,2,4} -> min 1; {7,8} -> 7; rest singletons
    assert comp == {0: 0, 1: 1, 2: 1, 3: 3, 4: 1, 5: 5, 6: 6,
                    7: 7, 8: 7, 9: 9}
    assert [d for d in range(10) if keep[d]] == [0, 1, 3, 5, 6, 7, 9]
