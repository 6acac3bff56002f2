"""Generate the committed golden result set (FIXTURES.md expected-output
format): ~50 seeded queries over the deterministic F1-small corpus, answered
by the pure-pandas oracle (M0). Committed as tests/golden/golden_results.csv
and treated as immutable unless the oracle kernel changes with a cited
justification."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from lucene_7_x_9_x_spark import oracle
from lucene_7_x_9_x_spark.plans.query import (BooleanQuery, Occur,
                                              PhraseQuery, TermQuery)
from tests.test_search import _random_corpus

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")


def queries(rng, hot, tail):
    out = []
    for qi in range(50):
        kind = qi % 5
        pick = lambda n: [hot[rng.randint(len(hot))] if rng.rand() < 0.7
                          else tail[rng.randint(len(tail))] for _ in range(n)]
        if kind == 0:
            q = TermQuery(pick(1)[0])
            desc = f"term:{q.term}"
        elif kind == 1:
            ts = pick(3)
            q = BooleanQuery([(Occur.SHOULD, TermQuery(t, boost=float(b)))
                              for t, b in zip(ts, [1, 2, 3])])
            desc = "disj:" + ",".join(ts)
        elif kind == 2:
            ts = pick(2)
            q = BooleanQuery([(Occur.MUST, TermQuery(t)) for t in ts])
            desc = "conj:" + ",".join(ts)
        elif kind == 3:
            ts = pick(4)
            q = BooleanQuery([(Occur.SHOULD, TermQuery(t)) for t in ts],
                             minimum_should_match=2)
            desc = "msm2:" + ",".join(ts)
        else:
            ts = pick(2)
            q = BooleanQuery([(Occur.SHOULD, TermQuery(ts[0])),
                              (Occur.MUST_NOT, TermQuery(ts[1]))])
            desc = f"not:{ts[0]}-{ts[1]}"
        out.append((f"q{qi:03d}", desc, q))
    return out


def main():
    rng = np.random.RandomState(20240816)
    corpus = _random_corpus(rng, n_docs=1000)
    eng = oracle.OracleEngine(*oracle.index_corpus(
        corpus.sort_values("id").reset_index(drop=True), text_col="content"))
    hot = [f"h{i}" for i in range(12)]
    tail = [f"t{i:04d}" for i in range(300)]
    rows = []
    for qid, desc, q in queries(rng, hot, tail):
        for k in (1, 10):
            res = eng.search(q, k)
            for r in res.itertuples():
                rows.append({"qid": qid, "k": k, "desc": desc,
                             "rank": r.rank, "docid": r.docid,
                             # float32 score serialized exactly via repr of
                             # the underlying bits
                             "score_bits": np.float32(r.score).view(
                                 np.int32)})
    os.makedirs(OUT, exist_ok=True)
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(OUT, "golden_results.csv"), index=False)
    corpus.to_parquet(os.path.join(OUT, "golden_corpus.parquet"), index=False)
    print(f"wrote {len(df)} golden rows for {df.qid.nunique()} queries")


if __name__ == "__main__":
    main()
