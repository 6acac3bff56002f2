"""MemoryIndex — single-document in-memory index for query matching
and scoring (the lucene/memory module; demos
LuceneDemo/src/main/java/SearchWithMemoryIndex.java and
util/index/MemoryIndexTest.java).

The reference use case: one ephemeral document, many queries — "does
this doc match, and with what score" without touching a Directory.
This engine already has exactly that machinery driver-side (the oracle's
InMemoryReader is what percolation builds per batch); MemoryIndex is the
public single-document wrapper with the reference API shape:
addField → search returns the doc's score (0.0 when it doesn't match,
like MemoryIndex.search(Query)).

Deliberately driver-side and Spark-free: a one-doc index is the one
place distribution has nothing to offer. The distributed counterpart
for doc-streams-vs-query-sets is streaming/monitor.percolate, which
runs this same machinery per input partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.analysis import AnalyzerConfig
from ..oracle import index_corpus
from ..operators.executor import evaluate
from ..plans.query import Query


class MemoryIndex:
    """One document, many fields; rebuilt lazily on mutation.

    >>> mi = MemoryIndex()
    >>> mi.add_field("content", "quick brown fox")
    >>> mi.score(TermQuery("fox", field="content")) > 0
    True
    """

    def __init__(self, analyzer: AnalyzerConfig | None = None,
                 field_analyzers: dict | None = None,
                 similarity: str = "bm25"):
        self._analyzer = analyzer
        self._field_analyzers = field_analyzers
        self._similarity = similarity
        self._fields: dict[str, str] = {}
        self._built = None

    def add_field(self, name: str, text: str) -> "MemoryIndex":
        """MemoryIndex.addField — repeated adds to the same field append
        (the reference concatenates token streams; position increments
        continue across adds)."""
        if name in self._fields:
            self._fields[name] = self._fields[name] + " " + text
        else:
            self._fields[name] = text
        self._built = None
        return self

    def reset(self) -> None:
        """MemoryIndex.reset — reuse the instance for the next doc."""
        self._fields.clear()
        self._built = None

    def _build(self):
        if self._built is None:
            if not self._fields:
                raise ValueError("MemoryIndex has no fields")
            names = sorted(self._fields)
            # every field is a NAMED field; the first added one doubles
            # as the default (bare-term queries hit it), matching the
            # engine-wide "default field" convention
            pdf = pd.DataFrame({n: [self._fields[n]] for n in names})
            default = next(iter(self._fields))
            reader, stats = index_corpus(
                pdf, text_col=default, cfg=self._analyzer,
                similarity=self._similarity,
                extra_fields=[(n, n) for n in names],
                field_analyzers=self._field_analyzers)
            self._built = (reader, stats)
        return self._built

    def score(self, q: Query) -> float:
        """MemoryIndex.search(Query): the single doc's score, 0.0 when
        it does not match. Scores are float32, identical to what the
        full engine gives the same one-doc segment."""
        reader, stats = self._build()
        m = evaluate(reader, stats, q)
        if len(m.docids) == 0:
            return 0.0
        return float(np.float32(m.scores[0]))

    def matches(self, q: Query) -> bool:
        reader, stats = self._build()
        return len(evaluate(reader, stats, q,
                            needs_scores=False).docids) > 0
