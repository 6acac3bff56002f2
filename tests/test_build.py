"""M1 exit criterion (SURVEY.md §7.2): the Spark-built index reproduces the
oracle's postings exactly — decoded docids, freqs, positions, norms, stats —
on a deterministic corpus."""

import numpy as np
import pandas as pd
import pytest

from lucene_7_x_9_x_spark import oracle
from lucene_7_x_9_x_spark.functions import codec
from lucene_7_x_9_x_spark.index import build_index, verify_integrity


def _mk_corpus(n=300, seed=7):
    rng = np.random.RandomState(seed)
    vocab_hot = ["def", "return", "int", "for", "if", "self", "import"]
    vocab_tail = [f"fn_{i:03d}" for i in range(400)]
    rows = []
    for i in range(n):
        ln = int(rng.lognormal(3.0, 1.0)) + 1
        words = []
        for _ in range(ln):
            if rng.rand() < 0.6:
                words.append(vocab_hot[int(rng.zipf(2.0)) % len(vocab_hot)])
            else:
                words.append(vocab_tail[rng.randint(len(vocab_tail))])
        rows.append({
            "repo": f"repo-{i % 13:04d}",
            "path": f"src/mod_{i:05d}.py",
            "commit": f"{i:040x}",
            "lang": "py",
            "content": " ".join(words),
        })
    # one doc with punctuation + empty doc
    rows[0]["content"] = "def foo(self, x): return x+1  # comment!"
    rows[1]["content"] = ""
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = _mk_corpus()
    sdf = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("idx"))
    idx = build_index(spark, sdf, out, id_cols=["repo", "path", "commit"],
                      text_col="content", num_segments=4)
    return pdf, idx


def _decode_row(row):
    """Decode one postings row back to (docids, freqs)."""
    docids, freqs = [], []
    base = -1
    for buf, n, md in zip(row.block_docs, row.block_ns, row.block_max_docs):
        docids.append(codec.decode_doc_block(bytes(buf), int(n), base))
        base = int(md)
    for i, buf in enumerate(row.block_freqs):
        freqs.append(codec.decode_freq_block(bytes(buf), int(row.block_ns[i])))
    return (np.concatenate(docids) if docids else np.zeros(0, np.int64),
            np.concatenate(freqs) if freqs else np.zeros(0, np.int64))


def test_index_matches_oracle_postings(built, spark):
    pdf, idx = built
    post = idx.postings().toPandas()
    dm = idx.docmap().toPandas()

    # global docid -> (repo,path,commit) per segment; rebuild oracle per
    # segment from the same doc ordering
    for seg in sorted(dm.segment.unique()):
        seg_docs = dm[dm.segment == seg].sort_values("docid")
        seg_pdf = seg_docs.merge(pdf, on=["repo", "path", "commit"])
        assert list(seg_pdf.docid) == list(range(len(seg_pdf)))
        reader, _ = oracle.index_corpus(
            seg_pdf.reset_index(drop=True), text_col="content")
        seg_post = post[post.segment == seg]
        # every oracle term present with identical decoded postings
        oterms = set(reader.terms())
        assert set(seg_post.term) == oterms
        for row in seg_post.itertuples():
            od, of = reader.postings(row.term)
            dd, df_ = _decode_row(row)
            assert np.array_equal(dd, od), f"docids differ term={row.term}"
            assert np.array_equal(df_, of), f"freqs differ term={row.term}"
            assert row.doc_freq == len(od)
            assert row.total_term_freq == of.sum()
            # positions roundtrip
            pd_, pl = reader.positions(row.term)
            offs = np.asarray(row.pos_offsets)
            data = bytes(row.pos_data)
            for j in range(len(od)):
                got = codec.decode_positions(data[offs[j]:offs[j + 1]])
                assert np.array_equal(got, pl[j]), \
                    f"positions differ term={row.term} doc={od[j]}"
        # norms
        onorms = reader.norms()
        assert np.array_equal(
            seg_docs.sort_values("docid")["norm"].to_numpy() & 0xFF, onorms)


def test_global_stats_match_oracle(built, spark):
    pdf, idx = built
    reader, stats = oracle.index_corpus(pdf.sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True),
        text_col="content")
    assert idx.stats["doc_count"] == stats.doc_count
    assert idx.stats["sum_total_term_freq"] == stats.sum_total_term_freq
    assert idx.stats["max_doc"] == len(pdf)
    terms = idx.terms().toPandas().set_index("term")
    assert terms.doc_freq.to_dict() == stats.doc_freqs
    assert terms.total_term_freq.to_dict() == stats.total_term_freqs


def test_sha256_integrity(built, spark):
    pdf, idx = built
    sdf = spark.createDataFrame(pdf)
    assert verify_integrity(spark, idx, sdf, text_col="content") == 0
    # corrupt one doc -> exactly one mismatch
    pdf2 = pdf.copy()
    pdf2.loc[3, "content"] = pdf2.loc[3, "content"] + " tampered"
    assert verify_integrity(spark, idx, spark.createDataFrame(pdf2),
                            text_col="content") == 1


def test_deterministic_rebuild(built, spark, tmp_index_dir):
    """Same corpus, different input partitioning -> bit-identical postings
    (resume/rebuild determinism, north rule)."""
    pdf, idx = built
    sdf = spark.createDataFrame(pdf).repartition(11)
    idx2 = build_index(spark, sdf, tmp_index_dir,
                       id_cols=["repo", "path", "commit"],
                       text_col="content", num_segments=4)
    a = idx.postings().toPandas().sort_values(
        ["segment", "term"]).reset_index(drop=True)
    b = idx2.postings().toPandas().sort_values(
        ["segment", "term"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a.term == b.term).all() and (a.segment == b.segment).all()
    for ra, rb in zip(a.itertuples(), b.itertuples()):
        assert np.array_equal(_decode_row(ra)[0], _decode_row(rb)[0])
        assert np.array_equal(_decode_row(ra)[1], _decode_row(rb)[1])
