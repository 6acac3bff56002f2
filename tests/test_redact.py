"""PII redaction: masks and counts against hand fixtures, sequential
rule semantics (a card is never double-counted as a phone), and
tri-runtime parity — Python re applying the SAME PII_RULES reproduces
the Spark output exactly (the patterns live in the Java∩RE2∩re subset)."""

import re

from lucene_7_x_9_x_spark.pipeline.redact import PII_RULES, redact_pii


def _py_redact(text):
    counts = {}
    for name, pat, repl in PII_RULES:
        counts[f"n_{name}"] = len(re.findall(pat, text))
        text = re.sub(pat, repl, text)
    return text, counts


def _run(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    out = redact_pii(df, "doc_id", "text").toPandas()
    return {int(r.doc_id): r for r in out.itertuples()}


def test_masks_and_counts(spark):
    rows = _run(spark, [
        "mail bob.smith+x@corp.example.org now",
        "server at 192.168.0.1 and 10.0.0.255 up",
        "ssn 123-45-6789 leaked",
        "card 4111 1111 1111 1111 charged",
        "call +321 555-0042 today",
        "clean text, nothing here",
    ])
    assert rows[0].redacted == "mail <EMAIL> now" and rows[0].n_email == 1
    assert rows[1].redacted == "server at <IP> and <IP> up"
    assert rows[1].n_ipv4 == 2
    assert rows[2].redacted == "ssn <SSN> leaked" and rows[2].n_ssn == 1
    assert rows[3].redacted == "card <CARD> charged" and rows[3].n_card == 1
    assert rows[4].redacted == "call +<PHONE> today"
    assert rows[4].n_phone == 1
    r5 = rows[5]
    assert r5.redacted == "clean text, nothing here"
    assert (r5.n_email, r5.n_ipv4, r5.n_ssn, r5.n_card, r5.n_phone) \
        == (0, 0, 0, 0, 0)


def test_sequential_rules_no_double_count(spark):
    # the card rule runs first and consumes the digits, so the phone
    # rule sees only <CARD>
    r = _run(spark, ["pay 4111 1111 1111 1111 ok"])[0]
    assert r.n_card == 1 and r.n_phone == 0
    # an SSN is not also a phone
    r = _run(spark, ["id 987-65-4321 here"])[0]
    assert r.n_ssn == 1 and r.n_phone == 0


def test_python_re_parity(spark):
    texts = [
        "a@b.io 1.2.3.4 111-22-3333 4111 1111 1111 1111 +999 888-7777",
        "email x.y@z.co.uk, ip 255.255.255.255.",
        "nested a@b.c.d.ee and 007-12-3456!",
        "no pii at all",
        "half matches: 1.2.3 and 123-45-678 and 4111 1111 1111",
    ]
    rows = _run(spark, texts)
    for i, t in enumerate(texts):
        want_text, want_counts = _py_redact(t)
        got = rows[i]
        assert got.redacted == want_text, (i, got.redacted, want_text)
        for k, v in want_counts.items():
            assert getattr(got, k) == v, (i, k)
