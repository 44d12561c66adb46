"""PII scrub: golden pairs, Python↔Java dialect parity fuzz, count audit."""

import random

from merchant_classification_spark.functions.pii import (
    pii_counts,
    scrub_pii,
    scrub_pii_text,
)

GOLDEN = [
    (
        "contact bob.smith+x@mail.example.co.uk today",
        "contact <EMAIL> today",
    ),
    (
        "see https://ex.ample/path?q=1&r=2 or www.plain.org/x",
        "see <URL> or <URL>",
    ),
    ("server at 10.0.255.3 down", "server at <IP> down"),
    ("pay 4111 1111 1111 1111 now", "pay <CARD> now"),
    ("call +44 20 7946 0958 pls", "call <PHONE> pls"),
    (
        "mail a@b.cc ip 1.2.3.4 card 4111-1111-1111-1111 url http://x.co/y",
        "mail <EMAIL> ip <IP> card <CARD> url <URL>",
    ),
    ("no pii here at all", "no pii here at all"),
    ("", ""),
]


def test_golden_pairs_python():
    for raw, want in GOLDEN:
        assert scrub_pii_text(raw) == want, raw


def test_golden_pairs_spark(spark):
    df = spark.createDataFrame([(r,) for r, _ in GOLDEN], ["t"])
    got = [r.s for r in df.select(scrub_pii("t").alias("s")).collect()]
    assert got == [w for _, w in GOLDEN]


def _fuzz_corpus(n=400, seed=77):
    """Adversarial token soup: PII fragments, truncated PII, separators."""
    rng = random.Random(seed)
    tokens = [
        "a@b.cc", "x@", "@y.z", "user.name+tag@host-1.example.org",
        "https://a.b/c?d=e", "http://", "www.", "www.x.y/z%20q",
        "1.2.3.4", "999.999.999.999", "10.0.0", "1.2.3.4.5",
        "4111111111111111", "4111 1111 1111", "4111-1111-1111-1111",
        "+44 20 7946 0958", "555 123 4567", "12 34", "(020) 7946 0958",
        "plain", "words", "2024-01-01", "12:30", "100%", "a-b", "..", "-",
        "(", ")", "+", "@",
    ]
    out = []
    for _ in range(n):
        k = rng.randint(1, 10)
        out.append(" ".join(rng.choice(tokens) for _ in range(k)))
    return out


def test_dialect_parity_fuzz(spark):
    corpus = [o for o, _ in GOLDEN] + _fuzz_corpus()
    df = spark.createDataFrame([(s,) for s in corpus], ["t"])
    got = [r.s for r in df.select(scrub_pii("t").alias("s")).collect()]
    expected = [scrub_pii_text(s) for s in corpus]
    mismatches = [
        (s, e, g) for s, e, g in zip(corpus, expected, got) if e != g
    ]
    assert not mismatches, (
        f"{len(mismatches)} dialect mismatches, first: {mismatches[:3]}"
    )


def test_counts(spark):
    raw = "a@b.cc and c@d.ee via https://x.io from 1.2.3.4 call 555 123 4567"
    df = spark.createDataFrame([(raw,)], ["t"])
    row = df.select(pii_counts("t").alias("c")).select("c.*").first()
    assert (row.url, row.email, row.ip, row.card, row.phone) == (1, 2, 1, 0, 1)
