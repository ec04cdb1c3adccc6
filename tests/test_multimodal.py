"""Exact-value checks for the multimodal fake-decode plumbing — the 16-bin
byte histogram is an ArrayType the driver canonicalizer can't compare, so the
registered query reduces it to hist_sum; the per-bin values are pinned here."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from petfinder_database_distributor_spark.operators.multimodal import (
    _fake_decode,
    attach_binary_payload,
    decode_features,
)


def test_fake_decode_reference_values():
    payload = "Hello, Spark! \x01\xff".encode("latin-1")
    w, h, nf, hist = _fake_decode(payload)
    n = len(payload)
    assert (w, h, nf) == (64 + n % 577, 64 + n % 433, 1 + n % 30)
    arr = np.frombuffer(payload, dtype=np.uint8)
    assert hist == np.bincount(arr >> 4, minlength=16).tolist()
    assert sum(hist) == n


def test_decode_features_matches_fake_decode(spark):
    texts = ["", "a", "Hello, Spark!", "x" * 300, "mixed 123 !?\n\ttext"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    payloads = attach_binary_payload(df, "doc_id", "text")
    got = {
        r["doc_id"]: r
        for r in decode_features(payloads, "doc_id", "payload").collect()
    }
    for i, t in enumerate(texts):
        w, h, nf, hist = _fake_decode(t.encode("utf-8"))
        row = got[i]
        assert (row["width"], row["height"], row["n_frames"]) == (w, h, nf)
        assert row["byte_histogram"] == hist


def test_hist_sum_equals_payload_bytes(spark):
    df = spark.createDataFrame(
        [(1, "some text"), (2, "more éü bytes")], "doc_id long, text string"
    )
    payloads = attach_binary_payload(df, "doc_id", "text")
    feats = decode_features(payloads, "doc_id", "payload").select(
        "doc_id",
        F.aggregate(
            "byte_histogram", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("hist_sum"),
    )
    joined = feats.join(payloads.select("doc_id", "n_bytes"), "doc_id")
    assert all(r["hist_sum"] == r["n_bytes"] for r in joined.collect())


def test_resize_sampled_histogram_values(spark):
    import numpy as np

    from petfinder_database_distributor_spark.operators.multimodal import (
        resize_payloads,
    )

    texts = ["abcdefghij" * 5, "x", "mixed 123 !?\n\ttext"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    payloads = attach_binary_payload(df, "doc_id", "text")
    got = {
        r["doc_id"]: r
        for r in resize_payloads(payloads, "doc_id", "payload", stride=4).collect()
    }
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        arr = np.frombuffer(raw, dtype=np.uint8)[::4] >> 4
        row = got[i]
        assert row["sampled_histogram"] == np.bincount(arr, minlength=16).tolist()
        assert row["n_sampled"] == -(-len(raw) // 4)
        assert row["out_width"] == min(64 + len(raw) % 577, 32)


def _np_phash(raw: bytes) -> int:
    p = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    gray = np.zeros(64, dtype=np.int64)
    if len(p):
        np.add.at(gray, (np.arange(len(p)) * 64) // len(p), p)
    ph = 0
    for j in range(63):
        if gray[j] > gray[j + 1]:
            ph |= 1 << j
    return ph


def test_phash_signatures_match_reference_bits(spark):
    """The vectorized bincount kernel must equal the definitional
    per-row recompute (strip i = exact byte sum over bytes with
    (k*64) div n == i; bit j = gray[j] > gray[j+1]) — including the
    empty-payload, sub-64-byte (empty strips), multibyte-UTF-8 and
    duplicate-text cases."""
    from petfinder_database_distributor_spark.operators.multimodal import (
        phash_signatures,
    )

    texts = [
        "",
        "x",
        "short text",
        "abcdefghij" * 50,
        "abcdefghij" * 50,  # exact dup -> identical hash
        "naïve café — ünïcode ⚡" * 3,
        "mixed 123 !?\n\ttext" * 7,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    payloads = attach_binary_payload(df, "doc_id", "text")
    got = {r["doc_id"]: r["phash"] for r in phash_signatures(payloads).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _np_phash(t.encode("utf-8")), (i, t[:20])
    assert got[3] == got[4], "identical payloads must collide exactly"
    assert got[0] == 0, "empty payload hashes to 0"


def test_phash_banding_pigeonhole_recall(spark):
    """The 4-band multi-index must find EVERY pair within hamming 3 —
    the pigeonhole guarantee (3 flips touch at most 3 of 4 bands).
    Brute-force over the signatures at sf0.001 is the ground truth."""
    from petfinder_database_distributor_spark.operators.multimodal import (
        phash_neardup_pairs,
        phash_signatures,
    )
    from petfinder_database_distributor_spark.schema import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").filter("doc_id IS NOT NULL")
    sigs = {
        r["doc_id"]: r["phash"]
        for r in phash_signatures(
            attach_binary_payload(docs, "doc_id", "text")
        ).collect()
    }
    ids = sorted(sigs)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in phash_neardup_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert got == want
    assert want, "fixture must exercise at least one near-dup pair"
