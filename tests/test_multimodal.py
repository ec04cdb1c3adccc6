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
