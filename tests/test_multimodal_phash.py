"""Perceptual-hash near-dup: exact equality vs the brute all-pairs scan."""

from __future__ import annotations

import numpy as np
import pytest

from cdc_local_data_pipeline_docker_spark.llmops import multimodal as MM

SF = "/root/testdata/sf0.001"


def _ref_phash(b: bytes) -> int:
    a = np.frombuffer(b, dtype=np.uint8)
    if a.size == 0:
        return 0
    chunks = np.array_split(a.astype(np.int64), 64)
    means = np.array([c.mean() if c.size else 0.0 for c in chunks])
    bits = means > a.mean()
    h = 0
    for i, bit in enumerate(bits):
        if bit:
            h |= 1 << i
    return h


def test_phash_dedup_equals_brute_all_pairs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    hashes = {d.doc_id: _ref_phash(d.text.encode("utf-8")) for d in docs}
    ids = sorted(hashes)
    brute = {}
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            h = bin(hashes[d1] ^ hashes[d2]).count("1")
            if h <= MM.PHASH_MAX_HAMMING:
                brute[(d1, d2)] = h
    got = {
        (r.doc1, r.doc2): r.hamming
        for r in MM.multimodal_phash_dedup(spark, SF).collect()
    }
    assert got == brute
    # the detector is non-vacuous on the testdata
    assert got, "no near-dup media pairs at sf0.001 — fixture degenerate"
    # spark-side hashes equal the reference hash bit-for-bit
    sh = {
        r.doc_id: r.phash & ((1 << 64) - 1)
        for r in MM.multimodal_phash_hashes(spark, SF).collect()
    }
    assert sh == hashes
