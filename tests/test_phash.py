"""Perceptual-hash image dedup: oracle parity, a pure-Python dHash
reference, and controlled near-duplicate scenarios the random corpus
can't stage (exact dup → distance 0; single luma-gradient flip → the
banded join still finds it; pigeonhole guard)."""

from __future__ import annotations

import random

import pytest

from osm_pbf_parquet_spark.operators.phash import (
    dhash_bits,
    dhash_near_pairs,
    image_dhash,
)
from osm_pbf_parquet_spark.plans.media_queries import MEDIA_QUERIES

from oracle_harness import run_compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(MEDIA_QUERIES))
def test_media_oracle_parity(spark, name):
    fn, oracle = MEDIA_QUERIES[name]
    run_compare(spark, SF_DIR, name, fn, oracle)


# --- dhash_bits vs an independent pure-Python reference -----------------------


def _py_dhash(pixels: bytes, w: int, h: int) -> int:
    luma = []
    for p in range(w * h):
        r, g, b = pixels[3 * p], pixels[3 * p + 1], pixels[3 * p + 2]
        luma.append((77 * r + 150 * g + 29 * b) // 256)
    out = 0
    idx = 0
    for y in range(h):
        for x in range(w - 1):
            if luma[y * w + x + 1] > luma[y * w + x]:
                out |= 1 << idx
            idx += 1
    return out


def test_dhash_matches_reference():
    rng = random.Random(5)
    for _ in range(20):
        px = bytes(rng.randrange(256) for _ in range(8 * 4 * 3))
        h, nb = dhash_bits(px, 8, 4)
        assert nb == 28
        assert h == _py_dhash(px, 8, 4)


def test_dhash_gradient_and_flat():
    # strictly increasing luma rightward → all 28 bits set
    px = bytes(b for x in range(32) for b in ((x % 8) * 30,) * 3)
    h, _ = dhash_bits(px, 8, 4)
    assert h == (1 << 28) - 1
    # constant image → no strict increase → 0
    h0, _ = dhash_bits(bytes([7] * 96), 8, 4)
    assert h0 == 0


# --- banded near-dup join on controlled fingerprints ---------------------------


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, dhash long")
    got = dhash_near_pairs(df, n_bits=28, **kw).collect()
    return {(r["doc_a"], r["doc_b"]): r["hamming"] for r in got}


def test_near_pairs_exact_dup_and_bit_flips(spark):
    base = 0b1010110011100011010101111000
    rows = [
        (1, base),
        (2, base),                 # exact dup → distance 0
        (3, base ^ 0b101),         # 2 bits flipped → distance 2
        (4, base ^ ((1 << 27) | (1 << 13) | (1 << 3) | 1)),  # distance 4: out
    ]
    got = _pairs(spark, rows)
    assert got[(1, 2)] == 0 and got[(1, 3)] == 2 and got[(2, 3)] == 2
    assert not any(4 in p for p in got)


def test_near_pairs_recall_is_exhaustive(spark):
    """Randomized cross-check vs brute force: banding must find EVERY
    pair at distance ≤ bands−1 (pigeonhole), and nothing else."""
    rng = random.Random(13)
    rows = []
    for i in range(40):
        h = rng.getrandbits(28)
        rows.append((2 * i, h))
        # plant a near-dup at a random distance 0..3
        flips = rng.sample(range(28), rng.randrange(4))
        h2 = h
        for f in flips:
            h2 ^= 1 << f
        rows.append((2 * i + 1, h2))
    brute = {
        (a, b): bin(ha ^ hb).count("1")
        for a, ha in rows
        for b, hb in rows
        if a < b and bin(ha ^ hb).count("1") <= 3
    }
    assert _pairs(spark, rows) == brute


def test_near_pairs_pigeonhole_guard():
    with pytest.raises(ValueError, match="pigeonhole"):
        dhash_near_pairs(None, bands=4, max_distance=4)


def test_image_dhash_no_shuffle(spark):
    from osm_pbf_parquet_spark.operators.multimodal import attach_ppm_payload
    from osm_pbf_parquet_spark.plans.relational import t

    media = attach_ppm_payload(t(spark, SF_DIR, "documents"))
    plan = image_dhash(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
