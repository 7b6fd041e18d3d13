"""Perceptual average-hash fingerprints (operators/multimodal.py):
kernel arithmetic vs a python reference, keep-one dedup, banded hamming
near-pairs, and the REAL PNG/WAV codecs through the pixels slot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_vector_search_system_spark.operators.multimodal import (
    ahash_band_pairs,
    ahash_dedup,
    perceptual_ahash,
    real_pixels_fn,
)


def py_ahash(sample: list[int], n_bits: int = 32) -> int:
    samp = [sample[j % len(sample)] for j in range(n_bits)]
    total = sum(samp)
    h = 0
    for j, v in enumerate(samp):
        if v * n_bits > total:
            h |= 1 << j
    return h


def _media(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


def test_perceptual_ahash_matches_python_reference(spark):
    payloads = [
        b"hello world this is a longer payload",
        b"a",
        b"\x00\xff" * 20,
        b"zzzz",  # uniform -> no byte above mean -> hash 0
        bytes(range(1, 64)),
    ]
    rows = [(i, "image", p) for i, p in enumerate(payloads)]
    rows.append((99, "image", b""))  # empty: dropped
    got = {
        r["media_id"]: r["ahash"]
        for r in perceptual_ahash(_media(spark, rows)).collect()
    }
    assert 99 not in got
    for i, p in enumerate(payloads):
        assert got[i] == py_ahash(list(p)), i
    assert got[3] == 0


def test_perceptual_ahash_rejects_bad_n_bits(spark):
    m = _media(spark, [(0, "image", b"x")])
    for bad in (0, 63):
        with pytest.raises(ValueError):
            perceptual_ahash(m, n_bits=bad)


def test_ahash_dedup_keep_one(spark):
    dup = b"identical perceptual payload bytes"
    rows = [
        (5, "image", dup),
        (2, "image", dup),
        (9, "image", dup),
        (7, "audio", b"something else entirely, longer and different"),
    ]
    out = {r["media_id"]: r for r in ahash_dedup(_media(spark, rows)).collect()}
    assert out[2]["keep_id"] == 2 and out[2]["is_canonical"]
    assert out[5]["keep_id"] == 2 and not out[5]["is_canonical"]
    assert out[9]["keep_id"] == 2 and not out[9]["is_canonical"]
    assert out[7]["keep_id"] == 7 and out[7]["is_canonical"]
    assert out[5]["ahash"] == out[2]["ahash"] == py_ahash(list(dup))


def test_ahash_band_pairs_pigeonhole_and_exclusion(spark):
    base = py_ahash(list(b"some reference payload for banding tests!"))
    # flips within max_hamming=3 of base (any 3 bit flips leave >= 1 of 4
    # eight-bit bands untouched -> pigeonhole guarantees candidacy)
    near1 = base ^ 0b101  # hamming 2, band 0 touched only
    near2 = base ^ (1 << 8) ^ (1 << 20) ^ (1 << 30)  # hamming 3, bands 1,2,3
    far = base ^ 0x0F0F0F0F  # hamming 16: shares band values nowhere near
    hashes = spark.createDataFrame(
        [(1, "image", base), (2, "image", near1), (3, "image", near2), (4, "image", far)],
        "media_id long, kind string, ahash long",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_band_pairs(hashes, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 2
    assert pairs[(1, 3)] == 3
    assert (1, 4) not in pairs
    # near1 vs near2 differ in 5 bits -> above radius, must be filtered
    assert (2, 3) not in pairs


def test_ahash_band_pairs_rejects_nondividing_bands(spark):
    hashes = spark.createDataFrame(
        [(1, "image", 7)], "media_id long, kind string, ahash long"
    )
    with pytest.raises(ValueError):
        ahash_band_pairs(hashes, n_bits=32, n_bands=5)


def test_real_pixels_through_ahash_slot(spark):
    """Filter-type invariance proves the REAL PNG decode ran: the same
    image encoded under different PNG filters has different payload
    BYTES but identical decoded pixels, so identical aHash — the
    payload-byte stand-in would disagree. WAV: same samples at different
    sample rates -> different header bytes, same PCM -> same hash."""
    from semantic_vector_search_system_spark.functions.png import encode_png
    from semantic_vector_search_system_spark.functions.wav import encode_wav

    w, h = 9, 6
    px = bytes(
        ((x * 37 + y * 11 + c * 5) % 256)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    pngs = [encode_png(w, h, px, color_type=2, filter_type=ft) for ft in range(5)]
    assert len({p for p in pngs}) == 5  # bytes differ...
    samples = [((i * 997) % 2000) - 1000 for i in range(50)]
    wavs = [encode_wav(samples, sample_rate=4000 + 1000 * i, bits=16) for i in range(2)]
    rows = [(i, "image", p) for i, p in enumerate(pngs)]
    rows += [(10 + i, "audio", b) for i, b in enumerate(wavs)]
    rows.append((20, "video", b"fallback payload bytes for video rows"))
    got = {
        r["media_id"]: r["ahash"]
        for r in perceptual_ahash(
            _media(spark, rows), pixels_fn=real_pixels_fn
        ).collect()
    }
    assert len({got[i] for i in range(5)}) == 1  # ...hashes agree
    assert got[10] == got[11]
    # gray pixel sums drive the image hash
    gray = [sum(px[i * 3 : i * 3 + 3]) for i in range(w * h)]
    assert got[0] == py_ahash(gray)
    assert got[10] == py_ahash(samples)
    assert got[20] == py_ahash(list(b"fallback payload bytes for video rows"))


def test_incremental_ahash_equals_full_corpus_run(spark):
    """Equivalence contract: id-ordered batches through
    incremental_ahash_dedup (stored bucketed hash index) reproduce the
    full-corpus ahash_dedup exactly; the index grows only by novel
    hashes."""
    from semantic_vector_search_system_spark.operators.multimodal import (
        incremental_ahash_dedup,
        write_ahash_index,
    )

    dup_a = b"identical perceptual payload bytes"
    dup_b = b"another repeated blob payload with more length"
    rows = []
    for i in range(12):
        payload = dup_a if i % 4 == 0 else (dup_b if i % 4 == 1 else bytes([i + 1]) * (10 + i))
        rows.append((i, "image" if i % 2 else "audio", payload))
    media = _media(spark, rows)
    full = {
        r["media_id"]: (r["ahash"], r["keep_id"], r["is_canonical"])
        for r in ahash_dedup(media).collect()
    }
    for t in ("inc_ahash_hashes", "inc_ahash_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        write_ahash_index(media.limit(0), "inc_ahash", n_bits=32)
        got = {}
        for lo, hi in ((0, 4), (4, 8), (8, 12)):
            batch = media.filter(
                (F.col("media_id") >= lo) & (F.col("media_id") < hi)
            )
            for r in incremental_ahash_dedup(batch, "inc_ahash").collect():
                got[r["media_id"]] = (r["ahash"], r["keep_id"], r["is_canonical"])
        assert got == full
        # the stored index holds exactly the distinct hashes, one row each
        idx = spark.read.table("inc_ahash_hashes").collect()
        assert len(idx) == len({h for h, _, _ in full.values()})
        assert {r["ahash"]: r["keep_id"] for r in idx} == {
            h: k for h, k, _ in full.values()
        }
    finally:
        for t in ("inc_ahash_hashes", "inc_ahash_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_incremental_ahash_index_scan_not_shuffled(spark):
    """100 TB contract: the stored hash table is bucketed on the join
    key, so the plan carries no Exchange hashpartitioning over ITS scan
    — only the batch side moves."""
    from semantic_vector_search_system_spark.operators.multimodal import (
        incremental_ahash_dedup,
        write_ahash_index,
    )

    for t in ("pg_ahash_hashes", "pg_ahash_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        write_ahash_index(
            _media(spark, [(1, "image", b"stored payload one"),
                           (2, "image", b"stored payload two")]),
            "pg_ahash",
        )
        out = incremental_ahash_dedup(
            _media(spark, [(10, "image", b"new payload")]),
            "pg_ahash",
            update_index=False,
        )
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        # the bucketed index IS what the plan scans...
        assert "pg_ahash_hashes" in plan
        # ...and no hashpartitioning Exchange sits over that scan — the
        # same assertion shape as the neardup stored-index gate: every
        # exchange segment's input (up to any broadcast boundary) must be
        # batch-side only
        for seg in plan.split("Exchange hashpartitioning")[1:]:
            below = seg.split("BroadcastExchange")[0]
            assert "pg_ahash_hashes" not in below, below[:1200]
    finally:
        for t in ("pg_ahash_hashes", "pg_ahash_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
