"""Unit tests for the scalar helper layer (reference-behavior specs) and
the multimodal decode stub determinism."""

from __future__ import annotations

import fnmatch
import re

import pytest
from hypothesis import given, strategies as st
from pyspark.sql import functions as F

from gluettalax_spark.functions.scalars import format_time, glob_to_rlike


# format_time: reference semantics (gluettalax.py:91-119)
@pytest.mark.parametrize(
    "seconds,expected",
    [
        (0, "0s"),
        (4, "4s"),
        (64, "1m 4s"),
        (3604, "1h 4s"),
        (93784, "1d 2h 3m 4s"),
        (-61, "-1m -1s"),
        (86400, "1d"),
        (59.9, "59s"),
    ],
)
def test_format_time(seconds, expected):
    assert format_time(seconds) == expected


@given(st.integers(min_value=-10**7, max_value=10**7))
def test_format_time_roundtrip(seconds):
    """Parsing the humanized form back yields the truncated seconds."""
    out = format_time(seconds)
    total = 0
    for part in out.split():
        unit = part[-1]
        qty = int(part[:-1])
        total += qty * {"d": 86400, "h": 3600, "m": 60, "s": 1}[unit]
    assert total == int(seconds) or (seconds == 0 and out == "0s")


@pytest.mark.parametrize("pattern", ["*", "a*", "*a", "a?c", "[ab]x", "a*b*c", "Brand#1*"])
@given(s=st.text(alphabet="abcx#123", max_size=10))
def test_glob_matches_fnmatch(pattern, s):
    """glob_to_rlike agrees with fnmatch (the reference's matcher)."""
    ours = re.fullmatch(glob_to_rlike(pattern)[1:-1], s) is not None
    theirs = fnmatch.fnmatch(s, pattern)
    assert ours == theirs


def test_fake_decode_deterministic():
    from gluettalax_spark.operators.multimodal import _fake_decode

    a = _fake_decode(b"hello world, this is a fake image payload")
    b = _fake_decode(b"hello world, this is a fake image payload")
    assert a == b
    w, h, c, luma = a
    assert w >= 64 and h >= 64 and c == 3 and 0 <= luma <= 256


def test_decode_features_schema(spark, sf_dir):
    from gluettalax_spark.operators.multimodal import multimodal_decode_features

    df = multimodal_decode_features(spark, sf_dir)
    assert df.columns == [
        "doc_id", "n_bytes", "width", "height", "n_channels", "mean_luma",
        "payload_md5w", "branch", "meta_ok",
    ]
    rows = df.limit(5).collect()
    assert rows and all(r["n_bytes"] > 0 for r in rows)
    # Embedded invariant: the JVM-side recompute agrees with the kernel
    # for EVERY row, not just the sample — including the integer-exact
    # md5-word content witness (kernel hash == JVM conv(md5) hash).
    assert df.filter(~F.col("meta_ok")).count() == 0
    # No PIL in this container: every row must take the stub branch.
    assert df.filter(F.col("branch") != "stub").count() == 0
    # Cross-check one md5 word driver-side against hashlib.
    import hashlib

    r0 = rows[0]
    from gluettalax_spark.tables import load

    text = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == r0.doc_id)
        .collect()[0]
        .text
    )
    assert r0.payload_md5w == int(
        hashlib.md5(text.encode("utf-8")).hexdigest()[:15], 16
    )


def test_multimodal_resize_bounded_width(spark, sf_dir):
    """Thumbnails are fixed-size regardless of input payload size — the
    bounded-row-width property a 100 TB thumbnail pipeline relies on."""
    from gluettalax_spark.operators.multimodal import THUMB_SIZE, multimodal_resize
    from gluettalax_spark.tables import load

    rows = multimodal_resize(spark, sf_dir).collect()
    assert len(rows) == load(spark, sf_dir, "documents").count()
    target = THUMB_SIZE * THUMB_SIZE
    assert all(r.thumb_w == THUMB_SIZE and len(r.thumb) <= target for r in rows)
    # thumb_ok is now byte-exact for the stub branch: every thumbnail
    # byte was checked JVM-side against the strided payload byte, plus
    # the md5-word content witness. All rows stub here (no PIL).
    assert all(r.thumb_ok for r in rows)
    assert all(r.branch == "stub" for r in rows)
    # The pass-through payload must NOT survive into the output schema.
    assert "payload" not in multimodal_resize(spark, sf_dir).columns


def test_multimodal_frame_sample_explodes(spark, sf_dir):
    """Frame sampling is a 1→N mapInPandas: every FRAME_EVERY-th chunk,
    monotone synthetic timestamps, deterministic across runs."""
    from gluettalax_spark.operators.multimodal import (
        FRAME_EVERY,
        FRAME_MS,
        multimodal_frame_sample,
    )

    rows = multimodal_frame_sample(spark, sf_dir).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, frames in by_doc.items():
        idxs = [f.frame_idx for f in frames]
        assert idxs == sorted(idxs)
        assert all(i % FRAME_EVERY == 0 for i in idxs)
        assert all(f.ts_ms == f.frame_idx * FRAME_MS for f in frames)
        # frame_ok is byte-exact for stub frames: md5 word of the emitted
        # frame == md5 word of the JVM's own slice of the payload.
        assert all(f.frame_ok for f in frames)
        assert all(f.branch == "stub" for f in frames)
    # Completeness: the left-join witness can't catch DROPPED frames, so
    # recompute the expected frame count per doc from the contract.
    from gluettalax_spark.operators.multimodal import FRAME_BYTES
    from gluettalax_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    for d in docs:
        n = len(d.text.encode("utf-8"))
        n_frames = max(1, n // FRAME_BYTES)
        expected = len(range(0, n_frames, FRAME_EVERY))
        assert len(by_doc[d.doc_id]) == expected, d.doc_id
    rows2 = multimodal_frame_sample(spark, sf_dir).collect()
    assert [(r.doc_id, r.frame_idx, bytes(r.frame)) for r in rows] == [
        (r.doc_id, r.frame_idx, bytes(r.frame)) for r in rows2
    ]


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """HLL++ estimates at rsd=0.01 land within 3% of exact counts."""
    from gluettalax_spark.operators.aggregates import (
        agg_approx_count_distinct,
        agg_count_distinct,
    )

    approx = agg_approx_count_distinct(spark, sf_dir).collect()[0]
    exact = agg_count_distinct(spark, sf_dir).collect()[0]
    assert abs(approx.approx_n_orders - exact.n_orders) / exact.n_orders < 0.03
    assert abs(approx.approx_n_parts - exact.n_parts) / exact.n_parts < 0.03
    # Embedded invariants: the in-output exact twin and rel_err agree.
    assert approx.exact_n_orders == exact.n_orders
    assert approx.exact_n_parts == exact.n_parts
    assert approx.rel_err_orders < 0.03 and approx.rel_err_parts < 0.03


def test_percentile_approx_accuracy(spark, sf_dir):
    """percentile_approx(accuracy=10000) tracks the exact discrete
    percentiles within 1% relative value error per group."""
    from gluettalax_spark.operators.aggregates import (
        agg_percentiles,
        agg_percentiles_approx,
    )

    approx = {
        r.l_returnflag: (r.p50_approx, r.p95_approx)
        for r in agg_percentiles_approx(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: (r.median_price, r.p95_price)
        for r in agg_percentiles(spark, sf_dir).collect()
    }
    for flag, (median, p95) in exact.items():
        a50, a95 = approx[flag]
        assert abs(a50 - median) / median < 0.01, (flag, a50, median)
        assert abs(a95 - p95) / p95 < 0.01, (flag, a95, p95)
    # Embedded invariants: in-output exact percentiles + rel_err columns.
    for r in agg_percentiles_approx(spark, sf_dir).collect():
        assert r.rel_err_p50 < 0.01 and r.rel_err_p95 < 0.01
        assert r.p50_exact <= r.p95_exact


def test_multimodal_rollup_covers_all_docs(spark, sf_dir):
    """The rollup's embedded n_docs_total equals the sum of group counts —
    a kernel that drops batches cannot pass."""
    from gluettalax_spark.operators.multimodal import multimodal_feature_rollup

    rows = multimodal_feature_rollup(spark, sf_dir).collect()
    assert rows
    totals = {r.n_docs_total for r in rows}
    assert len(totals) == 1
    assert sum(r.n_images for r in rows) == totals.pop()
    # The integer-exact group fingerprints must agree with a driver-side
    # recompute from the decode output (order-independent mod-2^61 sums).
    from gluettalax_spark.operators.multimodal import multimodal_decode_features

    decoded = multimodal_decode_features(spark, sf_dir).collect()
    by_shape: dict = {}
    for d in decoded:
        g = by_shape.setdefault((d.width, d.height), [0, 0])
        g[0] = g[0] + d.payload_md5w
        g[1] = g[1] + round(d.mean_luma * 100)
    for r in rows:
        md5w_sum, luma_sum = by_shape[(r.width, r.height)]
        assert r.md5w_checksum == md5w_sum % (1 << 61)
        assert r.luma_centi_sum == luma_sum


# ---------------------------------------------------------------------------
# Real-codec branch: exercised driver-side with an injected fake PIL module
# (the container has no PIL; kernels are plain generators so no Spark
# workers are involved and a sys.modules patch reaches the import).
# ---------------------------------------------------------------------------

_FAKE_MAGIC = b"FAKEIMG"


class _FakeThumb:
    def __init__(self, wh):
        self.wh = wh

    def tobytes(self):
        return b"\x42" * (self.wh[0] * self.wh[1] * 3)


class _FakePILImage:
    def __init__(self, n_frames):
        self.size = (40, 20)
        self.n_frames = n_frames

    def getbands(self):
        return ("R", "G", "B")

    def convert(self, mode):
        if mode == "L":
            return [[10.0] * self.size[0]] * self.size[1]
        return self

    def resize(self, wh):
        return _FakeThumb(wh)

    def seek(self, i):
        if i >= self.n_frames:
            raise EOFError(i)


def _install_fake_pil(monkeypatch):
    import sys
    import types

    image_mod = types.ModuleType("PIL.Image")

    def _open(fp):
        data = fp.read()
        if not data.startswith(_FAKE_MAGIC):
            raise ValueError("cannot identify image file")
        return _FakePILImage(n_frames=data[len(_FAKE_MAGIC)])

    image_mod.open = _open
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


def test_decode_real_branch_with_fallback(monkeypatch):
    """With a codec present, image payloads take the real branch and
    non-image payloads fall through to the deterministic stub — a mixed
    batch never fails."""
    import pandas as pd

    from gluettalax_spark.operators.multimodal import _fake_decode, make_decode_batch

    _install_fake_pil(monkeypatch)
    kernel = make_decode_batch(have_codecs=True)
    img, txt = _FAKE_MAGIC + bytes([1]) + b"pixels", b"plain text payload"
    out = pd.concat(kernel(iter([pd.DataFrame({"doc_id": [1, 2], "payload": [img, txt]})])))
    real = out[out.doc_id == 1].iloc[0]
    assert (real.width, real.height, real.n_channels, real.mean_luma) == (40, 20, 3, 10.0)
    stub = out[out.doc_id == 2].iloc[0]
    assert (stub.width, stub.height, stub.n_channels, stub.mean_luma) == _fake_decode(txt)


def test_resize_real_branch(monkeypatch):
    import pandas as pd

    from gluettalax_spark.operators.multimodal import THUMB_SIZE, make_resize_batch

    _install_fake_pil(monkeypatch)
    kernel = make_resize_batch(have_codecs=True)
    img = _FAKE_MAGIC + bytes([1]) + b"pixels"
    out = pd.concat(kernel(iter([pd.DataFrame({"doc_id": [1], "payload": [img]})])))
    # Real branch emits an RGB thumbnail: exactly 3·THUMB_SIZE² bytes.
    assert len(out.iloc[0].thumb) == 3 * THUMB_SIZE * THUMB_SIZE


def test_frame_sample_real_branch(monkeypatch):
    import pandas as pd

    from gluettalax_spark.operators.multimodal import (
        FRAME_EVERY,
        FRAME_MS,
        THUMB_SIZE,
        make_frame_sample_batch,
    )

    _install_fake_pil(monkeypatch)
    kernel = make_frame_sample_batch(have_codecs=True)
    img = _FAKE_MAGIC + bytes([9]) + b"pixels"  # 9 frames → idx 0,4,8
    out = pd.concat(kernel(iter([pd.DataFrame({"doc_id": [1], "payload": [img]})])))
    assert list(out.frame_idx) == list(range(0, 9, FRAME_EVERY))
    assert list(out.ts_ms) == [i * FRAME_MS for i in out.frame_idx]
    assert all(len(f) == 3 * THUMB_SIZE * THUMB_SIZE for f in out.frame)


def test_kernels_without_pil_ignore_have_codecs_flag():
    """have_codecs=True with no importable PIL must not crash — the kernel
    downgrades to the stub (worker images may differ from the driver's)."""
    import pandas as pd

    from gluettalax_spark.operators.multimodal import _fake_decode, make_decode_batch

    kernel = make_decode_batch(have_codecs=True)
    txt = b"no codecs anywhere"
    out = pd.concat(kernel(iter([pd.DataFrame({"doc_id": [7], "payload": [txt]})])))
    assert (
        out.iloc[0].width,
        out.iloc[0].height,
        out.iloc[0].n_channels,
        out.iloc[0].mean_luma,
    ) == _fake_decode(txt)


def test_binaryfile_ingest_and_decode(spark, tmp_path):
    """binaryFile source → decode kernel: glob prunes at listing, the
    length guard filters before content materializes, features are the
    deterministic stub's (no PIL in this container)."""
    from gluettalax_spark.operators.multimodal import decode_binary_dir, read_binary_dir

    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.bin").write_bytes(b"payload-aaaa" * 10)
    (d / "b.bin").write_bytes(b"payload-bb" * 200)
    (d / "skip.txt").write_bytes(b"not-a-blob")

    files = read_binary_dir(spark, str(d), glob="*.bin")
    assert files.count() == 2
    small = read_binary_dir(spark, str(d), glob="*.bin", max_bytes=500)
    assert small.count() == 1

    feats = decode_binary_dir(spark, str(d), glob="*.bin").collect()
    assert len(feats) == 2
    by_name = {r.source_path.rsplit("/", 1)[-1]: r for r in feats}
    assert by_name["a.bin"].n_bytes == 120
    # Deterministic stub features: recompute expectations directly.
    payload = b"payload-aaaa" * 10
    h = sum(payload[:64])
    assert by_name["a.bin"].width == 64 + (h % 7) * 32
    assert by_name["a.bin"].channels == 3


def test_bloom_build_no_false_negatives_and_bounded_fpp():
    """The decontamination bloom NEVER misses a member (false negatives
    would silently drop true contamination hits before the verify join);
    the false-positive rate only costs verify-join work, pinned < 5%."""
    import numpy as np

    from gluettalax_spark.operators.text import _BLOOM_K, _bloom_build

    rng = np.random.RandomState(7)
    members = rng.randint(0, 1 << 60, size=5000, dtype=np.int64)
    others = rng.randint(0, 1 << 60, size=20000, dtype=np.int64)
    others = np.setdiff1d(others, members)

    bits_b, m = _bloom_build(members)
    bits = np.frombuffer(bits_b, dtype=np.uint8)
    assert (m & (m - 1)) == 0  # power of two, mask probing is sound

    def probe(h):
        h = np.asarray(h, dtype=np.int64).astype(np.uint64)
        mask = np.uint64(m - 1)
        h1, h2 = h & mask, (h >> np.uint64(29)) | np.uint64(1)
        ok = np.ones(len(h), dtype=bool)
        for i in range(_BLOOM_K):
            pos = (h1 + np.uint64(i) * h2) & mask
            ok &= (
                bits[(pos >> np.uint64(3)).astype(np.int64)]
                & (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
            ) != 0
        return ok

    assert probe(members).all()  # zero false negatives, by construction
    assert probe(others).mean() < 0.05

    # Empty eval set: a valid all-zero filter that rejects everything.
    bits0, m0 = _bloom_build(np.array([], dtype=np.int64))
    assert not any(bits0)
