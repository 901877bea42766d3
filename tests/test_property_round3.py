"""Property-based checks for round-3 kernels (hypothesis)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


# ------------------------------------------------------------- PNG codec ----

@given(
    st.integers(1, 20), st.integers(1, 20), st.sampled_from([1, 3, 4]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, c, seed):
    from tsdat_ray.stages.png_codec import png_decode, png_encode

    img = np.random.default_rng(seed).integers(0, 256, (h, w, c), np.uint8)
    np.testing.assert_array_equal(png_decode(png_encode(img)), img)


# ------------------------------------------------------ JPEG flat blocks ----

@given(st.integers(0, 255), st.integers(1, 3), st.integers(60, 95))
@settings(max_examples=25, deadline=None)
def test_jpeg_flat_within_one_lsb(level, octave, quality):
    from tsdat_ray.stages.jpeg_codec import jpeg_decode, jpeg_encode

    img = np.full((8 * octave, 8, 3), level, np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=quality))
    assert int(np.abs(out.astype(int) - level).max()) <= 1


# ----------------------------------------------- dedup tie-break property ----

@given(st.integers(0, 2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_dedup_survivor_independent_of_row_order(seed):
    """The (key, ts) dedup survivor must depend only on CONTENT, never on
    arrival order — the invariant behind the round-3 _tb tie-break."""
    from tsdat_ray.stages.rollup import RollupConfig, _key_codes, _rollup_raw_sorted
    from tsdat_ray.stages.standardize import standardize_batch

    rng = np.random.default_rng(seed)
    n = 24
    # duplicate ids with independent payloads (what synth's DUP_P injects)
    idx = np.sort(rng.integers(0, 8, n))
    lens = rng.integers(1, 6, n)
    toks = [rng.integers(0, 100, ln).astype(np.int32).tolist() for ln in lens]
    tbl = pa.table({
        "doc_id": pa.array([f"web-{i:08d}" for i in idx]),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
        "n_tok": pa.array(lens.astype(np.int32)),
        "source": pa.array(["web"] * n),
    })
    cfg = RollupConfig(interval_s=60, window_s=3600)

    def run(order: np.ndarray) -> pa.Table:
        std = standardize_batch(tbl.take(pa.array(order, type=pa.int64())))
        codes, keys = _key_codes(std["source"])
        out = _rollup_raw_sorted(std, cfg, codes, keys, 60 * 1_000_000)
        return out

    a = run(np.arange(n))
    b = run(rng.permutation(n))
    assert a.equals(b)
