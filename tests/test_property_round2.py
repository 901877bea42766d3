"""Property-based checks for round-2 kernels (hypothesis)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsdat_ray.stages.convert import UnitsError, parse_units, unit_factors


# ---------------------------------------------------------------- units ----

@given(
    st.sampled_from(["m", "km", "mm", "ft", "mi", "in"]),
    st.sampled_from(["m", "km", "mm", "ft", "mi", "in"]),
)
def test_unit_factors_invertible(a, b):
    s_ab, o_ab = unit_factors(a, b)
    s_ba, o_ba = unit_factors(b, a)
    assert s_ab * s_ba == pytest.approx(1.0, rel=1e-12)
    # x -> b -> a roundtrips
    x = 123.456
    back = (x * s_ab + o_ab) * s_ba + o_ba
    assert back == pytest.approx(x, rel=1e-12)


@given(
    st.sampled_from(["m s-1", "km/h", "mph", "knots", "m/s"]),
    st.sampled_from(["m s-1", "km/h", "mph", "knots", "m/s"]),
    st.sampled_from(["W/m^2", "kg s-3", "W m-2"]),
)
def test_unit_factors_transitive(a, b, c):
    # a→b then b→a·scale consistency across a third compatible chain
    s_ab, _ = unit_factors(a, b)
    s_b_ms, _ = unit_factors(b, "m/s")
    s_a_ms, _ = unit_factors(a, "m/s")
    assert s_ab * s_b_ms == pytest.approx(s_a_ms, rel=1e-12)
    with pytest.raises(UnitsError):
        unit_factors(a, c)  # speed vs power flux: incompatible


@given(st.sampled_from(["m s-2", "kg m2 s-3", "W/m^2", "mg/L", "umol/m^2/s"]))
def test_parse_units_deterministic(expr):
    f1, o1, d1 = parse_units(expr)
    f2, o2, d2 = parse_units(expr)
    assert (f1, o1, d1) == (f2, o2, d2)


# ------------------------------------------------------------ quantiles ----

@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=-10000, max_value=10000), min_size=1, max_size=300),
    st.sampled_from([0.25, 0.5, 0.75]),
)
def test_exact_quantiles_match_numpy(ray_session, cents, q):
    import ray.data as rd

    from tsdat_ray.stages.window_funcs import exact_quantiles_quantized

    vals = np.array(cents, dtype=np.int64) / 100.0
    t = pa.table({"k": pa.array(["x"] * len(vals)), "v": pa.array(vals)})
    out = exact_quantiles_quantized(rd.from_arrow(t).repartition(3), key="k",
                                    value_col="v", qs=(q,), scale=100).to_pandas()
    got = out[f"q{int(round(q * 100))}"].iloc[0]
    # numpy 'linear' == SQL quantile_cont
    exp = np.quantile(vals, q, method="linear")
    assert got == pytest.approx(exp, abs=1e-9)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=-10000, max_value=10000), min_size=1, max_size=300))
def test_exact_median_matches_numpy(ray_session, cents):
    import ray.data as rd

    from tsdat_ray.stages.window_funcs import exact_median_quantized

    vals = np.array(cents, dtype=np.int64) / 100.0
    t = pa.table({"k": pa.array(["x"] * len(vals)), "v": pa.array(vals)})
    out = exact_median_quantized(rd.from_arrow(t).repartition(2), key="k",
                                 value_col="v", scale=100).to_pandas()
    assert out["median_value"].iloc[0] == pytest.approx(np.median(vals), abs=1e-9)


# ------------------------------------------------------- storage roundtrips ----

@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),   # n records
    st.integers(min_value=0, max_value=5),    # n heights (0 → 1-D only)
    st.sampled_from([np.float64, np.float32, np.int32, np.int16]),
    st.randoms(),
)
def test_netcdf3_roundtrip_random(n, nh, dtype, rnd):
    from tsdat_ray.sources.netcdf3 import parse_netcdf3, write_netcdf3

    rng = np.random.default_rng(rnd.randint(0, 2**32))
    dims = {"time": n}
    variables = {
        "time": {"dims": ["time"],
                 "data": np.sort(rng.integers(0, 10**15, n)).astype("datetime64[us]")},
        "v": {"dims": ["time"],
              "data": (rng.normal(0, 1e5, n).astype(dtype)
                       if np.issubdtype(dtype, np.floating)
                       else rng.integers(-30000, 30000, n).astype(dtype))},
    }
    if nh:
        dims["h"] = nh
        variables["grid"] = {"dims": ["time", "h"],
                             "data": rng.normal(size=(n, nh)).astype(np.float32)}
    buf = write_netcdf3(dims, variables, attrs={"t": "x"}, record_dim="time")
    nc = parse_netcdf3(buf)
    np.testing.assert_array_equal(nc["vars"]["v"]["data"], variables["v"]["data"])
    if nh:
        np.testing.assert_array_equal(nc["vars"]["grid"]["data"],
                                      variables["grid"]["data"])
    # CF time decode is exact at µs resolution
    from tsdat_ray.sources.netcdf3 import _decode_time

    t = _decode_time(nc["vars"]["time"])
    np.testing.assert_array_equal(t, variables["time"]["data"])


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=1, max_value=64),
    st.booleans(),
    st.randoms(),
)
def test_zarr_array_roundtrip_random(n, chunks, compress, rnd):
    import tempfile

    from tsdat_ray.sources.zarr_store import read_array, write_array

    rng = np.random.default_rng(rnd.randint(0, 2**32))
    arr = rng.normal(size=n)
    arr[rng.random(n) < 0.1] = np.nan
    with tempfile.TemporaryDirectory() as d:
        write_array(f"{d}/a.zarr", arr, chunks=chunks,
                    compressor="zlib" if compress else "null")
        back, _ = read_array(f"{d}/a.zarr")
    np.testing.assert_array_equal(back, arr)  # bitwise incl. NaNs


@given(
    n_part=st.integers(min_value=1, max_value=300),
    n_supp=st.sampled_from([10, 100, 1000]),
)
@settings(max_examples=20, deadline=None)
def test_partsupp_formula_matches_cte(n_part, n_supp):
    """The numpy partsupp derivation and the DuckDB CTE are the same table
    for any part count and every supplier-count tier the testdata uses."""
    import duckdb
    import pandas as pd

    from tsdat_ray.synth import PARTSUPP_CTE, partsupp_arrays

    pk = np.arange(n_part, dtype=np.int64)
    a = partsupp_arrays(pk, n_supp)
    eng = pd.DataFrame(a)
    eng["ps_supplycost"] = eng.pop("ps_supplycost_cents") / 100.0
    eng = eng.sort_values(["ps_partkey", "ps_suppkey"]).reset_index(drop=True)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT unnest(range(0, {n_part})) AS p_partkey")
    con.sql(f"CREATE VIEW supplier AS SELECT unnest(range(0, {n_supp})) AS s_suppkey")
    sql = con.sql(f"WITH {PARTSUPP_CTE} SELECT * FROM partsupp "
                  "ORDER BY ps_partkey, ps_suppkey").df()
    pd.testing.assert_frame_equal(
        eng.astype({"ps_partkey": "int64", "ps_suppkey": "int64",
                    "ps_availqty": "int64"}),
        sql.astype({"ps_partkey": "int64", "ps_suppkey": "int64",
                    "ps_availqty": "int64"}),
        check_dtype=False)
    # pair membership/cost formulas agree with the generated rows
    from tsdat_ray.synth import partsupp_cost_cents, partsupp_pair_mask

    assert partsupp_pair_mask(a["ps_partkey"], a["ps_suppkey"], n_supp).all()
    assert (partsupp_cost_cents(a["ps_partkey"], a["ps_suppkey"])
            == a["ps_supplycost_cents"]).all()


@given(st.data())
@settings(max_examples=15, deadline=None)
def test_fuzzy_pairs_levenshtein_matches_reference(ray_session, data):
    """The vectorized DP inside fuzzy_pairs equals a classic scalar
    Levenshtein on random short strings (same alphabet shape as names)."""
    import duckdb

    rng = data.draw(st.randoms(use_true_random=False))
    words = ["red", "blue", "bolt", "ring", "gear", "kit", "cog", "rig"]
    names = sorted({
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 3)))
        for _ in range(rng.randint(2, 12))
    })
    con = duckdb.connect()
    exp = {}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if a[:1] == b[:1] and abs(len(a) - len(b)) <= 2:
                d = con.sql(
                    f"SELECT levenshtein('{a}', '{b}')").fetchone()[0]
                if d <= 4:
                    exp[(a, b)] = d
    import ray.data as rd

    from tsdat_ray.stages.text import fuzzy_pairs

    ds = rd.from_arrow(pa.table({"nm": pa.array(names * 3, pa.string())}))
    out = fuzzy_pairs(ds, text_col="nm", max_dist=4, len_band=2).to_pandas()
    got = {(r.name_a, r.name_b): r.dist for r in out.itertuples()} if len(out) else {}
    assert got == exp
