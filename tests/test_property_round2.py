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
