"""Golden QC checker/handler tests, re-expressed from the reference's
parametrized table (test/qc/test_checkers.py:32-84) over the shared 4-point
fixture (test/qc/fixtures/sample_dataset.py:8-58) — same inputs, same expected
failure masks, evaluated against our vectorized numpy checkers.
"""

import numpy as np
import pyarrow as pa
import pytest

from tsdat_ray.stages.qc import (
    CHECKERS,
    DataQualityError,
    Manager,
    QCConfig,
    QCStage,
)

TIME = np.array(
    ["2022-04-13T14:10:00", "2022-04-13T14:20:00", "2022-04-13T14:30:00", "2022-04-13T14:40:00"],
    dtype="datetime64[us]",
)
MISSING_VAR = np.array([-9999, np.nan, 61, 62], dtype=np.float64)
MONOTONIC_VAR = np.array([59, 60, 61, 64], dtype=np.float64)
OTHER_VAR = np.array([59, 60, 61, 58], dtype=np.float64)
OTHER_VAR_R = np.array([58, 61, 60, 59], dtype=np.float64)
STRING_VAR = np.array(["foo", "", "", "bar"], dtype=object)

ATTRS = {
    "missing_var": {"_FillValue": -9999},
    "monotonic_var": {
        "valid_min": 60, "fail_min": 60, "warn_min": 60,
        "valid_max": 61, "fail_max": 61, "warn_max": 61,
        "valid_range": [60, 61], "fail_range": [60, 61], "warn_range": [60, 61],
        "valid_delta": 2, "fail_delta": 2, "warn_delta": 2,
        "valid_std": 6, "fail_std": 5, "warn_std": 1,
        "_FillValue": -9999,
    },
}
VARS = {
    "time": TIME,
    "missing_var": MISSING_VAR,
    "monotonic_var": MONOTONIC_VAR,
    "other_var": OTHER_VAR,
    "other_var_r": OTHER_VAR_R,
    "string_var": STRING_VAR,
}

F, T = False, True


# the reference's golden table, verbatim (checker name, params, var, expected)
@pytest.mark.parametrize(
    "checker, params, var, expected",
    [
        ("fail_delta", {}, "monotonic_var", [F, F, F, T]),
        ("fail_max", {"allow_equal": False}, "monotonic_var", [F, F, T, T]),
        ("fail_min", {}, "monotonic_var", [T, F, F, F]),
        ("fail_range_max", {"allow_equal": False}, "monotonic_var", [F, F, T, T]),
        ("fail_range_min", {}, "monotonic_var", [T, F, F, F]),
        ("fail_std", {}, "monotonic_var", [F, F, F, F]),
        ("missing", {}, "missing_var", [T, T, F, F]),
        ("missing", {}, "string_var", [F, T, T, F]),
        ("missing", {}, "time", [F, F, F, F]),
        ("monotonic", {}, "string_var", None),
        ("monotonic", {}, "time", [F, F, F, F]),
        ("monotonic", {"dim": "time"}, "monotonic_var", [F, F, F, F]),
        ("monotonic", {"dim": "time"}, "other_var", [F, F, F, T]),
        ("monotonic", {"dim": "time"}, "other_var_r", [F, T, T, T]),
        ("monotonic", {"require_decreasing": True}, "time", [F, T, T, T]),
        ("monotonic", {"require_increasing": True}, "time", [F, F, F, F]),
        ("valid_delta", {"allow_equal": False}, "monotonic_var", [F, F, F, T]),
        ("valid_max", {"allow_equal": False}, "monotonic_var", [F, F, T, T]),
        ("valid_min", {}, "monotonic_var", [T, F, F, F]),
        ("valid_range_max", {"allow_equal": False}, "monotonic_var", [F, F, T, T]),
        ("valid_range_min", {}, "monotonic_var", [T, F, F, F]),
        ("valid_std", {}, "monotonic_var", [F, F, F, F]),
        ("warn_delta", {}, "monotonic_var", [F, F, F, T]),
        ("warn_max", {"allow_equal": False}, "monotonic_var", [F, F, T, T]),
        ("warn_min", {}, "monotonic_var", [T, F, F, F]),
        ("warn_range_max", {"allow_equal": False}, "monotonic_var", [F, F, T, T]),
        ("warn_range_min", {}, "monotonic_var", [T, F, F, F]),
        ("warn_std", {}, "monotonic_var", [F, F, F, T]),
    ],
)
def test_checker_goldens(checker, params, var, expected):
    failures = CHECKERS[checker](VARS[var], ATTRS.get(var, {}), params, VARS)
    if expected is None:
        assert failures is None
    else:
        np.testing.assert_array_equal(failures, np.array(expected))


def _sample_table() -> pa.Table:
    return pa.table(
        {
            "time": pa.array(TIME),
            "missing_var": pa.array(MISSING_VAR),
            "monotonic_var": pa.array(MONOTONIC_VAR),
            "other_var": pa.array(OTHER_VAR),
        }
    )


def test_record_and_remove_handlers():
    cfg = QCConfig(
        managers=(
            Manager(
                name="missing",
                checker="missing",
                apply_to=("missing_var", "monotonic_var"),
                handlers=({"name": "record_quality_results"}, {"name": "remove_failed_values"}),
            ),
            Manager(
                name="over_max",
                checker="valid_max",
                apply_to=("monotonic_var",),
                handlers=({"name": "record_quality_results"},),
            ),
        ),
        attrs=ATTRS,
        coords=("time",),
    )
    out = QCStage(cfg)(_sample_table())
    # bit 1 = missing (manager 1), bit 2 = over_max (manager 2, monotonic_var only)
    assert out["qc_missing_var"].to_pylist() == [1, 1, 0, 0]
    assert out["qc_monotonic_var"].to_pylist() == [0, 0, 0, 2]  # 64 > valid_max=61
    assert out["missing_var"].to_pylist() == [None, None, 61.0, 62.0]  # removed → null
    assert out["monotonic_var"].to_pylist() == [59.0, 60.0, 61.0, 64.0]  # recorded only


def test_remove_failed_coord_rows_dropped():
    t = pa.table(
        {
            "time": pa.array(np.array([3, 1, 2, 2], dtype="datetime64[us]")),
            "x": pa.array([1.0, 2.0, 3.0, 4.0]),
            "tokens": pa.array([[1], [2], [3], [4]], type=pa.list_(pa.int32())),
        }
    )
    cfg = QCConfig(
        managers=(
            Manager(
                name="mono",
                checker="monotonic",
                apply_to=("time",),
                parameters={"require_increasing": True},
                handlers=({"name": "record_quality_results"}, {"name": "remove_failed_values"}),
            ),
        ),
        coords=("time",),
    )
    out = QCStage(cfg)(t)
    # running-prev: [3,1,2,2] increasing → fails at 1, 2, 2 (never exceeds 3)
    assert out["x"].to_pylist() == [1.0]
    assert out["tokens"].to_pylist() == [[1]]


def test_sort_by_coordinate_handler():
    t = pa.table(
        {
            "time": pa.array(np.array([2, 1, 3], dtype="datetime64[us]")),
            "x": pa.array([20.0, 10.0, 30.0]),
            "tokens": pa.array([[2], [1], [3]], type=pa.list_(pa.int32())),
        }
    )
    cfg = QCConfig(
        managers=(
            Manager(
                name="mono",
                checker="monotonic",
                apply_to=("time",),
                handlers=({"name": "sort_dataset_by_coordinate"},),
            ),
        ),
        coords=("time",),
    )
    out = QCStage(cfg)(t)
    assert out["x"].to_pylist() == [10.0, 20.0, 30.0]
    assert out["tokens"].to_pylist() == [[1], [2], [3]]


def test_fail_pipeline_handler():
    cfg = QCConfig(
        managers=(
            Manager(
                name="missing",
                checker="missing",
                apply_to=("missing_var",),
                handlers=({"name": "fail_pipeline", "tolerance": 0.25},),
            ),
        ),
        attrs=ATTRS,
        coords=("time",),
    )
    with pytest.raises(DataQualityError, match="missing_var"):
        QCStage(cfg)(_sample_table())
    # under tolerance → no raise
    cfg_ok = QCConfig(
        managers=(
            Manager(
                name="missing",
                checker="missing",
                apply_to=("missing_var",),
                handlers=({"name": "fail_pipeline", "tolerance": 0.5},),
            ),
        ),
        attrs=ATTRS,
        coords=("time",),
    )
    QCStage(cfg_ok)(_sample_table())


def test_qc_stage_in_ray_pipeline(ray_session):
    import ray.data as rd

    cfg = QCConfig(
        managers=(
            Manager(
                name="missing",
                checker="missing",
                apply_to=("missing_var",),
                handlers=({"name": "record_quality_results"}, {"name": "remove_failed_values"}),
            ),
        ),
        attrs=ATTRS,
        coords=("time",),
    )
    out = (
        rd.from_arrow(_sample_table())
        .map_batches(QCStage(cfg), batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    assert out["qc_missing_var"].tolist() == [1, 1, 0, 0]


def test_array_mask_threshold():
    import numpy as np

    from tsdat_ray.stages.qc import CHECKERS

    x = np.array([1.0, 5.0, np.nan, -2.0])
    fails = CHECKERS["array_mask_threshold"](x, {}, {"threshold": 0.0, "comparator": "<"}, {})
    assert fails.tolist() == [False, False, False, True]
    fails = CHECKERS["array_mask_threshold"](x, {}, {"threshold": 5.0, "comparator": ">="}, {})
    assert fails.tolist() == [False, True, False, False]


def test_despike_gn2002_flags_planted_spikes():
    import numpy as np

    from tsdat_ray.stages.qc import CHECKERS

    rng = np.random.Generator(np.random.Philox(key=np.array([21, 0], dtype=np.uint64)))
    x = np.sin(np.arange(400) / 10.0) + 0.05 * rng.standard_normal(400)
    spikes = [50, 180, 333]
    x[spikes] += np.array([6.0, -7.0, 8.0])
    fails = CHECKERS["despike_gn2002"](x, {}, {"n_iter": 3}, {})
    assert all(fails[i] for i in spikes), "planted spikes not flagged"
    assert fails.sum() <= 20, f"too many false positives: {fails.sum()}"
    # clean signal → (almost) nothing flagged
    clean = np.sin(np.arange(400) / 10.0)
    assert CHECKERS["despike_gn2002"](clean, {}, {}, {}).sum() <= 4


def test_apply_to_keywords_and_exclude():
    import numpy as np
    import pyarrow as pa

    from tsdat_ray.stages.qc import Manager, QCConfig, QCStage

    cfg = QCConfig(
        managers=(
            Manager(name="miss_all", checker="missing", apply_to=("DATA_VARS",),
                    exclude=("b",)),
        ),
        attrs={"a": {"_FillValue": -9999.0}},
        coords=("ts",),
    )
    stage = QCStage(cfg)
    batch = pa.table(
        {
            "ts": pa.array(np.arange(4).astype("datetime64[us]")),
            "a": pa.array([1.0, -9999.0, float("nan"), 4.0]),
            "b": pa.array([float("nan")] * 4),  # excluded → never flagged
        }
    )
    out = stage(batch)
    assert "qc_a" in out.column_names and "qc_b" not in out.column_names
    assert out["qc_a"].to_pylist() == [0, 1, 1, 0]
    # bit table resolved deterministically
    assert stage.meanings == {"a": [(1, "miss_all", "Bad")]}


def test_check_std_global_two_pass(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.qc import check_std_global

    rng = np.random.Generator(np.random.Philox(key=np.array([31, 0], dtype=np.uint64)))
    n = 4000
    keys = np.repeat(["a", "b"], n // 2)
    x = np.r_[rng.normal(0, 1, n // 2), rng.normal(100, 5, n // 2)]
    x[10] = 50.0    # outlier for key a (way over mean+3std of N(0,1))
    x[3000] = 500.0  # outlier for key b
    tbl = pa.table({"source": pa.array(keys), "v": pa.array(x)})
    out = check_std_global(rd.from_arrow(tbl).repartition(8), var="v").to_pandas()

    df = pd.DataFrame({"source": keys, "v": x})
    g = df.groupby("source")["v"]
    thr = g.transform("mean") + 3.0 * g.transform(lambda s: s.std(ddof=1))
    exp = (df["v"] > thr).to_numpy()
    got = (out.sort_values(["source", "v"]).reset_index(drop=True)["qc_v"] != 0).to_numpy()
    exps = pd.DataFrame({"source": keys, "v": x, "f": exp}).sort_values(
        ["source", "v"]).reset_index(drop=True)["f"].to_numpy()
    np.testing.assert_array_equal(got, exps)
    assert got.sum() >= 2  # both planted outliers flagged
