"""YAML config loading + pipeline hooks (§2.10 config-driven surface)."""

import numpy as np
import pyarrow as pa
import pytest

from tsdat_ray.config import (
    ConfigError,
    apply_overrides,
    load_pipeline_config,
    pipeline_config_from_dict,
    qc_config_from_dict,
)

YAML_DOC = """
out_root: /tmp/cfg_store
values: [n_tok, tok_mean]
tiers: ["1m", "1h"]
run_id: yamlrun
qc:
  attrs:
    n_tok: {warn_max: 100}
  managers:
    - name: n_tok_high
      checker: warn_max
      apply_to: [n_tok]
      assessment: Indeterminate
    - name: despike
      checker: despike_gn2002
      apply_to: [tok_mean]
      parameters: {n_iter: 2}
"""


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "pipe.yaml"
    p.write_text(YAML_DOC)
    cfg = load_pipeline_config(str(p))
    assert cfg.out_root == "/tmp/cfg_store"
    assert cfg.tiers == ("1m", "1h")
    assert cfg.qc is not None and len(cfg.qc.managers) == 2
    assert cfg.qc.managers[0].assessment == "Indeterminate"
    assert cfg.qc.managers[1].parameters == {"n_iter": 2}
    assert cfg.qc.attrs["n_tok"]["warn_max"] == 100


def test_overrides(tmp_path):
    p = tmp_path / "pipe.yaml"
    p.write_text(YAML_DOC)
    cfg = load_pipeline_config(str(p), overrides={"qc.attrs.n_tok.warn_max": 50,
                                                  "run_id": "r2"})
    assert cfg.qc.attrs["n_tok"]["warn_max"] == 50
    assert cfg.run_id == "r2"


def test_unknown_checker_and_option():
    with pytest.raises(ConfigError, match="unknown checker"):
        qc_config_from_dict({"managers": [{"name": "x", "checker": "nope", "apply_to": ["a"]}]})
    with pytest.raises(ConfigError, match="unknown pipeline option"):
        pipeline_config_from_dict({"out_root": "/tmp/x", "bogus": 1})


def test_hooks_run_in_pipeline(ray_session, tmp_path):
    import ray.data as rd

    # defined as a closure so cloudpickle ships it by value (a top-level
    # function in a pytest module isn't importable from Ray workers)
    def _double_tok_mean(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.column_names.index("tok_mean"), "tok_mean",
            pc.multiply(batch["tok_mean"], pa.scalar(2.0)),
        )

    from tsdat_ray.pipelines.rollup_pipeline import PipelineConfig, run_pipeline
    from tsdat_ray.synth import generate_sequences_parquet

    corpus = generate_sequences_parquet(str(tmp_path / "c"), n_rows=4000, seed=11)
    base = str(tmp_path / "plain")
    run_pipeline(corpus, PipelineConfig(out_root=base, resume=False, run_id="p"))
    hooked = str(tmp_path / "hooked")
    run_pipeline(corpus, PipelineConfig(out_root=hooked, resume=False, run_id="h",
                                        hooks={"customize": _double_tok_mean}))
    a = rd.read_parquet(f"{base}/raw").to_pandas().sort_values(["source", "ts"])
    b = rd.read_parquet(f"{hooked}/raw").to_pandas().sort_values(["source", "ts"])
    np.testing.assert_allclose(b["tok_mean"].to_numpy(), 2 * a["tok_mean"].to_numpy(),
                               rtol=1e-12, equal_nan=True)
