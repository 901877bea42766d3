"""YAML pipeline configuration — the engine's config-driven surface.

The reference wires every component from yaml (classname + parameters,
recursively instantiated — /root/reference/tsdat/config/pipeline/
pipeline_config.py:117-140, config/utils/recursive_instantiate.py:17-83) with
``Overrideable`` file references + JSON-pointer overrides
(pipeline_config.py:98-115).  The engine keeps the registry idea but minimal
(SURVEY §2.10): checkers/handlers are name-keyed registries, so a config is
plain data — this module maps a yaml document onto ``PipelineConfig`` /
``QCConfig`` and applies simple dotted-path overrides.

Example (see tests/test_config.py):

    out_root: /data/store
    values: [n_tok, tok_mean]
    tiers: ["1m", "1h", "1d"]
    qc:
      attrs:
        n_tok: {warn_max: 100}
      managers:
        - name: n_tok_high
          checker: warn_max
          apply_to: [n_tok]
          assessment: Indeterminate
        - name: bad_run
          checker: fail_range_max
          apply_to: [DATA_VARS]
          exclude: [tok_mean]
          handlers:
            - name: record_quality_results
            - name: remove_failed_values

Hooks: ``customize`` (after standardize, before the clean shuffle) and
``finalize`` (after QC, before write) mirror the reference's
``hook_customize_dataset`` / ``hook_finalize_dataset``
(ingest_pipeline.py:51-87); they are plain callables (batch → batch) given
programmatically — yaml names a dotted import path.
"""

from __future__ import annotations

import importlib
from typing import Any

from .pipelines.rollup_pipeline import PipelineConfig
from .stages.qc import CHECKERS, Manager, QCConfig


class ConfigError(ValueError):
    pass


def _load_callable(path: str):
    mod, _, name = path.rpartition(".")
    if not mod:
        raise ConfigError(f"hook {path!r} is not a dotted import path")
    return getattr(importlib.import_module(mod), name)


def qc_config_from_dict(d: dict) -> QCConfig:
    managers = []
    for m in d.get("managers", []):
        if m["checker"] not in CHECKERS:
            raise ConfigError(
                f"unknown checker {m['checker']!r}; known: {sorted(CHECKERS)}"
            )
        managers.append(
            Manager(
                name=m["name"],
                checker=m["checker"],
                apply_to=tuple(m.get("apply_to", ())),
                exclude=tuple(m.get("exclude", ())),
                parameters=dict(m.get("parameters", {})),
                handlers=tuple(m["handlers"]) if "handlers" in m
                else ({"name": "record_quality_results"},),
                assessment=m.get("assessment", "Bad"),
            )
        )
    return QCConfig(
        managers=tuple(managers),
        attrs=dict(d.get("attrs", {})),
        coords=tuple(d.get("coords", ("ts",))),
    )


def pipeline_config_from_dict(d: dict) -> PipelineConfig:
    d = dict(d)
    qc = d.pop("qc", None)
    hooks = d.pop("hooks", None)
    kwargs: dict[str, Any] = {}
    allowed = set(PipelineConfig.__dataclass_fields__)
    for k, v in d.items():
        if k not in allowed:
            raise ConfigError(f"unknown pipeline option {k!r}")
        if k in ("values", "tiers", "encode_tiers"):
            v = tuple(v)
        kwargs[k] = v
    cfg = PipelineConfig(**kwargs)
    if qc:
        cfg.qc = qc_config_from_dict(qc)
    if hooks:
        cfg.hooks = {k: _load_callable(v) if isinstance(v, str) else v
                     for k, v in hooks.items()}
    return cfg


def apply_overrides(doc: dict, overrides: dict[str, Any]) -> dict:
    """Dotted-path overrides onto a config document (the engine's version of
    the reference's JSON-pointer Overrideable):
    ``{"qc.attrs.n_tok.warn_max": 50}``."""
    import copy

    out = copy.deepcopy(doc)
    for path, value in overrides.items():
        cur = out
        parts = path.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = value
    return out


def load_pipeline_config(path: str, overrides: dict[str, Any] | None = None) -> PipelineConfig:
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    if overrides:
        doc = apply_overrides(doc, overrides)
    return pipeline_config_from_dict(doc)
