"""Declarative pipeline assembly — the engine's user-extension surface
(SURVEY.md section 2.9): a list of PipelineStep(name, op, params) that the
driver turns into a Dataset chain, mirroring how reference users chain
library calls (covariate-dict + scalar-function conventions,
libraries/terrain_tools.py:1093-1114).

The registry maps op names to stage FACTORIES: factory(**params) returns
either a batch function (wired via map_batches) or a Dataset->Dataset
callable (wired directly, for stages that need groupbys/joins).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class PipelineStep:
    name: str
    op: str
    params: dict[str, Any] = field(default_factory=dict)
    batch_format: str = "pyarrow"


def _batch_stage(factory):
    return ("batch", factory)


def _dataset_stage(factory):
    return ("dataset", factory)


def default_registry() -> dict[str, tuple[str, Callable]]:
    from ..functions.soil import pedotransfer_stage
    from ..functions.timeavg import time_average_stage
    from ..stages.spans import attach_cell, explode_geo_points
    from ..stages.text import fingerprint_stage, token_count_stage

    return {
        # batch-function stages
        "explode_geo": _batch_stage(lambda: explode_geo_points),
        "attach_cell": _batch_stage(lambda res=6: (lambda b: attach_cell(b, res))),
        "pedotransfer": _batch_stage(lambda props=("ksat",), **kw: pedotransfer_stage(list(props), **kw)),
        "token_count": _batch_stage(token_count_stage),
        "fingerprint": _batch_stage(fingerprint_stage),
        "time_average": _batch_stage(time_average_stage),
        # dataset-level stages
        "normalize": _dataset_stage(
            lambda col, out_col=None: (
                lambda ds: __import__(
                    "geospatialtools_ray.functions.geometry", fromlist=["geometry"]
                ).normalize_stage(ds, col, out_col)
            )
        ),
        "exact_dedup": _dataset_stage(
            lambda **kw: (
                lambda ds: __import__(
                    "geospatialtools_ray.stages.dedup", fromlist=["dedup"]
                ).exact_dedup(ds, **kw)
            )
        ),
    }


def build_pipeline(ds, steps: list[PipelineStep], registry: dict | None = None):
    """Assemble the Dataset chain. Unknown op -> ValueError naming the step."""
    reg = registry or default_registry()
    for step in steps:
        if step.op not in reg:
            raise ValueError(f"step {step.name!r}: unknown op {step.op!r} (registry: {sorted(reg)})")
        kind, factory = reg[step.op]
        made = factory(**step.params)
        if kind == "batch":
            ds = ds.map_batches(made, batch_format=step.batch_format)
        else:
            ds = made(ds)
    return ds
