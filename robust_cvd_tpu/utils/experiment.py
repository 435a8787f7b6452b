"""Experiment tag naming + stage tracing.

Tag grammar parity with reference loss/loss_params.py:114-144 +
depth_fine_tuning.py:194-204 so experiment directories line up between
implementations.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List

from ..config import LossParams, PipelineConfig


def make_loss_str(loss: LossParams, exp_tag: str = "short") -> str:
    if exp_tag == "short":
        return (
            f"StD{loss.lambda_static_depth_ratio}"
            f"_StR{loss.lambda_static_reprojection}"
            f"_SmD{loss.lambda_smooth_depth_ratio}"
            f"_SmR{loss.lambda_smooth_reprojection}"
        )
    dist = loss.distance_type_static
    dist_str = dist
    if dist == "general":
        dist_str += f"-a{loss.distance_alpha}"
    if loss.distance_scale != 1:
        dist_str += f"-c{loss.distance_scale}"
    return (
        f"B{loss.lambda_static_disparity}"
        f"_R{loss.lambda_static_reprojection}"
        f"_St{loss.lambda_scene_flow_static}"
        f"_Sp{loss.lambda_disparity_smooth}"
        f"_{dist_str}"
        f"_PL1-{loss.lambda_parameter}"
    )


def make_tag(cfg: PipelineConfig) -> str:
    """(reference depth_fine_tuning.py:194-204)."""
    if cfg.exp_tag == "short":
        return make_loss_str(cfg.loss, "short")
    lr = cfg.ft.learning_rate
    return (
        make_loss_str(cfg.loss, "full")
        + f"_LR{lr}"
        + f"_BS{cfg.ft.batch_size}"
        + f"_O{cfg.ft.optimizer.lower()}"
        + f"_S{cfg.scaling}"
    )


class StageTracer:
    """Structured per-stage wall-clock tracing (the reference sprinkles
    perf_counter prints, depth_fine_tuning.py:228-602; this records spans
    and can emit a JSON timeline + drive jax.profiler traces)."""

    def __init__(self, profile_dir: str | None = None):
        self.spans: List[Dict] = []
        self.profile_dir = profile_dir

    @contextlib.contextmanager
    def span(self, name: str, **meta):
        t0 = time.perf_counter()
        prof = None
        if self.profile_dir:
            import jax

            prof = jax.profiler.trace(self.profile_dir)
            prof.__enter__()
        try:
            yield
        finally:
            if prof is not None:
                prof.__exit__(None, None, None)
            self.spans.append(
                {"name": name, "sec": time.perf_counter() - t0, **meta}
            )

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for s in self.spans:
            out[s["name"]] = out.get(s["name"], 0.0) + s["sec"]
        return out

    def save(self, path):
        with open(path, "w") as f:
            json.dump({"spans": self.spans, "summary": self.summary()}, f, indent=1)
