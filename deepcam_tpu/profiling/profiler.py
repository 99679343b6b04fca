"""Profiling: region-scoped tracing, HLO cost analysis, roofline placement.

Parity targets:
* ``/root/reference/src/deepCam/profile_hdf5_ddp.py:77-94`` — the ``Profile``
  context manager that toggles the CUDA profiler for one of
  Forward/Backward/Optimizer after warmup.  TPU equivalent:
  ``jax.profiler.start_trace/stop_trace`` (xprof) + ``TraceAnnotation``
  regions.
* ``analysis/roofline_plot.ipynb`` / ``run_profiling_*.sh`` — nsight metric
  sweeps + V100 roofline placement.  TPU equivalent: XLA compiled-module cost
  analysis (FLOPs, bytes) + achieved-vs-peak MXU/HBM placement.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax

# Peak numbers for roofline placement (per chip).  v5e ("v5 lite"): 197
# bf16 TFLOP/s MXU, 819 GB/s HBM.  Extend as needed per generation.
TPU_PEAKS = {
    "v5e": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "v5p": {"bf16_tflops": 459.0, "hbm_gbps": 2765.0},
    "v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0},
}


class Profile:
    """Region-scoped profiler (parity: profile_hdf5_ddp.py Profile).

    Emits an xprof ``TraceAnnotation`` named ``name`` every time; when
    ``name == target`` and ``step >= warmup_steps`` it also starts/stops a
    full device trace into ``logdir`` (once).
    """

    _trace_active = False

    def __init__(
        self,
        name: str,
        step: int,
        target: Optional[str] = None,
        warmup_steps: int = 0,
        logdir: Optional[str] = None,
    ):
        self.name = name
        self.step = step
        self.target = target
        self.warmup_steps = warmup_steps
        self.logdir = logdir
        self._annotation = None
        self._started_trace = False

    def __enter__(self):
        if (
            self.target is not None
            and self.name == self.target
            and self.step >= self.warmup_steps
            and self.logdir
            and not Profile._trace_active
        ):
            jax.profiler.start_trace(self.logdir)
            Profile._trace_active = True
            self._started_trace = True
        self._annotation = jax.profiler.TraceAnnotation(self.name)
        self._annotation.__enter__()
        return self

    def __exit__(self, *exc):
        self._annotation.__exit__(*exc)
        if self._started_trace:
            jax.profiler.stop_trace()
            Profile._trace_active = False
        return False


def cost_analysis(fn: Callable, *example_args) -> Dict[str, float]:
    """FLOPs / bytes-accessed of a jitted function from XLA's cost model."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns [dict]
        costs = costs[0]
    return {
        "flops": float(costs.get("flops", 0.0)),
        "bytes_accessed": float(costs.get("bytes accessed", 0.0)),
    }


@dataclass
class RooflineReport:
    flops: float
    bytes_accessed: float
    seconds_per_call: float
    achieved_tflops: float
    achieved_gbps: float
    arithmetic_intensity: float
    mxu_utilization: float  # vs peak bf16
    hbm_utilization: float
    generation: str

    def summary(self) -> str:
        return (
            f"[roofline/{self.generation}] {self.achieved_tflops:.1f} TF/s "
            f"({100 * self.mxu_utilization:.1f}% MXU peak), "
            f"{self.achieved_gbps:.0f} GB/s ({100 * self.hbm_utilization:.1f}% HBM), "
            f"AI={self.arithmetic_intensity:.1f} flop/byte, "
            f"{1e3 * self.seconds_per_call:.1f} ms/call"
        )


def roofline(
    fn: Callable,
    *example_args,
    generation: str = "v5e",
    iters: int = 5,
) -> RooflineReport:
    """Place a jitted function on the TPU roofline: measure wall time, read
    FLOPs/bytes from XLA cost analysis, compare with chip peaks."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    flops = float(costs.get("flops", 0.0))
    nbytes = float(costs.get("bytes accessed", 0.0))

    from ..utils.sync import host_sync

    out = compiled(*example_args)
    host_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*example_args)
    host_sync(out)
    dt = (time.perf_counter() - t0) / iters

    peaks = TPU_PEAKS.get(generation, TPU_PEAKS["v5e"])
    achieved_tflops = flops / dt / 1e12
    achieved_gbps = nbytes / dt / 1e9
    return RooflineReport(
        flops=flops,
        bytes_accessed=nbytes,
        seconds_per_call=dt,
        achieved_tflops=achieved_tflops,
        achieved_gbps=achieved_gbps,
        arithmetic_intensity=flops / max(nbytes, 1.0),
        mxu_utilization=achieved_tflops / peaks["bf16_tflops"],
        hbm_utilization=achieved_gbps / peaks["hbm_gbps"],
        generation=generation,
    )
