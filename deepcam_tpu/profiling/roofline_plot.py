"""Roofline plotting — TPU analogue of ``analysis/roofline_plot.ipynb``.

The reference notebook plots nsight-profiled kernels against V100 memory/
compute roofs (L1/L2/HBM, FP16 TC).  Here we plot measured phases (from
``cli/profile.py`` reports or ``RooflineReport``s) against the TPU peaks in
``profiler.TPU_PEAKS``.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Optional

import numpy as np

from .profiler import TPU_PEAKS, RooflineReport


def plot_roofline(
    points: Iterable[RooflineReport | Mapping],
    generation: str = "v5e",
    output_path: str = "roofline.png",
    title: Optional[str] = None,
):
    """Render an arithmetic-intensity vs TFLOP/s roofline with the given
    measured points.  ``points`` may be RooflineReports or dicts with keys
    ``arithmetic_intensity``/``achieved_tflops`` (+ optional ``label``)."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    peaks = TPU_PEAKS[generation]
    peak_tf = peaks["bf16_tflops"]
    hbm_gbps = peaks["hbm_gbps"]

    ai = np.logspace(-2, 4, 200)
    mem_roof = np.minimum(ai * hbm_gbps / 1e3, peak_tf)

    fig, ax = plt.subplots(figsize=(8, 6))
    ax.loglog(ai, mem_roof, "-", color="black", lw=2,
              label=f"HBM {hbm_gbps:.0f} GB/s / MXU {peak_tf:.0f} TF/s")
    ridge = peak_tf * 1e3 / hbm_gbps
    ax.axvline(ridge, color="gray", ls=":", lw=1)

    for p in points:
        if isinstance(p, RooflineReport):
            x, y, label = p.arithmetic_intensity, p.achieved_tflops, p.generation
        else:
            x = p["arithmetic_intensity"]
            y = p["achieved_tflops"]
            label = p.get("label", "")
        ax.plot([x], [y], "o", markersize=10, label=label or None)

    ax.set_xlabel("arithmetic intensity [FLOP/byte]")
    ax.set_ylabel("achieved [TFLOP/s]")
    ax.set_title(title or f"TPU {generation} roofline")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend(loc="lower right", fontsize=8)
    fig.savefig(output_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return output_path
