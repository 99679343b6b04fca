"""Per-family Pallas kernel efficiency audit (r3 VERDICT item 5).

The r3 trace shows 44.5 ms/step inside 252 pallas custom-calls — 27% of the
step in code this repo fully controls — but the trace's ``model_flops``
counters are zero for custom-calls (XLA cannot see inside them), so no
roofline placement existed.  This script joins the trace's custom-call rows
(grouped by model scope → xception block/unit, forward vs backward) with an
ANALYTIC flop/byte model of each fused-sepconv unit, producing achieved
TF/s and GB/s per family vs the v5e roofs (197 TF/s bf16, 819 GB/s HBM).

The unit inventory is recorded live from the model via an eval_shape hook
(no hand-maintained table): every SeparableConv2dSame call's
(name, input shape, features, stride, dilation) at the production
(768, 1152) resolution.

Usage:  python scripts/kernel_audit.py [logdir=/tmp/xprof_step] [batch=4]
(The logdir must hold an xprof trace captured by scripts/step_trace.py.)
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

sys.path.insert(0, "/root/repo")

LOGDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_step"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4
PEAK_TF, HBM_GBPS = 197.0, 819.0


def record_units(batch):
    """(block, unit) -> dict(shape/features/stride/dilation) via a module
    hook under eval_shape — zero compute, self-maintaining inventory."""
    from deepcam_tpu.models import layers as L
    from deepcam_tpu.models.deeplab import DeepLabv3plus

    records = {}
    orig = L.SeparableConv2dSame.__call__

    def wrapped(self, x, bn_fold=None, emit_stats=False, boundary=None):
        # flax scope path, e.g. ('xception', 'block8') + self.name
        path = "/".join(p for p in self.scope.path if not p.startswith("_"))
        records[(path, self.name)] = dict(
            h=x.shape[1], w=x.shape[2], c=x.shape[3], f=self.features,
            stride=self.stride, dilation=self.dilation,
        )
        return orig(self, x, bn_fold=bn_fold, emit_stats=emit_stats,
                    boundary=boundary)

    L.SeparableConv2dSame.__call__ = wrapped
    try:
        model = DeepLabv3plus(n_classes=3, dtype=jnp.bfloat16)
        x = jnp.zeros((batch, 768, 1152, 16), jnp.bfloat16)
        jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    finally:
        L.SeparableConv2dSame.__call__ = orig
    return records


def analytic(u, batch, bwd):
    """Inherent (flops, bytes) of one [relu→]dw3x3→pw unit fwd or bwd.

    fwd:  dw = B·Ho·Wo·C·9·2, pw = B·Ho·Wo·C·F·2; bytes = x in + y out
          (+ small stats/weights).
    bwd:  dx needs dpw-transpose contraction (C·F) + dw taps (9C);
          d_pw = x̃ᵀ·dy (C·F); d_dw = 9 taps (9C) — ≈ 2× the fwd
          contraction FLOPs.  bytes ≈ x + dy in, dx out (+ residuals).
    """
    ho, wo = u["h"] // u["stride"], u["w"] // u["stride"]
    px = BATCH * ho * wo if batch is None else batch * ho * wo
    dw_f = px * u["c"] * 9 * 2
    pw_f = px * u["c"] * u["f"] * 2
    x_b = BATCH * u["h"] * u["w"] * u["c"] * 2
    y_b = px * u["f"] * 2
    if not bwd:
        return dw_f + pw_f, x_b + y_b
    return 2 * (dw_f + pw_f), 2 * x_b + y_b


def main():
    from deepcam_tpu.profiling.op_table import load_device_ops, per_step

    units = record_units(BATCH)
    ops = load_device_ops(LOGDIR)
    n_steps = ops.attrs.get("n_steps") or 1

    cc = ops[ops["category"].str.contains("custom", case=False, na=False)]
    if cc.empty:
        print("no custom-call rows in trace — nothing to audit")
        return 1

    def family(scope):
        # ".../xception/block8/sepconv1/..." -> ("block8/sepconv1", bwd?)
        bwd = "transpose" in scope
        parts = scope.split("/")
        for i, p in enumerate(parts):
            if p.startswith("block") or p in ("conv3", "conv4", "conv5"):
                if p.startswith("block") and i + 1 < len(parts) and \
                        parts[i + 1].startswith("sepconv"):
                    return f"{p}/{parts[i + 1]}", bwd
                return p, bwd
        return "(other)", bwd

    fams = cc["scope"].map(lambda s: family(s))
    cc = cc.assign(fam=[f for f, _ in fams], bwd=[b for _, b in fams])
    g = cc.groupby(["fam", "bwd"], sort=False)
    tab = pd.DataFrame({
        "time_ms": g["time_ms"].sum() / n_steps,
        "calls": g.size() / n_steps,
    })

    # join the analytic model (the flax scope path ends with the module's
    # own name: "xception/block8/sepconv1")
    def lookup(fam):
        for (path, name), u in units.items():
            parts = path.split("/")
            key = "/".join(parts[-2:]) if len(parts) >= 2 else path
            if fam in (key, name, parts[-1]):
                return u
        return None

    rows = []
    for (fam, bwd), r in tab.iterrows():
        u = lookup(fam)
        if u is None:
            rows.append((fam, bwd, r.time_ms, r.calls, np.nan, np.nan,
                         np.nan, np.nan))
            continue
        fl, by = analytic(u, None, bwd)
        tf = fl / (r.time_ms * 1e-3) / 1e12
        gb = by / (r.time_ms * 1e-3) / 1e9
        rows.append((fam, bwd, r.time_ms, r.calls, tf,
                     100 * tf / PEAK_TF, gb, 100 * gb / HBM_GBPS))
    out = pd.DataFrame(rows, columns=[
        "family", "bwd", "ms_per_step", "calls", "achieved_tf",
        "pct_mxu_peak", "achieved_gbps", "pct_hbm_peak",
    ]).sort_values("ms_per_step", ascending=False)
    with pd.option_context("display.width", 200, "display.max_rows", 200,
                           "display.float_format", "{:.2f}".format):
        print(f"== pallas custom-call roofline audit "
              f"(total {out.ms_per_step.sum():.2f} ms/step, "
              f"{out.calls.sum():.0f} calls/step)")
        print(out.to_string(index=False))
        # speed-of-light summary: what the same work would cost at the roof
        known = out.dropna()
        sol = sum(max(r.achieved_tf * r.ms_per_step / PEAK_TF,
                      r.achieved_gbps * r.ms_per_step / HBM_GBPS)
                  for r in known.itertuples())
        print(f"== speed-of-light time for the audited work: {sol:.2f} ms "
              f"(now {known.ms_per_step.sum():.2f} ms → "
              f"{known.ms_per_step.sum() - sol:.2f} ms headroom)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
