"""Training-run analysis: MLLOG → summary + loss/accuracy/lr curves.

Script-form parity with ``/root/reference/analysis/training_analysis.ipynb``.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepcam_tpu.obs.analysis import run_summary  # noqa: E402


def plot_curves(summary, output_dir):
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    run_start = summary["run_start_ms"] or 0

    fig, axes = plt.subplots(1, 3, figsize=(18, 5))
    for ax, keys, ylabel in [
        (axes[0], ["train_loss", "eval_loss"], "loss"),
        (axes[1], ["train_accuracy", "eval_accuracy"], "mean IoU"),
        (axes[2], ["learning_rate"], "learning rate"),
    ]:
        for key in keys:
            series = summary[key]
            if not series:
                continue
            t = [(ms - run_start) / 1e3 for ms, _, _ in series]
            v = [val for _, _, val in series]
            ax.plot(t, v, marker="o", markersize=3, label=key)
        ax.set_xlabel("seconds since run_start")
        ax.set_ylabel(ylabel)
        ax.grid(alpha=0.3)
        ax.legend()
    if summary["target_accuracy_reached"]:
        axes[1].axhline(0.82, color="red", ls="--", lw=1)
    out = os.path.join(output_dir, "training_curves.png")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out


def main():
    p = argparse.ArgumentParser(description="Analyze a DeepCAM MLPerf run log")
    p.add_argument("--log", required=True)
    p.add_argument("--output_dir", default="analysis_out")
    args = p.parse_args()

    summary = run_summary(args.log)
    printable = {
        k: v for k, v in summary.items()
        if not isinstance(v, list)
    }
    printable["n_train_loss_points"] = len(summary["train_loss"])
    printable["n_eval_points"] = len(summary["eval_accuracy"])
    print(json.dumps(printable, indent=2))
    out = plot_curves(summary, args.output_dir)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
