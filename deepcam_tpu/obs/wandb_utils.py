"""Optional Weights & Biases integration.

Parity target: the ``have_wandb`` guarded blocks in
``/root/reference/src/deepCam/train_hdf5_ddp.py:32-37,139-183,416-419,
501-503`` — credential file ``.wandbirc`` in ``--wandb_certdir``, rank-0-only
init with resume-by-run_tag, config mirror of hyperparameters, scalar logs
for train/eval loss/accuracy/lr, and image logs for visualizations.  All
calls degrade to no-ops when wandb is not installed or not enabled.
"""

from __future__ import annotations

import os
import subprocess
from typing import Any, Mapping, Optional

try:
    import wandb as _wandb

    HAVE_WANDB = True
except ImportError:
    _wandb = None
    HAVE_WANDB = False


class WandbLogger:
    """Rank-0 wandb session; inert when disabled/unavailable."""

    def __init__(
        self,
        enable: bool,
        rank: int,
        certdir: str,
        run_tag: str,
        resume_logging: bool = False,
        project: str = "deepcam",
        config: Optional[Mapping[str, Any]] = None,
    ):
        self.active = bool(enable and HAVE_WANDB and rank == 0)
        if not self.active:
            return
        certfile = os.path.join(certdir, ".wandbirc")
        try:
            with open(certfile) as f:
                token = f.readlines()[0].replace("\n", "").split()
                wblogin, wbtoken = token[0], token[1]
        except (IOError, IndexError):
            print(f"Error, cannot open WandB certificate {certfile}.")
            self.active = False
            return
        subprocess.call(["wandb", "login", wbtoken])
        resume_flag = run_tag if resume_logging else False
        _wandb.init(
            entity=wblogin, project=project, name=run_tag, id=run_tag,
            resume=resume_flag,
        )
        if config:
            for k, v in config.items():
                setattr(_wandb.config, k, v)

    def log(self, metrics: Mapping[str, Any], step: int):
        if self.active:
            _wandb.log(dict(metrics), step=step)

    def log_image(self, key: str, path: str, caption: str, step: int):
        if self.active:
            _wandb.log(
                {key: [_wandb.Image(path, caption=caption)]}, step=step
            )

    def watch(self, params: Any, grads: Optional[Any], step: int):
        """Parameter / gradient histograms — the functional analogue of the
        reference's ``wandb.watch(net)`` (train_hdf5_ddp.py:326), which
        hooks torch modules to log per-layer histograms.  JAX has no module
        hooks; instead the driver passes the param pytree (and, when
        available, the grad pytree) and we log one histogram per leaf at
        the same cadence wandb.watch uses (the log frequency)."""
        if not self.active:
            return
        import jax
        import numpy as np

        payload = {}
        for prefix, tree in (("parameters", params), ("gradients", grads)):
            if tree is None:
                continue
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
                name = "/".join(
                    getattr(p, "key", getattr(p, "name", str(p)))
                    for p in path
                )
                payload[f"{prefix}/{name}"] = _wandb.Histogram(
                    np.asarray(leaf, np.float32).ravel()
                )
        if payload:
            _wandb.log(payload, step=step)
