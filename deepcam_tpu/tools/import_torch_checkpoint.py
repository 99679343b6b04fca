"""Import a torch checkpoint (or pretrained Xception weights) into our model.

Inverse of the golden-test mapping (tests/test_golden_model.py converts OUR
params into the reference torch model's state_dict; this tool converts a torch
state_dict into our params/batch_stats pytree).  Covers the two reference
capabilities:

* checkpoint import — the reference saves ``{step, epoch, model, optimizer}``
  with DDP ``module.``-prefixed keys (``/root/reference/src/deepCam/
  train_hdf5_ddp.py:515-527``); we import params, BN running stats,
  step/epoch, and the Adam first/second moments into an optax state.
* pretrained-backbone import — ``Xception.__load_xception_pretrained``
  (``/root/reference/src/deepCam/architecture/deeplab_xception.py:254-280``)
  loads the cadene ImageNet Xception ``.pth`` into the backbone with key
  remapping (block12→block20, block11→block12, bn3→bn3+bn4, conv4→conv5,
  bn4→bn5; pointwise weights unsqueezed to 1x1) and keeps only the keys that
  exist in the target.  ``import_pretrained_xception`` mirrors that exactly,
  filling only the backbone slots that match and leaving the rest at init.

Layout transforms (NCHW torch → NHWC/HWIO flax):
  conv weight   OIHW      → HWIO  transpose (2, 3, 1, 0)
  deconv weight (I,O,kh,kw) → HWIO transpose (2, 3, 0, 1)
  BN: weight→scale, bias→bias, running_mean→mean, running_var→var
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

Assignment = Tuple[str, Tuple[str, ...], str]  # (torch key, our path, kind)

_KINDS = {
    "conv": lambda w: np.transpose(w, (2, 3, 1, 0)),
    "deconv": lambda w: np.transpose(w, (2, 3, 0, 1)),
    "raw": lambda w: w,
}


def strip_ddp_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Remove the DDP wrapper's ``module.`` prefix (train_hdf5_ddp.py:518)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def _bn(tk: str, path: Tuple[str, ...]) -> List[Assignment]:
    return [
        (f"{tk}.weight", ("params",) + path + ("scale",), "raw"),
        (f"{tk}.bias", ("params",) + path + ("bias",), "raw"),
        (f"{tk}.running_mean", ("batch_stats",) + path + ("mean",), "raw"),
        (f"{tk}.running_var", ("batch_stats",) + path + ("var",), "raw"),
    ]


def _sep(tk: str, path: Tuple[str, ...]) -> List[Assignment]:
    """torch SeparableConv2d{_same}: conv1 = depthwise, pointwise = 1x1."""
    return [
        (f"{tk}.conv1.weight", ("params",) + path + ("depthwise", "kernel"), "conv"),
        (f"{tk}.pointwise.weight", ("params",) + path + ("pointwise", "kernel"), "conv"),
    ]


def _block_assignments(
    sd_keys, tprefix: str, path: Tuple[str, ...], block_params: Dict[str, Any],
    allow_missing: bool = False,
) -> List[Assignment]:
    """Pair ``<tprefix>.rep.<i>`` children with our ordered sepconvK/bnK params.

    ReLUs carry no parameters so they never appear in the state_dict; the
    i-th sepconv child (ordered by rep index) maps to our sorted numeric
    sepconv names then the trailing stride/is_last sepconv, the i-th BN child
    to our sorted bnK — the same pairing as tests/test_golden_model.py's
    ``_load_block`` but driven by key strings instead of module instances.
    """
    rep = f"{tprefix}.rep."
    sep_idx = sorted(
        {int(k[len(rep):].split(".")[0]) for k in sd_keys
         if k.startswith(rep) and k.endswith(".conv1.weight")}
    )
    bn_idx = sorted(
        {int(k[len(rep):].split(".")[0]) for k in sd_keys
         if k.startswith(rep) and k.endswith(".running_mean")}
    )
    sep_names = [k for k in sorted(block_params)
                 if k.startswith("sepconv") and k[7:].isdigit()]
    bn_names = [k for k in sorted(block_params)
                if k.startswith("bn") and k[2:].isdigit()]
    trailing = ("sepconv_stride" if "sepconv_stride" in block_params
                else "sepconv_last" if "sepconv_last" in block_params else None)
    expect = len(sep_names) + (1 if trailing else 0)
    if allow_missing and (len(sep_idx) != expect or len(bn_idx) != len(bn_names)):
        # Partial source (pretrained ImageNet backbone): a block with no or
        # structurally-different rep children is skipped wholesale — safer
        # than a misaligned pairing; the reference drops unmatched keys too.
        return []
    if len(sep_idx) != expect or len(bn_idx) != len(bn_names):
        raise ValueError(
            f"{tprefix}: rep children mismatch — torch has {len(sep_idx)} "
            f"sepconvs / {len(bn_idx)} BNs, ours has {len(sep_names)}"
            f"{'+trailing' if trailing else ''} / {len(bn_names)}"
        )
    out: List[Assignment] = []
    for i, ti in enumerate(sep_idx):
        name = sep_names[i] if i < len(sep_names) else trailing
        out += _sep(f"{rep}{ti}", path + (name,))
    for i, ti in enumerate(bn_idx):
        out += _bn(f"{rep}{ti}", path + (bn_names[i],))
    if "skip_conv" in block_params:
        out.append((f"{tprefix}.skip.weight",
                    ("params",) + path + ("skip_conv", "kernel"), "conv"))
        out += _bn(f"{tprefix}.skipbn", path + ("skip_bn",))
    return out


def build_assignments(
    state_dict: Dict[str, Any], variables: Dict[str, Any],
    allow_missing: bool = False,
) -> List[Assignment]:
    """Full DeepLabv3_plus state_dict ↔ our variables correspondence."""
    sd_keys = list(state_dict)
    px = variables["params"]["xception"]
    a: List[Assignment] = []
    # Xception entry
    a.append(("xception_features.conv1.weight",
              ("params", "xception", "conv1", "kernel"), "conv"))
    a.append(("xception_features.conv2.weight",
              ("params", "xception", "conv2", "kernel"), "conv"))
    a += _bn("xception_features.bn1", ("xception", "bn1"))
    a += _bn("xception_features.bn2", ("xception", "bn2"))
    for i in range(1, 21):
        a += _block_assignments(
            sd_keys, f"xception_features.block{i}",
            ("xception", f"block{i}"), px[f"block{i}"],
            allow_missing=allow_missing,
        )
    for i in (3, 4, 5):
        a += _sep(f"xception_features.conv{i}", ("xception", f"conv{i}"))
        a += _bn(f"xception_features.bn{i}", ("xception", f"bn{i}"))
    # ASPP + global pool + projections
    for i in (1, 2, 3, 4):
        a.append((f"aspp{i}.atrous_convolution.weight",
                  ("params", f"aspp{i}", "atrous_conv", "kernel"), "conv"))
        a += _bn(f"aspp{i}.bn", (f"aspp{i}", "bn"))
    a.append(("global_avg_pool.1.weight",
              ("params", "gap_conv", "kernel"), "conv"))
    a += _bn("global_avg_pool.2", ("gap_bn",))
    a.append(("conv1.weight", ("params", "conv1", "kernel"), "conv"))
    a += _bn("bn1", ("bn1",))
    a.append(("conv2.weight", ("params", "conv2", "kernel"), "conv"))
    a += _bn("bn2", ("bn2",))
    # Deconv decoder
    up = ("upsample",)
    for i in (1, 2, 3):
        a.append((f"upsample.deconv{i}.0.weight",
                  ("params",) + up + (f"deconv{i}", "kernel"), "deconv"))
        a += _bn(f"upsample.deconv{i}.1", up + (f"deconv{i}_bn",))
    a.append(("upsample.last_deconv.0.weight",
              ("params",) + up + ("last_deconv", "kernel"), "deconv"))
    a.append(("upsample.conv1.0.weight",
              ("params",) + up + ("conv0", "kernel"), "conv"))
    a += _bn("upsample.conv1.1", up + ("bn0",))
    a.append(("upsample.conv1.3.weight",
              ("params",) + up + ("conv1", "kernel"), "conv"))
    a += _bn("upsample.conv1.4", up + ("bn1",))
    a.append(("upsample.conv1.6.weight",
              ("params",) + up + ("conv2", "kernel"), "conv"))
    a.append(("upsample.conv1.6.bias",
              ("params",) + up + ("conv2", "bias"), "raw"))
    return a


def _to_np(v) -> np.ndarray:
    # torch tensors expose .numpy(); detach first for safety.
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _set_path(tree: Dict[str, Any], path: Tuple[str, ...], value) -> None:
    node = tree
    for k in path[:-1]:
        node = node[k]
    old = node[path[-1]]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: ours {tuple(old.shape)} "
            f"vs torch {tuple(value.shape)}"
        )
    node[path[-1]] = value.astype(np.asarray(old).dtype)


def torch_to_variables(
    state_dict: Dict[str, Any], variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Convert a full DeepLabv3_plus state_dict into our variables pytree.

    ``variables`` supplies the target structure (from ``model.init``); every
    mapped slot is overwritten.  Raises if a torch key the mapping expects is
    absent or a shape disagrees.  Returns plain nested dicts of numpy arrays
    ({"params": ..., "batch_stats": ...}).
    """
    import jax

    sd = strip_ddp_prefix(state_dict)
    out = jax.tree_util.tree_map(lambda x: np.asarray(x), dict(variables))
    for tk, path, kind in build_assignments(sd, variables):
        if tk not in sd:
            raise KeyError(f"torch checkpoint is missing expected key {tk}")
        _set_path(out, path, _KINDS[kind](_to_np(sd[tk])))
    return out


# ---------------------------------------------------------------------------
# Pretrained Xception backbone (deeplab_xception.py:254-280)
# ---------------------------------------------------------------------------

def remap_pretrained_keys(pretrain_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reproduce ``__load_xception_pretrained``'s key remapping.

    block12→block20, block11→block12, bn3→{bn3, bn4}, conv4→conv5, bn4→bn5;
    pointwise weights reshaped (O,I)→(O,I,1,1).  Keys that do not exist in
    the modified backbone are dropped by the caller's matching step, same as
    the reference's ``if k in state_dict`` guard.
    """
    model_dict: Dict[str, Any] = {}
    for k, v in pretrain_dict.items():
        if "pointwise" in k:
            w = _to_np(v)
            if w.ndim == 2:
                w = w[:, :, None, None]
            v = w
        if k.startswith("block12"):
            model_dict[k.replace("block12", "block20")] = v
        elif k.startswith("block11"):
            model_dict[k.replace("block11", "block12")] = v
        elif k.startswith("conv3"):
            model_dict[k] = v
        elif k.startswith("bn3"):
            model_dict[k] = v
            model_dict[k.replace("bn3", "bn4")] = v
        elif k.startswith("conv4"):
            model_dict[k.replace("conv4", "conv5")] = v
        elif k.startswith("bn4"):
            model_dict[k.replace("bn4", "bn5")] = v
        else:
            model_dict[k] = v
    return model_dict


def import_pretrained_xception(
    pretrain_dict: Dict[str, Any], variables: Dict[str, Any]
) -> Tuple[Dict[str, Any], int]:
    """Fill backbone slots from a cadene ImageNet Xception ``.pth`` dict.

    Non-strict: only assignments whose remapped torch key exists AND whose
    shape matches are applied (the ImageNet Xception differs structurally —
    e.g. 3 input channels vs 16, 8 middle blocks vs 16 — exactly why the
    reference guards with ``if k in state_dict``).  Returns (variables,
    number of tensors imported).
    """
    import jax

    remapped = {
        f"xception_features.{k}": v
        for k, v in remap_pretrained_keys(pretrain_dict).items()
    }
    out = jax.tree_util.tree_map(lambda x: np.asarray(x), dict(variables))
    n = 0
    for tk, path, kind in build_assignments(
        remapped, variables, allow_missing=True
    ):
        if not tk.startswith("xception_features.") or tk not in remapped:
            continue
        try:
            _set_path(out, path, _KINDS[kind](_to_np(remapped[tk])))
            n += 1
        except ValueError:
            continue  # shape mismatch — slot keeps its init (reference drops it)
    return out, n


# ---------------------------------------------------------------------------
# Optimizer moments (Adam / AdamW / FusedLAMB all carry exp_avg / exp_avg_sq)
# ---------------------------------------------------------------------------

def torch_param_order(state_dict: Dict[str, Any]) -> List[str]:
    """Keys of *parameters* (not buffers) in registration order.

    ``state_dict`` preserves module registration order, which is also the
    ``net.parameters()`` order the torch optimizer's param_groups index into;
    buffers (BN running stats, num_batches_tracked) are excluded.
    """
    drop = ("running_mean", "running_var", "num_batches_tracked")
    return [k for k in state_dict if not k.endswith(drop)]


def import_adam_moments(
    opt_sd: Dict[str, Any],
    model_sd: Dict[str, Any],
    variables: Dict[str, Any],
) -> Tuple[int, Dict[str, Any], Dict[str, Any]]:
    """torch optimizer state → (count, mu, nu) params-shaped numpy trees."""
    import jax

    sd = strip_ddp_prefix(model_sd)
    order = torch_param_order(sd)
    idx_of = {}
    flat: List[int] = []
    for g in opt_sd["param_groups"]:
        flat.extend(g["params"])
    for pos, pid in enumerate(flat):
        idx_of[pid] = order[pos]
    bykey = {idx_of[pid]: st for pid, st in opt_sd["state"].items()}

    kind_of = {tk: (path, kind)
               for tk, path, kind in build_assignments(sd, variables)
               if path[0] == "params"}
    params_np = jax.tree_util.tree_map(
        lambda x: np.asarray(x), variables["params"]
    )
    mu = jax.tree_util.tree_map(np.zeros_like, params_np)
    nu = jax.tree_util.tree_map(np.zeros_like, params_np)
    count = 0
    for tk, st in bykey.items():
        if tk not in kind_of:
            continue
        path, kind = kind_of[tk]
        _set_path({"params": mu}, path, _KINDS[kind](_to_np(st["exp_avg"])))
        _set_path({"params": nu}, path, _KINDS[kind](_to_np(st["exp_avg_sq"])))
        count = max(count, int(np.asarray(_to_np(st.get("step", 0))).item()))
    return count, mu, nu


def inject_adam_moments(opt_state, count: int, mu, nu):
    """Replace every ScaleByAdamState in an optax state tree (Adam/AdamW/LAMB)."""
    import jax
    import optax

    found = [0]

    def visit(node):
        if isinstance(node, optax.ScaleByAdamState):
            found[0] += 1
            c = np.asarray(count, dtype=np.asarray(node.count).dtype)
            cast = lambda tmpl, val: jax.tree_util.tree_map(
                lambda t, v: np.asarray(v, dtype=np.asarray(t).dtype), tmpl, val
            )
            return optax.ScaleByAdamState(
                count=c, mu=cast(node.mu, mu), nu=cast(node.nu, nu)
            )
        if isinstance(node, tuple) and not hasattr(node, "_fields"):
            return tuple(visit(x) for x in node)
        if hasattr(node, "_fields"):  # NamedTuple (optax states)
            return type(node)(*(visit(getattr(node, f)) for f in node._fields))
        return node

    new = visit(opt_state)
    if not found[0]:
        raise ValueError("no ScaleByAdamState found in the optax state")
    return new


# ---------------------------------------------------------------------------
# CLI: torch .cpt → our .cpt
# ---------------------------------------------------------------------------

def convert_checkpoint(
    torch_path: str,
    out_path: str,
    optimizer: str = "AdamW",
    start_lr: float = 1e-3,
    adam_eps: float = 1e-8,
    weight_decay: float = 1e-6,
    channels: Optional[List[int]] = None,
    pretrained_backbone: bool = False,
) -> Dict[str, Any]:
    """Convert a reference ``<prefix>_step_<N>.cpt`` into our format.

    Builds the model + optimizer exactly as cli/train.py does, imports
    params / BN stats / step / epoch / Adam moments, and writes our msgpack
    checkpoint, directly consumable by ``--checkpoint``.
    """
    import jax
    import jax.numpy as jnp
    import torch
    from flax import serialization

    from ..models.deeplab import DeepLabv3plus
    from ..train.optim import build_optimizer
    from ..train.trainer import create_train_state

    blob = torch.load(torch_path, map_location="cpu")
    if pretrained_backbone:
        model_sd, step, epoch, opt_sd = blob, 0, 0, None
    else:
        model_sd = strip_ddp_prefix(blob["model"])
        step = int(blob.get("step", 0))
        epoch = int(blob.get("epoch", 0))
        opt_sd = blob.get("optimizer")

    n_in = len(channels) if channels else 16
    model = DeepLabv3plus(n_classes=3, output_stride=16, dtype=jnp.float32)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 64, 96, n_in), jnp.float32),
                             train=False)
    )(jax.random.PRNGKey(333))

    if pretrained_backbone:
        variables, n = import_pretrained_xception(model_sd, variables)
        print(f"imported {n} backbone tensors from pretrained weights")
    else:
        variables = torch_to_variables(model_sd, variables)

    tx = build_optimizer(optimizer, start_lr, eps=adam_eps,
                         weight_decay=weight_decay)
    state = create_train_state(model, variables, tx)
    opt_state = state.opt_state
    if opt_sd is not None and opt_sd.get("state"):
        count, mu, nu = import_adam_moments(opt_sd, model_sd, variables)
        opt_state = inject_adam_moments(opt_state, count, mu, nu)

    payload = {
        "step": np.asarray(step),
        "epoch": np.asarray(epoch),
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables["batch_stats"]),
        "opt_state": jax.device_get(opt_state),
    }
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    import os
    os.replace(tmp, out_path)
    return {"step": step, "epoch": epoch, "path": out_path}


def main():
    p = argparse.ArgumentParser(
        description="Import a torch DeepCAM checkpoint / pretrained backbone"
    )
    p.add_argument("--checkpoint", required=True,
                   help="torch .cpt ({step,epoch,model,optimizer}) or "
                        "pretrained xception .pth with --pretrained_backbone")
    p.add_argument("--output", required=True, help="our .cpt path to write")
    p.add_argument("--optimizer", default="AdamW",
                   choices=["Adam", "AdamW", "LAMB"])
    p.add_argument("--start_lr", type=float, default=1e-3)
    p.add_argument("--adam_eps", type=float, default=1e-8)
    p.add_argument("--weight_decay", type=float, default=1e-6)
    p.add_argument("--pretrained_backbone", action="store_true",
                   help="input is cadene ImageNet Xception weights, not a "
                        "training checkpoint")
    args = p.parse_args()
    info = convert_checkpoint(
        args.checkpoint, args.output, optimizer=args.optimizer,
        start_lr=args.start_lr, adam_eps=args.adam_eps,
        weight_decay=args.weight_decay,
        pretrained_backbone=args.pretrained_backbone,
    )
    print(info)


if __name__ == "__main__":
    main()
