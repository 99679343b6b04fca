"""DeepLabV3+ segmentation head + full model, TPU-native.

Parity target: ``/root/reference/src/deepCam/architecture/deeplab_xception.py``
(``ASPP_module`` :282, ``InterpolationUpsampler`` :315, ``DeconvUpsampler``
:347, ``DeepLabv3_plus`` :398).  Layouts are NHWC, compute dtype configurable
(bf16 on TPU), params fp32.

Init parity notes (see layers.py docstring): the Xception/ASPP trees use
torch-kaiming-normal; the global-average-pool conv, the 1280→256 and 128→48
projection convs, and the entire decoder keep PyTorch *default* init because
the reference never calls their (name-mangled) ``__init_weight`` methods.
"""

from __future__ import annotations

import os
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear_align_corners
from .layers import (
    BatchNorm2d,
    Conv2d,
    ConvTranspose2d,
    _KernelParam,
    conv2d,
    kaiming_normal_torch,
    torch_default_conv_kernel_init,
)
from .xception import Xception

Dtype = Any


def _split_concat() -> bool:
    """DEEPCAM_SPLIT_CONCAT: lower ``conv(concat(parts))`` as the
    mathematically-identical ``Σ conv(part, k_slice)`` — the concatenated
    tensor (ASPP's 1280-lane merge, the decoder's unaligned 304-lane
    skip-join) never materializes and each partial conv's epilogue fuses
    the add.  Parameter tree is unchanged (one kernel, sliced); numerics
    differ only by bf16 rounding of the partial sums (parity test:
    tests/test_model.py).

    Default ON since r5 wave-1/2: 25.65/25.64 vs same-session controls
    25.32/25.33 (+1.3%, twice) on the r4-final graph — the r2 verdict
    (0.995x) predated BLOCK_LOSS/boundary-fold/EMIT_D and inverted.
    DEEPCAM_SPLIT_CONCAT=0 opts out."""
    return os.environ.get("DEEPCAM_SPLIT_CONCAT", "1") == "1"


def _conv_concat_split(parts, kernel, *, padding, compute_dtype):
    """``conv2d(concat(parts, -1), kernel)`` without the concat."""
    from ..parallel.spatial import conv3x3_strip_fix, spatial_active

    out = None
    off = 0
    k = kernel.astype(compute_dtype)
    # under spatial H-sharding each 3x3 partial conv gets its own halo
    # strip (the corrections are additive across parts, like the convs)
    sp = spatial_active() and kernel.shape[0] == 3 and padding == 1
    for p in parts:
        c = p.shape[-1]
        ks = k[:, :, off:off + c]
        y = conv2d(p.astype(compute_dtype), ks, padding=padding)
        if sp:
            y = conv3x3_strip_fix(y, p.astype(compute_dtype), ks, 1, 1)
        out = y if out is None else out + y
        off += c
    return out


class ASPPModule(nn.Module):
    """Atrous spatial pyramid pooling branch (``ASPP_module``, :282-312).

    rate == 1 → 1x1 conv, padding 0; rate > 1 → 3x3 conv, padding = dilation =
    rate.  Conv(no bias) + BN + ReLU, torch-kaiming-normal init.
    """

    features: int
    rate: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 1:
            kernel_size, padding = 1, 0
        else:
            kernel_size, padding = 3, self.rate
        x = Conv2d(
            self.features,
            kernel_size,
            stride=1,
            padding=padding,
            dilation=self.rate,
            kernel_init=kaiming_normal_torch(),
            dtype=self.dtype,
            name="atrous_conv",
        )(x)
        x = BatchNorm2d(dtype=self.dtype, name="bn")(x, train)
        return nn.relu(x)


class InterpolationUpsampler(nn.Module):
    """Bilinear-upsampling decoder (``InterpolationUpsampler``, :315-344).

    Present in the reference API surface but NOT the active decoder
    (:438-439); provided for full capability parity.  PyTorch-default init
    (its ``__init_weight`` is never called).
    """

    n_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, low_level_features, input_hw, train: bool):
        h, w = input_hw
        quarter = (-(-h // 4), -(-w // 4))  # ceil(H/4), ceil(W/4)
        x = resize_bilinear_align_corners(x, quarter)
        x = jnp.concatenate([x, low_level_features], axis=-1)
        x = Conv2d(
            256, 3, padding=1, kernel_init=torch_default_conv_kernel_init(),
            dtype=self.dtype, name="conv0",
        )(x)
        x = BatchNorm2d(dtype=self.dtype, name="bn0")(x, train)
        x = nn.relu(x)
        x = Conv2d(
            256, 3, padding=1, kernel_init=torch_default_conv_kernel_init(),
            dtype=self.dtype, name="conv1",
        )(x)
        x = BatchNorm2d(dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = Conv2d(
            self.n_classes, 1, use_bias=True,
            kernel_init=torch_default_conv_kernel_init(),
            dtype=self.dtype, name="conv2",
        )(x)
        return resize_bilinear_align_corners(x, (h, w))


class DeconvUpsampler(nn.Module):
    """Transposed-convolution decoder — the active one (``DeconvUpsampler``,
    :347-383).  Four exact-×2 deconvs (k3 s2 p1 op1); the 304→256 refinement
    stack sits between deconv2 and deconv3; the final deconv has no BN/bias.
    PyTorch-default init throughout (``__init_weight`` never called)."""

    n_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, low_level_features, input_hw, train: bool,
                 block_logits: bool = False):
        # Fuse each BN-apply + ReLU pair into one op (identical math; see
        # BatchNorm2d.relu) — the decoder sits in the dilated deconvs'
        # layout-conversion neighborhood where a separate relu pays a full
        # copy pair.  DEEPCAM_BN_RELU=0 restores the two-op form.
        fr = os.environ.get("DEEPCAM_BN_RELU", "1") == "1"

        def bn_relu(x, name):
            x = BatchNorm2d(dtype=self.dtype, name=name)(x, train, relu=fr)
            return x if fr else nn.relu(x)

        x = ConvTranspose2d(256, dtype=self.dtype, name="deconv1")(x)
        x = bn_relu(x, "deconv1_bn")
        x = ConvTranspose2d(256, dtype=self.dtype, name="deconv2")(x)
        x = bn_relu(x, "deconv2_bn")

        if _split_concat():
            # conv0 over the virtual 304-lane concat as two partial convs
            # (the 304-lane tensor pads to 384 lanes on TPU and its concat
            # was ~5 ms/step of layout copies in the r2 trace)
            k0 = _KernelParam(
                (3, 3, 256 + low_level_features.shape[-1], 256),
                torch_default_conv_kernel_init(), name="conv0",
            )()
            x = _conv_concat_split(
                [x, low_level_features], k0, padding=1,
                compute_dtype=self.dtype,
            )
        else:
            x = jnp.concatenate([x, low_level_features], axis=-1)  # 304
            x = Conv2d(
                256, 3, padding=1,
                kernel_init=torch_default_conv_kernel_init(),
                dtype=self.dtype, name="conv0",
            )(x)
        x = bn_relu(x, "bn0")
        x = Conv2d(
            256, 3, padding=1, kernel_init=torch_default_conv_kernel_init(),
            dtype=self.dtype, name="conv1",
        )(x)
        x = bn_relu(x, "bn1")
        # 1x1 conv with bias (torch default bias=True at :366)
        x = Conv2d(
            256, 1, use_bias=True, kernel_init=torch_default_conv_kernel_init(),
            dtype=self.dtype, name="conv2",
        )(x)

        # Block-space tail (train/block_logits only; opt-in
        # DEEPCAM_TAIL_BLOCKS=1 pending TPU A/B — the first, reshape-based
        # version measured 19.56 vs 22.89 before the grouped BN landed):
        # deconv3 emits (a, b, C) half-res blocks via one dense
        # 2x2/s1 conv, BN+ReLU run on a flat view of the blocks (identical
        # per-channel statistics — same pixel multiset), and last_deconv is
        # the composite block-consuming conv emitting (r, s, F) quarter-res
        # x4 blocks (ops/deconv.py:deconv3x3s2_blocks2).  NO tensor at 2x or
        # 4x resolution ever materializes — the r2 trace showed ~13 ms/step
        # of batch-in-sublane layout reformats around the full-res tail.
        if block_logits and os.environ.get("DEEPCAM_TAIL_BLOCKS", "0") == "1":
            from ..ops.deconv import deconv3x3s2_blocks, deconv3x3s2_blocks2
            from .layers import torch_default_convT_kernel_init

            dk3 = _KernelParam(
                (3, 3, 256, 256),
                torch_default_convT_kernel_init(), name="deconv3",
            )()
            # flat (N, H, W, (a, b, 256)) — never leaves the 1024-lane
            # layout: the grouped BN folds stats across the 4 block phases
            # without reshaping the tensor (a (..., 4C) → (..., 4W, C)
            # reshape is a real lane shuffle on TPU, ~27 GB/step measured)
            z = deconv3x3s2_blocks(x.astype(self.dtype),
                                   dk3.astype(self.dtype))
            n, h, w = z.shape[:3]
            z = BatchNorm2d(dtype=self.dtype, name="deconv3_bn")(
                z, train, relu=fr, group_blocks=4)
            if not fr:
                z = nn.relu(z)
            lk = _KernelParam(
                (3, 3, 256, self.n_classes),
                torch_default_convT_kernel_init(), name="last_deconv",
            )()
            y = deconv3x3s2_blocks2(z, lk.astype(self.dtype))
            return y.reshape(n, h, w, 16, self.n_classes)

        # Forward-schedule override for the widest deconv (see last_deconv
        # note below; DEEPCAM_DECONV3 A/Bs d2s/polyphase against dilated).
        x = ConvTranspose2d(
            256, dtype=self.dtype,
            method=os.environ.get("DEEPCAM_DECONV3") or None,
            name="deconv3",
        )(x)
        x = bn_relu(x, "deconv3_bn")
        # The F = n_classes output makes the dilated schedule pick H-major
        # blocked layouts (r2 trace: ~1.4 ms layout copies around the relu/
        # BN region) and its d2s forward won the grad-only sweep (201.1 vs
        # 203.8 ms, scripts/deconv_sweep.py) — but in the FULL train step
        # the depth-to-space logits layout poisons every loss/metric
        # consumer (loss-region device time 0.8 → 22.8 ms: broadcast 13.2,
        # reduce 5.1, eq 3.4; bench 19.62 → 17.44).  Default stays
        # 'dilated'; DEEPCAM_DECONV_LAST=d2s opts in (right only if the
        # loss consumes block-space logits directly).
        x = ConvTranspose2d(
            self.n_classes, dtype=self.dtype,
            method=os.environ.get("DEEPCAM_DECONV_LAST") or None,
            name="last_deconv",
        )(x, block_out=block_logits)
        return x


class DeepLabv3plus(nn.Module):
    """DeepLabV3+ with modified aligned Xception encoder
    (``DeepLabv3_plus``, :398-465).

    Input NHWC ``(N, 768, 1152, 16)`` → logits ``(N, 768, 1152, n_classes)``.
    ``decoder='deconv'`` is the reference's active path; ``'interpolation'``
    mirrors the dormant alternative.
    """

    n_classes: int = 3
    output_stride: int = 16
    decoder: str = "deconv"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, freeze_bn: bool = False,
                 block_logits: bool = False, s2d_input: bool = False):
        # freeze_bn: run BN in eval mode during training (parity:
        # ``DeepLabv3_plus.freeze_bn``, deeplab_xception.py:467-470)
        # block_logits: return logits in BLOCK SPACE (N, H/2, W/2, 4, C)
        # — ``space_to_blocks`` of the full-res logits, computed without
        # the full-res materialization (deconv decoder only; the loss/IoU
        # are pixel-order-invariant, see train/trainer.py).
        # s2d_input: x arrives pre-space-to-depth'd (N, H/2, W/2, 4·16)
        # from the host pipeline (ops/conv_small_ch.py:s2d_host) — conv1
        # consumes the layout directly; removes the on-device s2d
        # transpose (~1.9 ms/step, r4 trace).
        bn_train = train and not freeze_bn
        if s2d_input:
            input_hw = (x.shape[1] * 2, x.shape[2] * 2)
        else:
            input_hw = x.shape[1:3]
        x = x.astype(self.dtype)
        feats, low_level = Xception(
            output_stride=self.output_stride, dtype=self.dtype, name="xception"
        )(x, bn_train, s2d_input=s2d_input)
        train = bn_train

        if self.output_stride == 16:
            rates = (1, 6, 12, 18)
        elif self.output_stride == 8:
            rates = (1, 12, 24, 36)
        else:
            raise NotImplementedError

        # Spatial H-sharding: the atrous rates (up to 18) exceed the shard
        # extent at stride 16, so the ASPP neighborhood runs on the
        # gathered full-H tensor (tiny: 48x72 per sample) — replicated
        # across the spatial group, with plain (unsynced) BN statistics
        # since every chip computes identical values — and the merged
        # output is sliced back to this shard's rows for the decoder.
        from ..parallel.spatial import spatial_active as _sp_active

        sp = _sp_active()
        if sp:
            import contextlib as _ctxlib

            from ..parallel.spatial import (
                gather_rows,
                my_rows,
                replicated_region,
            )

            assert self.decoder == "deconv", (
                "spatial mode supports the deconv decoder")
            hs16 = feats.shape[1]
            feats_work = gather_rows(feats)
            region = replicated_region()
        else:
            import contextlib as _ctxlib

            feats_work = feats
            region = _ctxlib.nullcontext()

        with region:
            branches = [
                ASPPModule(256, rate=r, dtype=self.dtype, name=f"aspp{i+1}")(
                    feats_work, train)
                for i, r in enumerate(rates)
            ]

            # Global-average-pool branch: mean over HW (fp32) → 1x1 conv →
            # BN → ReLU → align-corners bilinear up (from 1x1 this is a
            # broadcast).  PyTorch-default init (module defined outside
            # Xception/ASPP, :425-428).
            gap = jnp.mean(
                feats_work.astype(jnp.float32), axis=(1, 2), keepdims=True)
            gap = gap.astype(self.dtype)
            gap = Conv2d(
                256, 1, kernel_init=torch_default_conv_kernel_init(),
                dtype=self.dtype, name="gap_conv",
            )(gap)
            gap = BatchNorm2d(dtype=self.dtype, name="gap_bn")(gap, train)
            gap = nn.relu(gap)
            gap = resize_bilinear_align_corners(gap, branches[-1].shape[1:3])
            branches.append(gap)

            if _split_concat():
                # 1x1 merge conv as five partial matmuls — the 1280-lane
                # concat never materializes and each branch's BN/ReLU fuses
                # into its own partial's prologue
                k1 = _KernelParam(
                    (1, 1, 256 * len(branches), 256),
                    torch_default_conv_kernel_init(), name="conv1",
                )()
                x = _conv_concat_split(branches, k1, padding=0,
                                       compute_dtype=self.dtype)
            else:
                x = jnp.concatenate(branches, axis=-1)  # 5*256 = 1280
                x = Conv2d(
                    256, 1, kernel_init=torch_default_conv_kernel_init(),
                    dtype=self.dtype, name="conv1",
                )(x)
            x = BatchNorm2d(dtype=self.dtype, name="bn1")(x, train)
            x = nn.relu(x)
        if sp:
            x = my_rows(x, hs16)

        low = Conv2d(
            48, 1, kernel_init=torch_default_conv_kernel_init(),
            dtype=self.dtype, name="conv2",
        )(low_level)
        low = BatchNorm2d(dtype=self.dtype, name="bn2")(low, train)
        low = nn.relu(low)

        if self.decoder == "deconv":
            out = DeconvUpsampler(self.n_classes, dtype=self.dtype, name="upsample")(
                x, low, input_hw, train, block_logits=block_logits
            )
        elif self.decoder == "interpolation":
            out = InterpolationUpsampler(
                self.n_classes, dtype=self.dtype, name="upsample"
            )(x, low, input_hw, train)
            if block_logits:
                from ..ops.deconv import space_to_blocks

                out = space_to_blocks(out)
        else:
            raise ValueError(f"unknown decoder {self.decoder!r}")

        # Logits in fp32 for a numerically robust softmax/loss.
        return out.astype(jnp.float32)


def lr_group_mask(params, group: str = "1x"):
    """Boolean pytree masks for per-group learning rates.

    Capability parity with ``get_1x_lr_params`` / ``get_10x_lr_params``
    (``deeplab_xception.py:482-506``, unused by the reference driver): the
    backbone ('1x') vs the classification head ('10x' — ASPP branches,
    projections, decoder).  Use with ``optax.multi_transform`` /
    ``optax.masked``.
    """
    backbone = group == "1x"

    def mask_subtree(path_root: str) -> bool:
        is_backbone = path_root == "xception"
        return is_backbone if backbone else not is_backbone

    import jax as _jax

    return {
        top: _jax.tree_util.tree_map(lambda _: mask_subtree(top), sub)
        for top, sub in params.items()
    }
