"""Core NN layers for the TPU-native DeepCAM stack.

Everything here is laid out TPU-first:

* Activations are **NHWC** (channels-last = TPU lane dimension) and kernels are
  **HWIO** — the native layouts for XLA:TPU convolutions.  The reference
  (PyTorch, ``/root/reference/src/deepCam/architecture/deeplab_xception.py``)
  uses NCHW/OIHW; we do NOT mirror that.
* Mixed precision: parameters and BatchNorm statistics live in fp32, conv
  compute runs in a configurable ``dtype`` (bf16 by default on TPU) —  the
  functional analogue of the reference's apex-AMP O1
  (``train_hdf5_ddp.py:222-224``) without loss scaling, which bf16 does not
  need.
* Initializers reproduce the *semantics* of the reference init scheme:
  - ``kaiming_normal_torch``: ``torch.nn.init.kaiming_normal_`` defaults
    (fan_in, gain=sqrt(2)), used by the Xception/ASPP ``__init_weight``
    (``deeplab_xception.py:244-252,304-312``).
  - ``torch_default_conv_kernel_init`` / ``torch_default_bias_init``: the
    PyTorch *default* ``Conv2d``/``ConvTranspose2d`` reset_parameters
    (kaiming_uniform(a=sqrt(5)) → U(-1/sqrt(fan_in), 1/sqrt(fan_in))), which is
    what the decoder and the DeepLab projection convs actually get in the
    reference because their ``__init_weight`` methods are name-mangled and
    never invoked (``deeplab_xception.py:385-395,472-480``).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Array = jax.Array
Dtype = Any
PaddingLike = Union[str, int, Sequence[Tuple[int, int]]]


# ---------------------------------------------------------------------------
# Initializers (torch-semantics, HWIO kernel layout)
# ---------------------------------------------------------------------------

def kaiming_normal_torch() -> Callable:
    """torch.nn.init.kaiming_normal_ with defaults (fan_in, leaky_relu a=0).

    For an HWIO kernel ``(kh, kw, in_per_group, out)`` torch's fan_in is
    ``in_per_group * kh * kw`` (flax grouped-conv kernels store exactly
    ``in/groups`` on axis 2, so this matches depthwise convs too).
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, in_pg, _ = shape
        fan_in = in_pg * kh * kw
        std = math.sqrt(2.0 / fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def torch_default_conv_kernel_init() -> Callable:
    """PyTorch default Conv2d kernel init: kaiming_uniform(a=sqrt(5)).

    bound = sqrt(6 / ((1 + 5) * fan_in)) = 1/sqrt(fan_in).
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, in_pg, _ = shape
        fan_in = in_pg * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_default_convT_kernel_init() -> Callable:
    """PyTorch default ConvTranspose2d kernel init.

    Torch's ConvTranspose2d weight has shape (in, out/groups, kh, kw), so
    ``_calculate_fan_in_and_fan_out`` reads fan_in = (out/groups) * kh * kw.
    Our transposed-conv kernel is HWIO ``(kh, kw, in, out)`` → fan_in uses the
    OUT axis to match.
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, _, out = shape
        fan_in = out * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_default_bias_init(fan_in: int) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

def _to_pair(v) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def conv2d(
    x: Array,
    kernel: Array,
    *,
    stride=1,
    padding: PaddingLike = 0,
    dilation=1,
    groups: int = 1,
    compute_dtype: Optional[Dtype] = None,
) -> Array:
    """NHWC/HWIO conv wrapper over lax.conv_general_dilated."""
    stride = _to_pair(stride)
    dilation = _to_pair(dilation)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class Conv2d(nn.Module):
    """Plain conv, torch-Conv2d-compatible semantics in NHWC/HWIO.

    Mirrors capability of ``nn.Conv2d`` uses in the reference model
    (``deeplab_xception.py:31-42,145-149,291-292,425-435``).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: PaddingLike = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = False
    kernel_init: Callable = kaiming_normal_torch()
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # route through ops/conv_small_ch's custom VJP (for lane-starved entry
    # convs whose XLA wgrad is layout-pathological; PERF.md)
    small_ch_vjp: bool = False

    # x arrives PRE-space-to-depth'd as (N, H/2, W/2, 4C) — the host input
    # pipeline emits the layout and the on-device s2d transpose vanishes
    # (requires small_ch_vjp + kernel 3x3 / stride 2; param stays the
    # logical (3, 3, C, F))
    s2d_pre: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = _to_pair(self.kernel_size)
        in_ch = x.shape[-1] // 4 if self.s2d_pre else x.shape[-1]
        assert in_ch % self.groups == 0, (in_ch, self.groups)
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, in_ch // self.groups, self.features),
            self.param_dtype,
        )
        # spatial H-sharding (parallel/spatial.py): the local op below
        # computes zero-padded 'same' semantics on the shard; a strip fix
        # adds the cross-shard halo taps afterwards.  Applies to the 3x3
        # padding==dilation configs the model uses on sharded tensors.
        sp = (_spatial_on() and (kh, kw) == (3, 3) and self.groups == 1
              and self.padding == _to_pair(self.dilation)[0]
              and not self.s2d_pre)
        if sp:
            from ..parallel.spatial import conv3x3_strip_fix
        if self.s2d_pre:
            from ..ops.conv_small_ch import conv3x3s2_s2d_pre

            assert (self.small_ch_vjp and (kh, kw) == (3, 3)
                    and self.groups == 1 and _to_pair(self.stride) == (2, 2)
                    and self.padding == 1 and not self.use_bias)
            return conv3x3s2_s2d_pre(
                x.astype(self.dtype), kernel.astype(self.dtype))
        if (
            self.small_ch_vjp
            and (kh, kw) == (3, 3)
            and self.groups == 1
            and _to_pair(self.dilation) == (1, 1)
            and self.padding == 1
            and _to_pair(self.stride)[0] in (1, 2)
        ):
            from ..ops.conv_small_ch import (
                _use_s2d,
                conv3x3_small_ch,
                conv3x3s2_s2d,
            )

            stride = _to_pair(self.stride)[0]
            if (
                stride == 2
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
                and _use_s2d()
                and not sp
            ):
                # space-to-depth form: same math, TPU-friendly layout
                # (ops/conv_small_ch.py).  Spatial mode keeps the direct
                # form — its zero-pad-local semantics pair with the strip
                # fix below.
                y = conv3x3s2_s2d(
                    x.astype(self.dtype), kernel.astype(self.dtype)
                )
            else:
                y = conv3x3_small_ch(
                    x.astype(self.dtype),
                    kernel.astype(self.dtype),
                    stride,
                )
                if sp:
                    y = conv3x3_strip_fix(
                        y, x.astype(self.dtype), kernel, stride)
            if self.use_bias:
                fan_in = in_ch * kh * kw
                bias = self.param(
                    "bias", torch_default_bias_init(fan_in), (self.features,),
                    self.param_dtype,
                )
                y = y + bias.astype(y.dtype)
            return y
        import os

        if (
            (kh, kw) == (1, 1)
            and self.groups == 1
            and _to_pair(self.stride) == (2, 2)
            and self.padding in (0, (0, 0))
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
            and os.environ.get("DEEPCAM_SKIP_VJP", "0") == "1"
        ):
            # XceptionBlock skip projections: phase-form backward replaces
            # XLA autodiff's strided gather + layout copy
            # (ops/conv_small_ch.py:conv1x1s2).  Measured NEUTRAL-to-noise
            # whole-model (bench 20.30 -> 20.18; the s2d formatting of x
            # costs what the gather did) -> opt-in.
            from ..ops.conv_small_ch import conv1x1s2

            y = conv1x1s2(x.astype(self.dtype), kernel.astype(self.dtype))
            if self.use_bias:
                bias = self.param(
                    "bias", torch_default_bias_init(in_ch), (self.features,),
                    self.param_dtype,
                )
                y = y + bias.astype(y.dtype)
            return y

        # ASPP atrous branches run XLA's rhs_dilation schedule.  Two
        # re-expressions were built and measured (r2/r3): nine
        # shift-decomposed MXU-dense taps (0.978x — the taps re-read the
        # 2048-lane input 9x) and space-to-batch over phase-major blocks
        # (0.991x).  Neither has a win path at these shapes, so both were
        # PRUNED in r3 (git history: deepcam_tpu/ops/atrous.py).
        y = conv2d(
            x,
            kernel,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            compute_dtype=self.dtype,
        )
        if sp:
            y = conv3x3_strip_fix(
                y, x.astype(self.dtype), kernel, _to_pair(self.stride)[0],
                _to_pair(self.dilation)[0])
        if self.use_bias:
            fan_in = (in_ch // self.groups) * kh * kw
            bias = self.param(
                "bias", torch_default_bias_init(fan_in), (self.features,), self.param_dtype
            )
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose2d(nn.Module):
    """Transposed conv matching torch ConvTranspose2d(k, s, p, output_padding).

    Two numerically identical implementations:

    * ``method='dilated'``: the textbook XLA form — an input-dilated
      (lhs_dilation) conv with a spatially flipped HWIO kernel and padding
      (k-1-p, k-1-p+op).
    * ``method='polyphase'``: four dense phase convs at input resolution +
      pixel shuffle (no zero-stuffed schedule).  Kept for study — measured on
      v5e it does NOT beat the dilated schedule (XLA:TPU already handles
      lhs_dilation well for these shapes, and the phase-interleave transpose
      costs more than the zero-skipping saves), so 'dilated' is the default.
    * ``method='d2s'``: ONE dense 2x2/stride-1 conv emitting all four phases
      as Cout·4 channels (zero-padded taps) + a single depth-to-space — the
      polyphase math with full MXU utilization and one formatting op instead
      of four convs and a stack.  Backward is a standard stride-1 conv VJP at
      input resolution.

    For the decoder's k=3, s=2, p=1, op=1 this is an exact x2 upsample,
    matching the reference deconvs (``deeplab_xception.py:352-374``).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 1
    output_padding: Union[int, Tuple[int, int]] = 1
    use_bias: bool = False
    kernel_init: Callable = torch_default_convT_kernel_init()
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # None → resolve at call time from DEEPCAM_DECONV (default 'dilated')
    method: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, block_out: bool = False) -> Array:
        """``block_out=True`` returns the output in BLOCK SPACE
        (N, H, W, 4, F) with block index = (row phase, col phase) — i.e.
        ``space_to_blocks`` of the full-res output, computed without ever
        materializing the (N, 2H, 2W, F) tensor on the fast path (see
        ops/deconv.py:deconv3x3s2_blocks).  Used by the train step for the
        pixel-order-invariant loss/IoU."""
        kh, kw = _to_pair(self.kernel_size)
        sh, sw = _to_pair(self.stride)
        ph, pw = _to_pair(self.padding)
        oph, opw = _to_pair(self.output_padding)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, in_ch, self.features), self.param_dtype
        )
        k = jnp.flip(kernel, axis=(0, 1)).astype(self.dtype)
        xc = x.astype(self.dtype)

        import os

        method = self.method or os.environ.get("DEEPCAM_DECONV", "dilated")
        is_k3s2 = (
            (kh, kw) == (3, 3)
            and (sh, sw) == (2, 2)
            and (ph, pw) == (1, 1)
            and (oph, opw) == (1, 1)
        )
        use_vjp = os.environ.get("DEEPCAM_DECONV_VJP", "1") == "1"
        if block_out:
            assert is_k3s2, "block_out requires the k3/s2/p1/op1 deconv"
            n, h, w = xc.shape[0], xc.shape[1], xc.shape[2]
            if use_vjp:
                from deepcam_tpu.ops.deconv import deconv3x3s2_blocks

                y = deconv3x3s2_blocks(xc, kernel.astype(self.dtype))
                y = y.reshape(n, h, w, 4, self.features)
            else:
                from deepcam_tpu.ops.deconv import space_to_blocks

                yf = lax.conv_general_dilated(
                    xc, k, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                y = space_to_blocks(yf)
            if _spatial_on():
                from ..parallel.spatial import deconv_k3s2_strip_fix

                y = deconv_k3s2_strip_fix(
                    y, xc, kernel.astype(self.dtype), block_out=True)
            if self.use_bias:
                fan_in = self.features * kh * kw
                bias = self.param(
                    "bias", torch_default_bias_init(fan_in),
                    (self.features,), self.param_dtype,
                )
                y = y + bias.astype(y.dtype)
            return y
        if method in ("dilated", "d2s", "polyphase") and is_k3s2 and use_vjp:
            # Selectable XLA forward schedule, custom backward: XLA's
            # autodiff through the dilated schedule emits a reverse/pad/
            # slice/copy storm over the full-size intermediates (~26 ms/step
            # at batch 4, PERF.md r2); the custom VJP computes dx/dk as
            # s2d-block-space convs/einsums.
            from deepcam_tpu.ops.deconv import deconv3x3s2

            y = deconv3x3s2(xc, kernel.astype(self.dtype), method)
        elif method == "polyphase" and is_k3s2:
            y = self._polyphase_k3s2(xc, k)
        elif method == "d2s" and is_k3s2:
            y = self._d2s_k3s2(xc, k)
        else:
            pad = (
                (kh - 1 - ph, kh - 1 - ph + oph),
                (kw - 1 - pw, kw - 1 - pw + opw),
            )
            y = lax.conv_general_dilated(
                xc,
                k,
                window_strides=(1, 1),
                padding=pad,
                lhs_dilation=(sh, sw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if _spatial_on():
            assert is_k3s2, "spatial mode supports the k3/s2/p1/op1 deconvs"
            from ..parallel.spatial import deconv_k3s2_strip_fix

            y = deconv_k3s2_strip_fix(y, xc, kernel.astype(self.dtype))
        if self.use_bias:
            fan_in = self.features * kh * kw
            bias = self.param(
                "bias", torch_default_bias_init(fan_in), (self.features,), self.param_dtype
            )
            y = y + bias.astype(y.dtype)
        return y

    def _polyphase_k3s2(self, x: Array, K: Array) -> Array:
        """k3/s2/p1/op1 transposed conv as 4 dense phase convs + pixel shuffle.

        Derivation (1-D, per spatial dim).  The dilated-conv form computes
        ``y[o] = sum_t P[o+t] K[t]`` over the zero-stuffed, (1,2)-padded input
        P where ``P[m] = X[(m-1)/2]`` when m is odd.  Splitting by output
        parity ``o = 2i + a``:

            a=0:  y[2i]   = K[1] X[i]
            a=1:  y[2i+1] = K[0] X[i] + K[2] X[i+1]

        Separably in 2D, output phase (a, b) is a dense conv at INPUT
        resolution with (1|2)x(1|2) taps — 9·H·W·I·O MACs total, exactly the
        useful work, vs the lhs_dilation schedule that streams a 4x larger
        zero-stuffed activation through the MXU.  ``K`` is the spatially
        flipped kernel (correlation orientation).
        """
        n, h, w, in_ch = x.shape
        o = self.features

        def phase_conv(taps, pad_h, pad_w):
            return lax.conv_general_dilated(
                x,
                taps,
                window_strides=(1, 1),
                padding=(pad_h, pad_w),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        # taps indexed [rows, cols] of K per the 1-D rule above
        y00 = phase_conv(K[1:2, 1:2], (0, 0), (0, 0))            # K[1,1]
        y01 = phase_conv(K[1:2, 0::2], (0, 0), (0, 1))           # K[1,0], K[1,2]
        y10 = phase_conv(K[0::2, 1:2], (0, 1), (0, 0))           # K[0,1], K[2,1]
        y11 = phase_conv(K[0::2, 0::2], (0, 1), (0, 1))          # 4 corners

        # interleave: out[n, 2i+a, 2j+b, :] = y_ab[n, i, j, :]
        y = jnp.stack([y00, y01, y10, y11], axis=-2)  # (N, H, W, 4, O)
        y = y.reshape(n, h, w, 2, 2, o)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(n, 2 * h, 2 * w, o)

    def _d2s_k3s2(self, x: Array, K: Array) -> Array:
        """k3/s2/p1/op1 transposed conv as ONE 2x2/s1 conv + depth-to-space.

        Same phase math as ``_polyphase_k3s2`` (see its derivation), but the
        four phases are emitted as 4·O output channels of a single dense
        2x2 conv over taps X[i..i+1] (padding (0,1) per dim), with zeros in
        the kernel where a phase has no tap:

            out[2i+a, 2j+b] = y4[i, j, (a, b)]
            y4 tap (dh, dw) for phase (a, b) = K[r(dh,a), c(dw,b)]
            r(0,0)=1  r(0,1)=0  r(1,1)=2  r(1,0)=∅ (zero)

        16 tap-slots hold the 9 real taps → 1.78x the MACs of the minimal
        schedule, but as one MXU-dense I→4O contraction; the backward is a
        plain stride-1 conv VJP at input resolution.  ``K`` is the spatially
        flipped kernel (correlation orientation).
        """
        n, h, w, in_ch = x.shape
        o = self.features
        sel = {(0, 0): 1, (0, 1): 0, (1, 1): 2}  # (tap, phase) → K index
        zero = jnp.zeros_like(K[0, 0])

        def tap(dh, a, dw, b):
            if (dh, a) in sel and (dw, b) in sel:
                return K[sel[(dh, a)], sel[(dw, b)]]
            return zero

        k2 = jnp.stack([
            jnp.stack([
                jnp.stack([
                    jnp.stack([tap(dh, a, dw, b) for b in range(2)])
                    for a in range(2)
                ])
                for dw in range(2)
            ])
            for dh in range(2)
        ])  # (dh, dw, a, b, I, O)
        k2 = k2.transpose(0, 1, 4, 2, 3, 5).reshape(2, 2, in_ch, 4 * o)
        y4 = lax.conv_general_dilated(
            x, k2, (1, 1), ((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (N, H, W, (a, b, O))
        y = y4.reshape(n, h, w, 2, 2, o).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(n, 2 * h, 2 * w, o)


# Spatial-sharding BN sync override (parallel/spatial.py): when the model
# runs on H-shards inside the spatial shard_map, every BatchNorm computes
# batch statistics pmean'd over the 'spatial' axis — each spatial GROUP
# then has exactly the per-rank statistics of one reference DDP GPU.
# None = normal (per-device) statistics.
_BN_SYNC_AXIS: Optional[str] = None


def set_bn_sync_axis(axis: Optional[str]) -> None:
    global _BN_SYNC_AXIS
    _BN_SYNC_AXIS = axis


def _spatial_on() -> bool:
    from ..parallel.spatial import spatial_active

    return spatial_active()


# Depthwise lowering: 'conv_vjp' (default) = grouped conv forward + custom
# hand-built backward (XLA's autodiff of grouped convs is ~4x off at high
# resolution, PERF.md); 'conv' = grouped conv with XLA autodiff; 'shifts' =
# 9 shift-multiply-adds on the VPU.  Switchable globally for whole-model A/B
# benchmarking; parameter trees are identical in all cases.
_DEPTHWISE_IMPL = "conv_vjp"

# Whole-unit sepconv lowering: 'auto' (default) routes every stride-1
# SeparableConv2dSame through the fused [relu→]dw→pw Pallas kernel
# (ops/pallas/fused_sepconv.py) on TPU, and through the unfused XLA ops on
# CPU; 'fused' forces the kernel (interpret-mode on CPU — tests only);
# 'xla' forces the unfused path.  Parameter trees are identical either way.
_SEPCONV_IMPL = "auto"


def set_sepconv_impl(name: str) -> None:
    global _SEPCONV_IMPL
    assert name in ("auto", "fused", "xla"), name
    _SEPCONV_IMPL = name


def get_sepconv_impl() -> str:
    return _SEPCONV_IMPL


# Fold each rep-unit BatchNorm's APPLY into the next sepconv unit's kernel
# (BatchNorm2d(fold=True) → SeparableConv2dSame(bn_fold=...)).  Numerics are
# the identical bf16 FMA either way; the fold only moves the elementwise
# apply (and its backward) out of separate HBM passes.  Standalone it was
# NEUTRAL (0.999x b2 / 1.004x b4, scripts/bnfold_ab.py) — but combined with
# kernel-emitted BN stats (fused_stats_active) the BN has no full-tensor
# pass left at all and the fold wins: 21.72 → 22.02 samples/s/chip on v5e
# (PERF.md r2).  Default ON; DEEPCAM_BN_FOLD=0 opts out.
_BN_FOLD = True


def set_bn_fold(on: bool) -> None:
    global _BN_FOLD
    _BN_FOLD = bool(on)


def bn_fold_active() -> bool:
    import os

    env = os.environ.get("DEEPCAM_BN_FOLD")
    if env == "0":
        return False
    if env == "1":
        return True
    return _BN_FOLD


def boundary_fold_active() -> bool:
    """Middle-flow block-boundary fold: the chain-final BN-apply +
    residual add + next block's leading ReLU run inside the next block's
    unit-0 kernel, which also emits the residual stream
    (ops/pallas/fused_sepconv.py boundary variant).  Requires the
    BN-apply fold (the chain-final BN must hand its (a, b) forward).
    Numerics are the same bf16 chain either way; the unfused/CPU path
    computes it as identical XLA elementwise ops.

    Default ON since the r4 wave-2 A/B: 24.22 vs 23.89 control (+1.4%,
    ~1 GB/step of boundary-pass traffic removed; the boundary kernel
    compiles server-side at the production (4,48,72,728) shape).
    DEEPCAM_BOUNDARY_FOLD=0 opts out."""
    import os

    return (os.environ.get("DEEPCAM_BOUNDARY_FOLD", "1") == "1"
            and bn_fold_active())


# Emit BN statistics (partial Σy/Σy²) from the fused sepconv kernel and
# feed them to the following BatchNorm2d (``stats=``) instead of re-reading
# the sepconv output with two full reduction passes (train mode only —
# eval BNs use running stats).  Default ON: whole-model A/B on v5e measured
# 21.10 → 21.72 samples/s/chip (PERF.md r2).  DEEPCAM_FUSED_STATS=0 opts
# out (or set_fused_stats(False) has no effect once env forces it).
_FUSED_STATS = True


def set_fused_stats(on: bool) -> None:
    global _FUSED_STATS
    _FUSED_STATS = bool(on)


def fused_stats_active() -> bool:
    import os

    env = os.environ.get("DEEPCAM_FUSED_STATS")
    if env == "0":
        return False
    if env == "1":
        return True
    return _FUSED_STATS


def _fused_sepconv_active() -> Tuple[bool, bool]:
    """(use fused kernel?, interpret mode?)."""
    import os

    if _SEPCONV_IMPL == "xla":
        return False, False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if _SEPCONV_IMPL == "fused":
        return True, not on_tpu
    # auto: ON for TPU — hardware-validated (fwd bit-exact, grads within
    # bf16 tolerance) and a 1.15x whole-model train-step win (PERF.md r2);
    # DEEPCAM_FUSED_SEPCONV=0 opts out
    if os.environ.get("DEEPCAM_FUSED_SEPCONV") == "0":
        return False, False
    return on_tpu, False


class _KernelParam(nn.Module):
    """Declares a conv kernel param without the conv module, so the fused
    sepconv path creates the IDENTICAL parameter tree (same scope path,
    name, shape, init → same checkpoint format and init values) as the
    unfused DepthwiseConv3x3/Conv2d children."""

    shape: Tuple[int, ...]
    init: Callable
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self) -> Array:
        return self.param("kernel", self.init, self.shape, self.param_dtype)


def set_depthwise_impl(name: str) -> None:
    global _DEPTHWISE_IMPL
    assert name in ("conv", "conv_vjp", "shifts"), name
    _DEPTHWISE_IMPL = name


def get_depthwise_impl() -> str:
    return _DEPTHWISE_IMPL


class DepthwiseConv3x3(nn.Module):
    """Depthwise 3x3 with selectable lowering (same params either way)."""

    stride: int = 1
    dilation: int = 1
    padding: Tuple[int, int] = (1, 1)
    kernel_init: Callable = kaiming_normal_torch()
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, 1, in_ch), self.param_dtype
        )
        if _DEPTHWISE_IMPL == "shifts":
            from ..ops.depthwise import depthwise3x3_shifts

            return depthwise3x3_shifts(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                stride=self.stride,
                dilation=self.dilation,
                padding=self.padding,
            )
        if _DEPTHWISE_IMPL == "conv_vjp" and (
            self.stride == 1 or (self.stride == 2 and self.dilation == 1)
        ):
            from ..ops.depthwise import depthwise3x3

            return depthwise3x3(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                self.stride,
                self.dilation,
                tuple(self.padding),
            )
        return conv2d(
            x,
            kernel,
            stride=self.stride,
            padding=(self.padding, self.padding),
            dilation=self.dilation,
            groups=in_ch,
            compute_dtype=self.dtype,
        )


def fixed_padding(kernel_size: int, rate: int) -> Tuple[int, int]:
    """Reference 'same' padding: effective kernel k + (k-1)(rate-1), split
    floor/ceil (``deeplab_xception.py:45-51``).  Returns (pad_beg, pad_end)."""
    k_eff = kernel_size + (kernel_size - 1) * (rate - 1)
    pad_total = k_eff - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    return pad_beg, pad_end


class SeparableConv2d(nn.Module):
    """Depthwise (groups=in) 3x3 + pointwise 1x1, both bias-free by default.

    Parity with ``SeparableConv2d`` (``deeplab_xception.py:31-42``).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = False
    kernel_init: Callable = kaiming_normal_torch()
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        x = Conv2d(
            features=in_ch,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=in_ch,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="depthwise",
        )(x)
        x = Conv2d(
            features=self.features,
            kernel_size=1,
            stride=1,
            padding=0,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pointwise",
        )(x)
        return x


class SeparableConv2dSame(nn.Module):
    """SeparableConv2d with the reference's explicit asymmetric 'same' padding
    (``SeparableConv2d_same``, ``deeplab_xception.py:54-66``).

    ``pre_relu=True`` applies a ReLU to the input first — the rep-unit ReLU
    the reference applies just before each sepconv
    (``deeplab_xception.py:79-108``).  Declaring it here (instead of at the
    call site) lets the stride-1 path fuse relu→dw→pw into one Pallas kernel
    on TPU; the parameter tree and numerics are identical either way.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    pre_relu: bool = False
    kernel_init: Callable = kaiming_normal_torch()
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, bn_fold=None, emit_stats: bool = False,
                 boundary=None):
        """``bn_fold`` (optional) is the ``(a, b)`` pair returned by the
        preceding ``BatchNorm2d(..., fold=True)``: the BN-apply
        ``x*a + b`` runs inside the fused kernel on TPU (one less HBM
        round-trip per rep unit) and as the identical elementwise FMA on
        the unfused path.

        ``emit_stats=True`` changes the return to ``(y, stats)`` where
        ``stats`` is the fused kernel's partial ``(Σy, Σy²)`` pair for the
        following ``BatchNorm2d(..., stats=...)`` — or None when this call
        lowered to the unfused path (the BN then reduces y itself).

        ``boundary=((a, b), skip)`` (block-boundary fold, see
        ``XceptionBlock``): ``x`` is then the PREVIOUS block's chain-final
        raw pointwise output, and this unit consumes
        ``r = relu(x*a + b + skip)`` — the boundary chain computed
        in-kernel on TPU (ops/pallas/fused_sepconv.py boundary variant) or
        as the identical XLA elementwise chain otherwise.  The return
        becomes a 3-tuple ``(y, stats_or_None, r)`` — r is the residual
        stream the enclosing block's skip path uses."""
        import os

        in_ch = x.shape[-1]
        fused, interpret = _fused_sepconv_active()
        if (_spatial_on() and self.kernel_size == 3 and not self.use_bias):
            return self._spatial_call(x, bn_fold, emit_stats, boundary,
                                      fused, interpret)
        if boundary is not None:
            assert (self.kernel_size == 3 and self.stride == 1
                    and not self.use_bias and not self.pre_relu
                    and bn_fold is None)
            (ba, bb), bskip = boundary
            min_ch = int(os.environ.get("DEEPCAM_FUSED_MIN_CH", "0"))
            min_rows = int(os.environ.get("DEEPCAM_FUSED_MIN_ROWS", "0"))
            max_dil = int(os.environ.get("DEEPCAM_FUSED_MAX_DIL", "99"))
            if (fused and in_ch >= min_ch and x.shape[1] >= min_rows
                    and self.dilation <= max_dil):
                from ..ops.pallas.fused_sepconv import (
                    fused_sepconv_boundary,
                    fused_sepconv_boundary_stats,
                )

                dwk = _KernelParam(
                    (3, 3, 1, in_ch), self.kernel_init, self.param_dtype,
                    name="depthwise",
                )()
                pwk = _KernelParam(
                    (1, 1, in_ch, self.features), self.kernel_init,
                    self.param_dtype, name="pointwise",
                )()
                args = (
                    x.astype(self.dtype), ba.astype(self.dtype),
                    bb.astype(self.dtype), bskip.astype(self.dtype),
                    dwk[:, :, 0, :].astype(self.dtype),
                    pwk[0, 0].astype(self.dtype),
                    self.dilation, interpret,
                )
                if emit_stats:
                    y, r, s1, s2 = fused_sepconv_boundary_stats(*args)
                    return y, (s1, s2), r
                y, r = fused_sepconv_boundary(*args)
                return y, None, r
            # unfused path: the identical XLA elementwise boundary chain,
            # then the plain depthwise→pointwise on r (params on THIS
            # module — same tree as the fused form)
            r = nn.relu(
                x.astype(self.dtype) * ba.astype(self.dtype)
                + bb.astype(self.dtype) + bskip.astype(self.dtype))
            pad = fixed_padding(self.kernel_size, self.dilation)
            xr = DepthwiseConv3x3(
                stride=1, dilation=self.dilation, padding=pad,
                kernel_init=self.kernel_init, dtype=self.dtype,
                param_dtype=self.param_dtype, name="depthwise",
            )(r)
            xr = Conv2d(
                features=self.features, kernel_size=1, use_bias=False,
                kernel_init=self.kernel_init, dtype=self.dtype,
                param_dtype=self.param_dtype, name="pointwise",
            )(xr)
            return xr, None, r
        # Stride-2 tail sepconvs (3 in the model) stay on the XLA conv
        # schedule: THREE fused-kernel generations measured losers
        # whole-model despite 1.6-1.75x standalone wins at every tail
        # shape (v1 0.976x r2; v2 in-kernel-phase-split 0.883x r4 after
        # the block1-affine Mosaic fix) — XLA fuses the s2 backward into
        # the surrounding BN/residual graph better than any custom-call
        # boundary allows.  Kernels in git history
        # (ops/pallas/fused_sepconv_s2.py, deleted r4).
        # the kernel wins where the backward dominates (wide channels);
        # XLA keeps the lane-starved entry shapes (measured: PERF.md r2)
        min_ch = int(os.environ.get("DEEPCAM_FUSED_MIN_CH", "0"))
        # DEEPCAM_FUSED_MIN_ROWS=N routes tiny-spatial units back to XLA:
        # the r3 trace shows the exit-flow dilation-2 units at (24, 36)
        # spatial cost 1.3-1.5 ms per custom-call for ~0.1 ms of inherent
        # work (the row-tiled grid degenerates at 24 rows).  Opt-in
        # pending hardware A/B (r3 wave 3).
        min_rows = int(os.environ.get("DEEPCAM_FUSED_MIN_ROWS", "0"))
        # DEEPCAM_FUSED_MAX_DIL=N routes dilation>N units back to XLA.
        # The exit-flow d=2 units share the middle flow's 48-row extent, so
        # MIN_ROWS cannot isolate them; the dilation gate can (exit conv3-5
        # are the model's only d=2 sepconvs at os=16).  Their d=2 halo
        # shrinks the VMEM-budgeted row tile and the 2048-lane fp32 tap
        # loop runs on the VPU, so per-call cost is ~10x the inherent work
        # (r3 trace: 1.3-1.5 ms/call).  Opt-in pending hardware A/B.
        max_dil = int(os.environ.get("DEEPCAM_FUSED_MAX_DIL", "99"))
        if (
            fused
            and self.kernel_size == 3
            and self.stride == 1
            and not self.use_bias
            and in_ch >= min_ch
            and x.shape[1] >= min_rows
            and self.dilation <= max_dil
        ):
            from ..ops.pallas.fused_sepconv import (
                fused_sepconv,
                fused_sepconv_affine,
                fused_sepconv_affine_stats,
                fused_sepconv_stats,
            )

            dwk = _KernelParam(
                (3, 3, 1, in_ch), self.kernel_init, self.param_dtype,
                name="depthwise",
            )()
            pwk = _KernelParam(
                (1, 1, in_ch, self.features), self.kernel_init,
                self.param_dtype, name="pointwise",
            )()
            if bn_fold is not None:
                a, b = bn_fold
                fn = fused_sepconv_affine_stats if emit_stats else (
                    fused_sepconv_affine)
                out = fn(
                    x.astype(self.dtype),
                    a.astype(self.dtype),
                    b.astype(self.dtype),
                    dwk[:, :, 0, :].astype(self.dtype),
                    pwk[0, 0].astype(self.dtype),
                    self.pre_relu,
                    self.dilation,
                    interpret,
                )
            else:
                fn = fused_sepconv_stats if emit_stats else fused_sepconv
                out = fn(
                    x.astype(self.dtype),
                    dwk[:, :, 0, :].astype(self.dtype),
                    pwk[0, 0].astype(self.dtype),
                    self.pre_relu,
                    self.dilation,
                    interpret,
                )
            if emit_stats:
                y, s1, s2 = out
                return y, (s1, s2)
            return out
        if bn_fold is not None:
            # unfused path: the BN-apply FMA, exactly as BatchNorm2d does it
            a, b = bn_fold
            x = x.astype(self.dtype) * a.astype(self.dtype) + b.astype(
                self.dtype
            )
        if self.pre_relu:
            x = nn.relu(x)
        pad = fixed_padding(self.kernel_size, self.dilation)
        if self.kernel_size == 3 and not self.use_bias:
            x = DepthwiseConv3x3(
                stride=self.stride,
                dilation=self.dilation,
                padding=pad,
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="depthwise",
            )(x)
        else:
            x = Conv2d(
                features=in_ch,
                kernel_size=self.kernel_size,
                stride=self.stride,
                padding=(pad, pad),
                dilation=self.dilation,
                groups=in_ch,
                use_bias=self.use_bias,
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="depthwise",
            )(x)
        x = Conv2d(
            features=self.features,
            kernel_size=1,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pointwise",
        )(x)
        if emit_stats:
            return x, None
        return x

    def _dw_pw_local(self, h, dwk4, pwk4, d):
        """The unfused sepconv body on the local shard (depthwise custom
        VJP + pointwise conv — identical numerics to the non-spatial
        unfused path)."""
        from ..ops.depthwise import depthwise3x3

        pad = fixed_padding(3, d)
        y = depthwise3x3(h, dwk4.astype(self.dtype), 1, d, pad)
        return conv2d(y, pwk4, compute_dtype=self.dtype)

    def _spatial_call(self, x, bn_fold, emit_stats, boundary, fused,
                      interpret):
        """Spatial H-sharding path (parallel/spatial.py): the unmodified
        local op (fused kernel or unfused composition — zero-padded 'same'
        semantics on the shard) + additive halo-strip corrections.  The
        parameter tree is identical to the non-spatial paths (same
        ``depthwise``/``pointwise`` scopes, shapes, inits)."""
        from ..parallel.spatial import dw_s2_strip_fix, sepconv_strip_fix

        in_ch = x.shape[-1]
        d = self.dilation
        dwk4 = _KernelParam(
            (3, 3, 1, in_ch), self.kernel_init, self.param_dtype,
            name="depthwise",
        )()
        pwk4 = _KernelParam(
            (1, 1, in_ch, self.features), self.kernel_init,
            self.param_dtype, name="pointwise",
        )()
        dwk = dwk4[:, :, 0, :].astype(self.dtype)
        pwk = pwk4[0, 0].astype(self.dtype)
        xc = x.astype(self.dtype)

        if self.stride == 2:
            # bare stride-2 tail: [affine](x) → dw3x3/s2 → pw; the only
            # cross-shard tap is output row 0 reading h[-1]
            assert boundary is None and not self.pre_relu and d == 1
            h = xc
            if bn_fold is not None:
                a, b = bn_fold
                h = h * a.astype(self.dtype) + b.astype(self.dtype)
            from ..ops.depthwise import depthwise3x3

            ydw = depthwise3x3(h, dwk4.astype(self.dtype), 2, 1, (1, 1))
            y = conv2d(ydw, pwk4, compute_dtype=self.dtype)
            y = dw_s2_strip_fix(y, None, h[:, -1:], dwk, pwk)
            return (y, None) if emit_stats else y

        if boundary is not None:
            (ba, bb), bskip = boundary
            stats = None
            if fused:
                from ..ops.pallas.fused_sepconv import (
                    fused_sepconv_boundary,
                    fused_sepconv_boundary_stats,
                )

                args = (xc, ba.astype(self.dtype), bb.astype(self.dtype),
                        bskip.astype(self.dtype), dwk, pwk, d, interpret)
                if emit_stats:
                    y, r, s1, s2 = fused_sepconv_boundary_stats(*args)
                    stats = (s1, s2)
                else:
                    y, r = fused_sepconv_boundary(*args)
            else:
                r = nn.relu(
                    xc * ba.astype(self.dtype) + bb.astype(self.dtype)
                    + bskip.astype(self.dtype))
                y = self._dw_pw_local(r, dwk4, pwk4, d)
            out = sepconv_strip_fix(y, r[:, :d], r[:, -d:], dwk, pwk, d,
                                    stats=stats)
            if stats is not None:
                y, stats = out
            else:
                y = out
            return y, stats, r

        def pre(t):
            if bn_fold is not None:
                a, b = bn_fold
                t = t * a.astype(self.dtype) + b.astype(self.dtype)
            if self.pre_relu:
                t = nn.relu(t)
            return t

        stats = None
        if fused:
            from ..ops.pallas.fused_sepconv import (
                fused_sepconv,
                fused_sepconv_affine,
                fused_sepconv_affine_stats,
                fused_sepconv_stats,
            )

            if bn_fold is not None:
                a, b = bn_fold
                fn = fused_sepconv_affine_stats if emit_stats else (
                    fused_sepconv_affine)
                out = fn(xc, a.astype(self.dtype), b.astype(self.dtype),
                         dwk, pwk, self.pre_relu, d, interpret)
            else:
                fn = fused_sepconv_stats if emit_stats else fused_sepconv
                out = fn(xc, dwk, pwk, self.pre_relu, d, interpret)
            if emit_stats:
                y, s1, s2 = out
                stats = (s1, s2)
            else:
                y = out
        else:
            y = self._dw_pw_local(pre(xc), dwk4, pwk4, d)
        out = sepconv_strip_fix(y, pre(xc[:, :d]), pre(xc[:, -d:]),
                                dwk, pwk, d, stats=stats)
        if stats is not None:
            y, stats = out
        else:
            y = out
        return (y, stats) if emit_stats else y


# ---------------------------------------------------------------------------
# BatchNorm with torch semantics
# ---------------------------------------------------------------------------

def _bn_one_pass() -> bool:
    """One-pass E[x²]−E[x]² batch statistics for XLA-producer BNs — default
    ON since the r3 A/B (23.36 → 23.93 samples/s/chip, one reduction pass
    over x instead of two); DEEPCAM_BN_ONEPASS=0 opts out."""
    import os

    return os.environ.get("DEEPCAM_BN_ONEPASS", "1") == "1"


def _bn_bwd_custom() -> bool:
    """Closed-form BN backward in the COMPUTE dtype (opt-in
    DEEPCAM_BN_BWD=1 pending the TPU A/B).

    XLA autodiff through the fp32 batch-statistics reductions promotes the
    full-tensor x-cotangent of every XLA-producer BN to fp32: the r4 trace
    shows 905–931 MB fp32 select/copy/loop-fusion ops around deconv3_bn
    (its bwd scope alone 9.1 ms / 6.0 GB) and the other apply-mode BNs.
    The closed form  dx = (γ/σ)·(du − mean(du) − x̂·mean(du·x̂))  needs
    only two per-channel fp32 reductions; every full-tensor term stays
    bf16 — same math as autodiff (the stats paths are folded analytically;
    the outer graph's mean/var get zero cotangents), different only in
    elementwise rounding.

    Modes: ``1`` = every eligible BN (r4 w3: 23.97 vs 24.22 control,
    0.990x — the custom-VJP boundary costs more than the byte cut across
    the many mid-size BNs); ``big`` = only full-resolution BNs
    (H·W ≥ 131072: deconv3_bn and the entry bn1/bn2 — where the fp32
    streams are 0.9 GB each)."""
    import os

    return os.environ.get("DEEPCAM_BN_BWD", "0")


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _bn_train_apply(x, mean, var, scale, bias, eps, relu, dtype):
    """y = [relu](x·a + b) with a/b from the batch stats — identical
    forward to the inline apply; the custom backward keeps full-tensor
    cotangents in ``dtype`` (see ``_bn_bwd_custom``)."""
    inv = lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    a = inv.astype(dtype)
    b = (bias.astype(jnp.float32) - mean * inv).astype(dtype)
    y = x * a + b
    if relu:
        y = jnp.maximum(y, 0)
    return y


def _bn_train_apply_fwd(x, mean, var, scale, bias, eps, relu, dtype):
    y = _bn_train_apply(x, mean, var, scale, bias, eps, relu, dtype)
    return y, (x, y if relu else None, mean, var, scale)


def _bn_train_apply_bwd(eps, relu, dtype, res, dy):
    x, y, mean, var, scale = res
    rs = lax.rsqrt(var + eps)  # (C,) fp32, 1/σ
    # x̂ in compute dtype — the only full-tensor intermediate
    xh = (x - mean.astype(dtype)) * rs.astype(dtype)
    du = jnp.where(y > 0, dy, jnp.zeros((), dy.dtype)) if relu else dy
    red = tuple(range(x.ndim - 1))
    n = 1
    for d in red:
        n *= x.shape[d]
    s_dy = jnp.sum(du, axis=red, dtype=jnp.float32)
    s_dyxh = jnp.sum(du * xh, axis=red, dtype=jnp.float32)
    g1 = (rs * scale.astype(jnp.float32)).astype(dtype)  # γ/σ
    c1 = (s_dy / n).astype(dtype)
    c2 = (s_dyxh / n).astype(dtype)
    dx = g1 * (du - c1 - xh * c2)
    return (dx.astype(x.dtype), jnp.zeros_like(mean), jnp.zeros_like(var),
            s_dyxh.astype(scale.dtype), s_dy.astype(scale.dtype))


_bn_train_apply.defvjp(_bn_train_apply_fwd, _bn_train_apply_bwd)


class BatchNorm2d(nn.Module):
    """BatchNorm over NHW with torch-parity running statistics.

    Differences from flax.linen.BatchNorm, chosen to match
    ``torch.nn.BatchNorm2d`` defaults used throughout the reference model:

    * ``momentum`` follows the torch convention:
      ``new = (1 - momentum) * old + momentum * batch`` with default 0.1.
    * Running **variance** is updated with the *unbiased* batch variance
      (``n/(n-1)`` correction) while normalization uses the biased one —
      exactly what torch does.
    * Statistics are always computed in fp32 regardless of compute dtype
      (apex-O1-like behavior).
    * Optional ``axis_name`` turns this into a cross-device sync-BN (a TPU
      extension; the reference's DDP never syncs BN stats, so leave it None
      for parity).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool, fold: bool = False,
                 relu: bool = False, stats=None,
                 group_blocks: int = 1) -> Array:
        """Normalize ``x`` (NHWC) over NHW.

        With ``fold=True`` the apply is NOT materialized: the per-channel
        coefficients ``(a, b)`` of ``y = x*a + b`` are returned (in
        ``self.dtype``) for the consumer to fold into its own kernel —
        statistics computation, running-stat updates, and the autodiff path
        through mean/var are identical either way.  ``relu=True`` fuses the
        following ReLU into the apply (same math as ``nn.relu(bn(x))``).

        ``stats=(s1, s2)`` (train only) supplies per-tile partial (Σx, Σx²)
        sums of ``x`` — fp32, any leading shape, channel-last — emitted by
        the producing fused-sepconv kernel; the batch mean/variance then
        come from these tiny partials instead of two full reduction passes
        over ``x``.  Variance uses the one-pass E[x²]−E[x]² form (fp32);
        gradients still flow to ``x`` through the partials' producer (the
        kernel's custom VJP), with identical math to the two-pass form.

        ``group_blocks=G`` treats the channel dim as (G, C) — G block
        copies of the same C real channels (the decoder's block-space
        (a, b, C) layout): statistics fold across the G groups, running
        stats and scale/bias have C entries, and the apply coefficients are
        tiled G× — all WITHOUT reshaping ``x`` out of its native G·C-lane
        layout (a (..., G·C) → (..., G·W, C) reshape is a real lane
        shuffle on TPU, measured ~27 GB/step of copies).
        """
        g = group_blocks
        # spatial-sharding override: sync stats over the H-shard axis
        axis_name = self.axis_name or _BN_SYNC_AXIS  # noqa: attribute read
        features = x.shape[-1] // g
        scale = self.param("scale", nn.initializers.ones, (features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        # Layout note: every fp32 intermediate here is a SINGLE-consumer chain
        # feeding a reduction, so XLA fuses the bf16→fp32 convert into the
        # reduce and never materializes an fp32 copy of the activation (a
        # shared `x32 = x.astype(f32)` materialized ~2.8 GB of copies per
        # step at full resolution — see PERF.md).
        if train and g > 1:
            assert stats is None and not fold
            # grouped one-pass stats in the native G·C-lane layout: the
            # full-tensor reductions produce (G·C,) fp32 vectors; only the
            # TINY vectors reshape across the group dim.
            n = x.shape[0] * x.shape[1] * x.shape[2] * g
            s1 = jnp.sum(x, axis=(0, 1, 2), dtype=jnp.float32)
            s2 = jnp.sum(
                jnp.square(x.astype(jnp.float32)), axis=(0, 1, 2))
            mean = s1.reshape(g, features).sum(0) / n
            ex2 = s2.reshape(g, features).sum(0) / n
            if axis_name is not None:
                mean = lax.pmean(mean, axis_name)
                ex2 = lax.pmean(ex2, axis_name)
                n = n * lax.psum(1, axis_name)
            var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        elif train and stats is not None:
            s1, s2 = stats
            red = tuple(range(s1.ndim - 1))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            mean = jnp.sum(s1, axis=red) / n
            ex2 = jnp.sum(s2, axis=red) / n
            if axis_name is not None:
                mean = lax.pmean(mean, axis_name)
                ex2 = lax.pmean(ex2, axis_name)
                n = n * lax.psum(1, axis_name)
            # one-pass variance; clamp the fp32 cancellation residue
            var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        elif train and _bn_one_pass():
            # one-pass E[x²]−E[x]² (opt-in DEEPCAM_BN_ONEPASS=1): both
            # sums come from ONE multi-output reduce fusion over x — half
            # the stats read traffic of the two-pass form; fp32 accum, var
            # clamped at 0 against the cancellation residue (same policy
            # as the kernel-stats path)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            mean = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
            ex2 = jnp.mean(
                jnp.square(x.astype(jnp.float32)), axis=(0, 1, 2))
            if axis_name is not None:
                mean = lax.pmean(mean, axis_name)
                ex2 = lax.pmean(ex2, axis_name)
                n = n * lax.psum(1, axis_name)
            var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        elif train:
            # pass 1: mean with fp32 accumulation
            mean = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if axis_name is not None:
                mean = lax.pmean(mean, axis_name)
                n = n * lax.psum(1, axis_name)
            # pass 2: centered second moment in fp32 (numerically stabler
            # than E[x^2] - E[x]^2 and still one fused convert-sub-sq-reduce;
            # centering on the post-pmean mean keeps sync-BN exact)
            var = jnp.mean(
                jnp.square(x.astype(jnp.float32) - mean),
                axis=(0, 1, 2),
            )
            if axis_name is not None:
                var = lax.pmean(var, axis_name)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        # closed-form backward in compute dtype (see _bn_bwd_custom): the
        # apply-mode train path hands off to the custom-VJP form so the
        # full-tensor cotangent never promotes to fp32
        mode = _bn_bwd_custom()
        use_custom = mode == "1" or (
            mode == "big" and x.shape[1] * x.shape[2] >= 131072)
        if (train and not fold and g == 1 and axis_name is None
                and use_custom):
            return _bn_train_apply(
                x.astype(self.dtype), mean, var, scale, bias,
                self.eps, relu, self.dtype)
        # apply as one fused FMA in the compute dtype: y = x*a + b with the
        # per-channel a/b computed in fp32
        inv = lax.rsqrt(var + self.eps) * scale.astype(jnp.float32)
        a = inv.astype(self.dtype)
        b = (bias.astype(jnp.float32) - mean * inv).astype(self.dtype)
        if fold:
            return a, b
        if g > 1:
            a = jnp.tile(a, g)
            b = jnp.tile(b, g)
        y = x.astype(self.dtype) * a + b
        if relu:
            # fused BN-apply+ReLU: identical math to nn.relu(bn(x)) but ONE
            # materialization — in layout-conversion-heavy regions (the
            # decoder's dilated-deconv neighborhood) the separate relu op
            # pays an extra full-tensor copy pair (r2 trace).
            y = jnp.maximum(y, 0)
        return y
