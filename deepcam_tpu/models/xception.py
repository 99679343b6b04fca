"""Modified aligned Xception backbone, TPU-native (NHWC, bf16 compute).

Architecture parity with the reference backbone
(``/root/reference/src/deepCam/architecture/deeplab_xception.py:69-242``):
entry flow (2 convs + 3 down-sampling blocks), 16 identical 728-channel middle
blocks, exit flow (block20 + three dilated separable convs to 2048 channels).
The low-level feature tap is taken after block1 (128 ch, stride 4), matching
``deeplab_xception.py:205-206``.

Design notes (TPU-first, not a translation):
* everything is channels-last; the 728-channel middle flow maps the pointwise
  1x1 convs onto the MXU as (H*W, C) x (C, C) matmuls.
* the residual add and ReLUs are left to XLA fusion.
* ``jax.checkpoint``-friendly: the middle flow is expressed as a scan-free
  sequence of named blocks; remat policy is applied by the trainer, not here.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    BatchNorm2d,
    Conv2d,
    SeparableConv2dSame,
    bn_fold_active,
    boundary_fold_active,
    fused_stats_active,
    kaiming_normal_torch,
)

Dtype = Any


class XceptionBlock(nn.Module):
    """Xception residual block (parity: ``Block``, ``deeplab_xception.py:69-122``).

    Semantics reproduced exactly:
      * rep sequence of [ReLU, sepconv-same, BN] units; the first ReLU is
        dropped when ``start_with_relu=False``;
      * ``grow_first`` controls whether the channel growth happens in the
        first or the last unit;
      * stride != 1 appends a *bare* stride-2 separable conv (no BN/ReLU);
        stride == 1 and ``is_last`` appends a bare stride-1 separable conv;
      * skip path is 1x1-conv+BN when channels or stride change, identity
        otherwise; output = rep(x) + skip(x) with no trailing ReLU.

    IMPORTANT inplace-ReLU aliasing quirk (verified empirically against the
    reference): ``Block.rep``'s ReLUs are ``nn.ReLU(inplace=True)`` and
    ``forward`` runs ``x = self.rep(inp)`` BEFORE reading ``inp`` again for
    the skip path (deeplab_xception.py:79,111-118).  When
    ``start_with_relu=True`` the first ReLU therefore mutates ``inp`` in
    place, so the skip/residual path sees ``relu(inp)`` — including the
    identity residual of every middle-flow block.  We reproduce exactly that:
    the leading ReLU is applied once to the input before the residual split.
    """

    out_ch: int
    reps: int
    stride: int = 1
    dilation: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    is_last: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, boundary_in=None,
                 emit_boundary: bool = False):
        """``boundary_in=((a, b), skip)`` (block-boundary fold,
        DEEPCAM_BOUNDARY_FOLD=1): ``x`` is then the PREVIOUS block's
        chain-final raw pointwise output and this block's input stream
        ``r = relu(x*a + b + skip)`` is computed inside unit 0's kernel
        (one less HBM pass per boundary); requires ``start_with_relu``.

        ``emit_boundary=True`` (stride-1, no-tail blocks only): instead of
        applying the chain-final BN and the residual add, return the
        pending triple ``(y_last_raw, (a, b), skip)`` for the NEXT block
        to fold — the block output tensor never materializes."""
        in_ch = x.shape[-1]
        if boundary_in is not None:
            assert self.start_with_relu
            inp = None  # set to unit 0's emitted r below
        else:
            if self.start_with_relu:
                # inplace-ReLU aliasing: the residual/skip input is relu(x)
                x = nn.relu(x)
            inp = x

        # Build the unit list exactly like the reference constructor.
        units = []  # (out_features,)
        if self.grow_first:
            units.append(self.out_ch)
            filters = self.out_ch
        else:
            filters = in_ch
        for _ in range(self.reps - 1):
            units.append(filters)
        if not self.grow_first:
            units.append(self.out_ch)

        # BN-apply folding: each rep BN whose only consumer is the NEXT
        # sepconv in this chain hands its (a, b) into that unit's kernel
        # instead of materializing the apply (layers.bn_fold_active()).  The
        # chain-final BN feeds the residual add (or nothing follows), so it
        # always applies normally.
        fold = bn_fold_active()
        # in train mode the fused sepconv kernel can emit the following
        # BN's (Σy, Σy²) partials from VMEM (layers.fused_stats_active())
        emit = fused_stats_active() and train
        has_tail = self.stride != 1 or self.is_last
        if emit_boundary:
            # pending-triple emission needs a foldable chain-final BN and
            # an identity residual (middle-flow blocks only)
            assert not has_tail and fold and self.out_ch == in_ch
        ab = None
        for i, feat in enumerate(units):
            # the rep-unit ReLU (i > 0) is declared ON the sepconv so the
            # TPU path can fuse relu→dw→pw into one kernel; unit 0's ReLU is
            # the block-level one applied above (shared with the residual)
            if i == 0 and boundary_in is not None:
                x, st, inp = SeparableConv2dSame(
                    features=feat,
                    kernel_size=3,
                    stride=1,
                    dilation=self.dilation,
                    pre_relu=False,
                    dtype=self.dtype,
                    name=f"sepconv{i}",
                )(x, emit_stats=emit, boundary=boundary_in)
            else:
                x = SeparableConv2dSame(
                    features=feat,
                    kernel_size=3,
                    stride=1,
                    dilation=self.dilation,
                    pre_relu=i > 0,
                    dtype=self.dtype,
                    name=f"sepconv{i}",
                )(x, bn_fold=ab, emit_stats=emit)
                st = None
                if emit:
                    x, st = x
            if fold and (i < len(units) - 1 or has_tail or emit_boundary):
                ab = BatchNorm2d(dtype=self.dtype, name=f"bn{i}")(
                    x, train, fold=True, stats=st
                )
            else:
                x = BatchNorm2d(dtype=self.dtype, name=f"bn{i}")(
                    x, train, stats=st
                )
                ab = None
        if emit_boundary:
            # hand (y_last_raw, chain-final BN coeffs, residual stream) to
            # the next block; the output tensor never materializes here
            return x, ab, inp

        if self.stride != 1:
            x = SeparableConv2dSame(
                features=self.out_ch,
                kernel_size=3,
                stride=2,
                dtype=self.dtype,
                name="sepconv_stride",
            )(x, bn_fold=ab)
        elif self.is_last:
            x = SeparableConv2dSame(
                features=self.out_ch,
                kernel_size=3,
                stride=1,
                dtype=self.dtype,
                name="sepconv_last",
            )(x, bn_fold=ab)

        if self.out_ch != in_ch or self.stride != 1:
            skip = Conv2d(
                features=self.out_ch,
                kernel_size=1,
                stride=self.stride,
                kernel_init=kaiming_normal_torch(),
                dtype=self.dtype,
                name="skip_conv",
            )(inp)
            skip = BatchNorm2d(dtype=self.dtype, name="skip_bn")(skip, train)
        else:
            skip = inp

        return x + skip


class Xception(nn.Module):
    """Modified aligned Xception encoder (``deeplab_xception.py:125-242``).

    Returns ``(features_2048 @ stride os, low_level_features_128 @ stride 4)``.
    """

    output_stride: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool,
                 s2d_input: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``s2d_input=True``: ``x`` arrives pre-space-to-depth'd as
        (N, H/2, W/2, 4·16) — conv1 consumes the layout directly
        (``Conv2d(s2d_pre=True)``), removing the on-device s2d transpose
        of the full-res input; identical math and parameter tree."""
        if self.output_stride == 16:
            entry_block3_stride = 2
            middle_block_rate = 1
            exit_block_rates = (1, 2)
        elif self.output_stride == 8:
            entry_block3_stride = 1
            middle_block_rate = 2
            exit_block_rates = (2, 4)
        else:
            raise NotImplementedError(
                f"output_stride {self.output_stride} not supported"
            )

        # Entry flow (small_ch_vjp: custom backward for these lane-starved
        # high-resolution convs, ops/conv_small_ch.py)
        x = Conv2d(32, 3, stride=2, padding=1, dtype=self.dtype,
                   small_ch_vjp=True, s2d_pre=s2d_input, name="conv1")(x)
        x = BatchNorm2d(dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = Conv2d(64, 3, stride=1, padding=1, dtype=self.dtype,
                   small_ch_vjp=True, name="conv2")(x)
        x = BatchNorm2d(dtype=self.dtype, name="bn2")(x, train)
        x = nn.relu(x)

        x = XceptionBlock(
            128, reps=2, stride=2, start_with_relu=False, dtype=self.dtype, name="block1"
        )(x, train)
        # The reference taps low_level_feat after block1 (:205-206), but
        # block2's leading inplace ReLU then mutates that same tensor —
        # downstream consumers actually receive relu(block1_out).  Reproduce.
        low_level_feat = nn.relu(x)
        x = XceptionBlock(256, reps=2, stride=2, dtype=self.dtype, name="block2")(
            x, train
        )
        x = XceptionBlock(
            728,
            reps=2,
            stride=entry_block3_stride,
            is_last=True,
            dtype=self.dtype,
            name="block3",
        )(x, train)

        # Middle flow: 16 identical blocks (block4..block19).  With the
        # boundary fold active, each block hands its chain-final
        # (y_raw, (a, b), residual) to the next block's unit-0 kernel and
        # the inter-block stream tensors never materialize in HBM
        # (boundaries 4→5 … 19→20; block4's own entry stays the XLA relu).
        use_boundary = boundary_fold_active()
        pending = None
        for i in range(4, 20):
            blk = XceptionBlock(
                728,
                reps=3,
                stride=1,
                dilation=middle_block_rate,
                dtype=self.dtype,
                name=f"block{i}",
            )
            if use_boundary:
                if pending is None:
                    pending = blk(x, train, emit_boundary=True)
                else:
                    y_prev, ab_prev, skip_prev = pending
                    pending = blk(y_prev, train,
                                  boundary_in=(ab_prev, skip_prev),
                                  emit_boundary=True)
            else:
                x = blk(x, train)

        # Exit flow
        blk20 = XceptionBlock(
            1024,
            reps=2,
            stride=1,
            dilation=exit_block_rates[0],
            grow_first=False,
            is_last=True,
            dtype=self.dtype,
            name="block20",
        )
        if use_boundary and pending is not None:
            y_prev, ab_prev, skip_prev = pending
            x = blk20(y_prev, train, boundary_in=(ab_prev, skip_prev))
        else:
            x = blk20(x, train)

        fold = bn_fold_active()
        emit = fused_stats_active() and train

        def unpack(out):
            return out if emit else (out, None)

        x, st = unpack(SeparableConv2dSame(
            1536, 3, stride=1, dilation=exit_block_rates[1], dtype=self.dtype, name="conv3"
        )(x, emit_stats=emit))
        # bn3/bn4 feed only the next sepconv → fold their applies into it
        ab = None
        if fold:
            ab = BatchNorm2d(dtype=self.dtype, name="bn3")(
                x, train, fold=True, stats=st)
        else:
            x = BatchNorm2d(dtype=self.dtype, name="bn3")(x, train, stats=st)

        # the inter-conv ReLUs are declared on the sepconvs (fusable on TPU)
        x, st = unpack(SeparableConv2dSame(
            1536, 3, stride=1, dilation=exit_block_rates[1], pre_relu=True,
            dtype=self.dtype, name="conv4"
        )(x, bn_fold=ab, emit_stats=emit))
        if fold:
            ab = BatchNorm2d(dtype=self.dtype, name="bn4")(
                x, train, fold=True, stats=st)
        else:
            x = BatchNorm2d(dtype=self.dtype, name="bn4")(x, train, stats=st)
            ab = None

        x, st = unpack(SeparableConv2dSame(
            2048, 3, stride=1, dilation=exit_block_rates[1], pre_relu=True,
            dtype=self.dtype, name="conv5"
        )(x, bn_fold=ab, emit_stats=emit))
        x = BatchNorm2d(dtype=self.dtype, name="bn5")(x, train, stats=st)
        x = nn.relu(x)

        return x, low_level_feat
