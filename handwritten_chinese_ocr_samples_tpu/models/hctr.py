"""HCTR recognition model: SE-ResNet with asymmetric pooling + CTC head.

TPU-first re-design of the reference architecture
(`models/handwritten_ctr_model.py:11-178`):

  * NHWC layout (XLA's native TPU conv layout) instead of NCHW.
  * Compute dtype is configurable (bf16 on TPU; the MXU natively consumes
    bf16); parameters and BatchNorm statistics stay f32.
  * All shapes static — pair with the width-bucketed data pipeline so XLA
    compiles one executable per bucket.

Architecture parity (validated against the torch reference in
`tests/test_model_parity.py`):

  * ``SELayer`` (`handwritten_ctr_model.py:11-30`): global avg-pool ->
    FC(C -> C/16, no bias) -> ReLU -> FC(-> C, no bias) -> sigmoid -> scale.
  * ``BasicBlock`` (`:33-60`): conv3x3 -> BN -> ReLU -> conv3x3 -> BN -> SE ->
    (+residual; 1x1-conv+BN downsample on channel change `:101-113`) -> ReLU ->
    Dropout(0.1).
  * ``ResNet(1->512, blocks [2,4,5,1])`` (`:63-153`): stem of two conv3x3;
    four stages of (blocks -> conv3x3 -> BN -> ReLU); after the stem and each
    stage a max-pool kernel (2,1) stride (2,1): height 128 -> 4, width never
    downsampled. Stage dropouts 0.3/0.3/0.3/0.9 (`:96-99`).
  * Head (`:164-178`): flatten (H=4, C=512) -> 2048, Linear -> num_classes.
    Output here is batch-major ``(B, W, num_classes)`` (the TPU-friendly
    layout); the reference emits time-major ``(W, B, D)`` — transpose at the
    boundary when bit-parity with the reference layout is needed.

The CTC time axis therefore equals the (padded) pixel width, exactly as in the
reference (`main.py:388`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dropout import dropout_recompute

Dtype = Any

# quant: an optional nested dict mirroring the module tree, holding one
# f32 input-absmax scalar per conv site (built by ``serve/quant.py``
# calibration from the "intermediates" this module sows). When a site's
# entry is present the conv runs int8 x int8 -> int32 on the MXU (~1.9x
# bf16 on v5e — measured, NOTES.md round 3) with symmetric per-tensor
# activation / per-channel weight scales; when absent (or quant is None)
# the site runs the plain float path. Inference-only (`train=False`).


def _qsub(quant, name: str):
    """Child sub-dict of a nested quant tree (None-propagating)."""
    return None if quant is None else quant.get(name)


class QuantizableConv(nn.Conv):
    """``nn.Conv`` with an optional int8 inference path.

    Identical parameter names/shapes ("kernel", "bias") and float
    behavior — existing checkpoints load unchanged and the float path IS
    ``nn.Conv.__call__``. With ``amax`` (the calibrated absmax of this
    site's input), the matmul runs s8 x s8 -> s32 and dequantizes into
    the usual compute dtype:

        x_q = round(x / s_x),  s_x = amax / 127        (per-tensor)
        w_q = round(w / s_w),  s_w = absmax_w / 127    (per out-channel)
        y   = conv(x_q, w_q, s32) * s_x * s_w + bias

    Every call sows ``intermediates/amax_in`` (the input absmax) so a
    float forward with ``mutable=["intermediates"]`` IS the calibration
    pass. Weight scales derive from the live kernel inside the program —
    there is nothing to keep in sync with the checkpoint."""

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 amax: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        self.sow("intermediates", "amax_in",
                 jnp.max(jnp.abs(x)).astype(jnp.float32))
        if amax is None:
            return super().__call__(x)

        # the int8 branch implements the plain-conv subset this model
        # uses; fail loudly if a future site strays from it
        def _pair(v):
            if v is None:
                return (1, 1)
            return (v, v) if isinstance(v, int) else tuple(v)

        if (_pair(self.strides) != (1, 1)
                or self.feature_group_count != 1
                or _pair(self.kernel_dilation) != (1, 1)
                or _pair(self.input_dilation) != (1, 1)):
            raise NotImplementedError(
                "QuantizableConv int8 path supports stride-1, undilated, "
                "ungrouped convs only")
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)

        s_x = jnp.maximum(amax.astype(jnp.float32), 1e-8) / 127.0
        w32 = kernel.astype(jnp.float32)
        s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)),
                          1e-8) / 127.0                      # (Cout,)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                       -127, 127).astype(jnp.int8)
        w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        y = jax.lax.conv_general_dilated(
            x_q, w_q, window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s_x * s_w)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class _Dropout(nn.Module):
    """Recompute-in-backward dropout (``ops/dropout.py``): the keep-mask is
    regenerated from the key in the VJP instead of stored — the model has 16
    dropout sites over multi-GB activations and the saved-mask residual
    traffic dominated the measured dropout cost (NOTES.md train profile)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        if self.rate >= 1.0:          # nn.Dropout semantics: drop everything
            return jnp.zeros_like(x)
        return dropout_recompute(x, self.make_rng("dropout"), self.rate)


def _maxpool_h2(x: jnp.ndarray, impl: str = "window") -> jnp.ndarray:
    """Max-pool kernel (2,1) stride (2,1) on NHWC: halve height, keep width.

    Two bit-identical lowerings (H is always even here; the window never
    overlaps, so both reduce the same disjoint pairs):

    * ``window`` (inference default): ``reduce_window`` — a reshape+max
      variant measured ~4% SLOWER for the eval forward on v5e (the
      reshapes break elementwise fusion around the pool).
    * ``reshape``: ``max`` over a split height axis. Its BACKWARD is an
      elementwise select + pad-interleave instead of ``reduce_window``'s
      SelectAndScatter, which XLA:TPU lowers poorly at these shapes
      (train-step attribution, NOTES round 4).
    """
    if impl == "reshape":
        B, H, W, C = x.shape
        return x.reshape(B, H // 2, 2, W, C).max(axis=2)
    return nn.max_pool(x, window_shape=(2, 1), strides=(2, 1))


class SELayer(nn.Module):
    """Squeeze-and-excitation channel gate (SENet)."""

    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # (B, H, W, C) -> (B, C)
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
        y = nn.Dense(self.channels // self.reduction, use_bias=False,
                     dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                     name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class BasicBlock(nn.Module):
    """conv3x3-BN-ReLU-conv3x3-BN-SE-(+res)-ReLU-Dropout(0.1)."""

    planes: int
    use_downsample: bool = False
    dtype: Dtype = jnp.float32
    bn_momentum: float = 0.9
    drop_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 quant=None) -> jnp.ndarray:
        residual = x
        out = QuantizableConv(self.planes, (3, 3), padding=1,
                              dtype=self.dtype, name="conv1")(
                                  x, _qsub(quant, "conv1"))
        out = nn.BatchNorm(use_running_average=not train,
                           momentum=self.bn_momentum, epsilon=1e-5,
                           dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = QuantizableConv(self.planes, (3, 3), padding=1,
                              dtype=self.dtype, name="conv2")(
                                  out, _qsub(quant, "conv2"))
        out = nn.BatchNorm(use_running_average=not train,
                           momentum=self.bn_momentum, epsilon=1e-5,
                           dtype=self.dtype, name="bn2")(out)
        out = SELayer(self.planes, dtype=self.dtype, name="se")(out)
        if self.use_downsample:
            residual = QuantizableConv(self.planes, (1, 1), use_bias=False,
                                       dtype=self.dtype, name="down_conv")(
                                           x, _qsub(quant, "down_conv"))
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=self.bn_momentum, epsilon=1e-5,
                                    dtype=self.dtype, name="down_bn")(residual)
        out = out + residual
        out = nn.relu(out)
        out = _Dropout(self.drop_rate)(out, deterministic=not train)
        return out


class SEResNetBackbone(nn.Module):
    """1 -> 512 channel SE-ResNet, blocks [2, 4, 5, 1], asymmetric pooling.

    Input  (B, 128, W, 1); output (B, 4, W, 512).
    """

    out_channels: int = 512
    num_blocks: Sequence[int] = (2, 4, 5, 1)
    dtype: Dtype = jnp.float32
    stage_drop: Sequence[float] = (0.3, 0.3, 0.3, 0.9)
    block_drop: float = 0.1
    remat: bool = False
    pool_impl: str = "window"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool,
                 quant=None) -> jnp.ndarray:
        widths = [self.out_channels // 8, self.out_channels // 4,
                  self.out_channels // 2, self.out_channels,
                  self.out_channels]  # 64, 128, 256, 512, 512
        # Rematerialized blocks recompute activations in the backward pass,
        # trading ~33% extra FLOPs for the dominant activation memory —
        # raising the max train batch beyond the reference's OOM bound
        # (`Debug_Notebook.ipynb` cells 5-6).
        Block = (nn.remat(BasicBlock, static_argnums=(2,))
                 if self.remat else BasicBlock)

        # Stem: conv-BN-ReLU x2, then height/2.
        x = QuantizableConv(widths[0], (3, 3), padding=1, dtype=self.dtype,
                            name="conv0_1")(x, _qsub(quant, "conv0_1"))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn0_1")(x)
        x = nn.relu(x)
        x = QuantizableConv(widths[0], (3, 3), padding=1, dtype=self.dtype,
                            name="conv0_2")(x, _qsub(quant, "conv0_2"))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn0_2")(x)
        x = nn.relu(x)
        x = _maxpool_h2(x, self.pool_impl)

        in_planes = widths[0]
        for stage in range(4):
            planes = widths[stage + 1]
            for b in range(self.num_blocks[stage]):
                name = f"block{stage + 1}_{b}"
                x = Block(
                    planes,
                    use_downsample=(b == 0 and in_planes != planes),
                    dtype=self.dtype,
                    drop_rate=self.block_drop,
                    name=name,
                )(x, train, _qsub(quant, name))
                in_planes = planes
            x = QuantizableConv(planes, (3, 3), padding=1, dtype=self.dtype,
                                name=f"conv{stage + 1}")(
                                    x, _qsub(quant, f"conv{stage + 1}"))
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{stage + 1}")(x)
            x = nn.relu(x)
            x = _maxpool_h2(x, self.pool_impl)
            x = _Dropout(self.stage_drop[stage])(x, deterministic=not train)
        return x


class HCTRModel(nn.Module):
    """SE-ResNet backbone + per-column CTC classification head.

    ``num_classes = 1 (blank) + vocabulary + 1 (unknown)`` — default 7375 for
    the full 7373-char HWDB vocabulary (`handwritten_ctr_model.py:157`,
    `preparation_flow.py:174`).

    __call__: (B, 128, W, 1) grayscale, normalized to [-1, 1]
              -> (B, W, num_classes) logits (batch-major).
    """

    num_classes: int = 7375
    dtype: Dtype = jnp.float32
    backbone_channels: int = 512
    num_blocks: Sequence[int] = (2, 4, 5, 1)
    stage_drop: Sequence[float] = (0.3, 0.3, 0.3, 0.9)
    block_drop: float = 0.1
    remat: bool = False
    pool_impl: str = "window"
    # Tensor-parallel head enablement: pad the classifier width up to a
    # multiple so the (2048, n) kernel divides over the mesh ``model`` axis
    # (`train.step.param_shardings` is divisibility-gated and 7375 is odd —
    # VERDICT r3). The tail columns are dead weight: logits are sliced back
    # to ``num_classes`` at the output boundary, so the external contract
    # (and CTC/decoder class space) is unchanged; the pad columns receive
    # zero gradient. Default 1 = exact head, checkpoint-compatible.
    head_pad_multiple: int = 1

    # Model-intrinsic config, mirroring the attribute-registry pattern of the
    # reference (`handwritten_ctr_model.py:159-162`, consumed at
    # `main.py:192-196`).
    img_height: int = 128
    pad_mode: str = "NormalizePAD"
    optimizer: str = "SGD"
    pred: str = "CTC"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 quant=None) -> jnp.ndarray:
        x = x.astype(self.dtype)
        feats = SEResNetBackbone(out_channels=self.backbone_channels,
                                 num_blocks=tuple(self.num_blocks),
                                 dtype=self.dtype, remat=self.remat,
                                 pool_impl=self.pool_impl,
                                 stage_drop=tuple(self.stage_drop),
                                 block_drop=self.block_drop,
                                 name="cnn")(x, train=train,
                                             quant=_qsub(quant, "cnn"))
        # (B, H=4, W, C=512) -> (B, W, H*C=2048). Native flatten order is
        # (H, C); the torch checkpoint converter permutes the head weight from
        # the reference's (C, H) order (`handwritten_ctr_model.py:173`).
        B, H, W, C = feats.shape
        feats = feats.transpose(0, 2, 1, 3).reshape(B, W, H * C)
        m = max(int(self.head_pad_multiple), 1)
        padded = -(-self.num_classes // m) * m
        logits = nn.Dense(padded, dtype=self.dtype, name="linear")(feats)
        if padded != self.num_classes:
            logits = logits[..., : self.num_classes]
        return logits.astype(jnp.float32)


def hctr_model(num_classes: int = 7375, dtype: Dtype = jnp.float32,
               remat: bool = False,
               head_pad_multiple: int = 1) -> HCTRModel:
    """Factory mirroring `handwritten_ctr_model.py:156`."""
    return HCTRModel(num_classes=num_classes, dtype=dtype, remat=remat,
                     head_pad_multiple=head_pad_multiple)
