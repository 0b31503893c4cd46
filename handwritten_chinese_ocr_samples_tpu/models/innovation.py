"""Experimental isolated-character classifier ("innovation" variant).

TPU-native counterpart of the reference's experimental model
(`innovation.py:13-282`): the same SE-ResNet trunk but with

  * symmetric ``MaxPool2d(2, 2)`` at every stage (`innovation.py:123,153-188`)
    — both height and width are downsampled (classification, not CTC);
  * optional multi-scale feature fusion (`MultiScaleFeatureFusion`,
    `innovation.py:194-227`): 1x1-conv+BN+ReLU per stage feature, bilinear
    resize to the last stage's spatial size, mean-fuse, 3x3-conv+BN+ReLU;
  * optional residual spatial attention (`SpatialAttention` `innovation.py:35`,
    ``x * (1 + gamma * attn)`` `innovation.py:50-58`);
  * global average-pool -> Dropout(0.5) -> Dense head
    (`innovation.py:248-254,273-277`); Adam optimizer, ``pred`` tag
    ``Classification`` (`innovation.py:235-236`).

Demonstrates the model-registry mechanism with a second tag
(``-m innovation``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .hctr import BasicBlock

Dtype = Any


def _maxpool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class SpatialAttention(nn.Module):
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        avg_out = jnp.mean(x, axis=-1, keepdims=True)
        max_out = jnp.max(x, axis=-1, keepdims=True)
        attn = jnp.concatenate([avg_out, max_out], axis=-1)
        attn = nn.Conv(1, (self.kernel_size, self.kernel_size),
                       padding=self.kernel_size // 2, use_bias=False,
                       dtype=self.dtype, name="conv")(attn)
        return nn.sigmoid(attn)


class ResidualSpatialAttention(nn.Module):
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        attn = SpatialAttention(self.kernel_size, dtype=self.dtype,
                                name="spatial")(x)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return x * (1.0 + gamma * attn)


class MultiScaleFeatureFusion(nn.Module):
    channels: Sequence[int] = (128, 256, 512, 512)
    out_channels: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features, *, train: bool):
        target_hw = features[-1].shape[1:3]
        transformed = []
        for i, feat in enumerate(features):
            y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name=f"transform{i}_conv")(feat)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"transform{i}_bn")(y)
            y = nn.relu(y)
            if y.shape[1:3] != target_hw:
                y = jax.image.resize(
                    y, (y.shape[0],) + tuple(target_hw) + (y.shape[-1],),
                    method="bilinear")
            transformed.append(y)
        fused = sum(transformed) / len(transformed)
        fused = nn.Conv(self.out_channels, (3, 3), padding=1,
                        dtype=self.dtype, name="fusion_conv")(fused)
        fused = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name="fusion_bn")(fused)
        return nn.relu(fused)


class InnovationBackbone(nn.Module):
    """SE-ResNet [2,4,5,1] trunk with symmetric pooling; returns per-stage
    features for multi-scale fusion (`innovation.py:143-191`)."""

    out_channels: int = 512
    num_blocks: Sequence[int] = (2, 4, 5, 1)
    dtype: Dtype = jnp.float32
    stage_drop: Sequence[float] = (0.3, 0.3, 0.3, 0.9)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool):
        widths = [self.out_channels // 8, self.out_channels // 4,
                  self.out_channels // 2, self.out_channels,
                  self.out_channels]

        x = nn.Conv(widths[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv0_1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn0_1")(x)
        x = nn.relu(x)
        x = nn.Conv(widths[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv0_2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn0_2")(x)
        x = nn.relu(x)
        x = _maxpool_2x2(x)

        features = []
        in_planes = widths[0]
        for stage in range(4):
            planes = widths[stage + 1]
            for b in range(self.num_blocks[stage]):
                x = BasicBlock(
                    planes,
                    use_downsample=(b == 0 and in_planes != planes),
                    dtype=self.dtype,
                    name=f"block{stage + 1}_{b}",
                )(x, train=train)
                in_planes = planes
            x = nn.Conv(planes, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{stage + 1}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{stage + 1}")(x)
            x = nn.relu(x)
            x = _maxpool_2x2(x)
            x = nn.Dropout(self.stage_drop[stage],
                           deterministic=not train)(x)
            features.append(x)
        return x, features


class InnovationModel(nn.Module):
    """Isolated-character classifier: trunk -> (fusion/attn) -> GAP -> Dense."""

    num_classes: int
    use_multiscale: bool = False
    use_spatial_attn: bool = False
    dtype: Dtype = jnp.float32

    img_height: int = 128
    pad_mode: str = "NormalizePAD"
    optimizer: str = "Adam"
    pred: str = "Classification"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x, features = InnovationBackbone(dtype=self.dtype, name="cnn")(
            x, train=train)
        if self.use_multiscale:
            x = MultiScaleFeatureFusion(dtype=self.dtype,
                                        name="feature_fusion")(
                features, train=train)
        if self.use_spatial_attn:
            x = ResidualSpatialAttention(dtype=self.dtype,
                                         name="spatial_attn")(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x.astype(jnp.float32)


def innovation_model(num_classes: int, dtype: Dtype = jnp.float32,
                     use_multiscale: bool = False,
                     use_spatial_attn: bool = False) -> InnovationModel:
    return InnovationModel(num_classes=num_classes, dtype=dtype,
                           use_multiscale=use_multiscale,
                           use_spatial_attn=use_spatial_attn)
