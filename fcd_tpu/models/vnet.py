"""V-Net (MONAI VNet equivalent).

Functional re-design of the MONAI VNet configuration the reference selects
(get_model.py:81-94: PReLU(0.2), dropout 0.5 on the deep levels): 5x5x5
conv residual stages with input-broadcast residuals at the stem,
2x strided-conv down transitions, transposed-conv up transitions with
concatenated skips.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fcd_tpu.ops.attention import ChannelDropout3d
from fcd_tpu.ops.layers import Conv3d, ConvTranspose3d, make_act, make_norm


class _LUConv(nn.Module):
    channels: int
    act: Any = ("prelu", {"init": 0.2})
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = Conv3d(self.channels, 5, 1, use_bias=True, dtype=self.dtype)(x)
        out = make_norm("batch", self.channels, use_running_average=not train)(out)
        return make_act(self.act)(out)


class _InputTransition(nn.Module):
    out_channels: int = 16
    act: Any = ("prelu", {"init": 0.2})
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = Conv3d(self.out_channels, 5, 1, use_bias=True, dtype=self.dtype)(x)
        out = make_norm("batch", self.out_channels, use_running_average=not train)(out)
        # residual: input channels tiled up to out_channels (VNet stem trick)
        reps = self.out_channels // x.shape[-1]
        x16 = jnp.concatenate([x] * reps, axis=-1)
        return make_act(self.act)(out + x16)


class _DownTransition(nn.Module):
    out_channels: int
    n_convs: int
    dropout: float = 0.0
    act: Any = ("prelu", {"init": 0.2})
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        down = Conv3d(self.out_channels, 2, 2, use_bias=True, dtype=self.dtype)(x)
        down = make_norm("batch", self.out_channels, use_running_average=not train)(down)
        down = make_act(self.act)(down)
        out = down
        if self.dropout > 0:
            out = ChannelDropout3d(self.dropout)(out, train=train)
        for _ in range(self.n_convs):
            out = _LUConv(self.out_channels, self.act, self.dtype)(out, train=train)
        return make_act(self.act)(out + down)


class _UpTransition(nn.Module):
    out_channels: int
    n_convs: int
    dropout: float = 0.0
    act: Any = ("prelu", {"init": 0.2})
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skip, *, train: bool = False):
        if self.dropout > 0:
            x = ChannelDropout3d(self.dropout)(x, train=train)
            skip = ChannelDropout3d(0.5)(skip, train=train)
        up = ConvTranspose3d(self.out_channels // 2, 2, 2, use_bias=True,
                             dtype=self.dtype)(x)
        up = make_norm("batch", self.out_channels // 2,
                       use_running_average=not train)(up)
        up = make_act(self.act)(up)
        cat = jnp.concatenate([up, skip], axis=-1)
        out = cat
        for _ in range(self.n_convs):
            out = _LUConv(self.out_channels, self.act, self.dtype)(out, train=train)
        return make_act(self.act)(out + cat)


class VNet(nn.Module):
    out_channels: int = 2
    act: Any = ("prelu", {"init": 0.2})
    dropout_prob: float = 0.5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        a = self.act
        x16 = _InputTransition(16, a, self.dtype)(x, train=train)
        x32 = _DownTransition(32, 1, 0.0, a, self.dtype)(x16, train=train)
        x64 = _DownTransition(64, 2, 0.0, a, self.dtype)(x32, train=train)
        x128 = _DownTransition(128, 3, self.dropout_prob, a, self.dtype)(x64, train=train)
        x256 = _DownTransition(256, 2, self.dropout_prob, a, self.dtype)(x128, train=train)
        u = _UpTransition(256, 2, self.dropout_prob, a, self.dtype)(x256, x128, train=train)
        u = _UpTransition(128, 2, self.dropout_prob, a, self.dtype)(u, x64, train=train)
        u = _UpTransition(64, 1, 0.0, a, self.dtype)(u, x32, train=train)
        u = _UpTransition(32, 1, 0.0, a, self.dtype)(u, x16, train=train)
        out = Conv3d(self.out_channels, 5, 1, use_bias=True, dtype=self.dtype)(u)
        out = make_norm("batch", self.out_channels, use_running_average=not train)(out)
        out = make_act(self.act)(out)
        return Conv3d(self.out_channels, 1, 1, use_bias=True, dtype=self.dtype)(out)
