"""Classic residual U-Net (MONAI UNet equivalent).

Functional re-design of the MONAI UNet configuration the reference selects
(get_model.py:64-79: channels (16,32,64,128,256,512), strides 2^5,
num_res_units=2, instance norm, PReLU, dropout 0.1): strided residual-unit
encoder, transposed-conv decoder with concatenated skips and a residual
unit per level.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fcd_tpu.ops.attention import ChannelDropout3d
from fcd_tpu.ops.layers import Conv3d, ConvTranspose3d, make_act, make_norm


class ResidualUnit(nn.Module):
    """MONAI ResidualUnit parity: `subunits` x (conv-norm-dropout-act) with a
    strided 1x1 (or identity) residual; `last_conv_only` drops norm/act on
    the final subunit."""

    out_channels: int
    stride: int = 1
    subunits: int = 2
    kernel_size: int = 3
    norm: str = "instance"
    act: Any = "prelu"
    dropout: float = 0.0
    last_conv_only: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_channels = x.shape[-1]
        res = x
        out = x
        for i in range(max(self.subunits, 1)):
            stride = self.stride if i == 0 else 1
            conv_only = self.last_conv_only and i == self.subunits - 1
            out = Conv3d(self.out_channels, self.kernel_size, stride,
                         use_bias=True, dtype=self.dtype)(out)
            if not conv_only:
                out = make_norm(self.norm, self.out_channels,
                                use_running_average=not train)(out)
                if self.dropout > 0:
                    out = ChannelDropout3d(self.dropout)(out, train=train)
                out = make_act(self.act)(out)
        if self.stride != 1 or in_channels != self.out_channels:
            res = Conv3d(self.out_channels, 1 if self.stride == 1 else self.kernel_size,
                         self.stride, use_bias=True, dtype=self.dtype)(res)
        return out + res


class UNet(nn.Module):
    out_channels: int = 2
    channels: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    strides: Tuple[int, ...] = (2, 2, 2, 2, 2)
    num_res_units: int = 2
    norm: str = "instance"
    act: Any = "prelu"
    dropout: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        chans = self.channels
        strides = self.strides

        def up_layer(inp, out_ch, stride, is_top):
            out = ConvTranspose3d(out_ch, kernel_size=max(stride, 3) if stride > 1 else 3,
                                  stride=stride, use_bias=True, dtype=self.dtype)(inp)
            out = make_norm(self.norm, out_ch, use_running_average=not train)(out)
            if self.dropout > 0:
                out = ChannelDropout3d(self.dropout)(out, train=train)
            out = make_act(self.act)(out)
            if self.num_res_units > 0:
                out = ResidualUnit(
                    out_ch, stride=1, subunits=1, norm=self.norm, act=self.act,
                    dropout=self.dropout, last_conv_only=is_top, dtype=self.dtype,
                )(out, train=train)
            return out

        def block(inp, level):
            down = ResidualUnit(
                chans[level], stride=strides[level], subunits=self.num_res_units,
                norm=self.norm, act=self.act, dropout=self.dropout, dtype=self.dtype,
            )(inp, train=train)
            if level < len(chans) - 2:
                inner = block(down, level + 1)
            else:
                inner = ResidualUnit(
                    chans[level + 1], stride=1, subunits=self.num_res_units,
                    norm=self.norm, act=self.act, dropout=self.dropout,
                    dtype=self.dtype,
                )(down, train=train)
            cat = jnp.concatenate([down, inner], axis=-1)
            out_ch = self.out_channels if level == 0 else chans[level - 1]
            return up_layer(cat, out_ch, strides[level], is_top=(level == 0))

        return block(x, 0)
