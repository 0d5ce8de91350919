"""SegResNet family: SegResNet, SegResNetVAE, SegResNet_DSA, SegResNetVAE_DSA.

TPU-native re-design of the reference architectures
(networks/segresnet_dsa/segresnet_dsa.py:23-374 and the MONAI SegResNet /
SegResNetVAE configurations selected in get_model.py:145-244): a
pre-activation residual encoder (blocks_down), sum-skip decoder with
configurable upsampling, optional dual-self-attention transformer levels
(levels >= dsa_start_level get dsa_num_layers TransformerBlocks), and an
optional VAE regularization branch that reuses the decoder weights and
returns (logits, vae_loss) during training.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fcd_tpu.ops.attention import ChannelDropout3d, TransformerBlock
from fcd_tpu.ops.layers import Conv3d, Dense, UpSample, make_act, make_norm


class ResBlock(nn.Module):
    """Pre-activation residual block (MONAI segresnet_block.ResBlock parity):
    norm-act-conv-norm-act-conv + identity. Runs s2d-resident on TPU/bf16
    with instance norm (same machinery as ops.blocks.UnetResBlock)."""

    channels: int
    norm: str = "instance"
    act: Any = ("relu", {})
    dtype: Optional[Any] = None

    def _s2d_forward(self, xs):
        from fcd_tpu.ops.s2d_ops import from_s2d, instance_norm_s2d, leaky_relu_s2d

        c = self.channels
        name = (self.act[0] if isinstance(self.act, (tuple, list))
                else str(self.act)).lower()
        slope = 0.0 if name == "relu" else 0.01
        y = instance_norm_s2d(xs, c)
        y = leaky_relu_s2d(y, slope)
        y = Conv3d(c, 3, 1, use_bias=False, dtype=self.dtype)(s2d_parts=[(y, c)])
        y = instance_norm_s2d(y, c)
        y = leaky_relu_s2d(y, slope)
        y = Conv3d(c, 3, 1, use_bias=False, dtype=self.dtype)(s2d_parts=[(y, c)])
        return from_s2d(y + xs, c)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from fcd_tpu.ops.blocks import _s2d_block_eligible
        from fcd_tpu.ops.s2d_ops import to_s2d

        if _s2d_block_eligible(x.shape[1:4], self.channels, self.channels, 3, 1,
                               self.norm, self.act, self.dtype):
            return self._s2d_forward(to_s2d(x.astype(jnp.bfloat16)))

        act = make_act(self.act)
        y = make_norm(self.norm, self.channels, use_running_average=not train)(x)
        y = act(y)
        y = Conv3d(self.channels, 3, 1, use_bias=False, dtype=self.dtype)(y)
        y = make_norm(self.norm, self.channels, use_running_average=not train)(y)
        y = act(y)
        y = Conv3d(self.channels, 3, 1, use_bias=False, dtype=self.dtype)(y)
        return y + x


class _SegResNetCore(nn.Module):
    out_channels: int = 2
    init_filters: int = 8
    dropout_prob: Optional[float] = None
    act: Any = ("relu", {})
    norm: str = "instance"
    use_conv_final: bool = True
    blocks_down: Tuple[int, ...] = (1, 2, 2, 4)
    blocks_up: Tuple[int, ...] = (1, 1, 1)
    upsample_mode: str = "pixelshuffle"
    # DSA options (dsa_start_level=None disables attention levels)
    dsa_start_level: Optional[int] = None
    dsa_img_size: Tuple[int, int, int] = (128, 128, 128)
    dsa_project_size: int = 64
    dsa_num_heads: int = 4
    dsa_pos_embed: bool = True
    dsa_dropout_rate: float = 0.0
    dsa_sa_type: str = "parallel"
    dsa_num_layers: int = 3
    # VAE options
    vae: bool = False
    in_channels: int = 2
    input_image_size: Optional[Tuple[int, int, int]] = None
    vae_estimate_std: bool = False
    vae_default_std: float = 0.3
    vae_nz: int = 256
    smallest_filters: int = 16
    dtype: Optional[Any] = None

    def setup(self):
        f = self.init_filters
        self.conv_init = Conv3d(f, 3, 1, use_bias=False, dtype=self.dtype,
                                name="convInit")
        if self.dropout_prob is not None:
            self.dropout = ChannelDropout3d(self.dropout_prob)

        # encoder
        down_pre, down_blocks = [], []
        for i, n_blocks in enumerate(self.blocks_down):
            ch = f * 2 ** i
            down_pre.append(
                Conv3d(ch, 3, 2, use_bias=False, dtype=self.dtype) if i > 0 else None
            )
            down_blocks.append(
                [ResBlock(ch, self.norm, self.act, dtype=self.dtype)
                 for _ in range(n_blocks)]
            )
        self.down_pre = down_pre
        self.down_blocks = down_blocks

        # DSA transformer levels
        if self.dsa_start_level is not None:
            trans = []
            for i in range(self.dsa_start_level, len(self.blocks_down)):
                ch = f * 2 ** i
                n = int(np.prod([s // (2 ** i) for s in self.dsa_img_size]))
                trans.append(
                    [
                        TransformerBlock(
                            input_size=n,
                            hidden_size=ch,
                            proj_size=self.dsa_project_size,
                            num_heads=self.dsa_num_heads,
                            dropout_rate=self.dsa_dropout_rate,
                            pos_embed=self.dsa_pos_embed,
                            sa_type=self.dsa_sa_type,
                            dtype=self.dtype,
                        )
                        for _ in range(self.dsa_num_layers)
                    ]
                )
            self.transformer_levels = trans

        # decoder
        n_up = len(self.blocks_up)
        ups, upl = [], []
        for i in range(n_up):
            ch = f * 2 ** (n_up - i)
            ups.append(
                (
                    Conv3d(ch // 2, 1, 1, use_bias=False, dtype=self.dtype),
                    UpSample(ch // 2, scale=2, mode=self.upsample_mode,
                             dtype=self.dtype),
                )
            )
            upl.append(
                [ResBlock(ch // 2, self.norm, self.act, dtype=self.dtype)
                 for _ in range(self.blocks_up[i])]
            )
        self.up_samples = ups
        self.up_layers = upl

        if self.use_conv_final:
            self.final_norm = make_norm(self.norm, f)
            self.final_conv = Conv3d(self.out_channels, 1, 1, use_bias=True,
                                     dtype=self.dtype)

        if self.vae:
            zoom = 2 ** (len(self.blocks_down) - 1)
            v_filters = f * zoom
            self.fc_insize = [s // (2 * zoom) for s in self.input_image_size]
            total_elements = int(self.smallest_filters * np.prod(self.fc_insize))
            self.vae_down_norm = make_norm(self.norm, v_filters)
            self.vae_down_conv = Conv3d(self.smallest_filters, 3, 2, use_bias=True,
                                        dtype=self.dtype)
            self.vae_down_norm2 = make_norm(self.norm, self.smallest_filters)
            self.vae_fc1 = Dense(self.vae_nz, dtype=self.dtype)
            self.vae_fc2 = Dense(self.vae_nz, dtype=self.dtype)
            self.vae_fc3 = Dense(total_elements, dtype=self.dtype)
            self.vae_up_conv = Conv3d(v_filters, 1, 1, use_bias=False, dtype=self.dtype)
            self.vae_up_sample = UpSample(v_filters, scale=2, mode=self.upsample_mode,
                                          dtype=self.dtype)
            self.vae_up_norm = make_norm(self.norm, v_filters)
            self.vae_final_norm = make_norm(self.norm, f)
            self.vae_final_conv = Conv3d(self.in_channels, 1, 1, use_bias=True,
                                         dtype=self.dtype)

    def encode(self, x, *, train: bool):
        act = make_act(self.act)
        x = self.conv_init(x)
        if self.dropout_prob is not None:
            x = self.dropout(x, train=train)
        down_x = []
        for i, blocks in enumerate(self.down_blocks):
            if self.down_pre[i] is not None:
                x = self.down_pre[i](x)
            for blk in blocks:
                x = blk(x, train=train)
            if self.dsa_start_level is not None and i >= self.dsa_start_level:
                feat = x
                for blk in self.transformer_levels[i - self.dsa_start_level]:
                    feat = blk(feat, train=train)
                x = feat
            down_x.append(x)
        return x, down_x

    def decode(self, x, down_x, *, train: bool):
        act = make_act(self.act)
        for i, ((conv1, up), blocks) in enumerate(zip(self.up_samples, self.up_layers)):
            x = up(conv1(x)) + down_x[i + 1]
            for blk in blocks:
                x = blk(x, train=train)
        if self.use_conv_final:
            x = self.final_norm(x)
            x = act(x)
            x = self.final_conv(x)
        return x

    def _vae_loss(self, net_input, vae_input, *, train: bool):
        act = make_act(self.act)
        x = self.vae_down_norm(vae_input)
        x = act(x)
        x = self.vae_down_conv(x)
        x = self.vae_down_norm2(x)
        x = act(x)
        b = x.shape[0]
        x = x.reshape(b, -1)
        z_mean = self.vae_fc1(x)
        rng = self.make_rng("vae") if self.has_rng("vae") else self.make_rng("dropout")
        z_rand = jax.random.normal(rng, z_mean.shape, jnp.float32).astype(z_mean.dtype)
        if self.vae_estimate_std:
            z_sigma = jax.nn.softplus(self.vae_fc2(x))
            reg = 0.5 * jnp.mean(
                jnp.square(z_mean) + jnp.square(z_sigma)
                - jnp.log(1e-8 + jnp.square(z_sigma)) - 1.0
            )
            z = z_mean + z_sigma * z_rand
        else:
            reg = jnp.mean(jnp.square(z_mean))
            z = z_mean + self.vae_default_std * z_rand
        x = self.vae_fc3(z)
        x = act(x)
        # (B, D, H, W, C) with the smallest_filters channels last
        x = x.reshape([b, self.smallest_filters] + list(self.fc_insize))
        x = jnp.moveaxis(x, 1, -1)
        x = self.vae_up_conv(x)
        x = self.vae_up_sample(x)
        x = self.vae_up_norm(x)
        x = act(x)
        for (conv1, up), blocks in zip(self.up_samples, self.up_layers):
            x = up(conv1(x))
            for blk in blocks:
                x = blk(x, train=train)
        x = self.vae_final_norm(x)
        x = act(x)
        x = self.vae_final_conv(x)
        mse = jnp.mean(jnp.square(net_input.astype(jnp.float32) - x.astype(jnp.float32)))
        return reg.astype(jnp.float32) + mse

    def __call__(self, x, *, train: bool = False):
        net_input = x
        feat, down_x = self.encode(x, train=train)
        down_x = down_x[::-1]
        out = self.decode(feat, down_x, train=train)
        if self.vae:
            if train or self.is_initializing():
                vae_loss = self._vae_loss(net_input, feat, train=train)
                return (out, vae_loss) if train else (out, None)
            return out, None
        return out


def SegResNet(**kwargs) -> _SegResNetCore:
    """MONAI-SegResNet-equivalent configuration (get_model.py:145-163)."""
    kwargs.setdefault("vae", False)
    kwargs.setdefault("dsa_start_level", None)
    return _SegResNetCore(**kwargs)


def SegResNetVAE(**kwargs) -> _SegResNetCore:
    """SegResNet + VAE regularization branch (get_model.py:165-187)."""
    kwargs["vae"] = True
    kwargs.setdefault("dsa_start_level", None)
    return _SegResNetCore(**kwargs)
