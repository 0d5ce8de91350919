"""SwinUNETR: 3D shifted-window transformer encoder + UNETR decoder.

Functional re-design of the MONAI SwinUNETR configuration the reference
selects (get_model.py:132-143: feature_size 24, gradient checkpointing,
3D): patch-embed conv (2x), four Swin stages (depths 2/2/2/2, heads
3/6/12/24, window 7^3, cyclic shift with masked attention, relative
position bias, patch-merging downsample), decoded by residual
UnetrBasicBlock/UnetrUpBlock pyramids. Transformer blocks run under
jax.checkpoint (the reference's use_checkpoint=True).
"""

from __future__ import annotations

import itertools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fcd_tpu.ops.blocks import MLPBlock, UnetrBasicBlock, UnetrUpBlock
from fcd_tpu.ops.layers import Conv3d, Dense, LayerNorm


def _window_partition(x, ws):
    """(B, D, H, W, C) -> (B*nw, ws^3, C)."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // ws, ws, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, ws * ws * ws, c)


def _window_reverse(windows, ws, dims):
    b, d, h, w = dims
    x = windows.reshape(b, d // ws, h // ws, w // ws, ws, ws, ws, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, -1)


def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws^3, ws^3) indices into the (2ws-1)^3 relative-position bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), np.arange(ws), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (3, N, N)
    rel = rel + (ws - 1)
    return (rel[0] * (2 * ws - 1) ** 2 + rel[1] * (2 * ws - 1) + rel[2]).astype(np.int32)


def _shift_attn_mask(dims, ws, shift) -> np.ndarray:
    """Attention mask (nw, N, N) for shifted windows: -inf across region
    boundaries, 0 within."""
    d, h, w = dims
    img = np.zeros((d, h, w), np.float32)
    cnt = 0
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for sd, sh, sw in itertools.product(slices, slices, slices):
        img[sd, sh, sw] = cnt
        cnt += 1
    win = img.reshape(d // ws, ws, h // ws, ws, w // ws, ws)
    win = win.transpose(0, 2, 4, 1, 3, 5).reshape(-1, ws ** 3)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -1e9, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    attn_drop: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, mask=None, *, train: bool = False):
        bw, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = Dense(c * 3, use_bias=True, dtype=self.dtype)(x)
        qkv = qkv.reshape(bw, n, 3, h, hd)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3))  # (bw,h,n,hd)
        q = q * (hd ** -0.5)
        attn = jnp.einsum("whnc,whmc->whnm", q, k)

        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 3, h),
        )
        idx = _rel_pos_index(self.window_size)
        bias = table[idx.reshape(-1)].reshape(n, n, h)
        attn = attn + jnp.transpose(bias, (2, 0, 1)).astype(attn.dtype)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, h, n, n) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("whnm,whmc->whnc", attn, v)
        out = jnp.moveaxis(out, 1, 2).reshape(bw, n, c)
        return Dense(c, dtype=self.dtype)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop: float = 0.0
    train: bool = False  # static attribute so the block remats cleanly
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        train = self.train
        b, d, h, w, c = x.shape
        ws = self.window_size
        pad = [(0, (-s) % ws) for s in (d, h, w)]
        shortcut = x
        y = LayerNorm()(x)
        if any(p[1] for p in pad):
            y = jnp.pad(y, [(0, 0)] + pad + [(0, 0)])
        dp, hp, wp = y.shape[1:4]
        shift = self.shift if min(dp, hp, wp) > ws else 0

        if shift:
            y = jnp.roll(y, (-shift, -shift, -shift), axis=(1, 2, 3))
            mask = jnp.asarray(_shift_attn_mask((dp, hp, wp), ws, shift))
        else:
            mask = None
        windows = _window_partition(y, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws, self.drop,
                               self.dtype)(windows, mask, train=train)
        y = _window_reverse(attn, ws, (b, dp, hp, wp))
        if shift:
            y = jnp.roll(y, (shift, shift, shift), axis=(1, 2, 3))
        y = y[:, :d, :h, :w]
        x = shortcut + nn.Dropout(self.drop, deterministic=not train)(y)
        x = x + MLPBlock(int(c * self.mlp_ratio), self.drop, self.dtype)(
            LayerNorm()(x), train=train
        )
        return x


class PatchMerging(nn.Module):
    dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        pad = [(0, d % 2), (0, h % 2), (0, w % 2)]
        if any(p[1] for p in pad):
            x = jnp.pad(x, [(0, 0)] + pad + [(0, 0)])
            b, d, h, w, c = x.shape
        x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, d // 2, h // 2, w // 2, 8 * c)
        x = LayerNorm()(x)
        return Dense(2 * self.dim, use_bias=False, dtype=self.dtype)(x)


class SwinUNETR(nn.Module):
    out_channels: int = 2
    feature_size: int = 24
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    norm_name: str = "instance"
    drop_rate: float = 0.0
    use_checkpoint: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        fs = self.feature_size

        # patch embedding: conv k2 s2 (MONAI PatchEmbed patch_size=2)
        h = Conv3d(fs, kernel_size=2, stride=2, use_bias=False, dtype=self.dtype)(x)
        hidden = []
        dim = fs
        block_cls = nn.remat(SwinBlock) if self.use_checkpoint else SwinBlock
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                h = block_cls(
                    dim=dim, num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift=0 if j % 2 == 0 else self.window_size // 2,
                    drop=self.drop_rate, train=train, dtype=self.dtype,
                )(h)
            hidden.append(h)
            h = PatchMerging(dim, dtype=self.dtype)(h)
            dim *= 2
        hidden.append(h)  # /32 features at 16*fs

        def enc(inp, ch):
            return UnetrBasicBlock(
                out_channels=ch, kernel_size=3, stride=1, norm_name=self.norm_name,
                res_block=True, use_bias=False, dtype=self.dtype,
            )(inp, train=train)

        def up(inp, skip, ch):
            return UnetrUpBlock(
                out_channels=ch, kernel_size=3, upsample_kernel_size=2,
                norm_name=self.norm_name, res_block=True, use_bias=False,
                dtype=self.dtype,
            )(inp, skip, train=train)

        enc0 = enc(x, fs)
        enc1 = enc(hidden[0], fs)
        enc2 = enc(hidden[1], fs * 2)
        enc3 = enc(hidden[2], fs * 4)
        dec4 = enc(hidden[4], fs * 16)

        d3 = up(dec4, hidden[3], fs * 8)
        d2 = up(d3, enc3, fs * 4)
        d1 = up(d2, enc2, fs * 2)
        d0 = up(d1, enc1, fs)
        out = up(d0, enc0, fs)
        return Conv3d(self.out_channels, 1, 1, use_bias=True, dtype=self.dtype)(out)
