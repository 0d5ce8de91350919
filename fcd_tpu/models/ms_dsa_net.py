"""MS-DSA-NET family: BaseUNet, MS_DSA_NET, MS_DSA_NET_PS.

TPU-native (NDHWC, flax) re-design of the reference architectures
(networks/ms_dsa_net/ms_dsa_net.py:20-726): a 6-level U-Net encoder with
parallel dual-self-attention transformer branches at the 4x..32x levels,
decoded by transposed-conv (MS_DSA_NET) or configurable-upsample
(MS_DSA_NET_PS) skip-fusion blocks.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fcd_tpu.ops.attention import TransformerBlock
from fcd_tpu.ops.blocks import GeneralUnetrUpBlock, UnetrBasicBlock, UnetrUpBlock
from fcd_tpu.ops.layers import Conv3d, GroupNorm, max_pool_2x

from fcd_tpu import flags as _fcd_flags


def _triple(x) -> Tuple[int, int, int]:
    if isinstance(x, (tuple, list)):
        return tuple(int(v) for v in x)
    return (int(x),) * 3


class BaseUNet(nn.Module):
    """Depth-configurable plain U-Net (ms_dsa_net.py:20-101)."""

    out_channels: int
    feature_size: int = 16
    depth: int = 5
    norm_name: str = "instance"
    act_name: Any = ("leakyrelu", {"negative_slope": 0.01})
    res_block: bool = False
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = []
        chans = self.feature_size
        out = x
        for i in range(self.depth):
            out = UnetrBasicBlock(
                out_channels=chans,
                kernel_size=3,
                stride=1,
                norm_name=self.norm_name,
                act_name=self.act_name,
                res_block=self.res_block,
                use_bias=self.use_bias,
                dtype=self.dtype,
            )(out, train=train)
            feats.append(out)
            if i != self.depth - 1:
                out = max_pool_2x(out)
                chans *= 2

        dec = out
        for i in range(self.depth - 1):
            chans //= 2
            dec = UnetrUpBlock(
                out_channels=chans,
                kernel_size=3,
                upsample_kernel_size=2,
                norm_name=self.norm_name,
                act_name=self.act_name,
                res_block=self.res_block,
                use_bias=self.use_bias,
                dtype=self.dtype,
            )(dec, feats[-(i + 2)], train=train)

        return Conv3d(self.out_channels, kernel_size=1, use_bias=True,
                      dtype=self.dtype)(dec)


class _MSDSACore(nn.Module):
    """Shared encoder/transformer trunk of MS_DSA_NET and MS_DSA_NET_PS
    (ms_dsa_net.py:104-407 / 409-726). The decoder is parameterized by
    `upsample_mode`: None selects transposed-conv UnetrUpBlocks (MS_DSA_NET),
    otherwise GeneralUnetrUpBlocks with the requested mode (MS_DSA_NET_PS)."""

    out_channels: int
    img_size: Sequence[int]
    feature_size: int = 16
    project_size: int = 64
    num_heads: int = 4
    pos_embed: bool = True
    norm_name: str = "instance"
    act_name: Any = ("leakyrelu", {"negative_slope": 0.01})
    dropout_rate: float = 0.0
    sa_type: str = "parallel"
    res_block: bool = True
    use_bias: bool = False
    num_layers: int = 3
    upsample_mode: Optional[str] = None
    dtype: Optional[Any] = None

    # sliding-window engines may feed patches already in s2d layout
    supports_s2d_input = True

    @nn.compact
    def __call__(self, x, *, train: bool = False, x_is_s2d: bool = False,
                 emit_s2d_logits: bool = False, x_padded=None):
        from fcd_tpu.ops.blocks import _s2d_block_eligible
        from fcd_tpu.ops.s2d_ops import from_s2d, max_pool_2x_s2d_exit

        fs = self.feature_size
        img = _triple(self.img_size)

        if x_is_s2d:
            cin = x.shape[-1] // 8
            # padded-chain patches arrive with the (+1, +1) zero depth pad
            # already in the gather (engine-side); callers that know pass
            # x_padded explicitly, otherwise inferred from the shape
            # against img_size (predictor API unchanged)
            x_pad_in = (bool(x_padded) if x_padded is not None
                        else x.shape[1] == img[0] // 2 + 2)
            d_eff = x.shape[1] - (2 if x_pad_in else 0)
            full = (2 * d_eff, 2 * x.shape[2], 2 * x.shape[3])
        else:
            cin = x.shape[-1]
            x_pad_in = False
            full = x.shape[1:4]

        def encoder(feats, inp, emit_s2d=False, s2d_parts=None,
                    emit_pad=False, emit_pool=False):
            return UnetrBasicBlock(
                out_channels=feats, kernel_size=3, stride=1,
                norm_name=self.norm_name, act_name=self.act_name,
                res_block=self.res_block, use_bias=self.use_bias,
                dtype=self.dtype,
            )(inp, train=train, emit_s2d=emit_s2d, s2d_parts=s2d_parts,
              emit_pad=emit_pad, emit_pool=emit_pool)

        # s2d residency for the two full/half-resolution levels (HBM-bound on
        # lane padding): encoders emit s2d, skips stay s2d all the way to the
        # decoders, pooling consumes s2d directly, only the head leaves s2d.
        half = tuple(s // 2 for s in full)
        use_s2d1 = (
            self.res_block
            and self.upsample_mode is None
            and _s2d_block_eligible(full, cin, fs, 3, 1,
                                    self.norm_name, self.act_name, self.dtype)
        )
        use_s2d2 = use_s2d1 and _s2d_block_eligible(
            half, fs, fs * 2, 3, 1, self.norm_name, self.act_name, self.dtype
        )

        if x_is_s2d and not use_s2d1:
            x = from_s2d(x[:, 1:-1] if x_pad_in else x, cin)
            x_is_s2d = False
            x_pad_in = False

        # padded-chain eval (FCD_PAD_CHAIN): s2d tensors between blocks
        # carry a (+1, +1) zero depth pad emitted inside their producers'
        # fused passes; the a2o/pool kernels consume it directly, so the
        # ~0.85 ms near-fixed standalone depth-pad ops disappear
        from fcd_tpu.ops.blocks import _pad_chain_ok

        pad_chain = _pad_chain_ok(train, self.norm_name, self.use_bias)
        from fcd_tpu.ops.s2d_ops import max_pool_2x_s2d_exit_pad

        x1s = x2s = None
        pad1 = pad_chain and use_s2d1
        pad2 = pad_chain and use_s2d2
        # fuse the encoder finale + padded emission + pool into one Pallas
        # pass (the pool's re-read of the finale tensor never happens)
        fuse_pool = pad_chain and _fcd_flags.get("FCD_FINALE_POOL") != "0"
        if use_s2d1:
            if x_is_s2d:
                if x_pad_in and not pad_chain:
                    x = x[:, 1:-1]
                    x_pad_in = False
                enc1_parts = [(x, cin, x_pad_in)]
            else:
                enc1_parts = None
            if fuse_pool:
                x1s, pool1 = encoder(fs, None if enc1_parts else x,
                                     emit_s2d=True, s2d_parts=enc1_parts,
                                     emit_pad=pad1, emit_pool=True)
            else:
                x1s = encoder(fs, None if enc1_parts else x, emit_s2d=True,
                              s2d_parts=enc1_parts, emit_pad=pad1)
                pool1 = (max_pool_2x_s2d_exit_pad(x1s, fs) if pad1
                         else max_pool_2x_s2d_exit(x1s, fs))
            x1 = None
        else:
            x1 = encoder(fs, x)
            pool1 = max_pool_2x(x1)

        if use_s2d2:
            if fuse_pool:
                x2s, pool2 = encoder(fs * 2, pool1, emit_s2d=True,
                                     emit_pad=pad2, emit_pool=True)
            else:
                x2s = encoder(fs * 2, pool1, emit_s2d=True, emit_pad=pad2)
                pool2 = (max_pool_2x_s2d_exit_pad(x2s, fs * 2) if pad2
                         else max_pool_2x_s2d_exit(x2s, fs * 2))
            x2 = None
        else:
            x2 = encoder(fs * 2, pool1)
            pool2 = max_pool_2x(x2)

        x3 = encoder(fs * 4, pool2)
        x4 = encoder(fs * 8, max_pool_2x(x3))
        x5 = encoder(fs * 16, max_pool_2x(x4))
        x6 = encoder(fs * 32, max_pool_2x(x5))

        def embed_and_attend(feat, emb_chans, groups, level_div, proj_size):
            # 1x1 conv patch embed halving channels + GroupNorm, then
            # num_layers TransformerBlocks (ms_dsa_net.py:215-295)
            t = Conv3d(emb_chans, kernel_size=1, use_bias=self.use_bias,
                       dtype=self.dtype)(feat)
            t = GroupNorm(num_groups=groups)(t)
            if self.dtype is not None:
                # keep the transformer stack in the compute dtype: GroupNorm
                # emits f32 (f32 params promote), and carrying f32 tokens
                # through 3 blocks costs ~0.9 GB/step of convert/copy
                # traffic at batch 4x128^3 (profile_train_step,
                # attention.py converts). LayerNorm/softmax still compute
                # f32 internally; residual adds in bf16 match the
                # reference's AMP behavior (train.py:373 autocast).
                t = t.astype(self.dtype)
            n = 1
            for dim in img:
                n *= dim // level_div
            for _ in range(self.num_layers):
                t = TransformerBlock(
                    input_size=n,
                    hidden_size=emb_chans,
                    proj_size=proj_size,
                    num_heads=self.num_heads,
                    dropout_rate=self.dropout_rate,
                    pos_embed=self.pos_embed,
                    sa_type=self.sa_type,
                    dtype=self.dtype,
                )(t, train=train)
            return t

        t3 = embed_and_attend(x3, fs * 2, fs * 1, 4, self.project_size)
        t4 = embed_and_attend(x4, fs * 4, fs * 2, 8, self.project_size)
        t5 = embed_and_attend(x5, fs * 8, fs * 4, 16, self.project_size)
        t6 = embed_and_attend(x6, fs * 16, fs * 8, 32, 32)

        def decoder(feats, inp, skip, skip_s2d=None, x_s2d=None,
                    emit_s2d=False, head=None, x_padded=False,
                    skip_padded=False, emit_pad=False):
            if self.upsample_mode is None:
                return UnetrUpBlock(
                    out_channels=feats, kernel_size=3, upsample_kernel_size=2,
                    norm_name=self.norm_name, act_name=self.act_name,
                    res_block=self.res_block, use_bias=self.use_bias,
                    dtype=self.dtype,
                )(inp, skip, train=train, skip_s2d=skip_s2d, x_s2d=x_s2d,
                  emit_s2d=emit_s2d, head=head, x_padded=x_padded,
                  skip_padded=skip_padded, emit_pad=emit_pad)
            return GeneralUnetrUpBlock(
                out_channels=feats, kernel_size=3,
                norm_name=self.norm_name, act_name=self.act_name,
                res_block=self.res_block, use_bias=self.use_bias,
                upsample_mode=self.upsample_mode, scale_factor=2,
                dtype=self.dtype,
            )(inp, skip, train=train)

        # s2d decoder chaining: when two consecutive decoders both run
        # s2d-resident, the producer emits s2d and the consumer's upsample
        # chains s2d-to-s2d — the lane-sparse from_s2d exit between them
        # never happens (profiled ~4 ms/volume at the level 2->1 seam).
        def dec_cap(spatial, oc, skip_is_s2d):
            if self.upsample_mode is not None or not self.res_block:
                return False
            if skip_is_s2d:
                return True
            return _s2d_block_eligible(
                spatial, 2 * oc, oc, 3, 1, self.norm_name, self.act_name,
                self.dtype, part_channels=[oc, oc])

        s16 = tuple(s // 16 for s in full)
        s8 = tuple(s // 8 for s in full)
        s4 = tuple(s // 4 for s in full)
        cap5 = dec_cap(s16, fs * 8, False)
        cap4 = dec_cap(s8, fs * 4, False)
        cap3 = dec_cap(s4, fs * 2, False)
        cap2 = dec_cap(half, fs * 2, use_s2d2)
        cap1 = dec_cap(full, fs * 1, use_s2d1)
        chain54, chain43 = cap5 and cap4, cap4 and cap3
        chain32, chain21 = cap3 and cap2, cap2 and cap1

        p54 = pad_chain and chain54
        p43 = pad_chain and chain43
        p32 = pad_chain and chain32
        p21 = pad_chain and chain21
        y5 = decoder(fs * 8, t6, t5, emit_s2d=chain54, emit_pad=p54)
        y4 = decoder(fs * 4, None if chain54 else y5, t4,
                     x_s2d=(y5, fs * 8) if chain54 else None,
                     x_padded=p54, emit_s2d=chain43, emit_pad=p43)
        y3 = decoder(fs * 2, None if chain43 else y4, t3,
                     x_s2d=(y4, fs * 4) if chain43 else None,
                     x_padded=p43, emit_s2d=chain32, emit_pad=p32)
        y2 = decoder(fs * 2, None if chain32 else y3, x2,
                     x_s2d=(y3, fs * 2) if chain32 else None,
                     x_padded=p32,
                     skip_s2d=(x2s, fs * 2) if use_s2d2 else None,
                     skip_padded=pad2,
                     emit_s2d=chain21, emit_pad=p21)

        head = Conv3d(self.out_channels, kernel_size=1, use_bias=True,
                      dtype=self.dtype)
        import os as _os

        # eval: fuse the head into the last decoder block's finale kernel
        # (gates mirror UnetResBlock._s2d_forward's fused-eval branch).
        # Default OFF: A/B-measured SLOWER on v5e (6.97 vs 7.36 vol/s) —
        # the Pallas pass's 16-lane output store + per-row DMA pipeline
        # lose more than the saved XLA finale/head passes and layout flips.
        fuse_head = (
            use_s2d1 and not train and not self.use_bias
            and _fcd_flags.get("FCD_FUSED_BLOCK") != "0"
            and _fcd_flags.get("FCD_FUSED_HEAD") != "0"
        )
        if fuse_head:
            from fcd_tpu.ops.s2d_ops import from_s2d

            wh, bh = head(return_kernel_for=fs)
            logits_s2d = decoder(fs * 1, None if chain21 else y2, x1,
                                 x_s2d=(y2, fs * 2) if chain21 else None,
                                 x_padded=p21,
                                 skip_s2d=(x1s, fs), skip_padded=pad1,
                                 emit_s2d=True, head=(wh, bh))
            if emit_s2d_logits:
                return logits_s2d
            return from_s2d(logits_s2d, self.out_channels)

        y1 = decoder(fs * 1, None if chain21 else y2, x1,
                     x_s2d=(y2, fs * 2) if chain21 else None,
                     x_padded=p21,
                     skip_s2d=(x1s, fs) if use_s2d1 else None,
                     skip_padded=pad1,
                     emit_s2d=use_s2d1)

        if use_s2d1:
            from fcd_tpu.ops.s2d_ops import from_s2d

            logits_s2d = head(s2d_parts=[(y1, fs)])
            if emit_s2d_logits:
                # sliding-window engines blend in s2d space: the lane-
                # sparse (C=out_channels) full-resolution exit transpose
                # happens once per volume, not once per patch
                return logits_s2d
            return from_s2d(logits_s2d, self.out_channels)
        logits = head(y1)
        if emit_s2d_logits:
            from fcd_tpu.ops.s2d_ops import to_s2d

            return to_s2d(logits)
        return logits


def MS_DSA_NET(**kwargs) -> _MSDSACore:
    """Transposed-conv decoder variant (ms_dsa_net.py:104-407)."""
    kwargs.setdefault("upsample_mode", None)
    return _MSDSACore(**kwargs)


def MS_DSA_NET_PS(**kwargs) -> _MSDSACore:
    """Pixelshuffle (or deconv / nontrainable) decoder variant
    (ms_dsa_net.py:409-726)."""
    kwargs.setdefault("upsample_mode", "pixelshuffle")
    return _MSDSACore(**kwargs)
