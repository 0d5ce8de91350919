"""Dual self-attention (DSA / EPA) blocks — the architectural heart.

Re-designed from the reference math (networks/ms_dsa_net/conv_blocks.py:211-359,
networks/unetr_pp/transformerblock.py:76-126): a fused qkvv projection feeding
(a) channel attention — q·kᵀ over the per-head channel axis with a learned
temperature — and (b) spatial attention made linear in sequence length by a
learned N→P projection `EF` of keys and values.

Notes vs the reference:
- Everything is expressed as einsums over (B, heads, ...) so XLA maps it
  straight onto the MXU; the fused qkvv matmul is one (N, C)x(C, 4C) GEMM.
- The reference's spatial-attention output uses a permute(0,3,1,2) before
  reshape (conv_blocks.py:353) that scrambles (head, channel) interleaving;
  we use the standard (B, N, heads*c) assembly (a fixed permutation of the
  same information — checkpoint-level parity is not a goal of this rebuild).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fcd_tpu.ops.blocks import MLPBlock, UnetResBlock
from fcd_tpu.ops.layers import Conv3d, Dense, LayerNorm, uniform_scale_init

from fcd_tpu import flags as _fcd_flags


def _l2_normalize(x, axis=-1, eps=1e-12):
    # smooth rsqrt form: finite gradient even at x == 0 (which occurs when a
    # level's grid collapses to 1^3 and instance norm zeroes the features)
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(sq + eps)


def _fused_dsa_enabled() -> bool:
    """Fused Pallas DSA kernel gate (same pattern as FCD_S2D/FCD_FAST_CONV)."""
    import os

    if _fcd_flags.get("FCD_FUSED_DSA") == "0":
        return False
    return jax.default_backend() == "tpu"


class DSA(nn.Module):
    """Dual self-attention on token sequences (B, N, C).

    sa_type: 'parallel' (channel + spatial summed), 'serial'
    (spatial into channel), 'spatial', or 'channel'.
    """

    input_size: int                 # N = D*H*W of the level's grid
    hidden_size: int                # C
    proj_size: int                  # P, the learned sequence projection size
    num_heads: int = 4
    qkv_bias: bool = False
    channel_attn_drop: float = 0.1
    spatial_attn_drop: float = 0.1
    sa_type: str = "parallel"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, ln=None, pos_embed=None,
                 res_gamma=None):
        """x: (B, N, C) tokens. With `ln=(scale, bias, eps)` x is RAW and
        this module applies (pos_embed +) LayerNorm itself — fused into the
        Pallas kernel prologue on the TPU path; `res_gamma` additionally
        folds the transformer residual (tokens + gamma * attn) into the
        kernel epilogue. The einsum fallback applies the same ops inline."""
        from fcd_tpu.ops.layers import xavier_uniform

        B, N, C = x.shape
        h = self.num_heads
        c = C // h
        num = 4 if self.sa_type == "parallel" else 3
        dtype = self.dtype or x.dtype

        w_qkvv = self.param("qkvv", xavier_uniform, (C, C * num))
        b_qkvv = (self.param("qkvv_bias", nn.initializers.zeros, (C * num,))
                  if self.qkv_bias else None)

        temperature = self.param("temperature", nn.initializers.ones, (h, 1, 1))
        temperature2 = self.param("temperature2", nn.initializers.ones, (h, 1, 1))

        ef = None
        if self.sa_type != "channel":
            ef = self.param(
                "EF",
                uniform_scale_init(1.0 / (self.proj_size ** 0.5)),
                (self.input_size, self.proj_size),
            )

        # fused Pallas path: inference forward on TPU (training keeps the
        # einsum path — differentiable, and attention dropout needs RNG)
        from fcd_tpu.kernels.dsa_attention import dsa_fused, dsa_fused_supported

        if ((not train) and b_qkvv is None and _fused_dsa_enabled()
                and dsa_fused_supported(
                    N, C, self.proj_size if ef is not None else 8, h)):
            wk = w_qkvv.reshape(C, num, C).transpose(1, 0, 2)
            ef_k = ef if ef is not None else jnp.zeros((N, 8), jnp.float32)
            kw = {}
            if ln is not None:
                kw = dict(ln_scale=ln[0], ln_bias=ln[1], ln_eps=ln[2],
                          pos_embed=pos_embed, res_gamma=res_gamma)
            return dsa_fused(
                x.astype(dtype), wk.astype(dtype), ef_k.astype(dtype),
                temperature.reshape(h), temperature2.reshape(h),
                num_heads=h, sa_type=self.sa_type,
                interpret=jax.default_backend() != "tpu", **kw,
            )

        base = None
        if ln is not None:
            # inline (pos_embed +) LayerNorm (+ residual below): the einsum
            # fallback honors the same contract as the fused kernel
            base = x if pos_embed is None else x + pos_embed.astype(x.dtype)
            lns, lnb, leps = ln
            xf = base.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
                - jnp.square(mu), 0.0)
            x = (xf - mu) * jax.lax.rsqrt(var + leps) * lns + lnb

        def finish(out):
            if ln is None or res_gamma is None:
                return out
            return base + res_gamma.astype(base.dtype) * out.astype(base.dtype)

        import os as _os

        qkvv = jnp.einsum("bnc,ck->bnk", x.astype(dtype), w_qkvv.astype(dtype))
        if b_qkvv is not None:
            qkvv = qkvv + b_qkvv.astype(qkvv.dtype)

        if _fcd_flags.get("FCD_DSA_V2") != "0":
            # fused spatial-attention tail (kernels/spatial_attn.py): the
            # kernel path draws its dropout bits from the hardware PRNG,
            # seeded once per call from the module's dropout stream
            from fcd_tpu.kernels.spatial_attn import _use_kernel

            spattn_seed = None
            if self.sa_type != "channel" and _use_kernel(
                    N, C, h * self.proj_size):
                if train and self.spatial_attn_drop > 0:
                    spattn_seed = jax.random.randint(
                        self.make_rng("dropout"), (1,), 0, 2 ** 31 - 1,
                        dtype=jnp.int32)
                else:
                    spattn_seed = jnp.zeros((1,), jnp.int32)
            return finish(_dsa_tokens_resident(
                qkvv, ef, temperature, temperature2, h, c,
                self.sa_type, drop_ca=nn.Dropout(
                    self.channel_attn_drop, deterministic=not train),
                drop_sa=nn.Dropout(
                    self.spatial_attn_drop, deterministic=not train),
                spattn_seed=spattn_seed))

        qkvv = qkvv.reshape(B, N, num, h, c)
        # (B, h, c, N) per slot
        def slot(i):
            return jnp.transpose(qkvv[:, :, i], (0, 2, 3, 1))

        q = slot(0)
        k = slot(1)

        if ef is not None:
            ef = ef.astype(q.dtype)

        qn = _l2_normalize(q, axis=-1)
        kn = _l2_normalize(k, axis=-1)

        drop_ca = nn.Dropout(self.channel_attn_drop, deterministic=not train)
        drop_sa = nn.Dropout(self.spatial_attn_drop, deterministic=not train)

        def channel_attention(v_ca):
            # (B,h,c,N)x(B,h,d,N) -> (B,h,c,d): channel-channel affinity
            attn = jnp.einsum("bhcn,bhdn->bhcd", qn, kn) * temperature.astype(qn.dtype)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = drop_ca(attn)
            out = jnp.einsum("bhcd,bhdn->bhcn", attn, v_ca)
            return jnp.transpose(out, (0, 3, 1, 2)).reshape(B, N, C)

        def spatial_attention(v_sa):
            kp = jnp.einsum("bhcn,np->bhcp", k, ef)
            vp = jnp.einsum("bhcn,np->bhcp", v_sa, ef)
            attn = jnp.einsum("bhcn,bhcp->bhnp", qn, kp) * temperature2.astype(qn.dtype)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = drop_sa(attn)
            out = jnp.einsum("bhnp,bhcp->bhnc", attn, vp)
            return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, C)

        if self.sa_type == "channel":
            return finish(channel_attention(slot(2)))
        if self.sa_type == "spatial":
            return finish(spatial_attention(slot(2)))
        if self.sa_type == "serial":
            # spatial first, its output re-read as values of channel attention
            v_sa = slot(2)
            kp = jnp.einsum("bhcn,np->bhcp", k, ef)
            vp = jnp.einsum("bhcn,np->bhcp", v_sa, ef)
            attn_sa = jnp.einsum("bhcn,bhcp->bhnp", qn, kp) * temperature2.astype(qn.dtype)
            attn_sa = jax.nn.softmax(attn_sa, axis=-1)
            attn_sa = drop_sa(attn_sa)
            x_sa = jnp.einsum("bhnp,bhcp->bhnc", attn_sa, vp)  # (B,h,N,c)
            attn_ca = jnp.einsum("bhcn,bhdn->bhcd", qn, kn) * temperature.astype(qn.dtype)
            attn_ca = jax.nn.softmax(attn_ca, axis=-1)
            attn_ca = drop_ca(attn_ca)
            out = jnp.einsum("bhcd,bhnd->bhcn", attn_ca, x_sa)
            return finish(jnp.transpose(out, (0, 3, 1, 2)).reshape(B, N, C))

        # parallel
        x_ca = channel_attention(slot(2))
        x_sa = spatial_attention(slot(3))
        return finish(x_ca + x_sa)


def _dsa_tokens_resident(qkvv, ef, temperature, temperature2, h, c,
                         sa_type, *, drop_ca, drop_sa, spattn_seed=None):
    """DSA attention math in TOKENS-RESIDENT layout: every large tensor
    stays (B, N, lanes) with N in sublanes and lane-dense channels — the
    per-head (B, h, c, N) forms of the v1 einsum path put N in the lane
    dimension and cost ~10 ms/step of transpose/convert fusions at the
    level-3 grid (batch 4x128^3, profile_train_step fusion.226/324
    families). Identical math (reassociation only): per-head structure
    rides in block-diagonal / block-expanded matrices that are tiny
    (C x C, C x h*P), and the only big ops are token-major GEMMs.

    qkvv: (B, N, num*C) fused projection output; slots are contiguous
    column groups. Returns (B, N, C) with the same h-major/c-minor lane
    assembly as the v1 path."""
    B, N, K = qkvv.shape
    C = h * c
    num = K // C

    def slot(i):
        return jax.lax.slice_in_dim(qkvv, i * C, (i + 1) * C, axis=2)

    q, k = slot(0), slot(1)
    if ef is not None:
        ef = ef.astype(q.dtype)

    def norm_tokens(t):
        # XCA-style: l2-normalize each (b, channel) activation over N
        sq = jnp.sum(jnp.square(t), axis=1, keepdims=True)     # (B, 1, C)
        return t * jax.lax.rsqrt(sq + 1e-12)

    qn, kn = norm_tokens(q), norm_tokens(k)
    eye_h = jnp.eye(h, dtype=qkvv.dtype)

    def channel_attention(v_ca):
        # full Gram (B, C, C) holds every per-head block; off-diagonal
        # blocks are discarded below (tiny tensors from here on)
        g = jnp.einsum("bnc,bnd->bcd", qn, kn)
        gh = g.reshape(B, h, c, h, c)
        blocks = gh[:, jnp.arange(h), :, jnp.arange(h), :]     # (h, B, c, c)
        attn = jnp.transpose(blocks, (1, 0, 2, 3))             # (B, h, c, c)
        attn = attn * temperature.astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = drop_ca(attn)
        # block-diagonal embed: A[b, hc+ci, hd+d] = attn[b, h, ci, d]
        a_blk = jnp.einsum("bhcd,hg->bhcgd", attn, eye_h)
        a_blk = a_blk.reshape(B, C, C)
        return jnp.einsum("bnd,bcd->bnc", v_ca, a_blk)

    def spatial_attention(v_sa):
        kp = jnp.einsum("bnc,np->bcp", k, ef)                  # (B, C, P)
        vp = jnp.einsum("bnc,np->bcp", v_sa, ef)
        p = kp.shape[-1]
        # block-expand with the per-head temperature folded in:
        # KB[b, hc+ci, g*P+p] = kp[b, hc+ci, p] * temp2[h] * (g == h)
        t2 = temperature2.reshape(h).astype(kp.dtype)
        kpb = jnp.einsum("bhcp,hg->bhcgp", kp.reshape(B, h, c, p),
                         eye_h * t2[:, None])
        kpb = kpb.reshape(B, C, h * p)
        # VB[b, g*P+p, hc+ci] = vp[b, hc+ci, p] * (g == h)
        vpb = jnp.einsum("bhcp,hg->bgphc", vp.reshape(B, h, c, p), eye_h)
        vpb = vpb.reshape(B, h * p, C)
        if spattn_seed is not None:
            # VMEM-resident softmax+dropout+GEMM tail (custom VJP): the
            # (B, N, h*P) attention matrix never round-trips HBM — the
            # XLA form's 0.81 ms N-minor fusion at the level-3 train
            # shape (kernels/spatial_attn.py) never runs
            from fcd_tpu.kernels.spatial_attn import spatial_attn_train

            rate = 0.0 if drop_sa.deterministic else float(drop_sa.rate)
            return spatial_attn_train(qn, kpb, vpb, spattn_seed, h, rate)
        attn = jnp.einsum("bnc,bcq->bnq", qn, kpb)             # (B, N, h*P)
        attn = jax.nn.softmax(attn.reshape(B, N, h, p), axis=-1)
        attn = drop_sa(attn).reshape(B, N, h * p)
        return jnp.einsum("bnq,bqc->bnc", attn, vpb)

    if sa_type == "channel":
        return channel_attention(slot(2))
    if sa_type == "spatial":
        return spatial_attention(slot(2))
    if sa_type == "serial":
        return channel_attention(spatial_attention(slot(2)))
    return channel_attention(slot(2)) + spatial_attention(slot(3))


class ChannelDropout3d(nn.Module):
    """torch Dropout3d parity: zero whole channels per sample.

    With `s2d_channels=c`, x is a space-to-depth tensor (…, 8c) and the
    per-channel mask is tiled over the 8 parity groups (same channels of
    the same volume are dropped together, exactly like the dense layout).
    """

    rate: float

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 s2d_channels: Optional[int] = None):
        if not train or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        b = x.shape[0]
        c = s2d_channels if s2d_channels is not None else x.shape[-1]
        mask = jax.random.bernoulli(rng, keep, (b, 1, 1, 1, c))
        if s2d_channels is not None:
            mask = jnp.tile(mask, (1, 1, 1, 1, 8))
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _conv_residual_branch(y, C, norm_name, dtype, *, train):
    """Shared transformer conv residual: y + conv1x1(drop3d(UnetResBlock(y))).

    When the res block is s2d-eligible (TPU, bf16, k3s1, instance/batch
    norm), the whole branch — res block, channel dropout, 1x1 conv and the
    residual add — stays in the lane-dense s2d layout with exactly one
    entry and one exit transpose.
    """
    from fcd_tpu.ops.blocks import _s2d_block_eligible

    act = ("leakyrelu", {"negative_slope": 0.01})
    if _s2d_block_eligible(y.shape[1:4], C, C, 3, 1, norm_name, act, dtype):
        from fcd_tpu.ops.s2d_ops import from_s2d, to_s2d

        ys = to_s2d(y.astype(jnp.bfloat16))
        conv = UnetResBlock(out_channels=C, kernel_size=3, stride=1,
                            norm_name=norm_name, dtype=dtype)(
            train=train, s2d_parts=[(ys, C)], emit_s2d=True)
        conv = ChannelDropout3d(0.1)(conv, train=train, s2d_channels=C)
        conv = Conv3d(C, kernel_size=1, use_bias=True, dtype=dtype)(
            s2d_parts=[(conv, C)])
        return from_s2d(ys + conv.astype(ys.dtype), C).astype(y.dtype)

    conv = UnetResBlock(out_channels=C, kernel_size=3, stride=1,
                        norm_name=norm_name, dtype=dtype)(y, train=train)
    conv = ChannelDropout3d(0.1)(conv, train=train)
    conv = Conv3d(C, kernel_size=1, use_bias=True, dtype=dtype)(conv)
    return y + conv


class TransformerBlock(nn.Module):
    """DSA transformer block on 5D features (conv_blocks.py:18-90):

    tokens = flatten(x) (+pos-embed); x += gamma * DSA(LN(tokens));
    then a conv residual: x + conv1x1(drop3d(UnetResBlock_batchnorm(x))).
    """

    input_size: int
    hidden_size: int
    proj_size: int
    num_heads: int = 4
    dropout_rate: float = 0.0
    pos_embed: bool = True
    sa_type: str = "parallel"
    conv_norm_name: str = "batch"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B, D, H, W, C = x.shape
        N = D * H * W
        tokens = x.reshape(B, N, C)
        pe = None
        if self.pos_embed:
            pe = self.param("pos_embed", nn.initializers.zeros,
                            (1, self.input_size, C))

        gamma = self.param("gamma", nn.initializers.constant(1e-6), (C,))
        ln_scale, ln_bias = LayerNorm()(return_affine_for=C)
        tokens = DSA(
            input_size=self.input_size,
            hidden_size=self.hidden_size,
            proj_size=self.proj_size,
            num_heads=self.num_heads,
            channel_attn_drop=self.dropout_rate,
            spatial_attn_drop=self.dropout_rate,
            sa_type=self.sa_type,
            dtype=self.dtype,
        )(tokens, train=train, ln=(ln_scale, ln_bias, 1e-5),
          pos_embed=None if pe is None else pe[0],
          res_gamma=gamma)

        y = tokens.astype(x.dtype).reshape(B, D, H, W, C)
        return _conv_residual_branch(y, C, self.conv_norm_name, self.dtype,
                                     train=train)


class EPABlock(nn.Module):
    """UNETR++ flavour of the transformer block
    (networks/unetr_pp/transformerblock.py:7-73): identical dual attention,
    but the conv residual branches from the attention output
    (x = attn_skip + conv8(conv51(attn_skip)))."""

    input_size: int
    hidden_size: int
    proj_size: int
    num_heads: int = 4
    dropout_rate: float = 0.0
    pos_embed: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B, D, H, W, C = x.shape
        N = D * H * W
        tokens = x.reshape(B, N, C)
        pe = None
        if self.pos_embed:
            pe = self.param("pos_embed", nn.initializers.zeros,
                            (1, self.input_size, C))
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (C,))
        ln_scale, ln_bias = LayerNorm()(return_affine_for=C)
        tokens = DSA(
            input_size=self.input_size,
            hidden_size=self.hidden_size,
            proj_size=self.proj_size,
            num_heads=self.num_heads,
            channel_attn_drop=self.dropout_rate,
            spatial_attn_drop=self.dropout_rate,
            sa_type="parallel",
            dtype=self.dtype,
        )(tokens, train=train, ln=(ln_scale, ln_bias, 1e-5),
          pos_embed=None if pe is None else pe[0],
          res_gamma=gamma)

        attn_skip = tokens.astype(x.dtype).reshape(B, D, H, W, C)
        return _conv_residual_branch(attn_skip, C, "batch", self.dtype,
                                     train=train)


class TransformerBlockDSA(nn.Module):
    """ViT-style variant (conv_blocks.py:92-143): pre-norm DSA + pre-norm MLP."""

    input_size: int
    hidden_size: int
    proj_size: int
    num_heads: int = 4
    dropout_rate: float = 0.0
    pos_embed: bool = True
    sa_type: str = "parallel"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B, D, H, W, C = x.shape
        N = D * H * W
        tokens = x.reshape(B, N, C)
        if self.pos_embed:
            pe = self.param("pos_embed", nn.initializers.zeros, (1, self.input_size, C))
            tokens = tokens + pe.astype(tokens.dtype)
        attn = DSA(
            input_size=self.input_size,
            hidden_size=self.hidden_size,
            proj_size=self.proj_size,
            num_heads=self.num_heads,
            channel_attn_drop=self.dropout_rate,
            spatial_attn_drop=self.dropout_rate,
            sa_type=self.sa_type,
            dtype=self.dtype,
        )(LayerNorm()(tokens), train=train)
        tokens = tokens + attn
        tokens = tokens + MLPBlock(mlp_dim=C * 4, dropout_rate=self.dropout_rate,
                                   dtype=self.dtype)(LayerNorm()(tokens), train=train)
        return tokens.reshape(B, D, H, W, C)


class CrossAttentionBlock(nn.Module):
    """Cross attention between encoder (x) and decoder (y) features
    (conv_blocks.py:151-208)."""

    input_size: int
    hidden_size: int
    proj_size: int
    num_heads: int = 4
    qkv_bias: bool = False
    drop_rate: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, y, *, train: bool = False):
        B, D, H, W, C = x.shape
        N = D * H * W
        h = self.num_heads
        c = C // h
        xs = x.reshape(B, N, C)
        ys = y.reshape(B, N, C)

        q = Dense(C, use_bias=self.qkv_bias, dtype=self.dtype)(xs)
        kv = Dense(C * 2, use_bias=self.qkv_bias, dtype=self.dtype)(xs)
        q = jnp.transpose(q.reshape(B, N, h, c), (0, 2, 3, 1))          # (B,h,c,N)
        kv = kv.reshape(B, N, 2, h, c)
        k = jnp.transpose(kv[:, :, 0], (0, 2, 3, 1))
        v = jnp.transpose(kv[:, :, 1], (0, 2, 3, 1))

        ef = self.param(
            "EF", uniform_scale_init(1.0 / (self.proj_size ** 0.5)),
            (self.input_size, self.proj_size),
        ).astype(q.dtype)
        kp = jnp.einsum("bhcn,np->bhcp", k, ef)
        vp = jnp.einsum("bhcn,np->bhcp", v, ef)

        temperature = self.param("temperature", nn.initializers.ones, (h, 1, 1))
        qn = _l2_normalize(q, axis=-1)
        attn = jnp.einsum("bhcn,bhcp->bhnp", qn, kp) * temperature.astype(qn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.drop_rate, deterministic=not train)(attn)
        o = jnp.einsum("bhnp,bhcp->bhnc", attn, vp)
        o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, N, C)

        ys = ys + MLPBlock(mlp_dim=C * 4, dropout_rate=self.drop_rate,
                           dtype=self.dtype)(LayerNorm()(o), train=train)
        return ys.reshape(B, D, H, W, C)
