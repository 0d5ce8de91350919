"""U-Net building blocks (NDHWC flax modules).

Functional re-design of the reference's DynUNet-style block family
(reference: networks/ms_dsa_net/conv_blocks.py:362-967): residual and
basic conv blocks, transposed-conv / general upsample decoder blocks,
and attention-gate blocks.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from fcd_tpu import flags as _fcd_flags
from fcd_tpu.ops.layers import (
    Conv3d,
    ConvTranspose3d,
    Dense,
    InstanceNorm,
    UpSample,
    make_act,
    make_norm,
)


def _s2d_block_eligible(dims, cin, cout, kernel_size, stride, norm_name,
                        act_name, dtype, part_channels=None,
                        taps: int = 27) -> bool:
    """Can this residual block run s2d-resident on the current backend?

    `part_channels`: when the block input is a (never-materialized) concat
    of s2d parts, each part is convolved separately — eligibility is then
    per-part input width, not the total.
    `taps=8`: the eval-only half-offset kernel pair tier (wider channel
    range, forward-only — callers must gate on eval).
    """
    import os

    import jax as _jax

    if _fcd_flags.get("FCD_S2D") == "0":
        return False
    if taps == 8 and (_fcd_flags.get("FCD_CONV8") == "0"
                      or _fcd_flags.get("FCD_FUSED_BLOCK") == "0"):
        return False
    if _jax.default_backend() != "tpu" or dtype != jnp.bfloat16:
        return False
    if kernel_size != 3 or stride != 1 or norm_name not in ("instance", "batch"):
        return False
    name = act_name[0] if isinstance(act_name, (tuple, list)) else str(act_name)
    if name.lower() not in ("leakyrelu", "relu"):
        return False
    from fcd_tpu.ops.s2d_ops import s2d_supported

    parts = list(part_channels) if part_channels is not None else [cin]
    return (all(s2d_supported(dims, c, cout, taps) for c in parts)
            and s2d_supported(dims, cout, cout, taps))


def _pair_train_ok(norm_name: str) -> bool:
    """Whether the differentiable half-offset conv pair can serve a
    TRAIN-mode block on the taps-8 tier (instance norm only — the offset
    grid's pad-slot masking would corrupt batch-norm running stats)."""
    import os

    return (norm_name == "instance"
            and _fcd_flags.get("FCD_CONV8_TRAIN") != "0")


def _pad_chain_ok(train: bool, norm_name: str, use_bias: bool) -> bool:
    """Whether the padded-depth chain applies: at eval through the fused
    block, at train through the differentiable conv pair (both consume
    pre-padded parts natively; any other executor slices the interior,
    costing the pass the chain saves)."""
    if use_bias or _fcd_flags.get("FCD_PAD_CHAIN") == "0":
        return False
    if train:
        return _pair_train_ok(norm_name)
    return _fcd_flags.get("FCD_FUSED_BLOCK") != "0"


def _taps8_executor_ok(train: bool, norm_name: str) -> bool:
    """A taps-8-only block shape needs an executor that can actually run
    it: the fused eval path, or the differentiable pair — the composed
    padded-27 fallback would exceed scoped VMEM at these widths."""
    import os

    fused_eval = (not train
                  and _fcd_flags.get("FCD_FUSED_BLOCK") != "0")
    return fused_eval or _pair_train_ok(norm_name)


class UnetResBlock(nn.Module):
    """conv-norm-act -> conv-norm (+ projected residual) -> act.

    Parity target: conv_blocks.py:362-452 (UnetResBlock). On TPU with bf16
    and instance norm, the whole block runs s2d-resident (lane-dense HBM +
    blocked-GEMM Pallas convs); `s2d_parts` lets callers pass already-s2d
    inputs whose concatenation forms the block input (decoder cat fusion).
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    norm_name: str = "instance"
    act_name: Any = ("leakyrelu", {"negative_slope": 0.01})
    use_bias: bool = False
    dtype: Optional[Any] = None

    def _neg_slope(self) -> float:
        name = (self.act_name[0] if isinstance(self.act_name, (tuple, list))
                else str(self.act_name)).lower()
        if name == "relu":
            return 0.0
        if isinstance(self.act_name, (tuple, list)) and len(self.act_name) > 1:
            return self.act_name[1].get("negative_slope", 0.01)
        return 0.01

    def _s2d_forward(self, parts, train: bool, emit_s2d: bool = False,
                     head=None, emit_pad: bool = False,
                     emit_pool: bool = False):
        import os

        from fcd_tpu.ops.s2d_ops import (
            conv1x1_s2d,
            from_s2d,
            instance_norm_s2d,
            leaky_relu_s2d,
        )

        slope = self._neg_slope()
        oc = self.out_channels
        # padded-chain parts: (xs, c) or (xs, c, pre_padded)
        parts = [p if len(p) == 3 else (p[0], p[1], False) for p in parts]
        cin_total = sum(c for _, c, _ in parts)

        # eval: fully kernel-fused block (3 fused conv passes + 1 elementwise
        # instead of ~10 memory passes). Forward-only — training keeps the
        # differentiable composition below.
        if (not train and not self.use_bias
                and _fcd_flags.get("FCD_FUSED_BLOCK") != "0"):
            from fcd_tpu.ops.layers import BatchNorm
            from fcd_tpu.ops.s2d_ops import fused_resblock_eval

            need_res = cin_total != oc or len(parts) > 1
            is_batch = self.norm_name == "batch"
            # module creation order mirrors the composed path exactly, so
            # the param/batch_stats trees are identical across paths
            w1, _ = Conv3d(oc, self.kernel_size, 1, use_bias=False,
                           dtype=self.dtype)(return_kernel_for=cin_total)
            a1 = (BatchNorm(use_running_average=True)(return_affine_for=oc)
                  if is_batch else None)
            w2, _ = Conv3d(oc, self.kernel_size, 1, use_bias=False,
                           dtype=self.dtype)(return_kernel_for=oc)
            a2 = (BatchNorm(use_running_average=True)(return_affine_for=oc)
                  if is_batch else None)
            wres = ar = None
            if need_res:
                wres_k, _ = Conv3d(oc, 1, 1, use_bias=False,
                                   dtype=self.dtype)(return_kernel_for=cin_total)
                wres = wres_k[0, 0, 0]
                ar = (BatchNorm(use_running_average=True)(return_affine_for=oc)
                      if is_batch else None)
            out = fused_resblock_eval(
                parts, w1, w2, wres, oc, slope,
                norm_name=self.norm_name,
                bn_affines=(a1, a2, ar) if is_batch else None,
                out_dtype=jnp.bfloat16 if self.dtype == jnp.bfloat16
                else jnp.float32,
                head=head,
                emit_pad=emit_pad and emit_s2d and head is None,
                emit_pool=emit_pool and emit_s2d and head is None,
            )
            if head is not None:
                return out  # s2d logits — caller owns the exit layout
            if emit_s2d:
                return out  # (out, pooled) tuple when emit_pool
            return from_s2d(out, oc)

        # the composed path and the residual 1x1 consume the interior
        # view of padded parts (slices fuse into their consumers); the
        # pair branch's conv kernels consume padded parts natively
        parts3 = parts
        parts = [(xs[:, 1:-1] if pre else xs, c) for xs, c, pre in parts]

        if self.norm_name == "batch":
            from fcd_tpu.ops.layers import BatchNorm

            def norm_s2d(t):
                return BatchNorm(use_running_average=not train)(
                    t, s2d_channels=oc)
        else:
            def norm_s2d(t):
                return instance_norm_s2d(t, oc)

        # differentiable HALF-OFFSET pair (training fast path): conv1 runs
        # aligned->offset, conv2 offset->aligned — 64/27 = 2.37x FLOP
        # redundancy per conv instead of the padded-27 form's 8x, with
        # custom VJPs (adjoint convs on the same lattice pair + 8-tap
        # blocked weight-grad kernels). Instance norm only: the offset
        # tensor's pad slots stay exact zeros through norm1+act via
        # re-masking (batch norm's running stats would see the pads).
        from fcd_tpu.ops.s2d_ops import s2d_supported

        d2s, h2s, w2s = parts[0][0].shape[1:4]
        dense_dims = (2 * d2s, 2 * h2s, 2 * w2s)
        use_pair = (
            not self.use_bias
            and self.norm_name == "instance"
            and _fcd_flags.get("FCD_CONV8_TRAIN") != "0"
            and all(s2d_supported(dense_dims, c, oc, taps=8)
                    for _, c in parts)
            and s2d_supported(dense_dims, oc, oc, taps=8)
        )
        if use_pair:
            from fcd_tpu.ops.s2d_ops import (
                conv8_a2o,
                conv8_o2a,
                instance_norm_act_offset,
            )

            from fcd_tpu.ops.s2d_ops import _lane_narrow_ok

            w1k, _ = Conv3d(oc, self.kernel_size, 1, use_bias=False,
                            dtype=self.dtype)(return_kernel_for=cin_total)
            xs_list, w_list, pre_list = [], [], []
            off = 0
            for xs, c, pre in parts3:
                w1p = w1k[..., off:off + c, :]
                if c < 16 and not _lane_narrow_ok():
                    # the XLA-padded-halo form rejects sub-128-lane
                    # operands; zero-pad the parity groups and the
                    # matching weight rows (the vmem-halo default accepts
                    # c8=16 directly — the ~1 ms/step HBM lane pad of the
                    # entry part disappears, profile_train_step pad.0)
                    b_, d_, h_, w_ = xs.shape[:4]
                    xs = jnp.pad(
                        xs.reshape(b_, d_, h_, w_, 8, c),
                        ((0, 0),) * 4 + ((0, 0), (0, 16 - c)),
                    ).reshape(b_, d_, h_, w_, 8 * 16)
                    w1p = jnp.pad(w1p, ((0, 0),) * 3 + ((0, 16 - c), (0, 0)))
                xs_list.append(xs.astype(jnp.bfloat16))
                w_list.append(w1p)
                pre_list.append(pre)
                off += c
            w2k, _ = Conv3d(oc, self.kernel_size, 1, use_bias=False,
                            dtype=self.dtype)(return_kernel_for=oc)
            pre_flags = tuple(pre_list)
            if _fcd_flags.get("FCD_CONV8_STATS") != "0":
                # kernels accumulate the instance-norm sums alongside the
                # conv output: the norms' two full-tensor reduction passes
                # never run in XLA (~3 ms/step at batch 4x128^3)
                from fcd_tpu.ops.s2d_ops import (
                    conv8_a2o_stats,
                    conv8_o2a_stats,
                )

                y1o, a_s1, a_s2 = conv8_a2o_stats(tuple(xs_list),
                                                  tuple(w_list),
                                                  jnp.bfloat16, pre_flags)
                if _fcd_flags.get("FCD_CONV8_PROLOGUE") != "0":
                    # norm1 + act fused into conv2's VMEM prologue (the
                    # eval formulation, differentiable): the offset
                    # tensor's standalone norm/act/mask pass never runs
                    from fcd_tpu.ops.s2d_ops import conv8_o2a_act_stats

                    ys, o_s1, o_s2 = conv8_o2a_act_stats(
                        y1o, a_s1, a_s2, w2k, w2s, slope)
                else:
                    y1o = instance_norm_act_offset(
                        y1o, oc, d2s * h2s * w2s * 8, slope, h2s, w2s,
                        stats=(a_s1, a_s2))
                    ys, o_s1, o_s2 = conv8_o2a_stats(y1o, w2k, w2s)

                # fused finale (FCD_FINALE_TRAIN): norm2 affine + residual
                # + act + padded emission + pool in ONE differentiable
                # Pallas pass each way (s2d_ops.finale_s2d_train) — the
                # composed finale's ~5 XLA full-tensor fusions per
                # direction never run. Affines chain to the conv stats /
                # residual sums through tiny XLA ops.
                from fcd_tpu.ops.s2d_ops import (
                    _finale_train_use_pallas,
                    _inorm_affine_from_sums,
                    finale_s2d_train,
                )

                need_res = cin_total != oc or len(parts) > 1
                if (head is None
                        and (need_res or not parts3[0][2])
                        and _finale_train_use_pallas(h2s, w2s, oc)):
                    n_vox = d2s * h2s * w2s * 8
                    scale2, shift2 = _inorm_affine_from_sums(
                        o_s1.astype(jnp.float32), o_s2.astype(jnp.float32),
                        oc, n_vox)
                    if need_res:
                        rs_raw = Conv3d(oc, 1, 1, use_bias=self.use_bias,
                                        dtype=self.dtype)(s2d_parts=parts)
                        rf = rs_raw.astype(jnp.float32)
                        scale_r, shift_r = _inorm_affine_from_sums(
                            jnp.sum(rf, axis=(1, 2, 3)),
                            jnp.sum(jnp.square(rf), axis=(1, 2, 3)),
                            oc, n_vox)
                    else:
                        rs_raw = parts[0][0]
                        scale_r = jnp.ones_like(scale2)
                        shift_r = jnp.zeros_like(shift2)
                    pad_out = emit_pad and emit_s2d
                    pool_out = emit_pool and emit_s2d
                    fin = finale_s2d_train(
                        ys, rs_raw, scale2, shift2,
                        scale_r, shift_r, oc, slope, pad_out, pool_out)
                    if emit_s2d:
                        return (fin[0], fin[1]) if pool_out else fin[0]
                    return from_s2d(fin[0], oc)

                ys = instance_norm_s2d(ys, oc, stats=(o_s1, o_s2))
            else:
                y1o = conv8_a2o(tuple(xs_list), tuple(w_list),
                                jnp.bfloat16, pre_flags)
                y1o = instance_norm_act_offset(
                    y1o, oc, d2s * h2s * w2s * 8, slope, h2s, w2s)
                ys = conv8_o2a(y1o, w2k, w2s)
                ys = norm_s2d(ys)
        else:
            ys = Conv3d(oc, self.kernel_size, 1, use_bias=self.use_bias,
                        dtype=self.dtype)(s2d_parts=parts)
            ys = norm_s2d(ys)
            ys = leaky_relu_s2d(ys, slope)
            ys = Conv3d(oc, self.kernel_size, 1, use_bias=self.use_bias,
                        dtype=self.dtype)(s2d_parts=[(ys, oc)])
            ys = norm_s2d(ys)

        if cin_total != oc or len(parts) > 1:
            rs = Conv3d(oc, 1, 1, use_bias=self.use_bias,
                        dtype=self.dtype)(s2d_parts=parts)
            rs = norm_s2d(rs)
        else:
            rs = parts[0][0]

        out = leaky_relu_s2d(ys + rs, slope)
        if head is not None:
            whk, bhb = head
            if whk.ndim == 5:
                whk = whk[0, 0, 0]
            out = conv1x1_s2d(out, whk)
            if bhb is not None:
                out = out + jnp.tile(bhb, 8).astype(out.dtype)
            return out
        if emit_s2d:
            if emit_pad:
                out = jnp.pad(out, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            if emit_pool:
                from fcd_tpu.ops.s2d_ops import (
                    max_pool_2x_s2d_exit,
                    max_pool_2x_s2d_exit_pad,
                )

                pooled = (max_pool_2x_s2d_exit_pad(out, oc) if emit_pad
                          else max_pool_2x_s2d_exit(out, oc))
                return out, pooled
            return out
        return from_s2d(out, oc)

    @nn.compact
    def __call__(self, x=None, *, train: bool = False, s2d_parts=None,
                 emit_s2d: bool = False, head=None, emit_pad: bool = False,
                 emit_pool: bool = False):
        from fcd_tpu.ops.s2d_ops import to_s2d

        if s2d_parts is not None:
            return self._s2d_forward(s2d_parts, train, emit_s2d, head=head,
                                     emit_pad=emit_pad, emit_pool=emit_pool)

        in_channels = x.shape[-1]
        elig = _s2d_block_eligible(
            x.shape[1:4], in_channels, self.out_channels, self.kernel_size,
            self.stride, self.norm_name, self.act_name, self.dtype,
        )
        if not elig and not self.use_bias and (
                _taps8_executor_ok(train, self.norm_name)):
            # 8-tap half-offset tier: covers channel counts the 27-tap
            # form cannot (the deeper encoder/decoder levels). Originally
            # eval-only; with the differentiable conv pair it also serves
            # training for instance-norm blocks (the pair path in
            # _s2d_forward handles exactly these shapes)
            elig = _s2d_block_eligible(
                x.shape[1:4], in_channels, self.out_channels,
                self.kernel_size, self.stride, self.norm_name,
                self.act_name, self.dtype, taps=8,
            )
        if elig:
            if (_fcd_flags.get("FCD_BLOCK_ENTRY_S2D") == "conv"
                    and jax.default_backend() == "tpu"):
                # one-hot-conv s2d form for the block entry: the volume
                # entry measured 3x faster than the reshape+transpose
                # lowering; A/B for the inter-level entries (copy.651)
                from fcd_tpu.kernels.block_conv import space_to_depth_fast

                xs = space_to_depth_fast(x.astype(jnp.bfloat16))
            else:
                xs = to_s2d(x.astype(jnp.bfloat16))
            if _pad_chain_ok(train, self.norm_name, self.use_bias):
                # padded-chain entry: the pad rides the to_s2d regroup
                # (elementwise producer) instead of a standalone pass
                xs = jnp.pad(xs, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
                return self._s2d_forward([(xs, in_channels, True)], train,
                                         emit_s2d, emit_pad=emit_pad,
                                         emit_pool=emit_pool)
            return self._s2d_forward([(xs, in_channels)], train, emit_s2d,
                                     emit_pad=emit_pad, emit_pool=emit_pool)

        act = make_act(self.act_name)
        out = Conv3d(self.out_channels, self.kernel_size, self.stride,
                     use_bias=self.use_bias, dtype=self.dtype)(x)
        out = make_norm(self.norm_name, self.out_channels,
                        use_running_average=not train)(out)
        out = act(out)
        out = Conv3d(self.out_channels, self.kernel_size, 1,
                     use_bias=self.use_bias, dtype=self.dtype)(out)
        out = make_norm(self.norm_name, self.out_channels,
                        use_running_average=not train)(out)

        downsample = (in_channels != self.out_channels) or (self.stride != 1)
        residual = x
        if downsample:
            residual = Conv3d(self.out_channels, 1, self.stride,
                              use_bias=self.use_bias, dtype=self.dtype)(residual)
            residual = make_norm(self.norm_name, self.out_channels,
                                 use_running_average=not train)(residual)
        out = out + residual
        return act(out)


class UnetBasicBlock(nn.Module):
    """conv-norm-act x2 without the residual path (conv_blocks.py:455-521)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    norm_name: str = "instance"
    act_name: Any = ("leakyrelu", {"negative_slope": 0.01})
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        act = make_act(self.act_name)
        out = Conv3d(self.out_channels, self.kernel_size, self.stride,
                     use_bias=self.use_bias, dtype=self.dtype)(x)
        out = make_norm(self.norm_name, self.out_channels,
                        use_running_average=not train)(out)
        out = act(out)
        out = Conv3d(self.out_channels, self.kernel_size, 1,
                     use_bias=self.use_bias, dtype=self.dtype)(out)
        out = make_norm(self.norm_name, self.out_channels,
                        use_running_average=not train)(out)
        return act(out)


class UnetrBasicBlock(nn.Module):
    """Res-or-basic selector block (conv_blocks.py:779-835)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    norm_name: str = "instance"
    act_name: Any = ("leakyrelu", {"negative_slope": 0.01})
    res_block: bool = True
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x=None, *, train: bool = False, s2d_parts=None,
                 emit_s2d: bool = False, emit_pad: bool = False,
                 emit_pool: bool = False):
        cls = UnetResBlock if self.res_block else UnetBasicBlock
        block = cls(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            stride=self.stride,
            norm_name=self.norm_name,
            act_name=self.act_name,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )
        if self.res_block:
            return block(x, train=train, s2d_parts=s2d_parts,
                         emit_s2d=emit_s2d, emit_pad=emit_pad,
                         emit_pool=emit_pool)
        return block(x, train=train)


class UnetrUpBlock(nn.Module):
    """Transposed-conv upsample + skip fusion + conv block
    (conv_blocks.py:607-689)."""

    out_channels: int
    kernel_size: int = 3
    upsample_kernel_size: int = 2
    norm_name: str = "instance"
    act_name: Any = ("leakyrelu", {"negative_slope": 0.01})
    res_block: bool = True
    use_bias: bool = False
    fuse: str = "cat"  # 'cat' | 'sum'
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x=None, skip=None, *, train: bool = False,
                 skip_s2d=None, x_s2d=None, emit_s2d: bool = False,
                 head=None, x_padded: bool = False,
                 skip_padded: bool = False, emit_pad: bool = False):
        transp = ConvTranspose3d(
            self.out_channels,
            kernel_size=self.upsample_kernel_size,
            stride=self.upsample_kernel_size,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )
        cls = UnetResBlock if self.res_block else UnetBasicBlock
        conv_block = cls(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            stride=1,
            norm_name=self.norm_name,
            act_name=self.act_name,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )

        # s2d-resident decoder fusion: the k2s2 transposed conv is a single
        # matmul straight into s2d layout; the skip converts once (or arrives
        # already s2d via skip_s2d); the cat never materializes (the residual
        # block convolves the parts separately and sums — linearity). With
        # x_s2d the INPUT also arrives s2d from the previous decoder and the
        # upsample chains s2d-to-s2d (no lane-sparse exit in between).
        if skip is not None:
            spatial = skip.shape[1:4]
        elif x is not None:
            spatial = tuple(s * 2 for s in x.shape[1:4])
        else:
            spatial = tuple(s * 4 for s in x_s2d[0].shape[1:4])
        skip_c = skip_s2d[1] if skip_s2d is not None else skip.shape[-1]
        elig_cat = skip_s2d is not None or _s2d_block_eligible(
            spatial, 2 * self.out_channels, self.out_channels,
            self.kernel_size, 1, self.norm_name, self.act_name, self.dtype,
            part_channels=[self.out_channels, skip_c],
        )
        if (not elig_cat and not self.use_bias and train
                and _pair_train_ok(self.norm_name)):
            # taps-8 tier, TRAIN only: at eval the taps-8-only decoder
            # level (dec5, 8^3 grid) measured SLOWER s2d than dense XLA
            # (8.06 vs 8.37-8.61 vol/s full bench) — the skip to_s2d and
            # small-grid kernel dispatch outweigh the fused block there
            elig_cat = _s2d_block_eligible(
                spatial, 2 * self.out_channels, self.out_channels,
                self.kernel_size, 1, self.norm_name, self.act_name,
                self.dtype, part_channels=[self.out_channels, skip_c],
                taps=8,
            )
        if (
            self.res_block
            and self.fuse == "cat"
            and self.upsample_kernel_size == 2
            and skip_c == self.out_channels
            and elig_cat
        ):
            from fcd_tpu.ops.s2d_ops import to_s2d

            # padded-chain decoder: the upsample consumes the previous
            # decoder's padded coarse tensor and emits the padded fine
            # tensor in one Pallas pass; the skip part arrives padded from
            # its producer (or pads inside its to_s2d regroup) — no
            # standalone depth-pad op feeds the multi-part conv kernel
            pad_chain = _pad_chain_ok(train, self.norm_name, self.use_bias)
            if pad_chain and x_s2d is not None:
                up_s2d = transp(x, emit_s2d=True, x_s2d=x_s2d,
                                x_padded=x_padded, emit_pad=True)
                up_padded = True
            else:
                if x_s2d is not None and x_padded:
                    x_s2d = (x_s2d[0][:, 1:-1], x_s2d[1])
                up_s2d = transp(x, emit_s2d=True, x_s2d=x_s2d)
                if pad_chain:
                    up_s2d = jnp.pad(
                        up_s2d, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
                    up_padded = True
                else:
                    up_padded = False
            if skip_s2d is not None:
                sk = skip_s2d[0]
                sk_padded = skip_padded
                if sk_padded and not pad_chain:
                    sk = sk[:, 1:-1]
                    sk_padded = False
            else:
                sk = to_s2d(skip.astype(jnp.bfloat16))
                sk_padded = pad_chain
                if sk_padded:
                    sk = jnp.pad(sk, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            return conv_block(
                train=train,
                s2d_parts=[(up_s2d, self.out_channels, up_padded),
                           (sk, skip_c, sk_padded)],
                emit_s2d=emit_s2d,
                head=head,
                emit_pad=emit_pad,
            )

        assert head is None, "head fusion requires the s2d decoder path"
        if x is None:
            from fcd_tpu.ops.s2d_ops import from_s2d

            xs_in = x_s2d[0][:, 1:-1] if x_padded else x_s2d[0]
            x = from_s2d(xs_in, x_s2d[1])
        out = transp(x)
        if self.fuse == "cat":
            out = jnp.concatenate([out, skip], axis=-1)
        else:
            out = out + skip
        return conv_block(out, train=train)


class GeneralUnetrUpBlock(nn.Module):
    """UnetrUpBlock with configurable upsampling mode
    (conv_blocks.py:692-775): pixelshuffle / deconv / nontrainable."""

    out_channels: int
    kernel_size: int = 3
    norm_name: str = "instance"
    act_name: Any = ("leakyrelu", {"negative_slope": 0.01})
    res_block: bool = True
    use_bias: bool = False
    fuse: str = "cat"
    upsample_mode: str = "pixelshuffle"
    scale_factor: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skip, *, train: bool = False):
        out = UpSample(
            features=self.out_channels,
            scale=self.scale_factor,
            mode=self.upsample_mode,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        if self.fuse == "cat":
            out = jnp.concatenate([out, skip], axis=-1)
        else:
            out = out + skip
        cls = UnetResBlock if self.res_block else UnetBasicBlock
        return cls(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            stride=1,
            norm_name=self.norm_name,
            act_name=self.act_name,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(out, train=train)


class AttentionBlock(nn.Module):
    """Attention gate (conv_blocks.py:838-894): psi = sigmoid(conv(relu(Wg g + Wx x)))."""

    f_int: int
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        g1 = Conv3d(self.f_int, 1, 1, use_bias=self.use_bias, dtype=self.dtype)(g)
        g1 = make_norm("batch", self.f_int, use_running_average=not train)(g1)
        x1 = Conv3d(self.f_int, 1, 1, use_bias=self.use_bias, dtype=self.dtype)(x)
        x1 = make_norm("batch", self.f_int, use_running_average=not train)(x1)
        psi = jax.nn.relu(g1 + x1)
        psi = Conv3d(1, 1, 1, use_bias=True, dtype=self.dtype)(psi)
        psi = make_norm("batch", 1, use_running_average=not train)(psi)
        psi = jax.nn.sigmoid(psi)
        return x * psi


class AgUpBlock(nn.Module):
    """Attention-gated upsample block (conv_blocks.py:897-967)."""

    out_channels: int
    kernel_size: int = 3
    upsample_kernel_size: int = 2
    norm_name: str = "instance"
    res_block: bool = True
    use_bias: bool = False
    fuse: str = "sum"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skip, *, train: bool = False):
        out = ConvTranspose3d(
            self.out_channels,
            kernel_size=self.upsample_kernel_size,
            stride=self.upsample_kernel_size,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        skip = AttentionBlock(f_int=self.out_channels // 2, use_bias=self.use_bias,
                              dtype=self.dtype)(out, skip, train=train)
        if self.fuse == "sum":
            out = out + skip
        else:
            out = jnp.concatenate([out, skip], axis=-1)
        cls = UnetResBlock if self.res_block else UnetBasicBlock
        return cls(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            stride=1,
            norm_name=self.norm_name,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(out, train=train)


class DsaUpBlock(nn.Module):
    """Upsample + fuse + DSA transformer stack (conv_blocks.py:524-605):
    transposed-conv upsample, then cat (res-block + 3 transformer blocks),
    sum (3 transformer blocks), or cross-attention fusion."""

    out_channels: int
    input_size: int = 0            # token count of the decoder grid
    kernel_size: int = 3
    upsample_kernel_size: int = 2
    norm_name: str = "instance"
    act_name: Any = ("leakyrelu", {"negative_slope": 0.01})
    use_bias: bool = False
    fuse: str = "cat"              # 'cat' | 'sum' | 'cross'
    proj_size: int = 64
    num_heads: int = 4
    drop_rate: float = 0.0
    depth: int = 3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skip, *, train: bool = False):
        from fcd_tpu.ops.attention import CrossAttentionBlock, TransformerBlock

        out = ConvTranspose3d(
            self.out_channels, kernel_size=self.upsample_kernel_size,
            stride=self.upsample_kernel_size, use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        if self.fuse == "cross":
            return CrossAttentionBlock(
                input_size=self.input_size, hidden_size=self.out_channels,
                proj_size=self.proj_size, num_heads=self.num_heads,
                drop_rate=self.drop_rate, dtype=self.dtype,
            )(skip, out, train=train)
        if self.fuse == "cat":
            out = jnp.concatenate([out, skip], axis=-1)
            out = UnetResBlock(
                out_channels=self.out_channels, kernel_size=self.kernel_size,
                stride=1, norm_name=self.norm_name, act_name=self.act_name,
                use_bias=self.use_bias, dtype=self.dtype,
            )(out, train=train)
        else:
            out = out + skip
        for _ in range(self.depth):
            out = TransformerBlock(
                input_size=self.input_size, hidden_size=self.out_channels,
                proj_size=self.proj_size, num_heads=self.num_heads,
                dropout_rate=self.drop_rate, pos_embed=True, dtype=self.dtype,
            )(out, train=train)
        return out


class MLPBlock(nn.Module):
    """Transformer MLP (MONAI MLPBlock parity: dense-gelu-drop-dense-drop)."""

    mlp_dim: int
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        hidden = Dense(self.mlp_dim, dtype=self.dtype)(x)
        hidden = jax.nn.gelu(hidden)
        hidden = nn.Dropout(self.dropout_rate, deterministic=not train)(hidden)
        out = Dense(x.shape[-1], dtype=self.dtype)(hidden)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        return out
