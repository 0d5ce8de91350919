"""Core NDHWC layers: convs, norms, activations, resampling.

Everything is channels-last (B, D, H, W, C) — the layout the TPU vector
units and XLA's conv tiling prefer — with explicit symmetric padding
matching the reference's torch/MONAI semantics (padding = (k-1)//2,
reference: networks/ms_dsa_net/conv_blocks.py:393-436 via MONAI
get_conv_layer) so weights and outputs are numerically comparable.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from fcd_tpu import flags as _fcd_flags

Dtype = Any


def _triple(x) -> Tuple[int, int, int]:
    if isinstance(x, (tuple, list)):
        assert len(x) == 3
        return tuple(int(v) for v in x)
    return (int(x),) * 3


# ---------------------------------------------------------------------------
# Initializers (matching the reference's effective init: train_utils.py:44-60)
# ---------------------------------------------------------------------------

def kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    """He-normal with fan_out for conv kernels (kaiming_normal_, mode='fan_out',
    nonlinearity='relu'). Flax conv kernels are (kd, kh, kw, in, out):
    fan_out = prod(kernel_spatial) * out_channels."""
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    fan_out = receptive * shape[-1]
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


def xavier_uniform(key, shape, dtype=jnp.float32):
    return nn.initializers.xavier_uniform()(key, shape, dtype)


def uniform_scale_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims.

    Matches torch.nn.InstanceNorm3d defaults (affine=False, eps=1e-5),
    which MONAI's norm_name='instance' resolves to.
    """

    epsilon: float = 1e-5
    affine: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y.astype(orig_dtype)


class GroupNorm(nn.Module):
    """GroupNorm with affine params (torch GroupNorm parity, eps=1e-5)."""

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, dtype=None,
            param_dtype=jnp.float32,
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm over (batch + spatial), torch BatchNorm3d parity
    (eps=1e-5, momentum=0.1 torch-style => 0.9 flax-style).

    First-party implementation (not flax nn.BatchNorm) so the same module —
    same param/batch_stats tree — can also consume space-to-depth tensors:
    with `s2d_channels=c`, x is (B, D/2, H/2, W/2, 8c) and per-channel stats
    regroup over the 8 parity groups without leaving the lane-dense layout.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x=None, *, s2d_channels: Optional[int] = None,
                 return_affine_for: Optional[int] = None):
        c = (return_affine_for if return_affine_for is not None
             else s2d_channels if s2d_channels is not None else x.shape[-1])
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if return_affine_for is not None:
            # eval-mode affine of this norm (y = x*w + b) from the running
            # stats, for callers that fuse it into a conv kernel prologue
            w = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            return w, bias - ra_mean.value * w

        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            m1 = jnp.mean(xf, axis=axes)
            m2 = jnp.mean(jnp.square(xf), axis=axes)
            if s2d_channels is not None:
                m1 = m1.reshape(8, c).mean(axis=0)
                m2 = m2.reshape(8, c).mean(axis=0)
            mean = m1
            var = jnp.maximum(m2 - jnp.square(m1), 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)

        w = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * w
        if s2d_channels is not None:
            w, b = jnp.tile(w, 8), jnp.tile(b, 8)
        return (xf * w + b).astype(x.dtype)


class LayerNorm(nn.Module):
    """Last-axis layer norm (nn.LayerNorm semantics, f32 params/compute).

    `return_affine_for=c` creates the params and returns (scale, bias)
    without computing — for callers that fuse the normalization into a
    kernel prologue (e.g. the fused DSA attention kernel)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x=None, *, return_affine_for: Optional[int] = None):
        c = (int(return_affine_for) if return_affine_for is not None
             else x.shape[-1])
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if return_affine_for is not None:
            return scale, bias
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu),
            0.0)
        return (xf - mu) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


def make_norm(norm_name: str, channels: int, *, num_groups: int = 8,
              use_running_average: bool = False) -> nn.Module:
    """Factory mirroring MONAI get_norm_layer for the norms the reference uses."""
    name = norm_name.lower() if isinstance(norm_name, str) else norm_name[0].lower()
    if name == "instance":
        return InstanceNorm()
    if name == "batch":
        return BatchNorm(use_running_average=use_running_average)
    if name == "group":
        return GroupNorm(num_groups=num_groups)
    if name == "layer":
        return LayerNorm()
    raise ValueError(f"Unsupported norm: {norm_name}")


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

class PReLU(nn.Module):
    """Parametric ReLU with a single shared slope (torch nn.PReLU default)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(self.init), (1,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def make_act(act_name) -> Callable:
    if isinstance(act_name, (tuple, list)):
        name, kwargs = act_name[0].lower(), (act_name[1] if len(act_name) > 1 else {})
    else:
        name, kwargs = str(act_name).lower(), {}
    if name == "leakyrelu":
        slope = kwargs.get("negative_slope", 0.01)
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if name == "relu":
        return jax.nn.relu
    if name == "prelu":
        return PReLU(init=kwargs.get("init", 0.25))
    if name == "gelu":
        return jax.nn.gelu
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise ValueError(f"Unsupported activation: {act_name}")


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

def _fast_conv_enabled() -> bool:
    # Off by default: the blocked kernel wins 5x on isolated convs but the
    # pad/s2d/d2s layout transforms around it (each paying the 8x lane
    # padding of C=16 HBM tensors) and lost XLA fusion make it a net loss
    # in-model until level-resident s2d execution lands. Set FCD_FAST_CONV=1
    # to enable.
    import os

    return _fcd_flags.get("FCD_FAST_CONV") == "1"


class Conv3d(nn.Module):
    """3D conv, NDHWC, torch-style symmetric padding ((k-1)//2 each side).

    On TPU, 3x3x3 stride-1 convs with small channel counts dispatch to the
    blocked-GEMM Pallas kernel (fcd_tpu.kernels.block_conv) — ~5x faster
    than XLA's direct conv at the U-Net's top levels. Disable with
    FCD_FAST_CONV=0.
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    use_bias: bool = True
    kernel_init: Callable = kaiming_normal_fan_out
    dtype: Optional[Dtype] = None

    def _params(self, cin: int):
        k = _triple(self.kernel_size)
        kernel = self.param("kernel", self.kernel_init, k + (cin, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        return kernel, bias

    @nn.compact
    def __call__(self, x=None, *, s2d_parts=None, return_kernel_for=None):
        from fcd_tpu.kernels.block_conv import blocked_conv3x3, fast_conv_supported

        if return_kernel_for is not None:
            # block-level kernel fusion: create this conv's params (same
            # tree as a normal call) and hand them to the caller
            return self._params(int(return_kernel_for))
        if s2d_parts is not None:
            return self._s2d_forward(s2d_parts)

        k = _triple(self.kernel_size)
        s = _triple(self.stride)
        cin = x.shape[-1]
        kernel, bias = self._params(cin)
        dtype = self.dtype or x.dtype

        use_fast = (
            _fast_conv_enabled()
            and jax.default_backend() == "tpu"
            and dtype == jnp.bfloat16
            and fast_conv_supported(x.shape[1:4], cin, self.features, k, s)
        )
        if use_fast:
            out = blocked_conv3x3(x.astype(dtype), kernel.astype(dtype), dtype)
        else:
            # MONAI dynunet get_padding convention: int((k - s + 1) / 2)
            # per axis — identical to torch's (k-1)//2 for every odd-k
            # stride<=2 case the nets use, and 0 (not 1) for the UNETR++
            # k4/s4 stem (reference model_components.py:21)
            pad = tuple((int((kk - ss + 1) / 2),) * 2 for kk, ss in zip(k, s))
            out = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype), s, pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out

    def _s2d_forward(self, parts):
        """Convolve a concatenation of aligned-s2d parts without
        materializing the cat (linearity over kernel input-channel slices).
        kernel_size must be 3 (blocked Pallas) or 1 (block-diag matmul)."""
        from fcd_tpu.ops.s2d_ops import conv1x1_s2d, conv3x3_s2d

        cin_total = sum(c for _, c in parts)
        kernel, bias = self._params(cin_total)
        ksize = _triple(self.kernel_size)[0]
        out = None
        off = 0
        for xs, c in parts:
            if ksize == 3:
                piece = conv3x3_s2d(xs, kernel[..., off:off + c, :])
            elif ksize == 1:
                piece = conv1x1_s2d(xs, kernel[0, 0, 0, off:off + c, :])
            else:
                raise ValueError("s2d conv supports kernel sizes 1 and 3")
            out = piece if out is None else out + piece
            off += c
        if bias is not None:
            out = out + jnp.tile(bias, 8).astype(out.dtype)
        return out


class ConvTranspose3d(nn.Module):
    """Transposed 3D conv (kernel == stride case used by the reference's
    upsample path, reference: conv_blocks.py:548-557)."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 2
    stride: Union[int, Sequence[int]] = 2
    use_bias: bool = True
    kernel_init: Callable = kaiming_normal_fan_out
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x=None, *, emit_s2d: bool = False, x_s2d=None,
                 x_padded: bool = False, emit_pad: bool = False):
        k = _triple(self.kernel_size)
        s = _triple(self.stride)
        cin = x_s2d[1] if x_s2d is not None else x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, k + (cin, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        if x_s2d is not None:
            # input arrives as the coarse grid's s2d tensor: upsample
            # straight to the fine grid's s2d layout (s2d decoder chaining)
            from fcd_tpu.ops.s2d_ops import (
                upsample2x_s2d_to_s2d,
                upsample2x_s2d_to_s2d_pad,
            )

            assert k == (2, 2, 2) and s == (2, 2, 2) and emit_s2d
            if emit_pad:
                return upsample2x_s2d_to_s2d_pad(
                    x_s2d[0].astype(jnp.bfloat16), cin,
                    kernel.astype(jnp.bfloat16), bias, in_padded=x_padded)
            xin = x_s2d[0][:, 1:-1] if x_padded else x_s2d[0]
            return upsample2x_s2d_to_s2d(
                xin.astype(jnp.bfloat16), cin,
                kernel.astype(jnp.bfloat16), bias)
        dtype = self.dtype or x.dtype
        if emit_s2d:
            from fcd_tpu.ops.s2d_ops import upsample2x_into_s2d

            assert k == (2, 2, 2) and s == (2, 2, 2)
            return upsample2x_into_s2d(
                x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16), bias
            )
        # k == s: non-overlapping upsample, VALID gives exactly n*s.
        # k > s (e.g. MONAI UNet's k=3 s=2 with padding+output_padding):
        # SAME reproduces the n*s output size.
        padding = "VALID" if k == s else "SAME"
        out = jax.lax.conv_transpose(
            x.astype(dtype), kernel.astype(dtype), s, padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out


# ---------------------------------------------------------------------------
# Pooling / resampling
# ---------------------------------------------------------------------------

def max_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """torch.max_pool3d(x, 2, 2) on NDHWC.

    TPU form: W-pairs are lane-adjacent, so packing them by a pure
    reshape turns the W reduction into a lane-half max; D/H reduce by
    stride-2 pair-max on major dims — three fusable elementwise passes
    instead of XLA's reduce-window lowering (~150x the bandwidth floor
    at the transformer-level shapes, profile_patch reduce_window_max)."""
    if x.ndim == 5 and all(s % 2 == 0 for s in x.shape[1:4]):
        b, d, h, w, c = x.shape
        xp = x.reshape(b, d, h, w // 2, 2 * c)
        m = jnp.maximum(xp[..., :c], xp[..., c:])
        m = jnp.maximum(m[:, 0::2], m[:, 1::2])
        return jnp.maximum(m[:, :, 0::2], m[:, :, 1::2])
    return nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))


def pixel_shuffle_3d(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Rearrange (B, D, H, W, C*r^3) -> (B, D*r, H*r, W*r, C) with MONAI's
    channel grouping (monai.networks.utils.pixelshuffle): channel index
    c = oc*r^3 + rd*r^2 + rh*r + rw, so transplanted reference weights
    land on the same output voxels."""
    b, d, h, w, c = x.shape
    r = factor
    oc = c // (r ** 3)
    x = x.reshape(b, d, h, w, oc, r, r, r)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, d * r, h * r, w * r, oc)


def interpolate_trilinear(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Trilinear upsample with align_corners=False (torch interpolate parity)."""
    b, d, h, w, c = x.shape
    new_shape = (b, d * scale, h * scale, w * scale, c)
    return jax.image.resize(x, new_shape, method="linear")


def interpolate_nearest(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    b, d, h, w, c = x.shape
    new_shape = (b, d * scale, h * scale, w * scale, c)
    return jax.image.resize(x, new_shape, method="nearest")


class UpSample(nn.Module):
    """MONAI-UpSample-equivalent with the three modes the reference exposes
    via params['segresnet_upsample_mode'] (reference: get_model.py:160,201).

    - 'deconv': ConvTranspose(k=scale, s=scale)
    - 'pixelshuffle': 3x3 conv to C_out * scale^3, pixel shuffle, then the
      MONAI SubpixelUpsample default apply_pad_pool blur (zero-pad LEFT
      by scale-1 per spatial dim + avg-pool window=scale stride=1 — the
      checkerboard-suppression pass the reference nets run)
    - 'nontrainable': trilinear interpolation (+1x1 conv if channels change)
    """

    features: int
    scale: int = 2
    mode: str = "pixelshuffle"
    use_bias: bool = True
    apply_pad_pool: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.mode == "deconv":
            return ConvTranspose3d(
                self.features, kernel_size=self.scale, stride=self.scale,
                use_bias=self.use_bias, dtype=self.dtype,
            )(x)
        if self.mode == "pixelshuffle":
            y = Conv3d(
                self.features * self.scale ** 3, kernel_size=3, stride=1,
                use_bias=self.use_bias, dtype=self.dtype,
            )(x)
            y = pixel_shuffle_3d(y, self.scale)
            if self.apply_pad_pool and self.scale > 1:
                r = self.scale
                y = jnp.pad(y, ((0, 0),) + ((r - 1, 0),) * 3 + ((0, 0),))
                y = nn.avg_pool(y, window_shape=(r, r, r),
                                strides=(1, 1, 1))
            return y
        if self.mode == "nontrainable":
            y = interpolate_trilinear(x, self.scale)
            if y.shape[-1] != self.features:
                y = Conv3d(self.features, kernel_size=1, use_bias=self.use_bias,
                           dtype=self.dtype)(y)
            return y
        raise ValueError(f"Unsupported upsample mode: {self.mode}")


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------

class Dense(nn.Module):
    """Linear layer with xavier-uniform init (reference effective init for
    nn.Linear, train_utils.py:50-53)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = xavier_uniform
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
