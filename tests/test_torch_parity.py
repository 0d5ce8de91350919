"""Cross-framework weight-transplant parity: fcd_tpu (flax/NDHWC) vs the
reference's math re-expressed in plain torch (CPU).

The reference's flagship blocks (networks/ms_dsa_net/conv_blocks.py:211-359
DSA, :18-90 TransformerBlock, :362-452 UnetResBlock, :607-689 UnetrUpBlock)
are re-implemented here in plain torch FROM THE MATH (MONAI is absent on this
host; get_conv_layer/get_norm_layer resolve to plain Conv3d/InstanceNorm3d/
BatchNorm3d with the documented settings). Weights initialized by the flax
modules are transplanted into the torch modules and fp32 forward agreement is
asserted to <= 1e-5.

THE ONE DOCUMENTED DEVIATION (ops/attention.py:12-15): the reference's
spatial-attention output assembly reshapes a (B, h, N, c) tensor through
permute(0, 3, 1, 2) -> (B, c, h, N) -> .reshape(B, N, C)
(conv_blocks.py:257,353) — a fixed *global* index permutation that scrambles
token and channel axes together. fcd_tpu uses the standard (B, N, h*c)
assembly. The two are related by the explicit bijection verified in
test_dsa_reference_assembly_mapping:

    ref_out.reshape(B, c, h, N).permute(0, 3, 2, 1).reshape(B, N, C)
        == standard_out

All other sa_types ('channel', 'serial') and every other block match the
reference math exactly.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fcd_tpu.ops.attention import DSA, TransformerBlock
from fcd_tpu.ops.blocks import UnetResBlock, UnetrUpBlock

torch.set_grad_enabled(False)


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.array(a, np.float32))


def conv_w(flax_kernel) -> torch.Tensor:
    """(k1,k2,k3,Cin,Cout) NDHWC kernel -> torch Conv3d (Cout,Cin,k1,k2,k3)."""
    return _t(np.transpose(np.asarray(flax_kernel), (4, 3, 0, 1, 2)))


def convT_w(flax_kernel) -> torch.Tensor:
    """(k,k,k,Cin,Cout) -> torch ConvTranspose3d (Cin,Cout,k,k,k).

    lax.conv_transpose (transpose_kernel=False) correlates the dilated
    input with the kernel as-is, while torch's ConvTranspose3d uses the
    flipped-kernel (gradient-of-conv) convention — mirror spatial axes."""
    k = np.asarray(flax_kernel)[::-1, ::-1, ::-1]
    return _t(np.transpose(k, (3, 4, 0, 1, 2)).copy())


def to_torch_x(x_ndhwc) -> torch.Tensor:
    """(B, s1, s2, s3, C) -> (B, C, s1, s2, s3)."""
    return _t(np.moveaxis(np.asarray(x_ndhwc), -1, 1))


def from_torch_x(x_t) -> np.ndarray:
    return np.moveaxis(x_t.numpy(), 1, -1)


# ---------------------------------------------------------------------------
# Reference math in plain torch
# ---------------------------------------------------------------------------


class TorchDSA(nn.Module):
    """conv_blocks.py:211-359 re-expressed in plain torch.

    assembly='reference' reproduces the reference's spatial-output reshape
    verbatim (the scramble documented in the module docstring);
    assembly='standard' uses the (B, N, h*c) assembly fcd_tpu chose.
    Channel attention and serial mode use the standard assembly in BOTH
    frameworks (the reference's permute(0,3,1,2) on the (B,h,c,N) channel
    output IS the standard assembly)."""

    def __init__(self, input_size, hidden_size, proj_size, num_heads=4,
                 sa_type="parallel", assembly="standard"):
        super().__init__()
        self.h = num_heads
        self.sa_type = sa_type
        self.assembly = assembly
        self.num = 4 if sa_type == "parallel" else 3
        self.qkvv = nn.Linear(hidden_size, hidden_size * self.num, bias=False)
        self.temperature = nn.Parameter(torch.ones(num_heads, 1, 1))
        self.temperature2 = nn.Parameter(torch.ones(num_heads, 1, 1))
        self.EF = nn.Parameter(torch.zeros(input_size, proj_size))

    def _slots(self, x):
        B, N, C = x.shape
        qkvv = self.qkvv(x).reshape(B, N, self.num, self.h, C // self.h)
        qkvv = qkvv.permute(2, 0, 3, 1, 4)  # (num, B, h, N, c)
        return [qkvv[i].transpose(-2, -1) for i in range(self.num)]  # (B,h,c,N)

    def _assemble_spatial(self, x_sa, B, N, C):
        # x_sa: (B, h, N, c)
        if self.assembly == "reference":
            return x_sa.permute(0, 3, 1, 2).reshape(B, N, C)
        return x_sa.permute(0, 2, 1, 3).reshape(B, N, C)

    def forward(self, x):
        B, N, C = x.shape
        slots = self._slots(x)
        q, k = slots[0], slots[1]
        qn = F.normalize(q, dim=-1)
        kn = F.normalize(k, dim=-1)

        def channel(v_ca):
            attn = (qn @ kn.transpose(-2, -1)) * self.temperature
            attn = attn.softmax(dim=-1)
            out = attn @ v_ca  # (B,h,c,N)
            return out.permute(0, 3, 1, 2).reshape(B, N, C)

        def spatial(v_sa):
            kp = torch.einsum("bhdn,nk->bhdk", k, self.EF)
            vp = torch.einsum("bhdn,nk->bhdk", v_sa, self.EF)
            attn = (qn.permute(0, 1, 3, 2) @ kp) * self.temperature2
            attn = attn.softmax(dim=-1)
            x_sa = attn @ vp.transpose(-2, -1)  # (B,h,N,c)
            return self._assemble_spatial(x_sa, B, N, C)

        if self.sa_type == "channel":
            return channel(slots[2])
        if self.sa_type == "spatial":
            return spatial(slots[2])
        if self.sa_type == "serial":
            kp = torch.einsum("bhdn,nk->bhdk", k, self.EF)
            vp = torch.einsum("bhdn,nk->bhdk", slots[2], self.EF)
            attn_sa = (qn.permute(0, 1, 3, 2) @ kp) * self.temperature2
            attn_sa = attn_sa.softmax(dim=-1)
            x_sa = attn_sa @ vp.transpose(-2, -1)  # (B,h,N,c)
            attn_ca = (qn @ kn.transpose(-2, -1)) * self.temperature
            attn_ca = attn_ca.softmax(dim=-1)
            out = attn_ca @ x_sa.transpose(-2, -1)  # (B,h,c,N)
            return out.permute(0, 3, 1, 2).reshape(B, N, C)
        return channel(slots[2]) + spatial(slots[3])


class TorchUnetResBlock(nn.Module):
    """conv_blocks.py:362-452 with plain-torch layers (what MONAI's
    get_conv_layer/get_norm_layer resolve to: Conv3d pad=(k-1)//2 bias=False,
    InstanceNorm3d (affine=False) / BatchNorm3d, LeakyReLU 0.01)."""

    def __init__(self, cin, cout, norm="instance", stride=1):
        super().__init__()
        self.conv1 = nn.Conv3d(cin, cout, 3, stride, 1, bias=False)
        self.conv2 = nn.Conv3d(cout, cout, 3, 1, 1, bias=False)
        mk = (lambda: nn.InstanceNorm3d(cout)) if norm == "instance" \
            else (lambda: nn.BatchNorm3d(cout))
        self.norm1, self.norm2 = mk(), mk()
        self.downsample = cin != cout or stride != 1
        if self.downsample:
            self.conv3 = nn.Conv3d(cin, cout, 1, stride, bias=False)
            self.norm3 = mk()

    def forward(self, x):
        res = x
        out = F.leaky_relu(self.norm1(self.conv1(x)), 0.01)
        out = self.norm2(self.conv2(out))
        if self.downsample:
            res = self.norm3(self.conv3(res))
        return F.leaky_relu(out + res, 0.01)


class TorchTransformerBlock(nn.Module):
    """conv_blocks.py:18-90: tokens (+pos) + gamma*DSA(LN(tokens)), then
    x + conv1x1(drop3d(UnetResBlock_batch(x))). Dropouts inactive in eval."""

    def __init__(self, input_size, hidden_size, proj_size, num_heads=4,
                 sa_type="parallel", assembly="standard"):
        super().__init__()
        self.norm = nn.LayerNorm(hidden_size)
        self.gamma = nn.Parameter(1e-6 * torch.ones(hidden_size))
        self.pos_embed = nn.Parameter(torch.zeros(1, input_size, hidden_size))
        self.dsa = TorchDSA(input_size, hidden_size, proj_size, num_heads,
                            sa_type, assembly)
        self.conv51 = TorchUnetResBlock(hidden_size, hidden_size, norm="batch")
        self.conv8 = nn.Conv3d(hidden_size, hidden_size, 1, bias=True)

    def forward(self, x):
        B, C, s1, s2, s3 = x.shape
        t = x.reshape(B, C, s1 * s2 * s3).permute(0, 2, 1)
        t = t + self.pos_embed
        t = t + self.gamma * self.dsa(self.norm(t))
        x = t.reshape(B, s1, s2, s3, C).permute(0, 4, 1, 2, 3)
        return x + self.conv8(self.conv51(x))


class TorchUnetrUpBlock(nn.Module):
    """conv_blocks.py:607-689: transp-conv(k=2,s=2) + cat skip + res block."""

    def __init__(self, cin, cout, norm="instance"):
        super().__init__()
        self.transp = nn.ConvTranspose3d(cin, cout, 2, 2, bias=False)
        self.block = TorchUnetResBlock(2 * cout, cout, norm=norm)

    def forward(self, x, skip):
        up = self.transp(x)
        return self.block(torch.cat([up, skip], dim=1))


# ---------------------------------------------------------------------------
# Transplant helpers (flax tree -> torch modules)
# ---------------------------------------------------------------------------


def load_dsa(tm: TorchDSA, p):
    tm.qkvv.weight.copy_(_t(p["qkvv"]).T)
    tm.temperature.copy_(_t(p["temperature"]))
    tm.temperature2.copy_(_t(p["temperature2"]))
    if "EF" in p:
        tm.EF.copy_(_t(p["EF"]))


def load_resblock(tm: TorchUnetResBlock, p, bs=None, rng=None):
    tm.conv1.weight.copy_(conv_w(p["Conv3d_0"]["kernel"]))
    tm.conv2.weight.copy_(conv_w(p["Conv3d_1"]["kernel"]))
    if tm.downsample:
        tm.conv3.weight.copy_(conv_w(p["Conv3d_2"]["kernel"]))
    for i, name in enumerate(["norm1", "norm2", "norm3"][: 3 if tm.downsample else 2]):
        nm = getattr(tm, name)
        if isinstance(nm, nn.BatchNorm3d):
            fp = p[f"BatchNorm_{i}"]
            nm.weight.copy_(_t(fp["scale"]))
            nm.bias.copy_(_t(fp["bias"]))
            fb = bs[f"BatchNorm_{i}"]
            nm.running_mean.copy_(_t(fb["mean"]))
            nm.running_var.copy_(_t(fb["var"]))


def randomize_batch_stats(variables, rng):
    """Non-trivial running stats so eval-mode batch norm is actually tested."""
    def rnd(path, leaf):
        key = jax.tree_util.keystr(path)
        if "mean" in key:
            return jnp.asarray(rng.normal(size=leaf.shape) * 0.2, leaf.dtype)
        if "var" in key:
            return jnp.asarray(rng.uniform(0.5, 1.5, leaf.shape), leaf.dtype)
        return leaf

    bs = variables.get("batch_stats")
    if bs is None:
        return variables
    out = dict(variables)
    out["batch_stats"] = jax.tree_util.tree_map_with_path(rnd, bs)
    return out


def randomize_params(variables, rng):
    """Replace initialized params with well-scaled random values (zeros in
    pos_embed/EF/gamma would make parity trivially true)."""
    def rnd(path, leaf):
        key = jax.tree_util.keystr(path)
        if "temperature" in key:
            return jnp.asarray(rng.uniform(0.5, 2.0, leaf.shape), leaf.dtype)
        scale = 0.3 if ("kernel" in key or "qkvv" in key or "EF" in key) else 0.1
        return jnp.asarray(rng.normal(size=leaf.shape) * scale, leaf.dtype)

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map_with_path(rnd, variables["params"])
    return out


def _agree(a, b, tol=1e-5):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = max(np.abs(b).max(), 1e-8)
    assert np.abs(a - b).max() / denom <= tol, \
        f"max rel diff {np.abs(a - b).max() / denom:.3e}"


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

B, N, C, H, P = 2, 64, 32, 4, 16


def _dsa_pair(sa_type, assembly):
    rng = np.random.RandomState(0)
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    fm = DSA(input_size=N, hidden_size=C, proj_size=P, num_heads=H,
             sa_type=sa_type)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize_params(variables, rng)
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))

    tm = TorchDSA(N, C, P, H, sa_type, assembly=assembly).eval()
    load_dsa(tm, variables["params"])
    theirs = tm(_t(x)).numpy()
    return ours, theirs


@pytest.mark.parametrize("sa_type", ["channel", "serial"])
def test_dsa_parity_exact(sa_type):
    """channel/serial: fcd_tpu matches the reference assembly exactly."""
    ours, ref = _dsa_pair(sa_type, assembly="reference")
    _agree(ours, ref)


@pytest.mark.parametrize("sa_type", ["spatial", "parallel"])
def test_dsa_parity_standard_assembly(sa_type):
    """spatial/parallel: parity up to the documented head-assembly choice."""
    ours, std = _dsa_pair(sa_type, assembly="standard")
    _agree(ours, std)


def test_dsa_reference_assembly_mapping():
    """The explicit bijection between the reference's spatial-output
    assembly (conv_blocks.py:257,353) and fcd_tpu's standard assembly."""
    ours, ref = _dsa_pair("spatial", assembly="reference")
    c = C // H
    remapped = (
        torch.from_numpy(ref).reshape(B, c, H, N)
        .permute(0, 3, 2, 1).reshape(B, N, C).numpy()
    )
    _agree(ours, remapped)


@pytest.mark.parametrize("norm,cin,cout", [
    ("instance", 16, 16), ("instance", 12, 20), ("batch", 16, 16),
    ("batch", 16, 24),
])
def test_unet_res_block_parity(norm, cin, cout):
    rng = np.random.RandomState(1)
    x = rng.normal(size=(2, 8, 10, 6, cin)).astype(np.float32)
    fm = UnetResBlock(out_channels=cout, kernel_size=3, stride=1,
                      norm_name=norm)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize_params(variables, rng)
    variables = randomize_batch_stats(variables, rng)
    ours = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))

    tm = TorchUnetResBlock(cin, cout, norm=norm).eval()
    load_resblock(tm, variables["params"], variables.get("batch_stats"))
    theirs = from_torch_x(tm(to_torch_x(x)))
    _agree(ours, theirs)


@pytest.mark.parametrize("sa_type", ["channel", "parallel"])
def test_transformer_block_parity(sa_type):
    """Full TransformerBlock (LN + pos-embed + gamma residual + DSA + the
    batch-norm conv residual branch), eval mode."""
    s = 4
    n = s ** 3
    rng = np.random.RandomState(2)
    x = rng.normal(size=(2, s, s, s, C)).astype(np.float32)
    fm = TransformerBlock(input_size=n, hidden_size=C, proj_size=P,
                          num_heads=H, sa_type=sa_type, pos_embed=True)
    variables = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x))
    variables = randomize_params(variables, rng)
    variables = randomize_batch_stats(variables, rng)
    ours = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))

    tm = TorchTransformerBlock(n, C, P, H, sa_type,
                               assembly="standard").eval()
    p = variables["params"]
    tm.norm.weight.copy_(_t(p["LayerNorm_0"]["scale"]))
    tm.norm.bias.copy_(_t(p["LayerNorm_0"]["bias"]))
    tm.gamma.copy_(_t(p["gamma"]))
    tm.pos_embed.copy_(_t(p["pos_embed"]))
    load_dsa(tm.dsa, p["DSA_0"])
    load_resblock(tm.conv51, p["UnetResBlock_0"],
                  variables["batch_stats"]["UnetResBlock_0"])
    tm.conv8.weight.copy_(conv_w(p["Conv3d_0"]["kernel"]))
    tm.conv8.bias.copy_(_t(p["Conv3d_0"]["bias"]))
    theirs = from_torch_x(tm(to_torch_x(x)))
    _agree(ours, theirs)


def test_unetr_up_block_parity():
    rng = np.random.RandomState(3)
    cin, cout = 16, 8
    x = rng.normal(size=(1, 4, 4, 4, cin)).astype(np.float32)
    skip = rng.normal(size=(1, 8, 8, 8, cout)).astype(np.float32)
    fm = UnetrUpBlock(out_channels=cout, kernel_size=3,
                      upsample_kernel_size=2, norm_name="instance",
                      res_block=True, use_bias=False)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(skip))
    variables = randomize_params(variables, rng)
    ours = np.asarray(fm.apply(variables, jnp.asarray(x), jnp.asarray(skip),
                               train=False))

    tm = TorchUnetrUpBlock(cin, cout).eval()
    p = variables["params"]
    tm.transp.weight.copy_(convT_w(p["ConvTranspose3d_0"]["kernel"]))
    load_resblock(tm.block, p["UnetResBlock_0"], None)
    theirs = from_torch_x(tm(to_torch_x(x), to_torch_x(skip)))
    _agree(ours, theirs)


class TorchMSDSASlice(nn.Module):
    """A 2-level MS_DSA_NET slice in plain torch, mirroring the reference's
    wiring (ms_dsa_net.py:104-407): encoder1 -> maxpool -> encoder2 ->
    (1x1 patch embed + GroupNorm + TransformerBlock) -> UnetrUpBlock with
    the encoder1 skip -> 1x1 head."""

    def __init__(self, cin, fs, n_tokens, proj_size, out_channels):
        super().__init__()
        self.enc1 = TorchUnetResBlock(cin, fs)
        self.enc2 = TorchUnetResBlock(fs, 2 * fs)
        self.embed = nn.Conv3d(2 * fs, fs, 1, bias=False)
        self.embed_norm = nn.GroupNorm(fs // 2, fs)
        self.trans = TorchTransformerBlock(n_tokens, fs, proj_size,
                                           num_heads=4, sa_type="parallel",
                                           assembly="standard")
        self.dec = TorchUnetrUpBlock(fs, fs)
        self.head = nn.Conv3d(fs, out_channels, 1, bias=True)

    def forward(self, x):
        x1 = self.enc1(x)
        x2 = self.enc2(F.max_pool3d(x1, 2))
        t = self.embed_norm(self.embed(x2))
        t = self.trans(t)
        y = self.dec(t, x1)
        return self.head(y)


class FlaxMSDSASlice(__import__("flax").linen.Module):
    """Same slice assembled from fcd_tpu blocks (models/ms_dsa_net.py
    embed_and_attend/encoder/decoder wiring at 2 levels)."""

    cin: int
    fs: int
    n_tokens: int
    proj_size: int
    out_channels: int

    @__import__("flax").linen.compact
    def __call__(self, x, *, train: bool = False):
        from fcd_tpu.ops.layers import Conv3d, GroupNorm, max_pool_2x

        fs = self.fs
        x1 = UnetResBlock(out_channels=fs, kernel_size=3, stride=1,
                          norm_name="instance")(x, train=train)
        x2 = UnetResBlock(out_channels=2 * fs, kernel_size=3, stride=1,
                          norm_name="instance")(max_pool_2x(x1), train=train)
        t = Conv3d(fs, kernel_size=1, use_bias=False)(x2)
        t = GroupNorm(num_groups=fs // 2)(t)
        t = TransformerBlock(input_size=self.n_tokens, hidden_size=fs,
                             proj_size=self.proj_size, num_heads=4,
                             sa_type="parallel", pos_embed=True)(
            t, train=train)
        y = UnetrUpBlock(out_channels=fs, kernel_size=3,
                         upsample_kernel_size=2, norm_name="instance",
                         res_block=True, use_bias=False)(t, x1, train=train)
        return Conv3d(self.out_channels, kernel_size=1, use_bias=True)(y)


def test_ms_dsa_net_slice_parity():
    """End-to-end 2-level slice: encoder/pool/embed/attention/decoder/head
    all agree across frameworks after weight transplant."""
    cin, fs, out = 2, 8, 2
    s = 8
    n = (s // 2) ** 3
    rng = np.random.RandomState(4)
    x = rng.normal(size=(1, s, s, s, cin)).astype(np.float32)

    fm = FlaxMSDSASlice(cin=cin, fs=fs, n_tokens=n, proj_size=8,
                        out_channels=out)
    variables = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x))
    variables = randomize_params(variables, rng)
    variables = randomize_batch_stats(variables, rng)
    ours = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))

    tm = TorchMSDSASlice(cin, fs, n, 8, out).eval()
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    load_resblock(tm.enc1, p["UnetResBlock_0"], bs.get("UnetResBlock_0"))
    load_resblock(tm.enc2, p["UnetResBlock_1"], bs.get("UnetResBlock_1"))
    tm.embed.weight.copy_(conv_w(p["Conv3d_0"]["kernel"]))
    gp = p["GroupNorm_0"]
    if "scale" not in gp:  # fcd_tpu.GroupNorm wraps flax nn.GroupNorm
        gp = gp["GroupNorm_0"]
    tm.embed_norm.weight.copy_(_t(gp["scale"]))
    tm.embed_norm.bias.copy_(_t(gp["bias"]))
    tb = p["TransformerBlock_0"]
    tm.trans.norm.weight.copy_(_t(tb["LayerNorm_0"]["scale"]))
    tm.trans.norm.bias.copy_(_t(tb["LayerNorm_0"]["bias"]))
    tm.trans.gamma.copy_(_t(tb["gamma"]))
    tm.trans.pos_embed.copy_(_t(tb["pos_embed"]))
    load_dsa(tm.trans.dsa, tb["DSA_0"])
    load_resblock(tm.trans.conv51, tb["UnetResBlock_0"],
                  bs["TransformerBlock_0"]["UnetResBlock_0"])
    tm.trans.conv8.weight.copy_(conv_w(tb["Conv3d_0"]["kernel"]))
    tm.trans.conv8.bias.copy_(_t(tb["Conv3d_0"]["bias"]))
    up = p["UnetrUpBlock_0"]
    tm.dec.transp.weight.copy_(convT_w(up["ConvTranspose3d_0"]["kernel"]))
    load_resblock(tm.dec.block, up["UnetResBlock_0"], None)
    tm.head.weight.copy_(conv_w(p["Conv3d_1"]["kernel"]))
    tm.head.bias.copy_(_t(p["Conv3d_1"]["bias"]))

    theirs = from_torch_x(tm(to_torch_x(x)))
    _agree(ours, theirs, tol=2e-5)
