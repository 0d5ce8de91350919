"""FULL-MODEL weight-transplant parity for the remaining flagship families
(VERDICT r4 ask #4): SegResNet_DSA, SegResNetVAE_DSA
(networks/segresnet_dsa/segresnet_dsa.py:23-374) and the complete UNETR_PP
net (networks/unetr_pp/unetr_pp.py:8-142, model_components.py:13-148).

Pattern follows tests/test_full_model_parity.py: each reference net is
re-expressed in plain torch FROM the reference math (MONAI layer factories
resolved to plain torch: segresnet get_conv_layer -> Conv3d bias=False,
get_norm_layer('INSTANCE') -> InstanceNorm3d affine=False, UpSample
PIXELSHUFFLE -> SubpixelUpsample conv3(bias=True) + monai pixelshuffle +
constant-left-pad/avg-pool blur), our flax net's randomized weights are
transplanted, and forwards must agree to <1e-4 relative. SegResNet_DSA is
additionally driven through the COMPLETE eval chain (sliding window ->
argmax -> post-processing -> Dice/HD95) with metric agreement <=1e-3, and
SegResNetVAE_DSA asserts the (logits, vae_loss) training contract with
deterministic vae_loss parity (vae_default_std=0 removes the noise term).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fcd_tpu.models.segresnet import _SegResNetCore
from fcd_tpu.models.unetr_pp import UNETR_PP

from tests.test_full_model_parity import (
    TorchEPABlock,
    _torch_sliding_window,
    load_transformer_block,
)
from tests.test_torch_parity import (
    TorchTransformerBlock,
    TorchUnetResBlock,
    _t,
    conv_w,
    convT_w,
    from_torch_x,
    load_dsa,
    load_resblock,
    randomize_batch_stats,
    randomize_params,
    to_torch_x,
)

torch.set_grad_enabled(False)


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


# ---------------------------------------------------------------------------
# Torch re-expressions of the SegResNet building blocks (reference math:
# monai segresnet_block.ResBlock / SubpixelUpsample as configured by
# segresnet_dsa.py:82-193 with norm='INSTANCE', act='RELU')
# ---------------------------------------------------------------------------


class TorchSegResBlock(nn.Module):
    """monai ResBlock: norm-act-conv-norm-act-conv + identity (pre-act)."""

    def __init__(self, ch):
        super().__init__()
        self.norm1 = nn.InstanceNorm3d(ch)
        self.norm2 = nn.InstanceNorm3d(ch)
        self.conv1 = nn.Conv3d(ch, ch, 3, 1, 1, bias=False)
        self.conv2 = nn.Conv3d(ch, ch, 3, 1, 1, bias=False)

    def forward(self, x):
        i = x
        x = self.conv1(F.relu(self.norm1(x)))
        x = self.conv2(F.relu(self.norm2(x)))
        return x + i


class TorchSubpixelUpsample(nn.Module):
    """monai SubpixelUpsample default config: conv3x3 (bias=True) to
    C*r^3, monai pixelshuffle (channel index c = oc*r^3 + rd*r^2+rh*r+rw),
    then apply_pad_pool: constant LEFT pad r-1 per dim + avgpool(r, s=1)."""

    def __init__(self, cin, cout, r=2):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout * r ** 3, 3, 1, 1, bias=True)
        self.r = r

    def forward(self, x):
        x = self.conv(x)
        r = self.r
        b, c, d, h, w = x.shape
        oc = c // r ** 3
        x = x.reshape(b, oc, r, r, r, d, h, w)
        x = x.permute(0, 1, 5, 2, 6, 3, 7, 4)
        x = x.reshape(b, oc, d * r, h * r, w * r)
        x = F.pad(x, (r - 1, 0, r - 1, 0, r - 1, 0))
        return F.avg_pool3d(x, r, stride=1)


class TorchSegResNetDSA(nn.Module):
    """segresnet_dsa.py:23-230 in plain torch (full net, eval semantics)."""

    def __init__(self, cin, cout, img, fs=8, proj=16,
                 blocks_down=(1, 2, 2, 4), blocks_up=(1, 1, 1),
                 start=2, num_layers=3):
        super().__init__()
        self.conv_init = nn.Conv3d(cin, fs, 3, 1, 1, bias=False)
        self.pre = nn.ModuleList()
        self.downs = nn.ModuleList()
        for i, n in enumerate(blocks_down):
            ch = fs * 2 ** i
            self.pre.append(
                nn.Conv3d(ch // 2, ch, 3, 2, 1, bias=False)
                if i else nn.Identity())
            self.downs.append(
                nn.ModuleList([TorchSegResBlock(ch) for _ in range(n)]))
        self.start = start
        self.trans = nn.ModuleList()
        for i in range(start, len(blocks_down)):
            ch = fs * 2 ** i
            n_tok = _prod(s // 2 ** i for s in img)
            self.trans.append(nn.ModuleList([
                TorchTransformerBlock(n_tok, ch, proj, num_heads=4,
                                      sa_type="parallel",
                                      assembly="standard")
                for _ in range(num_layers)]))
        n_up = len(blocks_up)
        self.up_conv = nn.ModuleList()
        self.up_sample = nn.ModuleList()
        self.up_layers = nn.ModuleList()
        for i in range(n_up):
            ch = fs * 2 ** (n_up - i)
            self.up_conv.append(nn.Conv3d(ch, ch // 2, 1, bias=False))
            self.up_sample.append(TorchSubpixelUpsample(ch // 2, ch // 2))
            self.up_layers.append(nn.ModuleList(
                [TorchSegResBlock(ch // 2) for _ in range(blocks_up[i])]))
        self.final_norm = nn.InstanceNorm3d(fs)
        self.final_conv = nn.Conv3d(fs, cout, 1, bias=True)

    def encode(self, x):
        x = self.conv_init(x)
        down_x = []
        for i, blocks in enumerate(self.downs):
            x = self.pre[i](x)
            for b in blocks:
                x = b(x)
            if i >= self.start:
                for t in self.trans[i - self.start]:
                    x = t(x)
            down_x.append(x)
        return x, down_x

    def decode(self, x, down_x):
        for i in range(len(self.up_conv)):
            x = self.up_sample[i](self.up_conv[i](x)) + down_x[i + 1]
            for b in self.up_layers[i]:
                x = b(x)
        return self.final_conv(F.relu(self.final_norm(x)))

    def forward(self, x):
        x, down_x = self.encode(x)
        return self.decode(x, down_x[::-1])


class TorchSegResNetVAEDSA(TorchSegResNetDSA):
    """segresnet_dsa.py:232-374: + VAE branch reusing the decoder weights;
    vae_default_std=0 and vae_estimate_std=False make the branch
    deterministic (z = z_mean exactly)."""

    def __init__(self, cin, cout, img, fs=8, proj=16, nz=32, **kw):
        super().__init__(cin, cout, img, fs=fs, proj=proj, **kw)
        zoom = 2 ** 3
        v_filters = fs * zoom
        self.fc_insize = [s // (2 * zoom) for s in img]
        self.smallest = 16
        total = int(self.smallest * np.prod(self.fc_insize))
        self.vae_down_norm = nn.InstanceNorm3d(v_filters)
        self.vae_down_conv = nn.Conv3d(v_filters, self.smallest, 3, 2, 1,
                                       bias=True)
        self.vae_down_norm2 = nn.InstanceNorm3d(self.smallest)
        self.vae_fc1 = nn.Linear(total, nz)
        self.vae_fc2 = nn.Linear(total, nz)
        self.vae_fc3 = nn.Linear(nz, total)
        self.vae_up_conv = nn.Conv3d(self.smallest, v_filters, 1, bias=False)
        self.vae_up_sample = TorchSubpixelUpsample(v_filters, v_filters)
        self.vae_up_norm = nn.InstanceNorm3d(v_filters)
        self.vae_final_norm = nn.InstanceNorm3d(self.conv_init.out_channels)
        self.vae_final_conv = nn.Conv3d(self.conv_init.out_channels, cin, 1,
                                        bias=True)

    def vae_loss(self, net_input, vae_input):
        x = F.relu(self.vae_down_norm(vae_input))
        x = self.vae_down_conv(x)
        x = F.relu(self.vae_down_norm2(x))
        x = x.reshape(x.shape[0], -1)
        z_mean = self.vae_fc1(x)
        reg = torch.mean(z_mean ** 2)
        x = self.vae_fc3(z_mean)          # std = 0: z = z_mean exactly
        x = F.relu(x)
        x = x.reshape([-1, self.smallest] + self.fc_insize)
        x = self.vae_up_conv(x)
        x = self.vae_up_sample(x)
        x = F.relu(self.vae_up_norm(x))
        for i in range(len(self.up_conv)):
            x = self.up_sample[i](self.up_conv[i](x))
            for b in self.up_layers[i]:
                x = b(x)
        x = self.vae_final_conv(F.relu(self.vae_final_norm(x)))
        mse = F.mse_loss(net_input, x)
        return reg + mse

    def forward(self, x, with_vae=False):
        net_input = x
        x, down_x = self.encode(x)
        vae_input = x
        out = self.decode(x, down_x[::-1])
        if with_vae:
            return out, self.vae_loss(net_input, vae_input)
        return out, None


# ---------------------------------------------------------------------------
# Transplant loaders (flax tree -> torch modules)
# ---------------------------------------------------------------------------


def load_segres_block(tb, p):
    tb.conv1.weight.copy_(conv_w(p["Conv3d_0"]["kernel"]))
    tb.conv2.weight.copy_(conv_w(p["Conv3d_1"]["kernel"]))


def load_subpixel(tu, p):
    tu.conv.weight.copy_(conv_w(p["Conv3d_0"]["kernel"]))
    tu.conv.bias.copy_(_t(p["Conv3d_0"]["bias"]))


def load_segresnet(tm, variables, blocks_down=(1, 2, 2, 4),
                   blocks_up=(1, 1, 1), start=2, num_layers=3):
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    tm.conv_init.weight.copy_(conv_w(p["convInit"]["kernel"]))
    for i, n in enumerate(blocks_down):
        if i:
            tm.pre[i].weight.copy_(conv_w(p[f"down_pre_{i}"]["kernel"]))
        for j in range(n):
            load_segres_block(tm.downs[i][j], p[f"down_blocks_{i}_{j}"])
    for li in range(len(blocks_down) - start):
        for k in range(num_layers):
            load_transformer_block(
                tm.trans[li][k], p[f"transformer_levels_{li}_{k}"],
                bs[f"transformer_levels_{li}_{k}"])
    for i, n in enumerate(blocks_up):
        tm.up_conv[i].weight.copy_(conv_w(p[f"up_samples_{i}_0"]["kernel"]))
        load_subpixel(tm.up_sample[i], p[f"up_samples_{i}_1"])
        for j in range(n):
            load_segres_block(tm.up_layers[i][j], p[f"up_layers_{i}_{j}"])
    tm.final_conv.weight.copy_(conv_w(p["final_conv"]["kernel"]))
    tm.final_conv.bias.copy_(_t(p["final_conv"]["bias"]))


def _dense_kernel(p):
    return np.asarray(p["Dense_0"]["kernel"]), np.asarray(p["Dense_0"]["bias"])


def load_segresnet_vae(tm, variables, fc_insize, smallest=16, **kw):
    load_segresnet(tm, variables, **kw)
    p = variables["params"]
    tm.vae_down_conv.weight.copy_(conv_w(p["vae_down_conv"]["kernel"]))
    tm.vae_down_conv.bias.copy_(_t(p["vae_down_conv"]["bias"]))
    # flax flattens the NDHWC vae_down output as (d,h,w,C); torch flattens
    # NCDHW as (C,d,h,w) — permute the fc input columns accordingly (a pure
    # reparameterization; fc3's OUTPUT is interpreted (C,d,h,w) by both)
    d, h, w = fc_insize
    idx = np.arange(d * h * w * smallest).reshape(d, h, w, smallest)
    idx = idx.transpose(3, 0, 1, 2).ravel()
    for name in ("vae_fc1", "vae_fc2"):
        if name not in p:       # fc2 unused (and param-less) unless
            continue            # vae_estimate_std=True
        k, b = _dense_kernel(p[name])
        getattr(tm, name).weight.copy_(_t(k[idx].T))
        getattr(tm, name).bias.copy_(_t(b))
    k, b = _dense_kernel(p["vae_fc3"])
    tm.vae_fc3.weight.copy_(_t(k.T))
    tm.vae_fc3.bias.copy_(_t(b))
    tm.vae_up_conv.weight.copy_(conv_w(p["vae_up_conv"]["kernel"]))
    load_subpixel(tm.vae_up_sample, p["vae_up_sample"])
    tm.vae_final_conv.weight.copy_(conv_w(p["vae_final_conv"]["kernel"]))
    tm.vae_final_conv.bias.copy_(_t(p["vae_final_conv"]["bias"]))


# ---------------------------------------------------------------------------
# SegResNet_DSA tests
# ---------------------------------------------------------------------------

IMG = (32, 32, 32)
FS = 8
SEG_KW = dict(out_channels=2, init_filters=FS, dropout_prob=None,
              norm="instance", act=("relu", {}),
              blocks_down=(1, 2, 2, 4), blocks_up=(1, 1, 1),
              upsample_mode="pixelshuffle",
              dsa_start_level=2, dsa_img_size=IMG, dsa_project_size=16,
              dsa_num_heads=4, dsa_pos_embed=True, dsa_dropout_rate=0.0,
              dsa_sa_type="parallel", dsa_num_layers=3)


def _build_segresnet_pair(seed=0, vae=False):
    rng = np.random.RandomState(seed)
    kw = dict(SEG_KW)
    if vae:
        kw.update(vae=True, in_channels=2, input_image_size=IMG,
                  vae_estimate_std=False, vae_default_std=0.0, vae_nz=32)
    fm = _SegResNetCore(**kw)
    variables = fm.init(
        {"params": jax.random.PRNGKey(seed),
         "dropout": jax.random.PRNGKey(seed + 1)},
        jnp.zeros((1,) + IMG + (2,), jnp.float32))
    variables = randomize_params(variables, rng)
    variables = randomize_batch_stats(variables, rng)
    if vae:
        tm = TorchSegResNetVAEDSA(2, 2, IMG, fs=FS, proj=16, nz=32).eval()
        load_segresnet_vae(tm, variables, tm.fc_insize)
    else:
        tm = TorchSegResNetDSA(2, 2, IMG, fs=FS, proj=16).eval()
        load_segresnet(tm, variables)
    return fm, variables, tm


@pytest.mark.slow
def test_segresnet_dsa_full_forward_parity():
    """The COMPLETE SegResNet_DSA agrees across frameworks after weight
    transplant (fp32 eval forward, one 32^3 patch)."""
    fm, variables, tm = _build_segresnet_pair(0)
    rng = np.random.RandomState(7)
    x = rng.normal(size=(1,) + IMG + (2,)).astype(np.float32)
    ours = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    theirs = from_torch_x(tm(to_torch_x(x)))
    rel = np.abs(ours - theirs).max() / np.abs(theirs).max()
    assert rel < 1e-4, f"max rel err {rel:.2e}"


@pytest.mark.slow
def test_segresnet_dsa_eval_chain_parity():
    """SegResNet_DSA through the full evaluation chain: sliding window ->
    argmax -> post-processing -> Dice + HD95, |delta| <= 1e-3
    (train.py:148-182 + metrics.py:74-160)."""
    from fcd_tpu.infer.sliding_window import sliding_window_inference
    from fcd_tpu.metrics.voxel import calculate_voxel_level_metrics
    from fcd_tpu.postproc.segment import post_process_segment

    fm, variables, tm = _build_segresnet_pair(1)

    @jax.jit
    def predict(x):
        return fm.apply(variables, x, train=False)

    vol_shape = (40, 44, 40)
    rng = np.random.RandomState(3)
    ours_masks, torch_masks, gts = [], [], []
    for vi in range(2):
        vol = rng.normal(size=vol_shape + (2,)).astype(np.float32) * 0.5
        zz, yy, xx = np.meshgrid(*(np.arange(s) for s in vol_shape),
                                 indexing="ij")
        ctr = [s // 2 + rng.randint(-4, 5) for s in vol_shape]
        gt = (((zz - ctr[0]) ** 2 + (yy - ctr[1]) ** 2
               + (xx - ctr[2]) ** 2) < 8 ** 2).astype(np.float32)
        gts.append(gt)

        ours_logits = np.asarray(sliding_window_inference(
            jnp.asarray(vol), predict, roi_size=IMG, out_channels=2,
            sw_batch=1, overlap=0.25, blend="constant",
            compute_dtype=jnp.float32))
        torch_logits = _torch_sliding_window(tm, vol, IMG)
        rel = (np.abs(ours_logits - torch_logits).max()
               / np.abs(torch_logits).max())
        assert rel < 2e-3, f"volume {vi}: blended-logit rel err {rel:.2e}"

        for logits, sink in ((ours_logits, ours_masks),
                             (torch_logits, torch_masks)):
            pred = np.argmax(logits, axis=-1)
            mask, _ = post_process_segment(pred, l_min=10)
            sink.append(mask.astype(np.float32))

    m_ours = calculate_voxel_level_metrics(ours_masks, gts,
                                           compute_hd95=True)
    m_torch = calculate_voxel_level_metrics(torch_masks, gts,
                                            compute_hd95=True)
    assert abs(m_ours["DC"] - m_torch["DC"]) <= 1e-3, (m_ours, m_torch)
    assert abs(m_ours["HD95"] - m_torch["HD95"]) <= 1e-3, (m_ours, m_torch)


@pytest.mark.slow
def test_segresnetvae_dsa_parity():
    """SegResNetVAE_DSA: eval forward returns (logits, None) with logit
    parity; train forward returns the (logits, vae_loss) contract; and —
    with vae_default_std=0 removing the noise term — the COMPLETE VAE
    branch (vae_down -> fc bottleneck -> fc-up -> shared decoder weights
    -> vae_conv_final -> reg + mse) agrees across frameworks when both
    are fed the same encoder output. (Train-mode LOGITS are not compared
    bit-level: the reference transformer block applies Dropout3d(0.1) in
    train — conv_blocks.py:57 — and dropout draws can't be aligned
    across frameworks; the branch parity below covers all VAE math.)"""
    fm, variables, tm = _build_segresnet_pair(2, vae=True)
    rng = np.random.RandomState(9)
    x = rng.normal(size=(1,) + IMG + (2,)).astype(np.float32)

    out = fm.apply(variables, jnp.asarray(x), train=False)
    assert isinstance(out, tuple) and out[1] is None
    theirs, _ = tm(to_torch_x(x))
    rel = np.abs(np.asarray(out[0]) - from_torch_x(theirs)).max() \
        / np.abs(from_torch_x(theirs)).max()
    assert rel < 1e-4, f"eval logits rel err {rel:.2e}"

    # train contract: (logits, vae_loss) with a finite scalar loss
    (ours_logits, ours_vae), _ = fm.apply(
        variables, jnp.asarray(x), train=True,
        rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"])
    assert ours_logits.shape == (1,) + IMG + (2,)
    assert ours_vae is not None and np.isfinite(float(ours_vae))

    # deterministic full-branch parity: same vae_input into both branches
    vae_input, _ = fm.apply(variables, jnp.asarray(x), train=False,
                            method=_SegResNetCore.encode)
    ours_branch = fm.apply(
        variables, jnp.asarray(x), vae_input, train=False,
        method=_SegResNetCore._vae_loss,
        rngs={"dropout": jax.random.PRNGKey(0)})
    tm.eval()
    t_branch = tm.vae_loss(to_torch_x(x), to_torch_x(np.asarray(vae_input)))
    dv = abs(float(ours_branch) - float(t_branch)) \
        / (abs(float(t_branch)) + 1e-9)
    assert dv < 1e-4, (float(ours_branch), float(t_branch))


# ---------------------------------------------------------------------------
# Full UNETR_PP (unetr_pp.py:8-142, model_components.py:13-148)
# ---------------------------------------------------------------------------


class TorchUNETRPP(nn.Module):
    """The complete reference UNETR_PP in plain torch: 4-stage EPA encoder
    (stem conv k4s4 + GroupNorm(in_channels); downsample conv k2s2 +
    GroupNorm(prev_dims)), full-res UnetResBlock branch, three
    transposed-conv + 3xEPA decoders (proj 64), final k4s4 transposed conv
    + UnetResBlock + 1x1 head."""

    def __init__(self, cin, cout, img, fs=4, dims=(8, 16, 32, 64),
                 depths=(1, 1, 1, 1), projs=(16, 16, 16, 8), dec_proj=64,
                 heads=4):
        super().__init__()
        grids = [tuple(s // (4 * 2 ** i) for s in img) for i in range(4)]
        self.downs = nn.ModuleList()
        self.norms = nn.ModuleList()
        self.stages = nn.ModuleList()
        for i in range(4):
            if i == 0:
                self.downs.append(nn.Conv3d(cin, dims[0], 4, 4, bias=False))
                self.norms.append(nn.GroupNorm(min(cin, dims[0]), dims[0]))
            else:
                self.downs.append(
                    nn.Conv3d(dims[i - 1], dims[i], 2, 2, bias=False))
                self.norms.append(nn.GroupNorm(dims[i - 1], dims[i]))
            self.stages.append(nn.ModuleList([
                TorchEPABlock(_prod(grids[i]), dims[i], projs[i], heads)
                for _ in range(depths[i])]))
        self.encoder1 = TorchUnetResBlock(cin, fs)
        self.transp = nn.ModuleList([
            nn.ConvTranspose3d(dims[3], fs * 8, 2, 2, bias=False),
            nn.ConvTranspose3d(fs * 8, fs * 4, 2, 2, bias=False),
            nn.ConvTranspose3d(fs * 4, fs * 2, 2, 2, bias=False),
        ])
        dec_chans = (fs * 8, fs * 4, fs * 2)
        dec_grids = (grids[2], grids[1], grids[0])
        self.dec_stages = nn.ModuleList([
            nn.ModuleList([
                TorchEPABlock(_prod(g), ch, dec_proj, heads)
                for _ in range(3)])
            for ch, g in zip(dec_chans, dec_grids)])
        self.transp_final = nn.ConvTranspose3d(fs * 2, fs, 4, 4, bias=False)
        self.final_block = TorchUnetResBlock(fs, fs)
        self.head = nn.Conv3d(fs, cout, 1, bias=True)

    def forward(self, x):
        conv_branch = self.encoder1(x)
        h = x
        skips = []
        for i in range(4):
            h = self.norms[i](self.downs[i](h))
            for blk in self.stages[i]:
                h = blk(h)
            skips.append(h)
        out = skips[3]
        for i in range(3):
            out = self.transp[i](out) + skips[2 - i]
            for blk in self.dec_stages[i]:
                out = blk(out)
        out = self.transp_final(out) + conv_branch
        return self.head(self.final_block(out))


def load_epa(tm: TorchEPABlock, p, bs):
    tm.norm.weight.copy_(_t(p["LayerNorm_0"]["scale"]))
    tm.norm.bias.copy_(_t(p["LayerNorm_0"]["bias"]))
    tm.gamma.copy_(_t(p["gamma"]))
    tm.pos_embed.copy_(_t(p["pos_embed"]))
    load_dsa(tm.epa, p["DSA_0"])
    load_resblock(tm.conv51, p["UnetResBlock_0"], bs["UnetResBlock_0"])
    tm.conv8.weight.copy_(conv_w(p["Conv3d_0"]["kernel"]))
    tm.conv8.bias.copy_(_t(p["Conv3d_0"]["bias"]))


def load_unetr_pp(tm: TorchUNETRPP, variables, depths=(1, 1, 1, 1)):
    p = variables["params"]
    bs = variables["batch_stats"]
    n_enc = sum(depths)
    for i in range(4):
        tm.downs[i].weight.copy_(conv_w(p[f"Conv3d_{i}"]["kernel"]))
        gp = p[f"GroupNorm_{i}"]["GroupNorm_0"]
        tm.norms[i].weight.copy_(_t(gp["scale"]))
        tm.norms[i].bias.copy_(_t(gp["bias"]))
        off = sum(depths[:i])
        for j in range(depths[i]):
            load_epa(tm.stages[i][j], p[f"EPABlock_{off + j}"],
                     bs[f"EPABlock_{off + j}"])
    load_resblock(tm.encoder1, p["UnetResBlock_0"])
    for i in range(3):
        tm.transp[i].weight.copy_(
            convT_w(p[f"ConvTranspose3d_{i}"]["kernel"]))
        for j in range(3):
            k = n_enc + 3 * i + j
            load_epa(tm.dec_stages[i][j], p[f"EPABlock_{k}"],
                     bs[f"EPABlock_{k}"])
    tm.transp_final.weight.copy_(convT_w(p["ConvTranspose3d_3"]["kernel"]))
    load_resblock(tm.final_block, p["UnetResBlock_1"])
    tm.head.weight.copy_(conv_w(p["Conv3d_4"]["kernel"]))
    tm.head.bias.copy_(_t(p["Conv3d_4"]["bias"]))


@pytest.mark.slow
def test_unetr_pp_full_forward_parity():
    """The COMPLETE UNETR_PP agrees across frameworks after weight
    transplant (fp32 eval forward)."""
    img = (32, 32, 64)
    rng = np.random.RandomState(13)
    fm = UNETR_PP(out_channels=2, in_channels_hint=2, feature_size=4,
                  dims=(8, 16, 32, 64), proj_sizes=(16, 16, 16, 8),
                  depths=(1, 1, 1, 1), patch_size=img, dropout_rate=0.0,
                  do_ds=False)
    variables = fm.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1,) + img + (2,), jnp.float32))
    variables = randomize_params(variables, rng)
    variables = randomize_batch_stats(variables, rng)
    tm = TorchUNETRPP(2, 2, img).eval()
    load_unetr_pp(tm, variables)

    x = rng.normal(size=(1,) + img + (2,)).astype(np.float32)
    ours = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    theirs = from_torch_x(tm(to_torch_x(x)))
    rel = np.abs(ours - theirs).max() / np.abs(theirs).max()
    assert rel < 1e-4, f"max rel err {rel:.2e}"
