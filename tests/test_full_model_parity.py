"""FULL-MODEL weight-transplant parity: the complete 6-level MS_DSA_NET
(flax/NDHWC) vs the reference's math re-expressed in plain torch, driven
through the COMPLETE evaluation chain — sliding-window inference (torch:
host-looped patches with constant blending, the MONAI shape of
train.py:148-165) -> argmax -> post-processing -> voxel metrics
(Dice + HD95, metrics.py:74-160) — asserting metric agreement <= 1e-3.

Builds on tests/test_torch_parity.py's block re-implementations (which are
written FROM the reference math at networks/ms_dsa_net/conv_blocks.py and
carry the one documented deviation: the spatial-attention output assembly
uses the standard (B, N, h*c) form, proven equivalent-up-to-permutation in
test_dsa_reference_assembly_mapping). The torch net here mirrors the
reference's ms_dsa_net.py:104-407 wiring verbatim: 6 res-block encoders,
patch embeds (1x1 conv + GroupNorm) at levels 3-6, three TransformerBlocks
per level (proj_size = project_size, except 32 at level 6), five
transposed-conv decoders, 1x1 head.

Also covers one UNETR_PP EPA block (networks/unetr_pp/transformerblock.py:
7-129): the reference's EPA math is the sa_type='parallel' DSA with the
conv-residual branching from the attention output.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fcd_tpu.models.ms_dsa_net import MS_DSA_NET

from tests.test_torch_parity import (
    TorchTransformerBlock,
    TorchUnetResBlock,
    TorchUnetrUpBlock,
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


class TorchMSDSANet(nn.Module):
    """ms_dsa_net.py:104-407 in plain torch (full 6-level net)."""

    def __init__(self, cin, out_channels, img_size, fs=8, proj=16,
                 num_layers=3):
        super().__init__()
        chans = [cin, fs, fs * 2, fs * 4, fs * 8, fs * 16, fs * 32]
        self.encoders = nn.ModuleList(
            [TorchUnetResBlock(chans[i], chans[i + 1]) for i in range(6)])

        def embed(cin_l, cout_l, groups):
            return nn.Conv3d(cin_l, cout_l, 1, bias=False), nn.GroupNorm(
                groups, cout_l)

        def trans(level_div, hidden, proj_l):
            n = 1
            for d in img_size:
                n *= d // level_div
            return nn.ModuleList([
                TorchTransformerBlock(n, hidden, proj_l, num_heads=4,
                                      sa_type="parallel",
                                      assembly="standard")
                for _ in range(num_layers)
            ])

        # patch embeds halve channels; GroupNorm groups = half the output
        # channels (ms_dsa_net.py:215-295)
        self.embed3 = nn.ModuleList(embed(fs * 4, fs * 2, fs * 1))
        self.embed4 = nn.ModuleList(embed(fs * 8, fs * 4, fs * 2))
        self.embed5 = nn.ModuleList(embed(fs * 16, fs * 8, fs * 4))
        self.embed6 = nn.ModuleList(embed(fs * 32, fs * 16, fs * 8))
        self.trans3 = trans(4, fs * 2, proj)
        self.trans4 = trans(8, fs * 4, proj)
        self.trans5 = trans(16, fs * 8, proj)
        self.trans6 = trans(32, fs * 16, 32)   # level-6 proj hardcoded 32

        self.dec5 = TorchUnetrUpBlock(fs * 16, fs * 8)
        self.dec4 = TorchUnetrUpBlock(fs * 8, fs * 4)
        self.dec3 = TorchUnetrUpBlock(fs * 4, fs * 2)
        self.dec2 = TorchUnetrUpBlock(fs * 2, fs * 2)
        self.dec1 = TorchUnetrUpBlock(fs * 2, fs * 1)
        self.head = nn.Conv3d(fs, out_channels, 1, bias=True)

    def forward(self, x):
        x1 = self.encoders[0](x)
        x2 = self.encoders[1](F.max_pool3d(x1, 2))
        x3 = self.encoders[2](F.max_pool3d(x2, 2))
        x4 = self.encoders[3](F.max_pool3d(x3, 2))
        x5 = self.encoders[4](F.max_pool3d(x4, 2))
        x6 = self.encoders[5](F.max_pool3d(x5, 2))

        def attend(x_l, embed, blocks):
            t = embed[1](embed[0](x_l))
            for blk in blocks:
                t = blk(t)
            return t

        t3 = attend(x3, self.embed3, self.trans3)
        t4 = attend(x4, self.embed4, self.trans4)
        t5 = attend(x5, self.embed5, self.trans5)
        t6 = attend(x6, self.embed6, self.trans6)

        y5 = self.dec5(t6, t5)
        y4 = self.dec4(y5, t4)
        y3 = self.dec3(y4, t3)
        y2 = self.dec2(y3, x2)
        y1 = self.dec1(y2, x1)
        return self.head(y1)


def load_transformer_block(tm: TorchTransformerBlock, p, bs):
    tm.norm.weight.copy_(_t(p["LayerNorm_0"]["scale"]))
    tm.norm.bias.copy_(_t(p["LayerNorm_0"]["bias"]))
    tm.gamma.copy_(_t(p["gamma"]))
    tm.pos_embed.copy_(_t(p["pos_embed"]))
    load_dsa(tm.dsa, p["DSA_0"])
    load_resblock(tm.conv51, p["UnetResBlock_0"], bs["UnetResBlock_0"])
    tm.conv8.weight.copy_(conv_w(p["Conv3d_0"]["kernel"]))
    tm.conv8.bias.copy_(_t(p["Conv3d_0"]["bias"]))


def load_full_net(tm: TorchMSDSANet, variables, num_layers=3):
    p = variables["params"]
    bs = variables["batch_stats"]
    for i in range(6):
        load_resblock(tm.encoders[i].block
                      if hasattr(tm.encoders[i], "block") else tm.encoders[i],
                      p[f"UnetrBasicBlock_{i}"]["UnetResBlock_0"])
    for li, (embed, trans) in enumerate(
            [(tm.embed3, tm.trans3), (tm.embed4, tm.trans4),
             (tm.embed5, tm.trans5), (tm.embed6, tm.trans6)]):
        embed[0].weight.copy_(conv_w(p[f"Conv3d_{li}"]["kernel"]))
        gp = p[f"GroupNorm_{li}"]
        if "scale" not in gp:
            gp = gp["GroupNorm_0"]
        embed[1].weight.copy_(_t(gp["scale"]))
        embed[1].bias.copy_(_t(gp["bias"]))
        for k in range(num_layers):
            idx = li * num_layers + k
            load_transformer_block(trans[k], p[f"TransformerBlock_{idx}"],
                                   bs[f"TransformerBlock_{idx}"])
    for di, dec in enumerate([tm.dec5, tm.dec4, tm.dec3, tm.dec2, tm.dec1]):
        up = p[f"UnetrUpBlock_{di}"]
        dec.transp.weight.copy_(convT_w(up["ConvTranspose3d_0"]["kernel"]))
        load_resblock(dec.block, up["UnetResBlock_0"], None)
    tm.head.weight.copy_(conv_w(p["Conv3d_4"]["kernel"]))
    tm.head.bias.copy_(_t(p["Conv3d_4"]["bias"]))


IMG = (32, 32, 64)   # level-6 grid 1x1x2: torch InstanceNorm3d needs >1 spatial voxel
FS = 8


def _build_pair(seed=0):
    """(flax apply fn, variables, loaded torch net) with randomized,
    transplanted weights."""
    rng = np.random.RandomState(seed)
    fm = MS_DSA_NET(out_channels=2, img_size=IMG, feature_size=FS,
                    project_size=16)
    variables = fm.init(
        {"params": jax.random.PRNGKey(seed),
         "dropout": jax.random.PRNGKey(seed + 1)},
        jnp.zeros((1,) + IMG + (2,), jnp.float32))
    variables = randomize_params(variables, rng)
    variables = randomize_batch_stats(variables, rng)
    tm = TorchMSDSANet(2, 2, IMG, fs=FS, proj=16).eval()
    load_full_net(tm, variables)
    return fm, variables, tm


@pytest.mark.slow
def test_ms_dsa_net_full_forward_parity():
    """The COMPLETE 6-level MS_DSA_NET agrees across frameworks after
    weight transplant (fp32 forward, one 32^3 patch)."""
    fm, variables, tm = _build_pair(0)
    rng = np.random.RandomState(7)
    x = rng.normal(size=(1,) + IMG + (2,)).astype(np.float32)
    ours = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    theirs = from_torch_x(tm(to_torch_x(x)))
    denom = np.abs(theirs).max()
    rel = np.abs(ours - theirs).max() / denom
    assert rel < 1e-4, f"max rel err {rel:.2e}"


def _torch_sliding_window(tm, vol, roi, overlap=0.25):
    """Host-looped sliding window with constant blending — the MONAI
    evaluation shape the reference uses (train.py:148-165)."""
    from fcd_tpu.infer.sliding_window import dense_patch_starts

    d, h, w, c = vol.shape
    pad = [max(r - s, 0) for r, s in zip(roi, (d, h, w))]
    cfg = [(p // 2, p - p // 2) for p in pad] + [(0, 0)]
    volp = np.pad(vol, cfg)
    pd, ph, pw = volp.shape[:3]
    starts = dense_patch_starts((pd, ph, pw), roi, overlap)
    acc = np.zeros((pd, ph, pw, 2), np.float32)
    cnt = np.zeros((pd, ph, pw, 1), np.float32)
    for s0, s1, s2 in starts:
        patch = volp[s0:s0 + roi[0], s1:s1 + roi[1], s2:s2 + roi[2]]
        logits = from_torch_x(tm(to_torch_x(patch[None])))[0]
        acc[s0:s0 + roi[0], s1:s1 + roi[1], s2:s2 + roi[2]] += logits
        cnt[s0:s0 + roi[0], s1:s1 + roi[1], s2:s2 + roi[2]] += 1.0
    out = acc / cnt
    sl = tuple(slice(p // 2, p // 2 + s) for p, s in zip(pad, (d, h, w)))
    return out[sl[0], sl[1], sl[2], :]


@pytest.mark.slow
def test_full_eval_chain_dice_hd95_parity():
    """North-star chain: both frameworks run the full evaluation path —
    sliding-window inference -> argmax -> post-processing -> Dice + HD95
    against synthetic ground truth — and the metrics agree to <= 1e-3.

    Matches the reference flow train.py:148-182 (sliding window, argmax)
    + post_processing + metrics.py:74-160 (Dice/HD95)."""
    from fcd_tpu.infer.sliding_window import sliding_window_inference
    from fcd_tpu.metrics.voxel import calculate_voxel_level_metrics
    from fcd_tpu.postproc.segment import post_process_segment

    fm, variables, tm = _build_pair(1)

    @jax.jit
    def predict(x):
        return fm.apply(variables, x, train=False)

    vol_shape = (40, 44, 72)
    rng = np.random.RandomState(3)
    ours_masks, torch_masks, gts = [], [], []
    for vi in range(2):
        vol = rng.normal(size=vol_shape + (2,)).astype(np.float32) * 0.5
        # synthetic spherical lesion ground truth
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

        # the blended logits themselves agree closely (the 1x1x2-voxel
        # level-6 instance norms amplify f32 rounding, so the logit-level
        # agreement is looser than the single-patch forward test)
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
    d_dice = abs(m_ours["DC"] - m_torch["DC"])
    d_hd = abs(m_ours["HD95"] - m_torch["HD95"])
    assert d_dice <= 1e-3, (m_ours, m_torch)
    assert d_hd <= 1e-3, (m_ours, m_torch)


# ---------------------------------------------------------------------------
# UNETR_PP EPA block (networks/unetr_pp/transformerblock.py:7-129)
# ---------------------------------------------------------------------------


class TorchEPABlock(nn.Module):
    """transformerblock.py:7-67: tokens (+pos) + gamma*EPA(LN(tokens)),
    then x = attn_skip + conv8(conv51(attn_skip)) — the conv residual
    branches from the ATTENTION output (unlike the MS-DSA block, which
    residuals from its own input). EPA (:77-129) is the parallel DSA:
    shared q/k, channel + spatial branches summed."""

    def __init__(self, input_size, hidden_size, proj_size, num_heads=4):
        super().__init__()
        from tests.test_torch_parity import TorchDSA

        self.norm = nn.LayerNorm(hidden_size)
        self.gamma = nn.Parameter(1e-6 * torch.ones(hidden_size))
        self.pos_embed = nn.Parameter(
            torch.zeros(1, input_size, hidden_size))
        self.epa = TorchDSA(input_size, hidden_size, proj_size, num_heads,
                            sa_type="parallel", assembly="standard")
        self.conv51 = TorchUnetResBlock(hidden_size, hidden_size,
                                        norm="batch")
        self.conv8 = nn.Conv3d(hidden_size, hidden_size, 1, bias=True)

    def forward(self, x):
        B, C, s1, s2, s3 = x.shape
        t = x.reshape(B, C, s1 * s2 * s3).permute(0, 2, 1)
        t = t + self.pos_embed
        t = t + self.gamma * self.epa(self.norm(t))
        xs = t.reshape(B, s1, s2, s3, C).permute(0, 4, 1, 2, 3)
        return xs + self.conv8(self.conv51(xs))


@pytest.mark.slow
def test_epa_block_parity():
    """UNETR_PP's EPA transformer block agrees after weight transplant."""
    from fcd_tpu.ops.attention import EPABlock

    hidden, s = 16, 4
    n = s ** 3
    rng = np.random.RandomState(11)
    x = rng.normal(size=(1, s, s, s, hidden)).astype(np.float32)

    fm = EPABlock(input_size=n, hidden_size=hidden, proj_size=8,
                  num_heads=4, pos_embed=True)
    variables = fm.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x))
    variables = randomize_params(variables, rng)
    variables = randomize_batch_stats(variables, rng)
    ours = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))

    tm = TorchEPABlock(n, hidden, 8).eval()
    p = variables["params"]
    bs = variables["batch_stats"]
    tm.norm.weight.copy_(_t(p["LayerNorm_0"]["scale"]))
    tm.norm.bias.copy_(_t(p["LayerNorm_0"]["bias"]))
    tm.gamma.copy_(_t(p["gamma"]))
    tm.pos_embed.copy_(_t(p["pos_embed"]))
    load_dsa(tm.epa, p["DSA_0"])
    load_resblock(tm.conv51, p["UnetResBlock_0"], bs["UnetResBlock_0"])
    tm.conv8.weight.copy_(conv_w(p["Conv3d_0"]["kernel"]))
    tm.conv8.bias.copy_(_t(p["Conv3d_0"]["bias"]))

    theirs = from_torch_x(tm(to_torch_x(x)))
    rel = np.abs(ours - theirs).max() / np.abs(theirs).max()
    assert rel < 1e-5, f"max rel err {rel:.2e}"
