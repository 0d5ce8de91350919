"""Measured PyTorch-eager baseline for the headline benchmark denominator.

The driver's north star compares our TPU sliding-window throughput against
"A100 PyTorch+MONAI" on the same workload, but the reference repo publishes
no numbers (BASELINE.md) and this host has no A100 and no MONAI. What we CAN
measure is how efficiently PyTorch eager executes this exact workload on
silicon we do have: this script implements the reference's evaluation path
(/root/reference/train.py:148-165 — MS_DSA_NET fs16 over a 182x218x182
FLAIR+T1 volume, roi 128^3, overlap 0.25, constant blending, host-looped
sliding window exactly like MONAI's) in plain PyTorch, runs it on this
host's CPU, and reports:

  - torch_sec_per_volume / torch_vol_per_s  (eager fp32, no_grad, eval)
  - cpu_matmul_peak_gflops                  (measured torch.matmul peak)
  - torch_cpu_mfu = achieved model-FLOP/s / measured matmul peak

The model here is an independent PyTorch implementation of the same
architecture our flax model implements (reference:
networks/ms_dsa_net/ms_dsa_net.py:104-407, conv_blocks.py:18-90,211-359);
it exists only to measure the baseline framework's efficiency and is not
part of the fcd_tpu package.

bench.py then credits the hypothetical A100 run with a MULTIPLE of the
MFU measured here (see BASELINE.md "vs_baseline methodology"), which is
generous: eager batch-1 3D inference is dispatch/memory-bound, and fixed
per-op overheads are a LARGER fraction of runtime on a 312-TFLOP/s part
than on a ~100-GFLOP/s core, so the true A100 MFU on this workload is, if
anything, below the CPU figure.

Run: python scripts/bench_torch_baseline.py  (takes a few minutes; writes
BASELINE_MEASURED.json at the repo root).
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

VOL_SHAPE = (182, 218, 182)
ROI = (128, 128, 128)
OVERLAP = 0.25
FEATURE_SIZE = 16
IN_CH, OUT_CH = 2, 2


class ResBlock(nn.Module):
    """UnetResBlock: conv3-norm-lrelu, conv3-norm, 1x1 shortcut, lrelu."""

    def __init__(self, cin, cout, norm="instance", bias=False):
        super().__init__()

        def make_norm(c):
            if norm == "batch":
                return nn.BatchNorm3d(c)
            return nn.InstanceNorm3d(c, affine=True)

        self.conv1 = nn.Conv3d(cin, cout, 3, padding=1, bias=bias)
        self.norm1 = make_norm(cout)
        self.conv2 = nn.Conv3d(cout, cout, 3, padding=1, bias=bias)
        self.norm2 = make_norm(cout)
        self.act = nn.LeakyReLU(0.01)
        self.downsample = cin != cout
        if self.downsample:
            self.conv3 = nn.Conv3d(cin, cout, 1, bias=bias)
            self.norm3 = make_norm(cout)

    def forward(self, x):
        r = x
        y = self.act(self.norm1(self.conv1(x)))
        y = self.norm2(self.conv2(y))
        if self.downsample:
            r = self.norm3(self.conv3(r))
        return self.act(y + r)


class DSA(nn.Module):
    """Parallel dual self-attention (conv_blocks.py:211-359)."""

    def __init__(self, n, c, proj, heads=4):
        super().__init__()
        self.h, self.c = heads, c // heads
        self.qkvv = nn.Linear(c, c * 4, bias=False)
        self.EF = nn.Parameter(torch.empty(n, proj).uniform_(-1, 1) / math.sqrt(proj))
        self.t1 = nn.Parameter(torch.ones(heads, 1, 1))
        self.t2 = nn.Parameter(torch.ones(heads, 1, 1))

    def forward(self, x):
        B, N, C = x.shape
        qkvv = self.qkvv(x).reshape(B, N, 4, self.h, self.c)
        q, k, vca, vsa = (qkvv[:, :, i].permute(0, 2, 3, 1) for i in range(4))
        qn = F.normalize(q, dim=-1)
        kn = F.normalize(k, dim=-1)
        attn_ca = (qn @ kn.transpose(-2, -1)) * self.t1
        x_ca = (attn_ca.softmax(-1) @ vca).permute(0, 3, 1, 2).reshape(B, N, C)
        kp = k @ self.EF
        vp = vsa @ self.EF
        attn_sa = (qn.transpose(-2, -1) @ kp) * self.t2
        x_sa = (attn_sa.softmax(-1) @ vp.transpose(-2, -1)).reshape(B, N, C)
        return x_ca + x_sa


class TransformerBlock(nn.Module):
    def __init__(self, n, c, proj, heads=4):
        super().__init__()
        self.pos = nn.Parameter(torch.zeros(1, n, c))
        self.norm = nn.LayerNorm(c)
        self.gamma = nn.Parameter(torch.full((c,), 1e-6))
        self.attn = DSA(n, c, proj, heads)
        self.conv_res = ResBlock(c, c, norm="batch", bias=False)
        self.drop = nn.Dropout3d(0.1)
        self.proj_out = nn.Conv3d(c, c, 1, bias=True)

    def forward(self, x):
        B, C, D, H, W = x.shape
        t = x.flatten(2).transpose(1, 2) + self.pos
        t = t + self.gamma * self.attn(self.norm(t))
        y = t.transpose(1, 2).reshape(B, C, D, H, W)
        return y + self.proj_out(self.drop(self.conv_res(y)))


class UpBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.up = nn.ConvTranspose3d(cin, cout, 2, stride=2, bias=False)
        self.block = ResBlock(cout * 2, cout, bias=False)

    def forward(self, x, skip):
        return self.block(torch.cat([self.up(x), skip], dim=1))


class MSDSANetTorch(nn.Module):
    """MS_DSA_NET fs16 (ms_dsa_net.py:104-407), NCDHW eager PyTorch."""

    def __init__(self, fs=FEATURE_SIZE, cin=IN_CH, cout=OUT_CH, img=128,
                 proj=64, heads=4, num_layers=3):
        super().__init__()
        self.encs = nn.ModuleList(
            [ResBlock(cin, fs)]
            + [ResBlock(fs * 2 ** i, fs * 2 ** (i + 1)) for i in range(5)]
        )
        self.pool = nn.MaxPool3d(2)

        def stage(level_div, emb_c, groups, proj_size):
            n = (img // level_div) ** 3
            return nn.Sequential(
                nn.Conv3d(emb_c * 2, emb_c, 1, bias=False),
                nn.GroupNorm(groups, emb_c),
                *[TransformerBlock(n, emb_c, proj_size, heads)
                  for _ in range(num_layers)],
            )

        self.t3 = stage(4, fs * 2, fs, proj)
        self.t4 = stage(8, fs * 4, fs * 2, proj)
        self.t5 = stage(16, fs * 8, fs * 4, proj)
        self.t6 = stage(32, fs * 16, fs * 8, 32)
        self.d5 = UpBlock(fs * 16, fs * 8)
        self.d4 = UpBlock(fs * 8, fs * 4)
        self.d3 = UpBlock(fs * 4, fs * 2)
        self.d2 = UpBlock(fs * 2, fs * 2)
        self.d1 = UpBlock(fs * 2, fs)
        self.head = nn.Conv3d(fs, cout, 1)

    def forward(self, x):
        x1 = self.encs[0](x)
        x2 = self.encs[1](self.pool(x1))
        x3 = self.encs[2](self.pool(x2))
        x4 = self.encs[3](self.pool(x3))
        x5 = self.encs[4](self.pool(x4))
        x6 = self.encs[5](self.pool(x5))
        t3, t4, t5, t6 = self.t3(x3), self.t4(x4), self.t5(x5), self.t6(x6)
        y = self.d5(t6, t5)
        y = self.d4(y, t4)
        y = self.d3(y, t3)
        y = self.d2(y, x2)
        y = self.d1(y, x1)
        return self.head(y)


def dense_patch_starts(vol, roi, overlap):
    """MONAI dense grid: stride = roi*(1-overlap), last patch clamped."""
    starts = []
    for v, r in zip(vol, roi):
        step = max(1, int(r * (1 - overlap)))
        s = list(range(0, max(v - r, 0) + 1, step))
        if s[-1] != v - r:
            s.append(v - r)
        starts.append(s)
    return [(a, b, c) for a in starts[0] for b in starts[1] for c in starts[2]]


def sliding_window(vol, model, roi, overlap, out_ch):
    """Host-looped SW with constant blending (MONAI semantics)."""
    pad = [max(r - v, 0) for v, r in zip(vol.shape[2:], roi)]
    if any(pad):
        vol = F.pad(vol, (0, pad[2], 0, pad[1], 0, pad[0]))
    shape = vol.shape[2:]
    out = torch.zeros((1, out_ch) + shape)
    cnt = torch.zeros((1, 1) + shape)
    for (z, y, x) in dense_patch_starts(shape, roi, overlap):
        patch = vol[:, :, z:z + roi[0], y:y + roi[1], x:x + roi[2]]
        logits = model(patch)
        out[:, :, z:z + roi[0], y:y + roi[1], x:x + roi[2]] += logits
        cnt[:, :, z:z + roi[0], y:y + roi[1], x:x + roi[2]] += 1
    return out / cnt


def measure_cpu_matmul_peak(n=1024, iters=8):
    a = torch.randn(n, n)
    b = torch.randn(n, n)
    for _ in range(2):
        a @ b
    t0 = time.perf_counter()
    for _ in range(iters):
        a @ b
    dt = (time.perf_counter() - t0) / iters
    return 2 * n ** 3 / dt / 1e9


def count_model_flops(model, shape):
    """2*MAC FLOPs for convs/linears/attention GEMMs via fx-free hooks."""
    flops = [0]

    def conv_hook(mod, inp, out):
        k = math.prod(mod.kernel_size)
        flops[0] += 2 * out.numel() * inp[0].shape[1] * k // mod.groups

    def lin_hook(mod, inp, out):
        flops[0] += 2 * out.numel() * mod.in_features

    hooks = []
    for m in model.modules():
        if isinstance(m, (nn.Conv3d, nn.ConvTranspose3d)):
            hooks.append(m.register_forward_hook(conv_hook))
        elif isinstance(m, nn.Linear):
            hooks.append(m.register_forward_hook(lin_hook))
        elif isinstance(m, DSA):
            def dsa_hook(mod, inp, out):
                B, N, C = inp[0].shape
                h, c = mod.h, mod.c
                P = mod.EF.shape[1]
                # ca: qk^T + attn@v; sa: k/v proj + qn@kp + attn@vp
                flops[0] += 2 * B * h * (2 * c * c * N)
                flops[0] += 2 * B * h * (2 * c * N * P + 2 * N * c * P)
            hooks.append(m.register_forward_hook(dsa_hook))
    with torch.no_grad():
        model(torch.zeros(shape))
    for h in hooks:
        h.remove()
    return flops[0]


def main():
    torch.set_num_threads(max(1, os.cpu_count() or 1))
    torch.manual_seed(0)
    model = MSDSANetTorch().eval()
    n_params = sum(p.numel() for p in model.parameters())

    patch_flops = count_model_flops(model, (1, IN_CH) + ROI)
    n_patches = len(dense_patch_starts(VOL_SHAPE, ROI, OVERLAP))
    flops_per_volume = patch_flops * n_patches

    peak = measure_cpu_matmul_peak()

    vol = torch.from_numpy(
        np.random.RandomState(0).rand(1, IN_CH, *VOL_SHAPE).astype(np.float32))

    with torch.no_grad():
        # warm one patch (oneDNN primitive caches, allocator)
        model(vol[:, :, :ROI[0], :ROI[1], :ROI[2]])
        t0 = time.perf_counter()
        sliding_window(vol, model, ROI, OVERLAP, OUT_CH)
        dt = time.perf_counter() - t0

    result = {
        "workload": "MS_DSA_NET fs16, 182x218x182x2, roi 128^3, overlap 0.25,"
                    " constant blend, eager fp32, host-looped SW",
        "host": f"{os.cpu_count()} cpu core(s), torch {torch.__version__},"
                f" {torch.get_num_threads()} thread(s)",
        "n_params": n_params,
        "n_patches": n_patches,
        "flops_per_volume": flops_per_volume,
        "torch_sec_per_volume": round(dt, 3),
        "torch_vol_per_s": round(1.0 / dt, 5),
        "cpu_matmul_peak_gflops": round(peak, 2),
        "torch_cpu_mfu": round(flops_per_volume / dt / (peak * 1e9), 4),
    }
    print(json.dumps(result, indent=2))
    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
