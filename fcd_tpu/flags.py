"""Single registry of the framework's performance gates.

The reference keeps its whole configuration in one flat dict
(reference: config.py:1-69); this module restores that property for the
TPU-side performance knobs, which historically accumulated as ad-hoc
``FCD_*`` environment reads deep inside the kernel layer. The registry is
the one place that documents every gate: its default, what it selects,
whether it is live or a measured dead end kept for reference, and where
its non-default setting is tested.

Primary interface: ``params['perf_flags']`` (a dict of gate -> value)
applied via :func:`apply_perf_flags` at trainer/CLI startup. The
environment stays the escape hatch — an explicitly exported ``FCD_*``
variable always wins over ``perf_flags`` (so a shell-level A/B never
silently loses to a config file).

Call sites read gates through :func:`get`/:func:`on` so the default
lives HERE, not scattered across modules.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional


@dataclass(frozen=True)
class Flag:
    default: str
    desc: str
    values: str = "0|1"
    status: str = "live"          # 'live' | 'dead-end' | 'infra'
    tested: str = ""              # where the NON-default setting is covered


FLAGS: Dict[str, Flag] = {
    # ---- conv kernel formulation -----------------------------------------
    "FCD_CONV8": Flag(
        "1", "Half-offset 8-tap conv pair (2.37x FLOP redundancy) vs the "
        "27-tap fused kernels (8x) in the eval resblock.",
        tested="test_s2d_blocks (both), test_flags_matrix"),
    "FCD_CONV8_TRAIN": Flag(
        "1", "Differentiable 8-tap conv pair in the TRAIN path (vs the "
        "27-tap s2d form).",
        tested="test_s2d_blocks grad parity (both)"),
    "FCD_CONV8_STATS": Flag(
        "1", "Kernel-emitted instance-norm statistics in training (custom "
        "VJPs expose the conv kernels' f32 accumulator sums; off = two "
        "XLA reduction passes).", tested="test_flags_matrix"),
    "FCD_CONV8_PROLOGUE": Flag(
        "1", "TRAIN path: norm1 + leaky-relu fused into conv2's VMEM "
        "prologue via a custom VJP (the eval formulation) — the offset "
        "tensor's standalone norm/act/mask pass never runs in XLA; off = "
        "composed instance_norm_act_offset + conv8_o2a_stats.",
        tested="test_s2d_blocks::test_conv8_prologue_grad_parity"),
    "FCD_CONV8_VPAIR": Flag(
        "1", "In-VMEM W-lane pairing for the single-part a2o kernel: 4 "
        "aligned GEMMs at doubled contraction instead of 8 taps with "
        "misaligned sx=1 slices. Measured enc1 4.85 -> 3.50 ms/volume.",
        tested="test_flags_matrix"),
    "FCD_CONV8_VPAIR_MULTI": Flag(
        "0", "Extend in-VMEM W-pairing to the MULTI-part a2o kernels "
        "(decoder cat-parts). r2 A/B: flat + a finale fusion regression; "
        "kept for re-A/B as surrounding formulations change.",
        status="dead-end", tested="test_flags_matrix (vpair parity)"),
    "FCD_CONV8_KD": Flag(
        "1", "Multi-row conv programs: kd outputs per grid step share "
        "their fetched input rows ((kd+1)/kd DMA instead of 2x).",
        tested="test_flags_matrix"),
    "FCD_A2O_PAD": Flag(
        "vmem", "a2o halo form: 'vmem' = depth-only pad + in-VMEM H/W "
        "halo; 'pad'/'dus'/'pallas' = full XLA-side halo pad variants "
        "(A/B'd on v5e: 8.66/8.16/6.49 vol/s vs vmem's 10.2+).",
        values="vmem|pad|dus|pallas", tested="test_flags_matrix (pad)"),
    "FCD_CONV8_PAIRED": Flag(
        "0", "HBM-paired W lanes (doubled input DMA). Lost to VPAIR on "
        "v5e; kept for reference.", status="dead-end",
        tested="test_s2d_blocks::test_paired_kernel_parity"),
    "FCD_CONV8_CARRY": Flag(
        "0", "Row-carry a2o (each depth row fetched once, carried in VMEM "
        "scratch). Serializes Mosaic's double buffering: -5% end-to-end.",
        status="dead-end", tested="test_s2d_blocks (carry parity)"),
    "FCD_CONV8_DUALACC": Flag(
        "0", "Dual-accumulator form (full-width GEMMs + one accumulator "
        "shift-add). Slower in context: 8.76 vs 7.83 ms/patch.",
        status="dead-end", tested="test_s2d_blocks (dualacc parity)"),
    "FCD_S2D_CONV": Flag(
        "padded27", "27-tap kernel flavour for the non-conv8 paths.",
        values="padded27|aligned", status="live",
        tested="test_conv_kernel (both flavours)"),
    "FCD_FAST_CONV": Flag(
        "0", "Route plain Conv3d through the blocked Pallas conv (the "
        "model-zoo wide path keeps XLA convs; s2d-resident blocks are "
        "the production fast path).", tested="test_conv_kernel"),

    # ---- s2d residency / fused blocks ------------------------------------
    "FCD_S2D": Flag(
        "1", "s2d-resident residual blocks (lane-dense space-to-depth "
        "execution) where eligible; off = plain NDHWC XLA path.",
        tested="test_s2d_blocks (parity vs plain)"),
    "FCD_FUSED_BLOCK": Flag(
        "1", "Fused eval resblock (3 kernel passes instead of ~10 memory "
        "passes); off = composed s2d ops.",
        tested="test_s2d_blocks::test_fused_eval_*"),
    "FCD_FUSED_HEAD": Flag(
        "0", "Fuse the 1x1 segmentation head into the final decoder "
        "block's finale kernel. A/B: 6.97 vs 7.36 vol/s (16-lane store "
        "loses more than the saved passes).", status="dead-end",
        tested="test_s2d_blocks::test_fused_head_parity"),
    "FCD_PAD_CHAIN": Flag(
        "1", "Padded-depth chain on the eval path: producers (fused "
        "finales, the Pallas upsample, to_s2d entries) emit s2d tensors "
        "with their (+1, +1) zero depth pad in-pass; a2o/pool kernels "
        "consume them directly — the standalone depth-pad ops and the "
        "upsample d2s regroup copies disappear. Off = per-consumer pads.",
        tested="test_s2d_blocks::test_pad_chain_parity"),
    "FCD_FUSED_DSA": Flag(
        "1", "Fused Pallas DSA attention kernel at eval (LayerNorm + "
        "qkvv + both attention branches); off = einsum path.",
        tested="test_dsa_kernel (parity vs einsum)"),
    "FCD_DSA_V2": Flag(
        "1", "Tokens-resident DSA einsum path for training (bf16 tokens, "
        "fused projections); off = per-head layout path.",
        tested="test_attention_math (both)"),

    # ---- pooling ----------------------------------------------------------
    "FCD_BLOCK_ENTRY_S2D": Flag(
        "reshape", "s2d form for inter-level block entries: 'conv' = "
        "one-hot stride-2 conv (the volume entry's 3x-faster lowering). "
        "A/B on v5e: 66.4 vs 64.6 ms/volume — the conv form wins only at "
        "volume scale; bit-identical.", values="reshape|conv",
        status="dead-end", tested="test_flags_matrix"),
    "FCD_FINALE_POOL": Flag(
        "1", "Fuse the encoder resblock finale + padded-chain emission + "
        "2x max pool into one Pallas pass (the pool's full re-read of the "
        "finale tensor never happens); off = separate finale fusion + "
        "pool kernel.", tested="test_s2d_blocks::test_finale_pool_parity"),
    "FCD_FINALE_TRAIN": Flag(
        "1", "Differentiable fused TRAIN finale (norm2 affine + residual "
        "+ act + padded emission + pool): ONE Pallas pass per direction "
        "with a custom VJP emitting d_ys/d_rs and the affine-grad sums; "
        "off = composed XLA finale (~5 fusions per direction at level "
        "1/2).", tested="test_finale_train (parity incl. grads)"),
    "FCD_SPATTN_KERNEL": Flag(
        "1", "VMEM-resident spatial-attention tail (softmax + dropout + "
        "attn@V per token tile, custom VJP, hardware-PRNG dropout): the "
        "(B, N, h*P) attention matrix never round-trips HBM; off = the "
        "v2 einsum tail (XLA materializes it, 0.81 ms N-minor fusion at "
        "the level-3 train shape).",
        tested="test_spatial_attn (parity incl. grads)"),
    "FCD_POOL_FWD_KERNEL": Flag(
        "1", "Pallas rotation-tree max-pool forward (full-lane VPU "
        "reduction); off = lane-slice maximum.", tested="test_flags_matrix"),
    "FCD_POOL_BWD_KERNEL": Flag(
        "1", "Pallas max-pool backward (one read-xs/write-dx pass); off = "
        "XLA compare/select chain.", tested="test_pool_kernel (parity)"),

    # ---- sliding-window engine --------------------------------------------
    "FCD_SW_STATIC": Flag(
        "1", "Static-grid SW program (pre-gathered patches, pad-tree "
        "blend); 0 = dynamic-grid program (device-data starts — the "
        "bucketed engine's program).",
        tested="test_sliding_window::test_bucketed_* (dynamic path)"),
    "FCD_SW_EXIT": Flag(
        "mm", "Volume-exit depth-to-space form: MXU perm-matmul | "
        "reshape+transpose | one-hot conv.", values="mm|reshape|conv",
        tested="test_conv_kernel::test_depth_to_space_* (all forms)"),
    "FCD_SW_FLAT_EXIT": Flag(
        "1", "Fused Pallas exit emitting the flat (D, H, W*C) f32 volume "
        "(skips ~12 ms of XLA boundary-layout copies); off = 4-D exit.",
        tested="test_d2s_exit (parity vs depth_to_space)"),
    "FCD_SW_OUT_LAYOUT": Flag(
        "", "Force the SW jit output to the standard major-to-minor "
        "layout ('std'); default lets XLA choose. Measured neutral.",
        values="''|std", status="dead-end", tested="test_flags_matrix"),
    "FCD_ENTRY_SLICE": Flag(
        "1", "Volume-entry space_to_depth as W-pair lane packing (pure "
        "reshape) + stride-2 D/H slices + one lane concat, instead of the "
        "stride-2 one-hot conv. Bit-identical; 6.4 vs 86.6 ms standalone "
        "at the bench volume (the conv form's layout assignment is "
        "hostile at c=2 without a consumer constraint).",
        tested="test_s2d_entry / test_s2d_blocks (bit parity both forms)"),
    "FCD_ENTRY_KERNEL": Flag(
        "0", "Pallas lane-permutation-GEMM volume entry. Mosaic rejects "
        "the lanes->sublane cast; 29.3 vs 5.2 ms/volume.",
        status="dead-end", tested="test_s2d_entry (bit parity)"),
    "FCD_UP_KERNEL": Flag(
        "0", "Pallas s2d upsample kernel; lost to the matmul regroup "
        "form.", status="dead-end", tested="test_upsample_kernel"),

    # ---- trainer plumbing --------------------------------------------------
    "FCD_IMAGE_PREJIT": Flag(
        "1", "Image entry s2d as its own jit (decouples layout domains; "
        "~5 ms/step of in-step relayouts otherwise).",
        tested="test_flags_matrix"),
    "FCD_LABEL_PREJIT": Flag(
        "1", "Label s2d transform as its own jit (same layout-domain "
        "lesson).", tested="test_flags_matrix"),
    "FCD_EVAL_QUEUE": Flag(
        "4", "Streamed-eval in-flight window (volumes dispatched ahead "
        "of their metric fetch).", values="int>=1",
        tested="test_trainer_e2e (streamed eval)"),
    "FCD_RBG_DROPOUT": Flag(
        "1", "Per-step dropout keys use the TPU hardware RBG PRNG instead "
        "of threefry: the level-3 spatial-attention dropout's counter-"
        "based bit-generation fusions (~3 ms/step at batch 4x128^3) "
        "become hardware RNG ops. Same Bernoulli distribution, different "
        "random stream. A/B'd 141.4 -> 138.6 ms pipelined.",
        tested="test_train_engine (threefry path is the CPU-test default)"),

    # ---- infra -------------------------------------------------------------
    "FCD_TPU_COMPILE_CACHE": Flag(
        "1", "Persistent XLA compilation cache.", status="infra"),
    "FCD_MNI152_PATH": Flag(
        "", "Path to an MNI152 template for FSL registration.",
        values="path", status="infra"),
}


def get(name: str) -> str:
    """Gate value: explicit environment wins, else the registry default."""
    return os.environ.get(name, FLAGS[name].default)


def on(name: str) -> bool:
    """Boolean gates: anything but '0'/'' counts as on."""
    return get(name) not in ("0", "")


def apply_perf_flags(perf_flags: Optional[Dict[str, str]]) -> None:
    """Apply ``params['perf_flags']`` ({gate: value}) as process defaults.

    Explicitly exported FCD_* environment variables are NOT overridden —
    the shell stays the strongest override. Unknown keys raise, so typos
    in config files fail loudly."""
    if not perf_flags:
        return
    for k, v in perf_flags.items():
        if k not in FLAGS:
            raise KeyError(
                f"unknown perf flag {k!r}; known: {sorted(FLAGS)}")
        os.environ.setdefault(k, str(v))


def knob_table_markdown() -> str:
    """README-ready markdown table of every gate (the documented knob
    surface; regenerate with `python -m fcd_tpu.flags`)."""
    rows = ["| Gate | Default | Values | Status | What it selects |",
            "|---|---|---|---|---|"]
    for name in sorted(FLAGS):
        f = FLAGS[name]
        default = f.default if f.default else "''"
        rows.append(
            f"| `{name}` | `{default}` | {f.values} "
            f"| {f.status} | {f.desc} |")
    return "\n".join(rows)


if __name__ == "__main__":
    print(knob_table_markdown())
