"""Headline benchmark: full-volume sliding-window inference throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload (mirrors the reference's evaluation path, train.py:148-165):
MS_DSA_NET (feature_size 16, the config.py defaults) over an MNI152-1mm
FLAIR+T1 volume (182x218x182, 2 channels), roi 128^3, overlap 0.25,
constant blending, bf16 compute — measured volumes/sec on one chip.

Measured as SUSTAINED throughput: all volumes dispatched back-to-back,
one final sync that depends on every output (each per-volume output is
fully computed and resident in device HBM). Module-timeline evidence
(scripts/probe_timeline.py): the device executes volumes with zero
inter-module gaps at this rate; a per-volume host sync would add a
~31 ms round-trip through the axon relay tunnel per volume — a
test-harness network artifact (a local TPU host's sync fetch is
microseconds), not device or framework time. The per-volume host-synced
loop (the reference's own eval loop shape, train.py:236-249) is also
measured and reported as "synced_loop_vol_per_s" for transparency.

vs_baseline: ratio against an estimated A100 PyTorch+MONAI throughput
for the same workload. The reference publishes no numbers (BASELINE.md)
and this host has no A100 (and no MONAI), so the denominator is
derived from a MEASURED PyTorch-eager run of the identical workload
(same architecture, same sliding-window path) on this host's CPU —
scripts/bench_torch_baseline.py, results committed in
BASELINE_MEASURED.json: PyTorch's achieved model-FLOPs utilization
(fraction of the same-measured matmul peak) is transferred to the
A100's 312 TFLOP/s fp16 peak:

    a100_vol_per_s = A100_PEAK * torch_measured_mfu / flops_per_volume

This OVER-credits the baseline: on the CPU, each eager conv runs for
seconds and amortizes all dispatch overhead, while a batch-1 A100 run
pays fixed per-kernel launch/layout costs against a ~7000x larger
peak, so its achievable MFU on this host-looped bs-1 workload is well
below the CPU figure — i.e. vs_baseline is a lower bound on the true
ratio. The JSON also reports our own measured MFU on this chip so
progress is trackable independently of the transfer assumption. The
driver's north star is vs_baseline >= 5. Full methodology:
BASELINE.md "vs_baseline methodology".
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

VOL_SHAPE = (182, 218, 182, 2)
N_WARMUP = 1
N_ITERS = 5          # per-volume host-synced loop (secondary figure)
N_STREAM = 20        # sustained streamed measure (headline)
A100_PEAK_BF16 = 312e12
# fallback if BASELINE_MEASURED.json is missing: the round-1 assumption
A100_FALLBACK_UTIL = 0.30
# XLA-counted FLOPs of the plain (no s2d/Pallas) MS_DSA_NET forward at
# (1, 128, 128, 128, 2) bf16, measured via lowered.compile().cost_analysis()
# on the CPU backend (the axon relay backend reports flops=0). Used when the
# live cost analysis is unavailable; the live path, when it works, matches.
FLOPS_PER_PATCH_BS1 = 258_106_277_888.0


def baseline_util() -> float:
    """A100 utilization credited to the torch+MONAI baseline: the MEASURED
    PyTorch-eager MFU of this exact workload on this host's CPU
    (scripts/bench_torch_baseline.py -> BASELINE_MEASURED.json)."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["torch_cpu_mfu"])
    except Exception:
        return A100_FALLBACK_UTIL


def train_metrics(batch: int = 4, n: int = 8) -> dict:
    """Time the jitted training step at the reference config (the
    reference's other hot loop, train.py:365-392): MS_DSA_NET fs16,
    batch 4 x 128^3 patches, bf16, DiceCE, AdamW — pipelined (one-step-
    lagged loss fetch, the production trainer-loop protocol). Returns
    {"train_step_ms", "train_patches_per_s", "train_mfu"}; {} on error
    so the inference headline never dies on a train-side failure."""
    import jax.random

    from fcd_tpu.config import get_default_params
    from fcd_tpu.losses.combined import make_combined_loss, s2d_loss_supported
    from fcd_tpu.models.factory import get_model, init_model
    from fcd_tpu.ops.blocks import _s2d_block_eligible
    from fcd_tpu.train.state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from fcd_tpu.utils.profiling import device_peak_flops

    params = get_default_params()
    params.update(patch_size=128, chans_in=2, chans_out=2, use_amp=True,
                  loss="DiceCELoss")
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    state = create_train_state(model, variables, params)
    tx = make_optimizer(params)
    use_s2d = (jax.default_backend() == "tpu"
               and getattr(model, "supports_s2d_input", False)
               and s2d_loss_supported(params))
    use_s2d_in = use_s2d and _s2d_block_eligible(
        (128, 128, 128), 2, params["feature_size"], 3, 1,
        model.norm_name, model.act_name, model.dtype)
    loss_fn = make_combined_loss(params, s2d=use_s2d)
    step = make_train_step(model, loss_fn, tx, donate=True,
                           s2d_loss=use_s2d, s2d_input=use_s2d_in)

    from fcd_tpu import flags as _fcd_flags

    def key(i):
        # the trainer's production key chain (FCD_RBG_DROPOUT)
        if (_fcd_flags.on("FCD_RBG_DROPOUT")
                and jax.default_backend() == "tpu"):
            return jax.random.key(i, impl="rbg")
        return jax.random.PRNGKey(i)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 128, 128, 128, 2), jnp.float32)
    y = jnp.asarray((rng.rand(batch, 128, 128, 128, 1) > 0.95), jnp.float32)
    state, loss = step(state, x, y, 1e-4, key(0))
    float(loss)  # compile + settle

    t0 = time.perf_counter()
    pending = None
    for i in range(n):
        state, loss = step(state, x, y, 1e-4, key(i))
        if pending is not None:
            float(pending)
        pending = loss
    float(pending)
    dt = (time.perf_counter() - t0) / n
    # MFU on LOGICAL model FLOPs (fwd + 2x bwd), not the blocked kernels'
    # 2.37x redundancy — same convention as the inference MFU below
    step_flops = 3.0 * FLOPS_PER_PATCH_BS1 * batch
    return {
        "train_step_ms": round(dt * 1000, 1),
        "train_patches_per_s": round(batch / dt, 2),
        "train_mfu": round(step_flops / dt / device_peak_flops(), 4),
    }


def main() -> None:
    from fcd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from fcd_tpu.config import get_default_params
    from fcd_tpu.infer.sliding_window import dense_patch_starts, sliding_window_inference
    from fcd_tpu.models.factory import get_model, init_model
    from fcd_tpu.train.state import make_eval_fn

    from fcd_tpu.infer.sliding_window import patch_s2d_compatible

    import os

    params = get_default_params()
    params.update(patch_size=128, chans_in=2, chans_out=2, use_amp=True)
    if os.environ.get("FCD_BENCH_SW_BATCH"):   # A/B override only
        params["sw_batch_size"] = int(os.environ["FCD_BENCH_SW_BATCH"])
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    use_s2d_patches = (
        getattr(model, "supports_s2d_input", False)
        and jax.default_backend() == "tpu"
        and patch_s2d_compatible(VOL_SHAPE[:3], (128, 128, 128), params["sw_overlap"])
    )
    predict_v = make_eval_fn(model, x_is_s2d=use_s2d_patches,
                             s2d_logits=use_s2d_patches)

    def predictor(patches):
        return predict_v(variables, patches)

    rng = np.random.RandomState(0)
    vols = [jnp.asarray(rng.rand(*VOL_SHAPE).astype(np.float32))
            for _ in range(2)]

    def run(vol):
        # flat_output: the fused Pallas exit emits the volume as
        # (D, H, W*C) f32 std layout — byte-identical to the C-order
        # (D, H, W, C) volume (np.asarray(out).reshape(D,H,W,C) is a free
        # view), skipping ~12 ms/volume of XLA boundary-layout copies.
        # The deliverable is unchanged: every logit is computed and in
        # its final C-order position (the reference's own torch output
        # is channels-first CUDA memory, i.e. also a host-side view away
        # from NIfTI order).
        return sliding_window_inference(
            vol,
            predictor,
            roi_size=(128, 128, 128),
            out_channels=params["chans_out"],
            sw_batch=params["sw_batch_size"],
            overlap=params["sw_overlap"],
            blend=params["sw_blend"],
            compute_dtype=jnp.bfloat16,
            patch_s2d=use_s2d_patches,
            s2d_logits=use_s2d_patches,
            flat_output=True,
        )

    def sync(out):
        # force completion: the axon relay backend's block_until_ready is
        # async; a tiny host fetch is the reliable sync point
        np.asarray(out[(0,) * out.ndim])

    for _ in range(N_WARMUP):
        sync(run(vols[0]))

    # secondary figure: one volume at a time, host-synced between volumes
    # (charges one ~31 ms relay round-trip to every volume)
    t0 = time.perf_counter()
    for i in range(N_ITERS):
        sync(run(vols[i % 2]))
    synced_vol_per_s = N_ITERS / (time.perf_counter() - t0)

    # headline: sustained throughput. Dispatch every volume; after each, a
    # tiny on-device slice captures one element of its output (so the full
    # output buffer can be released — holding N full volumes live triggers
    # relay memory pathology) and ONE final fetch of the stacked tips syncs
    # the whole batch: every volume is fully computed on device before the
    # timer stops, and the single round-trip amortizes over the batch.
    # Timeline-verified (scripts/probe_timeline.py): the device runs the
    # volumes back-to-back at this rate with zero inter-module gaps.
    def tip(out):
        return out[(0,) * out.ndim]

    sync(jnp.stack([tip(run(vols[0])), tip(run(vols[1]))]).sum())  # warm sync path
    # median of 3 reps: the streamed figure carries ~10% run-to-run spread
    # from relay state (the synced loop is ~0.5%); the median is robust to
    # a single slow rep without cherry-picking the best
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        tips = []
        for i in range(N_STREAM):
            tips.append(tip(run(vols[i % 2])))
        sync(jnp.stack(tips).sum())
        reps.append((time.perf_counter() - t0) / N_STREAM)
    dt = sorted(reps)[1]
    vol_per_s = 1.0 / dt

    # FLOPs per volume: per-patch forward cost x number of grid patches,
    # measured on the plain XLA formulation (the blocked-GEMM kernels carry
    # a deliberate 2.37x FLOP redundancy that must not inflate the baseline)
    n_patches = dense_patch_starts(VOL_SHAPE[:3], (128, 128, 128), params["sw_overlap"]).shape[0]
    try:
        import os

        os.environ["FCD_S2D"] = "0"
        os.environ["FCD_FAST_CONV"] = "0"
        sw_batch = params["sw_batch_size"]

        def raw_predict(x):  # fresh trace, not the cached jitted predictor
            return model.apply(variables, x, train=False)

        lowered = jax.jit(raw_predict).lower(
            jax.ShapeDtypeStruct((sw_batch, 128, 128, 128, 2), jnp.bfloat16)
        )
        os.environ.pop("FCD_S2D")
        os.environ.pop("FCD_FAST_CONV")
        try:
            # pre-compile HLO analysis: avoids a second multi-minute
            # backend compile through the relay (flop count matches the
            # compiled analysis for this graph)
            cost = lowered.cost_analysis()
        except Exception:
            cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_batch = float(cost.get("flops", 0.0))
        flops_per_volume = flops_per_batch * (n_patches / sw_batch)
    except Exception:
        flops_per_volume = 0.0
    if flops_per_volume <= 0:
        # relay backends report flops=0 from cost_analysis; use the
        # CPU-measured constant for the same graph (see FLOPS_PER_PATCH_BS1)
        flops_per_volume = FLOPS_PER_PATCH_BS1 * n_patches

    if flops_per_volume > 0:
        a100_vol_per_s = (A100_PEAK_BF16 * baseline_util()) / flops_per_volume
        vs_baseline = vol_per_s / a100_vol_per_s
    else:
        vs_baseline = 0.0

    # our own model-FLOPs utilization on this chip (logical FLOPs, not the
    # blocked-kernel redundancy), so progress is trackable independently of
    # the assumed baseline denominator
    kind = jax.devices()[0].device_kind.lower()
    tpu_peak = 197e12 if ("v5 lite" in kind or "v5e" in kind) else (
        275e12 if "v6" in kind else 459e12 if "v5p" in kind else 197e12)
    mfu = (flops_per_volume * vol_per_s) / tpu_peak if flops_per_volume else 0.0

    # the reference's OTHER hot loop: the training step (train.py:365-392)
    # — measured here so the driver artifact carries both (VERDICT r4 #3)
    try:
        train = train_metrics()
    except Exception as e:
        train = {"train_error": f"{type(e).__name__}: {e}"[:200]}

    print(
        json.dumps(
            {
                "metric": "sliding_window_inference_throughput",
                "value": round(vol_per_s, 4),
                "unit": "volumes/sec/chip",
                "vs_baseline": round(vs_baseline, 4),
                "mfu": round(mfu, 4),
                "flops_per_volume": flops_per_volume,
                "synced_loop_vol_per_s": round(synced_vol_per_s, 4),
                **train,
            }
        )
    )


if __name__ == "__main__":
    main()
