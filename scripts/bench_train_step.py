"""TPU training-step benchmark at the production config (patch 128^3,
batch = batch_size x samples_per_case, bf16, MS_DSA_NET fs16)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fcd_tpu.config import get_default_params  # noqa: E402
from fcd_tpu.losses.combined import make_combined_loss  # noqa: E402
from fcd_tpu.models.factory import get_model, init_model  # noqa: E402
from fcd_tpu.train.state import create_train_state, make_optimizer, make_train_step  # noqa: E402


def main(batch=4, n=8):
    params = get_default_params()
    params.update(patch_size=128, chans_in=2, chans_out=2, use_amp=True,
                  loss="DiceCELoss")
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    state = create_train_state(model, variables, params)
    tx = make_optimizer(params)
    # mirror ModelTrainer's gating: lane-dense s2d loss on TPU
    from fcd_tpu.losses.combined import s2d_loss_supported

    use_s2d = (jax.default_backend() == "tpu"
               and getattr(model, "supports_s2d_input", False)
               and s2d_loss_supported(params))
    from fcd_tpu.ops.blocks import _s2d_block_eligible

    use_s2d_in = use_s2d and _s2d_block_eligible(
        (128, 128, 128), 2, params["feature_size"], 3, 1,
        model.norm_name, model.act_name, model.dtype)
    loss_fn = make_combined_loss(params, s2d=use_s2d)
    step = make_train_step(model, loss_fn, tx, donate=True, s2d_loss=use_s2d, s2d_input=use_s2d_in)
    print(f"s2d loss path: {use_s2d}", flush=True)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 128, 128, 128, 2), jnp.float32)
    y = jnp.asarray((rng.rand(batch, 128, 128, 128, 1) > 0.95), jnp.float32)

    t0 = time.time()
    state, loss = step(state, x, y, 1e-4, jax.random.PRNGKey(0))
    print(f"compile+first step: {time.time() - t0:.0f}s, loss={float(loss):.4f}",
          flush=True)
    t0 = time.perf_counter()
    for i in range(n):
        state, loss = step(state, x, y, 1e-4, jax.random.PRNGKey(i))
        loss = float(loss)  # host sync each step
    dt = (time.perf_counter() - t0) / n
    print(f"train step (batch {batch}, 128^3): {dt*1000:.0f} ms "
          f"-> {batch/dt:.2f} patches/s, loss={loss:.4f}", flush=True)

    # pipelined mode: one-step-lagged loss fetch (the production trainer
    # loop) — the host round-trip overlaps the next step's device time
    t0 = time.perf_counter()
    pending = None
    for i in range(n):
        state, loss = step(state, x, y, 1e-4, jax.random.PRNGKey(i))
        if pending is not None:
            float(pending)
        pending = loss
    loss = float(pending)
    dt = (time.perf_counter() - t0) / n
    # train MFU on LOGICAL model FLOPs (fwd 1x + bwd 2x of the forward's
    # conv/matmul work — the standard convention), against the v5e bf16
    # peak; the s2d kernels' 2.37x redundancy is intentionally NOT
    # credited (same convention as bench.py's inference MFU)
    from fcd_tpu.utils.profiling import device_peak_flops, get_model_flops

    fwd_flops, _ = get_model_flops(model, params)
    if fwd_flops < 1e11:
        # the TPU eval path lowers the convs as Pallas custom calls, which
        # XLA cost analysis cannot see into (it reports ~32 GF instead of
        # 258 GF) — use the CPU-measured constant for the same graph. The
        # constant is only valid for the exact config it was measured at;
        # at any other patch/model size refuse to substitute and report
        # mfu=0 rather than a silently wrong number.
        if (params["patch_size"] == 128
                and params["feature_size"]
                == get_default_params()["feature_size"]
                and params["model_type"] == "MS_DSA_NET"):
            from bench import FLOPS_PER_PATCH_BS1

            fwd_flops = FLOPS_PER_PATCH_BS1
        else:
            print("WARNING: cost analysis saw only "
                  f"{fwd_flops / 1e9:.1f} GF (Pallas custom calls are "
                  "opaque) and the measured-FLOPs constant only covers "
                  "the default 128^3/fs-16 MS_DSA_NET config; train MFU "
                  "will be wrong/underestimated.", flush=True)
    step_flops = 3.0 * fwd_flops * batch
    mfu = step_flops / dt / device_peak_flops()
    print(f"pipelined step (batch {batch}, 128^3): {dt*1000:.0f} ms "
          f"-> {batch/dt:.2f} patches/s, loss={loss:.4f}, "
          f"train_mfu={mfu:.3f}", flush=True)


if __name__ == "__main__":
    import sys

    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 4)
