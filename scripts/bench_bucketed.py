"""Hardware benchmark of the bucketed sliding-window engine (VERDICT r3 #4).

Three measurements on the real chip, streamed protocol (tip-slice +
one final sync, median of 3 reps — bench.py's methodology):

  exact@fixed    the static pad-tree engine at the bench shape
                 (182, 218, 182) — the BENCH_r* headline path
  bucket@fixed   the bucketed engine (dynamic-grid program) at the same
                 shape — isolates the engine cost at equal work
  bucket@mixed   6 shapes +/-8 voxels around the bench shape, round-robin
                 through the bucketed engine — the heterogeneous-dataset
                 scenario the trainer's sw_bucket='auto' policy routes
                 here (trainer.py), one compile per bucket
  static@fixed / static@mixed
                 the engine='static' bucketed mode (VERDICT r4 #6):
                 bucket-padded tensors, ORIGINAL grid as static starts —
                 exact-engine math at static-engine speed, one compile
                 per distinct grid shape

The drift check runs with CALIBRATED weights (a short synthetic training
run, default 30 steps) — untrained instance-norm chains maximally
amplify cross-program bf16 ulps and overstate the drift (VERDICT r4
weak #5).

Usage: bench_bucketed.py [n_stream] [calib_steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SHAPES_MIXED = [
    (174, 210, 174),
    (178, 214, 178),
    (182, 218, 182),
    (186, 222, 186),
    (190, 226, 190),
    (180, 216, 184),
]


def main():
    n_stream = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    from fcd_tpu.config import get_default_params
    from fcd_tpu.infer.sliding_window import (
        patch_s2d_compatible,
        sliding_window_inference,
        sliding_window_inference_bucketed,
    )
    from fcd_tpu.models.factory import get_model, init_model
    from fcd_tpu.train.state import make_eval_fn

    calib_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    params = get_default_params()
    params.update(patch_size=128, chans_in=2, chans_out=2, use_amp=True)
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)

    if calib_steps > 0:
        # calibrate the weights with a short synthetic training run so the
        # drift check below reflects trained-scale instance norms
        from fcd_tpu.losses.combined import (
            make_combined_loss,
            s2d_loss_supported,
        )
        from fcd_tpu.ops.blocks import _s2d_block_eligible
        from fcd_tpu.train.state import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        t0 = time.time()
        state = create_train_state(model, variables, params)
        use_s2d_l = s2d_loss_supported(params)
        use_s2d_in = use_s2d_l and _s2d_block_eligible(
            (128, 128, 128), 2, params["feature_size"], 3, 1,
            model.norm_name, model.act_name, model.dtype)
        step = make_train_step(
            model, make_combined_loss(params, s2d=use_s2d_l),
            make_optimizer(params), donate=False, s2d_loss=use_s2d_l,
            s2d_input=use_s2d_in)
        crng = np.random.RandomState(1)
        xc = jnp.asarray(crng.rand(2, 128, 128, 128, 2), jnp.float32)
        yc = jnp.asarray((crng.rand(2, 128, 128, 128, 1) > 0.95),
                         jnp.float32)
        loss = None
        for i in range(calib_steps):
            state, loss = step(state, xc, yc, 1e-3, jax.random.PRNGKey(i))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        print(f"calibrated {calib_steps} steps in {time.time()-t0:.0f}s, "
              f"final loss {float(loss):.3f}", flush=True)
    use_s2d = (getattr(model, "supports_s2d_input", False)
               and jax.default_backend() == "tpu"
               and all(patch_s2d_compatible(s, (128,) * 3, 0.25)
                       for s in SHAPES_MIXED))
    predict = make_eval_fn(model, x_is_s2d=use_s2d, s2d_logits=use_s2d)

    def predictor(p):
        return predict(variables, p)

    rng = np.random.RandomState(0)

    def make_vol(shape):
        return jnp.asarray(rng.rand(*shape, 2).astype(np.float32))

    def run_exact(vol):
        return sliding_window_inference(
            vol, predictor, roi_size=(128,) * 3,
            out_channels=2, sw_batch=params["sw_batch_size"],
            overlap=0.25, blend=params["sw_blend"],
            compute_dtype=jnp.bfloat16, patch_s2d=use_s2d,
            s2d_logits=use_s2d, flat_output=True)

    def run_bucket(vol, engine="dynamic"):
        return sliding_window_inference_bucketed(
            vol, predictor, roi_size=(128,) * 3,
            out_channels=2, sw_batch=params["sw_batch_size"],
            overlap=0.25, blend=params["sw_blend"],
            compute_dtype=jnp.bfloat16, patch_s2d=use_s2d,
            s2d_logits=use_s2d, flat_output=True, engine=engine)

    def run_static(vol):
        return run_bucket(vol, engine="static")

    def sync(x):
        np.asarray(x[(0,) * x.ndim])

    def tip(out):
        return out[(0,) * out.ndim]

    def stream(run, vols):
        for v in vols[:2]:
            sync(run(v))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            tips = []
            for i in range(n_stream):
                tips.append(tip(run(vols[i % len(vols)])))
            sync(jnp.stack(tips).sum())
            reps.append((time.perf_counter() - t0) / n_stream)
        return 1.0 / sorted(reps)[1]

    fixed = [make_vol((182, 218, 182)), make_vol((182, 218, 182))]
    mixed = [make_vol(s) for s in SHAPES_MIXED]

    # correctness spot-check: bucketed vs exact at the fixed shape. The
    # two ENGINES are exact-math-equal (CPU: bit-identical, tested), but
    # on TPU the model compiles into two different programs whose bf16
    # fusion/reduction orders differ by ulps, which an UNTRAINED
    # instance-normed net amplifies — so report the logit diff AND the
    # decision (argmax) disagreement rate, the clinically meaningful one.
    a = np.asarray(run_exact(fixed[0]))
    D, H, W = fixed[0].shape[:3]
    bflat = np.asarray(run_bucket(fixed[0]))
    if bflat.ndim == 3:   # flat bucket volume: free view back to 4-D
        Db, Hb = bflat.shape[:2]
        Wb = bflat.shape[2] // 2
        b = bflat.reshape(Db, Hb, Wb, 2)[:D, :H, :W]
    else:
        b = bflat
    a4 = a.reshape(D, H, W, 2)
    err = float(np.abs(a4 - b).max())
    dis = float((np.argmax(a4, -1) != np.argmax(b, -1)).mean())
    print(f"bucket-vs-exact at fixed shape: max abs logit diff {err:.3e}, "
          f"argmax disagreement {dis:.2e}", flush=True)

    r_exact = stream(run_exact, fixed)
    print(f"exact@fixed   : {r_exact:.3f} vol/s", flush=True)
    r_bfix = stream(run_bucket, fixed)
    print(f"bucket@fixed  : {r_bfix:.3f} vol/s "
          f"({r_bfix / r_exact * 100:.0f}% of exact)", flush=True)
    r_bmix = stream(run_bucket, mixed)
    print(f"bucket@mixed  : {r_bmix:.3f} vol/s "
          f"({r_bmix / r_exact * 100:.0f}% of exact@fixed; mixed volumes "
          f"average {np.mean([np.prod(s) for s in SHAPES_MIXED]) / np.prod((182, 218, 182)) * 100:.0f}% "
          "of the fixed voxel count)", flush=True)
    r_sfix = stream(run_static, fixed)
    print(f"static@fixed  : {r_sfix:.3f} vol/s "
          f"({r_sfix / r_exact * 100:.0f}% of exact)", flush=True)
    r_smix = stream(run_static, mixed)
    print(f"static@mixed  : {r_smix:.3f} vol/s "
          f"({r_smix / r_exact * 100:.0f}% of exact@fixed)", flush=True)
    print(json.dumps({
        "exact_fixed_vol_per_s": round(r_exact, 3),
        "bucket_fixed_vol_per_s": round(r_bfix, 3),
        "bucket_mixed_vol_per_s": round(r_bmix, 3),
        "static_fixed_vol_per_s": round(r_sfix, 3),
        "static_mixed_vol_per_s": round(r_smix, 3),
        "bucket_vs_exact_max_abs_diff": err,
        "calib_steps": calib_steps,
    }), flush=True)


if __name__ == "__main__":
    main()
