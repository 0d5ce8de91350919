"""Op-level TPU profile of the production train step (batch 4, 128^3):
evidence for where the backward time goes (fwd is shared with inference).

Usage: profile_train_step.py [n_iters] [top_k]
"""

import collections
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from scripts.profile_patch import collect  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from fcd_tpu.config import get_default_params
    from fcd_tpu.losses.combined import make_combined_loss
    from fcd_tpu.models.factory import get_model, init_model
    from fcd_tpu.train.state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    params = get_default_params()
    params.update(patch_size=128, chans_in=2, chans_out=2, use_amp=True,
                  loss="DiceCELoss")
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    state = create_train_state(model, variables, params)
    tx = make_optimizer(params)
    from fcd_tpu.losses.combined import s2d_loss_supported

    use_s2d = (jax.default_backend() == "tpu"
               and getattr(model, "supports_s2d_input", False)
               and s2d_loss_supported(params))
    from fcd_tpu.ops.blocks import _s2d_block_eligible

    use_s2d_in = use_s2d and _s2d_block_eligible(
        (128, 128, 128), 2, params["feature_size"], 3, 1,
        model.norm_name, model.act_name, model.dtype)
    loss_fn = make_combined_loss(params, s2d=use_s2d)
    step = make_train_step(model, loss_fn, tx, donate=True,
                           s2d_loss=use_s2d, s2d_input=use_s2d_in)
    print(f"s2d loss path: {use_s2d}", flush=True)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 128, 128, 128, 2), jnp.float32)
    y = jnp.asarray((rng.rand(4, 128, 128, 128, 1) > 0.95), jnp.float32)

    state, loss = step(state, x, y, 1e-4, jax.random.PRNGKey(0))
    print(f"warm loss={float(loss):.4f}", flush=True)

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for i in range(n):
                state, loss = step(state, x, y, 1e-4, jax.random.PRNGKey(i))
            _ = float(loss)
        module_ms, rows = collect(td)

    print(f"device-busy: {module_ms / n:.1f} ms/step; "
          f"sync-op sum {sum(d for _, d in rows) / n:.1f}")
    agg = collections.Counter()
    cnt = collections.Counter()
    for name, d in rows:
        agg[name] += d
        cnt[name] += 1
    for name, d in agg.most_common(top):
        print(f"{d / n:8.3f} ms  x{cnt[name] // max(n, 1):3d}  {name[:112]}")


if __name__ == "__main__":
    main()
