"""ModelTrainer: the training/evaluation engine.

TPU-native re-design of the reference trainer (train.py:37-426): jitted
bf16 train steps over device-resident patch batches with on-device
augmentation, per-epoch warmup+cosine LR, EMA-smoothed-val-loss early
stopping (patience + LR-floor, train.py:252-282,398-408), best/latest
checkpointing with resume, sliding-window validation, post-train double
test with/without post-processing (train.py:421-424), CSV + optional
wandb logging (train.py:284-305).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fcd_tpu.data.augment import augment_batch, scheduled_probs
from fcd_tpu.data.dataset import FCDDataset, PatchLoader, VolumeLoader
from fcd_tpu.infer.sliding_window import sliding_window_inference
from fcd_tpu.losses.combined import make_combined_loss
from fcd_tpu.metrics import calculate_lesion_wise_metrics, calculate_voxel_level_metrics
from fcd_tpu.models.factory import count_params, get_model, init_model
from fcd_tpu.postproc.segment import post_process_prediction
from fcd_tpu.train import checkpoint as ckpt
from fcd_tpu.train.schedule import epoch_lr
from fcd_tpu import flags as _fcd_flags
from fcd_tpu.train.state import (
    create_train_state,
    make_eval_fn,
    make_optimizer,
    make_train_step,
)


def _get_wandb(params):
    if os.environ.get("WANDB_MODE") == "disabled":
        return None
    try:
        import wandb  # noqa: F401

        return wandb
    except ImportError:
        return None


def _triple(x):
    if isinstance(x, (tuple, list)):
        return tuple(int(v) for v in x)
    return (int(x),) * 3


class ModelTrainer:
    latest_model_filename = ckpt.LATEST_NAME
    best_model_filename = ckpt.BEST_NAME

    def __init__(self, params: Dict[str, Any], verbose: bool = True):
        self.params = params
        self.verbose = verbose
        _fcd_flags.apply_perf_flags(params.get("perf_flags"))
        self.val_interval = 1
        # determinism modes (train_utils.py:5-28 analogue): JAX is seeded via
        # explicit PRNG keys; 'strict' additionally pins matmul precision so
        # bf16 accumulation orders cannot vary between compilations
        if params.get("deterministic", "seed_only") == "strict":
            try:
                jax.config.update("jax_default_matmul_precision", "highest")
            except Exception:
                pass
        # FCD_RBG_DROPOUT (default on, TPU only): hardware RBG PRNG for the
        # training rng chain — the attention-dropout threefry bit-gen
        # fusions (~3 ms/step at batch 4x128^3) become hardware RNG ops.
        # Same Bernoulli distribution, different random stream.
        if (_fcd_flags.on("FCD_RBG_DROPOUT")
                and jax.default_backend() == "tpu"):
            self.rng = jax.random.key(params.get("seed", 42), impl="rbg")
        else:
            self.rng = jax.random.PRNGKey(params.get("seed", 42))

        self.model, self.params = get_model(params)
        variables = init_model(self.model, self.params, seed=params.get("seed", 42))
        if verbose:
            print(f"Trainable parameters: {count_params(variables)}")
        self.state = create_train_state(self.model, variables, self.params)
        self.tx = make_optimizer(self.params)
        self.loss_fn = make_combined_loss(self.params)
        # training-loss fast path: run the Dice/CE math on the model's s2d
        # logits with s2d labels (lane-dense; the C=2 full-resolution head
        # exit + loss layout cost ~25 ms/step at batch 4x128^3). Validation
        # keeps the dense self.loss_fn (it scores sliding-window volumes).
        from fcd_tpu.losses.combined import s2d_loss_supported

        self._use_s2d_loss = (
            jax.default_backend() == "tpu"
            and not self.params["model_returns_vaeloss"]
            and getattr(self.model, "supports_s2d_input", False)
            and s2d_loss_supported(self.params)
        )
        train_loss = (make_combined_loss(self.params, s2d=True)
                      if self._use_s2d_loss else self.loss_fn)

        # training-input fast path: cast + s2d the image in its own jit and
        # feed the model x_is_s2d patches (the in-step entry pays ~5 ms of
        # parameter relayouts at batch 4x128^3 — see make_train_step). Gate
        # mirrors the model's own level-1 s2d eligibility (ms_dsa_net.py
        # use_s2d1); if the model declines anyway, its from_s2d fallback
        # keeps numerics identical.
        self._use_s2d_input = False
        if self._use_s2d_loss and getattr(self.model, "res_block", False) \
                and getattr(self.model, "upsample_mode", None) is None:
            from fcd_tpu.ops.blocks import _s2d_block_eligible

            ps = self.params["patch_size"]
            full = tuple(ps) if isinstance(ps, (tuple, list)) else (ps,) * 3
            self._use_s2d_input = _s2d_block_eligible(
                full, self.params["chans_in"], self.params["feature_size"],
                3, 1, getattr(self.model, "norm_name", "instance"),
                getattr(self.model, "act_name", "leakyrelu"),
                getattr(self.model, "dtype", None))

        # Device mesh (params['mesh_data'] / --devices, -1 = all): when more
        # than one device is in play, training runs the NamedSharding-jitted
        # DP step (batch over 'data', state replicated, XLA psum over ICI)
        # and inference shards the sliding-window patch grid (parallel/).
        self.mesh = self._build_mesh()
        # opt-in per-layer-group param/grad norm logging (wandb.watch
        # analogue, reference train.py:336): the step additionally returns
        # {group: grad L2 norm}; log_metrics adds gnorm_*/pnorm_* columns
        self._log_norms = bool(self.params.get("log_layer_norms", False))
        self._last_grad_norms = None
        step_kwargs = dict(
            model_returns_vaeloss=self.params["model_returns_vaeloss"],
            loss_vae_weight=self.params.get("loss_vae_weight", 0.2),
            donate=self.params.get("donate_buffers", True),
            s2d_loss=self._use_s2d_loss,
            grad_norms=self._log_norms,
        )
        if self.mesh is not None:
            from fcd_tpu.parallel.dp import make_dp_train_step, replicate_state

            self.train_step = make_dp_train_step(
                self.model, train_loss, self.tx, self.mesh, **step_kwargs
            )
            # ragged batches (global batch % mesh != 0) keep the mesh via
            # pad-and-mask: batch padded to the mesh multiple with cyclic
            # repeats, loss weighted by a 0/1 validity mask (exact —
            # losses/combined.py sample_mask). params['ragged_dp'] =
            # 'replicate' restores the fully replicated exact fallback.
            self._dp_mask_step = make_dp_train_step(
                self.model, train_loss, self.tx, self.mesh,
                **{**step_kwargs, "with_mask": True},
            )
            self._ragged_step = make_train_step(
                self.model, train_loss, self.tx,
                **{**step_kwargs, "donate": False},
            )
            self.state = replicate_state(self.state, self.mesh)
        else:
            self.train_step = make_train_step(
                self.model, train_loss, self.tx,
                s2d_input=self._use_s2d_input, **step_kwargs
            )
        self.predict = make_eval_fn(
            self.model, model_returns_vaeloss=self.params["model_returns_vaeloss"]
        )
        self._predict_s2d = None
        self._predict_s2d_logits = None
        self._sw_exact_shapes = set()
        self._sw_pred_wrappers: Dict[Any, Any] = {}
        self.wandb = _get_wandb(params)
        self.init_stats()

    def _build_mesh(self):
        """Resolve params['mesh_data'] (--devices, -1 = all) to a 'data' mesh,
        or None single-device. Batches that do not divide over the mesh take
        the exact-numerics _ragged_step fallback; a steady-state warning is
        printed in train()."""
        n_req = int(self.params.get("mesh_data", -1) or -1)
        n_avail = len(jax.devices())
        n_mesh = n_avail if n_req < 0 else min(n_req, n_avail)
        if n_mesh <= 1:
            return None
        from fcd_tpu.parallel.mesh import make_mesh

        return make_mesh(n_mesh, ("data",))

    # -- state ---------------------------------------------------------------

    def init_stats(self):
        self.best_val_loss = float("inf")
        self.best_ema_val_loss = float("inf")
        self.best_val_loss_epoch = -1
        self.best_ema_val_loss_epoch = -1
        self.ema_val_loss: Optional[float] = None
        self.early_stopping_counter = 0
        self.log_keys = None
        self.train_start_time = time.time()

    def _extra(self):
        return {
            "best_val_loss": self.best_val_loss,
            "best_ema_val_loss": self.best_ema_val_loss,
            "ema_val_loss": -1.0 if self.ema_val_loss is None else self.ema_val_loss,
            "early_stopping_counter": self.early_stopping_counter,
        }

    def save_model(self, path: str, epoch: Optional[int] = None):
        ckpt.save_checkpoint(path, self.state, epoch=epoch, extra=self._extra())

    def load_model(self, path: str, with_optimizer: bool = True):
        self.state, epoch, extra = ckpt.load_checkpoint(
            path, self.state, with_optimizer=with_optimizer
        )
        if self.mesh is not None:
            from fcd_tpu.parallel.dp import replicate_state

            self.state = replicate_state(self.state, self.mesh)
        if extra:
            self.best_val_loss = float(extra.get("best_val_loss", float("inf")))
            self.best_ema_val_loss = float(extra.get("best_ema_val_loss", float("inf")))
            ema = float(extra.get("ema_val_loss", -1.0))
            self.ema_val_loss = None if ema < 0 else ema
            self.early_stopping_counter = int(extra.get("early_stopping_counter", 0))
        return epoch

    @property
    def variables(self):
        return {"params": self.state.params, "batch_stats": self.state.batch_stats}

    # -- inference -------------------------------------------------------------

    def inference(self, volume: np.ndarray) -> jnp.ndarray:
        """Sliding-window logits over a (D, H, W, C) volume
        (train.py:148-165 parity: roi=patch, overlap .25). Feeds the model
        s2d patches when it supports them (lane-dense gathers)."""
        from fcd_tpu.infer.sliding_window import patch_s2d_compatible

        p = self.params
        roi = _triple(p["patch_size"])
        overlap = p.get("sw_overlap", 0.25)
        use_s2d_patches = (
            getattr(self.model, "supports_s2d_input", False)
            and p.get("use_amp", True)
            and jax.default_backend() == "tpu"
            and patch_s2d_compatible(volume.shape[:3], roi, overlap)
        )
        # s2d logits (blend on the s2d grid) only for models whose head can
        # emit them; the single-device engine supports it, the sharded one
        # blends densely
        use_s2d_logits = use_s2d_patches and self.mesh is None
        if use_s2d_patches:
            if self._predict_s2d is None or \
                    self._predict_s2d_logits != use_s2d_logits:
                self._predict_s2d = make_eval_fn(
                    self.model,
                    model_returns_vaeloss=self.params["model_returns_vaeloss"],
                    x_is_s2d=True,
                    s2d_logits=use_s2d_logits,
                )
                self._predict_s2d_logits = use_s2d_logits
            predict = self._predict_s2d
        else:
            predict = self.predict

        # one closure PER PREDICT FN, cached: `predictor` is a jit
        # static argument of the sliding-window programs (hashed by
        # identity), so a fresh closure per call would retrace the whole
        # SW program for every volume. The closure late-binds
        # self.variables, so parameter updates between epochs are seen
        # without retracing.
        predictor = self._sw_pred_wrappers.get(predict)
        if predictor is None:
            def predictor(patches, _p=predict):
                return _p(self.variables, patches)

            self._sw_pred_wrappers[predict] = predictor

        compute_dtype = (
            jnp.bfloat16 if p.get("use_amp", True) else jnp.float32
        )
        if self.mesh is not None:
            from fcd_tpu.parallel.sw import sharded_sliding_window_inference

            return sharded_sliding_window_inference(
                jnp.asarray(volume),
                predictor,
                self.mesh,
                roi_size=roi,
                out_channels=p["chans_out"],
                sw_batch=p.get("sw_batch_size", 2),
                overlap=overlap,
                blend=p.get("sw_blend", "constant"),
                sigma_scale=p.get("sw_sigma_scale", 0.125),
                compute_dtype=compute_dtype,
                patch_s2d=use_s2d_patches,
            )
        # volume-shape bucketing policy (SURVEY §7 hard part (d)): the
        # exact static-grid engine compiles per volume shape; on a real
        # heterogeneous dataset that is one XLA compile per subject. auto:
        # the first sw_bucket_auto_shapes distinct shapes get the exact
        # engine (covers fixed-shape pipelines at full speed), every later
        # NEW shape runs the bucketed engine (identical results, compile
        # count bounded by the bucket set).
        bucket_mode = p.get("sw_bucket", "auto")
        use_bucket = False
        if bucket_mode == "on":
            use_bucket = True
        elif bucket_mode == "auto":
            key = tuple(int(s) for s in volume.shape[:3])
            if key in self._sw_exact_shapes:
                use_bucket = False
            elif len(self._sw_exact_shapes) < int(
                    p.get("sw_bucket_auto_shapes", 2)):
                self._sw_exact_shapes.add(key)
            else:
                use_bucket = True
        if use_bucket:
            from fcd_tpu.infer.sliding_window import (
                sliding_window_inference_bucketed,
            )

            return sliding_window_inference_bucketed(
                jnp.asarray(volume),
                predictor,
                roi_size=roi,
                out_channels=p["chans_out"],
                sw_batch=p.get("sw_batch_size", 2),
                overlap=overlap,
                blend=p.get("sw_blend", "constant"),
                sigma_scale=p.get("sw_sigma_scale", 0.125),
                compute_dtype=compute_dtype,
                patch_s2d=use_s2d_patches,
                s2d_logits=use_s2d_logits,
                bucket_multiple=int(p.get("sw_bucket_multiple", 32)),
            )
        return sliding_window_inference(
            jnp.asarray(volume),
            predictor,
            roi_size=roi,
            out_channels=p["chans_out"],
            sw_batch=p.get("sw_batch_size", 2),
            overlap=overlap,
            blend=p.get("sw_blend", "constant"),
            sigma_scale=p.get("sw_sigma_scale", 0.125),
            compute_dtype=compute_dtype,
            patch_s2d=use_s2d_patches,
            s2d_logits=use_s2d_logits,
            # patch_pad measured a LOSS on v5e (the padded patch stack
            # forces a 1.72 ms/volume relayout copy vs the 0.85 ms pad it
            # removes — profile_patch r4); capability kept + tested for
            # layouts where the stack pad is free
        )

    def _activate(self, logits: np.ndarray) -> np.ndarray:
        if self.params.get("softmax", True) and logits.shape[-1] > 1:
            return np.asarray(jax.nn.softmax(logits, axis=-1))
        if self.params.get("sigmoid", False):
            return np.asarray(jax.nn.sigmoid(logits))
        return np.asarray(logits)

    def _eval_finish_fn(self):
        """Jitted per-volume eval epilogue: (logits, label) -> (loss,
        uint8 binary prediction) — the loss and activation/threshold stay
        on device so the host fetches a scalar + a uint8 volume (16x less
        relay traffic than f32 logits)."""
        if getattr(self, "_eval_finish", None) is None:
            softmax = self.params.get("softmax", True)
            sigmoid = self.params.get("sigmoid", False)
            loss_fn = self.loss_fn

            def finish(logits, label):
                loss = loss_fn(logits[None], label[None])
                probs = logits.astype(jnp.float32)
                if softmax and logits.shape[-1] > 1:
                    probs = jax.nn.softmax(probs, axis=-1)
                elif sigmoid:
                    probs = jax.nn.sigmoid(probs)
                return loss, (probs > 0.5).astype(jnp.uint8)

            self._eval_finish = jax.jit(finish)
        return self._eval_finish

    def evaluate(self, loader, post_process=True, compute_lesion_level_metrics=False,
                 include_hd95=False, desc="validation"):
        """Per-subject sliding-window evaluation (train.py:184-234).

        STREAMED: volumes are dispatched ahead through a bounded in-flight
        queue (FCD_EVAL_QUEUE, default 4) and results fetched one volume
        behind, so the device never idles during the host's fetch
        round-trip + post-processing (the probe_host_gap lesson: a fetch
        through a remote runtime orders behind the execution queue, so the
        queue must hold more than one volume of work to cover it). Metric
        math is unchanged — every volume is fully computed and fetched.
        """
        from collections import deque

        total_loss, n = 0.0, 0
        all_preds: List[np.ndarray] = []
        all_labels: List[np.ndarray] = []
        fcd_idx = 0 if self.params["chans_out"] == 1 else 1
        finish = self._eval_finish_fn()
        window = max(int(_fcd_flags.get("FCD_EVAL_QUEUE")), 1)
        pending = deque()

        def drain():
            nonlocal total_loss, n
            loss_dev, bin_dev, label = pending.popleft()
            total_loss += float(loss_dev)
            n += 1
            binary = np.asarray(bin_dev).astype(np.float32)[None]
            if post_process:
                binary = post_process_prediction(binary, self.params["min_region_size"])
            all_preds.append(binary[0, ..., fcd_idx])
            all_labels.append(label[..., 0])

        for vol in loader:
            logits = self.inference(vol.image)
            loss_dev, bin_dev = finish(jnp.asarray(logits),
                                       jnp.asarray(vol.label))
            pending.append((loss_dev, bin_dev, vol.label))
            if len(pending) > window:
                drain()
        while pending:
            drain()

        metrics = calculate_voxel_level_metrics(
            all_preds, all_labels, compute_hd95=include_hd95,
        )
        if compute_lesion_level_metrics:
            metrics.update(calculate_lesion_wise_metrics(all_preds, all_labels))
        if self.verbose:
            for k, v in metrics.items():
                print(f"{k}: {v:.4f}", flush=True)
        return total_loss / max(n, 1), metrics

    def test(self, data_dir: str, test_subjects: Sequence[str], post_process=True):
        if not test_subjects:
            print("No test subjects provided, skipping testing.")
            return {}
        ds = FCDDataset(data_dir, self.params, test_subjects, verbose=self.verbose)
        loader = VolumeLoader(ds)
        _, metrics = self.evaluate(
            loader, post_process=post_process, compute_lesion_level_metrics=True,
            include_hd95=True,
            desc="test" + ("_postprocess" if post_process else ""),
        )
        print(",".join(metrics.keys()) + ",", flush=True)
        print(",".join(f"{v:.4f}" for v in metrics.values()) + ",", flush=True)
        return metrics

    # -- training --------------------------------------------------------------

    def validate(self, epoch: int, val_loader):
        avg_val_loss, metrics = self.evaluate(
            val_loader, post_process=False, compute_lesion_level_metrics=False,
            include_hd95=False, desc="validation",
        )
        new_best = False
        alpha = self.params.get("val_loss_ema_alpha", 0.7)
        if self.ema_val_loss is None:
            self.ema_val_loss = avg_val_loss
        else:
            self.ema_val_loss = (1 - alpha) * avg_val_loss + alpha * self.ema_val_loss

        if avg_val_loss < self.best_val_loss:
            self.best_val_loss = avg_val_loss
            self.best_val_loss_epoch = epoch + 1
            new_best = True
        if self.ema_val_loss < self.best_ema_val_loss:
            self.best_ema_val_loss = self.ema_val_loss
            self.best_ema_val_loss_epoch = epoch + 1
            self.early_stopping_counter = 0
        else:
            self.early_stopping_counter += 1

        if self.verbose:
            print(
                f"current epoch: {epoch + 1} validation loss: {avg_val_loss:.4f}, "
                f"ema_val_loss: {self.ema_val_loss:.4f}\n"
                f"best validation loss: {self.best_val_loss:.4f} at epoch: "
                f"{self.best_val_loss_epoch}",
                flush=True,
            )
        return new_best, metrics, avg_val_loss

    def log_metrics(self, epoch, train_loss, val_loss, ema_val_loss, val_metrics,
                    lr, elapsed_time, csv_path=None):
        values = {
            "epoch": epoch + 1,
            "train_loss": train_loss,
            "val_loss": val_loss if val_loss is not None else 0,
            "ema_val_loss": ema_val_loss if ema_val_loss is not None else 0,
            **({f"val_{k}": v for k, v in val_metrics.items()} if val_metrics else {}),
            "learning_rate": lr,
            "epoch_time": elapsed_time,
        }
        if self._log_norms:
            from fcd_tpu.train.state import group_norms

            for k, v in group_norms(self.state.params).items():
                values[f"pnorm_{k}"] = float(v)
            if self._last_grad_norms is not None:
                for k, v in self._last_grad_norms.items():
                    values[f"gnorm_{k}"] = float(v)
        if self.wandb is not None and getattr(self.wandb, "run", None) is not None:
            # wandb.watch() is torch-module-specific; the flax analogue of its
            # parameter tracking (train.py:336) is an explicit global param
            # norm logged per epoch
            leaves = jax.tree_util.tree_leaves(self.state.params)
            values = {**values, "param_global_norm": float(
                jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                             for l in leaves)))}
            self.wandb.log(values)
        if csv_path:
            if epoch == 0 or self.log_keys is None or not os.path.exists(csv_path):
                with open(csv_path, "w") as f:
                    f.write(",".join(values.keys()) + "\n")
                self.log_keys = list(values.keys())
            with open(csv_path, "a") as f:
                f.write(",".join(str(values.get(k, "")) for k in self.log_keys) + "\n")

    def train(self, data_dir: str, train_subjects, val_subjects, save_dir: str,
              test_subjects=(), resume: bool = False):
        if not train_subjects or not val_subjects:
            raise ValueError("Train and validation subject lists must be non-empty.")
        os.makedirs(save_dir, exist_ok=True)
        p = self.params

        train_ds = FCDDataset(data_dir, p, train_subjects, verbose=self.verbose)
        val_ds = FCDDataset(data_dir, p, val_subjects, verbose=self.verbose)
        train_loader = PatchLoader(train_ds, p, seed=p.get("seed", 42))
        val_loader = VolumeLoader(val_ds)

        latest_path = os.path.join(save_dir, self.latest_model_filename)
        best_path = os.path.join(save_dir, self.best_model_filename)
        log_path = os.path.join(save_dir, "training_log.csv")

        max_epochs = p.get("max_epochs", 300)
        min_epochs = p.get("min_epochs", 0)
        min_lr = p.get("min_lr", 1e-6)
        patience = p.get("early_stopping_patience", 25)

        self.init_stats()
        current_epoch = 0
        if resume and os.path.exists(latest_path):
            loaded = self.load_model(latest_path, with_optimizer=True)
            current_epoch = (loaded + 1) if loaded is not None else 0
            print(f"Loaded existing model weights from {latest_path}")

        if self.wandb is not None and os.environ.get("WANDB_MODE") != "offline":
            try:
                self.wandb.init(
                    project=p.get("wandb_project", "FCD"),
                    name=f"{p['model_type']}_{os.path.basename(save_dir)}",
                    config={**{k: str(v) for k, v in p.items()}, "optimizer": "AdamW"},
                )
            except Exception:
                self.wandb = None

        use_aug = bool(p.get("augment", True))
        self.train_start_time = time.time()
        for epoch in range(current_epoch, max_epochs):
            epoch_start = time.time()
            if self.verbose:
                print("-" * 10)
                print(f"epoch {epoch + 1}/{max_epochs}", flush=True)

            lr = epoch_lr(p, epoch)
            cd_prob, gm_prob = scheduled_probs(p, epoch)

            epoch_loss, step_count = 0.0, 0
            pending_loss = None
            n_steps = -(-len(train_ds) // max(p.get("batch_size", 1), 1))
            for images, labels in train_loader:
                self.rng, aug_key, step_key = jax.random.split(self.rng, 3)
                xb = jnp.asarray(images)
                yb = jnp.asarray(labels)
                if use_aug:
                    xb, yb = augment_batch(
                        xb, yb, aug_key,
                        jnp.float32(cd_prob), jnp.float32(gm_prob),
                    )
                step_args = ()
                if self.mesh is not None:
                    from fcd_tpu.parallel.mesh import shard_batch

                    n_dev = self.mesh.shape["data"]
                    if xb.shape[0] % n_dev == 0:
                        xb = shard_batch(self.mesh, xb)
                        yb = shard_batch(self.mesh, yb)
                        step = self.train_step
                    elif self.params.get("ragged_dp", "pad") == "replicate":
                        if step_count == 0 and epoch == current_epoch and self.verbose:
                            print(
                                f"global batch {xb.shape[0]} does not divide over "
                                f"the {n_dev}-device mesh; running replicated "
                                f"steps (ragged_dp=replicate)",
                                flush=True,
                            )
                        step = self._ragged_step
                    else:
                        # pad-and-mask: the step still shards over the mesh
                        n = xb.shape[0]
                        pad = -n % n_dev
                        idx = np.arange(n + pad) % n  # cyclic repeats
                        mask = (np.arange(n + pad) < n).astype(np.float32)
                        xb = shard_batch(self.mesh, jnp.take(xb, idx, axis=0))
                        yb = shard_batch(self.mesh, jnp.take(yb, idx, axis=0))
                        step = self._dp_mask_step
                        step_args = (None,
                                     shard_batch(self.mesh, jnp.asarray(mask)))
                else:
                    step = self.train_step
                out = step(self.state, xb, yb, lr, step_key, *step_args)
                if self._log_norms:
                    self.state, loss, self._last_grad_norms = out
                else:
                    self.state, loss = out
                # one-step-lagged loss fetch: float(prev) round-trips the
                # host while THIS step runs on device (a per-step sync
                # costs ~30-45 ms through a remote runtime; the reference
                # pays it via loss.item(), train.py:382)
                if pending_loss is not None:
                    epoch_loss += float(pending_loss)
                    step_count += 1
                    if self.verbose:
                        # live running-loss progress (train.py:363,392)
                        print(f"\r  {step_count}/{n_steps} "
                              f"loss: {epoch_loss / step_count:.4f}",
                              end="", flush=True)
                pending_loss = loss

            if pending_loss is not None:
                epoch_loss += float(pending_loss)
                step_count += 1
                if self.verbose:
                    print(f"\r  {step_count}/{n_steps} "
                          f"loss: {epoch_loss / step_count:.4f}",
                          end="", flush=True)
            if self.verbose and step_count:
                print(flush=True)
            epoch_loss /= max(step_count, 1)

            val_metrics, val_loss = {}, None
            stop_flag = False
            if (epoch + 1) % self.val_interval == 0:
                new_best, val_metrics, val_loss = self.validate(epoch, val_loader)
                if new_best:
                    self.save_model(best_path, epoch)
                    if self.verbose:
                        print("saved new best metric model", flush=True)
                stop_flag = epoch >= min_epochs and (
                    self.early_stopping_counter >= patience or lr <= min_lr
                )

            if p.get("keep_latest_model", False):
                self.save_model(latest_path, epoch)

            elapsed = time.time() - epoch_start
            self.log_metrics(epoch, epoch_loss, val_loss, self.ema_val_loss,
                             val_metrics, lr, elapsed, csv_path=log_path)

            if stop_flag:
                print(f"Early stopping triggered after {epoch + 1} epochs")
                break

        total = time.time() - self.train_start_time
        print(f"Training completed, total time: {total:.2f} seconds")

        if test_subjects:
            if os.path.exists(best_path):
                self.load_model(best_path, with_optimizer=False)
            self.test(data_dir, test_subjects, post_process=False)
            self.test(data_dir, test_subjects, post_process=True)

        if self.wandb is not None and getattr(self.wandb, "run", None) is not None:
            self.wandb.finish()
