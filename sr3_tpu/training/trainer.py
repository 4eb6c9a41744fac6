"""Trainer: optimizer, jitted train/eval steps, EMA, checkpointing.

The TPU-native counterpart of the reference's DDPM(BaseModel) wrapper
(model/model.py:12-166, model/base_model.py). Differences by design:

- train_step is a single donated jit: forward + grad + adam update happen in
  one compiled program; the batch is sharded over the mesh 'data' axis and
  XLA inserts the psum-mean of gradients (the reference used
  nn.DataParallel's replicate/scatter/gather each step).
- the optimizer is optax.adam (lr from config, reference model/model.py:39-40).
- `finetune_norm` freezes everything except params whose path contains
  'transformer' and zero-inits those, matching model/model.py:26-35.
- EMA of params is implemented (the reference parses `ema_scheduler` but
  never uses it — config/sr_sr3_16_128.json:87-91); enable with
  train.ema_scheduler.use_ema=true. Off by default for parity.
- checkpoints are orbax pytrees under `I{iter}_E{epoch}_gen` / `_opt`
  directories, mirroring the reference's naming (model/model.py:124-144) and
  resume-from-prefix semantics (:146-166).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct, traverse_util

from sr3_tpu.models.diffusion import GaussianDiffusion
from sr3_tpu.models.networks import count_params, define_G, init_params
from sr3_tpu.models.schedule import Schedule, make_schedule
from sr3_tpu.parallel.mesh import (create_mesh, host_fetch, is_primary,
                                    shard_batch)
from sr3_tpu.utils.profiler import StepTimer

logger = logging.getLogger("base")


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled
    step: jnp.ndarray  # int32 scalar


def _finetune_mask(params):
    """True (trainable) for params whose path mentions 'transformer'
    (reference model/model.py:26-35)."""
    flat = traverse_util.flatten_dict(params)
    mask = {
        k: any("transformer" in str(p).lower() for p in k) for k in flat
    }
    return traverse_util.unflatten_dict(mask)


class Trainer:
    """Owns the diffusion model, optimizer, schedules, and jit caches."""

    def __init__(self, opt, mesh=None):
        self.opt = opt
        if mesh is None:
            # optional config block:
            # "parallel": {"data": N, "model": M, "space": S}
            par = opt.get("parallel") or {}
            mesh = create_mesh(
                num_data=par.get("data"), num_model=par.get("model", 1) or 1,
                num_space=par.get("space", 1) or 1,
            )
        self.mesh = mesh
        spatial = self.mesh.shape.get("space", 1) > 1
        # Under spatial sharding a pallas_call would make GSPMD gather the
        # H-sharded activation, so the model is *constructed* with its
        # Pallas GN kernels off — scoped to this trainer's model, never a
        # process global (two coexisting trainers, e.g. a cascade's spatial
        # + non-spatial stages, keep independent lowering).
        self.diffusion: GaussianDiffusion = define_G(
            opt, pallas_gn=False if spatial else None
        )
        if spatial:
            # pin activations to H-sharded layout (parallel/spatial.py)
            from sr3_tpu.parallel.spatial import spatial_constraint

            self.diffusion.shard_activations = spatial_constraint(self.mesh)
        self.conditional = self.diffusion.conditional
        self.phase = opt.get("phase", "train")

        seed = opt.get("seed", 0) or 0
        self.rng = jax.random.PRNGKey(seed)
        self.rng, init_rng = jax.random.split(self.rng)
        params = init_params(self.diffusion, init_rng)

        # EMA config (reference parses this block but never uses it;
        # we activate only on explicit opt-in)
        ema_opt = (opt.get("train") or {}).get("ema_scheduler") or {}
        self.use_ema = bool(ema_opt.get("use_ema", False))
        self.ema_decay = float(ema_opt.get("ema_decay", 0.9999))
        self.step_start_ema = int(ema_opt.get("step_start_ema", 5000))

        # optimizer
        if self.phase == "train":
            opt_cfg = opt["train"]["optimizer"]
            lr = opt_cfg["lr"]
            # optional bf16 first moment: halves the Adam mu HBM traffic
            # (nu stays f32 — squared grads need the range)
            mu_dtype = (
                jnp.bfloat16 if opt_cfg.get("mu_dtype") == "bfloat16" else None
            )
            tx = optax.adam(lr, mu_dtype=mu_dtype)
            if opt["model"].get("finetune_norm"):
                mask = _finetune_mask(params)
                tx = optax.multi_transform(
                    {"train": optax.adam(lr, mu_dtype=mu_dtype),
                     "freeze": optax.set_to_zero()},
                    jax.tree_util.tree_map(
                        lambda m: "train" if m else "freeze", mask
                    ),
                )
                # zero-init the finetuned params (model/model.py:30-33)
                flatp = traverse_util.flatten_dict(params)
                flatm = traverse_util.flatten_dict(mask)
                for k, m in flatm.items():
                    if m:
                        flatp[k] = jnp.zeros_like(flatp[k])
                params = traverse_util.unflatten_dict(flatp)
            self.tx = tx
            opt_state = tx.init(params)
        else:
            self.tx = None
            opt_state = ()

        # independent copy: donation must not see the same buffer twice
        ema_params = (
            jax.tree_util.tree_map(jnp.array, params) if self.use_ema else None
        )
        self.state = TrainState(
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            step=jnp.int32(0),
        )
        # place state on the mesh: replicated on 'data'; tensor-parallel
        # channel sharding on 'model' when that axis is >1
        from sr3_tpu.parallel.sharding_rules import shard_state

        self.state = shard_state(self.state, self.mesh)

        self.schedules: Dict[str, Schedule] = {}
        self.schedule_phase = None
        self.sched: Optional[Schedule] = None

        self.log_dict = {}
        self.data = None
        self.output = None
        self.timer = StepTimer()

        self._train_step_fn = None
        self._sample_cache = {}

        self.begin_step = 0
        self.begin_epoch = 0
        self.load_network()

    # ------------------------------------------------------------- schedules

    def set_new_noise_schedule(self, schedule_opt, schedule_phase="train"):
        """Switch the active Schedule (reference model/model.py:80-93)."""
        if self.schedule_phase != schedule_phase:
            self.schedule_phase = schedule_phase
            key = repr(sorted(dict(schedule_opt).items()))
            if key not in self.schedules:
                self.schedules[key] = make_schedule(schedule_opt)
            self.sched = self.schedules[key]
            # a phase switch means validation/sampling interleaved: don't let
            # that wall time pollute the train step-time EMA
            self.timer._last = None

    # ------------------------------------------------------------------ data

    def feed_data(self, data):
        """Host batch (numpy NHWC dict) -> device, sharded on 'data'
        (reference model/model.py:45-46)."""
        arrays = {
            k: v for k, v in data.items() if isinstance(v, np.ndarray) and v.ndim > 1
        }
        self.data = {**data, **shard_batch(arrays, self.mesh)}

    # ------------------------------------------------------------- training

    def _build_train_step(self):
        diffusion = self.diffusion
        tx = self.tx
        use_ema = self.use_ema
        ema_decay = self.ema_decay
        step_start_ema = self.step_start_ema

        def train_step(state: TrainState, sched, batch, base_rng):
            # derive the step key on-device from the step counter: no host
            # RNG op (and its tunnel round-trip) per step
            rng = jax.random.fold_in(base_rng, state.step)

            def loss_fn(p):
                return diffusion.p_losses(p, sched, batch, rng, train=True)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if use_ema:
                ema = jax.tree_util.tree_map(
                    lambda e, q: ema_decay * e + (1 - ema_decay) * q,
                    state.ema_params,
                    params,
                )
                ema = jax.lax.cond(
                    state.step >= step_start_ema,
                    lambda _: ema,
                    lambda _: params,
                    None,
                )
            else:
                ema = state.ema_params
            return (
                TrainState(
                    params=params,
                    opt_state=opt_state,
                    ema_params=ema,
                    step=state.step + 1,
                ),
                loss,
            )

        return jax.jit(train_step, donate_argnums=(0,))

    def _train_batch(self, data):
        batch = {k: data[k] for k in ("HR", "SR") if k in data}
        if not self.conditional:
            batch = {"HR": data["HR"]}
        return batch

    def optimize_parameters(self):
        """One training step (reference model/model.py:48-58)."""
        if self._train_step_fn is None:
            self._train_step_fn = self._build_train_step()
            self.rng, self._train_base_rng = jax.random.split(self.rng)
        batch = self._train_batch(self.data)
        self.state, loss = self._train_step_fn(
            self.state, self.sched, batch, self._train_base_rng
        )
        # keep the device array: forcing float() here would sync every step;
        # get_current_log materializes it only when a log line is printed
        self.log_dict["l_pix"] = loss
        self.timer.tick()

    def optimize_parameters_multi(self, batch_list):
        """K fused training steps in ONE compiled dispatch (lax.scan over a
        stacked super-batch) — removes the per-step host dispatch overhead
        entirely; a TPU pattern with no reference counterpart. Batches must
        share shapes. Updates l_pix with the last step's loss."""
        if self._train_step_fn is None:
            self._train_step_fn = self._build_train_step()
            self.rng, self._train_base_rng = jax.random.split(self.rng)
        k = len(batch_list)
        if k == 1:
            self.data = batch_list[0]
            return self.optimize_parameters()

        key = ("multi", k)
        if key not in self._sample_cache:
            step_fn = self._train_step_fn

            def multi(state, sched, stacked, base_rng):
                def body(s, b):
                    s, loss = step_fn(s, sched, b, base_rng)
                    return s, loss

                state, losses = jax.lax.scan(body, state, stacked)
                return state, losses[-1]

            self._sample_cache[key] = jax.jit(multi, donate_argnums=(0,))

        stacked = {}
        first = self._train_batch(batch_list[0])
        for name in first:
            stacked[name] = jnp.stack(
                [self._train_batch(b)[name] for b in batch_list]
            )
        self.state, loss = self._sample_cache[key](
            self.state, self.sched, stacked, self._train_base_rng
        )
        self.log_dict["l_pix"] = loss
        self.timer.tick(k)

    # --------------------------------------------- device-resident training

    def load_device_dataset(self, dataset):
        """Upload the whole train set to the mesh once, as uint8
        (decoded but not normalized — 4x smaller than f32).

        TPU-first data path with no reference counterpart: on this class of
        workload the full dataset fits HBM (FFHQ 16->128: 50k HR+SR pairs
        ~= 4.9GB uint8), so per-step host->device transfers and dispatch
        RPCs — which dominate the step time on a tunneled chip — are
        replaced by on-device batch sampling inside the compiled step.
        Normalization and the joint horizontal flip happen on-device
        (augmentation randomness is drawn from the step key, so resumes
        reproduce the same stream)."""
        from sr3_tpu.parallel.mesh import replicated_sharding

        items = [dataset._decoded(i) for i in range(len(dataset))]
        keys = [k for k in ("HR", "SR") if k in items[0]]
        if not self.conditional:
            keys = ["HR"]
        stacked = {
            k: np.stack([it[k] for it in items]) for k in keys
        }
        sharding = replicated_sharding(self.mesh)
        self._dev_data = {
            k: jax.device_put(v, sharding) for k, v in stacked.items()
        }
        self._dev_min_max = getattr(dataset, "min_max", (-1, 1))
        self._resident_batch = None
        logger.info(
            "Device-resident dataset: %d samples, %.1f MB uint8 on-chip",
            len(dataset),
            sum(v.nbytes for v in stacked.values()) / 1e6,
        )

    def _build_resident_steps(self, batch_size, k_steps):
        """K fused optimizer steps in one dispatch, sampling each batch from
        the device-resident dataset inside the scan."""
        diffusion = self.diffusion
        tx = self.tx
        use_ema = self.use_ema
        ema_decay = self.ema_decay
        step_start_ema = self.step_start_ema
        lo, hi = self._dev_min_max
        n = next(iter(self._dev_data.values())).shape[0]
        from sr3_tpu.parallel.mesh import batch_sharding

        data_sharding = batch_sharding(self.mesh)

        def sample_batch(key, data):
            kidx, kflip = jax.random.split(key)
            if batch_size <= n <= 4096:
                # exact without-replacement draw per step (== an epoch
                # permutation slice); randint for large sets or when the
                # batch exceeds the dataset (sampling with replacement)
                idx = jax.random.permutation(kidx, n)[:batch_size]
            else:
                idx = jax.random.randint(kidx, (batch_size,), 0, n)
            flip = jax.random.bernoulli(kflip, 0.5, (batch_size,))

            def prep(x):
                x = x[idx].astype(jnp.float32) / 255.0 * (hi - lo) + lo
                x = jnp.where(
                    flip[:, None, None, None], x[:, :, ::-1, :], x
                )
                # the dataset is replicated; without this constraint every
                # device would materialize (and train on) the full batch —
                # shard it over 'data' so the step stays data-parallel
                return jax.lax.with_sharding_constraint(x, data_sharding)

            return {k: prep(v) for k, v in data.items()}

        def one_step(state: TrainState, sched, data, base_rng):
            rng = jax.random.fold_in(base_rng, state.step)
            k_batch, k_loss = jax.random.split(rng)
            batch = sample_batch(k_batch, data)

            loss, grads = jax.value_and_grad(
                lambda p: diffusion.p_losses(p, sched, batch, k_loss,
                                             train=True)
            )(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            if use_ema:
                ema = jax.tree_util.tree_map(
                    lambda e, q: ema_decay * e + (1 - ema_decay) * q,
                    state.ema_params, params,
                )
                ema = jax.lax.cond(
                    state.step >= step_start_ema,
                    lambda _: ema, lambda _: params, None,
                )
            else:
                ema = state.ema_params
            return TrainState(params=params, opt_state=opt_state,
                              ema_params=ema, step=state.step + 1), loss

        def k_fused(state, sched, data, base_rng):
            def body(s, _):
                s, loss = one_step(s, sched, data, base_rng)
                return s, loss

            state, losses = jax.lax.scan(
                body, state, None, length=k_steps
            )
            return state, losses[-1]

        return jax.jit(k_fused, donate_argnums=(0,))

    def optimize_parameters_resident(self, batch_size, k_steps=1):
        """Run k_steps optimizer steps in one dispatch over the
        device-resident dataset (call load_device_dataset first)."""
        data_axis = self.mesh.shape["data"]
        if batch_size % data_axis:
            # fail here with a clear message instead of at trace time with
            # an opaque GSPMD sharding error
            raise ValueError(
                f"device-resident training requires batch_size divisible by "
                f"the mesh 'data' axis: batch_size={batch_size}, "
                f"data axis={data_axis}. Pick a multiple of {data_axis} "
                "(the host-loader path instead falls back to replication "
                "for indivisible batches)."
            )
        if batch_size % 8 and jax.default_backend() == "tpu" \
                and not getattr(self, "_warned_batch_tile", False):
            self._warned_batch_tile = True
            logger.warning(
                "batch_size %d is not a multiple of the TPU sublane tile "
                "(8): measured on v5e, batch 6 trains ~1.5x SLOWER than "
                "batch 8 (56 vs 36 ms/step on the 16->128 model). Use a "
                "multiple of 8.", batch_size,
            )
        key = ("resident", batch_size, k_steps)
        if key not in self._sample_cache:
            self._sample_cache[key] = self._build_resident_steps(
                batch_size, k_steps
            )
        if getattr(self, "_train_base_rng", None) is None:
            self.rng, self._train_base_rng = jax.random.split(self.rng)
        self._resident_batch = batch_size
        self.state, loss = self._sample_cache[key](
            self.state, self.sched, self._dev_data, self._train_base_rng
        )
        self.log_dict["l_pix"] = loss
        self.timer.tick(k_steps)

    # ------------------------------------------------------------- inference

    def _eval_params(self):
        params = self.state.ema_params if self.use_ema else self.state.params
        # Pre-cast matrix/conv params to the bf16 compute dtype once, OUTSIDE
        # the sampling scan: every op casts f32->bf16 before its matmul
        # anyway, so results are bitwise identical — but the per-chain-step
        # HBM read of the params halves (~390 -> ~195 MB for the 97.8M
        # model). 1-D params (GN scale/bias) are consumed in f32 math and
        # keep full precision.
        cdtype = self.diffusion.denoise_fn.dtype
        if cdtype == jnp.bfloat16:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p,
                params,
            )
        return params

    def _chain_fn(self, continuous):
        """(params, sched, x_or_shape, key) -> reverse-chain output, per the
        configured sampler. Sampler selection from config (beyond the
        reference): set model.diffusion.sampler="ddim" (+ ddim_steps / eta)
        for the strided deterministic DDIM chain, or "dpm++" (+ sampler_steps,
        default 25) for the second-order DPM-Solver++(2M) chain — ~2-4x fewer
        steps than DDIM at matched quality."""
        diff_opt = (self.opt.get("model") or {}).get("diffusion") or {}
        sampler = diff_opt.get("sampler") or "ddpm"
        ddim_steps = int(
            diff_opt.get("sampler_steps") or diff_opt.get("ddim_steps")
            or (25 if sampler in ("dpm++", "dpmpp") else 50)
        )
        eta = float(diff_opt.get("eta") or 0.0)
        diffusion = self.diffusion
        if sampler in ("dpm++", "dpmpp"):
            chain = lambda p, sched, x_or_shape, k: (
                diffusion.dpmpp_sample_loop(
                    p, sched, x_or_shape, k,
                    n_steps=ddim_steps, eta=eta, continuous=continuous,
                )
            )
        elif sampler == "ddim":
            chain = lambda p, sched, x_or_shape, k: (
                diffusion.ddim_sample_loop(
                    p, sched, x_or_shape, k,
                    n_steps=ddim_steps, eta=eta, continuous=continuous,
                )
            )
        else:
            chain = lambda p, sched, x_or_shape, k: (
                diffusion.p_sample_loop(
                    p, sched, x_or_shape, k, continuous=continuous
                )
            )
        return chain, (sampler, ddim_steps, eta)

    def _sampler(self, kind, shape, continuous):
        """jit-per-(T, shape, continuous) cache of the reverse chain."""
        chain, chain_key = self._chain_fn(continuous)
        key = (kind, *chain_key, self.sched.num_timesteps, shape, continuous)
        if key not in self._sample_cache:
            if kind == "sr":
                jfn = jax.jit(chain)
            else:
                shp = tuple(shape)
                jfn = jax.jit(lambda p, sched, k: chain(p, sched, shp, k))
            self._sample_cache[key] = jfn
        return self._sample_cache[key]

    def _vmapped_sampler(self, kind, shape, continuous):
        """Per-image-keyed batched chain: vmap of the single-image sampler
        over (image, key) lanes. Image j's entire noise stream comes from
        keys[j] alone, so outputs are invariant to how images are grouped
        into batches — batch-1 and batch-G validation produce identical
        images (tested). ``shape`` is the single-image (1,h,w,c)."""
        chain, chain_key = self._chain_fn(continuous)
        key = ("v" + kind, *chain_key,
               self.sched.num_timesteps, shape, continuous)
        if key not in self._sample_cache:
            if kind == "sr":
                def one(p, sched, x, k):
                    out = chain(p, sched, x[None], k)
                    return out if continuous else out[0]

                jfn = jax.jit(jax.vmap(one, in_axes=(None, None, 0, 0)))
            else:
                shp = tuple(shape)

                def one(p, sched, k):
                    out = chain(p, sched, shp, k)
                    return out if continuous else out[0]

                jfn = jax.jit(jax.vmap(one, in_axes=(None, None, 0)))
            self._sample_cache[key] = jfn
        return self._sample_cache[key]

    def test_batched(self, xs, keys, continous=False):
        """Conditional SR over a group of images with per-image noise keys.

        xs: (G,h,w,c) condition images; keys: (G,) PRNGKeys stacked as a
        (G,2)/(G,4) uint32 array. Returns numpy (G,h,w,c), or (G,S,h,w,c)
        process frames when ``continous``. The TPU-first replacement for the
        reference's one-image-at-a-time val loop (reference sr.py:112-137):
        one vmapped lax.scan drives all G chains, sharded over the mesh
        'data' axis."""
        fn = self._vmapped_sampler(
            "sr", (1,) + tuple(xs.shape[1:]), bool(continous)
        )
        return host_fetch(
            fn(self._eval_params(), self.sched, xs, keys)
        )

    def sample_batched(self, keys, continous=False):
        """Unconditional generation with per-image noise keys; see
        test_batched."""
        shape = (1, self.diffusion.image_size, self.diffusion.image_size,
                 self.diffusion.channels)
        fn = self._vmapped_sampler("uncond", shape, bool(continous))
        return host_fetch(fn(self._eval_params(), self.sched, keys))

    def test(self, continous=False):
        """Conditional SR over the fed batch (reference model/model.py:60-70).
        (Keeps the reference's 'continous' spelling in driver-facing args.)"""
        x = self.data["SR"]
        fn = self._sampler("sr", tuple(x.shape), bool(continous))
        self.rng, k = jax.random.split(self.rng)
        self.output = host_fetch(
            fn(self._eval_params(), self.sched, x, k)
        )

    def sample(self, batch_size=1, continous=False):
        """Unconditional generation (reference model/model.py:71-78)."""
        shape = (
            batch_size,
            self.diffusion.image_size,
            self.diffusion.image_size,
            self.diffusion.channels,
        )
        fn = self._sampler("uncond", shape, bool(continous))
        self.rng, k = jax.random.split(self.rng)
        self.output = host_fetch(fn(self._eval_params(), self.sched, k))

    # ------------------------------------------------------- logs & visuals

    def get_current_log(self):
        logs = {k: float(v) for k, v in self.log_dict.items()}
        if self.data is not None:
            batch = self.data["HR"].shape[0]
        else:
            batch = getattr(self, "_resident_batch", None)
        logs.update(self.timer.stats(batch))
        return logs

    def get_current_visuals(self, need_LR=True, sample=False):
        """Numpy NHWC float dict (reference model/model.py:98-110)."""
        out = {}
        if sample:
            out["SAM"] = self.output
        else:
            out["SR"] = self.output
            out["INF"] = host_fetch(self.data["SR"])
            out["HR"] = host_fetch(self.data["HR"])
            if need_LR and "LR" in self.data:
                out["LR"] = host_fetch(self.data["LR"])
        return out

    def print_network(self):
        """Log the param count AND the full network description, like the
        reference (model/model.py:112-122 logs `str(network)` after the
        summary line). The flax analog of torch's module repr is a
        per-module dump of every parameter path with shape/size."""
        n = count_params(self.state.params)
        logger.info(
            "Network G structure: UNet(cond_mode=%s), with parameters: %s",
            self.diffusion.cond_mode,
            "{:,d}".format(n),
        )
        flat = traverse_util.flatten_dict(
            host_fetch(self.state.params).get("params", {})
        )
        lines = [
            "UNet(cond_mode={}, in_channel={}, inner_channel={}, "
            "channel_mults={}, attn_res={}, res_blocks={})".format(
                self.diffusion.cond_mode,
                self.diffusion.denoise_fn.in_channel,
                self.diffusion.denoise_fn.inner_channel,
                tuple(self.diffusion.denoise_fn.channel_mults),
                tuple(self.diffusion.denoise_fn.attn_res),
                self.diffusion.denoise_fn.res_blocks,
            )
        ]
        for path, leaf in sorted(flat.items()):
            lines.append(
                "  {}: {} [{:,d}]".format(
                    ".".join(map(str, path)), tuple(leaf.shape), leaf.size
                )
            )
        logger.info("\n".join(lines))

    # ---------------------------------------------------------- checkpoints

    def _ckpt(self):
        """Async checkpointer: writes overlap training (the reference blocks
        on torch.save each time). wait() is called before the next save and
        at shutdown."""
        if getattr(self, "_ckptr", None) is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        return self._ckptr

    def save_network(self, epoch, iter_step):
        """Two artifacts per save, mirroring reference naming
        (model/model.py:124-144).

        Multi-host: collective — every process must call this together.
        The state is gathered to every host (host_fetch's process_allgather
        covers tensor-parallel-sharded leaves too), then every process
        calls the orbax save: orbax's own multiprocess protocol writes
        host-local (numpy) trees from the primary host only and runs
        internal barriers that REQUIRE all processes to participate — a
        process-0-only save deadlocks on the '_Checkpointer:save_start'
        sync. The durability barrier lives in wait_for_checkpoints()."""
        ckpt_dir = self.opt["path"]["checkpoint"]
        gen_path = os.path.abspath(
            os.path.join(ckpt_dir, f"I{iter_step}_E{epoch}_gen")
        )
        opt_path = os.path.abspath(
            os.path.join(ckpt_dir, f"I{iter_step}_E{epoch}_opt")
        )
        state = host_fetch(self.state)
        ckptr = self._ckpt()
        ckptr.wait_until_finished()  # previous save, if still in flight
        gen = {"params": state.params}
        if self.use_ema:
            gen["ema_params"] = state.ema_params
        ckptr.save(gen_path, gen, force=True)
        ckptr.wait_until_finished()  # one in-flight save at a time
        ckptr.save(
            opt_path,
            {
                "epoch": epoch,
                "iter": iter_step,
                "opt_state": state.opt_state,
            },
            force=True,
        )
        if is_primary():
            logger.info("Saved model in [%s] ...", gen_path)

    def wait_for_checkpoints(self):
        """Block until in-flight async checkpoint writes are durable.

        Multi-host: collective. Every process drains its (shared) orbax
        writer, then all processes rendezvous, so no process can race
        ahead and resume from a checkpoint that is not yet on disk."""
        if getattr(self, "_ckptr", None) is not None:
            self._ckptr.wait_until_finished()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("sr3_ckpt_durable")

    def load_network(self):
        """Resume from `path.resume_state` prefix (reference
        model/model.py:146-166): loads `{prefix}_gen`, and in train phase
        also `{prefix}_opt` with step/epoch counters."""
        load_path = (self.opt.get("path") or {}).get("resume_state")
        if not load_path:
            return
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        gen_path = os.path.abspath("{}_gen".format(load_path))
        logger.info("Loading pretrained model for G [%s] ...", load_path)
        gen = ckptr.restore(gen_path)
        params = gen["params"]
        ema = gen.get("ema_params") if self.use_ema else None
        state = self.state
        self.state = TrainState(
            params=params,
            opt_state=state.opt_state,
            ema_params=ema if ema is not None else (
                params if self.use_ema else None
            ),
            step=state.step,
        )
        if self.phase == "train":
            opt_path = os.path.abspath("{}_opt".format(load_path))
            if os.path.exists(opt_path):
                # restore against a concrete target so pytree node types
                # survive: a bare restore() returns plain lists/dicts and the
                # first tx.update() after resume would crash on a
                # ScaleByAdamState that came back as a dict. The template
                # only contributes STRUCTURE (node types, shapes, dtypes), so
                # build it from host-side zeros instead of device_get-ing
                # ~0.8 GB of freshly-initialized moments we are about to
                # overwrite — the fetch was pure waste and wedged the axon
                # tunnel deterministically on resume
                template = {
                    "epoch": 0,
                    "iter": 0,
                    "opt_state": jax.tree_util.tree_map(
                        lambda x: np.zeros(x.shape, x.dtype),
                        self.state.opt_state,
                    ),
                }
                restored = ckptr.restore(opt_path, item=template)
                self.begin_step = int(restored["iter"])
                self.begin_epoch = int(restored["epoch"])
                self.state = TrainState(
                    params=self.state.params,
                    opt_state=restored["opt_state"],
                    ema_params=self.state.ema_params,
                    step=jnp.int32(self.begin_step),
                )
        from sr3_tpu.parallel.sharding_rules import shard_state

        self.state = shard_state(self.state, self.mesh)


def create_model(opt, mesh=None) -> Trainer:
    """Factory (reference model/__init__.py:5-9)."""
    m = Trainer(opt, mesh=mesh)
    logger.info("Model [%s] is created.", m.__class__.__name__)
    return m
