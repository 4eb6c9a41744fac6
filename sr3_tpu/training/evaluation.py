"""Shared validation / inference loops over mesh-wide image groups.

TPU-first redesign of the reference's per-image validation loops
(reference sr.py:103-161 and :175-241, infer.py:46-101,
sample.py:100-162): instead of one Python-driven 2000-step chain per image
at batch 1, images are processed ``G`` at a time through one vmapped
compiled chain sharded over the mesh 'data' axis. Each image's entire
noise stream derives from ``fold_in(base_key, global_image_index)``, so
results are bit-for-bit independent of the grouping — batch-1 and batch-G
validation produce the same images, and per-image filenames/metrics are
preserved by splitting the group after ``device_get``.

All three SR drivers (in-train validation, full val phase, inference) and
the unconditional driver share these routines; only the per-image outputs
differ.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

import sr3_tpu.utils.metrics as Metrics
from sr3_tpu.parallel.mesh import batch_sharding, is_primary

logger = logging.getLogger("base")


def _put_global(xs, sharding):
    """Place a host batch that is IDENTICAL on every process onto the mesh,
    sharded over 'data'. Single-process: plain device_put. Multi-process:
    assemble the global array from each process's addressable slices of its
    full local copy (every host iterates the full val set — see
    DataLoader.shard_across_processes)."""
    if jax.process_count() == 1:
        return jax.device_put(xs, sharding)
    return jax.make_array_from_callback(
        xs.shape, sharding, lambda idx: xs[idx]
    )


def per_image(loader):
    """Flatten loader batches (any batch size) into per-image dicts of
    unbatched arrays."""
    for batch in loader:
        arrays = {
            k: np.asarray(jax.device_get(v))
            for k, v in batch.items()
            if getattr(v, "ndim", 0) > 1
        }
        others = {k: v for k, v in batch.items() if k not in arrays}
        b = next(iter(arrays.values())).shape[0]
        for j in range(b):
            item = {k: v[j] for k, v in arrays.items()}
            for k, v in others.items():
                item[k] = np.asarray(v)[j] if np.ndim(v) >= 1 else v
            yield item


class GroupedEvaluator:
    """Runs reverse-diffusion chains for a stream of images in fixed-size
    groups (padded to a multiple of the mesh data axis, one jit trace)."""

    def __init__(self, trainer, group_size=None, base_rng=None):
        self.trainer = trainer
        data_axis = trainer.mesh.shape["data"]
        g = int(group_size or 0)
        if g <= 0:
            g = data_axis
        # round up so every group shards evenly over 'data'
        self.group = ((g + data_axis - 1) // data_axis) * data_axis
        if base_rng is None:
            trainer.rng, base_rng = jax.random.split(trainer.rng)
        self.base_rng = base_rng

    def _keys(self, idx0):
        return jax.vmap(
            lambda i: jax.random.fold_in(self.base_rng, i)
        )(np.arange(idx0, idx0 + self.group))

    def run_sr(self, items, continous=False):
        """items: iterable of per-image dicts with 'SR' (the bicubic-up
        condition). Yields (item, sr_out) in order; sr_out is (h,w,c) or
        process frames (S,h,w,c) when ``continous``."""
        t = self.trainer
        sharding = batch_sharding(t.mesh)
        buf, idx0 = [], 0
        for item in items:
            buf.append(item)
            if len(buf) < self.group:
                continue
            yield from self._flush_sr(buf, idx0, sharding, continous)
            idx0 += self.group
            buf = []
        if buf:
            yield from self._flush_sr(buf, idx0, sharding, continous)

    def _flush_sr(self, buf, idx0, sharding, continous):
        pad = self.group - len(buf)
        xs = np.stack([it["SR"] for it in buf] + [buf[-1]["SR"]] * pad)
        xs = _put_global(xs, sharding)
        out = self.trainer.test_batched(xs, self._keys(idx0), continous)
        for j, it in enumerate(buf):
            yield it, out[j]

    def run_uncond(self, n, continous=False):
        """Yield n unconditional samples ((h,w,c) or (S,h,w,c) frames),
        generated in mesh-wide groups with per-sample keys."""
        done = 0
        while done < n:
            out = self.trainer.sample_batched(self._keys(done), continous)
            for j in range(min(self.group, n - done)):
                yield out[j]
            done += self.group


def _group_size(opt, n_items=None):
    """Optional framework extension: datasets.val.batch_size sets the
    validation group size (the reference pins val batch to 1,
    data/__init__.py:13-15). Default: min(8, n_items) — the v5e batch
    sweep (docs/PERFSCAN_r02.txt) shows sampling throughput saturates at
    batch 8 (a batch-8 chain costs ~3.5x a batch-1 chain but serves 8
    images), and capping at the item count avoids padding waste on tiny
    val sets. At output resolution >= 256 the default falls back to the
    mesh data-axis size (1 per chip): a batch-8 512^2 reverse chain holds
    ~8x the activation memory of the batch-1 chain the configs were sized
    for and risks HBM exhaustion. GroupedEvaluator rounds up to a
    mesh-data-axis multiple."""
    try:
        val_opt = opt["datasets"]["val"] or {}
    except (KeyError, TypeError):
        val_opt = {}
    g = val_opt.get("batch_size")
    if g:
        return g
    if int(val_opt.get("r_resolution") or 0) >= 256:
        return None  # -> mesh data-axis default
    return min(8, n_items) if n_items else 8


# --------------------------------------------------------------- SR drivers


def validate_in_train(diffusion, val_loader, opt, current_step, current_epoch,
                      tb_logger=None, wandb_logger=None):
    """In-training validation (reference sr.py:103-154): short-schedule SR
    over the val set, per-image hr/sr/lr/inf PNGs + TB/W&B panels, avg PSNR.
    Handles the train->val->train schedule switch."""
    result_path = os.path.join(opt["path"]["results"], str(current_epoch))
    if is_primary():
        os.makedirs(result_path, exist_ok=True)
    diffusion.set_new_noise_schedule(
        opt["model"]["beta_schedule"]["val"], schedule_phase="val"
    )

    ev = GroupedEvaluator(
        diffusion, _group_size(opt, len(val_loader.dataset))
    )
    avg_psnr, idx = 0.0, 0
    for item, sr in ev.run_sr(per_image(val_loader), continous=False):
        idx += 1
        sr_img = Metrics.tensor2img(sr)
        hr_img = Metrics.tensor2img(item["HR"])
        lr_img = Metrics.tensor2img(item["LR"])
        fake_img = Metrics.tensor2img(item["SR"])

        if is_primary():
            for img, tag in ((hr_img, "hr"), (sr_img, "sr"),
                             (lr_img, "lr"), (fake_img, "inf")):
                Metrics.save_img(
                    img, f"{result_path}/{current_step}_{idx}_{tag}.png"
                )
            panel = np.concatenate((fake_img, sr_img, hr_img), axis=1)
            if tb_logger:
                tb_logger.add_image(
                    f"Iter_{current_step}", np.transpose(panel, [2, 0, 1]),
                    idx
                )
            if wandb_logger:
                wandb_logger.log_image(f"validation_{idx}", panel)
        avg_psnr += Metrics.calculate_psnr(sr_img, hr_img)
    if idx == 0:
        # a misconfigured/empty val dir must not kill a training run
        # mid-flight with ZeroDivisionError — warn and carry on
        logger.warning(
            "Validation produced 0 images (empty val set at %s?) — "
            "skipping PSNR.", opt["datasets"]["val"].get("dataroot"),
        )
        diffusion.set_new_noise_schedule(
            opt["model"]["beta_schedule"]["train"], schedule_phase="train"
        )
        return float("nan")
    avg_psnr /= idx

    diffusion.set_new_noise_schedule(
        opt["model"]["beta_schedule"]["train"], schedule_phase="train"
    )
    logger.info("# Validation # PSNR: {:.4e}".format(avg_psnr))
    if is_primary():
        logging.getLogger("val").info(
            "<epoch:{:3d}, iter:{:8,d}> psnr: {:.4e}".format(
                current_epoch, current_step, avg_psnr
            )
        )
        if tb_logger:
            tb_logger.add_scalar("psnr", avg_psnr, current_step)
    return avg_psnr


def evaluate_sr(diffusion, val_loader, opt, current_step, current_epoch,
                wandb_logger=None):
    """Full SR evaluation (reference sr.py:175-241): full-schedule chains
    with process snapshots, per-image process-grid/sr/hr/lr/inf PNGs,
    avg PSNR + SSIM. Returns (avg_psnr, avg_ssim)."""
    result_path = opt["path"]["results"]
    os.makedirs(result_path, exist_ok=True)
    log_eval = bool(wandb_logger and opt["log_eval"])

    ev = GroupedEvaluator(
        diffusion, _group_size(opt, len(val_loader.dataset))
    )
    avg_psnr, avg_ssim, idx = 0.0, 0.0, 0
    for item, frames in ev.run_sr(per_image(val_loader), continous=True):
        idx += 1
        hr_img = Metrics.tensor2img(item["HR"])
        lr_img = Metrics.tensor2img(item["LR"])
        fake_img = Metrics.tensor2img(item["SR"])
        sr_img = Metrics.tensor2img(frames[-1])

        if is_primary():
            Metrics.save_img(
                Metrics.tensor2img(frames),
                f"{result_path}/{current_step}_{idx}_sr_process.png",
            )
            for img, tag in ((sr_img, "sr"), (hr_img, "hr"),
                             (lr_img, "lr"), (fake_img, "inf")):
                Metrics.save_img(
                    img, f"{result_path}/{current_step}_{idx}_{tag}.png"
                )

        eval_psnr = Metrics.calculate_psnr(sr_img, hr_img)
        eval_ssim = Metrics.calculate_ssim(sr_img, hr_img)
        avg_psnr += eval_psnr
        avg_ssim += eval_ssim
        if log_eval and is_primary():
            wandb_logger.log_eval_data(
                fake_img, sr_img, hr_img, eval_psnr, eval_ssim
            )

    if idx == 0:
        logger.warning(
            "Evaluation produced 0 images (empty val set at %s?).",
            opt["datasets"]["val"].get("dataroot"),
        )
        return float("nan"), float("nan")
    avg_psnr /= idx
    avg_ssim /= idx
    logger.info("# Validation # PSNR: {:.4e}".format(avg_psnr))
    logger.info("# Validation # SSIM: {:.4e}".format(avg_ssim))
    if is_primary():
        logging.getLogger("val").info(
            "<epoch:{:3d}, iter:{:8,d}> psnr: {:.4e}, ssim: {:.4e}".format(
                current_epoch, current_step, avg_psnr, avg_ssim
            )
        )
    if wandb_logger and is_primary():
        if log_eval:
            wandb_logger.log_eval_table()
        # final summary metrics (reference sr.py:238-241)
        wandb_logger.log_metrics({"PSNR": float(avg_psnr),
                                  "SSIM": float(avg_ssim)})
    return avg_psnr, avg_ssim


def infer_sr(diffusion, val_loader, opt, wandb_logger=None):
    """Inference over a prepared directory (reference infer.py:60-101):
    process-grid/sr/hr/inf PNGs per image, no LR, no metrics."""
    result_path = opt["path"]["results"]
    os.makedirs(result_path, exist_ok=True)
    log_infer = bool(wandb_logger and opt["log_infer"])

    ev = GroupedEvaluator(
        diffusion, _group_size(opt, len(val_loader.dataset))
    )
    idx = 0
    for item, frames in ev.run_sr(per_image(val_loader), continous=True):
        idx += 1
        hr_img = Metrics.tensor2img(item["HR"])
        fake_img = Metrics.tensor2img(item["SR"])
        sr_img = Metrics.tensor2img(frames[-1])

        if is_primary():
            Metrics.save_img(
                Metrics.tensor2img(frames),
                f"{result_path}/0_{idx}_sr_process.png"
            )
            Metrics.save_img(sr_img, f"{result_path}/0_{idx}_sr.png")
            Metrics.save_img(hr_img, f"{result_path}/0_{idx}_hr.png")
            Metrics.save_img(fake_img, f"{result_path}/0_{idx}_inf.png")

            if log_infer:
                wandb_logger.log_eval_data(fake_img, sr_img, hr_img)
    if log_infer and is_primary():
        wandb_logger.log_eval_table(commit=True)


# ------------------------------------------------------- unconditional


def sample_in_train(diffusion, sample_sum, opt, current_step, current_epoch,
                    wandb_logger=None):
    """In-training unconditional sampling (reference sample.py:100-128)."""
    result_path = os.path.join(opt["path"]["results"], str(current_epoch))
    os.makedirs(result_path, exist_ok=True)
    diffusion.set_new_noise_schedule(
        opt["model"]["beta_schedule"]["val"], schedule_phase="val"
    )
    ev = GroupedEvaluator(diffusion, _group_size(opt, sample_sum))
    for i, sample in enumerate(ev.run_uncond(sample_sum, continous=False)):
        if not is_primary():
            continue
        img = Metrics.tensor2img(sample)
        Metrics.save_img(
            img, f"{result_path}/{current_step}_{i + 1}_sample.png"
        )
        if wandb_logger:
            wandb_logger.log_image(f"sample_{i + 1}", img)
    diffusion.set_new_noise_schedule(
        opt["model"]["beta_schedule"]["train"], schedule_phase="train"
    )


def evaluate_uncond(diffusion, sample_sum, opt, current_step,
                    wandb_logger=None):
    """Unconditional eval phase (reference sample.py:132-162): process grid
    + final sample per draw."""
    result_path = opt["path"]["results"]
    os.makedirs(result_path, exist_ok=True)
    ev = GroupedEvaluator(diffusion, _group_size(opt, sample_sum))
    for i, frames in enumerate(ev.run_uncond(sample_sum, continous=True)):
        if not is_primary():
            continue
        final = Metrics.tensor2img(frames[-1])
        Metrics.save_img(
            Metrics.tensor2img(frames),
            f"{result_path}/{current_step}_{i + 1}_sample_process.png",
        )
        Metrics.save_img(
            final, f"{result_path}/{current_step}_{i + 1}_sample.png"
        )
        if wandb_logger:
            wandb_logger.log_image(f"sample_{i + 1}", final)
