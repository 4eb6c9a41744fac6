"""Training-loop engine shared by the SR and unconditional drivers.

One implementation of the epoch/iteration skeleton the reference duplicates
across sr.py:81-173 and sample.py:72-148: cadenced print/TB/W&B logging,
validation callback, checkpointing, and the fused multi-step dispatch
(train.steps_per_dispatch, a TPU addition — K optimizer steps per host
dispatch through one compiled lax.scan).

The final chunk is dispatched even when n_iter is not a multiple of
steps_per_dispatch (a smaller trailing dispatch), so exactly n_iter
optimizer steps run.
"""

from __future__ import annotations

import logging
import math
import signal

from sr3_tpu.data.prefetch import device_prefetch

logger = logging.getLogger("base")


def log_train_step(diffusion, current_epoch, current_step,
                   tb_logger=None, wandb_logger=None, nan_guard="raise"):
    """Print/TB/W&B the current training log dict
    (reference sr.py:90-100).

    Divergence guard (beyond reference — it trains on through NaN): a
    non-finite loss poisons the Adam moments and never recovers, so by
    default the loop fails fast here instead of burning the rest of the
    run. The check costs nothing extra: it reads the same materialized
    log dict the print cadence already fetched (loss stays on-device
    between print points). ``train.nan_guard``: "raise" (default),
    "warn", or "off"."""
    logs = diffusion.get_current_log()
    l_pix = logs.get("l_pix")
    if (
        nan_guard != "off"
        and l_pix is not None
        and not math.isfinite(l_pix)
    ):
        msg = (
            "non-finite training loss l_pix={} at iter {:,d} (epoch {}) — "
            "the optimizer state is likely poisoned; resume from the last "
            "checkpoint with a lower lr / different seed. Set "
            "train.nan_guard to \"warn\" or \"off\" to continue anyway."
        ).format(l_pix, current_step, current_epoch)
        if nan_guard == "warn":
            logger.error(msg)
        else:
            raise FloatingPointError(msg)
    message = "<epoch:{:3d}, iter:{:8,d}> ".format(current_epoch, current_step)
    for k, v in logs.items():
        message += "{:s}: {:.4e} ".format(k, v)
        if tb_logger:
            tb_logger.add_scalar(k, v, current_step)
    logger.info(message)
    if wandb_logger:
        wandb_logger.log_metrics(logs)


class _PreemptionWatch:
    """Graceful-preemption hook (beyond reference): TPU pods are commonly
    preemptible, and GCE delivers SIGTERM ~30 s before eviction. The watch
    records the signal (handlers must be async-safe, so no checkpointing
    here) and the train loop saves a checkpoint + drains the async
    checkpointer at the next step boundary instead of dying mid-run with
    up to save_checkpoint_freq steps of lost work. No-op outside the main
    thread (signal.signal raises there) or when ``enabled`` is False."""

    def __init__(self, enabled=True):
        self.signum = None
        self._installed = []
        if not enabled:
            return
        try:
            for sig in (signal.SIGTERM,):
                prev = signal.signal(sig, self._handler)
                self._installed.append((sig, prev))
        except ValueError:  # not the main thread
            self._installed = []

    def _handler(self, signum, frame):
        self.signum = signum

    def fired(self):
        return self.signum is not None

    def restore(self):
        for sig, prev in self._installed:
            signal.signal(sig, prev)
        self._installed = []


def train_loop(diffusion, train_loader, opt, on_validate,
               tb_logger=None, wandb_logger=None):
    """Run the training phase to n_iter optimizer steps.

    ``on_validate(current_step, current_epoch)`` runs every
    train.val_freq steps; schedule switching is the callee's concern
    (the evaluation routines handle it).
    """
    current_step = diffusion.begin_step
    current_epoch = diffusion.begin_epoch
    n_iter = opt["train"]["n_iter"]
    spd = int(opt["train"]["steps_per_dispatch"] or 1)
    nan_guard = opt["train"].get("nan_guard") or "raise"
    watch = _PreemptionWatch(
        enabled=(opt["train"].get("preempt_checkpoint") or "on") != "off"
    )
    log_wandb_ckpt = bool(wandb_logger and opt["log_wandb_ckpt"])

    def preempted():
        if not watch.fired():
            return False
        logger.warning(
            "SIGTERM received (preemption?) — checkpointing at iter %s "
            "and stopping.", "{:,d}".format(current_step),
        )
        diffusion.save_network(current_epoch, current_step)
        diffusion.wait_for_checkpoints()
        logger.info("Preemption checkpoint complete.")
        return True

    try:
        device_data = bool(
            ((opt.get("datasets") or {}).get("train") or {}).get("device_data")
        )
        # the device-resident path samples batches on-device WITH replacement
        # (trainer.optimize_parameters_resident), so batch_size > dataset is
        # legal there; only the host loader spins forever on zero batches
        if not device_data and len(train_loader) == 0:
            raise ValueError(
                "train loader yields zero batches: dataset has "
                f"{len(train_loader.dataset)} samples but batch_size="
                f"{train_loader.batch_size} with drop_last — lower the batch "
                "size or add data (the loop would otherwise spin forever)"
            )

        def cadences(prev_step):
            # Threshold-crossing logic: fire when the step counter CROSSES a
            # multiple of the freq, not only when it lands exactly on one.
            # With steps_per_dispatch > 1 the counter advances in jumps of spd,
            # so `current_step % freq == 0` would silently skip any freq that
            # spd does not divide (e.g. spd=16, val_freq=10 -> never validates
            # at 10, 30, 50...). The reference fires every step (sr.py:90-103)
            # so exact-landing and crossing are equivalent there; under fused
            # dispatch only crossing preserves the cadence contract.
            def crossed(freq):
                return current_step // freq > prev_step // freq

            if crossed(opt["train"]["print_freq"]):
                log_train_step(diffusion, current_epoch, current_step,
                               tb_logger, wandb_logger, nan_guard=nan_guard)
            if crossed(opt["train"]["val_freq"]):
                on_validate(current_step, current_epoch)
            if crossed(opt["train"]["save_checkpoint_freq"]):
                logger.info("Saving models and training states.")
                diffusion.save_network(current_epoch, current_step)
                if log_wandb_ckpt:
                    wandb_logger.log_checkpoint(current_epoch, current_step)

        if device_data:
            # device-resident path: the whole train set lives on the mesh as
            # uint8; each dispatch runs spd fused optimizer steps that sample,
            # normalize, and augment batches on-device (trainer.py). No host
            # loader in the loop at all.
            diffusion.load_device_dataset(train_loader.dataset)
            batch_size = train_loader.batch_size
            n = len(train_loader.dataset)
            while current_step < n_iter:
                k = min(spd, n_iter - current_step)
                diffusion.optimize_parameters_resident(batch_size, k)
                prev_step = current_step
                current_step += k
                current_epoch = 1 + current_step * batch_size // max(n, 1)
                cadences(prev_step)
                if preempted():
                    break
            diffusion.wait_for_checkpoints()
            logger.info("End of training.")
            return

        def epochs():
            """Infinite (epoch-tagged) batch stream. One continuous stream keeps
            the device-prefetch pipeline warm across epoch boundaries — with
            small datasets (epoch == a few batches) tearing the pipeline down
            per epoch dominated the step time. Each batch is tagged with its
            epoch BEFORE prefetch so the label stays exact under lookahead."""
            epoch = current_epoch
            while True:
                epoch += 1
                for b in train_loader:
                    yield {**b, "_epoch": epoch}

        # epoch metric is logged CONSUMER-side when the trained-on epoch
        # advances (the generator runs ahead of training by the prefetch
        # lookahead, so logging there would stamp epochs up to 2 batches
        # early and drop the final partial epoch)
        chunk = []
        for train_data in device_prefetch(epochs(), diffusion.mesh):
            if current_step >= n_iter:
                break
            if wandb_logger and train_data["_epoch"] > current_epoch > 0:
                wandb_logger.log_metrics({"epoch": current_epoch})
            current_epoch = train_data.pop("_epoch")
            chunk.append(train_data)
            # accumulate until the dispatch is full, or n_iter is reached
            # (the trailing partial chunk still runs)
            if len(chunk) < spd and current_step + len(chunk) < n_iter:
                continue
            if len(chunk) == 1:
                diffusion.feed_data(chunk[0])
                diffusion.optimize_parameters()
            else:
                diffusion.optimize_parameters_multi(chunk)
                diffusion.feed_data(chunk[-1])
            prev_step = current_step
            current_step += len(chunk)
            chunk = []
            cadences(prev_step)
            if preempted():
                break

        if wandb_logger and current_epoch > 0:
            wandb_logger.log_metrics({"epoch": current_epoch})
        diffusion.wait_for_checkpoints()
        logger.info("End of training.")
    finally:
        watch.restore()
