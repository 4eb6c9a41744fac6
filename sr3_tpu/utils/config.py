"""Config + experiment management.

Reproduces the reference's public config surface (core/logger.py:21-125):
JSON with line-wise ``//`` comments, timestamped experiment directory tree,
debug-mode config shrink, NoneDict missing-key semantics, and the dict2str
pretty printer. Device selection differs: instead of exporting
CUDA_VISIBLE_DEVICES (core/logger.py:49-55) we record the requested device
count; JAX device visibility is controlled by the runtime.
"""

from __future__ import annotations

import json
import logging
import os
from collections import OrderedDict
from datetime import datetime


class NoneDict(dict):
    """dict that returns None for missing keys (reference core/logger.py:97-99)."""

    def __missing__(self, key):
        return None


def dict_to_nonedict(opt):
    """Recursively convert dicts to NoneDict (reference core/logger.py:103-112)."""
    if isinstance(opt, dict):
        return NoneDict(**{k: dict_to_nonedict(v) for k, v in opt.items()})
    if isinstance(opt, list):
        return [dict_to_nonedict(v) for v in opt]
    return opt


def dict2str(opt, indent_l=1):
    """Pretty-print a nested dict for logging (reference core/logger.py:115-125)."""
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_l * 2) + k + ":[\n"
            msg += dict2str(v, indent_l + 1)
            msg += " " * (indent_l * 2) + "]\n"
        else:
            msg += " " * (indent_l * 2) + k + ": " + str(v) + "\n"
    return msg


def get_timestamp():
    return datetime.now().strftime("%y%m%d_%H%M%S")


def mkdirs(paths):
    if isinstance(paths, str):
        os.makedirs(paths, exist_ok=True)
    else:
        for p in paths:
            os.makedirs(p, exist_ok=True)


def load_json_with_comments(path):
    """Read JSON where everything after ``//`` on a line is a comment
    (reference core/logger.py:27-32)."""
    json_str = ""
    with open(path, "r") as f:
        for line in f:
            json_str += line.split("//")[0] + "\n"
    return json.loads(json_str, object_pairs_hook=OrderedDict)


def parse(args):
    """CLI-level parse mirroring reference core/logger.py:21-94.

    ``args`` needs: config, phase, gpu_ids, debug, enable_wandb and optionally
    log_wandb_ckpt / log_eval / log_infer.
    """
    phase = args.phase
    opt = load_json_with_comments(args.config)

    if getattr(args, "debug", False):
        opt["name"] = "debug_{}".format(opt["name"])
    experiments_root = os.path.join(
        "experiments", "{}_{}".format(opt["name"], get_timestamp())
    )
    opt["path"]["experiments_root"] = experiments_root
    for key, path in opt["path"].items():
        if "resume" not in key and "experiments" not in key:
            opt["path"][key] = os.path.join(experiments_root, path)
            mkdirs(opt["path"][key])

    opt["phase"] = phase

    # Device selection. The reference exported CUDA_VISIBLE_DEVICES and set
    # `distributed` from the string length of the GPU list
    # (core/logger.py:49-59). Here gpu_ids picks how many JAX devices the data
    # mesh spans (None/empty = all visible devices).
    gpu_ids = getattr(args, "gpu_ids", None)
    if gpu_ids is not None:
        opt["gpu_ids"] = [int(x) for x in gpu_ids.split(",")]
    opt["distributed"] = bool(opt.get("gpu_ids")) and len(opt["gpu_ids"]) > 1

    # debug shrink (reference core/logger.py:62-70)
    if "debug" in opt["name"]:
        opt["train"]["val_freq"] = 2
        opt["train"]["print_freq"] = 2
        opt["train"]["save_checkpoint_freq"] = 3
        opt["datasets"]["train"]["batch_size"] = 2
        opt["model"]["beta_schedule"]["train"]["n_timestep"] = 10
        opt["model"]["beta_schedule"]["val"]["n_timestep"] = 10
        opt["datasets"]["train"]["data_len"] = 6
        opt["datasets"]["val"]["data_len"] = 3

    # validation in train phase (reference core/logger.py:73-74)
    if phase == "train":
        opt["datasets"]["val"]["data_len"] = 3

    for flag in ("log_wandb_ckpt", "log_eval", "log_infer"):
        if hasattr(args, flag):
            opt[flag] = getattr(args, flag)
    opt["enable_wandb"] = getattr(args, "enable_wandb", False)

    return opt


def setup_logger(logger_name, root, phase, level=logging.INFO, screen=False):
    """Per-phase file logger + optional console (reference core/logger.py:128-142).

    Multi-host: non-primary processes get their own ``{phase}_p{i}.log`` so
    two hosts never interleave writes into one file (open(mode='w') from
    process 1 would otherwise truncate process 0's log mid-run)."""
    logger = logging.getLogger(logger_name)
    formatter = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
        datefmt="%y-%m-%d %H:%M:%S",
    )
    suffix = ""
    try:
        import jax

        if jax.process_count() > 1 and jax.process_index() > 0:
            suffix = "_p{}".format(jax.process_index())
    except Exception:  # backend not initialized yet -> single-process
        pass
    log_file = os.path.join(root, "{}{}.log".format(phase, suffix))
    fh = logging.FileHandler(log_file, mode="w")
    fh.setFormatter(formatter)
    logger.setLevel(level)
    logger.addHandler(fh)
    if screen:
        sh = logging.StreamHandler()
        sh.setFormatter(formatter)
        logger.addHandler(sh)
    return logger
