"""Measure the dropout mask-recompute lever end-to-end (VERDICT r04 #3).

ops/dropout.py recomputes the keep-mask from the PRNG key in the backward
pass instead of letting XLA carry it as a saved residual — on the flagship
16->128 train step the masks are ~4.8 GB of the 44.5 GB per-step HBM bytes
(docs/TRAINSCAN_r03.txt:26), and the step is memory-bound at ~0.97x the
bytes roofline (docs/TRAINSCAN_r04.txt). Two measurements:

1. SPEED on the flagship arch (97.8M, 16->128, batch 16): ms/step + img/s
   for stored-mask (SR3_DROPOUT_STORED=1, the r04 behavior) vs recompute
   (the new default), via the Trainer's own jitted step with a true device
   sync between timings (axon-tunnel gotcha: block_until_ready on donated
   chains can return early — see tools/mu_dtype_bench.py).
2. IDENTITY on the head-to-head protocol model: identical data stream and
   seeds, N steps each mode, assert the loss trajectories match. The unit
   tests (tests/test_ops.py) already prove bit-identical outputs and
   gradients; this confirms it end-to-end through the real Trainer step.

Usage: python tools/dropout_bench.py [--speed-iters 30] [--steps 100]
Writes docs/DROPOUT_r05.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

from tools.mu_dtype_bench import FLAGSHIP_UNET, _opt_dict  # noqa: E402
from tools.quality_headtohead import (PROTO, batch_stream, load_fixtures,
                                      make_batch)  # noqa: E402


def _set_mode(stored):
    if stored:
        os.environ["SR3_DROPOUT_STORED"] = "1"
    else:
        os.environ.pop("SR3_DROPOUT_STORED", None)


def bench_speed(stored, batch=16, iters=30):
    import jax

    from sr3_tpu.training.trainer import create_model

    _set_mode(stored)
    name = "drop_stored" if stored else "drop_recompute"
    t = create_model(_opt_dict(FLAGSHIP_UNET, 128, None, 10 ** 6,
                               f"dropbench_{name}"))
    t.set_new_noise_schedule(PROTO["train_schedule"], "train")
    rng = np.random.default_rng(0)
    hr = rng.standard_normal((batch, 128, 128, 3)).astype(np.float32) * 0.5
    sr = rng.standard_normal((batch, 128, 128, 3)).astype(np.float32) * 0.5
    t.feed_data({"HR": hr, "SR": sr})
    t.optimize_parameters()  # compile + warm

    def sync():
        leaf = jax.tree_util.tree_leaves(t.state.params)[0]
        return float(np.asarray(jax.device_get(leaf)).ravel()[0])

    sync()
    t0 = time.time()
    for _ in range(iters):
        t.optimize_parameters()
    sync()
    dt = (time.time() - t0) / iters
    rec = dict(mode=name, ms_per_step=round(dt * 1e3, 2),
               img_per_s=round(batch / dt, 1), batch=batch)
    print(json.dumps(rec), flush=True)
    del t
    return rec


def memory_analysis(stored, batch=16):
    """Compiled-step memory footprint (XLA memory_analysis) — the evidence
    for WHY the speed A/B is null: identical temp bytes in both modes means
    XLA never kept the masks alive across fwd->bwd to begin with."""
    import jax

    from sr3_tpu.training.trainer import create_model

    _set_mode(stored)
    name = "stored" if stored else "recompute"
    t = create_model(_opt_dict(FLAGSHIP_UNET, 128, None, 10 ** 6,
                               f"dropmem_{name}"))
    t.set_new_noise_schedule(PROTO["train_schedule"], "train")
    rng = np.random.default_rng(0)
    t.feed_data({"HR": rng.standard_normal((batch, 128, 128, 3),
                                           dtype=np.float32),
                 "SR": rng.standard_normal((batch, 128, 128, 3),
                                           dtype=np.float32)})
    fn = t._build_train_step()
    ma = fn.lower(t.state, t.sched, t._train_batch(t.data),
                  jax.random.PRNGKey(0)).compile().memory_analysis()
    rec = dict(mode=name, temp_bytes=int(ma.temp_size_in_bytes),
               argument_bytes=int(ma.argument_size_in_bytes),
               output_bytes=int(ma.output_size_in_bytes))
    print(json.dumps(rec), flush=True)
    del t
    return rec


def train_losses(stored, steps):
    """N protocol-model train steps with a fixed data stream; returns the
    per-step loss sequence (identity check between the two modes)."""
    from sr3_tpu.training.trainer import create_model

    _set_mode(stored)
    p = PROTO
    u = dict(p["unet"])
    u["channel_multiplier"] = list(u.pop("channel_mults"))
    u["attn_res"] = list(u["attn_res"])
    name = "dropq_stored" if stored else "dropq_recompute"
    t = create_model(_opt_dict(u, p["image_size"], None, steps, name))
    t.set_new_noise_schedule(p["train_schedule"], "train")
    hr, sr = load_fixtures()
    stream = batch_stream(len(hr), steps, p["batch"], p["data_seed"])
    losses = []
    for idx, flips in stream:
        h, s = make_batch(hr, sr, idx, flips)
        t.feed_data({"HR": h, "SR": s})
        t.optimize_parameters()
        losses.append(float(t.log_dict["l_pix"]))
    del t
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--speed-iters", type=int, default=30)
    ap.add_argument("--steps", type=int, default=100,
                    help="identity-check train steps per mode")
    ap.add_argument("--skip-speed", action="store_true")
    ap.add_argument("--skip-identity", action="store_true")
    ap.add_argument("--skip-memory", action="store_true")
    args = ap.parse_args()

    from sr3_tpu.utils.runtime import setup_runtime

    setup_runtime()

    out = {"what": __doc__.split("\n")[0]}

    if not args.skip_speed:
        recs = [bench_speed(True, iters=args.speed_iters),
                bench_speed(False, iters=args.speed_iters)]
        out["speed_flagship_b16"] = recs
        out["speedup_recompute"] = round(recs[0]["ms_per_step"]
                                         / recs[1]["ms_per_step"], 4)

    if not args.skip_memory:
        out["memory_analysis"] = [memory_analysis(True),
                                  memory_analysis(False)]

    if not args.skip_identity:
        ls = train_losses(True, args.steps)
        lr = train_losses(False, args.steps)
        max_rel = max(abs(a - b) / max(abs(a), 1e-12)
                      for a, b in zip(ls, lr))
        out["identity_check"] = dict(
            steps=args.steps, max_rel_loss_diff=float(max_rel),
            identical=bool(max_rel == 0.0),
            loss_stored_last5=[round(x, 6) for x in ls[-5:]],
            loss_recompute_last5=[round(x, 6) for x in lr[-5:]])
        print(json.dumps(out["identity_check"]), flush=True)

    path = os.path.join(REPO, "docs", "DROPOUT_r05.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        for k in ("speed_flagship_b16", "speedup_recompute",
                  "identity_check", "memory_analysis"):
            out.setdefault(k, prev.get(k))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
