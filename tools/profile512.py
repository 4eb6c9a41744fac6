"""Op-level TPU profile of the 512^2 sampling step.

The 512^2 batch-8 reverse chain runs at 0.43-0.45 MFU and ~0.49x of HBM
bandwidth (docs/SCAN512_r03.txt) — neither roofline. This tool captures a
jax.profiler trace of the compiled chain and prints the top ops by
self-time from the xplane, so the gap is attributable (transposes?
resizes? conv padding waste?) instead of guessed at.

Run: python tools/profile512.py            (TPU; writes docs/PROF512_r03.txt)
Env: PROF_CONFIG (default configs/sr_sr3_64_512.json), PROF_BATCH (8),
     PROF_STEPS (chain length, default 20).
"""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sr3_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sr3_tpu.models.networks import define_G, init_params  # noqa: E402
from sr3_tpu.models.schedule import make_schedule  # noqa: E402
from sr3_tpu.utils.config import (  # noqa: E402
    dict_to_nonedict, load_json_with_comments,
)

LINES = []


def log(msg):
    print(msg, flush=True)
    LINES.append(msg)


def summarize_trace(logdir, n=45):
    """Aggregate per-op self time from the captured .xplane.pb directly
    (the tensorboard-plugin-profile native converter is version-broken in
    this image). On the TPU device plane, the 'XLA Ops' line holds the
    non-overlapping leaf-op events; summing durations by op name gives
    self-time per fused op."""
    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        return [("error", f"no xplane under {logdir}")]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    out = []
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        lines = {ln.name: ln for ln in plane.lines}
        ln = lines.get("XLA Ops")
        if ln is None and plane.lines:
            ln = max(plane.lines, key=lambda l: len(l.events))
        if ln is None:
            continue
        agg = {}
        for ev in ln.events:
            name = plane.event_metadata[ev.metadata_id].name
            d, c = agg.get(name, (0, 0))
            agg[name] = (d + ev.duration_ps, c + 1)
        total = sum(d for d, _ in agg.values())
        rows = [f"plane: {plane.name}  line: {ln.name}  "
                f"ops: {len(ln.events)}  busy: {total/1e12*1e3:.2f} ms"]
        for name, (d, c) in sorted(
                agg.items(), key=lambda kv: -kv[1][0])[:n]:
            rows.append(f"{d/total*100:5.1f}%  {d/1e12*1e3:8.3f} ms  "
                        f"x{c:<5d} {name[:110]}")
        out.append((plane.name, "\n".join(rows)))
    return out


def main():
    config = os.environ.get("PROF_CONFIG", "configs/sr_sr3_64_512.json")
    batch = int(os.environ.get("PROF_BATCH", "8"))
    steps = int(os.environ.get("PROF_STEPS", "20"))
    res = 512
    logdir = "/tmp/prof512"

    opt = dict_to_nonedict(load_json_with_comments(config))
    opt["phase"] = "val"
    diffusion = define_G(opt)
    params = init_params(diffusion, jax.random.PRNGKey(0))
    if diffusion.denoise_fn.dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p, params)
    sched = jax.device_put(make_schedule(
        {"schedule": "linear", "n_timestep": steps,
         "linear_start": 1e-6, "linear_end": 1e-2}))
    x_sr = jnp.zeros((batch, res, res, 3), jnp.float32)

    fn = jax.jit(
        lambda p, s, x, k: diffusion.super_resolution(p, s, x, k, False))
    cc = fn.lower(params, sched, x_sr, jax.random.PRNGKey(1)).compile()
    cc(params, sched, x_sr, jax.random.PRNGKey(1)).block_until_ready()

    with jax.profiler.trace(logdir):
        cc(params, sched, x_sr, jax.random.PRNGKey(2)).block_until_ready()

    log(f"config={config} batch={batch} chain_steps={steps} "
        f"backend={jax.default_backend()}")
    for tool, data in summarize_trace(logdir):
        log(f"\n===== {tool} =====")
        text = data if isinstance(data, str) else repr(data)
        log(text[:20000])

    with open("docs/PROF512_r03.txt", "w") as f:
        f.write("\n".join(LINES) + "\n")


if __name__ == "__main__":
    main()
