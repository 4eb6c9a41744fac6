"""Host data-path benchmark: can the input pipeline feed the chip?

Measures, on the current host:
  1. the native C++ kernels in isolation — libpng decode+normalize+stack
     (bytes -> f32 batch) and the decoded-uint8 collate — with a
     SR3_DECODE_THREADS thread sweep;
  2. the PIL/numpy fallback path for comparison;
  3. the full DataLoader end to end (LRHRDataset over PNG dirs) in each of
     its three modes: bytes (C++ decode), raw (PIL decode + C++ collate,
     RAM-cached after epoch 1), py (pure PIL+numpy);
  4. the sustain margin vs the measured TPU train rate (BENCH_r04: 289
     img/s/chip at 16->128, batch 16): how many host threads the C++
     decode path needs to keep one v5e chip fed.

The train step consumes TWO r_res-sized planes per image (HR + bicubic
SR, reference config sr_sr3_16_128.json) — the margin math accounts for
that. Writes one JSON artifact (--json) and prints a summary.

Usage:
  python tools/hostpath_bench.py [--root dataset/fixtures_16_128]
      [--batch 16] [--imgs 320] [--threads 1,2,4] [--target 289]
      [--json docs/HOSTPATH_r05.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the DataLoader consults jax.process_count() for multi-host sharding; this
# is a host-only benchmark, so force the CPU backend before any jax init
# (the pinned axon platform would otherwise open the TPU tunnel here)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from sr3_tpu.data.loader import DataLoader  # noqa: E402
from sr3_tpu.data.lrhr import LRHRDataset  # noqa: E402


def _time(fn, min_s=0.5, min_reps=3):
    """Median-of-reps wall time for fn() (returns seconds)."""
    fn()  # warm (file cache, lib load)
    times = []
    t_total = 0.0
    while len(times) < min_reps or t_total < min_s:
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        times.append(dt)
        t_total += dt
        if len(times) > 200:
            break
    return float(np.median(times))


def bench_native_decode(hr_bytes, res, batch, threads_list):
    """C++ libpng decode+normalize+stack: imgs/s per thread count."""
    from sr3_tpu.data.native import decode_collate_normalize

    bufs = (hr_bytes * ((batch + len(hr_bytes) - 1) // len(hr_bytes)))[:batch]
    flips = [i % 2 == 0 for i in range(batch)]
    out = {}
    for nt in threads_list:
        os.environ["SR3_DECODE_THREADS"] = str(nt)
        try:
            dt = _time(
                lambda: decode_collate_normalize(bufs, res, res, -1, 1, flips)
            )
        finally:
            os.environ.pop("SR3_DECODE_THREADS", None)
        out[str(nt)] = round(batch / dt, 1)
    return out


def bench_native_collate(res, batch):
    """C++ normalize+flip+stack over already-decoded uint8."""
    from sr3_tpu.data.native import collate_normalize

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (res, res, 3), np.uint8)
            for _ in range(batch)]
    flips = [i % 2 == 0 for i in range(batch)]
    dt = _time(lambda: collate_normalize(imgs, -1, 1, flips))
    return round(batch / dt, 1)


def bench_pil_decode(hr_bytes, batch):
    """PIL decode + numpy normalize, the pure-python fallback."""
    from io import BytesIO

    from PIL import Image

    bufs = (hr_bytes * ((batch + len(hr_bytes) - 1) // len(hr_bytes)))[:batch]

    def run():
        arrs = [
            np.asarray(Image.open(BytesIO(b)).convert("RGB"), np.uint8)
            for b in bufs
        ]
        batch_f = np.stack(arrs).astype(np.float32) / 255.0 * 2.0 - 1.0
        return batch_f

    dt = _time(run)
    return round(batch / dt, 1)


def materialize_dataset(src_root, dst_root, n):
    """Cycle the fixture triplets into an n-sample PNG dataset (symlinks)."""
    import glob

    for sub in ("hr_128", "sr_16_128"):
        os.makedirs(os.path.join(dst_root, sub), exist_ok=True)
        srcs = sorted(glob.glob(os.path.join(src_root, sub, "*.png")))
        assert srcs, f"no PNGs under {src_root}/{sub}"
        for i in range(n):
            dst = os.path.join(dst_root, sub, f"{i:05d}.png")
            if not os.path.exists(dst):
                os.symlink(os.path.abspath(srcs[i % len(srcs)]), dst)
    return dst_root


def bench_loader(root, batch, n_imgs, mode):
    """Full DataLoader end to end. mode: bytes | raw | py."""
    ds = LRHRDataset(
        dataroot=root, datatype="img", l_resolution=16, r_resolution=128,
        split="train", need_LR=False,
        cache=(mode == "raw"),  # cache steers the loader off the bytes path
    )
    loader = DataLoader(ds, batch_size=batch, shuffle=True, num_workers=1,
                        drop_last=True, use_native=(mode != "py"))
    if mode == "bytes" and not loader.use_native_decode:
        return None
    # warm one epoch (populates the RAM cache in raw mode, OS file cache)
    for _ in loader:
        pass
    seen, t0 = 0, time.perf_counter()
    while seen < n_imgs:
        for b in loader:
            seen += b["HR"].shape[0]
            if seen >= n_imgs:
                break
    dt = time.perf_counter() - t0
    return round(seen / dt, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="dataset/fixtures_16_128")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--imgs", type=int, default=320,
                    help="images to stream for the end-to-end loader bench")
    ap.add_argument("--threads", default="1",
                    help="comma list for the decode thread sweep")
    ap.add_argument("--target", type=float, default=289.0,
                    help="chip train rate to sustain (img/s, BENCH_r04)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    hr_dir = os.path.join(args.root, "hr_128")
    hr_bytes = []
    for f in sorted(os.listdir(hr_dir)):
        if f.endswith(".png"):
            with open(os.path.join(hr_dir, f), "rb") as fh:
                hr_bytes.append(fh.read())
    assert hr_bytes, f"no PNGs under {hr_dir}"
    threads = [int(t) for t in args.threads.split(",")]
    ncpu = os.cpu_count()

    res = {
        "host_cpus": ncpu,
        "image_res": 128,
        "batch": args.batch,
        # per TRAIN image the host must produce HR + SR, both r_res-sized
        "decode_planes_per_train_img": 2,
        "target_chip_img_per_s": args.target,
    }

    # 1. native kernels
    res["native_decode_img_per_s_by_threads"] = bench_native_decode(
        hr_bytes, 128, max(args.batch, 2 * args.batch), threads
    )
    res["native_collate_img_per_s"] = bench_native_collate(128, args.batch)
    res["pil_decode_img_per_s"] = bench_pil_decode(hr_bytes, args.batch)

    # 2. end-to-end loader modes (rates are in SAMPLES/s: each sample moves
    #    both its HR and SR planes through decode+collate). The fixture set
    #    is tiny, so cycle it into a 4-batch-minimum dataset first.
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        root = materialize_dataset(args.root, tmp, max(4 * args.batch, 64))
        for mode in ("bytes", "raw", "py"):
            print(f"# loader bench: mode={mode}", file=sys.stderr)
            res[f"loader_{mode}_samples_per_s"] = bench_loader(
                root, args.batch, args.imgs, mode
            )

    # 3. sustain margin: single-thread C++ decode rate -> threads needed to
    #    feed `target` train img/s with 2 decode planes per image. The raw
    #    (RAM-cached) path needs no decode after epoch 1 — its rate is the
    #    collate kernel's.
    one = res["native_decode_img_per_s_by_threads"].get("1")
    if one:
        need = args.target * res["decode_planes_per_train_img"] / one
        res["decode_threads_needed_for_target"] = round(need, 2)
    if res.get("loader_bytes_samples_per_s"):
        res["loader_bytes_margin_vs_target"] = round(
            res["loader_bytes_samples_per_s"] / args.target, 3
        )
    if res.get("loader_raw_samples_per_s"):
        res["loader_raw_margin_vs_target"] = round(
            res["loader_raw_samples_per_s"] / args.target, 3
        )
    res["input_bound_on_this_host"] = bool(
        res.get("loader_raw_margin_vs_target", 0) < 1
        and res.get("loader_bytes_margin_vs_target", 0) < 1
    )

    print(json.dumps(res, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=2)
        print(f"# wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
