"""bench.py is the driver-facing artifact (one JSON line per metric,
headline sampling line last) — run it end-to-end on a tiny model so code
drift can never silently break the round-end benchmark."""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

TINY_CFG = {
    "name": "bench_tiny",
    "phase": "val",
    "model": {
        "which_model_G": "sr3",
        "finetune_norm": False,
        "dtype": "float32",
        "unet": {
            "in_channel": 6, "out_channel": 3, "inner_channel": 8,
            "norm_groups": 4, "channel_multiplier": [1, 2],
            "attn_res": [8], "res_blocks": 1, "dropout": 0.0,
        },
        "beta_schedule": {
            "train": {"schedule": "linear", "n_timestep": 6,
                      "linear_start": 1e-6, "linear_end": 1e-2},
            "val": {"schedule": "linear", "n_timestep": 6,
                    "linear_start": 1e-6, "linear_end": 1e-2},
        },
        # 128x128 so the real-loader train line runs (it needs the bundled
        # 16->128 PNG fixtures); the micro UNet keeps CPU cost trivial
        "diffusion": {"image_size": 128, "channels": 3, "conditional": True},
    },
}


def test_bench_emits_metrics_headline_last(tmp_path):
    cfg = tmp_path / "bench_tiny.json"
    cfg.write_text(json.dumps(TINY_CFG))
    env = {
        **os.environ,
        "SR3_PLATFORM": "cpu",
        "BENCH_CONFIG": str(cfg),
        "BENCH_BATCH": "2",
        "BENCH_STEPS": "6",
        "BENCH_REPEATS": "1",
        "BENCH_TRAIN_BATCH": "2",
        "BENCH_TRAIN_ITERS": "2",
        "BENCH_DPMPP_STEPS": "4",
        "BENCH_DDIM_STEPS": "4",
    }
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 5, out.stdout
    metrics = [json.loads(l) for l in lines]
    assert metrics[0]["metric"] == "bench_tiny_train_step_throughput"
    # end-to-end host-pipeline train line (PNG -> C++ decode -> step)
    assert metrics[1]["metric"] == "bench_tiny_train_step_loader_throughput"
    assert metrics[1]["fraction_of_synthetic_rate"] is not None
    # gap attribution: dominant-component flags are mutually exclusive
    assert metrics[1]["transfer_gap_ms"] >= 0
    assert not (metrics[1]["input_bound"] and metrics[1]["transfer_bound"])
    metrics = [metrics[0]] + metrics[2:]
    # fewer-step lines are plain *_throughput — no matched_quality label:
    # the T=2000 requal (docs/SAMPLER_REQUAL_r04.json, eta explicit) and
    # the r03 T=200 eval rank the samplers OPPOSITELY on different models
    assert metrics[1]["metric"] == "bench_tiny_sampling_ddim4_eta1_throughput"
    assert metrics[2]["metric"] == "bench_tiny_sampling_dpmpp4_throughput"
    # the headline (driver-recorded) line is LAST
    assert metrics[-1]["metric"] == "bench_tiny_sampling_2000step_throughput"
    for m in metrics:
        assert m["unit"] == "images/sec/chip"
        assert m["value"] > 0
        assert m["vs_baseline"] > 0
