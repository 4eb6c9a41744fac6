"""Smoke-drive tools/samplescan.py on a micro model (CPU).

The artifact docs/SAMPLESCAN_r05.txt is produced by the same main() on
the real chip; this test keeps the tool itself from rotting: env-knob
plumbing, the f32-vs-bf16 chain comparison, the cost-analysis section,
and the artifact write.
"""

import importlib
import json
import os
import sys

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _micro_config(tmp_path):
    sched = {"schedule": "linear", "n_timestep": 4,
             "linear_start": 1e-6, "linear_end": 1e-2}
    opt = {
        "name": "samplescan_test",
        "phase": "val",
        "model": {
            "which_model_G": "sr3",
            "finetune_norm": False,
            "dtype": "float32",
            "unet": {
                "in_channel": 6, "out_channel": 3, "inner_channel": 8,
                "norm_groups": 4, "channel_multiplier": [1, 2],
                "attn_res": [], "res_blocks": 1, "dropout": 0.0,
            },
            "beta_schedule": {"train": sched, "val": sched},
            "diffusion": {"image_size": 16, "channels": 3,
                          "conditional": True},
        },
    }
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps(opt))
    return str(cfg)


def test_samplescan_micro(tmp_path, monkeypatch):
    out = tmp_path / "scan.txt"
    monkeypatch.setenv("SCAN_CONFIG", _micro_config(tmp_path))
    monkeypatch.setenv("SCAN_STEPS", "4")
    monkeypatch.setenv("SCAN_BATCHES", "1,2")
    monkeypatch.setenv("SCAN_COST_BATCHES", "2,4")  # 4: no-wall branch
    monkeypatch.setenv("SCAN_REPS", "1")
    monkeypatch.setenv("SCAN_OUT", str(out))

    sys.path.insert(0, TOOLS)
    try:
        samplescan = importlib.import_module("samplescan")
        # stale state from a hypothetical earlier invocation must not
        # leak into the artifact (main() resets LINES)
        samplescan.LINES.append("SENTINEL-STALE-LINE")
        samplescan.main()
    finally:
        sys.path.remove(TOOLS)

    text = out.read_text()
    # chain sweep ran both param dtypes at both batches
    assert text.count("f32 :") == 2 and text.count("bf16:") == 2
    assert "bf16-params delta" in text
    # cost section: measured ratio line for batch 2, no-wall line for 4
    assert "x of HBM roofline" in text
    assert "no wall" in text
    assert "SENTINEL-STALE-LINE" not in text
