"""Tests for the offline scorer CLI (eval.py).

Covers the behavior the rewrite added over the reference's eval.py:6-41 —
stem-keyed pair matching (an unpaired file is REPORTED, never silently
shifting later sorted-zip pairs), --pattern, --per-image, --json, and the
reference-compatible summary lines.
"""

import importlib.util
import json
import os

import numpy as np
import pytest

import sr3_tpu.utils.metrics as Metrics

pytestmark = pytest.mark.quick


def _eval_main():
    path = os.path.join(os.path.dirname(__file__), "..", "eval.py")
    spec = importlib.util.spec_from_file_location("eval_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_pairs(tmp_path, n=3, extra_tags=()):
    rng = np.random.default_rng(7)
    for i in range(n):
        hr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        sr = np.clip(hr.astype(np.int32)
                     + rng.integers(-12, 13, hr.shape), 0, 255
                     ).astype(np.uint8)
        Metrics.save_img(hr, str(tmp_path / f"{i}_0_hr.png"))
        Metrics.save_img(sr, str(tmp_path / f"{i}_0_sr.png"))
        for tag in extra_tags:
            Metrics.save_img(sr, str(tmp_path / f"{i}_0_{tag}.png"))


def test_summary_lines_and_json(tmp_path, capsys):
    _write_pairs(tmp_path, n=3)
    mod = _eval_main()
    out_json = tmp_path / "metrics.json"
    rc = mod.main(["-p", str(tmp_path), "--json", str(out_json)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "# Validation # PSNR:" in out
    assert "# Validation # SSIM:" in out
    data = json.loads(out_json.read_text())
    assert data["count"] == 3
    assert len(data["images"]) == 3
    assert all(np.isfinite(r["psnr"]) and 0 <= r["ssim"] <= 1
               for r in data["images"])


def test_unpaired_file_reported_not_shifted(tmp_path, capsys):
    """An _sr.png with no _hr counterpart must not shift later pairs (the
    reference's sorted-zip bug) — scores must equal the well-paired run."""
    _write_pairs(tmp_path, n=3)
    mod = _eval_main()
    base_pairs, _ = mod.collect_pairs(str(tmp_path))
    _, base_psnr, _ = mod.score_pairs(base_pairs)

    # an orphan that sorts FIRST would shift every sorted-zip pair
    Metrics.save_img(np.zeros((16, 16, 3), np.uint8),
                     str(tmp_path / "0_0_aaa_orphan_sr.png"))
    rc = mod.main(["-p", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "no _hr counterpart" in out
    pairs, unmatched = mod.collect_pairs(str(tmp_path))
    assert len(pairs) == 3 and len(unmatched) == 1
    _, psnr, _ = mod.score_pairs(pairs)
    assert psnr == pytest.approx(base_psnr)


def test_pattern_selects_other_tag(tmp_path):
    _write_pairs(tmp_path, n=2, extra_tags=("inf",))
    mod = _eval_main()
    pairs, unmatched = mod.collect_pairs(str(tmp_path),
                                         sr_pattern="*_inf.png")
    assert len(pairs) == 2 and not unmatched


def test_empty_dir_is_an_error(tmp_path, capsys):
    mod = _eval_main()
    assert mod.main(["-p", str(tmp_path)]) == 1
