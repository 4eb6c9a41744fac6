"""Tests for the head-to-head merge (tools/quality_headtohead.py merge()).

The merged docs/QUALITY_r04.json is the round-4 quality-parity evidence;
these pin the pairing, the seed-ensemble assembly on BOTH sides, and the
per-point spread-overlap verdict so the artifact can't silently drift.
"""

import importlib.util
import json
import os

import pytest

pytestmark = pytest.mark.quick


def _h2h():
    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "quality_headtohead.py")
    spec = importlib.util.spec_from_file_location("h2h_tool", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _traj(vals):
    return [dict(step=s, avg_psnr=p, avg_ssim=round(p / 100, 4),
                 psnr=[p], ssim=[p / 100])
            for s, p in vals]


def _side(side, vals, steps=400):
    return dict(side=side, proto={"steps": steps, "val_every": 200},
                unet={}, trajectory=_traj(vals),
                loss_per50=[0.5] * (steps // 50), wall_seconds=1.0)


def _write(docs, name, obj):
    with open(os.path.join(docs, name), "w") as f:
        json.dump(obj, f)


@pytest.fixture
def docs(tmp_path, monkeypatch):
    mod = _h2h()
    monkeypatch.setattr(mod, "DOCS", str(tmp_path))
    _write(tmp_path, "QUALITY_r04_torch.json",
           _side("torch", [(200, 16.0), (400, 17.0)]))
    _write(tmp_path, "QUALITY_r04_jax.json",
           _side("jax", [(200, 15.0), (400, 15.5)]))
    return mod, tmp_path


def _merged(tmp_path):
    with open(os.path.join(tmp_path, "QUALITY_r04.json")) as f:
        return json.load(f)


def test_pairs_by_step_with_deltas(docs, capsys):
    mod, tmp = docs
    mod.merge()
    out = _merged(tmp)
    assert [r["step"] for r in out["paired"]] == [200, 400]
    assert out["paired"][0]["d_psnr"] == pytest.approx(-1.0)
    assert out["final"]["step"] == 400
    assert out["mean_abs_d_psnr"] == pytest.approx(1.25)
    # no seed files -> no ensemble keys, overlap stat absent
    assert "jax_seed_ensemble_psnr" not in out["paired"][0]
    assert out["seed_ensembles_overlap_frac"] is None


def test_seed_ensembles_and_overlap(docs, capsys):
    mod, tmp = docs
    # jax seeds straddle torch at step 200 only; torch seed1 overlaps
    # the jax range at step 200, not at 400
    _write(tmp, "QUALITY_r04_jax_seed1.json",
           _side("jax seed1", [(200, 16.5), (400, 15.2)]))
    _write(tmp, "QUALITY_r04_torch_seed1.json",
           _side("torch seed1", [(200, 15.8), (400, 16.8)]))
    mod.merge()
    out = _merged(tmp)
    r200, r400 = out["paired"]
    assert r200["jax_seed_ensemble_psnr"] == [15.0, 16.5]
    assert r200["torch_seed_ensemble_psnr"] == [16.0, 15.8]
    assert r200["torch_inside_jax_ensemble"] is True
    assert r200["seed_ensembles_overlap"] is True   # 15.8 in [15.0,16.5]
    assert r400["torch_inside_jax_ensemble"] is False
    assert r400["seed_ensembles_overlap"] is False  # [15.2,15.5] vs [16.8,17]
    assert out["seed_ensembles_overlap_frac"] == pytest.approx(0.5)


def test_partial_seed_run_merges_at_common_steps(docs, capsys):
    mod, tmp = docs
    # a still-running torch seed file with only step 200 recorded
    _write(tmp, "QUALITY_r04_torch_seed1.json",
           _side("torch seed1", [(200, 15.8)]))
    _write(tmp, "QUALITY_r04_jax_seed1.json",
           _side("jax seed1", [(200, 16.5), (400, 15.2)]))
    mod.merge()
    out = _merged(tmp)
    r200, r400 = out["paired"]
    assert "torch_seed_ensemble_psnr" in r200
    assert "torch_seed_ensemble_psnr" not in r400
    # overlap stat computed only where both ensembles exist
    assert out["seed_ensembles_overlap_frac"] == pytest.approx(1.0)


def test_f32_run_adds_precision_columns(docs, capsys):
    mod, tmp = docs
    _write(tmp, "QUALITY_r04_jax_f32.json",
           _side("jax f32", [(200, 15.1), (400, 15.4)]))
    mod.merge()
    out = _merged(tmp)
    assert out["paired"][0]["jax_f32_psnr"] == pytest.approx(15.1)
    assert out["paired"][0]["d_psnr_f32"] == pytest.approx(-0.9)
    assert out["mean_abs_d_psnr_f32"] == pytest.approx(1.25)
