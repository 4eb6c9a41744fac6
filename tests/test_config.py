"""Config system: JSON+comments parsing, NoneDict, debug shrink,
experiment tree (reference core/logger.py:21-125)."""

import argparse
import json
import os

import pytest

from sr3_tpu.utils import config as C

pytestmark = pytest.mark.quick


def test_json_with_comments(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{\n "a": 1, // comment\n "b": "x" // more\n}\n')
    d = C.load_json_with_comments(str(p))
    assert d == {"a": 1, "b": "x"}


def test_nonedict_missing_keys():
    d = C.dict_to_nonedict({"a": {"b": 1}, "l": [{"c": 2}]})
    assert d["missing"] is None
    assert d["a"]["nope"] is None
    assert d["l"][0]["c"] == 2


def test_dict2str():
    s = C.dict2str({"a": 1, "b": {"c": 2}})
    assert "a: 1" in s and "c: 2" in s and "b:[" in s


def _args(config, phase="train", debug=False):
    ns = argparse.Namespace()
    ns.config = config
    ns.phase = phase
    ns.gpu_ids = None
    ns.debug = debug
    ns.enable_wandb = False
    return ns


@pytest.fixture
def repo_config():
    return os.path.join(os.path.dirname(__file__), "..", "configs",
                        "sr_sr3_16_128.json")


def test_parse_creates_experiment_tree(repo_config, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt = C.parse(_args(os.path.abspath(repo_config)))
    for key in ("log", "tb_logger", "results", "checkpoint"):
        assert os.path.isdir(opt["path"][key])
    assert opt["phase"] == "train"
    # val data_len forced to 3 in train phase (core/logger.py:73-74)
    assert opt["datasets"]["val"]["data_len"] == 3


def test_debug_shrink(repo_config, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt = C.parse(_args(os.path.abspath(repo_config), debug=True))
    assert opt["name"].startswith("debug_")
    assert opt["train"]["val_freq"] == 2
    assert opt["train"]["print_freq"] == 2
    assert opt["train"]["save_checkpoint_freq"] == 3
    assert opt["datasets"]["train"]["batch_size"] == 2
    assert opt["model"]["beta_schedule"]["train"]["n_timestep"] == 10
    assert opt["datasets"]["train"]["data_len"] == 6
    assert opt["datasets"]["val"]["data_len"] == 3


def test_all_shipped_configs_parse():
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    names = [f for f in os.listdir(cfg_dir) if f.endswith(".json")]
    assert len(names) >= 5
    for f in names:
        d = C.load_json_with_comments(os.path.join(cfg_dir, f))
        # public schema keys (SURVEY §5)
        for key in ("name", "path", "datasets", "model", "train"):
            assert key in d, f"{f} missing {key}"
        assert d["model"]["which_model_G"] in ("sr3", "ddpm")
        json.dumps(d)  # round-trippable


def test_wandb_logger_gated_without_package():
    import importlib

    try:
        importlib.import_module("wandb")
        import pytest

        pytest.skip("wandb installed")
    except ImportError:
        pass
    from sr3_tpu.utils.wandb_logger import WandbLogger

    import pytest

    with pytest.raises(ImportError, match="wandb"):
        WandbLogger({"wandb": {"project": "x"}})
