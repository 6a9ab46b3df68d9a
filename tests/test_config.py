import os
import textwrap

import pytest

from efg_tpu.config import Config, Configuration, load_yaml
from efg_tpu.config.config import apply_overrides, resolve_interpolations


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_includes_merge_and_override(tmp_path):
    _write(
        tmp_path,
        "base.yaml",
        """
        dataset:
          classes: [a, b]
          nsweeps: 1
        model:
          lr: 0.1
        """,
    )
    cfg_path = _write(
        tmp_path,
        "exp.yaml",
        """
        includes:
          - base.yaml
        dataset:
          nsweeps: 4
        """,
    )
    cfg = load_yaml(cfg_path)
    assert cfg["dataset"]["nsweeps"] == 4
    assert cfg["dataset"]["classes"] == ["a", "b"]
    assert cfg["model"]["lr"] == 0.1
    assert "includes" not in cfg


def test_env_resolver_in_include_path(tmp_path, monkeypatch):
    sub = tmp_path / "gallery"
    sub.mkdir()
    (sub / "ds.yaml").write_text("source: {root: /data}\n")
    monkeypatch.setenv("MY_GALLERY", str(sub))
    cfg_path = _write(
        tmp_path,
        "exp.yaml",
        """
        includes:
          - ${oc.env:MY_GALLERY}/ds.yaml
        task: train
        """,
    )
    cfg = load_yaml(cfg_path)
    assert cfg["source"]["root"] == "/data"


def test_interpolation_preserves_type():
    cfg = {
        "dataset": {"pc_range": [-75.2, -75.2, -2.0, 75.2, 75.2, 4.0], "n": 5},
        "model": {"post": {"pc_range": "${dataset.pc_range}", "text": "n is ${dataset.n}"}},
    }
    resolve_interpolations(cfg)
    assert cfg["model"]["post"]["pc_range"] == [-75.2, -75.2, -2.0, 75.2, 75.2, 4.0]
    assert cfg["model"]["post"]["text"] == "n is 5"


def test_env_interpolation_with_default(monkeypatch):
    monkeypatch.delenv("EFG_NOPE", raising=False)
    cfg = {"out": "${oc.env:EFG_NOPE,/tmp/x}"}
    resolve_interpolations(cfg)
    assert cfg["out"] == "/tmp/x"


def test_dotlist_overrides():
    cfg = {"solver": {"optimizer": {"lr": 0.1}}, "dataset": {"voxel_size": [0.1, 0.1, 0.15]}}
    apply_overrides(cfg, ["solver.optimizer.lr", "0.003", "dataset.voxel_size[2]=0.2", "task=val"])
    assert cfg["solver"]["optimizer"]["lr"] == 0.003
    assert cfg["dataset"]["voxel_size"][2] == 0.2
    assert cfg["task"] == "val"


def test_configuration_defaults(tmp_path):
    cfg_path = _write(
        tmp_path,
        "exp.yaml",
        """
        dataset:
          type: Synthetic3D
        trainer:
          log_interval: 7
        """,
    )
    cfg = Configuration(config_file=cfg_path).get_config()
    assert cfg.task == "train"
    assert cfg.trainer.log_interval == 7
    # interpolation from default.yaml: window_size == log_interval
    assert cfg.trainer.window_size == 7
    assert cfg.dataset.type == "Synthetic3D"


def test_config_attribute_access_and_errors():
    c = Config({"a": {"b": [1, {"c": 2}]}})
    assert c.a.b[1].c == 2
    with pytest.raises(AttributeError):
        _ = c.nope
    assert c.get("nope", 3) == 3


def test_backbones_gallery_include(tmp_path, monkeypatch):
    """The shared backbone gallery (reference gallary/backbones.yaml) loads
    via includes and its keys interpolate into experiment configs."""
    monkeypatch.setenv("EFG_PATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cfg_path = _write(
        tmp_path,
        "exp.yaml",
        """
        includes:
          - ${oc.env:EFG_PATH}/efg_tpu/config/gallary/backbones.yaml
        model:
          resnets:
            depth: 18
          fcos:
            depth: ${model.resnets.depth}
            freeze_at: ${model.resnets.freeze_at}
        """,
    )
    cfg = load_yaml(cfg_path)
    resolve_interpolations(cfg)
    assert cfg["model"]["resnets"]["depth"] == 18          # override wins
    assert cfg["model"]["resnets"]["norm"] == "FrozenBN"   # gallery default
    assert cfg["model"]["fcos"]["depth"] == 18             # interpolated
    assert cfg["model"]["fcos"]["freeze_at"] == 2
    assert cfg["model"]["fpn"]["out_channels"] == 256
    assert cfg["model"]["swin"]["ape"] is False
