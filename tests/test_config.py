"""Config parsing parity (reference utils/utils.py:13-65 semantics)."""

import os

from fastdet.config import Config, load_datafile, load_names

COCO_DATA = "/root/reference/data/coco.data"


def test_load_coco_data():
    cfg = load_datafile(COCO_DATA)
    assert cfg["model_name"] == "coco"
    assert cfg["epochs"] == 300
    assert cfg["steps"] == [150.0, 250.0]
    assert cfg["batch_size"] == 128
    assert cfg["subdivisions"] == 1
    assert cfg["learning_rate"] == 0.001
    assert cfg["classes"] == 80
    assert cfg["width"] == 352 and cfg["height"] == 352
    assert cfg["anchor_num"] == 3
    assert len(cfg["anchors"]) == 12
    assert cfg["anchors"][0] == 12.64
    assert cfg["names"] == "./data/coco.names"


def test_unknown_key_warns_not_raises(tmp_path, capsys):
    p = tmp_path / "weird.data"
    p.write_text("[sec]\nclasses=3\nbogus_key=1\n\nwidth=64\n")
    cfg = load_datafile(str(p))
    assert cfg["classes"] == 3
    assert cfg["width"] == 64
    assert "bogus_key" in capsys.readouterr().out


def test_config_dataclass():
    cfg = Config.from_file(COCO_DATA)
    assert cfg.num_scales == 2
    sa = cfg.scale_anchors()
    assert sa[0][0] == (12.64, 19.39)
    assert sa[1][2] == (279.92, 258.87)
    # pre_weights=None string normalised to python None
    assert cfg.pre_weights is None
    # hashable (usable as a static jit argument)
    hash(cfg)


def test_load_names():
    names = load_names("/root/reference/data/coco.names")
    assert len(names) == 80
    assert names[0] == "person"
    assert names[-1] == "toothbrush"
