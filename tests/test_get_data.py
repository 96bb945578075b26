"""Offline dataset staging (utils/get_data.py — the no-egress
equivalent of Module2/util/get_data.py)."""
import os
import tarfile

import numpy as np
import pytest

from animateportrait_tpu.utils.get_data import (
    GetData, validate_umlvd_layout)


def _make_archive(tmp_path, name="umlvd.tar.gz"):
    src = tmp_path / "stage" / "umlvd"
    for d in ("Photo", "Alm/MTCNN", "Alm_txt/MTCNN", "Drawing"):
        (src / d).mkdir(parents=True)
    (src / "Photo" / "a.png").write_bytes(b"x")
    arch_dir = tmp_path / "archives"
    arch_dir.mkdir()
    with tarfile.open(arch_dir / name, "w:gz") as tf:
        tf.add(src, arcname="umlvd")
    return str(arch_dir)


def test_options_and_get(tmp_path):
    arch_dir = _make_archive(tmp_path)
    gd = GetData(arch_dir, verbose=False)
    assert gd.options() == ["umlvd.tar.gz"]
    root = gd.get(save_path=str(tmp_path / "datasets"))
    assert os.path.basename(root) == "umlvd"
    assert os.path.exists(os.path.join(root, "Photo", "a.png"))
    assert validate_umlvd_layout(root) == []


def test_get_unknown_name_raises(tmp_path):
    arch_dir = _make_archive(tmp_path)
    gd = GetData(arch_dir, verbose=False)
    with pytest.raises(FileNotFoundError):
        gd.get("nope.tar.gz", save_path=str(tmp_path / "d"))


def test_validate_reports_missing(tmp_path):
    root = tmp_path / "bad"
    (root / "Photo").mkdir(parents=True)
    missing = validate_umlvd_layout(str(root))
    assert "Alm/MTCNN" in missing and "Drawing" in missing


def test_tar_traversal_rejected(tmp_path):
    arch_dir = tmp_path / "archives"
    arch_dir.mkdir()
    evil = tmp_path / "evil.txt"
    evil.write_text("evil")
    with tarfile.open(arch_dir / "evil.tar", "w") as tf:
        tf.add(evil, arcname="../evil_escape.txt")
    gd = GetData(str(arch_dir), verbose=False)
    with pytest.raises(Exception):
        gd.get("evil.tar", save_path=str(tmp_path / "out"))
    assert not (tmp_path / "evil_escape.txt").exists()
