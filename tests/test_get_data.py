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


def test_sibling_directory_escape_rejected(tmp_path):
    """'../<dest-name>_evil/x' passes a bare realpath-prefix startswith
    check but escapes into a sibling directory; the commonpath guard
    must reject it (tar fallback path and zip path both)."""
    from zipfile import ZipFile

    arch_dir = tmp_path / "archives"
    arch_dir.mkdir()
    payload = tmp_path / "p.txt"
    payload.write_text("x")
    with tarfile.open(arch_dir / "sib.tar", "w") as tf:
        tf.add(payload, arcname="../out_evil/p.txt")
    with ZipFile(arch_dir / "sib.zip", "w") as zf:
        zf.write(payload, arcname="../out_evil/p.txt")
    gd = GetData(str(arch_dir), verbose=False)
    for name in ("sib.tar", "sib.zip"):
        with pytest.raises(Exception):
            gd.get(name, save_path=str(tmp_path / "out"))
    assert not (tmp_path / "out_evil").exists()


def test_tar_symlink_escape_rejected(tmp_path):
    """A symlink member pointing outside dest could redirect a later
    member's extraction; the py<3.12 fallback validates link targets."""
    arch_dir = tmp_path / "archives"
    arch_dir.mkdir()
    with tarfile.open(arch_dir / "link.tar", "w") as tf:
        m = tarfile.TarInfo("escape")
        m.type = tarfile.SYMTYPE
        m.linkname = "../../outside"
        tf.addfile(m)
        payload = tarfile.TarInfo("escape/p.txt")
        data = b"x"
        payload.size = len(data)
        import io
        tf.addfile(payload, io.BytesIO(data))
    gd = GetData(str(arch_dir), verbose=False)
    try:
        # force the manual-validation fallback even on py>=3.12
        orig = tarfile.TarFile.extractall

        def no_filter(self, path=".", members=None, **kw):
            if "filter" in kw:
                raise TypeError("no filter kwarg")
            return orig(self, path=path, members=members)

        tarfile.TarFile.extractall = no_filter
        with pytest.raises(Exception):
            gd.get("link.tar", save_path=str(tmp_path / "out"))
    finally:
        tarfile.TarFile.extractall = orig
    assert not (tmp_path / "outside").exists()
