"""UMLVD-IFW training dataset (drawing + cartoon twins).

Behavioral reimplementation of `Module2/data/umlvd_ifw_dataset.py` /
`umlvd_ifw_cartoon_dataset.py` over the same on-disk layout
(readme.md:57-59 tarballs):

  <root>/Photo/...               unpaired photos (A)
  <root>/Drawing|Cartoon/...     unpaired style images (B)
  <root>/Alm/MTCNN/, /Blm/MTCNN/ landmark dot images
  <root>/Alm_txt/MTCNN/, ...     68-pt landmark txts (+ _win.txt for clips)
  <root>/Amask|Bmask/{nose,eyes,lips}/
  <root>/fakeB_static/           static stylizations of the photos
  <root>/Drawing/scanner_frag_<k>_MTCNN/  34 consecutive-frame film clips

Differences from the reference (by design, TPU-first): RNG is an explicit
np.random.Generator (reproducible, no global seeding), and the TPS warp
grids are NOT precomputed on the host — the train step derives them from
the emitted 68-pt landmarks on device (the reference's per-item
scipy-griddata call was its data-loading bottleneck).
"""
from __future__ import annotations

import dataclasses
import glob
import os

import numpy as np

FLIP_REMAP = np.array(
    [16, 15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0,
     26, 25, 24, 23, 22, 21, 20, 19, 18, 17, 27, 28, 29, 30,
     35, 34, 33, 32, 31, 45, 44, 43, 42, 47, 46, 39, 38, 37, 36, 41, 40,
     54, 53, 52, 51, 50, 49, 48, 59, 58, 57, 56, 55,
     64, 63, 62, 61, 60, 67, 66, 65])


@dataclasses.dataclass(frozen=True)
class DataConfig:
    root: str
    style_dir: str = "Drawing"     # "Cartoon" for the cartoon twin
    load_size: int = 286
    crop_size: int = 256
    no_flip: bool = False
    input_nc: int = 3              # A grayscale when 1 (swapped by
    output_nc: int = 1             # --direction BtoA, umlvd:145-147)
    # --serial_batches: deterministic B pairing (index % B_size) instead
    # of the randomized training pairing (umlvd_ifw_dataset.py:151-155)
    serial_batches: bool = False
    # --max_dataset_size: per-list cap like the reference's
    # make_dataset(dir, max_dataset_size) (image_folder.py:23-35)
    max_dataset_size: float = float("inf")
    max_offset: float = 3.0
    select_target12_thre: float = 0.0
    select_noniden_thre: float = 0.9
    coh_use_more: bool = True
    use_clips: bool = True         # False for the cartoon twin (no B12)
    rx: float = 0.15
    ry: float = 0.2
    rs: float = 0.7


def _load_img(path, grayscale=False, size=None):
    from PIL import Image

    from animateportrait_tpu.utils import native

    arr = native.decode_image(path, grayscale=grayscale)
    if arr is not None:
        # native libpng/libjpeg decode (byte-exact with PIL, threaded in
        # batch(); releases the GIL) — PIL only does the resize
        img = Image.fromarray(arr)
    else:
        img = Image.open(path).convert("L" if grayscale else "RGB")
    if size is not None:
        img = img.resize((size, size), Image.BICUBIC)
    return img


def _to_tensor(img, crop_pos, crop_size, flip, normalize=True):
    """resize(load_size done by caller) -> crop -> flip -> [-1,1] float,
    HWC."""
    x, y = crop_pos
    img = img.crop((x, y, x + crop_size, y + crop_size))
    if flip:
        from PIL import Image

        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    if normalize:
        arr = arr * 2.0 - 1.0
    return arr


def _get_params2(cfg: DataConfig, size, rng) -> dict:
    w, h = size
    new_w = new_h = cfg.load_size
    x1 = max(0, int(round((cfg.rx + cfg.rs) * new_w)) - cfg.crop_size)
    x2 = min(max(0, new_w - cfg.crop_size), int(round(cfg.rx * new_w)))
    x = int(rng.integers(x1, x2 + 1))
    y1 = max(0, int(round((cfg.ry + cfg.rs) * new_h)) - cfg.crop_size)
    y2 = min(max(0, new_h - cfg.crop_size), int(round(cfg.ry * new_h)))
    y = int(rng.integers(y1, y2 + 1))
    flip = (not cfg.no_flip) and rng.random() > 0.5
    return {"crop_pos": (x, y), "flip": flip}


def _get_params3(cfg: DataConfig, size, win1, win2, rng) -> dict:
    """Crop window containing BOTH face windows (base_dataset.py:102-150)."""
    w, h = size
    x1 = min(win1[0], win2[0]) / w
    x2 = max(win1[1], win2[1]) / w
    y1 = min(win1[2], win2[2]) / h
    y2 = max(win1[3], win2[3]) / h
    new_w = new_h = cfg.load_size
    xa = max(0, int(round(x2 * new_w)) - cfg.crop_size)
    xb = min(max(0, new_w - cfg.crop_size), int(round(x1 * new_w)))
    x = int(rng.integers(xa, max(xa, xb) + 1))
    ya = max(0, int(round(y2 * new_h)) - cfg.crop_size)
    yb = min(max(0, new_h - cfg.crop_size), int(round(y1 * new_h)))
    y = int(rng.integers(ya, max(ya, yb) + 1))
    flip = (not cfg.no_flip) and rng.random() > 0.5
    return {"crop_pos": (x, y), "flip": flip}


def trans_lm(lm: np.ndarray, params: dict, cfg: DataConfig, size,
             win=None) -> tuple[np.ndarray, np.ndarray]:
    """Landmark transform + face window (umlvdfw_test_dataset.py:12-31)."""
    w, h = size
    tx, ty = params["crop_pos"]
    lm = lm.copy()
    lm[:, 0] = lm[:, 0] * cfg.load_size / w - tx
    lm[:, 1] = lm[:, 1] * cfg.load_size / h - ty
    if params["flip"]:
        lm[:, 0] = cfg.crop_size - lm[:, 0]
        lm = lm[FLIP_REMAP]
    if win is None:
        x1 = int(round(cfg.rx * cfg.load_size - tx))
        x2 = x1 + int(round(cfg.rs * cfg.load_size))
        y1 = int(round(cfg.ry * cfg.load_size - ty))
        y2 = y1 + int(round(cfg.rs * cfg.load_size))
    else:
        x1 = int(round(win[0] * cfg.load_size / w - tx))
        x2 = int(round(win[1] * cfg.load_size / w - tx))
        y1 = int(round(win[2] * cfg.load_size / h - ty))
        y2 = int(round(win[3] * cfg.load_size / h - ty))
    if params["flip"]:
        x1, x2 = cfg.crop_size - x2, cfg.crop_size - x1
    return lm, np.array([x1, x2, y1, y2], np.int32)


def draw_dots(lm: np.ndarray, crop_size: int) -> np.ndarray:
    import cv2

    radius = 5 if crop_size == 512 else 3
    img = np.zeros((crop_size, crop_size), np.uint8)
    for (x, y) in np.round(lm).astype(int):
        cv2.circle(img, (int(x), int(y)), radius, 255, -1)
    return (img[..., None].astype(np.float32) / 255.0) * 2 - 1


class UMLVDIFWDataset:
    """Index-addressable dataset; `sample(index, rng)` returns one item
    dict of numpy arrays matching the train step's batch spec."""

    def __init__(self, cfg: DataConfig):
        self.cfg = cfg
        root = cfg.root
        self.A_paths = sorted(
            glob.glob(os.path.join(root, "Photo", "**", "*.png"),
                      recursive=True)
            + glob.glob(os.path.join(root, "Photo", "**", "*.jpg"),
                        recursive=True))
        self.B_paths = sorted(
            glob.glob(os.path.join(root, cfg.style_dir, "**", "*.png"),
                      recursive=True))
        self.B_paths = [p for p in self.B_paths
                        if "scanner_frag" not in p]
        if np.isfinite(cfg.max_dataset_size):
            cap = int(cfg.max_dataset_size)
            self.A_paths = self.A_paths[:cap]
            self.B_paths = self.B_paths[:cap]
        self.B12_paths = []
        if cfg.use_clips:
            for clip in range(34):
                frames = sorted(glob.glob(os.path.join(
                    root, cfg.style_dir, f"scanner_frag_{clip}_MTCNN",
                    "*.png")))
                if frames:
                    self.B12_paths.append(frames)

    def __len__(self):
        return max(len(self.A_paths), len(self.B_paths))

    def b_index(self, index: int, rng: np.random.Generator) -> int:
        """B pairing: deterministic under --serial_batches, randomized
        for training (umlvd_ifw_dataset.py:151-155)."""
        if self.cfg.serial_batches:
            return index % len(self.B_paths)
        return int(rng.integers(0, len(self.B_paths)))

    # --- path helpers over the reference layout ---
    def _lm_img(self, p, kind):
        sub = "/Alm/MTCNN/" if kind == "A" else "/Blm/MTCNN/"
        src = "/Photo/" if kind == "A" else f"/{self.cfg.style_dir}/"
        return p.replace(src, sub)

    def _lm_txt(self, p, kind):
        sub = "/Alm_txt/MTCNN/" if kind == "A" else "/Blm_txt/MTCNN/"
        src = "/Photo/" if kind == "A" else f"/{self.cfg.style_dir}/"
        return os.path.splitext(p.replace(src, sub))[0] + ".txt"

    def _mask(self, p, kind, part):
        sub = f"/Amask/{part}/" if kind == "A" else f"/Bmask/{part}/"
        src = "/Photo/" if kind == "A" else f"/{self.cfg.style_dir}/"
        return p.replace(src, sub)

    def _read_lm(self, path):
        rows = open(path).read().splitlines()
        return np.array([[float(e.split()[0]), float(e.split()[1])]
                         for e in rows], np.float32)

    def sample(self, index: int, rng: np.random.Generator) -> dict:
        cfg = self.cfg
        ls, cs = cfg.load_size, cfg.crop_size
        A_path = self.A_paths[index % len(self.A_paths)]
        B_path = self.B_paths[self.b_index(index, rng)]

        def load_group(path, kind, params_src_size, params):
            img = _load_img(path, grayscale=(
                (cfg.input_nc if kind == "A" else cfg.output_nc) == 1),
                size=ls)
            lm_img = _load_img(self._lm_img(path, kind), grayscale=True,
                               size=ls)
            lm68 = self._read_lm(self._lm_txt(path, kind))
            lm68, win = trans_lm(lm68, params, cfg, params_src_size)
            out = {
                "img": _to_tensor(img, params["crop_pos"], cs,
                                  params["flip"]),
                "lm_img": _to_tensor(lm_img, params["crop_pos"], cs,
                                     params["flip"]),
                "lm68": lm68, "win": win,
            }
            for part, key in (("nose", "mask"), ("eyes", "maske"),
                              ("lips", "maskl")):
                m = _load_img(self._mask(path, kind, part),
                              grayscale=True, size=ls)
                out[key] = _to_tensor(m, params["crop_pos"], cs,
                                      params["flip"], normalize=False)
            return out

        from PIL import Image

        A_size = Image.open(A_path).size
        B_size = Image.open(B_path).size
        pA = _get_params2(cfg, A_size, rng)
        pB = _get_params2(cfg, B_size, rng)
        A = load_group(A_path, "A", A_size, pA)
        B = load_group(B_path, "B", B_size, pB)

        item = {
            "real_A": A["img"], "real_B": B["img"],
            "A_lm": A["lm_img"], "A_lm_68": A["lm68"], "winA": A["win"],
            "Br_mask": B["mask"], "Br_maske": B["maske"],
            "Br_maskl": B["maskl"], "winBr": B["win"],
        }

        # film-clip consecutive pair for the coherence D
        if self.B12_paths:
            ci = int(rng.integers(0, len(self.B12_paths)))
            fi = int(rng.integers(0, len(self.B12_paths[ci]) - 1))
            B1_path = self.B12_paths[ci][fi]
            B2_path = self.B12_paths[ci][fi + 1]
            def read_win(p):
                vals = open(os.path.splitext(self._lm_txt(p, "B"))[0]
                            + "_win.txt").read().split()
                return np.array([float(v) for v in vals[:4]], np.float32)

            win1 = read_win(B1_path)
            win2 = read_win(B2_path)
            B1_size = Image.open(B1_path).size
            p1 = _get_params3(cfg, B1_size, win1, win2, rng)
            for name, path in (("B1_img", B1_path), ("B2_img", B2_path)):
                img = _load_img(path, grayscale=cfg.output_nc == 1,
                                size=ls)
                item[name] = _to_tensor(img, p1["crop_pos"], cs,
                                        p1["flip"])
            if cfg.coh_use_more:
                for name in ("B3", "B4"):
                    cj = int(rng.integers(0, len(self.B12_paths)))
                    fj = int(rng.integers(0, len(self.B12_paths[cj])))
                    img = _load_img(self.B12_paths[cj][fj],
                                    grayscale=cfg.output_nc == 1, size=ls)
                    item[name] = _to_tensor(img, pB["crop_pos"], cs,
                                            pB["flip"])
        else:
            z = np.zeros((cs, cs, cfg.output_nc), np.float32)
            item.update({"B1_img": z, "B2_img": z, "B3": z, "B4": z})

        # 3-way target sampling (umlvd_ifw_dataset.py:278-372)
        r = rng.random()
        if self.B12_paths and r <= cfg.select_target12_thre:
            # consecutive video frames become the targets — re-derive their
            # landmark data under the SAME transform p1
            lm1 = self._read_lm(self._lm_txt(B1_path, "B"))
            lm2 = self._read_lm(self._lm_txt(B2_path, "B"))
            lm1, w1 = trans_lm(lm1, p1, cfg, B1_size, win1)
            lm2, w2 = trans_lm(lm2, p1, cfg, B1_size, win2)
            item.update({
                "tB_lm_68": lm1, "tB2_lm_68": lm2,
                "tB_lm": draw_dots(lm1, cs), "tB2_lm": draw_dots(lm2, cs),
                "winB": w1, "winB2": w2,
            })
            for part, key in (("nose", "mask"), ("eyes", "maske"),
                              ("lips", "maskl")):
                m1 = _load_img(self._mask(B1_path, "B", part),
                               grayscale=True, size=ls)
                m2 = _load_img(self._mask(B2_path, "B", part),
                               grayscale=True, size=ls)
                item[f"B_{key}"] = _to_tensor(
                    m1, p1["crop_pos"], cs, p1["flip"], normalize=False)
                item[f"B2_{key}"] = _to_tensor(
                    m2, p1["crop_pos"], cs, p1["flip"], normalize=False)
        else:
            if r <= cfg.select_noniden_thre:
                base_lm, base_lm_img = B["lm68"], B["lm_img"]
                base_win, src = B["win"], B
            else:
                base_lm, base_lm_img = A["lm68"], A["lm_img"]
                base_win, src = A["win"], A
            offset = rng.random(base_lm.shape).astype(np.float32) \
                * cfg.max_offset
            off2 = rng.random((1, 2)).astype(np.float32) * cfg.max_offset
            offset[48:68] = off2
            lm2 = base_lm + offset
            item.update({
                "tB_lm_68": base_lm.copy(), "tB2_lm_68": lm2,
                "tB_lm": base_lm_img.copy(), "tB2_lm": draw_dots(lm2, cs),
                "winB": base_win.copy(), "winB2": base_win.copy(),
                "B_mask": src["mask"].copy(),
                "B2_mask": src["mask"].copy(),
                "B_maske": src["maske"].copy(),
                "B2_maske": src["maske"].copy(),
                "B_maskl": src["maskl"].copy(),
                "B2_maskl": src["maskl"].copy(),
            })

        # static stylization of the photo (warp_loss==2 / identity_loss==2)
        fakeBs = A_path.replace("/Photo/", "/fakeB_static/")
        img = _load_img(fakeBs, grayscale=cfg.output_nc == 1, size=ls)
        item["fakeB_static"] = _to_tensor(img, pA["crop_pos"], cs,
                                          pA["flip"])

        # Delaunay simplices of the two warp-target control-point sets:
        # the only part of the reference's per-item griddata grids
        # (umlvd_ifw_dataset.py:409-425) that resists XLA. ~100 us each
        # here; the dense grid evaluation runs inside the jitted train
        # step (ops.tps.linear_motion_grid) with EXACT griddata-linear
        # semantics.
        from animateportrait_tpu.ops.tps import triangulate_frames
        item["tri_motion"] = triangulate_frames(
            item["tB_lm_68"][None], cs)[0]
        item["tri_motion2"] = triangulate_frames(
            item["tB2_lm_68"][None], cs)[0]
        return item

    def batch(self, indices, rng: np.random.Generator,
              num_threads: int = 0) -> dict:
        """Assemble a batch. num_threads > 1 samples items on a thread
        pool (the torch-DataLoader-workers equivalent; the native image
        decode and numpy release the GIL). Per-item RNG streams are
        seeded from ``rng`` so results are deterministic for a given rng
        state regardless of thread scheduling (but differ from the
        sequential shared-stream order)."""
        if num_threads and num_threads > 1 and len(indices) > 1:
            from concurrent.futures import ThreadPoolExecutor

            if getattr(self, "_pool", None) is None or \
                    self._pool_size != num_threads:
                if getattr(self, "_pool", None) is not None:
                    self._pool.shutdown(wait=False)
                self._pool = ThreadPoolExecutor(max_workers=num_threads)
                self._pool_size = num_threads
            seeds = rng.integers(0, 2 ** 63 - 1, size=len(indices))
            items = list(self._pool.map(
                lambda iz: self.sample(
                    iz[0], np.random.default_rng(iz[1])),
                zip(indices, seeds)))
        else:
            items = [self.sample(i, rng) for i in indices]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}
