"""Observability: loss logging, image-grid HTML dumps, profiler hooks.

Visdom-free replacement for the reference's Visualizer
(`Module2/util/visualizer.py`): scalar losses go to `loss_log.txt` (same
format, :91-94,176+) and stdout; image snapshots go to a static HTML
gallery (`util/html.py` equivalent, no dominate dependency); profiling
uses `jax.profiler` traces — a capability the reference lacks entirely
(SURVEY.md §5: wall-clock prints only).
"""
from __future__ import annotations

import contextlib
import json
import os
import time

import numpy as np


class LossLogger:
    """Append-only scalar log: stdout + loss_log.txt + metrics.jsonl."""

    def __init__(self, directory: str, name: str = "experiment"):
        self.dir = os.path.join(directory, name)
        os.makedirs(self.dir, exist_ok=True)
        self.log_path = os.path.join(self.dir, "loss_log.txt")
        self.jsonl_path = os.path.join(self.dir, "metrics.jsonl")
        with open(self.log_path, "a") as f:
            now = time.strftime("%c")
            f.write(f"================ Training Loss ({now}) ================\n")
        self._t_last = time.time()

    def log(self, epoch: int, iters: int, losses: dict,
            t_comp: float | None = None, t_data: float | None = None):
        """Reference print format (visualizer.py:176-190)."""
        t_comp = t_comp if t_comp is not None else time.time() - self._t_last
        self._t_last = time.time()
        msg = "(epoch: %d, iters: %d, time: %.3f, data: %.3f) " % (
            epoch, iters, t_comp, t_data or 0.0)
        for k, v in losses.items():
            msg += "%s: %.3f " % (k, float(v))
        print(msg)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(
                {"epoch": epoch, "iters": iters,
                 **{k: float(v) for k, v in losses.items()}}) + "\n")

    def save_visuals(self, visuals: dict, epoch: int,
                     iters: int | None = None, update_html: bool = True):
        """Image snapshot gallery: <dir>/web/images + index.html.

        Reference visualizer parity (visualizer.py:107-143 + util/html.py,
        no visdom server): each call saves one labeled snapshot row; the
        HTML index lists snapshots newest-first like the reference's
        epoch-header gallery. ``iters`` distinguishes mid-epoch snapshots
        (display_freq cadence); ``update_html`` gates the index rewrite
        (update_html_freq / --no_html)."""
        import cv2

        img_dir = os.path.join(self.dir, "web", "images")
        os.makedirs(img_dir, exist_ok=True)
        tag = (f"epoch{epoch:03d}_iter{iters:07d}" if iters is not None
               else f"epoch{epoch:03d}")
        for label, img in visuals.items():
            arr = np.asarray(img)
            if arr.ndim == 4:
                arr = arr[0]
            if arr.dtype != np.uint8:
                arr = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
            if arr.shape[-1] == 1:
                arr = np.repeat(arr, 3, axis=-1)
            fn = f"{tag}_{label}.png"
            cv2.imwrite(os.path.join(img_dir, fn), arr[:, :, ::-1])
        if update_html:
            self.write_html_index()

    def write_html_index(self):
        """(Re)write <dir>/web/index.html with ALL snapshots on disk,
        newest first (util/html.py gallery equivalent).

        Rebuilt from the images directory, not the in-memory list: the
        reference gallery accumulates every epoch header for the life of
        the experiment, so a resumed run (fresh logger) or a run past
        the in-memory cap must not drop older snapshots from the index.
        """
        import re

        index = os.path.join(self.dir, "web", "index.html")
        img_dir = os.path.join(self.dir, "web", "images")
        os.makedirs(img_dir, exist_ok=True)
        pat = re.compile(r"^(epoch(\d+)(?:_iter(\d+))?)_(.+)\.png$")
        groups: dict[tuple, list] = {}
        for fn in os.listdir(img_dir):
            m = pat.match(fn)
            if not m:
                continue
            tag, ep, it, label = m.groups()
            key = (int(ep), -1 if it is None else int(it), tag)
            groups.setdefault(key, []).append((label, fn))
        with open(index, "w") as f:
            f.write("<html><body><h1>Training results</h1>\n")
            for (ep, it, tag) in sorted(groups, reverse=True):
                title = (f"epoch [{ep}] iters [{it}]" if it >= 0
                         else f"epoch [{ep}]")
                f.write(f"<h3>{title}</h3><table><tr>\n")
                for label, fn in sorted(groups[(ep, it, tag)]):
                    f.write(f"<td><p>{label}</p>"
                            f"<img src='images/{fn}' width=256></td>\n")
                f.write("</tr></table>\n")
            f.write("</body></html>\n")


def draw_lm_overlay(img, lm, win=None, hradius: int = 2) -> np.ndarray:
    """Landmark-overlay self-check image (`fake_B_lm_68_vis`/`_vist`):
    red squares at each landmark plus the face-window rectangle, drawn the
    reference way (channel 0 := 1, others := -1 in +-hradius windows;
    geomgm_ifw_fore_model.py get_lmvis / geomcgt_ifw_test_model.py:228-252).

    img: (H, W, C) or (N, H, W, C) in [-1, 1] (first item used);
    lm: (68, 2) or (N, 68, 2) (x, y) pixels; win: (4,) or (N, 4)
    [x1, x2, y1, y2]. Returns (H, W, 3) float in [-1, 1].
    """
    a = np.asarray(img, np.float32)
    if a.ndim == 4:
        a = a[0]
    if a.shape[-1] == 1:
        a = np.repeat(a, 3, axis=-1)
    out = a.copy()
    H, W = out.shape[:2]
    L = np.asarray(lm)
    if L.ndim == 3:
        L = L[0]

    def mark(y0, y1, x0, x1):
        y0, y1 = max(0, y0), min(H, y1)
        x0, x1 = max(0, x0), min(W, x1)
        if y0 < y1 and x0 < x1:
            out[y0:y1, x0:x1, 0] = 1.0
            out[y0:y1, x0:x1, 1:] = -1.0

    for k in range(L.shape[0]):
        x = int(round(float(L[k, 0])))
        y = int(round(float(L[k, 1])))
        mark(y - hradius, y + hradius, x - hradius, x + hradius)
    if win is not None:
        w = np.asarray(win).reshape(-1, 4)[0].astype(int)
        x1, x2, y1, y2 = w
        mark(y1 - hradius, y1 + hradius, x1 - hradius, x2 + hradius)
        mark(y2 - hradius, y2 + hradius, x1 - hradius, x2 + hradius)
        mark(y1 - hradius, y2 + hradius, x1 - hradius, x1 + hradius)
        mark(y1 - hradius, y2 + hradius, x2 - hradius, x2 + hradius)
    return out


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context — open in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock stats (compute/data split like train.py:26-47)."""

    def __init__(self):
        self.t0 = time.time()
        self.data_s = 0.0
        self.comp_s = 0.0

    def data_done(self):
        now = time.time()
        self.data_s = now - self.t0
        self.t0 = now

    def step_done(self):
        now = time.time()
        self.comp_s = now - self.t0
        self.t0 = now
        return self.comp_s, self.data_s


def grad_norms(grads) -> dict:
    """Per-loss gradient-norm measurement (the reference's CalcGradNorm
    context manager, intrinsic_flow_models/modules.py:180, and
    diagnose_network's mean-|grad|, Module2/util/util.py:32-48): returns
    {'global_norm': ..., 'mean_abs': ...} for a gradient PyTree."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(grads)
    sq = sum(jnp.sum(jnp.square(g)) for g in leaves)
    total = sum(jnp.sum(jnp.abs(g)) for g in leaves)
    count = sum(g.size for g in leaves)
    return {"global_norm": jnp.sqrt(sq), "mean_abs": total / max(count, 1)}


class Record:
    """Loss tracker (Module1/util/utils.py:31-64), exact semantics —
    including add() accumulating the same value into every tracked key."""

    def __init__(self, type_list):
        self.data = {t: 0.0 for t in type_list}
        self.count = {t: 0.0 for t in type_list}
        self.type_list = type_list
        self.max_min_data = None

    def add(self, new_data, c: float = 1.0):
        for t in self.type_list:
            self.data[t] += new_data
            self.count[t] += c

    def per(self, t):
        return self.data[t] / (self.count[t] + 1e-32)

    def clean(self, t):
        self.data[t], self.count[t] = 0.0, 0.0

    def is_better(self, t, greater: bool) -> bool:
        if self.max_min_data is None:
            self.max_min_data = self.data[t]
            return True
        if (self.data[t] > self.max_min_data if greater
                else self.data[t] < self.max_min_data):
            self.max_min_data = self.data[t]
            return True
        return False


def enable_compile_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (idempotent).

    The JAX_COMPILATION_CACHE_DIR env var is not read by this JAX
    version's config, so setting it has no effect — the cache must be
    enabled via jax.config.update. Verified working through the axon
    remote-compile backend."""
    import os

    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/animateportrait_jax"))
    # AP_CACHE_MIN_SECS=0 caches EVERY executable including the sub-1s
    # eager-dispatch programs flax inits emit by the hundreds (the
    # tests' conftest does the equivalent); measured NEUTRAL for the
    # fresh-interpreter multihost test (its warm cost is tracing, not
    # compile churn) — the 1.0 default keeps production cache dirs lean
    try:
        min_secs = float(os.environ.get("AP_CACHE_MIN_SECS", "1.0"))
    except ValueError:
        min_secs = 1.0  # cache config must never abort a run
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
        if min_secs <= 0:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              -1)
    except Exception:
        pass  # older jax without the knobs: run uncached
