"""Torch checkpoint -> JAX parameter conversion helpers.

The reference ships PyTorch checkpoints (`.pth` state dicts, `.npy` MTCNN
weights). Our Flax modules keep torch-compatible parameter *layouts* for
recurrent layers (see ``animateportrait_tpu.nn.LSTMLayerTorch``) so conversion
is pure transposition / renaming, never re-derivation:

- Conv2d   OIHW -> HWIO
- Conv1d   OIW  -> WIO
- Linear   (O, I) -> (I, O)
- LSTM/GRU torch layout kept verbatim (w_ih (4H,I), ...)
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d weight (O, I, W) -> flax (W, I, O)."""
    return np.transpose(np.asarray(w), (2, 1, 0))


def conv_transpose2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, H, W) -> our ConvTranspose2dTorch
    kernel (H, W, O, I) for lax.conv_transpose(transpose_kernel=True) —
    no spatial flip; transpose_kernel handles the gradient formulation."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def conv_transpose2d(sd: Mapping[str, Any], name: str, bias: bool = True
                     ) -> dict:
    p = {"kernel": conv_transpose2d_kernel(sd[f"{name}.weight"])}
    if bias:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (O, I) -> flax Dense kernel (I, O)."""
    return np.transpose(np.asarray(w), (1, 0))


def lstm_params(sd: Mapping[str, Any], prefix: str, num_layers: int,
                bidirectional: bool = False) -> dict:
    """torch nn.LSTM state-dict slice -> our nn.LSTM param subtree.

    torch names: `{prefix}weight_ih_l{k}[_reverse]` etc.; our cells keep the
    identical (4H, I) layout so values copy through unchanged.
    """
    out: dict = {}
    for layer in range(num_layers):
        dirs = [("", f"layer{layer}")]
        if bidirectional:
            dirs.append(("_reverse", f"layer{layer}_rev"))
        for suffix, scope in dirs:
            out[scope] = {
                "w_ih": np.asarray(sd[f"{prefix}weight_ih_l{layer}{suffix}"]),
                "w_hh": np.asarray(sd[f"{prefix}weight_hh_l{layer}{suffix}"]),
                "b_ih": np.asarray(sd[f"{prefix}bias_ih_l{layer}{suffix}"]),
                "b_hh": np.asarray(sd[f"{prefix}bias_hh_l{layer}{suffix}"]),
            }
    return out


def gru_params(sd: Mapping[str, Any], prefix: str, num_layers: int) -> dict:
    """torch nn.GRU state-dict slice -> our nn.GRU param subtree."""
    out: dict = {}
    for layer in range(num_layers):
        out[f"layer{layer}"] = {
            "w_ih": np.asarray(sd[f"{prefix}weight_ih_l{layer}"]),
            "w_hh": np.asarray(sd[f"{prefix}weight_hh_l{layer}"]),
            "b_ih": np.asarray(sd[f"{prefix}bias_ih_l{layer}"]),
            "b_hh": np.asarray(sd[f"{prefix}bias_hh_l{layer}"]),
        }
    return out


def dense(sd: Mapping[str, Any], name: str, bias: bool = True) -> dict:
    p = {"kernel": linear_kernel(sd[f"{name}.weight"])}
    if bias:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def conv1d(sd: Mapping[str, Any], name: str, bias: bool = True) -> dict:
    p = {"kernel": conv1d_kernel(sd[f"{name}.weight"])}
    if bias:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def conv2d(sd: Mapping[str, Any], name: str, bias: bool = True) -> dict:
    p = {"kernel": conv2d_kernel(sd[f"{name}.weight"])}
    if bias:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def norm_affine(sd: Mapping[str, Any], name: str) -> dict:
    """GroupNorm/InstanceNorm/BatchNorm affine params -> flax scale/bias."""
    return {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def batchnorm(sd: Mapping[str, Any], name: str) -> tuple[dict, dict]:
    """torch BatchNorm -> (params, batch_stats) for flax nn.BatchNorm."""
    params = {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[f"{name}.running_mean"]),
        "var": np.asarray(sd[f"{name}.running_var"]),
    }
    return params, stats


def load_torch_statedict(path: str) -> dict[str, np.ndarray]:
    """Load a .pth state dict to plain numpy (CPU, no grad)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj and all(
        not hasattr(v, "numpy") for k, v in obj.items() if k != "state_dict"
    ):
        obj = obj["state_dict"]
    return {
        k: (v.detach().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in obj.items()
        if hasattr(v, "detach") or isinstance(v, np.ndarray)
    }


def strip_module_prefix(sd: Mapping[str, Any]) -> dict:
    """Remove a leading DataParallel 'module.' from each key (and only a
    leading one — inner names like 'submodule.' must survive)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }
