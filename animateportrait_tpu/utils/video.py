"""Video/audio output: frame sink + muxing without the ffmpeg CLI.

The reference shells out to ffmpeg for frames->mp4 and audio muxing
(`main_end2end_module2.py:306-307,123-127`). This environment has no ffmpeg
binary, so frames are encoded with cv2.VideoWriter (MJPG/AVI or mp4v when
available) and the speech track is written alongside as WAV; `mux_avi`
interleaves both into a single AVI container in pure Python.
"""
from __future__ import annotations

import struct
import wave

import numpy as np


def frames_to_uint8(frames: np.ndarray) -> np.ndarray:
    """[-1, 1] float frames (T, H, W, C) -> uint8 RGB/gray."""
    x = np.clip((frames + 1.0) * 127.5, 0, 255).astype(np.uint8)
    if x.shape[-1] == 1:
        x = np.repeat(x, 3, axis=-1)
    return x


def write_video(path: str, frames: np.ndarray, fps: float = 62.5) -> str:
    """Write frames ([-1,1] float or uint8 RGB) to an AVI/MP4 file."""
    import cv2

    if frames.dtype != np.uint8:
        frames = frames_to_uint8(frames)
    if frames.shape[-1] == 1:  # uint8 gray input: VideoWriter needs 3ch
        frames = np.repeat(frames, 3, axis=-1)
    h, w = frames.shape[1:3]
    fourcc = cv2.VideoWriter_fourcc(*("MJPG" if path.endswith(".avi")
                                      else "mp4v"))
    vw = cv2.VideoWriter(path, fourcc, fps, (w, h))
    if not vw.isOpened():  # codec fallback
        path = path.rsplit(".", 1)[0] + ".avi"
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps,
                             (w, h))
    for f in frames:
        vw.write(f[:, :, ::-1])  # RGB -> BGR
    vw.release()
    return path


def write_wav(path: str, wav: np.ndarray, sr: int = 16000) -> str:
    x = np.clip(np.asarray(wav) * 32768.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return path


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def mux_avi(path: str, jpeg_frames: list[bytes], wav: np.ndarray,
            fps: float = 62.5, sr: int = 16000,
            size: tuple[int, int] = (256, 256)) -> str:
    """Interleave MJPEG frames + 16-bit PCM audio into one AVI file.

    A minimal pure-Python AVI writer (RIFF/AVI with 'movi' chunks and an
    idx1 index) — the ffmpeg-free muxer for environments without ffmpeg.
    """
    w, h = size
    pcm = np.clip(np.asarray(wav) * 32768.0, -32768, 32767).astype(
        np.int16).tobytes()
    n_frames = len(jpeg_frames)
    samples_per_frame = int(round(sr / fps))
    bytes_per_frame = samples_per_frame * 2

    # Accumulate chunks in lists and join once: `bytes +=` in a loop is
    # O(n^2) and dominated an 800-frame mux (~34 s; joined form is ~1 s).
    movi_parts = [b"movi"]
    idx_parts = []
    offset = 4
    for i in range(n_frames):
        vchunk = _chunk(b"00dc", jpeg_frames[i])
        idx_parts.append(b"00dc" + struct.pack("<III", 0x10, offset,
                                               len(jpeg_frames[i])))
        movi_parts.append(vchunk)
        offset += len(vchunk)
        a = pcm[i * bytes_per_frame: (i + 1) * bytes_per_frame]
        if a:
            achunk = _chunk(b"01wb", a)
            idx_parts.append(b"01wb" + struct.pack("<III", 0x10, offset,
                                                   len(a)))
            movi_parts.append(achunk)
            offset += len(achunk)
    movi = b"".join(movi_parts)
    idx = b"".join(idx_parts)

    usec_per_frame = int(round(1e6 / fps))
    avih = _chunk(b"avih", struct.pack(
        "<14I", usec_per_frame, 0, 0, 0x10, n_frames, 0, 2, 0, w, h,
        0, 0, 0, 0))
    # video stream header
    strh_v = _chunk(b"strh", b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, usec_per_frame, 1000000,
        0, n_frames, 0, 0, 0, 0, 0, w, h))
    strf_v = _chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0))
    strl_v = _chunk(b"LIST", b"strl" + strh_v + strf_v)
    # audio stream header
    strh_a = _chunk(b"strh", b"auds" + b"\x00" * 4 + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, sr, 0, len(pcm) // 2, 0, 2,
        0, 0, 0, 0, 0))
    strf_a = _chunk(b"strf", struct.pack(
        "<HHIIHH", 1, 1, sr, sr * 2, 2, 16))
    strl_a = _chunk(b"LIST", b"strl" + strh_a + strf_a)

    hdrl = _chunk(b"LIST", b"hdrl" + avih + strl_v + strl_a)
    movi_list = _chunk(b"LIST", movi)
    idx1 = _chunk(b"idx1", idx)
    riff = b"AVI " + hdrl + movi_list + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    return path


def write_video_with_audio(path: str, frames: np.ndarray, wav: np.ndarray,
                           fps: float = 62.5, sr: int = 16000,
                           jpeg_quality: int = 95) -> str:
    """Frames + audio -> one AVI (MJPEG + PCM) via the pure-Python muxer."""
    import cv2

    if frames.dtype != np.uint8:
        frames = frames_to_uint8(frames)
    if frames.shape[-1] == 1:  # strf header declares 24-bit; expand gray
        frames = np.repeat(frames, 3, axis=-1)
    jpegs = []
    for f in frames:
        ok, buf = cv2.imencode(
            ".jpg", f[:, :, ::-1],
            [int(cv2.IMWRITE_JPEG_QUALITY), jpeg_quality])
        assert ok
        jpegs.append(buf.tobytes())
    h, w = frames.shape[1:3]
    return mux_avi(path, jpegs, wav, fps=fps, sr=sr, size=(w, h))
