"""Offline track analysis + bass-drop detection.

Rebuild of ``ComponentFramework/ReelExport.{h,cpp}``: decode an audio
file to mono (``ReelExport.cpp:24-67``), compute per-video-frame band
envelopes with the shared DSP (``:101-149``), and detect bass drops with
an adaptive rolling threshold (``:71-99``).  Pure host-side — no GL, no
device code (the reference keeps this module "Pure CPU" by design,
``ReelExport.h:6``).

WAV decodes natively (scipy.io.wavfile).  MP3 has no decoder in this
environment; ``decode_to_mono`` raises a clear error for it (gated, not
silently dropped).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Tuple

import numpy as np

from sph_tpu.audio import bands as B


@dataclasses.dataclass
class ReelAnalysis:
    """Per-frame band envelopes for a track (``ReelExport.h:8-16``)."""
    frame_count: int = 0
    sample_rate: int = 0
    bass: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.float32))
    mid: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.float32))
    treble: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.float32))
    error: str = ""

    @property
    def ok(self) -> bool:
        return self.frame_count > 0 and not self.error


def decode_to_mono(path: str) -> Tuple[np.ndarray, int]:
    """Decode .wav to (mono float32, sample_rate), downmixing channels
    equally (``ReelExport.cpp:36-41``). Raises ValueError on failure."""
    if not path:
        raise ValueError("no audio file given")
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        from scipy.io import wavfile
        rate, data = wavfile.read(path)
        if data.ndim == 0 or data.size == 0:
            raise ValueError("empty audio")
        if data.dtype == np.int16:
            mono_src = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            mono_src = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            mono_src = (data.astype(np.float32) - 128.0) / 128.0
        else:
            mono_src = data.astype(np.float32)
        if mono_src.ndim == 2:
            mono_src = mono_src.mean(axis=1)
        return np.ascontiguousarray(mono_src, np.float32), int(rate)
    if ext == ".mp3":
        raise ValueError(
            "MP3 decode is not available in this environment "
            "(no decoder library); convert to WAV first")
    raise ValueError("unsupported file type (use .wav or .mp3)")


def detect_drops(bass: np.ndarray, fps: int,
                 min_gap_sec: float = 8.0) -> List[float]:
    """Bass-drop times (seconds) via rising edges over an adaptive
    threshold ``max(0.25, 1.6 * rolling-4s-mean)``; the rolling window
    trails BEHIND the current frame so a drop doesn't raise its own
    threshold; at most 16 drops (``ReelExport.cpp:71-99``)."""
    drops: List[float] = []
    bass = np.asarray(bass, np.float32)
    if fps <= 0 or len(bass) < 2:
        return drops
    win = max(1, 4 * fps)
    min_gap = max(0.0, min_gap_sec)
    roll_sum, roll_n = 0.0, 0
    last_drop = -1e9
    above = False
    for i, b in enumerate(bass):
        avg = roll_sum / roll_n if roll_n > 0 else 0.0
        th = max(0.25, 1.6 * avg)
        hot = b > th
        t = i / float(fps)
        if hot and not above and t - last_drop >= min_gap:
            drops.append(t)
            last_drop = t
            if len(drops) >= 16:
                break
        above = hot
        roll_sum += float(b)
        roll_n += 1
        if roll_n > win:
            roll_sum -= float(bass[i - win])
            roll_n -= 1
    return drops


def analyze_track(path: str, fps: int = 30,
                  max_seconds: float = 0.0) -> ReelAnalysis:
    """Full offline analysis (``ReelExport.cpp:101-149``): decode, trim
    to max_seconds, per-frame band envelopes with the live reactor's
    default attack/release (15/250 ms), clamped to 4.0."""
    out = ReelAnalysis()
    if fps <= 0:
        fps = 30
    try:
        mono, rate = decode_to_mono(path)
    except (ValueError, OSError) as e:
        out.error = str(e)
        return out
    if rate == 0 or len(mono) == 0:
        out.error = "empty audio"
        return out
    out.sample_rate = rate
    if max_seconds > 0.0:
        cap = int(max_seconds * rate)
        if 0 < cap < len(mono):
            mono = mono[:cap]
    bass, mid, treble, _ = B.process_frames(
        mono, float(rate), fps,
        attack_ms=B.DEFAULT_ATTACK_MS, release_ms=B.DEFAULT_RELEASE_MS)
    if len(bass) == 0:
        out.error = "track too short for one frame"
        return out
    out.frame_count = len(bass)
    out.bass, out.mid, out.treble = bass, mid, treble
    return out
