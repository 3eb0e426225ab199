"""Bass/Mid/Treble band-split + envelope DSP.

Rebuild of the reference's shared DSP (``ComponentFramework/AudioBands.h``)
used by BOTH the live reactor and the offline reel analyzer so they
produce identical band values (``AudioBands.h:4-7``):

- one-pole band split: bass = LP 150 Hz; mid = LP 2 kHz then HP 250 Hz;
  treble = HP 2.8 kHz (``AudioBands.h:44-58``),
- attack/release peak-envelope follower (``AudioBands.h:33-36``),
- envelopes clamped to 4.0 when sampled (``AudioReactive.cpp:150-154``).

The per-sample recurrence is sequential, so the fast path is the native
C++ core (``sph_tpu/native/audio_dsp.cpp``); ``process_frames_scan`` is
a ``lax.scan`` fallback with identical semantics.
"""
from __future__ import annotations

import ctypes
import dataclasses
import math
from typing import Tuple

import numpy as np

from sph_tpu import native

ENV_CLAMP = 4.0
BASS_HZ = 150.0
MID_LP_HZ = 2000.0
MID_HP_HZ = 250.0
TREBLE_HZ = 2800.0
DEFAULT_ATTACK_MS = 15.0
DEFAULT_RELEASE_MS = 250.0


def filter_alpha(fc_hz: float, fs_hz: float) -> float:
    """One-pole lowpass smoothing coefficient (``AudioBands.h:14-16``)."""
    return 1.0 - math.exp(-2.0 * math.pi * fc_hz / fs_hz)


def envelope_coeff(tc_ms: float, fs_hz: float) -> float:
    """Envelope follower coefficient for time constant tc_ms
    (``AudioBands.h:19-21``)."""
    return 1.0 - math.exp(-1000.0 / (max(tc_ms, 0.1) * fs_hz))


@dataclasses.dataclass
class BandState:
    """Filter + envelope state (``AudioBands.h:38-41``)."""
    lp_bass: float = 0.0
    lp_mid_hi: float = 0.0
    lp_mid_lo: float = 0.0
    lp_treble: float = 0.0
    env_bass: float = 0.0
    env_mid: float = 0.0
    env_treble: float = 0.0

    def as_array(self) -> np.ndarray:
        return np.array([self.lp_bass, self.lp_mid_hi, self.lp_mid_lo,
                         self.lp_treble, self.env_bass, self.env_mid,
                         self.env_treble], np.float32)

    @classmethod
    def from_array(cls, a) -> "BandState":
        return cls(*(float(x) for x in a))


def process_sample(mono: float, s: BandState, fs: float,
                   attack_coeff: float, release_coeff: float
                   ) -> Tuple[float, float, float]:
    """One sample through the band filters + envelopes (reference
    ``ProcessSample``). Returns the instantaneous (bass, mid, treble)
    band values; envelopes live in ``s``."""
    a_bass = filter_alpha(BASS_HZ, fs)
    a_mid_hi = filter_alpha(MID_LP_HZ, fs)
    a_mid_lo = filter_alpha(MID_HP_HZ, fs)
    a_treble = filter_alpha(TREBLE_HZ, fs)

    s.lp_bass += a_bass * (mono - s.lp_bass)
    s.lp_mid_hi += a_mid_hi * (mono - s.lp_mid_hi)
    s.lp_mid_lo += a_mid_lo * (s.lp_mid_hi - s.lp_mid_lo)
    mid = s.lp_mid_hi - s.lp_mid_lo
    s.lp_treble += a_treble * (mono - s.lp_treble)
    treble = mono - s.lp_treble

    for attr, r in (("env_bass", abs(s.lp_bass)), ("env_mid", abs(mid)),
                    ("env_treble", abs(treble))):
        env = getattr(s, attr)
        c = attack_coeff if r > env else release_coeff
        setattr(s, attr, env + c * (r - env))
    return s.lp_bass, mid, treble


def _frame_ends(n_samples: int, fs: float, fps: int) -> np.ndarray:
    """Frame boundaries matching ``ReelExport.cpp:138``:
    ``round((f+1) * fs/fps)`` clipped to n_samples."""
    spf = fs / float(fps)
    n_frames = int(math.floor(n_samples / spf))
    ends = np.rint((np.arange(1, n_frames + 1, dtype=np.float64)) * spf)
    return np.minimum(ends, n_samples).astype(np.int64)


def process_frames(mono: np.ndarray, fs: float, fps: int,
                   attack_ms: float = DEFAULT_ATTACK_MS,
                   release_ms: float = DEFAULT_RELEASE_MS,
                   state: BandState | None = None
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, BandState]:
    """Per-video-frame band envelopes over a mono track.

    Native C++ fast path with a lax.scan fallback; returns
    (bass[F], mid[F], treble[F], final_state), envelopes clamped to 4.0.
    """
    mono = np.ascontiguousarray(np.asarray(mono, np.float32))
    ends = _frame_ends(len(mono), fs, fps)
    n_frames = len(ends)
    state = state or BandState()
    if n_frames == 0:
        return (np.zeros(0, np.float32),) * 3 + (state,)

    lib = native.load("audio_dsp")
    if lib is not None:
        st = state.as_array()
        bass = np.empty(n_frames, np.float32)
        mid = np.empty(n_frames, np.float32)
        treble = np.empty(n_frames, np.float32)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.sph_audio_analyze(
            mono.ctypes.data_as(f32p), ctypes.c_int64(len(mono)),
            ends.ctypes.data_as(i64p), ctypes.c_int64(n_frames),
            ctypes.c_float(fs), ctypes.c_float(attack_ms),
            ctypes.c_float(release_ms), ctypes.c_float(ENV_CLAMP),
            st.ctypes.data_as(f32p), bass.ctypes.data_as(f32p),
            mid.ctypes.data_as(f32p), treble.ctypes.data_as(f32p))
        return bass, mid, treble, BandState.from_array(st)
    return _process_frames_scan(mono, ends, fs, attack_ms, release_ms, state)


def process_block(mono: np.ndarray, fs: float,
                  attack_ms: float = DEFAULT_ATTACK_MS,
                  release_ms: float = DEFAULT_RELEASE_MS,
                  state: BandState | None = None) -> BandState:
    """Process one sample block and return the updated state (the live
    reactor's per-packet path — envelopes are then read off the state)."""
    mono = np.ascontiguousarray(np.asarray(mono, np.float32))
    state = state or BandState()
    if len(mono) == 0:
        return state
    lib = native.load("audio_dsp")
    ends = np.asarray([len(mono)], np.int64)
    if lib is not None:
        st = state.as_array()
        scratch = np.empty(1, np.float32)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.sph_audio_analyze(
            mono.ctypes.data_as(f32p), ctypes.c_int64(len(mono)),
            ends.ctypes.data_as(i64p), ctypes.c_int64(1),
            ctypes.c_float(fs), ctypes.c_float(attack_ms),
            ctypes.c_float(release_ms), ctypes.c_float(ENV_CLAMP),
            st.ctypes.data_as(f32p), scratch.ctypes.data_as(f32p),
            scratch.ctypes.data_as(f32p), scratch.ctypes.data_as(f32p))
        return BandState.from_array(st)
    *_, new_state = _process_frames_scan(mono, ends, fs, attack_ms,
                                         release_ms, state)
    return new_state


def _process_frames_scan(mono, ends, fs, attack_ms, release_ms, state):
    """lax.scan fallback — bit-identical recurrence to the native core."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    coeffs = jnp.asarray([
        filter_alpha(BASS_HZ, fs), filter_alpha(MID_LP_HZ, fs),
        filter_alpha(MID_HP_HZ, fs), filter_alpha(TREBLE_HZ, fs),
        envelope_coeff(attack_ms, fs), envelope_coeff(release_ms, fs),
    ], jnp.float32)

    def step(s, x):
        lb, lmh, lml, lt, eb, em, et = s
        lb = lb + coeffs[0] * (x - lb)
        lmh = lmh + coeffs[1] * (x - lmh)
        lml = lml + coeffs[2] * (lmh - lml)
        mid = lmh - lml
        lt = lt + coeffs[3] * (x - lt)
        treble = x - lt

        def env(e, r):
            return e + jnp.where(r > e, coeffs[4], coeffs[5]) * (r - e)

        eb = env(eb, jnp.abs(lb))
        em = env(em, jnp.abs(mid))
        et = env(et, jnp.abs(treble))
        return (lb, lmh, lml, lt, eb, em, et), jnp.stack([eb, em, et])

    init = tuple(jnp.float32(v) for v in state.as_array())
    with jax.default_device(jax.devices("cpu")[0]):
        final, envs = lax.scan(step, init, jnp.asarray(mono))
    envs = np.minimum(np.asarray(envs), ENV_CLAMP)
    idx = np.asarray(ends) - 1
    bands = envs[idx]
    new_state = BandState.from_array(np.asarray(final))
    return (bands[:, 0].astype(np.float32), bands[:, 1].astype(np.float32),
            bands[:, 2].astype(np.float32), new_state)
