"""Audio DSP tests (SURVEY.md §4: envelopes against synthetic tones,
drop detection on synthetic bass lines, wav decode round-trip)."""
import math
import os

import numpy as np
import pytest

from sph_tpu.audio import bands as B
from sph_tpu.audio.analyze import analyze_track, decode_to_mono, detect_drops
from sph_tpu.audio.reactive import AudioReactive, ToneSource

FS = 48000.0


def _tone(hz, seconds, fs=FS, amp=1.0):
    t = np.arange(int(seconds * fs), dtype=np.float64)
    return (amp * np.sin(2 * math.pi * hz * t / fs)).astype(np.float32)


def _steady_envs(mono, fs=FS, fps=30):
    bass, mid, treble, _ = B.process_frames(mono, fs, fps)
    # last quarter = settled
    q = max(1, len(bass) // 4)
    return bass[-q:].mean(), mid[-q:].mean(), treble[-q:].mean()


def test_band_separation_bass_tone():
    """A 60 Hz tone lands dominantly in bass.  Leak thresholds reflect
    one-pole rolloff (the reference's deliberate choice, AudioBands.h:8-11):
    e.g. the 250 Hz mid highpass passes ~|60/250| of a 60 Hz tone."""
    b, m, t = _steady_envs(_tone(60.0, 2.0))
    assert b > 0.5
    assert m < 0.35 * b
    assert t < 0.05 * b


def test_band_separation_mid_tone():
    b, m, t = _steady_envs(_tone(800.0, 2.0))
    assert m > 0.5
    assert b < 0.3 * m
    assert t < 0.35 * m


def test_band_separation_treble_tone():
    b, m, t = _steady_envs(_tone(8000.0, 2.0))
    assert t > 0.5
    assert b < 0.05 * t
    assert m < 0.4 * t


def test_envelope_attack_release_timing():
    """Envelope rises within ~attack tc on onset and decays with the
    release tc after the tone stops."""
    fs = FS
    on = _tone(60.0, 1.0, fs)
    off = np.zeros(int(1.0 * fs), np.float32)
    bass, _, _, _ = B.process_frames(np.concatenate([on, off]), fs, fps=100)
    peak = bass[:100].max()
    assert bass[5] > 0.5 * peak          # 50 ms in: mostly risen (15ms tc)
    # release: 250 ms tc -> after 500 ms of silence, below 15% of peak
    assert bass[150] < 0.2 * peak
    assert bass[199] < bass[110]


def test_native_matches_scan():
    """C++ core and the lax.scan fallback produce identical envelopes."""
    mono = (_tone(60, 0.25) + _tone(800, 0.25, amp=0.5)
            + np.float32(0.1) * np.sin(
                np.arange(int(0.25 * FS)) * 0.9).astype(np.float32))
    ends = B._frame_ends(len(mono), FS, 30)
    native_out = B.process_frames(mono, FS, 30)
    scan_out = B._process_frames_scan(mono, ends, FS, 15.0, 250.0,
                                      B.BandState())
    for a, b in zip(native_out[:3], scan_out[:3]):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_envelope_clamped_to_4():
    mono = _tone(60.0, 1.0, amp=50.0)
    bass, _, _, _ = B.process_frames(mono, FS, 30)
    assert bass.max() <= B.ENV_CLAMP + 1e-6


def test_detect_drops_synthetic():
    """Quiet bass then two loud bursts 10 s apart -> exactly 2 drops at
    the burst times; a third burst 2 s later is gapped out."""
    fps = 30
    bass = np.full(40 * fps, 0.1, np.float32)
    for t0 in (10.0, 20.0, 22.0):
        i = int(t0 * fps)
        bass[i:i + fps] = 2.0
    drops = detect_drops(bass, fps, min_gap_sec=8.0)
    assert len(drops) == 2
    assert abs(drops[0] - 10.0) < 0.1
    assert abs(drops[1] - 20.0) < 0.1


def test_detect_drops_adaptive_threshold():
    """A burst that is loud in absolute terms but below 1.6x the rolling
    mean of an already-loud track is NOT a drop."""
    fps = 30
    bass = np.full(20 * fps, 1.5, np.float32)
    bass[int(10 * fps):int(10.5 * fps)] = 2.0   # 2.0 < 1.6*1.5
    drops = detect_drops(bass, fps, min_gap_sec=0.0)
    assert all(abs(d - 10.0) > 0.1 for d in drops)


def test_wav_roundtrip_and_analyze(tmp_path):
    from scipy.io import wavfile
    path = os.path.join(tmp_path, "t.wav")
    stereo = np.stack([_tone(60.0, 1.0), _tone(60.0, 1.0)], axis=1)
    wavfile.write(path, int(FS), (stereo * 32767).astype(np.int16))

    mono, rate = decode_to_mono(path)
    assert rate == int(FS)
    assert len(mono) == int(FS)
    np.testing.assert_allclose(mono[:64], stereo[:64, 0], atol=1e-3)

    res = analyze_track(path, fps=30)
    assert res.ok
    assert res.frame_count == 30
    assert res.bass[-1] > 0.4


def test_analyze_track_errors(tmp_path):
    assert "unsupported" in analyze_track(
        os.path.join(tmp_path, "x.ogg")).error
    assert "MP3" in analyze_track(os.path.join(tmp_path, "x.mp3")).error
    assert analyze_track("").error


def test_reactive_pump_tone():
    """Inline (deterministic) reactor drive on a bass tone raises the
    bass envelope and not treble; gain scales it."""
    r = AudioReactive(ToneSource(((60.0, 1.0),)), realtime=False)
    r.pump(n_packets=100)
    assert r.get_bass() > 0.3
    assert r.get_treble() < 0.1 * r.get_bass()

    r2 = AudioReactive(ToneSource(((60.0, 1.0),)), realtime=False)
    r2.gain = 0.1
    r2.pump(n_packets=100)
    assert r2.get_bass() < r.get_bass() * 0.3


def test_reactive_thread_lifecycle():
    r = AudioReactive(ToneSource(((60.0, 1.0),)), realtime=False)
    r.start()
    assert r.is_running
    r.stop()
    assert not r.is_running


def test_offline_matches_live():
    """The core invariant (AudioBands.h:4-7): offline per-frame analysis
    and the live packet path produce the same envelope state."""
    mono = _tone(60.0, 0.5) + _tone(3500.0, 0.5, amp=0.3)
    _, _, _, offline_state = B.process_frames(mono, FS, 30)
    live_state = B.BandState()
    for i in range(0, len(mono), 1024):
        live_state = B.process_block(mono[i:i + 1024], FS, state=live_state)
    np.testing.assert_allclose(live_state.as_array(),
                               offline_state.as_array(), atol=1e-6)
