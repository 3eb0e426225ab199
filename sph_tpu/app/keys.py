"""Minimal interactive control surface for ``run --realtime``.

The reference's main user-facing feature is a live ImGui panel
(``Scene0p.cpp:595-1265``) mutating simulation/look parameters while
the sim runs.  Headless TPU runs have no GL window, so this maps the
panel's most-used controls onto raw-terminal keys; every mutation goes
through the same ``SceneRunner.apply_settings`` / live-camera state the
preset and sequencer paths use, so nothing here needs a recompile.

    q            quit                 space        pause / resume
    [ / ]        palette prev / next  m            render mode cycle
    1..9, 0      art preset           g            SurpriseMe
    r            respawn              f            fountain toggle
    t            attractor toggle     b            audio-drive toggle
    a/d w/s      orbit yaw / pitch    - / =        zoom out / in
    h            print this help

Reads are non-blocking (termios raw mode + select); on a non-TTY stdin
the controller is inert, so piping/CI is unaffected.
"""
from __future__ import annotations

import dataclasses
import sys
from typing import Optional

HELP = __doc__.split("\n\n")[-2] if __doc__ else ""

N_PALETTES = 24


class KeyController:
    """Raw-terminal key poller bound to a SceneRunner."""

    def __init__(self, scene, out=sys.stderr):
        self.scene = scene
        self.out = out
        self.paused = False
        self._fd: Optional[int] = None
        self._saved = None

    # --- terminal plumbing ---

    def __enter__(self):
        try:
            import termios
            import tty
            if sys.stdin.isatty():
                self._fd = sys.stdin.fileno()
                self._saved = termios.tcgetattr(self._fd)
                tty.setcbreak(self._fd)
                print(HELP, file=self.out)
        except Exception:
            self._fd = None
        return self

    def __exit__(self, *exc):
        if self._fd is not None and self._saved is not None:
            import termios
            termios.tcsetattr(self._fd, termios.TCSADRAIN, self._saved)
        return False

    def _pending_keys(self):
        if self._fd is None:
            return
        import select
        while True:
            r, _, _ = select.select([sys.stdin], [], [], 0)
            if not r:
                return
            ch = sys.stdin.read(1)
            if not ch:
                return
            yield ch

    # --- dispatch ---

    def poll(self) -> bool:
        """Apply all pending keys; returns False when 'q' asked to quit."""
        for ch in self._pending_keys():
            if not self.handle(ch):
                return False
        return True

    def handle(self, ch: str) -> bool:
        """One key (exposed for tests). Returns False on quit."""
        scene = self.scene
        s = scene.settings
        if ch == "q":
            return False
        elif ch == " ":
            self.paused = not self.paused
            self._say("paused" if self.paused else "resumed")
        elif ch == "[":
            self._apply(s, palette_id=(s.palette_id - 1) % N_PALETTES)
            self._say(f"palette {scene.settings.palette_id}")
        elif ch == "]":
            self._apply(s, palette_id=(s.palette_id + 1) % N_PALETTES)
            self._say(f"palette {scene.settings.palette_id}")
        elif ch == "m":
            self._apply(s, render_mode=(s.render_mode + 1) % 3)
            self._say(f"render mode {scene.settings.render_mode}")
        elif ch.isdigit():
            which = 9 if ch == "0" else int(ch) - 1
            scene.apply_art_preset(which)
            self._say(f"art preset {which}")
        elif ch == "g":
            scene.surprise_me()
            self._say("surprise me")
        elif ch == "r":
            scene.pending_reset = True
            self._say("respawn queued")
        elif ch == "f":
            self._apply(s, fountain_on=not s.fountain_on)
            self._say(f"fountain {'on' if not s.fountain_on else 'off'}")
        elif ch == "t":
            self._apply(s, attractor_on=not s.attractor_on)
            self._say(
                f"attractor {'on' if not s.attractor_on else 'off'}")
        elif ch == "b":
            self._apply(s, audio_enabled=not s.audio_enabled)
            self._say(
                f"audio drive {'on' if not s.audio_enabled else 'off'}")
        elif ch in "adws-=":
            cam = scene.camera
            if ch == "a":
                cam.yaw_deg -= 6.0
            elif ch == "d":
                cam.yaw_deg += 6.0
            elif ch == "w":
                cam.pitch_deg = min(cam.pitch_deg + 4.0, 85.0)
            elif ch == "s":
                cam.pitch_deg = max(cam.pitch_deg - 4.0, -85.0)
            elif ch == "-":
                cam.distance *= 1.1
            elif ch == "=":
                cam.distance = max(cam.distance / 1.1, 1.0)
        elif ch == "h":
            print(HELP, file=self.out)
        return True

    def _apply(self, s, **kw):
        self.scene.apply_settings(dataclasses.replace(s, **kw))

    def _say(self, msg: str):
        print(f"[keys] {msg}", file=self.out)
