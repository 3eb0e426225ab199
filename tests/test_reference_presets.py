"""Byte-compatibility with the reference's shipped preset files.

The KV preset format (``PresetIO.cpp:17-40``) is the reference's only
persistence mechanism; these tests load its 12 SHIPPED presets verbatim
from the read-only reference mount and apply them to SceneSettings —
the strongest possible format-parity check. Skipped when the mount is
absent (e.g. CI without the reference checkout).
"""
import glob
import math
import os

import pytest

from sph_tpu.io import presets as pio
from sph_tpu.scene.settings import SceneSettings, apply_preset, gather_preset

REF_DIR = "/root/reference/ComponentFramework/presets"

ref_presets = sorted(glob.glob(os.path.join(REF_DIR, "*.txt")))

pytestmark = pytest.mark.skipif(
    not ref_presets, reason="reference presets not mounted")


@pytest.mark.parametrize("path", ref_presets,
                         ids=[os.path.basename(p) for p in ref_presets])
def test_reference_preset_parses_and_applies(path):
    kv = pio.load_file(path)
    assert kv, f"empty parse for {path}"
    assert kv.get("version") == "1"

    s = apply_preset(SceneSettings(), kv, structural=True)
    # applied values must be sane and finite
    assert 1_000 <= s.particle_count <= 2_000_000
    assert 0 <= s.shape_type <= 9
    assert all(math.isfinite(v) for v in s.box_half)
    # shapes like torus/capsule/egg ignore some half components; the
    # reference saves those as 0 — the EFFECTIVE half must be positive
    # (SPHFluid3D.h:125-141)
    import numpy as np
    from sph_tpu.core.params import effective_half_np
    eff = effective_half_np(s.shape_type,
                            np.asarray(s.box_half, np.float32))
    assert (eff > 0).all(), f"effective half {eff} for shape {s.shape_type}"
    assert math.isfinite(s.viscosity) and math.isfinite(s.gas_constant)
    assert 0 <= s.palette_id < 24


def test_reference_preset_value_fidelity():
    """Spot-check exact float round-trips against the raw file."""
    path = os.path.join(REF_DIR, "THE CUBE.txt")
    if not os.path.exists(path):
        pytest.skip("preset absent")
    kv = pio.load_file(path)
    s = apply_preset(SceneSettings(), kv, structural=True)
    raw = {}
    for line in open(path, encoding="utf-8", errors="replace"):
        line = line.strip()
        if line and not line.startswith("#") and "=" in line:
            k, v = line.split("=", 1)
            raw.setdefault(k, v)
    if "sph.viscosity" in raw:
        assert abs(s.viscosity - float(raw["sph.viscosity"])) < 1e-6
    if "sph.gasConstant" in raw:
        assert abs(s.gas_constant - float(raw["sph.gasConstant"])) < 1e-4
    if "box.half" in raw:
        want = [float(x) for x in raw["box.half"].split(",")]
        assert all(abs(a - b) < 1e-5 for a, b in zip(s.box_half, want))


def test_roundtrip_preserves_reference_keys():
    """Our gather -> serialize -> parse keeps every key we understand."""
    path = ref_presets[0]
    kv = pio.load_file(path)
    s = apply_preset(SceneSettings(), kv, structural=True)
    out = pio.parse(pio.serialize(gather_preset(s)))
    s2 = apply_preset(SceneSettings(), out, structural=True)
    assert s2.particle_count == s.particle_count
    assert s2.shape_type == s.shape_type
    assert abs(s2.viscosity - s.viscosity) < 1e-6
    assert list(s2.box_half) == list(s.box_half)
