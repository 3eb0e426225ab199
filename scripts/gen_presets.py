"""Generate the shipped ``presets/`` directory from the 14 art presets.

The reference ships 12 curated ``presets/*.txt`` files
(``/root/reference/ComponentFramework/presets/``); this writes one
byte-compatible KV preset per art preset (``gather_preset`` through the
same writer the reference's ``PresetIO::SaveFile`` maps to), so ``run
--preset <name>`` and the drop sequencer have curated files out of the
box.  Deterministic: re-running reproduces identical files.

Usage: python scripts/gen_presets.py [out_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sph_tpu.io import presets as pio                     # noqa: E402
from sph_tpu.scene.art_presets import (ART_PRESET_NAMES,  # noqa: E402
                                       apply_art_preset)
from sph_tpu.scene.settings import (SceneSettings,        # noqa: E402
                                    gather_preset)


def main(out_dir: str = "presets") -> None:
    os.makedirs(out_dir, exist_ok=True)
    for i, name in enumerate(ART_PRESET_NAMES):
        s = apply_art_preset(SceneSettings(), i)
        path = os.path.join(out_dir, f"{pio.sanitize_name(name)}.txt")
        pio.save_file(path, gather_preset(s))
        print(f"wrote {path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "presets")
