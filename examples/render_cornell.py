#!/usr/bin/env python
"""End-to-end example: progressive path trace of the Cornell Box.

    python examples/render_cornell.py [frames] [out_prefix]

Writes {out}_color.pfm / _albedo.pfm / _normal.pfm (the reference's
save_images AOV set). Swap `cornell_box()` for
`hala_tpu.Scene.load("your.gltf")` to render a glTF file, or use a JSON
config via `hala_tpu.utils.config.RenderConfig.load(path).build_renderer()`.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hala_tpu import RayTracingRenderer
from hala_tpu.scene.procedural import cornell_box


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    out = sys.argv[2] if len(sys.argv) > 2 else "./out/cornell"
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)

    r = RayTracingRenderer(
        "cornell", 512, 512,
        max_depth=6, rr_depth=2,
        enable_tonemap=True, enable_aces=True, use_simple_aces=False,
        max_frames=frames,
    )
    r.set_scene(cornell_box())
    r.commit()
    r.render_loop(frames)
    r.save_images(out + ".png")
    m = r.statistics.last_metrics
    print(f"rendered {frames} frames; {m.get('mrays_per_s', 0):.1f} Mrays/s")
    print(f"wrote {out}_color.pfm / _albedo.pfm / _normal.pfm")


if __name__ == "__main__":
    main()
