"""Verify-skill drive: real-TPU library surface end-to-end.

Path tracer (cornell, 8 frames) + rasterizer + checks per
.claude/skills/verify/SKILL.md.
"""
import time

t0 = time.perf_counter()


def stamp(m):
    print(f"[{time.perf_counter() - t0:7.1f}s] {m}", flush=True)


import numpy as np

from hala_tpu import RasterizationRenderer, RayTracingRenderer
from hala_tpu.scene.procedural import cornell_box

r = RayTracingRenderer("demo", 128, 128, max_frames=8, tile_size=16384)
r.set_scene(cornell_box())
r.commit()
r.render_loop(8)
r.save_images("/tmp/demo.png")
stamp(f"rt done: total_rays={r.total_rays}")

from hala_tpu.utils.pfm import read_pfm

col = read_pfm("/tmp/demo_color.pfm")
alb = read_pfm("/tmp/demo_albedo.pfm")
nrm = read_pfm("/tmp/demo_normal.pfm")
assert np.isfinite(col).all(), "color not finite"
assert 0.2 <= float(col.mean()) <= 0.7, f"color mean {col.mean()}"
assert float(np.abs(alb).sum()) > 0 and float(np.abs(nrm).sum()) > 0
assert r.total_rays > 0
stamp(f"rt checks ok: color mean={float(col.mean()):.3f}")

rz = RasterizationRenderer("rz", 128, 128)
rz.set_scene(cornell_box())
rz.commit()
rz.update()
img = np.asarray(rz.get_final_image())
assert float(np.abs(img).mean()) > 0.01, f"raster mean {img.mean()}"
stamp(f"raster ok: mean={float(img.mean()):.3f}")
print("VERIFY DRIVE OK", flush=True)
