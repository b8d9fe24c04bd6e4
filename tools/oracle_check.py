"""Cross-backend mis-render oracle: render the SAME 256^2 Cornell frame
pair on the real TPU and on CPU and compare (VERDICT r4 item 7).

Policy (documented in BASELINE.md): cross-backend output is NOT
bit-equal (fma contraction and transcendental tables differ between
TPU and CPU float32 pipelines); the oracle asserts per-pixel agreement
within ORACLE_TOL relative RMSE (default 2e-3) over a 4-frame
accumulation — tight enough that any structural mis-render (wrong
geometry, broken sampling, dropped lights: the round-3 sky-only class)
fails by orders of magnitude, loose enough that ULP-level backend
drift never false-positives.

Run on the TPU host (axon pinned):  python -u tools/oracle_check.py
The CPU half runs in a subprocess with jax_platforms=cpu.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 256
FRAMES = 4
TOL = float(os.environ.get("ORACLE_TOL", "2e-3"))

_RENDER_SNIPPET = r"""
import sys, numpy as np
sys.path.insert(0, {root!r})
import jax
{cpu_cfg}
from hala_tpu.models.integrator import Film, RenderSettings, Uniforms, render_frame
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import cornell_box
scene = SceneUploader.upload(cornell_box(), use_ray_tracing=False)
settings = RenderSettings(width={size}, height={size}, max_depth=4,
                          rr_depth=2, tile_size={size}*{size})
film = Film.create({size}, {size})
u = Uniforms.default()
for f in range({frames}):
    film, _ = render_frame(scene, None, u, film, f, settings)
np.save({out!r}, np.asarray(film.accum)[..., :3])
print("saved", {out!r})
"""


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tpu_out = "/tmp/oracle_tpu.npy"
    cpu_out = "/tmp/oracle_cpu.npy"
    # TPU half in-process (axon is pinned in this interpreter's env)
    code_tpu = _RENDER_SNIPPET.format(
        root=root, cpu_cfg="", size=SIZE, frames=FRAMES, out=tpu_out
    )
    exec(compile(code_tpu, "<oracle-tpu>", "exec"), {})
    # CPU half in a fresh subprocess
    code_cpu = _RENDER_SNIPPET.format(
        root=root,
        cpu_cfg="jax.config.update('jax_platforms', 'cpu')",
        size=SIZE, frames=FRAMES, out=cpu_out,
    )
    subprocess.run([sys.executable, "-c", code_cpu], check=True)

    import numpy as np

    a = np.load(tpu_out)
    b = np.load(cpu_out)
    scale = max(float(b.mean()), 1e-6)
    rmse = float(np.sqrt(np.mean((a - b) ** 2))) / scale
    worst = float(np.abs(a - b).max()) / scale
    ok = bool(rmse < TOL)
    print(json.dumps({
        "oracle": "tpu_vs_cpu_256", "rel_rmse": round(rmse, 6),
        "rel_worst": round(worst, 6), "tol": TOL, "ok": ok,
    }))
    sys.exit(0 if ok else 3)


if __name__ == "__main__":
    main()
