#!/usr/bin/env python
"""Generate assets/atrium.glb — a deterministic Sponza-class test asset.

A two-story colonnaded atrium (33,920 triangles at detail=1, the
checked-in assets/atrium.glb; 167,064 at detail=2.4, the Sponza-scale
assets/atrium_big.glb): fluted columns with
capitals, semicircular arcades, paneled walls, a coffered floor with a
baked marble PNG texture, hanging fabric banners, bronze braziers and
clay urns. Everything is authored here (seeded numpy) and written as a
self-contained binary glTF: one BIN chunk, PNG textures embedded via
bufferViews, a KHR_lights_punctual quad area light (Blender-style
`extras` {type:1}) and a perspective camera — exactly the export shape
the reference consumes from Blender (gltf_loader.rs extras channels).

Regenerate with `python tools/make_asset.py` (output is byte-stable for
a given numpy version).
"""

from __future__ import annotations

import io
import json
import struct
import sys

import numpy as np

rs = np.random.RandomState(20260816)


# --------------------------------------------------------------------------
# geometry builders: each returns (positions (N,3), normals (N,3),
# uvs (N,2), indices (M,3)) in local space
# --------------------------------------------------------------------------

def _grid_quad(corner, eu, ev, nu=1, nv=1, uv_scale=1.0):
    """Subdivided parallelogram with flat normal."""
    corner, eu, ev = map(lambda a: np.asarray(a, np.float32), (corner, eu, ev))
    n = np.cross(eu, ev)
    n = n / max(np.linalg.norm(n), 1e-9)
    us = np.linspace(0, 1, nu + 1, dtype=np.float32)
    vs = np.linspace(0, 1, nv + 1, dtype=np.float32)
    uu, vv = np.meshgrid(us, vs, indexing="ij")
    pos = (corner[None, None]
           + uu[..., None] * eu[None, None]
           + vv[..., None] * ev[None, None]).reshape(-1, 3)
    uv = np.stack([uu * uv_scale, vv * uv_scale], -1).reshape(-1, 2)
    nrm = np.tile(n, (len(pos), 1))
    idx = []
    for i in range(nu):
        for j in range(nv):
            a = i * (nv + 1) + j
            b = a + nv + 1
            idx += [[a, b, a + 1], [a + 1, b, b + 1]]
    return pos, nrm, uv.astype(np.float32), np.asarray(idx, np.uint32)


def _box(center, size, uv_scale=1.0, sub=1):
    cx, cy, cz = center
    sx, sy, sz = np.asarray(size) * 0.5
    faces = [
        ([cx - sx, cy - sy, cz + sz], [2 * sx, 0, 0], [0, 2 * sy, 0]),  # +z
        ([cx + sx, cy - sy, cz - sz], [-2 * sx, 0, 0], [0, 2 * sy, 0]),  # -z
        ([cx + sx, cy - sy, cz + sz], [0, 0, -2 * sz], [0, 2 * sy, 0]),  # +x
        ([cx - sx, cy - sy, cz - sz], [0, 0, 2 * sz], [0, 2 * sy, 0]),   # -x
        ([cx - sx, cy + sy, cz + sz], [2 * sx, 0, 0], [0, 0, -2 * sz]),  # +y
        ([cx - sx, cy - sy, cz - sz], [2 * sx, 0, 0], [0, 0, 2 * sz]),   # -y
    ]
    return _merge([_grid_quad(*f, nu=sub, nv=sub, uv_scale=uv_scale)
                   for f in faces])


def _cylinder(center, radius, height, segments=16, fluted=True):
    """Vertical column shaft with optional fluting (radius ripple)."""
    cx, cy, cz = center
    ang = np.linspace(0, 2 * np.pi, segments + 1, dtype=np.float32)
    r = radius * (1.0 + (0.04 * np.cos(ang * 8) if fluted else 0.0))
    xs, zs = np.cos(ang) * r, np.sin(ang) * r
    rows = 4
    ys = np.linspace(0, height, rows + 1, dtype=np.float32)
    pos, nrm, uv, idx = [], [], [], []
    for yi, y in enumerate(ys):
        # slight entasis: columns bulge at 1/3 height
        bulge = 1.0 + 0.03 * np.sin(np.pi * (y / height) * 0.9)
        for k in range(segments + 1):
            pos.append([cx + xs[k] * bulge, cy + y, cz + zs[k] * bulge])
            nrm.append([np.cos(ang[k]), 0.0, np.sin(ang[k])])
            uv.append([k / segments * 4.0, y / height * 2.0])
    for yi in range(rows):
        for k in range(segments):
            a = yi * (segments + 1) + k
            b = a + segments + 1
            idx += [[a, a + 1, b], [a + 1, b + 1, b]]
    return (np.asarray(pos, np.float32), np.asarray(nrm, np.float32),
            np.asarray(uv, np.float32), np.asarray(idx, np.uint32))


def _arch(center, radius, depth, thickness, segments=12):
    """Semicircular arch extruded along z (soffit + two faces)."""
    cx, cy, cz = center
    ang = np.linspace(0, np.pi, segments + 1, dtype=np.float32)
    parts = []
    for r0, r1 in [(radius, radius + thickness)]:
        for z0, z1 in [(cz - depth / 2, cz + depth / 2)]:
            # inner soffit (normal pointing into the opening)
            p, n, t, i = [], [], [], []
            for k, a in enumerate(ang):
                x, y = np.cos(a), np.sin(a)
                for z in (z0, z1):
                    p.append([cx + x * r0, cy + y * r0, z])
                    n.append([-x, -y, 0.0])
                    t.append([k / segments * 2.0, (z - z0) / depth])
            for k in range(segments):
                a0 = k * 2
                i += [[a0, a0 + 2, a0 + 1], [a0 + 1, a0 + 2, a0 + 3]]
            parts.append((np.asarray(p, np.float32), np.asarray(n, np.float32),
                          np.asarray(t, np.float32), np.asarray(i, np.uint32)))
            # front/back rings
            for z, flip in ((z0, -1.0), (z1, 1.0)):
                p, n, t, i = [], [], [], []
                for k, a in enumerate(ang):
                    x, y = np.cos(a), np.sin(a)
                    p.append([cx + x * r0, cy + y * r0, z])
                    p.append([cx + x * r1, cy + y * r1, z])
                    n += [[0, 0, flip]] * 2
                    t += [[k / segments, 0.0], [k / segments, 1.0]]
                for k in range(segments):
                    a0 = k * 2
                    quad = [[a0, a0 + 2, a0 + 1], [a0 + 1, a0 + 2, a0 + 3]]
                    if flip < 0:
                        quad = [q[::-1] for q in quad]
                    i += quad
                parts.append((np.asarray(p, np.float32),
                              np.asarray(n, np.float32),
                              np.asarray(t, np.float32),
                              np.asarray(i, np.uint32)))
    return _merge(parts)


def _sphere(center, radius, su=18, sv=12, squash=1.0):
    cx, cy, cz = center
    pos, nrm, uv, idx = [], [], [], []
    for i in range(sv + 1):
        phi = np.pi * i / sv
        for j in range(su + 1):
            th = 2 * np.pi * j / su
            n = np.array([np.sin(phi) * np.cos(th), np.cos(phi),
                          np.sin(phi) * np.sin(th)], np.float32)
            pos.append([cx + n[0] * radius, cy + n[1] * radius * squash,
                        cz + n[2] * radius])
            nrm.append(n)
            uv.append([j / su, i / sv])
    for i in range(sv):
        for j in range(su):
            a = i * (su + 1) + j
            b = a + su + 1
            idx += [[a, b, a + 1], [a + 1, b, b + 1]]
    return (np.asarray(pos, np.float32), np.asarray(nrm, np.float32),
            np.asarray(uv, np.float32), np.asarray(idx, np.uint32))


def _banner(center, w, h, sway=0.3, nu=6, nv=10):
    """Hanging cloth with a sine sway (double-sided via duplication)."""
    cx, cy, cz = center
    pos, nrm, uv, idx = [], [], [], []
    for i in range(nu + 1):
        for j in range(nv + 1):
            u, v = i / nu, j / nv
            x = cx + (u - 0.5) * w
            y = cy - v * h
            z = cz + np.sin(v * np.pi) * sway * np.sin(u * np.pi * 2) * 0.2 \
                + v * sway
            pos.append([x, y, z])
            nrm.append([0.0, 0.0, 1.0])
            uv.append([u, v])
    for i in range(nu):
        for j in range(nv):
            a = i * (nv + 1) + j
            b = a + nv + 1
            idx += [[a, b, a + 1], [a + 1, b, b + 1]]
    p = np.asarray(pos, np.float32)
    n = np.asarray(nrm, np.float32)
    t = np.asarray(uv, np.float32)
    i0 = np.asarray(idx, np.uint32)
    return _merge([(p, n, t, i0), (p, -n, t, i0[:, ::-1])])


def _merge(parts):
    pos = np.concatenate([p[0] for p in parts])
    nrm = np.concatenate([p[1] for p in parts])
    uv = np.concatenate([p[2] for p in parts])
    off, idx = 0, []
    for p in parts:
        idx.append(p[3] + off)
        off += len(p[0])
    return pos, nrm, uv, np.concatenate(idx).astype(np.uint32)


def _xform(part, dx=0.0, dy=0.0, dz=0.0):
    p, n, t, i = part
    return p + np.asarray([dx, dy, dz], np.float32), n, t, i


# --------------------------------------------------------------------------
# scene assembly: parts bucketed per material
# --------------------------------------------------------------------------

def build_scene(detail=1.0):
    W, D = 26.0, 14.0          # atrium footprint
    H1, H2 = 4.0, 3.4          # story heights

    def s(v):
        """Tessellation scale: detail=1 reproduces assets/atrium.glb
        byte-for-byte (the rs call sequence is unchanged); larger values
        subdivide every curved/gridded surface for the Sponza-scale
        asset (~150k triangles at detail=2.4)."""
        return max(1, int(round(v * detail)))
    buckets = {k: [] for k in (
        "stone", "marble", "brick", "fabric_r", "fabric_g", "fabric_b",
        "bronze", "clay",
    )}

    # floor (coffered marble) + outer walls + roof
    buckets["marble"].append(_grid_quad([-W / 2, 0, -D / 2], [0, 0, D],
                                        [W, 0, 0], nu=s(12), nv=s(8), uv_scale=8))
    buckets["brick"].append(_grid_quad([-W / 2, 0, -D / 2], [W, 0, 0],
                                       [0, H1 + H2 + 1.2, 0], nu=s(10), nv=s(4),
                                       uv_scale=6))
    buckets["brick"].append(_grid_quad([W / 2, 0, D / 2], [-W, 0, 0],
                                       [0, H1 + H2 + 1.2, 0], nu=s(10), nv=s(4),
                                       uv_scale=6))
    buckets["brick"].append(_grid_quad([-W / 2, 0, D / 2], [0, 0, -D],
                                       [0, H1 + H2 + 1.2, 0], nu=s(6), nv=s(4),
                                       uv_scale=4))
    buckets["brick"].append(_grid_quad([W / 2, 0, -D / 2], [0, 0, D],
                                       [0, H1 + H2 + 1.2, 0], nu=s(6), nv=s(4),
                                       uv_scale=4))
    # roof slabs leaving a central skylight opening
    roof_y = H1 + H2 + 1.2
    for corner, eu, ev in [
        ([-W / 2, roof_y, -D / 2], [W, 0, 0], [0, 0, D * 0.3]),
        ([-W / 2, roof_y, D * 0.2], [W, 0, 0], [0, 0, D * 0.3]),
        ([-W / 2, roof_y, -D * 0.2], [W * 0.3, 0, 0], [0, 0, D * 0.4]),
        ([W * 0.2, roof_y, -D * 0.2], [W * 0.3, 0, 0], [0, 0, D * 0.4]),
    ]:
        buckets["stone"].append(_grid_quad(corner, ev, eu, nu=s(4), nv=s(8)))

    # colonnades: two rows along z = +-(D/2 - 2), both stories
    ncol = 9
    xs = np.linspace(-W / 2 + 2.0, W / 2 - 2.0, ncol)
    for story, (y0, h) in enumerate([(0.0, H1), (H1 + 0.6, H2)]):
        for zrow in (-D / 2 + 2.0, D / 2 - 2.0):
            for x in xs:
                buckets["stone"].append(_box([x, y0 + 0.15, zrow],
                                             [0.7, 0.3, 0.7], sub=s(1)))
                buckets["stone"].append(
                    _cylinder([x, y0 + 0.3, zrow], 0.26, h - 0.9,
                              segments=s(24)))
                buckets["stone"].append(_box([x, y0 + h - 0.45, zrow],
                                             [0.8, 0.3, 0.8], sub=s(1)))
            # architrave beam + arches between columns
            buckets["stone"].append(_box([0.0, y0 + h - 0.15, zrow],
                                         [W - 3.0, 0.3, 0.6], sub=s(2)))
            span = xs[1] - xs[0]
            for x0 in xs[:-1]:
                buckets["brick"].append(
                    _arch([x0 + span / 2, y0 + h - 0.85, zrow],
                          span / 2 - 0.28, 0.5, 0.35, segments=s(16)))
        # second-story walkway slab
        if story == 0:
            for zrow in (-D / 2 + 1.0, D / 2 - 1.0):
                buckets["stone"].append(
                    _grid_quad([-W / 2, H1 + 0.45, zrow - 1.0],
                               [W, 0, 0], [0, 0, 2.0], nu=s(10), nv=s(2),
                               uv_scale=6))

    # balustrades along the second-story walkways
    for zrow in (-D / 2 + 0.4, D / 2 - 0.4):
        buckets["stone"].append(_box([0, H1 + 0.98, zrow],
                                     [W - 1.5, 0.1, 0.12], sub=s(2)))
        for x in np.linspace(-W / 2 + 1.0, W / 2 - 1.0, s(48)):
            buckets["stone"].append(
                _cylinder([x, H1 + 0.5, zrow], 0.05, 0.45, segments=s(8),
                          fluted=False))

    # ceiling coffer beams under the roof
    for x in np.linspace(-W / 2 + 1.5, W / 2 - 1.5, s(12)):
        buckets["stone"].append(_box([x, H1 + H2 + 1.0, 0],
                                     [0.25, 0.35, D - 1.0], sub=s(2)))
    for z in np.linspace(-D / 2 + 1.5, D / 2 - 1.5, s(7)):
        buckets["stone"].append(_box([0, H1 + H2 + 1.05, z],
                                     [W - 1.0, 0.25, 0.25], sub=s(2)))

    # hanging banners off the upper architrave
    cols = ["fabric_r", "fabric_g", "fabric_b"]
    for k, x in enumerate(np.linspace(-W / 2 + 4, W / 2 - 4, 6)):
        for zrow in (-D / 2 + 2.6, D / 2 - 2.6):
            buckets[cols[k % 3]].append(
                _banner([x, H1 + H2 - 0.4, zrow], 1.4, 2.2,
                        sway=0.25 + 0.1 * rs.rand(),
                        nu=s(6), nv=s(10)))

    # braziers (bronze) + urns (clay) on the floor
    for x in np.linspace(-W / 2 + 3, W / 2 - 3, 5):
        buckets["bronze"].append(_sphere([x, 0.75, 0.0], 0.45, su=s(18), sv=s(12), squash=0.6))
        buckets["bronze"].append(_cylinder([x, 0.0, 0.0], 0.12, 0.6,
                                           segments=s(10), fluted=False))
    for _ in range(22):
        x = rs.uniform(-W / 2 + 1.5, W / 2 - 1.5)
        z = rs.choice([-1, 1]) * rs.uniform(D / 2 - 3.4, D / 2 - 2.6)
        r = rs.uniform(0.25, 0.45)
        buckets["clay"].append(_sphere([x, r * 0.9, z], r, su=s(18), sv=s(12), squash=1.25))

    return {k: _merge(v) for k, v in buckets.items() if v}


# --------------------------------------------------------------------------
# PNG textures (stdlib zlib via PIL save)
# --------------------------------------------------------------------------

def _png(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "PNG", optimize=False)
    return buf.getvalue()


def marble_png(size=128):
    y, x = np.mgrid[0:size, 0:size] / size
    veins = np.sin((x * 6 + y * 2 + 0.6 * np.sin(y * 19)) * np.pi)
    base = 215 - 25 * np.abs(veins) - 12 * rs.rand(size, size)
    rgb = np.stack([base + 6, base + 2, base - 4], -1)
    return _png(np.clip(rgb, 0, 255).astype(np.uint8))


def brick_png(size=128):
    y, x = np.mgrid[0:size, 0:size]
    row = y // 16
    offs = (row % 2) * 8
    mortar = ((y % 16 < 2) | (((x + offs) % 32) < 2))
    r = np.where(mortar, 168, 152 + 28 * rs.rand(size, size))
    g = np.where(mortar, 160, 74 + 16 * rs.rand(size, size))
    b = np.where(mortar, 150, 58 + 12 * rs.rand(size, size))
    return _png(np.stack([r, g, b], -1).astype(np.uint8))


# --------------------------------------------------------------------------
# GLB writer
# --------------------------------------------------------------------------

def write_glb(path, detail=1.0):
    parts = build_scene(detail)
    mats = {
        "stone": dict(baseColorFactor=[0.62, 0.6, 0.56, 1], roughnessFactor=0.9,
                      metallicFactor=0.0),
        "marble": dict(tex="marble", roughnessFactor=0.35, metallicFactor=0.0),
        "brick": dict(tex="brick", roughnessFactor=0.85, metallicFactor=0.0),
        "fabric_r": dict(baseColorFactor=[0.55, 0.06, 0.05, 1],
                         roughnessFactor=1.0, metallicFactor=0.0),
        "fabric_g": dict(baseColorFactor=[0.08, 0.4, 0.1, 1],
                         roughnessFactor=1.0, metallicFactor=0.0),
        "fabric_b": dict(baseColorFactor=[0.08, 0.15, 0.5, 1],
                         roughnessFactor=1.0, metallicFactor=0.0),
        "bronze": dict(baseColorFactor=[0.85, 0.55, 0.25, 1],
                       roughnessFactor=0.35, metallicFactor=1.0),
        "clay": dict(baseColorFactor=[0.52, 0.3, 0.2, 1],
                     roughnessFactor=0.8, metallicFactor=0.0),
    }
    bin_chunks = []
    buffer_views = []
    accessors = []

    def add_view(data: bytes, target=None):
        off = sum(len(b) for b in bin_chunks)
        pad = (-off) % 4
        if pad:
            bin_chunks.append(b"\x00" * pad)
            off += pad
        bin_chunks.append(data)
        v = {"buffer": 0, "byteOffset": off, "byteLength": len(data)}
        if target:
            v["target"] = target
        buffer_views.append(v)
        return len(buffer_views) - 1

    def add_accessor(arr, ctype, atype, target, minmax=False):
        view = add_view(arr.tobytes(), target)
        acc = {
            "bufferView": view, "componentType": ctype,
            "count": len(arr), "type": atype,
        }
        if minmax:
            acc["min"] = arr.min(0).tolist()
            acc["max"] = arr.max(0).tolist()
        accessors.append(acc)
        return len(accessors) - 1

    images, textures = [], []
    tex_index = {}
    for name, maker in [("marble", marble_png), ("brick", brick_png)]:
        data = maker()
        images.append({"bufferView": add_view(data), "mimeType": "image/png"})
        textures.append({"source": len(images) - 1, "sampler": 0})
        tex_index[name] = len(textures) - 1

    materials_json, primitives = [], []
    tri_total = 0
    for name, part in parts.items():
        pos, nrm, uv, idx = part
        spec = mats[name]
        pbr = {
            "metallicFactor": spec.get("metallicFactor", 0.0),
            "roughnessFactor": spec.get("roughnessFactor", 1.0),
        }
        if "tex" in spec:
            pbr["baseColorTexture"] = {"index": tex_index[spec["tex"]]}
        else:
            pbr["baseColorFactor"] = spec["baseColorFactor"]
        materials_json.append({"name": name, "pbrMetallicRoughness": pbr,
                               "doubleSided": True})
        primitives.append({
            "attributes": {
                "POSITION": add_accessor(pos, 5126, "VEC3", 34962, True),
                "NORMAL": add_accessor(nrm, 5126, "VEC3", 34962),
                "TEXCOORD_0": add_accessor(uv, 5126, "VEC2", 34962),
            },
            "indices": add_accessor(idx.reshape(-1), 5125, "SCALAR", 34963),
            "material": len(materials_json) - 1,
        })
        tri_total += len(idx)

    doc = {
        "asset": {"version": "2.0", "generator": "hala_tpu make_asset"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2, 3]}],
        "nodes": [
            {"name": "atrium", "mesh": 0},
            {   # skylight quad light, facing down (+Z of node = -Y world)
                "name": "skylight",
                "matrix": [1, 0, 0, 0,
                           0, 0, 1, 0,
                           0, -1, 0, 0,
                           0, 8.4, 0, 1],
                "extensions": {"KHR_lights_punctual": {"light": 0}},
            },
            {   # warm quad near one end
                "name": "brazier_glow",
                "matrix": [1, 0, 0, 0,
                           0, 0, 1, 0,
                           0, -1, 0, 0,
                           -9.0, 6.5, 0, 1],
                "extensions": {"KHR_lights_punctual": {"light": 1}},
            },
            {
                "name": "camera",
                # stand at one end, look down the colonnade (-X), slight
                # downward pitch
                "matrix": [0, 0, -1, 0,
                           -0.1736, 0.9848, 0, 0,
                           0.9848, 0.1736, 0, 0,
                           11.5, 2.2, 0, 1],
                "camera": 0,
            },
        ],
        "meshes": [{"name": "atrium", "primitives": primitives}],
        "accessors": accessors,
        "bufferViews": buffer_views,
        "materials": materials_json,
        "cameras": [{
            "type": "perspective",
            "perspective": {"yfov": 0.8, "znear": 0.05, "aspectRatio": 1.7777},
        }],
        "samplers": [{"magFilter": 9729, "minFilter": 9987,
                      "wrapS": 10497, "wrapT": 10497}],
        "images": images,
        "textures": textures,
        "extensions": {
            "KHR_lights_punctual": {
                "lights": [
                    {"type": "point", "color": [1.0, 0.96, 0.9],
                     "intensity": 520.0,
                     "extras": {"type": 1, "param0": 7.0, "param1": 4.0}},
                    {"type": "point", "color": [1.0, 0.6, 0.3],
                     "intensity": 90.0,
                     "extras": {"type": 1, "param0": 2.0, "param1": 2.0}},
                ]
            }
        },
        "extensionsUsed": ["KHR_lights_punctual"],
    }

    bin_blob = b"".join(bin_chunks)
    bin_blob += b"\x00" * ((-len(bin_blob)) % 4)
    doc["buffers"] = [{"byteLength": len(bin_blob)}]
    js = json.dumps(doc, separators=(",", ":")).encode()
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_blob)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(bin_blob), 0x004E4942))
        f.write(bin_blob)
    print(f"wrote {path}: {tri_total} triangles, {total / 1e6:.2f} MB")


if __name__ == "__main__":
    write_glb(
        sys.argv[1] if len(sys.argv) > 1 else "assets/atrium.glb",
        float(sys.argv[2]) if len(sys.argv) > 2 else 1.0,
    )
