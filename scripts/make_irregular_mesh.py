"""Generate the committed irregular benchmark mesh (assets/blob69k.obj).

BASELINE config 3 names a "Stanford bunny (~69k tris)"; no scan asset
ships with either repo (the reference expects an external knight.obj,
src/settings.hpp:50). The round-3 headline used a procedural torus knot
with a matched triangle count, but a knot is smooth, tubular and
REGULAR — plausibly flattering to BVH traversal (coherent node
footprints, shallow local depth variance). This script produces a
deterministic scan-like blob with the irregularity that matters to
traversal, and the result is COMMITTED so every round benches the same
bytes:

  * base UV sphere, 240 segments x 146 rings = exactly 69,120 triangles
    (the knot's 540x64x2 count, so the A/B against the knot row is
    triangle-for-triangle);
  * radius displaced by 5 octaves of seeded trilinear value noise plus
    a ridged (|noise|) component — lumps, crevices and creases with
    high local curvature variance (irregular node bounds, deep+shallow
    BVH subtrees side by side), nothing axis-aligned;
  * area-weighted smooth vertex normals from the displaced geometry;
  * sized to the bench scene scale (max radius ~105 world units before
    the bench's mesh.scale=0.5, matching the knot's footprint inside
    the Cornell wrap).

Run: python scripts/make_irregular_mesh.py  (writes assets/blob69k.obj)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEGMENTS = 240
RINGS = 146  # pole fans + 143 quad rows -> 2 * SEGMENTS * (RINGS - 2) = 69,120 tris
SEED = 0x5EED_B10B
BASE_RADIUS = 90.0


def value_noise_3d(pts: np.ndarray, freq: float, rng: np.random.Generator,
                   grid: int = 17) -> np.ndarray:
    """Seeded trilinear value noise in [-1, 1] at ``freq`` cells per
    unit, sampled at (N, 3) points in [-1, 1]^3. A fresh lattice per
    octave (rng advances), periodic wrap."""
    lattice = rng.uniform(-1.0, 1.0, size=(grid, grid, grid))
    p = (pts * 0.5 + 0.5) * freq  # [0, freq)
    i0 = np.floor(p).astype(np.int64)
    f = p - i0
    f = f * f * (3.0 - 2.0 * f)  # smoothstep fade
    out = np.zeros(len(pts))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1.0 - f[:, 0])
                    * (f[:, 1] if dy else 1.0 - f[:, 1])
                    * (f[:, 2] if dz else 1.0 - f[:, 2])
                )
                v = lattice[
                    (i0[:, 0] + dx) % grid,
                    (i0[:, 1] + dy) % grid,
                    (i0[:, 2] + dz) % grid,
                ]
                out += w * v
    return out


def build_blob():
    rng = np.random.default_rng(SEED)
    # UV sphere vertex grid: poles + (RINGS - 2) interior rings.
    thetas = np.linspace(0.0, np.pi, RINGS)[1:-1]  # interior rings
    phis = np.arange(SEGMENTS) * (2.0 * np.pi / SEGMENTS)
    tt, pp = np.meshgrid(thetas, phis, indexing="ij")
    dirs = np.stack(
        [np.sin(tt) * np.cos(pp), np.cos(tt), np.sin(tt) * np.sin(pp)],
        axis=-1,
    ).reshape(-1, 3)
    dirs = np.concatenate(
        [[[0.0, 1.0, 0.0]], dirs, [[0.0, -1.0, 0.0]]], axis=0
    )  # N = 2 + (RINGS-2)*SEGMENTS

    # Multi-octave displacement field over the unit sphere directions.
    disp = np.zeros(len(dirs))
    amp, freq = 0.38, 2.0
    for _ in range(5):
        disp += amp * value_noise_3d(dirs, freq, rng)
        amp *= 0.52
        freq *= 2.03  # non-integer lacunarity: no axis-aligned beats
    # Ridged component: creases/crevices (scan-like sharp features).
    ridge = 1.0 - np.abs(value_noise_3d(dirs, 5.7, rng))
    disp += 0.22 * (ridge * ridge - 0.6)
    radius = BASE_RADIUS * (1.0 + disp)
    verts = dirs * radius[:, None]

    # Faces (indices into verts): pole fans + ring quads.
    def vid(r, s):  # interior ring r (0-based), segment s
        return 1 + r * SEGMENTS + (s % SEGMENTS)

    faces = []
    n_int = RINGS - 2
    for s in range(SEGMENTS):  # top fan
        faces.append((0, vid(0, s + 1), vid(0, s)))
    for r in range(n_int - 1):
        for s in range(SEGMENTS):
            a, b = vid(r, s), vid(r, s + 1)
            c, d = vid(r + 1, s), vid(r + 1, s + 1)
            faces.append((a, b, c))
            faces.append((b, d, c))
    last = len(verts) - 1
    for s in range(SEGMENTS):  # bottom fan
        faces.append((last, vid(n_int - 1, s), vid(n_int - 1, s + 1)))
    faces = np.asarray(faces, np.int64)

    # Area-weighted smooth vertex normals (outward).
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    fn = np.cross(e1, e2)  # length = 2*area
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    ln = np.linalg.norm(vn, axis=1, keepdims=True)
    vn = vn / np.maximum(ln, 1e-20)
    # Enforce outward orientation (winding above is outward; flip any
    # degenerate stragglers toward the radial direction).
    flip = np.sum(vn * dirs, axis=1) < 0
    vn[flip] = -vn[flip]
    return verts.astype(np.float32), vn.astype(np.float32), faces


def main():
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "blob69k.obj",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    verts, vn, faces = build_blob()
    print(f"verts={len(verts)} tris={len(faces)} "
          f"bbox={verts.min(0)}..{verts.max(0)}")
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    print(f"tri area mean={areas.mean():.3f} cv={areas.std()/areas.mean():.2f} "
          f"radius cv={np.linalg.norm(verts, axis=1).std() / np.linalg.norm(verts, axis=1).mean():.3f}")
    with open(out, "w") as f:
        f.write("# blob69k: seeded irregular benchmark mesh "
                "(scripts/make_irregular_mesh.py)\n")
        for v in verts:
            f.write(f"v {v[0]:.6g} {v[1]:.6g} {v[2]:.6g}\n")
        for n in vn:
            f.write(f"vn {n[0]:.6g} {n[1]:.6g} {n[2]:.6g}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a}//{a} {b}//{b} {c}//{c}\n")
    print(f"wrote {out} ({os.path.getsize(out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
