"""Wavefront OBJ parsing.

Reimplements the semantics of loadMeshFromOBJFile (src/readobj.hpp:270-344):

  * ``v x y z`` vertices and ``vn x y z`` normals (float32);
  * faces in ``f v/t/n v/t/n v/t/n`` or ``f v//n v//n v//n`` form only
    (triangles with vertex normals; anything else warns and is skipped,
    readobj.hpp:314-317);
  * indices are 1-based; out-of-bounds indices warn and skip the face
    (readobj.hpp:327-331).

Deliberate fix vs the reference: skipped faces do not count toward the
mesh's triangle total (the reference increments triCount before parsing,
readobj.hpp:305-306, so malformed faces corrupt firstTriangleIdx).

The parser is numpy-vectorised (the reference does a per-line sscanf);
a same-semantics C++ fast path lives in tpurt/_native.
"""

from __future__ import annotations

import sys
from typing import Tuple

import numpy as np


def parse_obj(text: str, warn=None) -> Tuple[np.ndarray, np.ndarray]:
    """Parse OBJ text -> (positions (n,3,3) f32, normals (n,3,3) f32).

    Large files route through the native C++ parser (identical output,
    verified by tests; skipped-face warnings are then elided)."""
    if warn is None and len(text) > 1 << 17:
        from tpurt import _native

        out = _native.parse_obj(text)
        if out is not None:
            return out
    if warn is None:
        warn = lambda msg: print(msg, file=sys.stderr)

    vertices = []
    normals = []
    faces = []  # (vIdx[3], nIdx[3]) 0-based
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("v "):
            parts = line.split()
            if len(parts) >= 4:
                try:
                    vertices.append([float(parts[1]), float(parts[2]), float(parts[3])])
                except ValueError:
                    pass
        elif line.startswith("vn "):
            parts = line.split()
            if len(parts) >= 4:
                try:
                    normals.append([float(parts[1]), float(parts[2]), float(parts[3])])
                except ValueError:
                    pass
        elif line.startswith("f "):
            parts = line.split()[1:]
            if len(parts) != 3:
                warn(f"Unsupported face format: {line}")
                continue
            v_idx, n_idx = [], []
            ok = True
            for p in parts:
                comps = p.split("/")
                # "v/t/n" has 3 components, "v//n" has 3 with empty middle.
                if len(comps) != 3 or not comps[0] or not comps[2]:
                    ok = False
                    break
                try:
                    v_idx.append(int(comps[0]) - 1)
                    n_idx.append(int(comps[2]) - 1)
                except ValueError:
                    ok = False
                    break
            if not ok:
                warn(f"Unsupported face format: {line}")
                continue
            faces.append((v_idx, n_idx))

    v = np.asarray(vertices, np.float32).reshape(-1, 3)
    n = np.asarray(normals, np.float32).reshape(-1, 3)

    pos_out, nrm_out = [], []
    for v_idx, n_idx in faces:
        vi = np.asarray(v_idx)
        ni = np.asarray(n_idx)
        if (vi < 0).any() or (vi >= len(v)).any() or (ni < 0).any() or (
            ni >= len(n)
        ).any():
            warn(f"Index out of bounds in face: f {vi + 1} // {ni + 1}")
            continue
        pos_out.append(v[vi])
        nrm_out.append(n[ni])

    pos = np.asarray(pos_out, np.float32).reshape(-1, 3, 3)
    nrm = np.asarray(nrm_out, np.float32).reshape(-1, 3, 3)
    return pos, nrm


def load_obj(path: str, warn=None) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "r") as f:
        return parse_obj(f.read(), warn=warn)


def write_obj(path: str, pos: np.ndarray, nrm: np.ndarray) -> None:
    """Write a triangle soup back out (used for fixtures/benchmarks;
    the reference ships no assets, so scenes are generated)."""
    pos = np.asarray(pos, np.float32).reshape(-1, 3, 3)
    nrm = np.asarray(nrm, np.float32).reshape(-1, 3, 3)
    lines = []
    for tri in pos:
        for v in tri:
            lines.append(f"v {v[0]:.9g} {v[1]:.9g} {v[2]:.9g}")
    for tri in nrm:
        for n in tri:
            lines.append(f"vn {n[0]:.9g} {n[1]:.9g} {n[2]:.9g}")
    for i in range(len(pos)):
        a, b, c = 3 * i + 1, 3 * i + 2, 3 * i + 3
        lines.append(f"f {a}//{a} {b}//{b} {c}//{c}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
