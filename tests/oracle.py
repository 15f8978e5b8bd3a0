"""Scalar CPU oracle: an independent, deliberately-slow reimplementation
of the reference renderer's exact algorithm (src/Trace.cl), used as
ground truth by the test suite.

Unlike tpurt's vectorised/masked integrator, this follows the kernel's
scalar control flow literally — per-pixel Python loops, float32 numpy
arithmetic, exact 32-bit integer PRNG — so agreement between the two is
meaningful evidence of parity. The reference itself has no tests
(SURVEY.md §4); behavioural comparison is the only ground truth.

Scope: brute-force intersection over each mesh's triangle range (BVH
changes only speed, never results), all five material types, Russian
roulette, gamma/quantisation. Matches Trace.cl:158-217 (PRNG), 276-317
(Moller-Trumbore), 434-485 (scene loop), 487-594 (bounce loop),
596-653 (camera + entry kernel).
"""

from __future__ import annotations

import math

import numpy as np

M32 = 0xFFFFFFFF
F = np.float32
EPS = F(1e-6)
TAU = F(6.283185307179586)
IOR_AIR = F(1.0)

SOLID, CHECKER, INVISIBLE, GLASSY, ONE_SIDED = 0, 1, 2, 3, 4


# --- PRNG (exact integer arithmetic) ---------------------------------------


def map_u32(s: int) -> F:
    return F(np.uint32((s + 1) & M32)) * F(1.0 / 4294967296.0)


def lcg(state: int) -> int:
    return (state * 747796405 + 2891336453) & M32


def random_value(state: int):
    state = lcg(state)
    shift = ((state >> 28) + 4) & 31
    r = (((state >> shift) ^ state) * 277803737) & M32
    r = ((r >> 22) ^ r) & M32
    return state, map_u32(r)


def rand01(state: int):
    state = lcg(state)
    z = state
    z = ((z ^ (z >> 16)) * 0x7FEB352D) & M32
    z = ((z ^ (z >> 15)) * 0x846CA68B) & M32
    z = (z ^ (z >> 16)) & M32
    return state, map_u32(z)


def make_seed(pixel_index: int, frame_index: int, ray_idx: int) -> int:
    s = (pixel_index * 1664525 + (frame_index & M32) * 1013904223) & M32
    s ^= (ray_idx + 0x9E3779B9) & M32
    return (s * 22695477 + 1) & M32


def random_normal(state: int):
    state, u1 = random_value(state)
    state, u2 = random_value(state)
    u1 = max(u1, EPS)
    r = np.sqrt(F(-2.0) * np.log(u1))
    theta = TAU * u2
    return state, F(r * np.cos(theta))


def random_direction(state: int):
    state, x = random_normal(state)
    state, y = random_normal(state)
    state, z = random_normal(state)
    v = np.array([x, y, z], F)
    n = np.sqrt(F(v @ v))
    v = (v / n).astype(F) if n > 0 else v * np.float32(np.inf)
    if not np.all(np.isfinite(v)):
        v = np.array([0.0, 1.0, 0.0], F)
    return state, v


# --- vector helpers (float32) ----------------------------------------------


def normalize(v):
    return (v / np.sqrt(F(v @ v))).astype(F)


def reflect(d, n):
    return (d - F(2.0) * F(d @ n) * n).astype(F)


def refract(d, n, ior_a, ior_b):
    ratio = F(ior_a / ior_b)
    cos_in = F(-(d @ n))
    sin_sqr = F(ratio * ratio * (F(1.0) - cos_in * cos_in))
    if sin_sqr > 1.0:
        return np.zeros(3, F)
    return (ratio * d + (ratio * cos_in - np.sqrt(F(1.0) - sin_sqr)) * n).astype(F)


def reflectance(d, n, ior_a, ior_b):
    ratio = F(ior_a / ior_b)
    cos_in = F(-(d @ n))
    if cos_in <= 0:
        return F(1.0)
    sin_sqr = F(ratio * ratio * (F(1.0) - cos_in * cos_in))
    if sin_sqr >= 1.0:
        return F(1.0)
    cos_out = np.sqrt(F(1.0) - sin_sqr)
    denom = F(ior_a * cos_in + ior_b * cos_out)
    if denom < EPS:
        return F(1.0)
    r_perp = F((ior_a * cos_in - ior_b * cos_out) / denom)
    r_par = F((ior_b * cos_in - ior_a * cos_out) / denom)
    return F((r_perp * r_perp + r_par * r_par) / F(2.0))


def euler(pitch, yaw, roll):
    cx, sx = F(np.cos(F(pitch))), F(np.sin(F(pitch)))
    cy, sy = F(np.cos(F(yaw))), F(np.sin(F(yaw)))
    cz, sz = F(np.cos(F(roll))), F(np.sin(F(roll)))
    return np.array(
        [
            [cy * cz, cy * sz, -sy],
            [cz * sy * sx - cx * sz, cx * cz + sx * sy * sz, cy * sx],
            [sx * sz + cx * cz * sy, cx * sy * sz - cz * sx, cx * cy],
        ],
        F,
    )


# --- geometry ---------------------------------------------------------------


def ray_triangle(ro, rd, pa, pb, pc, na, nb, nc, cull):
    e1 = pb - pa
    e2 = pc - pa
    h = np.cross(rd, e2).astype(F)
    a = F(e1 @ h)
    if abs(a) < EPS:
        return None
    f = F(1.0) / a
    s = (ro - pa).astype(F)
    u = F(f * (s @ h))
    if u < 0.0 or u > 1.0:
        return None
    q = np.cross(s, e1).astype(F)
    v = F(f * (rd @ q))
    if v < 0.0 or u + v > 1.0:
        return None
    t = F(f * (e2 @ q))
    if t <= EPS:
        return None
    n = normalize((na * (F(1.0) - u - v) + nb * u + nc * v).astype(F))
    backface = False
    if F(rd @ n) > EPS:
        if cull:
            return None
        backface = True
        n = -n
    return t, (ro + rd * t).astype(F), n, backface


class OracleScene:
    """Host mirror of the device scene, built from a tpurt Scene."""

    def __init__(self, scene):
        g = lambda x: np.asarray(x, F)
        self.pa, self.pb, self.pc = g(scene.tri_pos_a), g(scene.tri_pos_b), g(scene.tri_pos_c)
        self.na, self.nb, self.nc = g(scene.tri_nrm_a), g(scene.tri_nrm_b), g(scene.tri_nrm_c)
        self.ranges = scene.mesh_tri_ranges
        self.mesh_pos = g(scene.mesh_pos)
        self.mesh_pitch = g(scene.mesh_pitch)
        self.mesh_yaw = g(scene.mesh_yaw)
        self.mesh_roll = g(scene.mesh_roll)
        self.mesh_scale = g(scene.mesh_scale)
        self.mat_type = np.asarray(scene.mat_type)
        self.mat_ior = g(scene.mat_ior)
        self.mat_color = g(scene.mat_color)
        self.mat_em_color = g(scene.mat_emission_color)
        self.mat_em_strength = g(scene.mat_emission_strength)
        self.mat_refl = g(scene.mat_reflectiveness)
        self.mat_spec = g(scene.mat_specular_prob)


def intersect(sc: OracleScene, ro, rd):
    """CalculateRayCollisionWithTriangle (Trace.cl:434-485)."""
    best = None
    best_dst = F(np.inf)
    for mi in range(len(sc.ranges)):
        scale = sc.mesh_scale[mi]
        if scale <= EPS:
            continue
        rot = euler(sc.mesh_pitch[mi], sc.mesh_yaw[mi], sc.mesh_roll[mi])
        lo = (rot.T @ (ro - sc.mesh_pos[mi])).astype(F)
        ld = (rot.T @ rd).astype(F)
        if abs(scale) > EPS:
            lo = (lo / scale).astype(F)
            ld = (ld / scale).astype(F)
        ld = normalize(ld)
        mtype = int(sc.mat_type[mi])
        cull = mtype not in (GLASSY, INVISIBLE, ONE_SIDED)

        local = None
        local_t = F(np.inf)
        f, c = sc.ranges[mi]
        for ti in range(f, f + c):
            r = ray_triangle(
                lo, ld, sc.pa[ti], sc.pb[ti], sc.pc[ti],
                sc.na[ti], sc.nb[ti], sc.nc[ti], cull,
            )
            if r is not None and r[0] < local_t:
                local_t = r[0]
                local = r
        if local is None:
            continue
        t, point_l, n_l, backface = local
        if mtype == ONE_SIDED and backface:
            continue
        point_w = (rot @ (point_l * scale) + sc.mesh_pos[mi]).astype(F)
        n_w = normalize((rot @ n_l).astype(F))
        dst = F(np.sqrt(F((point_w - ro) @ (point_w - ro))))
        if dst < best_dst:
            best_dst = dst
            best = (dst, point_w, n_w, backface, mi)
    return best


def trace(sc: OracleScene, ro, rd, state: int, max_bounces: int):
    """Trace (Trace.cl:487-594). Returns (radiance (3,), rng state)."""
    light = np.zeros(3, F)
    throughput = np.ones(3, F)
    bounce = 0
    ro = ro.copy()
    rd = rd.copy()
    guard = 0
    while bounce < max_bounces:
        guard += 1
        if guard > max_bounces + 10000:
            break  # invisible-loop safety for the oracle only
        hit = intersect(sc, ro, rd)
        if hit is None:
            break
        dst, point, normal, backface, mi = hit
        mtype = int(sc.mat_type[mi])
        color = sc.mat_color[mi].copy()
        em_color = sc.mat_em_color[mi].copy()
        em_strength = F(sc.mat_em_strength[mi])

        if mtype == INVISIBLE:
            ro = (point + rd * EPS).astype(F)
            continue

        if mtype == CHECKER:
            checker = em_strength
            xi = int(np.floor(point[0] / checker))
            zi = int(np.floor(point[2] / checker))
            color = color if ((xi + zi) & 1) == 0 else em_color
            em_strength = F(0.0)
            state, rv = random_value(state)
            is_spec = sc.mat_spec[mi] >= rv
            state, rdir = random_direction(state)
            diffuse = normalize(normal + rdir)
            specular = reflect(rd, normal)
            t_lerp = F(sc.mat_refl[mi] * F(1.0 if is_spec else 0.0))
            rd = normalize(diffuse * (F(1.0) - t_lerp) + specular * t_lerp)
        if mtype == GLASSY:
            ior_cur = sc.mat_ior[mi] if backface else IOR_AIR
            ior_next = IOR_AIR if backface else sc.mat_ior[mi]
            refl_dir = reflect(rd, normal)
            refr_dir = refract(rd, normal, ior_cur, ior_next)
            rw = reflectance(rd, normal, ior_cur, ior_next)
            state, r01 = rand01(state)
            will_reflect = r01 < rw
            rd = refl_dir if will_reflect else refr_dir
            throughput = (throughput * (rw if will_reflect else F(1.0) - rw)).astype(F)
        if mtype == SOLID:
            state, rv = random_value(state)
            is_spec = sc.mat_spec[mi] >= rv
            state, rdir = random_direction(state)
            diffuse = normalize(normal + rdir)
            specular = reflect(rd, normal)
            t_lerp = F(sc.mat_refl[mi] * F(1.0 if is_spec else 0.0))
            rd = normalize(diffuse * (F(1.0) - t_lerp) + specular * t_lerp)

        light = (light + throughput * (em_color * em_strength)).astype(F)
        ro = (point + rd * EPS).astype(F)
        throughput = (throughput * color).astype(F)
        p = F(throughput.max())
        if bounce > 3:
            q = max(F(0.05), F(1.0) - p)
            state, r01 = rand01(state)
            if r01 < q:
                break
            throughput = (throughput / (F(1.0) - q)).astype(F)
        bounce += 1
    return light, state


def make_ray(cam_pos, pitch, yaw, roll, fov_deg, aspect, u, v):
    """MakeRay (Trace.cl:596-621)."""
    ndc_x = F((F(u) * F(2.0) - F(1.0)) * F(aspect))
    ndc_y = F(F(v) * F(2.0) - F(1.0))
    scale = F(np.tan(F(np.deg2rad(F(fov_deg) * F(0.5)))))
    d = normalize(np.array([ndc_x * scale, ndc_y * scale, F(1.0)], F))
    rot = euler(pitch, yaw, roll).T  # camera applies R^T (Trace.cl:608-611)
    return np.asarray(cam_pos, F), normalize((rot @ d).astype(F))


def render(scene, camera, width, height, spp, max_bounces, frame_index=0):
    """The raytrace entry kernel (Trace.cl:623-653) over the full image.
    Returns (radiance (H,W,3) f32, pixels (H,W,3) u8)."""
    sc = OracleScene(scene)
    cam_pos = np.asarray(camera.position, F)
    pitch, yaw, roll = (F(camera.pitch), F(camera.yaw), F(camera.roll))
    fov = F(camera.fov_degrees)
    aspect = F(camera.aspect_ratio)

    radiance = np.zeros((height, width, 3), F)
    pixels = np.zeros((height, width, 3), np.uint8)
    for y in range(height):
        for x in range(width):
            pixel_index = y * width + x
            state = make_seed(pixel_index, frame_index, 0)
            u = F(x) / F(width)
            v = F(1.0) - F(y) / F(height)
            ro, rd = make_ray(cam_pos, pitch, yaw, roll, fov, aspect, u, v)
            acc = np.zeros(3, F)
            for _ in range(spp):
                col, state = trace(sc, ro, rd, state, max_bounces)
                acc = (acc + col).astype(F)
            mean = (acc / F(spp)).astype(F)
            radiance[y, x] = mean
            c = np.clip(mean, 0.0, 1.0).astype(F)
            c = np.power(c, F(1.0 / 2.2)).astype(F)
            pixels[y, x] = (c * F(255.0)).astype(np.uint8)
    return radiance, pixels
