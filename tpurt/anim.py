"""Animation: per-frame scene updates and the video render loop.

setupNextVideoFrame (src/image.hpp:385-399) rotates the last mesh's yaw
to 2*pi*frame/VIDEO_FRAME_COUNT + 5.5 before each frame. The reference's
actual multi-frame loop is commented out (main.cpp:686-704) — only the
single-frame call with frame 0 runs — so this module supplies the
capability the reference documents: frames rendered to
<out_dir>/output_<i>.bmp, assembled by scripts/render.sh (ffmpeg), with
per-frame seeds flowing through MakeSeed's frameIndex.

Scene transforms are traced data, so a frame update is a cheap pytree
``replace`` — no host rebuild, and the same compiled render executable
serves every frame.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional

import numpy as np

from tpurt.config import RenderConfig
from tpurt.core.camera import Camera
from tpurt.render.renderer import render_frame
from tpurt.render.tonemap import tonemap
from tpurt.io.bmp import write_bmp
from tpurt.scene.types import Scene


def set_mesh_yaw(scene: Scene, mesh_index: int, yaw: float) -> Scene:
    """Returns a scene with one mesh's yaw replaced.

    Refuses meshes frozen as identity transforms: the intersector routed
    them into the fused world-space sweep at freeze time, so rotating
    them post-freeze would render stale geometry. Rebuild via
    SceneBuilder (or give the mesh a non-identity transform before
    freezing) to animate it.
    """
    if scene.mesh_identity[mesh_index % scene.num_meshes]:
        raise ValueError(
            f"mesh {mesh_index} was frozen with an identity transform and "
            "is fused into the static world sweep; re-freeze the scene "
            "with a non-identity transform to animate it"
        )
    if getattr(scene, "mega_tlas", False):
        raise ValueError(
            "this scene froze its instance transforms into the TLAS row "
            "bank (instance count > config.MEGA_TLAS_THRESHOLD); rebuild "
            "and re-freeze per frame to animate, or raise the threshold "
            "to keep transforms traced"
        )
    return scene.replace(
        mesh_yaw=scene.mesh_yaw.at[mesh_index].set(np.float32(yaw))
    )


def video_frame_scene(scene: Scene, frame_index: int, frame_count: int) -> Scene:
    """setupNextVideoFrame semantics: last mesh yaw =
    2*pi*frame/count + 5.5 (the +5.5 makes a single frame 'start out
    cool', image.hpp:390)."""
    yaw = (2.0 * math.pi / float(frame_count)) * float(frame_index) + 5.5
    return set_mesh_yaw(scene, scene.num_meshes - 1, yaw)


def _dispatch_frame_u8(scene, camera, cfg, frame_index):
    """Dispatch one whole frame on device and return its tonemapped
    uint8 batch buffers WITHOUT materialising them (no host read: the
    caller overlaps this frame's compute with the previous frame's
    delivery). Flat mega path only."""
    from tpurt.render.renderer import (
        _flat_batch_size, _tonemap_dev, render_batch_flat,
    )

    total = cfg.width * cfg.height
    b = _flat_batch_size(cfg) * cfg.pixels_per_lane
    bufs = []
    for i in range(-(-total // b)):
        mean, _, _ = render_batch_flat(
            scene, camera, cfg, i * b, frame_index=frame_index
        )
        bufs.append(_tonemap_dev(mean))
    return bufs


def _materialise_frame_u8(bufs, cfg) -> np.ndarray:
    total = cfg.width * cfg.height
    out = np.zeros((total, 3), np.uint8)
    start = 0
    for t in bufs:
        t_np = np.asarray(t)
        n = min(t_np.shape[0], total - start)
        out[start : start + n] = t_np[:n]
        start += n
    return out.reshape(cfg.height, cfg.width, 3)


def render_video(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    out_dir: Optional[str] = None,
    frame_hook: Callable[[Scene, int, int], Scene] = video_frame_scene,
    progress=None,
) -> list:
    """Render cfg.video_frame_count frames to out_dir/output_<i>.bmp.

    The output naming matches what the reference's render.sh consumes
    (img/output_%d.bmp). Returns the list of written paths.

    On the flat mega path frames are DOUBLE-BUFFERED: frame f+1's
    device work is dispatched before frame f's pixels are pulled to the
    host and written, so delivery (D2H + BMP encode) overlaps the next
    frame's render and steady-state wall-clock per frame approaches
    max(render, delivery) instead of their sum. Frame pixels are
    bitwise-identical to the sequential path (dispatch order per frame
    is unchanged; only the host read moves later).
    """
    out_dir = out_dir or cfg.video_output_dir
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    n = cfg.video_frame_count
    fast = (
        cfg.engine == "mega" and cfg.rays_per_batch > 0
        and cfg.max_bounces > 0
        and not (cfg.sample_flatten and cfg.rays_per_pixel > 1)
    )
    if fast:
        pending = []  # [(frame_index, device buffers)] awaiting delivery

        def deliver():
            for f, bufs in pending:
                img = _materialise_frame_u8(bufs, cfg)
                path = os.path.join(out_dir, f"output_{f}.bmp")
                write_bmp(path, img)
                paths.append(path)
                if progress is not None:
                    progress(f + 1, n)
            pending.clear()

        # Cross-frame packing (cfg.mega_frames_per_batch): applies only
        # when the hook leaves the scene UNCHANGED for the whole pack
        # (progressive/noise-varying videos; the reference's mesh-yaw
        # hook returns a new scene per frame, so it renders unpacked).
        # Packing runs the PLAIN flat schedule with in-lane samples
        # only (renderer.cross_frame_pack_ok, the shared eligibility
        # predicate): ineligible configs fall back to per-frame
        # dispatch instead of tripping run_megakernel's assertions.
        pack = max(1, int(getattr(cfg, "mega_frames_per_batch", 1)))
        from tpurt.render.renderer import cross_frame_pack_ok

        if not cross_frame_pack_ok(cfg):
            pack = 1
        f = 0
        while f < n:
            frame_scene = frame_hook(scene, f, n)
            k = 1
            if pack > 1 and frame_scene is scene:
                while (f + k < n and k < pack
                       and frame_hook(scene, f + k, n) is scene):
                    k += 1
            if k > 1:
                from tpurt.render.renderer import render_batch_flat_frames
                from tpurt.render.renderer import (
                    _flat_batch_size, _slice_dev, _tonemap_dev,
                )

                total = cfg.width * cfg.height
                b = _flat_batch_size(cfg) * cfg.pixels_per_lane
                packs = [[] for _ in range(k)]
                for i in range(-(-total // b)):
                    m, _, _ = render_batch_flat_frames(
                        frame_scene, (camera,) * k, cfg, i * b,
                        frame_index=f,
                    )
                    for j in range(k):
                        packs[j].append(_tonemap_dev(
                            _slice_dev(m, j * b, b)))
                items = [(f + j, packs[j]) for j in range(k)]
            else:
                items = [(f, _dispatch_frame_u8(frame_scene, camera, cfg,
                                                f))]
            deliver()  # previous pack ships while this one renders
            pending.extend(items)
            f += k
        deliver()
        return paths
    for f in range(n):
        frame_scene = frame_hook(scene, f, n)
        radiance = render_frame(frame_scene, camera, cfg, frame_index=f)
        import jax.numpy as jnp

        img = np.asarray(tonemap(jnp.asarray(radiance)))
        path = os.path.join(out_dir, f"output_{f}.bmp")
        write_bmp(path, img)
        paths.append(path)
        if progress is not None:
            progress(f + 1, n)
    return paths


def progressive_render(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    passes: int,
    preview_path: Optional[str] = "preview.bmp",
    preview_every: int = 10,
    progress=None,
) -> np.ndarray:
    """Progressive refinement: accumulate whole-frame passes with
    different frameIndex seeds and average — the semantics of the
    reference's interactive viewer (intBuffer accumulation,
    main.cpp:574-582) and of its promised-but-unimplemented
    'preview.bmp every 10 frames' (settings.hpp:19-20). Returns the
    final averaged radiance."""
    import jax.numpy as jnp

    acc = np.zeros((cfg.height, cfg.width, 3), np.float32)
    for i in range(passes):
        acc += render_frame(scene, camera, cfg, frame_index=i)
        if preview_path and ((i + 1) % preview_every == 0 or i + 1 == passes):
            write_bmp(preview_path, np.asarray(tonemap(jnp.asarray(acc / (i + 1)))))
        if progress is not None:
            progress(i + 1, passes)
    return acc / passes
