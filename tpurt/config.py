"""Render configuration.

Replaces the reference's three-tier config (compile-time #defines +
mutable globals + interactive stdin overrides, src/settings.hpp:13-62,
src/main.cpp:195-234) with a single frozen dataclass. Defaults match
src/settings.hpp exactly so the default workload is the reference's
implicit benchmark (512x512, 50 spp, 50 bounces, tile 512).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

#: Space between the loaded model and the Cornell-box walls
#: (ref: src/settings.hpp:52  CORNELL_BREATHING_ROOM).
CORNELL_BREATHING_ROOM = 100.0

#: Numeric epsilon used throughout the kernel (ref: src/Trace.cl:6).
EPSILON = 1e-6

#: Index of refraction of the surrounding medium (ref: src/Trace.cl:7).
IOR_AIR = 1.0

#: Mesh/chain-entry count above which per-lane parameter fetches switch
#: from unrolled broadcast-select chains to real gathers. Selects are
#: measured-right at K<=8 (each is one fused VPU op; a gather inside the
#: loop costs a fixed ~0.2-0.35 ms), but the select chains grow the loop
#: body O(K) per call site, so compile time and body size become
#: unusable around K~100 (the reference's mesh loop, src/Trace.cl:444-482,
#: is O(K) per ray at RUNTIME — the select form is O(K) in CODE size
#: too). Above this threshold the megakernel also forces the XLA loop
#: body: Mosaic has no dynamic-gather lowering on this toolchain.
#:
#: Default 64 (was 24): the gather-regime executable REPRODUCIBLY
#: crashes the axon TPU worker at K=64 (kernel fault, probe r62 —
#: both 230k and 57k lanes), while the select regime at K=64 compiles
#: and runs (3.4 Mrays/s on the 64-instance grid vs K=8's 33 — the
#: O(K) chains are slow but alive). Until the worker bug is gone,
#: scenes in [25, 64] instances stay on selects; the gather regime
#: remains correct on CPU (tests/test_many_meshes.py) and is the only
#: compile-viable form past ~100.
SELECT_GATHER_THRESHOLD = 64

#: Instanced-mesh count above which scene freeze emits a TLAS (top-
#: level BVH over instances): instance transforms/bounds become DATA
#: ROWS in the megakernel's narrow bank and chain-enter becomes a
#: traversal step, so loop-body size stops growing O(K) with the
#: instance count and the crashing K>64 many-gather while_loop
#: (probe r62, the axon worker fault) is never needed. At or below the
#: threshold the unrolled select-chain entries stay — measured right
#: for small K (each enter is a handful of fused VPU ops; the TLAS
#: costs ~1 extra gathered row per entered instance). Replaces the
#: reference's O(K)-per-ray mesh loop (src/Trace.cl:444-482) with an
#: O(log K) structure it never had.
MEGA_TLAS_THRESHOLD = 8

#: Maximum chain entries the megakernel's enter step will advance past
#: IN-PLACE when their root pretests fail (the chain skip). Each step
#: unrolls one more _enter/_pretest round into the loop body, so the
#: cap bounds body growth for long chains; lanes that exhaust it fall
#: back to the one-entry-per-iteration fold (bitwise-identical, just
#: slower). Chains of <= MEGA_SKIP_CAP + 1 entries always drain in the
#: iteration that finishes a segment.
MEGA_SKIP_CAP = 3

#: Pallas-body while_loop unroll: bodies emitted per loop trip. Each
#: extra body halves the share of the loop's fixed cond-sync cost and
#: gives the async scheduler one more independent gather/body pair to
#: overlap across the former iteration boundary; trajectories are
#: unchanged (an unrolled body just advances further per trip, always
#: valid). XLA-backed bodies keep unroll=1 (doubling an already-huge
#: XLA loop body explodes CPU compile time). Read at trace time via
#: _config_mod() so probes can sweep it (with jax.clear_caches()).
MEGA_UNROLL = 2

#: Minimum lanes per interleaved sub-batch. Interleaving pays because
#: sub-batch j's row-gather DMA overlaps sub-batch j-1's Pallas body
#: (scripts/probe_r3b.py: 46 -> 12 ns/row), but the XLA gather engine's
#: row rate falls off steeply below ~131k rows (161 Mrows/s at 262k,
#: plus a fixed ~0.4 ms floor per gather at 16k) — splitting a small
#: batch loses more gather efficiency than the overlap wins back.
#: Measured on the v5e bunny 1080p ladder: plain 262k-lane batches
#: (sub 131k) 23.7 -> 24.9 Mrays/s with interleave=2, but the staged
#: schedule's 65k-lane tail stage (sub 32k) dragged the headline
#: 30.9 -> 27.4. Batches whose sub-batches would fall below this floor
#: DROP to the largest interleave that stays at/above it
#: (bitwise-identical either way). 65536 admits interleave=4 on the
#: 262k headline batches — measured +5% over interleave=2
#: (41.5 vs 39.5 Mrays/s staged, scripts/probe_r27.py) — while the
#: 65k tail/cascade stages still run interleave=1 exactly as under
#: the old 131072 floor with interleave=2.
MEGA_INTERLEAVE_FLOOR = 65536

#: Inline root-node expansion at chain-enter time. A traversal entry
#: whose root row is a NODE row normally spends its first loop
#: iteration gathering that row (whose index is BUILD-TIME STATIC per
#: entry) just to run the 32-child test on it. When enabled, the enter
#: step runs that first node test inline from a small precomputed
#: per-entry table (decoded child bounds as SMEM scalars — no row
#: gather, no scalar bitcasts, which Mosaic cannot lower) and descends
#: directly to the first hit child — merging the measured 0.50/seg
#: enter-bubble iteration into productive work and removing ~1 gathered
#: row per entered traversal (round-2 counters: node 1.01/seg of live
#: 2.14). Trajectory-identical hit decisions: the table holds the exact
#: f32 values the in-loop decode computes. Disabled above the entry cap
#: (each expanded entry adds MEGA_ARITY slab tests to the tail body).
MEGA_ROOT_EXPAND = True
MEGA_ROOT_EXPAND_MAX_E = 4

#: Tail passes that run the enter-time root expansion. Each expanded
#: entry costs MEGA_ARITY slab tests PER TAIL PASS (the expansion block
#: is emitted once per pass), so later passes' expansions triple that
#: body cost at tail_passes=3. Passes beyond this count enter with
#: cur = root instead; the NEXT iteration's node branch performs the
#: same 32-child test from the gathered root row — radiance is bitwise
#: identical (same per-lane op sequence), only iteration scheduling
#: moves. 99 = expand in every pass.
MEGA_EXPAND_PASSES = 99

#: Lanes per Pallas grid block in the fused Mosaic body (was a module
#: constant in render/mega_pallas.py). The tail3+expansion body sits at
#: the compiler's default 16 MB scoped-VMEM ceiling at 4096 (probe_r34:
#: +1 MB of intermediates OOMs the kernel), which suggests spill
#: pressure; read at trace time so probes can sweep it.
MEGA_BLOCK_LANES = 4096

#: Inline exact triangles per megakernel leaf row. Read at scene
#: FREEZE; the kernel's leaf block follows the scene layout
#: (Scene.mega_leaf_tris). Iterations are segment-pipeline-bound, NOT
#: traversal-step-bound (probe r59b: iters/frame pinned from leaf4
#: through leaf16 AND from arity 4 through 32), so the bank is sized
#: for the NARROWEST rows, not the fattest: fewer gathered bytes per
#: iteration, a smaller in-kernel traversal block, and scoped-VMEM
#: slack that un-spills the deeper tail-pass ladder. v5e headline
#: ladder (probes r63-r68, radiance/segment counts identical at every
#: point): leaf8/W160 226.5 -> leaf5/W104 295.0 -> +tail4 314.4 ->
#: arity16/leaf4/W80 356.9 -> arity8/leaf3/W64 + tail5 382.6 Mrays/s.
#: leaf16 (W320) exceeds the v5e scoped-VMEM ceiling; wide layouts
#: remain autotuner axes for chips with different budgets.
MEGA_LEAF_TRIS = 3

#: Children per megakernel node row (read at scene FREEZE; the kernel
#: follows Scene.mega_arity). Small arity shrinks the node-row words
#: (u8 bank floor: 7+3*arity) and the per-iteration node branch (arity
#: slab tests); the tree deepens (blob: depth 7 -> 11 at 8) but
#: iterations stay segment-pipeline-bound. arity 4 measured WORSE than
#: 8 (the doubled register stack streams every iteration). Must fit
#: MEGA_SLOT_BITS (<= 63).
MEGA_NODE_ARITY = 8

#: Mosaic vmem_limit_bytes for the fused body (0 = compiler default,
#: 16 MB scoped). v5e VMEM is far larger than the default scoped
#: limit; raising it gives the register allocator room instead of
#: spilling/failing.
MEGA_VMEM_LIMIT_MB = 0

#: Scene-specialised material-branch pruning in the shade step
#: (shading.shade_hit_soa ``present``): bitwise-identical on CPU (the
#: pruned branches' masks are all-False and masked RNG draws freeze).
#: Round 3 measured it a net LOSS (the pruned program exceeded the
#: 16 MB scoped-VMEM ceiling — fewer ops, worse schedule); with the
#: narrow a8/l3/W64 bank's slack it compiles at the default budget and
#: wins: 380.9 -> 389.2 Mrays/s on the headline (probe r70). Default
#: ON; the default-suite mega-vs-oracle golden exercises the pruned
#: body bitwise (the Cornell-sphere scene lacks several material
#: types).
MEGA_MAT_PRUNE = True

#: Freeze-time node-row bounds encoding (scene/builder): bf16 absolute
#: child bounds (4 words/slot, decode = shift+bitcast) instead of u8 on
#: a per-node grid (3 words/slot, byte extraction + FMA decode). bf16
#: is both cheaper to decode (~20 fewer VPU ops per slot) and TIGHTER
#: (relative 2^-8 rounding vs 1/255 of the parent extent), so lanes
#: descend into fewer false-positive children. Conservative either way:
#: hit results are identical, only traversal work changes. Baked into
#: the Scene at freeze (Scene.mega_bounds_fmt).
MEGA_BF16_BOUNDS = False

#: Dense-sweep accept tests in numerator form (render/plucker_fused):
#: the sign of det folds into the u/v numerators, compared against
#: |det| directly, so the divided u/v are never materialised. t's
#: division survives (the winner fold needs comparable distances), so
#: this trades 2 multiplies for ~4 selects/negates — measured on the
#: teapot-720p row before shipping a default (probe r73). Read at
#: TRACE time (probes sweep it with jax.clear_caches()).
DENSE_NUMERATOR_ACCEPT = False

#: PROBE-ONLY: replace the per-iteration row gather with a broadcast of
#: row 0 (same shape, no gather engine). Renders garbage — exists so
#: dual-cap marginal probes can price the gather inside the REAL engine
#: schedule (gather-vs-body overlap attribution, scripts/probe_r46.py).
MEGA_FAKE_GATHER = False


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Knobs of a single render.

    Field defaults mirror src/settings.hpp:23-50 and the camera/fov
    set-up at src/main.cpp:299-304.
    """

    width: int = 512
    height: int = 512
    rays_per_pixel: int = 50
    max_bounces: int = 50
    tile_size: int = 512
    object_path: str = "knight.obj"

    #: Camera start pose (ref: src/settings.hpp:23-28).
    camera_position: Tuple[float, float, float] = (0.0, 150.0, 250.0)
    camera_pitch: float = 0.0
    camera_yaw: float = 3.14
    camera_roll: float = 0.0
    fov_degrees: float = 90.0

    #: ``"reference"`` reuses one RNG stream across all samples of a
    #: pixel, bit-matching the reference spp loop (src/Trace.cl:639-642,
    #: where the state threads through every sample sequentially).
    #: ``"decorrelated"`` re-seeds each sample via MakeSeed(pixel, frame,
    #: sample) so the sample axis becomes embarrassingly parallel and can
    #: be sharded over chips (psum of radiance) — an intentional
    #: improvement; MakeSeed already takes a rayIdx slot the reference
    #: always passes 0 to (src/Trace.cl:632).
    seed_mode: str = "reference"

    #: Budget of extra loop iterations granted to Invisible-material
    #: pass-throughs, which in the reference do NOT count as bounces and
    #: make the bounce loop unbounded (src/Trace.cl:502-506). A masked
    #: while_loop needs a hard trip cap; rays that exhaust the budget
    #: terminate (they would have escaped the scene long before).
    invisible_budget: int = 32

    #: Number of video frames; 1 renders a single output.bmp
    #: (ref: src/settings.hpp:55  VIDEO_FRAME_COUNT).
    video_frame_count: int = 1
    video_output_dir: str = "img"

    #: Optional sub-pixel jitter. The reference casts ONE camera ray per
    #: pixel and reuses it for every sample (src/Trace.cl:636-641) — no
    #: anti-aliasing. Off by default for parity.
    subpixel_jitter: bool = False

    #: Triangle-count threshold below which a mesh is intersected by
    #: brute force instead of BVH traversal. Dense all-pairs intersection
    #: is branch-free and VPU-shaped, so it beats divergent traversal for
    #: small meshes on TPU.
    bruteforce_threshold: int = 4096

    #: Lanes per megakernel launch on the flat (non-tiled) fast path.
    #: The gather engine amortises its fixed per-iteration cost over the
    #: batch (~110M rows/s at 65k lanes -> ~207M at 262k, measured), so
    #: bigger is faster until HBM state streaming dominates. Full frames
    #: render as ceil(W*H / rays_per_batch) flat launches.
    rays_per_batch: int = 262144

    #: Pixels each megakernel lane renders sequentially (flat path
    #: only). One flat launch covers rays_per_batch * pixels_per_lane
    #: pixels: lane i owns pixels start+i, start+i+B, ... (stride B).
    #: A lane that finishes a pixel's samples advances to its next
    #: pixel in-loop (primary ray + seed recomputed in the kernel), so
    #: fast lanes keep working while slow ones traverse — measured to
    #: cut idle-tail iterations ~2x on the bunny ladder (the tail of a
    #: quota batch is one straggler set instead of pixels_per_lane of
    #: them, and per-lane work variance averages down). Bitwise-
    #: identical to pixels_per_lane=1 (tests/test_mega_pallas.py).
    pixels_per_lane: int = 1

    #: Sample-flattened scheduling (decorrelated seed mode only): the
    #: frame renders as rays_per_pixel one-sample passes accumulated on
    #: device instead of each lane looping its pixel's samples. Lane
    #: work becomes near-uniform (one path segment chain per task), so
    #: the straggler tail shrinks from the worst PIXEL (spp x path
    #: variance) to the worst single path. Bitwise-identical to the
    #: ordinary decorrelated render: per-sample trajectories are pure
    #: functions of (pixel, frame, sample) and the device accumulation
    #: adds in the same sample order the in-lane loop uses.
    sample_flatten: bool = False

    #: Lane-compaction threshold for the megakernel (single-chip path):
    #: tiles with at least this many pixels run in host-driven stages —
    #: a capped main stage, then the surviving (slowest) lanes compact
    #: into a quarter-size batch that finishes alone, so the tail of
    #: deep paths stops taxing every lane. 0 disables.
    compaction_threshold: int = 32768

    #: Integrator engine. ``"mega"`` is the persistent-lane megakernel
    #: (one flattened while_loop; the TPU fast path). ``"modular"`` is
    #: the readable nested-loop engine used as its cross-check. Both are
    #: bit-exact against the scalar oracle and each other.
    engine: str = "mega"

    #: Megakernel loop-body backend. ``"xla"`` runs the per-iteration
    #: lane math as XLA ops (the parity anchor, bit-exact vs the scalar
    #: oracle). ``"pallas"`` fuses the whole body into one Mosaic kernel
    #: per iteration (render/mega_pallas.py) — measured necessary on TPU
    #: because XLA leaves the body's elementwise chains unfused: on the
    #: v5e the same bunny batch ran 5585 us/iter (XLA) vs 2372 us/iter
    #: (Pallas), bit-identical outputs (incl. transcendentals).
    #: ``"auto"`` (default) picks pallas on TPU backends and xla
    #: elsewhere. Ignored with subpixel_jitter (falls back to "xla").
    mega_body: str = "auto"

    #: Interleaved megakernel sub-batches: the flat batch splits into
    #: this many independent sub-batches stepped back-to-back inside
    #: one while_loop iteration, so each sub-batch's BVH row gather
    #: (an XLA dynamic-gather the TPU issues as DMA) overlaps the
    #: previous sub-batch's fused Pallas body — two chained
    #: gather+pallas half-batches measured ~4x per-row vs one chain on
    #: the v5e (scripts/probe_r3b.py). Bitwise-identical to 1 (lane
    #: trajectories are independent). Ignored when the batch does not
    #: split 128-lane-aligned.
    mega_interleave: int = 1

    #: Segment-completion passes per megakernel loop iteration. The
    #: loop body's tail (shade -> restart -> static stage -> chain
    #: enter) runs this many times back-to-back, so a lane whose fresh
    #: segment completes WITHOUT traversal — a cache-replayed primary,
    #: or a ray whose every chain pretest fails (wall hits: the static
    #: stage already resolved it) — shades in the SAME iteration
    #: instead of burning a whole row-gather iteration idling.
    #: Bitwise-identical to 1 (same per-lane op sequence, fewer trips).
    #:
    #: Default 1: MEASURED WORSE at 2 on the bunny 1080p ladder
    #: (scripts/probe_r4.py, v5e): a batch's iteration count is set by
    #: its STRAGGLER lanes, whose trajectories are traversal-dominated
    #: — collapsing the mean lane's bubbles cut iterations only 8%
    #: (648 -> 596) while the doubled tail code raised the fused body
    #: +30% us/iter (2299 -> 2982). Net 24.9 -> 20.9 Mrays/s plain,
    #: 27.4 -> 25.8 staged. Kept as a knob: scenes whose straggler
    #: paths are replay/pretest-fail-heavy (thin geometry, high spp)
    #: invert the tradeoff.
    mega_tail_passes: int = 1

    #: Cross-frame lane packing: multi-frame drivers (bench steady
    #: blocks, animation sweeps) may pack this many FRAMES into one
    #: megakernel launch — quota slots span frames, so one frame's
    #: straggler tail shares loop iterations with the next frame's
    #: ramp and straggler variance averages over frames*pixels_per_lane
    #: pixels per lane. Bitwise-identical to frame-by-frame dispatch
    #: (trajectories are pure functions of (pixel, frame, sample);
    #: tests/test_flat_batching.py). Single-frame APIs (render_frame,
    #: one-frame latency) ignore it. Plain schedule, in-lane samples,
    #: shared camera position only (megakernel.run_megakernel).
    mega_frames_per_batch: int = 1

    #: Gather/body ordering inside one interleaved loop iteration
    #: (only meaningful when mega_interleave > 1 takes effect):
    #: "inline"  — each sub-batch's gather is emitted immediately
    #:             before its own body; XLA's async scheduler hoists
    #:             the independent DMA past the PREVIOUS sub-batch's
    #:             Pallas call, so gather_j overlaps body_{j-1}.
    #:             Measured 30.4-34.4 Mrays/s on the staged bunny
    #:             ladder (scripts/probe_r6.py) — the default.
    #: "gfirst"  — all sub-batch gathers emitted before any body.
    #:             MEASURED PATHOLOGICAL (2.9 Mrays/s staged,
    #:             scripts/probe_r5.py): batching the DMAs serialises
    #:             them against each other ahead of all compute.
    #: "carry"   — software pipelining: the loop CARRIES each sub-
    #:             batch's gathered rows, issued one body-step ahead of
    #:             consumption, so every row DMA has a full Pallas body
    #:             to hide behind.
    #: "pair2"   — sub-batches advance in PAIRS: both gathers of a
    #:             pair emitted adjacently, then both bodies, so two
    #:             row DMAs are in flight at once (the bare-chain
    #:             gather engine runs ~+20% with two independent
    #:             gathers per step, scripts/probe_r3b.py) while the
    #:             pair's bodies still overlap the NEXT pair's DMAs.
    #:             Needs interleave >= 4 to differ from "inline".
    #: All schedules are bitwise-identical (same per-lane op sequence).
    mega_schedule: str = "inline"

    #: Respread the staged quota tail: when the surviving lanes'
    #: remaining quota pixels fit one 65536-wide batch, re-trace them
    #: as a fresh dense P=1 batch instead of grinding the uncapped
    #: stage at ~3% occupancy (a straggler lane can still hold up to P
    #: unstarted pixels). Pixel traces are pure functions of the pixel
    #: index, so the respread frame is identical up to the usual
    #: staged-executable 1-ulp class. The SPMD answer to the
    #: reference's dynamic work queue draining its tail
    #: (src/image.hpp:289-333).
    mega_tail_respread: bool = True

    #: Cascade respread: fire the quota respread while up to
    #: renderer._CASCADE_MAX incomplete pixels remain (not just when
    #: the tail fits one 65536-pixel P=1 batch) and re-trace them as a
    #: fresh FULL-OCCUPANCY staged quota batch over the packed pixel
    #: list (megakernel list-quota mode), recursing on that batch's own
    #: stragglers. The first stage's cap drops to _CASCADE_STAGE0 so
    #: the boundary lands mid-decay of the retirement curve. Work is
    #: never ground at a few-percent occupancy; the price is re-tracing
    #: the in-flight pixels' partial samples (percent-level). The same
    #: pixel-purity argument as the plain respread: identical up to the
    #: different-executable 1-ulp class. Measured on v5e (bunny 1080p
    #: headline, same process): 34.63 -> 37.74 Mrays/s (+9%), output
    #: bitwise-identical to the non-cascade path.
    mega_cascade: bool = True

    #: Speculative replay of the staged schedule: after one blocking
    #: run of a (scene, shape) key, later frames dispatch the SAME
    #: stage/compact/respread sequence without blocking host reads and
    #: validate guard scalars after dispatch (one readback, overlapped
    #: with queued device work). Each blocking int(active) costs ~25 ms
    #: of device idle over the axon tunnel (scripts/probe_r21.py), and
    #: removing them lets multi-batch frames pipeline on the device. A
    #: failed guard (the retirement curve shifted) falls back to the
    #: blocking path from the untouched entry state — always correct,
    #: one speculative pass wasted.
    mega_speculative: bool = True

    #: Brute-force the megakernel: every loop iteration resolves each
    #: live lane's whole current chain entry with ONE fused Plücker
    #: MXU sweep (render/plucker_fused.py) instead of walking the BVH
    #: row bank — the TPU-native form of the reference's UseBVH=false
    #: dense mode (Trace.cl:276-317 + 444-482). One path segment per
    #: lane per iteration, no row gathers; cost scales with the scene's
    #: total chain-triangle count, so this is the small-scene /
    #: cross-check engine (the BVH megakernel wins beyond a few
    #: thousand triangles). Winner acceptance is Plücker-precision
    #: (~1 ulp off the sequential math), shading data exact — the same
    #: contract as dense_engine="plucker".
    mega_dense: bool = False

    #: Dense-sweep backend for brute-force intersection (modular engine
    #: + fused static pass). ``"exact"`` is the broadcast VPU form,
    #: bit-identical to the scalar oracle. ``"plucker"`` rewrites MT as
    #: a (R,16)x(16,4T) GEMM on the MXU (render/plucker.py) — measured
    #: ~13x faster end-to-end, within ~1 ulp of exact but NOT bitwise
    #: (different summation order; geometric rather than smooth-normal
    #: backface culling during the sweep). ``"pallas"`` runs the sweep
    #: as a Mosaic kernel (render/pallas_kernels.py): triangle rows
    #: resident in VMEM, one fused kernel per ray block — same
    #: acceptance rules as "exact" up to 1-ulp normalisation edges.
    #: Requires a TPU backend; on other backends it falls back to
    #: "exact" (interpret mode is test-only).
    dense_engine: str = "exact"

    def __post_init__(self) -> None:
        if self.seed_mode not in ("reference", "decorrelated"):
            raise ValueError(f"unknown seed_mode: {self.seed_mode!r}")
        if self.engine not in ("mega", "modular"):
            raise ValueError(f"unknown engine: {self.engine!r}")
        if self.dense_engine not in ("exact", "plucker", "pallas"):
            raise ValueError(f"unknown dense_engine: {self.dense_engine!r}")
        if self.mega_body not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown mega_body: {self.mega_body!r}")
        if self.width <= 0 or self.height <= 0:
            raise ValueError("image dimensions must be positive")
        if self.rays_per_pixel <= 0:
            raise ValueError("rays_per_pixel must be positive")
        if self.pixels_per_lane < 1:
            raise ValueError("pixels_per_lane must be >= 1")
        if self.mega_interleave < 1:
            raise ValueError("mega_interleave must be >= 1")
        if self.mega_tail_passes < 1:
            raise ValueError("mega_tail_passes must be >= 1")
        if self.mega_schedule not in ("inline", "gfirst", "carry", "pair2"):
            raise ValueError(
                "mega_schedule must be 'inline', 'gfirst', 'carry' or"
                " 'pair2'"
            )
        if self.sample_flatten and self.seed_mode != "decorrelated":
            raise ValueError(
                "sample_flatten requires seed_mode='decorrelated' "
                "(reference mode's RNG stream is sequential across a "
                "pixel's samples)"
            )
        # Reference clamps tile size into [1, min(W, H)] (src/main.cpp:230-234).
        object.__setattr__(
            self, "tile_size", max(1, min(self.tile_size, self.width, self.height))
        )

    @property
    def aspect_ratio(self) -> float:
        return float(self.width) / float(self.height)

    def tiles(self) -> Tuple[int, int]:
        """Number of tiles (x, y), ceil-divided like src/main.cpp:678-684."""
        tx = -(-self.width // self.tile_size)
        ty = -(-self.height // self.tile_size)
        return tx, ty

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
