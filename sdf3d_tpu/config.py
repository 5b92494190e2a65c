"""Static render configuration.

The reference bakes every knob in as compile-time constants: march constants
``MAX_STEPS=100, MAX_DISTANCE=100, EPSILON=0.01``
(``/root/reference/Code/shader/voxel_fragment.frag:17-19``), window size 800×600
(``/root/reference/Code/src/main.cpp:4-5``), and shadow sharpness ``k=10``
(``voxel_fragment.frag:205``).  Changing anything there means recompiling the
shader.  Here the same knobs are plain frozen dataclasses: *hashable static
arguments* to ``jax.jit`` — one XLA compilation per config, while scene /
camera / light parameters stay runtime (and differentiable) inputs.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    """Primary sphere-trace march parameters (``voxel_fragment.frag:17-19``)."""

    max_steps: int = 100
    max_distance: float = 100.0
    epsilon: float = 0.01
    #: Stop the march loop once every ray in the batch/tile has terminated
    #: (`lax.while_loop`); turn off for a fixed-trip-count `fori_loop`, which
    #: is bitwise identical but never exits early.
    early_exit: bool = True
    #: Over-relaxed sphere tracing (Keinert et al. 2014, "Enhanced Sphere
    #: Tracing"): step ``ω·s`` instead of ``s`` and fall back (step back and
    #: drop to ω=1 for that ray) when consecutive bounding spheres stop
    #: overlapping.  ``1.0`` (default) is the reference's exact march
    #: (``voxel_fragment.frag:86-103``); ``1.2–1.9`` cuts step counts
    #: 20–40% on grazing rays at sub-epsilon image change.  Opt-in
    #: acceleration — parity tests require 1.0.
    relaxation: float = 1.0


@dataclasses.dataclass(frozen=True)
class ShadowConfig:
    """Quilez improved soft-shadow march (``voxel_fragment.frag:105-132``).

    ``k`` is the penumbra sharpness (reference passes 10.0 at ``:205``); the
    shadow ray starts at ``hit + 2·epsilon·normal`` (``:205``).
    """

    enabled: bool = True
    k: float = 10.0
    max_steps: int = 100
    #: Gradient treatment of the shadow march under reverse AD:
    #: - ``"detach"`` — stop_gradient the shadow factor.  Forward output is
    #:   unchanged; gradients through geometry/lighting still flow via the
    #:   diffuse/specular terms, only penumbra-shape gradients are dropped.
    #:   Works with the early-exit while_loop and costs no residual memory.
    #: - ``"ad"`` — differentiate through the march (requires
    #:   ``march.early_exit=False``; O(steps) residual memory under AD).
    grad: str = "detach"


@dataclasses.dataclass(frozen=True)
class AOConfig:
    """SDF ambient occlusion (north-star capability; no reference counterpart).

    Classic 5-tap occlusion: samples along the normal at ``i·step`` compare
    expected vs actual SDF, attenuated by ``falloff**i``; scales the ambient
    term by ``1 - strength·occlusion`` clamped to [0, 1].
    """

    enabled: bool = False
    samples: int = 5
    step: float = 0.05
    falloff: float = 0.7
    strength: float = 3.0


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Full pipeline configuration (static under jit).

    ``ray_mode``:
      - ``"reference"`` — replicate the reference's ray z-term
        ``-2/tan(fov·π/360)`` (``voxel_fragment.frag:191``); the extra factor
        of 2 makes the *effective* vertical FOV ≈ 32.3°, not the nominal 60°.
        Required for pixel parity.
      - ``"pinhole"`` — standard ``-1/tan(fov/2)`` pinhole ray.

    ``normals``: ``"central"`` (6-tap, reference ``voxel_fragment.frag:134-155``),
    ``"tetrahedron"`` (4-tap), or ``"autodiff"`` (exact ``jax.grad`` of the SDF).

    ``background``: ``None`` reproduces the reference quirk of shading rays
    that exceeded ``max_distance`` at their far point
    (``voxel_fragment.frag`` has no miss branch); an RGB tuple composites
    misses over that color instead.
    """

    width: int = 800
    height: int = 600
    #: NDC mapping overrides for sharded row-slab rendering: a device kernel
    #: emits ``height`` rows but maps pixel indices through the *full* image
    #: extent (``ndc_height``/``ndc_width``), offset by the row0 uniform.
    #: ``None`` (the default) means NDC extent == output extent.
    ndc_height: int | None = None
    ndc_width: int | None = None
    march: MarchConfig = MarchConfig()
    shadow: ShadowConfig = ShadowConfig()
    ao: AOConfig = AOConfig()
    normals: str = "central"
    ray_mode: str = "reference"
    shading: str = "blinn_phong"  # or "lambert"
    background: tuple | None = None

    @property
    def aspect_ratio(self) -> float:
        """Framebuffer aspect ratio ``AR = W/H`` (``voxel_geometry.geom:8``)."""
        return self.width / self.height


#: Config that exactly reproduces the reference app's fixed choices
#: (800×600 window, 100-step marches, ε=0.01, k=10 shadows, central normals).
REFERENCE_CONFIG = RenderConfig()


def fast_config(base: RenderConfig = REFERENCE_CONFIG) -> RenderConfig:
    """The declared non-parity **fast profile**: same scene semantics, fewer
    ops per ray.  Its contents are *measurement-driven* (the A/B sweep lives
    in ``benchmarks/fast_profile.py``; numbers in docs/performance.md):

    - tetrahedron normals — 4 SDF taps instead of 6 (the only per-ray
      op-count trim that measurably wins on this hardware);
    - shadow march capped at 32 steps — near-neutral in time (whole-tile
      early exit already terminates most shadow marches) but it caps the
      worst-case tile, and costs <0.01 dB over capping at 100.

    Keinert over-relaxation (``march.relaxation``) was measured and
    REJECTED for this profile: at 1080p on the reference scene ω=1.6 is
    ~19% *slower* than the parity march (2.32 vs 1.95 ms single-point) —
    whole-tile exit is gated by the slowest lane, and the overlap-check
    fallback adds ~40% bookkeeping per step — while costing 14 dB of image
    PSNR.  Re-tested on the eval-dominated Mandelbulb (~300 ops/eval):
    still ~flat (best ω=1.2 wins 1.4%) — tile gating, not bookkeeping, is
    the binding constraint in both regimes.  The knob stays opt-in.

    Image delta vs the parity profile is quantified in
    docs/performance.md (PSNR table, measured per scene); parity tests and
    the oracle contract keep using ``REFERENCE_CONFIG``.
    """
    return dataclasses.replace(
        base,
        normals="tetrahedron",
        shadow=dataclasses.replace(base.shadow, max_steps=32),
    )
