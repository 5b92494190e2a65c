"""Benchmark harness: rays/s for forward and forward+backward renders.

The reference publishes no numbers (BASELINE.md); the targets are the north
star's: ≥1e9 rays/s per chip at 1080p sphere-trace fwd+bwd.  ``vs_baseline``
reports the measured value against that 1e9 target.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp


def robust_min_seconds(
    fn,
    *args,
    iters: int = 10,
    min_windows: int = 8,
    max_windows: int = 30,
    agree_tol: float = 0.05,
    min_span_s: float = 4.0,
) -> float:
    """Tenancy-robust amortized seconds/call: the min over many windows.

    The shared/tunnelled chip shows transient 2x slow *periods* lasting
    seconds, so a handful of back-to-back windows can all land in one slow
    period and halve the recorded number (round-1 driver capture: 8.27 ms
    where the kernel measures 4.4 ms).  Defense: sample ``min_windows``
    amortized windows spread over at least ``min_span_s`` of wall time, then
    keep sampling (up to ``max_windows``) until the two best windows agree
    within ``agree_tol`` — a minimum corroborated by a second independent
    window is a sustained-throughput measurement, not a fluke.
    """
    from sdf3d_tpu.utils.profiling import benchmark_fn

    times: list[float] = []
    t0 = time.perf_counter()
    # First window carries the jit/compile warmup.
    times.append(benchmark_fn(fn, *args, warmup=2, iters=iters))
    while True:
        enough = (
            len(times) >= min_windows
            and (time.perf_counter() - t0) >= min_span_s
        )
        if enough:
            best = sorted(times)
            if best[1] <= best[0] * (1.0 + agree_tol):
                break
        if len(times) >= max_windows:
            break
        times.append(benchmark_fn(fn, *args, warmup=0, iters=iters))
        # Spread windows out a little so consecutive windows are not all
        # inside the same slow period.
        time.sleep(0.05)
    return min(times)


def robust_slope_seconds_per_frame(
    make_fn,
    args,
    k_small: int,
    k_large: int,
    iters: int = 4,
    min_rounds: int = 8,
    max_rounds: int = 30,
    agree_tol: float = 0.05,
) -> float:
    """Per-frame seconds by two-point differencing: time a ``k_small``-frame
    and a ``k_large``-frame pipelined dispatch and divide the *difference* by
    the extra frames.

    A timed window unavoidably includes constant overhead — the forced host
    sync (~10s of ms through the relay) and the dispatch floor — which a
    single-point window attributes to the frames: measured here, a K=16
    window read 2.76 ms/frame where the true steady state is ~1.9 (the
    constant was ~33 ms).  Production fits scan hundreds of steps per
    dispatch, so the constant amortizes to zero there and the slope is the
    honest sustained number.  Both K's are sampled *interleaved* per round
    (a tenancy slow-window hits both or neither) with the same min-corrobor-
    ation rule as :func:`robust_min_seconds` applied to the slope.
    """
    from sdf3d_tpu.utils.profiling import benchmark_fn

    fn_s, fn_l = make_fn(k_small), make_fn(k_large)
    slopes: list[float] = []
    t_s = benchmark_fn(fn_s, *args, warmup=2, iters=iters)
    t_l = benchmark_fn(fn_l, *args, warmup=2, iters=iters)
    slopes.append((t_l - t_s) / (k_large - k_small))
    while True:
        if len(slopes) >= min_rounds:
            best = sorted(s for s in slopes if s > 0)
            if len(best) >= 2 and best[1] <= best[0] * (1.0 + agree_tol):
                break
        if len(slopes) >= max_rounds:
            break
        t_s = benchmark_fn(fn_s, *args, warmup=0, iters=iters)
        t_l = benchmark_fn(fn_l, *args, warmup=0, iters=iters)
        slopes.append((t_l - t_s) / (k_large - k_small))
        time.sleep(0.05)
    positive = sorted(s for s in slopes if s > 0)
    if not positive:  # pathological (all-noise) — conservative fallback
        return t_l / k_large
    if len(positive) == 1:
        return positive[0]
    # The raw min is biased low: a round pairing a tenancy-slowed k_small
    # window with a fast k_large window yields an underestimated slope, and
    # min() selects exactly those rounds.  The *second-best* slope is the
    # corroborated value the loop's agreement rule waited for — report that.
    return positive[1]


def _multiview_extra() -> dict:
    """V=4 multiview fused fit step at 720p (one view-axis-grid launch)."""
    import sdf3d_tpu as s
    from sdf3d_tpu.ops import default_pallas_config
    from sdf3d_tpu.ops.fit_kernel import multiview_loss_and_grads

    W, H, V = 1280, 720, 4
    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=W, height=H)
    scene = s.reference_scene()
    pc = default_pallas_config(scene)
    light, mat = s.reference_light(), s.reference_material()
    cams = [s.Camera.orbit(azimuth_deg=(137.508 * i) % 360.0) for i in range(V)]
    targets = [jnp.zeros((H, W, 3), jnp.float32)] * V

    def make_fn(k):
        @jax.jit
        def fn(sc):
            def body(sc_, _):
                # Return the loss as the scanned output: a constant output
                # would make the whole carry chain dead code XLA eliminates
                # (observed: 4.5e-5 s/"step" of nothing).
                loss, (g, _, _, _) = multiview_loss_and_grads(
                    cfg, pc, sc_, cams, light, mat, targets, wrt_uniforms=False
                )
                sc_ = jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, sc_, g)
                return sc_, loss

            _, vals = jax.lax.scan(body, sc, None, length=k)
            return vals

        return fn

    sec = robust_slope_seconds_per_frame(
        make_fn, (scene,), k_small=4, k_large=16, iters=2,
        min_rounds=4, max_rounds=12,
    )
    return {"rays_per_second": W * H * V / sec, "seconds_per_step": sec,
            "views": V, "resolution": f"{W}x{H}"}


def run_extras(budget_s: float = 900.0, on_update=None) -> dict:
    """Secondary tracking metrics beyond the driver headline (round-5
    VERDICT item 7): 4K forward + fit, the V=4 multiview fit step, the fast
    profile, and the eval-dominated fractal fit — the numbers that
    previously lived only in docs prose, captured machine-readable every
    round so regressions in non-flagship paths become visible.

    Runs with a reduced measurement protocol (fewer slope rounds than the
    headline); each entry either carries rays/s + seconds or an error
    string.  Never raises — and ``on_update(partial_dict)`` fires after
    every entry so callers can stream partial results (the driver child
    prints each partial; a hard kill mid-entry then loses only that entry,
    not the completed ones).
    """
    out: dict = {}
    deadline = time.monotonic() + budget_s

    def _run(name, fn):
        if time.monotonic() > deadline - 60:
            out[name] = "skipped: extras budget exhausted"
        else:
            try:
                out[name] = fn()
            except Exception as e:  # noqa: BLE001 - diagnostic capture
                out[name] = f"error: {type(e).__name__}: {e}"
        if on_update is not None:
            on_update(dict(out))

    def _via(mode, **kw):
        r = run_benchmark(engine="pallas", mode=mode, iters=4,
                          frames_per_dispatch=8, **kw)
        return {"rays_per_second": r["value"],
                "seconds_per_frame": r["seconds_per_frame"]}

    _run("fwd_4k", lambda: _via("fwd", width=3840, height=2160))
    _run("fit_4k", lambda: _via("fwd_bwd", width=3840, height=2160))
    _run("fit_fast_1080p", lambda: _via("fwd_bwd", profile="fast"))
    _run("fit_fractal_1080p", lambda: _via("fwd_bwd", scene_name="fractal"))
    _run("fit_multiview_720p_v4", _multiview_extra)
    return out


def run_benchmark(
    width: int = 1920,
    height: int = 1080,
    engine: str = "pallas",
    interpret: bool = False,
    scene_name: str = "reference",
    mode: str = "fwd_bwd",
    iters: int = 10,
    frames_per_dispatch: int = 16,
    profile: str = "parity",
    pc_overrides: dict | None = None,
) -> dict:
    """Time the renderer; returns the one-line JSON payload (BASELINE metric:
    rays/s at 1080p sphere-trace fwd+bwd, target 1e9/chip).

    Frames are pipelined ``frames_per_dispatch`` per jit call, in the shape
    the production paths actually execute:

    - ``fwd_bwd``: a K-step gradient-descent fit chunk — ``lax.scan`` where
      each step renders, takes scene-parameter grads of a pixel loss, and
      updates the params.  This is byte-for-byte the ``fit.py`` hot loop
      (``run_chunk``); the data dependence between steps also makes the
      measurement un-hoistable (XLA cannot CSE the frames away).
    - ``fwd``: a turntable batch — ``lax.map`` over per-frame cameras, the
      ``render_batch`` animation/serving path.  Each frame reduces to a
      per-frame checksum so the measurement is compute-, not copy-, bound.
      Camera ``i`` is the same pose at every K (golden-angle azimuths,
      K-independent), so the K-frame set is exactly a prefix of the 4K set
      and the two slope windows time the same per-frame workload.

    Why pipelined: on the tunnelled TPU each host dispatch has a ~1.3 ms
    floor (measured on an *empty* jit) even when enqueued back-to-back, so
    single-frame timing measures the relay, not the chip.  No production
    workload of this framework renders one frame per round trip — fits scan
    (fit.py), animation batches (render_batch) — and the driver metric
    should track the chip.  ``frames_per_dispatch=1`` restores the old
    per-dispatch latency measurement.
    """
    import sdf3d_tpu as s

    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=width, height=height)
    if profile == "fast":
        # The declared non-parity fast profile (config.fast_config):
        # tetrahedron normals + 32-step shadows.  The driver metric stays
        # on "parity"; this knob powers benchmarks/fast_profile.
        cfg = s.fast_config(cfg)
    elif profile != "parity":
        raise ValueError(f"profile must be 'parity' or 'fast', not {profile!r}")
    cam, light, mat = s.Camera.reference(), s.reference_light(), s.reference_material()
    scene = {"reference": s.reference_scene, "flagship": s.flagship_scene,
             "sphere": s.sphere_scene, "fractal": s.fractal_scene}[scene_name]()
    K = max(1, frames_per_dispatch)

    if engine == "pallas":
        from sdf3d_tpu.ops import default_pallas_config, render_pallas

        # pc_overrides: kernel-knob experiments (e.g. the fast profile's
        # stop_every thinning) without a config-surface change.
        pc = default_pallas_config(scene, interpret=interpret,
                                   **(pc_overrides or {}))

        def render_one(sc, camera):
            return render_pallas(cfg, pc, sc, camera, light, mat)
    else:
        def render_one(sc, camera):
            return s.render_diff(sc, camera, light, mat, cfg)

    if mode == "fwd":
        # Turntable: K distinct camera poses per dispatch (render_batch shape).
        if engine == "pallas":
            from sdf3d_tpu.ops.render_kernel import render_kernel_forward

            def one(c):
                return render_kernel_forward(scene, c, light, mat, cfg, pc)[0].mean()
        else:
            def one(c):
                return s.render(scene, c, light, mat, cfg).mean()

        def make_fn(k):
            # Golden-angle azimuths: camera i is identical for every k, so a
            # K-frame window is a strict prefix of the 4K-frame window and the
            # two-point slope subtracts like from like.
            cams = [s.Camera.orbit(azimuth_deg=(137.508 * i) % 360.0) for i in range(k)]
            cameras = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
            return jax.jit(lambda _sc: jax.lax.map(one, cameras))

        args = (scene,)
    else:
        # K-step fit chunk: the fit.py run_chunk hot loop (lax.scan with a
        # parameter update per step — serial data dependence between frames).
        target = jnp.zeros((height, width, 3), jnp.float32)

        if engine == "pallas":
            # fit.py's engine='pallas' L2 path: the fused single-launch
            # loss+grad kernel (ops/fit_kernel.py) — no XLA loss/cotangent
            # pass; uniform grads skipped (fit consumes scene grads only).
            from sdf3d_tpu.ops.fit_kernel import l2_loss_and_grads

            def value_and_grad_loss(sc):
                loss_val, grads = l2_loss_and_grads(
                    cfg, pc, sc, cam, light, mat, target, wrt_uniforms=False
                )
                return loss_val, grads[0]
        else:
            def loss(sc):
                img = render_one(sc, cam)
                return jnp.sum((img - target) ** 2)

            value_and_grad_loss = jax.value_and_grad(loss)

        # The per-step update keeps frames serially dependent (no hoisting)
        # but its scale must be negligible: a real step size deforms the
        # scene away from the reference workload — march step counts change
        # and the metric stops measuring the benchmark scene (observed:
        # lr=1e-7 inflated the forward kernel 1.8 -> 3.1 ms/frame).
        def make_fn(k):
            @jax.jit
            def fn(sc):
                def body(sc_, _):
                    val, g = value_and_grad_loss(sc_)
                    sc_ = jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, sc_, g)
                    return sc_, val

                _, vals = jax.lax.scan(body, sc, None, length=k)
                return vals

            return fn

        args = (scene,)

    if K >= 4:
        # Two-point slope: subtracts the constant window overhead (forced
        # sync + dispatch floor) exactly — see robust_slope_seconds_per_frame.
        seconds = robust_slope_seconds_per_frame(
            make_fn, args, k_small=K, k_large=4 * K, iters=max(1, iters // 2)
        )
    else:
        # Cheap path (CPU fallback): single-point amortized windows.
        seconds = robust_min_seconds(make_fn(K), *args, iters=max(1, iters // 4)) / K
    rays_s = width * height / seconds
    # Report the device compute actually ran on (jax_default_device may
    # redirect away from default_backend()).
    device = next(iter(jnp.zeros(1).devices()))
    return {
        "metric": f"rays_per_second_{height}p_{mode}_{engine}",
        "value": rays_s,
        "unit": "rays/s",
        "vs_baseline": rays_s / 1e9,
        "seconds_per_frame": seconds,
        "backend": device.platform,
    }
