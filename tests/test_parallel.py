"""Sharded rendering on the 8-virtual-CPU mesh (SURVEY.md §4: distributed
logic without a cluster): sharded == unsharded, psum'd grads == full grads."""

import dataclasses

import jax
import jax.flatten_util as fu
import jax.numpy as jnp
import numpy as np
import pytest

import sdf3d_tpu as s
from sdf3d_tpu.camera import camera_rays
from sdf3d_tpu.diff import render_rays_diff
from sdf3d_tpu.ops import PallasRenderConfig
from sdf3d_tpu.parallel import (
    loss_and_grad_sharded,
    make_mesh,
    render_pallas_sharded,
    render_sharded,
)

CFG = dataclasses.replace(s.REFERENCE_CONFIG, width=128, height=96)
CAM, LIGHT, MAT = s.Camera.reference(), s.reference_light(), s.reference_material()


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(jax.devices("cpu"), n_devices=8)


class TestShardedRender:
    def test_xla_sharded_equals_unsharded_bitwise(self, mesh8):
        a = np.asarray(s.render(s.reference_scene(), CAM, LIGHT, MAT, CFG))
        b = np.asarray(render_sharded(s.reference_scene(), CAM, LIGHT, MAT, CFG, mesh8))
        np.testing.assert_array_equal(a, b)

    def test_pallas_sharded_matches_xla(self, mesh8):
        pc = PallasRenderConfig(tile_h=8, tile_w=128, interpret=True)
        a = np.asarray(s.render(s.reference_scene(), CAM, LIGHT, MAT, CFG))
        b = np.asarray(
            render_pallas_sharded(s.reference_scene(), CAM, LIGHT, MAT, CFG, mesh8, pc)
        )
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_pallas_interleaved_matches_contiguous(self, mesh8):
        """Interleaved row-block sharding is a pure layout change: the
        un-permuted image must equal the contiguous-slab one bitwise."""
        pc = PallasRenderConfig(tile_h=8, tile_w=128, interpret=True)
        cfg = dataclasses.replace(CFG, height=128)  # 128 % (8 devs * 8 rows) == 0
        a = np.asarray(
            render_pallas_sharded(s.flagship_scene(), CAM, LIGHT, MAT, cfg, mesh8, pc)
        )
        b = np.asarray(
            render_pallas_sharded(
                s.flagship_scene(), CAM, LIGHT, MAT, cfg, mesh8, pc, interleaved=True
            )
        )
        np.testing.assert_array_equal(a, b)

    def test_pallas_interleaved_indivisible_raises(self, mesh8):
        pc = PallasRenderConfig(tile_h=8, tile_w=128, interpret=True)
        cfg = dataclasses.replace(CFG, height=96)  # 96 % 64 != 0
        with pytest.raises(ValueError, match="interleaved"):
            render_pallas_sharded(
                s.reference_scene(), CAM, LIGHT, MAT, cfg, mesh8, pc, interleaved=True
            )

    def test_mesh_size_sweep(self):
        """Sharded output is invariant to the mesh size (1, 2, 4 devices)."""
        base = np.asarray(s.render(s.flagship_scene(), CAM, LIGHT, MAT, CFG))
        for n in (1, 2, 4):
            mesh = make_mesh(jax.devices("cpu"), n_devices=n)
            out = np.asarray(render_sharded(s.flagship_scene(), CAM, LIGHT, MAT, CFG, mesh))
            np.testing.assert_array_equal(base, out)

    def test_indivisible_height_raises(self, mesh8):
        cfg = dataclasses.replace(CFG, height=100)  # 100 % 8 != 0
        with pytest.raises(ValueError, match="not divisible"):
            render_sharded(s.reference_scene(), CAM, LIGHT, MAT, cfg, mesh8)


class TestShardedGradients:
    def test_psum_grads_match_unsharded(self, mesh8):
        o, d = camera_rays(CAM, CFG.width, CFG.height)
        target = s.render(s.reference_scene(), CAM, LIGHT, MAT, CFG)
        scene = s.sdf.union(
            s.sdf.ground_plane(), s.sdf.sphere(center=(0.0, 0.4, 0.0), radius=0.25)
        )

        def loss_fn(scene_, o_, d_, tgt_):
            img = render_rays_diff(scene_, o_, d_, LIGHT, MAT, CFG)
            return jnp.sum((img - tgt_) ** 2)

        l_sh, g_sh = loss_and_grad_sharded(loss_fn, mesh8)(scene, o, d, target)
        l_un, g_un = jax.value_and_grad(lambda sc: loss_fn(sc, o, d, target))(scene)
        assert float(l_sh) == pytest.approx(float(l_un), rel=1e-5)
        gs, _ = fu.ravel_pytree(g_sh)
        gu, _ = fu.ravel_pytree(g_un)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gu), rtol=1e-4, atol=1e-4)


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_signature(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        assert callable(fn) and len(args) == 4


class TestPallasCollectives:
    """Ring all-reduce kernel (interpret mode on the CPU mesh)."""

    def test_ring_allreduce_matches_sum(self, mesh8):
        import functools

        from jax.sharding import PartitionSpec as PS

        from sdf3d_tpu.parallel import pallas_psum
        from sdf3d_tpu.parallel.mesh import tile_axis

        x = jnp.arange(8 * 37, dtype=jnp.float32).reshape(8, 37)

        @functools.partial(
            jax.shard_map, mesh=mesh8, in_specs=PS(tile_axis, None),
            out_specs=PS(tile_axis, None), check_vma=False,
        )
        def f(local):
            return pallas_psum(local[0], 8, interpret=True)[None]

        out = f(x)
        np.testing.assert_allclose(
            np.asarray(out), np.broadcast_to(np.asarray(jnp.sum(x, 0)), (8, 37)), rtol=1e-6
        )

    def test_ring_allreduce_large_payload(self, mesh8):
        """Payload spanning both overlap streams (multiple sublane rows and
        a ragged tail) reduces exactly."""
        import functools

        from jax.sharding import PartitionSpec as PS

        from sdf3d_tpu.parallel import pallas_psum
        from sdf3d_tpu.parallel.mesh import tile_axis

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((8, 3 * 1024 + 13)), jnp.float32)

        @functools.partial(
            jax.shard_map, mesh=mesh8, in_specs=PS(tile_axis, None),
            out_specs=PS(tile_axis, None), check_vma=False,
        )
        def f(local):
            return pallas_psum(local[0], 8, interpret=True)[None]

        out = np.asarray(f(x))
        want = np.broadcast_to(np.asarray(jnp.sum(x, 0)), out.shape)
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)

    def test_loss_and_grad_with_ring_allreduce(self, mesh8):
        o, d = camera_rays(CAM, CFG.width, CFG.height)
        target = s.render(s.reference_scene(), CAM, LIGHT, MAT, CFG)
        scene = s.sdf.union(
            s.sdf.ground_plane(), s.sdf.sphere(center=(0.0, 0.4, 0.0), radius=0.25)
        )

        def loss_fn(scene_, o_, d_, tgt_):
            img = render_rays_diff(scene_, o_, d_, LIGHT, MAT, CFG)
            return jnp.sum((img - tgt_) ** 2)

        l_psum, g_psum = loss_and_grad_sharded(loss_fn, mesh8)(scene, o, d, target)
        l_ring, g_ring = loss_and_grad_sharded(loss_fn, mesh8, allreduce="pallas_ring_interpret")(
            scene, o, d, target
        )
        assert float(l_ring) == pytest.approx(float(l_psum), rel=1e-6)
        gp, _ = fu.ravel_pytree(g_psum)
        gr, _ = fu.ravel_pytree(g_ring)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gp), rtol=1e-5, atol=1e-5)
