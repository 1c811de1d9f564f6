"""Core math + RNG tests against the scalar GLSL oracle (tests/glsl_ref.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer0_tpu.core import math as vm
from pathtracer0_tpu.core import rng as vrng

from . import glsl_ref


class TestRotation:
    def test_rotate_matches_glsl(self):
        rng = np.random.RandomState(0)
        for _ in range(20):
            p = rng.randn(3)
            rot = rng.randn(3)
            ours = np.asarray(vm.rotate(jnp.asarray(p, jnp.float32),
                                        jnp.asarray(rot, jnp.float32)))
            ref = glsl_ref.rotate(p, rot)
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_rotate_matches_java(self):
        rng = np.random.RandomState(1)
        for _ in range(20):
            p = rng.randn(3)
            rot = rng.randn(3)
            ours = np.asarray(vm.rotate(jnp.asarray(p, jnp.float32),
                                        jnp.asarray(rot, jnp.float32)))
            ref = glsl_ref.java_vec_rotate(p, rot)
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_rotate_back_is_inverse(self):
        rng = np.random.RandomState(2)
        p = jnp.asarray(rng.randn(8, 3), jnp.float32)
        rot = jnp.asarray(rng.randn(8, 3), jnp.float32)
        back = vm.rotate_back(vm.rotate(p, rot), rot)
        np.testing.assert_allclose(np.asarray(back), np.asarray(p),
                                   rtol=1e-4, atol=1e-5)

    def test_reflect_refract(self):
        d = vm.normalize(jnp.array([1.0, -1.0, 0.2]))
        n = jnp.array([0.0, 1.0, 0.0])
        r = np.asarray(vm.reflect(d, n))
        np.testing.assert_allclose(r, glsl_ref.reflect(np.asarray(d), (0, 1, 0)),
                                   rtol=1e-5, atol=1e-6)
        eta = jnp.float32(1.0 / 1.5)
        t = np.asarray(vm.refract(d, n, eta))
        np.testing.assert_allclose(
            t, glsl_ref.refract(np.asarray(d), (0, 1, 0), 1.0 / 1.5),
            rtol=1e-4, atol=1e-5,
        )
        # total internal reflection -> zero vector (GLSL refract contract)
        d2 = vm.normalize(jnp.array([1.0, -0.05, 0.0]))
        t2 = np.asarray(vm.refract(d2, n, jnp.float32(1.5)))
        np.testing.assert_array_equal(t2, np.zeros(3))


class TestRNG:
    def test_stream_matches_glsl(self, rng_batch):
        state = jnp.asarray(rng_batch[:16])
        ours = []
        s = state
        for _ in range(8):
            u, s = vrng.uniform(s)
            ours.append(np.asarray(u))
        for lane in range(16):
            st = int(rng_batch[lane])
            for k in range(8):
                u, st = glsl_ref.random(st)
                assert abs(ours[k][lane] - u) < 2e-7, (lane, k)

    def test_advance_closed_form(self, rng_batch):
        state = jnp.asarray(rng_batch[:64])
        step = state
        for n in range(5):
            np.testing.assert_array_equal(
                np.asarray(vrng.advance(state, n)), np.asarray(step)
            ) if n == 0 else None
            if n:
                np.testing.assert_array_equal(
                    np.asarray(vrng.advance(state, n)), np.asarray(step)
                )
            step = vrng.advance(step, 1)

    def test_advance_select(self, rng_batch):
        state = jnp.asarray(rng_batch[:32])
        counts = jnp.asarray(np.arange(32) % 9)
        out = np.asarray(vrng.advance_select(state, counts, 8))
        for i in range(32):
            expect = np.asarray(vrng.advance(state[i:i + 1], int(counts[i])))
            assert out[i] == expect[0]

    def test_peek_equals_draw(self, rng_batch):
        state = jnp.asarray(rng_batch[:128])
        s = state
        for off in range(1, 9):
            u, s = vrng.uniform(s)
            peek = vrng.peek_uniform(state, off)
            np.testing.assert_array_equal(np.asarray(u), np.asarray(peek))

    def test_normal_matches_glsl(self, rng_batch):
        state = jnp.asarray(rng_batch[:8])
        x, _ = vrng.normal(state)
        for lane in range(8):
            ref, _ = glsl_ref.rand_normal(int(rng_batch[lane]))
            assert abs(float(x[lane]) - ref) < 1e-3 * max(1.0, abs(ref))

    def test_lambertian_peek(self, rng_batch):
        state = jnp.asarray(rng_batch[:64])
        vec, s_after = vrng.lambertian_vec(state)
        peek = vrng.peek_lambertian_vec(state, 0)
        np.testing.assert_allclose(np.asarray(vec), np.asarray(peek),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(s_after), np.asarray(vrng.advance(state, 6))
        )

    def test_uniform_statistics(self):
        state = jnp.arange(100000, dtype=jnp.uint32)
        u, _ = vrng.uniform(state)
        u = np.asarray(u)
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(u.var() - 1.0 / 12.0) < 0.01
        assert u.min() >= 0.0 and u.max() <= 1.0

    def test_normal_statistics(self):
        state = jnp.arange(100000, dtype=jnp.uint32) * jnp.uint32(2654435761)
        x, _ = vrng.normal(state)
        x = np.asarray(x)
        x = x[np.isfinite(x)]
        assert abs(x.mean()) < 0.02
        assert abs(x.std() - 1.0) < 0.02


class TestCamera:
    def test_primary_direction_matches_glsl_formula(self):
        from pathtracer0_tpu.core import camera

        uv = jnp.array([[0.25, 0.75]], jnp.float32)
        rot = jnp.array([0.3, -0.9, 0.0], jnp.float32)
        d = np.asarray(camera.primary_directions(uv, rot, 1.5, 1.0, 0.5625))[0]
        expect = glsl_ref.rotate(
            np.array([
                (0.25 * 2 - 1) * -1 * 1.5,
                (0.75 * 2 - 1) * 0.5625 * 1.5,
                1.0,
            ]),
            np.asarray(rot),
        )
        np.testing.assert_allclose(d, expect, rtol=1e-4, atol=1e-5)
