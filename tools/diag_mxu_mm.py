"""Probe: cost of small-K matmul forms inside a Pallas TPU kernel.

Isolates why the MXU group test's dot_general costs ~7.5 us (diag_mxu):
transposed-lhs contraction vs pre-transposed operand, dynamic coef slice
vs fixed, f32 default vs HIGHEST vs bf16 inputs, and K=16 vs K=128.

Run: python tools/diag_mxu_mm.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, o_ref, *, reps, form, precision):
    o_ref[...] = jnp.zeros_like(o_ref)

    def body(i, _):
        if form == "tlhs_dyn":          # (16,320) slice, contract dim0
            a = a_ref[pl.ds((i % 8) * 16, 16), :]
            out = jax.lax.dot_general(
                a, b_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        elif form == "tlhs_fix":        # fixed (16,320), contract dim0
            a = a_ref[0:16, :]
            out = jax.lax.dot_general(
                a, b_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        elif form == "std_dyn":         # (320,16) slice, standard dot
            a = a_ref[pl.ds((i % 8) * 320, 320), :]
            out = jax.lax.dot_general(
                a, b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        elif form == "std_fix":
            a = a_ref[0:320, :]
            out = jax.lax.dot_general(
                a, b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        o_ref[...] = o_ref[...] + out[0:8, :]
        return 0

    jax.lax.fori_loop(0, reps, body, 0)


@functools.partial(jax.jit, static_argnames=("reps", "form", "prec"))
def run(a, b, *, reps, form, prec):
    return pl.pallas_call(
        functools.partial(_kernel, reps=reps, form=form, precision=prec),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=jax.ShapeDtypeStruct((8, b.shape[1]), jnp.float32),
    )(a, b)


def main():
    reps = 512
    rng = np.random.RandomState(0)
    N = 1024
    b16 = rng.randn(16, N).astype(np.float32)
    a_t = rng.randn(8 * 16, 320).astype(np.float32)     # (16,320) x 8 groups
    a_s = rng.randn(8 * 320, 16).astype(np.float32)     # (320,16) x 8 groups

    cases = []
    for prec in (None, jax.lax.Precision.HIGHEST):
        cases += [
            ("tlhs_dyn", a_t, b16, prec),
            ("tlhs_fix", a_t, b16, prec),
            ("std_dyn", a_s, b16, prec),
            ("std_fix", a_s, b16, prec),
        ]
    # bf16 inputs (1-pass MXU)
    cases += [("std_fix", a_s.astype(jnp.bfloat16),
               b16.astype(jnp.bfloat16), None),
              ("tlhs_fix", a_t.astype(jnp.bfloat16),
               b16.astype(jnp.bfloat16), None)]

    salt = [0.0]

    def timed(a, b, reps, form, prec):
        """Min wall time of one dispatch+fetch at the given rep count.

        Every call gets a FRESH rhs (the axon tunnel caches
        (program, args) -> result pairs across calls — identical args
        return without executing; PERF.md measurement pitfalls)."""
        aj = jnp.asarray(a)
        out = run(aj, jnp.asarray(b) + np.float32(salt[0]),
                  reps=reps, form=form, prec=prec)
        _ = float(jnp.sum(out))
        ts = []
        for _i in range(4):
            salt[0] += 1e-5
            bj = jnp.asarray(b) + np.float32(salt[0])
            _ = float(bj[0, 0])   # force materialization off the clock
            t0 = time.perf_counter()
            out = run(aj, bj, reps=reps, form=form, prec=prec)
            _ = float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for form, a, b, prec in cases:
        # difference method: the ~39 ms tunnel fetch dominates single
        # dispatches, so charge only the marginal cost of extra reps
        d1 = timed(a, b, reps, form, prec)
        d4 = timed(a, b, reps * 4, form, prec)
        us = (d4 - d1) / (3 * reps) * 1e6
        dtype = a.dtype if hasattr(a, "dtype") else "f32"
        print(f"{form:10s} prec={str(prec):28s} dtype={str(dtype):10s} "
              f"us/matmul={us:8.3f}")


if __name__ == "__main__":
    main()
