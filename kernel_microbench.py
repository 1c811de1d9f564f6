"""Microbench: per-iteration cost of the packet-traversal loop shapes.

Measures a synthetic while_loop kernel that mimics the real traversal
body at (ROWS, 128) block width, in several variants, to locate the
overhead: vector slab tests, any/min reductions, lax.cond, scalar-only.
"""
import functools, time, sys
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 256
LANES = 128
MISS = np.float32(1e30)


def make_kernel(n_iter, variant):
    def kernel(nodes_ref, o_ref, d_ref, t_ref, stack_ref):
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
        inv_dx = 1.0 / d_ref[0]
        inv_dy = 1.0 / d_ref[1]
        inv_dz = 1.0 / d_ref[2]
        t_ref[...] = jnp.full_like(t_ref, MISS)
        stack_ref[0] = 0

        def entry(node):
            tx1 = (nodes_ref[node, 0] - ox) * inv_dx
            tx2 = (nodes_ref[node, 3] - ox) * inv_dx
            ty1 = (nodes_ref[node, 1] - oy) * inv_dy
            ty2 = (nodes_ref[node, 4] - oy) * inv_dy
            tz1 = (nodes_ref[node, 2] - oz) * inv_dz
            tz2 = (nodes_ref[node, 5] - oz) * inv_dz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                         jnp.minimum(ty1, ty2)),
                             jnp.minimum(tz1, tz2))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                         jnp.maximum(ty1, ty2)),
                             jnp.maximum(tz1, tz2))
            hit = (tf >= tn) & (tf > 0.0)
            return jnp.where(hit, jnp.maximum(tn, 0.0), MISS)

        def cond(c):
            i, sp = c
            return i < n_iter

        def body(c):
            i, sp = c
            node = stack_ref[jnp.minimum(sp, 63)]
            if variant == "full":  # 2 slabs + 2 any + 2 min + pushes
                el = entry(node)
                er = entry(node + 1)
                wl = el < t_ref[...]
                wr = er < t_ref[...]
                hl = jnp.any(wl)
                hr = jnp.any(wr)
                ml = jnp.min(jnp.where(wl, el, MISS))
                mr = jnp.min(jnp.where(wr, er, MISS))
                far_first = ml > mr
                stack_ref[jnp.minimum(sp, 63)] = jnp.where(far_first, node, node + 1)
                sp = sp + hl.astype(jnp.int32) + hr.astype(jnp.int32) - 1
                sp = jnp.maximum(sp, 0)
            elif variant == "no_minorder":  # 2 slabs + 2 any
                el = entry(node)
                er = entry(node + 1)
                hl = jnp.any(el < t_ref[...])
                hr = jnp.any(er < t_ref[...])
                stack_ref[jnp.minimum(sp, 63)] = node
                sp = sp + hl.astype(jnp.int32) + hr.astype(jnp.int32) - 1
                sp = jnp.maximum(sp, 0)
            elif variant == "no_reduce":  # 2 slabs, no reductions
                el = entry(node)
                er = entry(node + 1)
                t_ref[...] = jnp.minimum(t_ref[...], jnp.minimum(el, er) + MISS)
                stack_ref[jnp.minimum(sp, 63)] = node
                sp = sp
            elif variant == "scalar_only":  # scalar AABB test only
                v = (nodes_ref[node, 0] + nodes_ref[node, 3]
                     + nodes_ref[node, 1] + nodes_ref[node, 4])
                stack_ref[jnp.minimum(sp, 63)] = node + (v > 0.).astype(jnp.int32)
                sp = sp
            elif variant == "cond_mix":  # lax.cond between two bodies
                def leaf(sp):
                    el = entry(node)
                    t_ref[...] = jnp.minimum(t_ref[...], el + 1.0)
                    return sp
                def internal(sp):
                    el = entry(node)
                    er = entry(node + 1)
                    hl = jnp.any(el < t_ref[...])
                    stack_ref[jnp.minimum(sp, 63)] = node
                    return sp + hl.astype(jnp.int32) - 1
                sp = jax.lax.cond((i % 3) == 0, leaf, internal, sp)
                sp = jnp.maximum(sp, 0)
            return i + 1, sp

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))

    return kernel


@functools.partial(jax.jit, static_argnames=("n_iter", "variant", "grid"))
def run(nodes, o, d, n_iter, variant, grid):
    return pl.pallas_call(
        make_kernel(n_iter, variant),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ROWS, LANES), lambda i: (0, i, 0)),
            pl.BlockSpec((3, ROWS, LANES), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ROWS * grid, LANES), jnp.float32),
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
    )(nodes, o, d)


nodes = jnp.asarray(np.random.rand(64, 8).astype(np.float32))
GRID = 4
o = jnp.asarray(np.random.rand(3, ROWS * GRID, LANES).astype(np.float32))
d = jnp.asarray(np.random.rand(3, ROWS * GRID, LANES).astype(np.float32) + 0.1)

for variant in ["full", "no_minorder", "no_reduce", "scalar_only", "cond_mix"]:
    times = {}
    for n_iter in [50, 400]:
        r = run(nodes, o, d, n_iter, variant, GRID)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(20):
            r = run(nodes, o, d, n_iter, variant, GRID)
        jax.block_until_ready(r)
        times[n_iter] = (time.perf_counter() - t0) / 20
    per_iter = (times[400] - times[50]) / (400 - 50) / GRID
    print(f"{variant:12s} per-iteration/block: {per_iter*1e9:8.0f} ns   "
          f"(50it: {times[50]*1e3:.2f} ms, 400it: {times[400]*1e3:.2f} ms)")
