"""Prototype: fast row gather on TPU — pallas one-hot MXU vs jnp.take.
out[r, :] = table[idx[r], :] for R=65536, T=12300, K=32.

Timing returns a scalar sum (4-byte transfer) so the ~30 MB/s axon tunnel
does not dominate; correctness checked once with full materialization.
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, T, K = 65536, 12300, 32
TILE = 128
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
idx = jnp.asarray(rng.integers(0, T, size=R), jnp.int32)
idx_coh = jnp.sort(idx)


def timeit(name, fn, *a):
    np.asarray(fn(*a))   # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        times.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(times)*1e3:8.2f} ms", flush=True)


timeit("jnp.take (12300,32)", jax.jit(lambda t, i: jnp.sum(t[i])), table, idx)

# --------------------------------------------- pallas one-hot MXU w/ skip
C = -(-T // 128)
tab_pad = jnp.zeros((C * 128, K), jnp.float32).at[:T].set(table)
SUB = 8   # ray sub-tiles per program (block shape (8, 128))


def k_onehot(idx_ref, tab_ref, out_ref, *, n_blocks, skip):
    ids8 = idx_ref[:, :]                              # (SUB, 128) i32
    idsT = ids8.T                                     # (128, SUB)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
    for s in range(SUB):
        col = idsT[:, s:s + 1]                        # (128, 1)
        lo = jnp.min(col) // 128
        hi = jnp.max(col) // 128
        acc0 = jnp.zeros((TILE, K), jnp.float32)

        def body(b, acc):
            def hit(acc):
                onehot = ((col - b * 128) == lane).astype(jnp.float32)
                rows = tab_ref[pl.ds(b * 128, 128), :]
                return acc + jax.lax.dot(onehot, rows,
                                         preferred_element_type=jnp.float32)
            if skip:
                return jax.lax.cond((b >= lo) & (b <= hi), hit,
                                    lambda a: a, acc)
            return hit(acc)

        acc = jax.lax.fori_loop(0, n_blocks, body, acc0)
        out_ref[pl.ds(s * TILE, TILE), :] = acc


def gather_onehot(tab, idx, skip=False):
    return pl.pallas_call(
        functools.partial(k_onehot, n_blocks=C, skip=skip),
        grid_spec=pl.GridSpec(
            grid=(R // (TILE * SUB),),
            in_specs=[pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE * SUB, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
    )(idx.reshape(-1, 128), tab)


ok = np.allclose(np.asarray(gather_onehot(tab_pad, idx)),
                 np.asarray(table)[np.asarray(idx)])
timeit(f"pallas one-hot MXU noskip (match={ok})",
       jax.jit(lambda t, i: jnp.sum(gather_onehot(t, i))), tab_pad, idx)
timeit("pallas one-hot MXU skip incoherent",
       jax.jit(lambda t, i: jnp.sum(gather_onehot(t, i, skip=True))),
       tab_pad, idx)
timeit("pallas one-hot MXU skip coherent",
       jax.jit(lambda t, i: jnp.sum(gather_onehot(t, i, skip=True))),
       tab_pad, idx_coh)

# ------------------------------- XLA einsum one-hot (bf16, chunked)
def xla_onehot(tab, idx):
    oh = (idx[:, None] == jnp.arange(tab.shape[0])[None, :])
    return jnp.einsum("rt,tk->rk", oh.astype(jnp.bfloat16),
                      tab.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


timeit("XLA einsum one-hot bf16",
       jax.jit(lambda t, i: jnp.sum(xla_onehot(t, i))), tab_pad, idx)

# spectra-style: (470, 8) — small table, full one-hot matmul, no loop
T2, K2 = 470, 8
tab2 = jnp.asarray(rng.standard_normal((T2, K2)), jnp.float32)
idx2 = jnp.asarray(rng.integers(0, T2, size=R), jnp.int32)
timeit("jnp.take (470,8)", jax.jit(lambda t, i: jnp.sum(t[i])), tab2, idx2)
timeit("XLA einsum one-hot f32 (470,8)",
       jax.jit(lambda t, i: jnp.sum(jnp.einsum(
           "rt,tk->rk",
           (i[:, None] == jnp.arange(T2)[None, :]).astype(jnp.float32),
           t, precision=jax.lax.Precision.HIGHEST))), tab2, idx2)
timeit("XLA einsum one-hot bf16 (470,8)",
       jax.jit(lambda t, i: jnp.sum(jnp.einsum(
           "rt,tk->rk",
           (i[:, None] == jnp.arange(T2)[None, :]).astype(jnp.bfloat16),
           t.astype(jnp.bfloat16),
           preferred_element_type=jnp.float32))), tab2, idx2)
