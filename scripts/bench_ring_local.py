"""Chip bench: ring attention's per-device local compute, kernel vs jnp.

VERDICT r4 next #3: the sequence-parallel path's entire point is per-chip
throughput at large N, but its local math ran as generic jnp dots, which the
repo's chip ledger puts ~3x off the Pallas kernel rate. This measures the
kernelized local step (kernels/attention.py:flash_attention_step) on ONE
real chip by simulating the ring serially: one device's Q stripe
(n = N / ring) merged against all `ring` KV blocks in sequence — exactly the
compute each ring member does per layer, minus the ppermute (ICI transfer,
which the 8-CPU mesh parity tests cover functionally and XLA overlaps with
compute on a real mesh).

A/B: the same serial merge with the r4 jnp einsum body. Two-point in-jit
lax.scan timing (bench.py methodology). Reports ms + achieved TFLOPs
against the ~129 TFLOPs bf16 calibrated chip ceiling.

Run: PYTHONPATH=src python scripts/bench_ring_local.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

import bench as bench_harness  # hardened two-point methodology
from lightglue_tpu.kernels.attention import flash_attention_step

_NEG_INF = -1e30


def _timed(make_fn, *args):
    r = bench_harness._timed(make_fn, *args, iters_lo=10, iters_hi=40)
    return r["p50"], r["spread_pct"]


def _serial_ring_kernel(q, k_blocks, v_blocks, lengths, ring):
    b, h, n, d = q.shape
    m = jnp.full((b, h, n, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, n, 1), jnp.float32)
    acc = jnp.zeros((b, h, n, d), jnp.float32)
    nk = k_blocks.shape[3]
    for s in range(ring):
        m, l, acc = flash_attention_step(
            q, k_blocks[s], v_blocks[s], m, l, acc, lengths,
            jnp.int32(0), jnp.int32(s * nk),
        )
    return acc / jnp.where(l == 0.0, 1.0, l)


def _serial_ring_jnp(q, k_blocks, v_blocks, lengths, ring):
    """The r4 ring_attention_local body, verbatim math (jnp einsum merge)."""
    b, h, n, d = q.shape
    nk = k_blocks.shape[3]
    scale = 1.0 / np.sqrt(d)
    qf = q.astype(jnp.float32) * scale
    m = jnp.full((b, h, n, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, n, 1), jnp.float32)
    acc = jnp.zeros((b, h, n, d), jnp.float32)
    for s in range(ring):
        k, v = k_blocks[s], v_blocks[s]
        col0 = s * nk
        sij = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        if lengths is not None:
            cols = col0 + jnp.arange(nk)
            valid = cols[None, :] < lengths[:, 1][:, None]
            sij = jnp.where(valid[:, None, None, :], sij, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(sij, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(sij - m_new)
        if lengths is not None:
            p = jnp.where(valid[:, None, None, :], p, 0.0)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        m = m_new
    return acc / jnp.where(l == 0.0, 1.0, l)


def bench(n_total, ring, heads=4, d=64, dtype=jnp.bfloat16, masked=True):
    n = n_total // ring
    rng = np.random.default_rng(0)
    q = jnp.asarray(
        rng.standard_normal((1, heads, n, d), dtype=np.float32), dtype
    )
    kb = jnp.asarray(
        rng.standard_normal((ring, 1, heads, n, d), dtype=np.float32), dtype
    )
    vb = jnp.asarray(
        rng.standard_normal((ring, 1, heads, n, d), dtype=np.float32), dtype
    )
    lengths = (
        jnp.asarray([[n, n_total]], jnp.int32) if masked else None
    )
    flops = 2 * 2 * heads * n * n_total * d  # one device's share per pass

    for label, body in (
        ("kernel", _serial_ring_kernel),
        ("jnp", _serial_ring_jnp),
    ):
        def make_fn(iters, body=body):
            @jax.jit
            def run(q, kb, vb):
                def it(carry, _):
                    out = body(
                        q + carry.astype(q.dtype) * 1e-30, kb, vb,
                        lengths, ring,
                    )
                    return out[0, 0, 0, 0].astype(jnp.float32), ()
                return jax.lax.scan(it, jnp.float32(0), None, length=iters)

            return run

        ms, spread = _timed(make_fn, q, kb, vb)
        tf = flops / (ms * 1e-3) / 1e12
        print(
            f"N={n_total} ring={ring} local n={n} {label}: "
            f"{ms:.3f} ms/pass  {tf:.1f} TFLOPs  (spread {spread:.0f}%)",
            flush=True,
        )


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    for n_total in (2048, 4096):
        bench(n_total, ring=8)
    # one-chip-sized stripe at the reference plugin's 2048 cap, ring=2
    bench(4096, ring=2)
