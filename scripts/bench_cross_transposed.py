"""Chip A/B: shared-S cross softmax (axis-0 stats) vs transposed-S variant.

The bidirectional cross block's 1->0 direction either reuses the shared
(N0, N1) similarity matrix with cross-sublane axis-0 max + a ones-vector
column-sum matmul (default), or pays one extra (N1, D) x (D, N0) MXU matmul
to get lane-wise row stats (cross_transposed=True). Same numerics (tested,
tests/test_layer_stack.py::test_cross_transposed_matches_default); this
measures which layout wins in-model at the headline shape and the mixed
bucket. Run: python scripts/bench_cross_transposed.py
"""
from _timing import timed

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu.config import LightGlueConfig
from lightglue_tpu.kernels import layer_stack
from lightglue_tpu.models import lightglue
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights


def _setup(n0, n1, batch=1):
    config = LightGlueConfig()
    policy = policy_for(Precision.BF16)
    params = weights.to_jax(
        weights.init_lightglue(0, config), policy.param_dtype
    )
    rng = np.random.default_rng(0)
    kpts0 = jnp.asarray(rng.uniform(-1, 1, (batch, n0, 2)).astype(np.float32))
    kpts1 = jnp.asarray(rng.uniform(-1, 1, (batch, n1, 2)).astype(np.float32))
    d0 = jnp.asarray(
        rng.standard_normal((batch, n0, 256), dtype=np.float32),
        policy.act_dtype,
    )
    d1 = jnp.asarray(
        rng.standard_normal((batch, n1, 256), dtype=np.float32),
        policy.act_dtype,
    )
    freqs0 = lightglue.posenc(params["posenc"], kpts0, config.head_dim)
    freqs1 = lightglue.posenc(params["posenc"], kpts1, config.head_dim)
    return config, policy, params, d0, d1, freqs0, freqs1


def bench(n0, n1, transposed, masked=False, batch=1):
    config, policy, params, d0, d1, freqs0, freqs1 = _setup(n0, n1, batch)
    if masked:
        lens0 = jnp.full((batch,), int(n0 * 0.7), jnp.int32)
        lens1 = jnp.full((batch,), int(n1 * 0.7), jnp.int32)
    else:
        lens0 = lens1 = None

    def make(iters):
        @jax.jit
        def step(x0, x1):
            def body(carry, _):
                c0, c1 = carry
                o0, o1 = layer_stack.transformer_stack(
                    params["layers"], c0, c1, freqs0, freqs1, lens0, lens1,
                    num_heads=config.num_heads,
                    head_dim=config.head_dim,
                    stat_dtype=policy.attn_stat_dtype,
                    cross_transposed=transposed,
                )
                # unhoistable chained dependency at bf16-exact scale
                eps = (o0[0, 0, 0] * 1e-30).astype(x0.dtype)
                return (x0 + eps, x1), None

            (o0, _), _ = jax.lax.scan(body, (x0, x1), None, length=iters)
            return o0

        return step

    with jax.default_matmul_precision(policy.matmul_precision):
        return timed(make, d0, d1)


if __name__ == "__main__":
    for n0, n1, masked in ((1024, 1024, False), (1024, 1024, True),
                           (256, 512, True)):
        base = bench(n0, n1, False, masked)
        t = bench(n0, n1, True, masked)
        tag = f"{n0}x{n1}{' masked70%' if masked else ''}"
        print(
            f"{tag}: shared-S {base:.3f} ms | transposed-S {t:.3f} ms "
            f"({(base - t) / base * 100:+.1f}%)",
            flush=True,
        )
