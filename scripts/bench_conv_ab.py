"""Per-shape A/B: kernels/conv.py conv3x3 vs XLA conv, SuperPoint stages."""
from _timing import timed

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu.kernels import conv as ck

_DN = ("NHWC", "HWIO", "NHWC")

SHAPES = [  # (name, h, w, cin, cout, pool)
    ("conv1b+pool", 480, 640, 64, 64, True),
    ("conv2a", 240, 320, 64, 64, False),
    ("conv2b+pool", 240, 320, 64, 64, True),
    ("conv3a", 120, 160, 64, 128, False),
    ("conv3b+pool", 120, 160, 128, 128, True),
    ("conv4a", 60, 80, 128, 128, False),
    ("convPa", 60, 80, 128, 256, False),
]


def xla_ref(x, w, b, pool):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    out = jax.nn.relu((out + b).astype(x.dtype))
    if pool:
        out = jax.lax.reduce_window(
            out, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    return out


def run(name, h, w, cin, cout, pool, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32), dtype)
    wts = jnp.asarray((rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))

    def make(fn):
        def make_fn(iters):
            @jax.jit
            def runit(x, wts, b):
                def body(carry, _):
                    xi = x + carry.astype(x.dtype) * 1e-30
                    o = fn(xi, wts, b)
                    return o[0, 0, 0, 0].astype(jnp.float32), ()
                return jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return runit
        return make_fn

    t_pallas = timed(make(lambda x, w_, b_: ck.conv3x3(x, w_, b_, relu=True, pool=pool)), x, wts, b)
    t_xla = timed(make(lambda x, w_, b_: xla_ref(x, w_, b_, pool)), x, wts, b)
    gf = 2 * h * w * cin * cout * 9 / 1e9
    print(f"{name:12s}: pallas {t_pallas:7.3f} ms ({gf/t_pallas:6.1f} TF)  "
          f"xla {t_xla:7.3f} ms ({gf/t_xla:6.1f} TF)", flush=True)


import sys as _sys

if __name__ == "__main__" and (len(_sys.argv) < 2 or _sys.argv[1] == "direct"):
    for spec in SHAPES:
        run(*spec)
    _sys.exit(0)


def run_paired(name, h, w, cin, cout, pool, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32), dtype)
    wts = jnp.asarray((rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))

    def make(fn):
        def make_fn(iters):
            @jax.jit
            def runit(x, wts, b):
                def body(carry, _):
                    xi = x + carry.astype(x.dtype) * 1e-30
                    o = fn(xi, wts, b)
                    return o[0, 0, 0, 0].astype(jnp.float32), ()
                return jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return runit
        return make_fn

    t = timed(make(lambda x, w_, b_: ck.conv3x3_paired(x, w_, b_, relu=True, pool=pool)), x, wts, b)
    gf = 2 * h * w * cin * cout * 9 / 1e9
    print(f"{name:12s}: paired {t:7.3f} ms ({gf/t:6.1f} TF)", flush=True)


def run_offset_ab(name, h, w, cin, cout, pool, dtype=jnp.bfloat16, reps=3):
    """Interleaved A/B: offset-paired input (6 unit-aligned 75%-dense
    matmuls/point) vs parity-block (9 at 50%). Both consume the same
    unpaired NHWC input, so the XLA-side pad/repack cost is inside both
    timed regions."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32), dtype)
    wts = jnp.asarray((rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))

    def make(use_offset):
        def make_fn(iters):
            @jax.jit
            def runit(x, wts, b):
                def body(carry, _):
                    xi = x + carry.astype(x.dtype) * 1e-30
                    o = ck.conv3x3_paired(
                        xi, wts, b, relu=True, pool=pool, offset=use_offset
                    )
                    return o[0, 0, 0, 0].astype(jnp.float32), ()
                return jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return runit
        return make_fn

    gf = 2 * h * w * cin * cout * 9 / 1e9
    for rep in range(reps):
        tb = timed(make(False), x, wts, b)
        to = timed(make(True), x, wts, b)
        print(
            f"{name:12s} rep{rep}: block {tb:7.3f} ms ({gf/tb:5.1f} TF) | "
            f"offset {to:7.3f} ms ({gf/to:5.1f} TF)",
            flush=True,
        )


def run_chain_ab(h=240, w=320, c=64, dtype=jnp.bfloat16, reps=3):
    """conv2a->conv2b+pool two ways: paired chain (out_paired, conv2b on
    9 parity-block matmuls, no relayout between) vs unpaired handoff
    (conv2a emits NHWC — a relayout — and conv2b runs the 6-matmul offset
    form). Decides whether the offset win survives the unpair cost."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32), dtype)
    wa = jnp.asarray((rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32))
    ba = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    wb = jnp.asarray((rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    def make(use_offset):
        def chain(x):
            if use_offset:
                m = ck.conv3x3_paired(x, wa, ba, offset=True)
                return ck.conv3x3_paired(m, wb, bb, offset=True, pool=True)
            m = ck.conv3x3_paired(x, wa, ba, offset=True, out_paired=True)
            return ck.conv3x3_paired(m, wb, bb, x_paired=True, pool=True)

        def make_fn(iters):
            @jax.jit
            def runit(x):
                def body(carry, _):
                    xi = x + carry.astype(x.dtype) * 1e-30
                    o = chain(xi)
                    return o[0, 0, 0, 0].astype(jnp.float32), ()
                return jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return runit
        return make_fn

    for rep in range(reps):
        tp = timed(make(False), x)
        to = timed(make(True), x)
        print(
            f"conv2a->2b   rep{rep}: paired-chain {tp:7.3f} ms | "
            f"unpair+offset {to:7.3f} ms",
            flush=True,
        )


if len(_sys.argv) > 1 and _sys.argv[1] == "chain2":
    run_chain_ab()
    _sys.exit(0)


if len(_sys.argv) > 1 and _sys.argv[1] == "offset":
    run_offset_ab("conv1b+pool", 480, 640, 64, 64, True)
    run_offset_ab("conv2a", 240, 320, 64, 64, False)
    run_offset_ab("conv2b+pool", 240, 320, 64, 64, True)
    _sys.exit(0)


if len(_sys.argv) > 1 and _sys.argv[1] == "rows":
    # strip-height sweep: LGTPU_CONV_ROWS is read at trace time inside
    # _pick_rows, so set it per measurement before the first trace of each
    # jit cache entry (each rows value is its own compile key via the
    # resulting block shapes)
    import os as _os
    for rows in (16, 32, 48, 60, 96):
        _os.environ["LGTPU_CONV_ROWS"] = str(rows)
        # rows is not part of the jit key (same arg shapes) — drop the
        # cached trace so the env override takes effect
        ck.conv3x3_paired.clear_cache()
        run_paired(f"conv1b r{rows}", 480, 640, 64, 64, True)
    _os.environ.pop("LGTPU_CONV_ROWS", None)
    _sys.exit(0)


if len(_sys.argv) > 1 and _sys.argv[1] == "paired":
    run_paired("conv1b+pool", 480, 640, 64, 64, True)
    run_paired("conv2a", 240, 320, 64, 64, False)
    run_paired("conv2b+pool", 240, 320, 64, 64, True)
    # reshape-only cost: pair + unpair round trip
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 480, 640, 64)).astype(np.float32), jnp.bfloat16)
    def make_fn(iters):
        @jax.jit
        def runit(x):
            def body(carry, _):
                xi = x + carry.astype(x.dtype) * 1e-30
                xr = xi.reshape(1, 480, 320, 128)
                o = (xr * 2).reshape(1, 480, 640, 64)
                return o[0, 0, 0, 0].astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return runit
    print(f"pair-reshape roundtrip: {timed(make_fn, x):7.3f} ms", flush=True)
    _sys.exit(0)


if len(_sys.argv) > 1 and _sys.argv[1] == "chain":
    from lightglue_tpu.models import superpoint as spm
    from lightglue_tpu.runtime import weights as wlib
    from lightglue_tpu.config import PipelineConfig
    from lightglue_tpu.precision import Precision, policy_for

    config = PipelineConfig(precision=Precision.BF16)
    policy = policy_for(config.precision)
    params = wlib.to_jax(wlib.init_superpoint(0, config.superpoint))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 480, 640, 1), dtype=np.float32))

    def chain(img, mode):
        x = spm._relu_conv1a_shift(params["conv1a"], img.astype(jnp.bfloat16))
        if "barrier" in mode:
            x = jax.lax.optimization_barrier(x)
        if "paired" in mode:
            x = ck.conv3x3_paired(x, params["conv1b"]["w"], params["conv1b"]["b"], pool=True)
            x = ck.conv3x3_paired(x, params["conv2a"]["w"], params["conv2a"]["b"], out_paired=True)
            x = ck.conv3x3_paired(x, params["conv2b"]["w"], params["conv2b"]["b"], x_paired=True, pool=True)
        else:
            x = spm._relu_conv(params["conv1b"], x, pool=True)
            x = spm._relu_conv(params["conv2a"], x)
            x = spm._relu_conv(params["conv2b"], x, pool=True)
        return x

    def make(mode, tail):
        def make_fn(iters):
            @jax.jit
            def runit(img):
                def body(carry, _):
                    xi = img + carry * 1e-30
                    x = chain(xi, mode)
                    if tail:
                        x = spm._relu_conv(params["conv3a"], x)
                        x = spm._relu_conv(params["conv3b"], x, pool=True)
                        x = spm._relu_conv(params["conv4a"], x)
                        x = spm._relu_conv(params["conv4b"], x)
                    return x[0, 0, 0, 0].astype(jnp.float32), ()
                return jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return runit
        return make_fn

    for mode in ("paired_barrier", "paired", "xla"):
        for tail in (False, True):
            t = timed(make(mode, tail), img)
            print(f"stem[{mode:15s}] tail={tail}: {t:7.3f} ms", flush=True)
    _sys.exit(0)


def run_offset_lhs_ab(name, h, w, cin, cout, pool, dtype=jnp.bfloat16, reps=3):
    """Interleaved A/B: offset fold via fp32 output shift-add (default) vs
    per-k lhs window matmuls (offset_lhs) — same 6 MXU passes, different
    data movement for the k=1 contribution."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32), dtype)
    wts = jnp.asarray((rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))

    def make(lhs_form):
        def make_fn(iters):
            @jax.jit
            def runit(x, wts, b):
                def body(carry, _):
                    xi = x + carry.astype(x.dtype) * 1e-30
                    o = ck.conv3x3_paired(
                        xi, wts, b, relu=True, pool=pool, offset=True,
                        offset_lhs=lhs_form,
                    )
                    return o[0, 0, 0, 0].astype(jnp.float32), ()
                return jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return runit
        return make_fn

    for rep in range(reps):
        ta = timed(make(False), x, wts, b)
        tb = timed(make(True), x, wts, b)
        print(
            f"{name:12s} rep{rep}: shift-add {ta:7.3f} ms | lhs-window {tb:7.3f} ms",
            flush=True,
        )


if len(_sys.argv) > 1 and _sys.argv[1] == "offset_lhs":
    run_offset_lhs_ab("conv1b+pool", 480, 640, 64, 64, True)
    run_offset_lhs_ab("conv2a", 240, 320, 64, 64, False)
    _sys.exit(0)


def run_chain2_fused_ab(h=240, w=320, c=64, dtype=jnp.bfloat16, reps=3):
    """Fused conv2a+conv2b+pool single pallas_call vs the two-call chain
    (intermediate round-trips HBM). Exact same math (CPU-verified 0.0)."""
    from lightglue_tpu.kernels.conv_chain import conv2_chain

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32), dtype)
    wa = jnp.asarray((rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32))
    ba = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    wb = jnp.asarray((rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    def make(fused):
        def chain(xi):
            if fused:
                return conv2_chain(xi, wa, ba, wb, bb)
            m = ck.conv3x3_paired(xi, wa, ba, offset=True, out_paired=True)
            return ck.conv3x3_paired(m, wb, bb, x_paired=True, pool=True)

        def make_fn(iters):
            @jax.jit
            def runit(x):
                def body(carry, _):
                    xi = x + carry.astype(x.dtype) * 1e-30
                    o = chain(xi)
                    return o[0, 0, 0, 0].astype(jnp.float32), ()
                return jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return runit
        return make_fn

    # correctness on chip first
    a = np.asarray(make(False)(1)(x)[0])
    b = np.asarray(make(True)(1)(x)[0])
    print(f"chip parity: {abs(float(a) - float(b)):.2e}", flush=True)
    for rep in range(reps):
        t2 = timed(make(False), x)
        t1 = timed(make(True), x)
        print(
            f"conv2 chain  rep{rep}: two-call {t2:7.3f} ms | fused {t1:7.3f} ms",
            flush=True,
        )


if len(_sys.argv) > 1 and _sys.argv[1] == "chain2_fused":
    run_chain2_fused_ab()
    _sys.exit(0)
