"""Chip experiment: can the fused NMS+candidates kernel take odd widths?

The fused extraction kernel is hedged to w % 128 == 0 on TPU
(pipeline/extract.py fused_ok, commit 8094264) because Mosaic's whole-dim
lane padding at non-128 widths was untested on hardware. This tries the
kernel compiled for the REAL chip at 480x600 and 360x488 against the dense
simple_nms + tiled-topk path. If candidate sets agree above threshold at
both shapes, the hedge can be dropped; if Mosaic rejects the lowering or
values mismatch, the hedge stays WITH this as evidence (VERDICT r4 next
#6 offers either outcome).

Run: PYTHONPATH=src python scripts/chip_oddwidth.py
"""

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from lightglue_tpu.kernels.nms import nms_candidates, simple_nms
from lightglue_tpu.pipeline.extract import (
    _topk_candidates,
    _topk_nms_tiled,
    mask_borders,
)

THRESH = 0.0005
K = 1024


def check(h, w):
    rng = np.random.default_rng(1)
    scores = jnp.asarray(rng.random((1, h, w), dtype=np.float32))
    dense = mask_borders(simple_nms(scores, 4), 4)
    dv, di = _topk_nms_tiled(dense, K, h, w)
    want = {
        int(i)
        for v, i in zip(np.asarray(dv[0]), np.asarray(di[0]))
        if v > THRESH
    }
    try:
        cv, ci = nms_candidates(
            scores, nms_radius=4, border=4, cap=4, interpret=False
        )
        # the production path takes top-K over the candidate list
        # (extract_keypoints) — compare like with like, or a correct kernel
        # 'fails' simply because its full candidate list is longer than K
        cv, ci = _topk_candidates(cv, ci, K)
        cv, ci = np.asarray(cv[0]), np.asarray(ci[0])
    except Exception:
        print(f"{h}x{w}: FUSED KERNEL FAILED TO LOWER/RUN:", flush=True)
        traceback.print_exc()
        return False
    got = {int(i) for v, i in zip(cv, ci) if v > THRESH}
    ok = got == want
    print(
        f"{h}x{w}: fused {'==' if ok else '!='} dense "
        f"({len(got)} vs {len(want)} above-threshold candidates)"
        + ("" if ok else f"  missing={len(want - got)} extra={len(got - want)}"),
        flush=True,
    )
    return ok


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    results = [check(480, 600), check(360, 488)]
    print("UNHEDGE_OK" if all(results) else "KEEP_HEDGE", flush=True)
