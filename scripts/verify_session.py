"""End-to-end drive of MatcherSession through the megakernel path on TPU.

Probes:
1. identical synthetic image pair -> matches should be near-identity;
2. ragged pair (different image sizes -> different buckets) -> fallback
   per-block path, still valid matches;
3. batch API consistency with single-pair API.
"""
import sys
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / "src"
sys.path.insert(0, str(SRC))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from lightglue_tpu.config import PipelineConfig
from lightglue_tpu.precision import Precision
from lightglue_tpu.runtime.session import MatcherSession


def synth(h, w, seed, shift=0):
    """Structured synthetic frame: box-blurred noise (natural-image-like
    local texture). Raw uniform noise is position-degenerate for matching —
    even with a whitened descriptor head, a random-weight LightGlue assigns
    probability < 1e-3 everywhere on pure noise (observed on chip and CPU);
    blurring restores locally distinctive blobs like the real frames the
    demo/golden runs use."""
    rng = np.random.default_rng(seed)
    base = rng.random((h + 64, w + 64), np.float32)
    k = np.ones(9, np.float32) / 9.0
    for axis in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, base
        )
    base -= base.min()
    base /= max(base.max(), 1e-6)
    img = base[32 + shift : 32 + shift + h, 32 : 32 + w]
    return np.ascontiguousarray(img)[..., None].astype(np.float32)


def main():
    import subprocess
    sha = subprocess.run(
        ["git", "-C", str(Path(__file__).resolve().parent.parent),
         "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    print(f"verify_session @ {sha}", flush=True)
    # match_threshold 0: random weights give near-uniform assignment
    # probabilities (max exp(score) ~ 1/K^2) so any positive threshold
    # empties the match set at K=1024 — same rationale as
    # tests/test_fullscale_parity.py. The bar here is mutual-NN IDENTITY
    # structure on an identical pair, not match probability mass.
    config = PipelineConfig(precision=Precision.BF16, match_threshold=0.0)
    # random-init weights only (no checkpoint in this env): ZCA-whiten the
    # descriptor head on a calibration frame, exactly like cli/demo_mono.py
    # — raw random convs collapse descriptors onto one direction and
    # identical images then produce ZERO matches at threshold 0.1 (observed
    # on-chip, golden/chip_r03/verify_session_unwhitened.out)
    from lightglue_tpu.runtime import weights

    sp_params = weights.whiten_superpoint_descriptors(
        weights.init_superpoint(0, config.superpoint),
        synth(480, 640, seed=1)[None],
        config=config.superpoint,
    )
    session = MatcherSession(sp_params, config=config)

    # 1. identical pair
    img = synth(480, 640, seed=1)
    r = session.match_pair(img, img)
    n = len(r["matches"])
    ident = float(np.mean(r["matches"][:, 0] == r["matches"][:, 1])) if n else 0
    print(f"[identical pair] kpts={r['num_keypoints0']}/{r['num_keypoints1']}"
          f" matches={n} identity_rate={ident:.3f}", flush=True)
    assert n > 100, "expected many matches on identical images"
    assert ident > 0.95, "matches on identical images must be the identity"

    # 2. shifted pair (same scene content, 8px vertical shift)
    r2 = session.match_pair(synth(480, 640, seed=1), synth(480, 640, seed=1, shift=8))
    n2 = len(r2["matches"])
    if n2:
        dy = r2["matched_kpts0"][:, 1] - r2["matched_kpts1"][:, 1]
        med = float(np.median(dy))
    else:
        med = float("nan")
    print(f"[shifted pair] matches={n2} median_dy={med:.2f} (expect ~+8)",
          flush=True)
    assert n2 > 50 and abs(med - 8.0) < 1.5

    # 3. ragged sizes -> different keypoint buckets (fallback path)
    r3 = session.match_pair(synth(480, 640, seed=2), synth(240, 320, seed=3))
    print(f"[ragged sizes] kpts={r3['num_keypoints0']}/{r3['num_keypoints1']}"
          f" matches={len(r3['matches'])}", flush=True)

    # 4. batch API consistent with single-pair API
    imgs0 = np.stack([synth(480, 640, seed=1)])
    imgs1 = np.stack([synth(480, 640, seed=1, shift=8)])
    rb = session.match_batch(imgs0, imgs1)[0]
    same = len(rb["matches"]) == n2
    print(f"[batch-vs-single] batch_matches={len(rb['matches'])} single={n2}"
          f" equal={same}", flush=True)

    print("VERIFY_OK", flush=True)


if __name__ == "__main__":
    main()
