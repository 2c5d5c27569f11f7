"""A/B: MatcherSession matches with megakernel ON vs OFF (same weights)."""
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
from lightglue_tpu.kernels import layer_stack
from lightglue_tpu.precision import Precision
from lightglue_tpu.runtime.session import MatcherSession


def synth(h, w, seed, shift=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h + 64, w + 64), np.float32)
    img = base[32 + shift : 32 + shift + h, 32 : 32 + w]
    return img[..., None].astype(np.float32)


def run(use_stack, threshold):
    orig = layer_stack.supports
    if not use_stack:
        layer_stack.supports = lambda *a, **k: False
    try:
        cfg = PipelineConfig(precision=Precision.BF16, match_threshold=threshold)
        session = MatcherSession(config=cfg)
        img = synth(480, 640, seed=1)
        r = session.match_pair(img, img)
        n = len(r["matches"])
        ident = (
            float(np.mean(r["matches"][:, 0] == r["matches"][:, 1])) if n else 0.0
        )
        smax = float(np.exp(r["scores"].max()))
        return n, ident, smax
    finally:
        layer_stack.supports = orig


if __name__ == "__main__":
    for threshold in (0.1, 0.0):
        on = run(True, threshold)
        off = run(False, threshold)
        print(f"thr={threshold}: stack ON  matches={on[0]} ident={on[1]:.3f} max_p={on[2]:.4f}")
        print(f"thr={threshold}: stack OFF matches={off[0]} ident={off[1]:.3f} max_p={off[2]:.4f}", flush=True)
