"""Dump compiled HLO of SuperPoint forward+extract; find the hot ops."""
import sys, re
from pathlib import Path
SRC = Path(__file__).resolve().parent.parent / "src"
sys.path.insert(0, str(SRC))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from lightglue_tpu.config import PipelineConfig
from lightglue_tpu.models import superpoint
from lightglue_tpu.pipeline.extract import extract_keypoints
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights

config = PipelineConfig(precision=Precision.BF16)
policy = policy_for(config.precision)
params = weights.to_jax(weights.init_superpoint(0, config.superpoint))
rng = np.random.default_rng(0)
image = jnp.asarray(rng.random((1, 480, 640, 1), dtype=np.float32))

@jax.jit
def run(params, image):
    def body(carry, _):
        img = image + carry * 1e-30
        scores, desc = superpoint.forward(params, img, config=config.superpoint, policy=policy)
        ext = extract_keypoints(scores, desc, config=config.superpoint)
        return ext.keypoints_norm[0, 0, 0], ()
    return jax.lax.scan(body, jnp.float32(0), None, length=20)

txt = run.lower(params, image).compile().as_text()
Path("/tmp/sp_hlo.txt").write_text(txt)
want = ["fusion.331", "fusion.329", "fusion.334", "fusion.336", "copy.105",
        "copy.106", "copy.107", "slice.150", "sort.9", "fusion.340",
        "fusion.338", "fusion.332", "reshape.330"]
for line in txt.splitlines():
    s = line.strip()
    for w in want:
        if s.startswith(f"%{w} ") or s.startswith(f"{w} ") or f" {w} = " in s:
            print(s[:400]); print()
