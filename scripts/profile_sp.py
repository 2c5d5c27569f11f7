"""Profile forward+extract on TPU and print the top ops by self time."""
import sys, glob, gzip, json, collections
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
        scores, desc = superpoint.forward(
            params, img, config=config.superpoint, policy=policy
        )
        ext = extract_keypoints(scores, desc, config=config.superpoint)
        return ext.keypoints_norm[0, 0, 0], ()
    return jax.lax.scan(body, jnp.float32(0), None, length=20)


out = run(params, image)
np.asarray(jax.tree.leaves(out)[0])

trace_dir = "/tmp/sp_trace"
with jax.profiler.trace(trace_dir):
    out = run(params, image)
    np.asarray(jax.tree.leaves(out)[0])

files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
agg = collections.Counter()
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            pid_name = ev.get("pid")
            agg[name] += ev["dur"]
for name, dur in agg.most_common(40):
    print(f"{dur/1e3:10.3f} ms  {name[:110]}")
