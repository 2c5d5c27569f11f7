"""Chip A/B: INT8 rung with real int8 matmuls (W8A8) vs weight-only dequant.

VERDICT r4 next #4: weight-only int8 ties bf16 at batch 1 AND 8 (the halved
weight HBM bytes are hidden behind compute), so the only way the rung can
WIN is v5e's ~2x int8 MXU rate. LGTPU_W8A8=1 switches the megakernel's
projection/FFN matmuls to per-row dynamically quantized int8 activations x
per-channel int8 weights with int32 accumulation
(kernels/layer_stack.py:_linear "q8" mode). The flag is read at trace time,
so each variant runs in its own subprocess (shared persistent compile
cache keeps the second run of a session cheap).

Also records accuracy: mutual-NN row-argmax agreement of each variant vs
the fp32 rung on identical weights (the verify_ab discipline — random-init
weights make absolute match counts meaningless).

Run: PYTHONPATH=src python scripts/bench_w8a8.py
"""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, sys
sys.path.insert(0, {root_src!r})
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import bench
from lightglue_tpu.precision import Precision

res = {{
    "backend": jax.default_backend(),
    "w8a8": __import__("os").environ.get("LGTPU_W8A8", "0"),
    "int8_1x1024": bench.bench_lightglue(Precision.INT8),
    "int8_batch8_per_pair": {{
        k: (
            v if k in ("spread_pct", "outlier_contaminated")
            else [round(x / 8, 3) for x in v] if k == "reps"
            else round(v / 8, 3)
        )
        for k, v in bench.bench_lightglue(Precision.INT8, batch=8).items()
    }},
}}

# accuracy anchor: mutual-NN match-set IoU and row-argmax agreement of this
# int8 variant vs the fp32 rung on IDENTICAL weights (verify_ab discipline
# — random-init weights make absolute match counts meaningless)
import numpy as np
import jax.numpy as jnp
from lightglue_tpu.config import LightGlueConfig
from lightglue_tpu.models import lightglue as lg
from lightglue_tpu.precision import policy_for
from lightglue_tpu.runtime import weights
from lightglue_tpu.quant import quantize_lightglue

config = LightGlueConfig()
raw = weights.init_lightglue(0, config)
rng = np.random.default_rng(0)
n = 512
args = (
    jnp.asarray(rng.uniform(-1, 1, (1, n, 2)).astype(np.float32)),
    jnp.asarray(rng.uniform(-1, 1, (1, n, 2)).astype(np.float32)),
    jnp.asarray(rng.standard_normal((1, n, 256), dtype=np.float32)),
    jnp.asarray(rng.standard_normal((1, n, 256), dtype=np.float32)),
    None, None,
)
qs = np.asarray(lg.forward(
    weights.to_jax(quantize_lightglue(raw)),
    args[0], args[1],
    args[2].astype(jnp.bfloat16), args[3].astype(jnp.bfloat16), None, None,
    config=config, policy=policy_for(Precision.INT8),
).scores.astype(jnp.float32))[0]
fs = np.asarray(lg.forward(
    weights.to_jax(raw, jnp.float32), *args,
    config=config, policy=policy_for(Precision.FP32),
).scores.astype(jnp.float32))[0]


def mnn(s):
    ra, ca = s.argmax(1), s.argmax(0)
    return {{(i, int(ra[i])) for i in range(s.shape[0])
             if ca[ra[i]] == i}}


mq, mf = mnn(qs), mnn(fs)
res["acc_vs_fp32"] = {{
    "row_argmax_agree": round(float((qs.argmax(1) == fs.argmax(1)).mean()), 4),
    "mutual_nn_iou": round(len(mq & mf) / max(len(mq | mf), 1), 4),
}}
print("CHILD_RESULT " + json.dumps(res))
"""


def run_variant(w8a8: bool):
    env = dict(os.environ, LGTPU_W8A8="1" if w8a8 else "0")
    src = _CHILD.format(root_src=str(ROOT / "src"), root=str(ROOT))
    r = subprocess.run(
        [sys.executable, "-c", src],
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    for line in r.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    print(r.stdout[-2000:], file=sys.stderr)
    print(r.stderr[-2000:], file=sys.stderr)
    raise RuntimeError(f"variant w8a8={w8a8} failed rc={r.returncode}")


def main():
    for w8a8 in (False, True):
        res = run_variant(w8a8)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
