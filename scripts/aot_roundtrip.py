"""Two-phase AOT round-trip check — the engine-file serialize/reload story.

Phase "export" (one process):  build a MatcherSession, run the live match
step and the extractor on random inputs, export both as StableHLO artifacts
(Mosaic custom calls baked in when run on TPU), save inputs + live outputs.

Phase "reload" (a FRESH process, no model code path touched): deserialize
the artifacts, run them on the saved inputs, compare against the live
outputs, print "AOT_ROUNDTRIP OK".

Run on the chip:
    python scripts/aot_roundtrip.py export /tmp/aot
    python scripts/aot_roundtrip.py reload /tmp/aot
Driven end-to-end by tests/test_aot.py::test_tpu_roundtrip_fresh_process
(LGTPU_TEST_TPU=1). Also reports session cold/warm start time (the compile
cache is the reference's engine-load value proposition, steps.txt:29-227).
"""
import json
import re
import sys
import time
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / "src"
sys.path.insert(0, str(SRC))

import numpy as np

PHASE = sys.argv[1]
OUT = Path(sys.argv[2])
BUCKET = 256
HW = (64, 96)


def _save_pytree(params, path_npz, path_json):
    """Path-keyed npz + dtype sidecar (npz cannot hold bf16)."""
    import jax
    from jax.tree_util import keystr, tree_flatten_with_path

    flat, _ = tree_flatten_with_path(params)
    arrays, dtypes = {}, {}
    for i, (kpath, leaf) in enumerate(flat):
        key = keystr(kpath)
        arr = np.asarray(leaf)
        dtypes[key] = str(arr.dtype)
        arrays[f"k{i}|{key}"] = arr.astype(np.float32)
    np.savez(path_npz, **arrays)
    Path(path_json).write_text(json.dumps(dtypes))


def _load_pytree(path_npz, path_json):
    import jax.numpy as jnp

    dtypes = json.loads(Path(path_json).read_text())
    tree = {}
    with np.load(path_npz) as z:
        for full in z.files:
            key = full.split("|", 1)[1]
            parts = re.findall(r"\['([^']+)'\]", key)
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[full]).astype(dtypes[key])
    return tree


def main_export():
    import jax.numpy as jnp

    from lightglue_tpu.config import (
        LightGlueConfig,
        PipelineConfig,
        SuperPointConfig,
    )
    from lightglue_tpu.precision import Precision
    from lightglue_tpu.runtime import aot
    from lightglue_tpu.runtime.session import MatcherSession

    OUT.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    config = PipelineConfig(
        superpoint=SuperPointConfig(max_num_keypoints=BUCKET),
        lightglue=LightGlueConfig(n_layers=2),
        precision=Precision.BF16,
        buckets=(BUCKET,),
        match_threshold=1e-9,
        max_matches=BUCKET,
    )
    session = MatcherSession(
        config=config, compile_cache_dir=str(OUT / "xla_cache")
    )
    rng = np.random.default_rng(0)
    args = (
        rng.uniform(-1, 1, (1, BUCKET, 2)).astype(np.float32),
        rng.uniform(-1, 1, (1, BUCKET, 2)).astype(np.float32),
        rng.standard_normal((1, BUCKET, 256)).astype(np.float32),
        rng.standard_normal((1, BUCKET, 256)).astype(np.float32),
        np.full((1,), BUCKET, np.int32),
        np.full((1,), BUCKET, np.int32),
    )
    image = rng.random((1, HW[0], HW[1], 1)).astype(np.float32)

    live_out, live_matches = session._match_fn(BUCKET, BUCKET)(
        session.lg_params, *map(jnp.asarray, args)
    )
    live_ext = session.extract(image)
    t_first = time.perf_counter() - t0

    paths = aot.export_matcher(session, str(OUT), batch=1)
    epath = aot.export_extractor(session, str(OUT), HW, batch=1)

    np.savez(
        OUT / "io.npz",
        image=image,
        live_scores=np.asarray(live_out.scores, np.float32),
        live_match_idx=np.asarray(live_matches.indices),
        live_kpts=np.asarray(live_ext.keypoints, np.float32),
        live_desc=np.asarray(live_ext.descriptors, np.float32),
        **{f"arg{i}": a for i, a in enumerate(args)},
    )
    _save_pytree(session.lg_params, OUT / "lg_params.npz", OUT / "lg_dtypes.json")
    _save_pytree(session.sp_params, OUT / "sp_params.npz", OUT / "sp_dtypes.json")
    meta = {
        "match_artifact": paths[(BUCKET, BUCKET)],
        "extract_artifact": epath,
        "t_first_s": round(t_first, 2),
    }
    (OUT / "meta.json").write_text(json.dumps(meta))

    # warm-start measurement: a second session over the SAME compile cache
    # in this process still re-traces but hits the persistent cache
    t1 = time.perf_counter()
    warm = MatcherSession(
        config=config, compile_cache_dir=str(OUT / "xla_cache")
    )
    warm._match_fn(BUCKET, BUCKET)(warm.lg_params, *map(jnp.asarray, args))
    warm.extract(image)
    t_warm = time.perf_counter() - t1
    print(
        f"EXPORT OK cold_start={t_first:.1f}s warm_start={t_warm:.1f}s",
        flush=True,
    )


def main_reload():
    import jax.numpy as jnp

    from lightglue_tpu.runtime import aot

    meta = json.loads((OUT / "meta.json").read_text())
    io = np.load(OUT / "io.npz")
    lg_params = _load_pytree(OUT / "lg_params.npz", OUT / "lg_dtypes.json")
    sp_params = _load_pytree(OUT / "sp_params.npz", OUT / "sp_dtypes.json")
    args = [jnp.asarray(io[f"arg{i}"]) for i in range(6)]

    match = aot.load_exported(meta["match_artifact"])
    out, matches = match(lg_params, *args)
    scores = out.scores if hasattr(out, "scores") else out[2]
    idx = matches.indices if hasattr(matches, "indices") else matches[0]
    np.testing.assert_allclose(
        np.asarray(scores, np.float32), io["live_scores"], atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(idx), io["live_match_idx"])

    extract = aot.load_exported(meta["extract_artifact"])
    ext = extract(sp_params, jnp.asarray(io["image"]))
    kpts = ext.keypoints if hasattr(ext, "keypoints") else ext[0]
    desc = ext.descriptors if hasattr(ext, "descriptors") else ext[2]
    np.testing.assert_allclose(
        np.asarray(kpts, np.float32), io["live_kpts"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(desc, np.float32), io["live_desc"], atol=1e-6
    )
    print("AOT_ROUNDTRIP OK", flush=True)


if PHASE == "export":
    main_export()
elif PHASE == "reload":
    main_reload()
else:
    raise SystemExit(f"unknown phase {PHASE}")
