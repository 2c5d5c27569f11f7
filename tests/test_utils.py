"""Utils: viz rendering, profiling timer, checkpoint converter CLI."""

import subprocess
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")

import numpy as np
import torch

from torch_oracle import make_lightglue_state_dict, make_superpoint_state_dict

REPO = Path(__file__).resolve().parent.parent


def test_viz_renders_match_figure(tmp_path, rng):
    from lightglue_tpu.utils import viz

    im0 = rng.random((60, 80))
    im1 = rng.random((60, 90))
    fig, axes = viz.plot_images([im0, im1], titles=["a", "b"])
    k0 = rng.uniform(0, 60, (12, 2))
    k1 = rng.uniform(0, 60, (12, 2))
    viz.plot_keypoints(axes, [k0, k1])
    viz.plot_matches(axes, k0, k1, scores=rng.random(12))
    out = tmp_path / "m.png"
    viz.save_plot(fig, str(out))
    assert out.stat().st_size > 1000


def test_cm_rdgn_endpoints():
    from lightglue_tpu.utils.viz import cm_RdGn

    lo, hi = cm_RdGn(np.array([0.0, 1.0]))
    assert hi[1] > hi[0]  # green dominant at 1
    assert lo[0] > lo[1]  # red dominant at 0


def test_section_timer():
    from lightglue_tpu.utils.profiling import SectionTimer

    t = SectionTimer()
    for _ in range(3):
        with t.section("work"):
            sum(range(1000))
    s = t.summary()["work"]
    assert s["count"] == 3 and s["mean_ms"] >= 0
    assert "work" in t.report()


def test_convert_cli_roundtrip(tmp_path):
    sp_pth = tmp_path / "sp.pth"
    lg_pth = tmp_path / "lg.pth"
    torch.save(make_superpoint_state_dict(seed=1), sp_pth)
    torch.save(make_lightglue_state_dict(seed=2, n_layers=2), lg_pth)
    out = tmp_path / "weights.npz"
    res = subprocess.run(
        [
            sys.executable, "-m", "lightglue_tpu.cli.convert",
            "--superpoint", str(sp_pth),
            "--lightglue", str(lg_pth),
            "--out", str(out),
        ],
        capture_output=True,
        text=True,
        env={
            "PYTHONPATH": str(REPO / "src"),
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "JAX_PLATFORMS": "cpu",
        },
        cwd=str(REPO),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    from lightglue_tpu.runtime import weights

    tree = weights.load_npz(str(out))
    assert "superpoint" in tree and "lightglue" in tree
    assert tree["superpoint"]["conv1a"]["w"].shape == (3, 3, 1, 64)
    # stacked layer leaves present with layer-leading axis
    assert tree["lightglue"]["layers"]["self_attn"]["qkv"]["w"].shape == (
        2, 3, 256, 256,
    )


def test_cm_blrdgn_and_prune():
    from lightglue_tpu.utils.viz import cm_BlRdGn, cm_prune
    import numpy as np

    # endpoint values are the reference's saturating two-sided blend
    # (viz2d.py:22-29: at -1 the clip of 2*[0, .1, 1, 1] gives g=0.2)
    c = cm_BlRdGn(np.array([-1.0, 0.0, 1.0]))
    np.testing.assert_allclose(c[0], [0.0, 0.2, 1.0, 1.0], atol=1e-6)  # blue
    np.testing.assert_allclose(c[1], [1.0, 0.0, 0.0, 1.0], atol=1e-6)  # red
    np.testing.assert_allclose(c[2], [0.0, 1.0, 0.0, 1.0], atol=1e-6)  # green
    # midpoints saturate: +0.5 is yellow, not brown
    mid = cm_BlRdGn(np.array([0.5]))
    np.testing.assert_allclose(mid[0], [1.0, 1.0, 0.0, 1.0], atol=1e-6)

    # pruning map: survivors (latest layer) blue, layer-1 prunes red-ish
    layers = np.array([9.0, 1.0, 5.0])
    p = cm_prune(layers, n_layers=9)
    np.testing.assert_allclose(p[0], [0.0, 0.2, 1.0, 1.0], atol=1e-6)
    assert p[1][0] > 0.9 and p[1][1] < 0.1  # early prune ~ red


def test_pruning_plot_renders(tmp_path, rng):
    from lightglue_tpu.utils import viz
    import numpy as np

    im0 = rng.random((32, 48))
    im1 = rng.random((32, 48))
    fig, axes = viz.plot_images([im0, im1])
    k0 = rng.uniform(0, 40, (20, 2))
    k1 = rng.uniform(0, 40, (20, 2))
    viz.plot_pruning(
        axes, [k0, k1],
        [rng.integers(1, 10, 20), rng.integers(1, 10, 20)], n_layers=9,
    )
    viz.add_text(axes[0], "exit layer 5 / pruned 37%")
    out = tmp_path / "prune.png"
    viz.save_plot(fig, str(out))
    assert out.stat().st_size > 1000
