"""Network-gated golden tests against REAL reference artifacts.

This environment has zero egress, so these tests skip unless the reference
HF dataset (vlongle/pixie) has been synced locally with
``python scripts/download_data.py --local-dir data`` (or PIXIE_DATA_DIR
points at an existing sync).  When artifacts are present they assert the
BASELINE fidelity bar: a real torch ``epoch_*.pth`` U-Net pair, run through
the converter (models/convert_torch.py) and CombinedInference on the real
``clip_features_features.npy``, reproduces the reference's
``sample_0_pred.npy`` (reference inference_combined.py save_predictions:
173-217 — 3 continuous channels + one-hot class map) with a bit-consistent
class map and close continuous channels.
"""

import os
from pathlib import Path

import numpy as np
import pytest

DATA_ROOT = Path(os.environ.get("PIXIE_DATA_DIR",
                                Path(__file__).parent.parent / "data"))


def _find(pattern: str):
    return sorted(DATA_ROOT.rglob(pattern)) if DATA_ROOT.exists() else []


def _require(pattern: str):
    hits = _find(pattern)
    if not hits:
        pytest.skip(f"no {pattern} under {DATA_ROOT} (zero-egress env; run "
                    "scripts/download_data.py first)")
    return hits


def discover_golden_case(root: Path):
    """Locate one object with features + a reference prediction, and the
    matching discrete/continuous torch checkpoints, under a
    ``scripts/download_data.py`` sync tree.  Returns (obj_dir, pred_path,
    seg_ckpt, cont_ckpt) or a skip-reason string."""
    def find(pattern):
        return sorted(root.rglob(pattern)) if root.exists() else []

    preds = find("sample_0_pred.npy")
    if not preds:
        return (f"no sample_0_pred.npy under {root} (zero-egress env; run "
                "scripts/download_data.py first)")
    case = None
    for pred in preds:
        obj_dir = pred.parent.parent if pred.parent.name.startswith(
            "sample_") else pred.parent
        feat = obj_dir / "clip_features_features.npy"
        if feat.exists():
            case = (obj_dir, pred)
            break
    if case is None:
        return ("predictions found but no matching "
                "clip_features_features.npy next to them")

    ckpts = find("epoch_*.pth")
    seg_ckpts = [p for p in ckpts
                 if "discrete" in str(p).lower() or "seg" in str(p).lower()]
    cont_ckpts = [p for p in ckpts
                  if "continuous" in str(p).lower() or "cont" in str(p).lower()]
    if not seg_ckpts or not cont_ckpts:
        return "no discrete/continuous epoch_*.pth checkpoint pair"
    return case[0], case[1], seg_ckpts[-1], cont_ckpts[-1]


@pytest.fixture(scope="module")
def golden_case():
    got = discover_golden_case(DATA_ROOT)
    if isinstance(got, str):
        pytest.skip(got)
    return got


def test_discovery_finds_synced_fixtures(tmp_path):
    """NOT network-gated: the discovery logic locates fixtures laid out the
    way scripts/download_data.py syncs them (r4 verdict item 8 — golden-
    parity readiness must be provable before egress exists)."""
    obj = tmp_path / "render_outputs" / "some_object"
    (obj / "sample_0").mkdir(parents=True)
    np.save(obj / "sample_0" / "sample_0_pred.npy", np.zeros((11, 4, 4, 4)))
    np.save(obj / "clip_features_features.npy",
            np.zeros((4, 4, 4, 8), np.float16))
    seg = tmp_path / "checkpoints_discrete"
    cont = tmp_path / "checkpoints_continuous"
    seg.mkdir(); cont.mkdir()
    (seg / "epoch_100.pth").write_bytes(b"x")
    (cont / "epoch_100.pth").write_bytes(b"x")

    got = discover_golden_case(tmp_path)
    assert not isinstance(got, str), got
    obj_dir, pred, seg_ck, cont_ck = got
    assert obj_dir == obj and pred.name == "sample_0_pred.npy"
    assert "discrete" in str(seg_ck) and "continuous" in str(cont_ck)
    # and the skip path reports a clear reason on an empty tree
    assert isinstance(discover_golden_case(tmp_path / "nope"), str)


def test_real_checkpoint_reproduces_reference_prediction(golden_case):
    from pixie_tpu.train.data import MaterialVoxelDataset
    from pixie_tpu.train.inference import CombinedInference, load_params
    from pixie_tpu.utils.norm import load_normalization_ranges

    obj_dir, pred_path, seg_ckpt, cont_ckpt = golden_case
    ref = np.load(pred_path)  # (3+K, D, H, W)
    n_classes = ref.shape[0] - 3

    ranges = load_normalization_ranges(
        Path(__file__).parent.parent / "normalization_stats"
        / "normalization_ranges.yaml")
    ds = MaterialVoxelDataset(obj_dir.parent, ranges, grid_size=ref.shape[1])
    idx = [i for i, s in enumerate(ds.samples) if s.obj_id == obj_dir.name]
    if not idx:
        pytest.skip(f"{obj_dir.name} failed dataset validation")
    feat = ds[idx[0]][0][None]  # (1, D, H, W, C)

    inf = CombinedInference(
        load_params(str(seg_ckpt)), load_params(str(cont_ckpt)),
        grid_size=ref.shape[1], num_classes=n_classes,
    )
    seg_logits, cont = inf.predict(feat)
    got = inf.combined_prediction(seg_logits[0], cont[0])

    # class map must match bit-consistently (BASELINE: same argmax labels)
    ref_cls = np.argmax(ref[3:], axis=0)
    got_cls = np.argmax(got[3:], axis=0)
    mismatch = (ref_cls != got_cls).mean()
    assert mismatch == 0.0, f"class map differs on {mismatch:.2%} of voxels"
    # continuous channels numerically close (bf16 inference vs torch fp32)
    np.testing.assert_allclose(got[:3], ref[:3], atol=2e-2, rtol=2e-2)


def test_real_f3rm_field_voxelizes(tmp_path):
    """Gated: a real f3rm/tcnn checkpoint loads through the compat layer and
    produces a finite occupancy funnel (reference f3rm_robot/load.py:136-169)."""
    ckpts = _require("step-*.ckpt")
    from pixie_tpu.recon.tcnn_compat import (TcnnFieldAdapter,
                                             load_f3rm_checkpoint)

    fields = load_f3rm_checkpoint(str(ckpts[0]))
    adapter = TcnnFieldAdapter(fields)
    pts = np.random.default_rng(0).uniform(-0.5, 0.5, (1024, 3)).astype(
        np.float32)
    out = adapter.query(pts)
    assert np.isfinite(np.asarray(out["density"])).all()
    assert out["feature"].shape[-1] == 768
