"""Smoke tests for every eval CLI `main()` arg-path.

Round-3 verdict: `eval/classifier.py train` had never been executed and the
other eval CLIs had no arg-path coverage. Each test here drives the real
argparse `main()` end-to-end on tmp fixtures (the consistency-CLI test from
round 3 is the template). Reference drivers these mirror:
evaluation/{fid.py, compute_inception_score.py, consistency.py,
train_resinet50_vg.py, test_classification_vg.py, train_att_cls.py},
PerceptualSimilarity/compute_dists_dirs.py.
"""

import json
import os
import pickle
import sys

import numpy as np
import pytest


def run_cli(monkeypatch, capsys, main_fn, argv):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    main_fn()
    lines = capsys.readouterr().out.strip().splitlines()
    return lines[-1] if lines else ""


@pytest.fixture(scope="module")
def png_dirs(tmp_path_factory):
    """Two directories of small random PNGs."""
    from PIL import Image

    rng = np.random.RandomState(0)
    dirs = []
    for name in ("a", "b"):
        d = tmp_path_factory.mktemp(f"png_{name}")
        for i in range(8):
            Image.fromarray(rng.randint(0, 255, (24, 24, 3), dtype=np.uint8)).save(
                d / f"img_{i}.png"
            )
        dirs.append(str(d))
    return dirs


@pytest.fixture(scope="module")
def pickle_dir(tmp_path_factory):
    """Handcrafted gen_pickle-format batches (eval/gen_pickle.py contract)."""
    d = tmp_path_factory.mktemp("pickles")
    rng = np.random.RandomState(1)
    b, o, h = 2, 3, 16
    for bi in range(2):
        xy0 = rng.uniform(0, 0.5, (b, o, 2)).astype(np.float32)
        wh = rng.uniform(0.2, 0.4, (b, o, 2)).astype(np.float32)
        boxes = np.concatenate([xy0, np.minimum(xy0 + wh, 1.0)], -1)
        rec = {
            "imgs": rng.randn(b, h, h, 3).astype(np.float32),
            "imgs_rand": rng.randn(b, h, h, 3).astype(np.float32),
            "imgs_shift": rng.randn(b, h, h, 3).astype(np.float32),
            "objs": rng.randint(0, 4, (b, o)).astype(np.int32),
            "boxes": boxes,
            "boxes_shift": boxes.copy(),
            "valid": np.ones((b, o), np.float32),
            "attribute": (rng.rand(b, o, 106) < 0.05).astype(np.float32),
        }
        with open(d / f"batch_{bi:05d}.pkl", "wb") as f:
            pickle.dump(rec, f)
    return str(d)


@pytest.mark.quick
def test_fid_cli(monkeypatch, capsys, png_dirs):
    from aglayout_tpu.eval.fid import main

    out = json.loads(run_cli(monkeypatch, capsys, main, [*png_dirs, "--image_size", "24"]))
    assert np.isfinite(out["fid"]) and out["fid"] >= 0


@pytest.mark.quick
def test_inception_score_cli_offline_dir(monkeypatch, capsys, png_dirs):
    from aglayout_tpu.eval.inception_score import main

    out = json.loads(run_cli(monkeypatch, capsys, main, [png_dirs[0], "--splits", "2"]))
    assert out["inception_score_mean"] >= 1.0
    assert "random-feature" in out["classifier"]


@pytest.mark.quick
def test_inception_score_cli_probs_npy(monkeypatch, capsys, tmp_path):
    from aglayout_tpu.eval.inception_score import main

    probs = np.full((30, 5), 0.2, np.float32)
    npy = tmp_path / "probs.npy"
    np.save(npy, probs)
    out = json.loads(run_cli(monkeypatch, capsys, main, [str(npy)]))
    np.testing.assert_allclose(out["inception_score_mean"], 1.0, atol=1e-5)


@pytest.mark.quick
def test_lpips_cli_random_pyramid(monkeypatch, capsys, png_dirs):
    from aglayout_tpu.eval.lpips import main

    out = json.loads(
        run_cli(monkeypatch, capsys, main, [*png_dirs, "--image_size", "24"])
    )
    assert out["pairs"] == 8 and np.isfinite(out["mean_dist"])
    assert "random-pyramid" in out["backbone"]


@pytest.mark.quick
def test_consistency_cli(monkeypatch, capsys, pickle_dir):
    from aglayout_tpu.eval.consistency import main

    out = json.loads(run_cli(monkeypatch, capsys, main, [pickle_dir]))
    for k in ("background_l1", "foreground_l1", "random_pair_l1"):
        assert np.isfinite(out[k])


# ---------------------------------------------------------------------------
# VG-backed CLIs (mini corpus through the real ETL)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vg_dir(tmp_path_factory):
    """Mini VG corpus pushed through the real ETL -> vocab.json + {train,test}.h5."""
    from PIL import Image

    from aglayout_tpu.data import preprocess_vg
    from aglayout_tpu.data.split_vg import make_splits

    root = tmp_path_factory.mktemp("vg_cli")
    img_dir = root / "images" / "VG_100K"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    names = ["tree", "car", "person", "sky"]
    atts = ["white", "red", "green"]
    images, objects, attributes, relationships = [], [], [], []
    oid = 1000
    for i in range(10):
        image_id = i + 1
        Image.fromarray(rng.randint(0, 255, (300, 400, 3), dtype=np.uint8)).save(
            img_dir / f"{image_id}.jpg"
        )
        images.append({"image_id": image_id, "width": 400, "height": 300,
                       "url": f"https://cs.stanford.edu/VG_100K/{image_id}.jpg"})
        objs, rels, att_recs = [], [], []
        for j in range(4):
            objs.append({"object_id": oid, "names": [names[(i + j) % 4]],
                         "x": 10 + 60 * j, "y": 20 + 40 * j, "w": 90, "h": 90})
            att_recs.append({"object_id": oid, "attributes": [atts[(i + j) % 3]]})
            oid += 1
        for j in range(2):
            rels.append({"relationship_id": oid * 10 + j, "predicate": "on",
                         "subject": {"object_id": objs[j]["object_id"]},
                         "object": {"object_id": objs[j + 1]["object_id"]}})
        objects.append({"image_id": image_id, "objects": objs})
        attributes.append({"image_id": image_id, "attributes": att_recs})
        relationships.append({"image_id": image_id, "relationships": rels})
    for name, data in [("image_data.json", images), ("objects.json", objects),
                       ("attributes.json", attributes),
                       ("relationships.json", relationships)]:
        with open(root / name, "w") as f:
            json.dump(data, f)
    with open(root / "vg_splits.json", "w") as f:
        json.dump(make_splits([i["image_id"] for i in images], seed=0, train_frac=0.8), f)

    args = preprocess_vg.build_parser().parse_args([
        "--splits_json", str(root / "vg_splits.json"),
        "--images_json", str(root / "image_data.json"),
        "--objects_json", str(root / "objects.json"),
        "--attributes_json", str(root / "attributes.json"),
        "--relationships_json", str(root / "relationships.json"),
        "--object_aliases", "", "--relationship_aliases", "",
        "--min_image_size", "100", "--min_object_instances", "1",
        "--min_attribute_instances", "1", "--min_object_size", "16",
        "--min_objects_per_image", "2", "--min_relationship_instances", "1",
        "--use_counted_attributes",
        "--output_vocab_json", str(root / "vocab.json"),
        "--output_h5_dir", str(root),
    ])
    preprocess_vg.main(args)
    return str(root)


@pytest.mark.slow
def test_classifier_cli_train_then_test(monkeypatch, capsys, tmp_path, vg_dir, pickle_dir):
    """The round-3 broken path: `classifier train` end-to-end, then `test`."""
    from aglayout_tpu.eval.classifier import main

    weights = tmp_path / "cls.msgpack"
    run_cli(monkeypatch, capsys, main, [
        "train", "--vg_dir", vg_dir, "--out", str(weights),
        "--image_size", "64", "--batch_size", "2", "--niter", "2",
        "--crop_size", "32",
    ])
    assert weights.exists()

    with open(os.path.join(vg_dir, "vocab.json")) as f:
        n_cls = len(json.load(f)["object_idx_to_name"])
    out = json.loads(run_cli(monkeypatch, capsys, main, [
        "test", pickle_dir, "--weights", str(weights),
        "--crop_size", "32", "--num_classes", str(n_cls),
    ]))
    for k in ("real", "rand", "shift"):
        assert 0.0 <= out[k] <= 1.0


@pytest.mark.slow
def test_train_att_cls_cli(monkeypatch, capsys, tmp_path, vg_dir):
    from aglayout_tpu.eval.train_att_cls import main

    run_cli(monkeypatch, capsys, main, [
        "--vg_dir", vg_dir, "--batch_size", "2", "--niter", "2",
        "--out_dir", str(tmp_path / "att_cls"),
    ])


# ---------------------------------------------------------------------------
# One-command report on a synthetic checkpoint
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_report_cli_on_synthetic_checkpoint(monkeypatch, capsys, tmp_path):
    import jax

    from aglayout_tpu.config import config_for
    from aglayout_tpu.eval.report import main
    from aglayout_tpu.train.loop import prepare_dirs
    from aglayout_tpu.train.state import Models, create_train_state
    from aglayout_tpu.utils.checkpoint import save_state

    cfg = config_for(64, batch_size=2, conv_dim=8, d_conv_dim=8,
                     clstm_layers=1, max_objects=3, path=str(tmp_path))
    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    dirs = prepare_dirs(cfg)
    save_state(dirs["models"], 7, state)

    run_cli(monkeypatch, capsys, main, [
        "--image_size", "64", "--batch_size", "2", "--path", str(tmp_path),
        "--synthetic", "--max_batches", "1",
        "--conv_dim", "8", "--d_conv_dim", "8",
        "--clstm_layers", "1", "--max_objects", "3",
        "--out_dir", str(tmp_path / "report"),
    ])
    with open(tmp_path / "report" / "report.json") as f:
        out = json.load(f)
    assert np.isfinite(out["fid"]["rand"]) and np.isfinite(out["fid"]["shift"])
    assert out["inception_score"]["mean"] >= 1.0
    assert "random-feature" in out["inception_score"]["classifier"]
    assert np.isfinite(out["lpips_diversity"]["mean"])
    for k in ("background_l1", "foreground_l1", "random_pair_l1"):
        assert np.isfinite(out["consistency"][k])
    assert "attributes" in out
    assert os.path.exists(tmp_path / "report" / "report.json")
