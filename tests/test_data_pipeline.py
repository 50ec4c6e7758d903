"""End-to-end data layer test: synthetic VG JSON -> ETL h5 -> runtime batches."""

import json
import os

import numpy as np
import pytest

from aglayout_tpu.data import preprocess_vg
from aglayout_tpu.data.cooccurrence import build_matrix
from aglayout_tpu.data.dataset import Loader, VgDataset
from aglayout_tpu.data.split_vg import make_splits

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def vg_dir(tmp_path_factory):
    """Builds a miniature Visual Genome corpus: JSON + images."""
    from PIL import Image

    root = tmp_path_factory.mktemp("vg")
    img_dir = root / "images" / "VG_100K"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)

    n_images = 12
    images, objects, attributes, relationships = [], [], [], []
    names = ["tree", "car", "person", "sky"]
    atts = ["white", "tile", "wooden", "red", "green"]
    oid = 1000
    for i in range(n_images):
        image_id = i + 1
        w, h = 400, 300
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
            img_dir / f"{image_id}.jpg"
        )
        images.append(
            {
                "image_id": image_id,
                "width": w,
                "height": h,
                "url": f"https://cs.stanford.edu/VG_100K/{image_id}.jpg",
            }
        )
        objs, rels, att_recs = [], [], []
        n_obj = 4
        for j in range(n_obj):
            objs.append(
                {
                    "object_id": oid,
                    "names": [names[(i + j) % len(names)]],
                    "x": 10 + 50 * j,
                    "y": 20 + 40 * j,
                    "w": 80,
                    "h": 90,
                }
            )
            att_recs.append(
                {"object_id": oid, "attributes": [atts[(i + j) % len(atts)]]}
            )
            oid += 1
        for j in range(2):
            rels.append(
                {
                    "relationship_id": oid * 10 + j,
                    "predicate": "on",
                    "subject": {"object_id": objs[j]["object_id"]},
                    "object": {"object_id": objs[j + 1]["object_id"]},
                }
            )
        objects.append({"image_id": image_id, "objects": objs})
        attributes.append({"image_id": image_id, "attributes": att_recs})
        relationships.append({"image_id": image_id, "relationships": rels})

    for name, data in [
        ("image_data.json", images),
        ("objects.json", objects),
        ("attributes.json", attributes),
        ("relationships.json", relationships),
    ]:
        with open(root / name, "w") as f:
            json.dump(data, f)
    with open(root / "vg_splits.json", "w") as f:
        json.dump(make_splits([i["image_id"] for i in images], seed=0, train_frac=0.67), f)
    return str(root)


def test_etl_and_runtime_pipeline(vg_dir):
    parser = preprocess_vg.build_parser()
    args = parser.parse_args(
        [
            "--splits_json", os.path.join(vg_dir, "vg_splits.json"),
            "--images_json", os.path.join(vg_dir, "image_data.json"),
            "--objects_json", os.path.join(vg_dir, "objects.json"),
            "--attributes_json", os.path.join(vg_dir, "attributes.json"),
            "--relationships_json", os.path.join(vg_dir, "relationships.json"),
            "--object_aliases", "",
            "--relationship_aliases", "",
            "--min_image_size", "100",
            "--min_object_instances", "1",
            "--min_attribute_instances", "1",
            "--min_object_size", "16",
            "--min_objects_per_image", "2",
            "--min_relationship_instances", "1",
            "--use_counted_attributes",
            "--output_vocab_json", os.path.join(vg_dir, "vocab.json"),
            "--output_h5_dir", vg_dir,
        ]
    )
    preprocess_vg.main(args)

    with open(os.path.join(vg_dir, "vocab.json")) as f:
        vocab = json.load(f)
    assert vocab["object_idx_to_name"][0] == "__image__"
    assert len(vocab["object_idx_to_name"]) >= 4
    assert len(vocab["attribute_idx_to_name"]) == 5
    assert vocab["pred_idx_to_name"][0] == "__in_image__"

    import h5py

    with h5py.File(os.path.join(vg_dir, "train.h5")) as f:
        for key in [
            "image_ids", "object_ids", "object_names", "object_boxes",
            "objects_per_image", "relationship_ids", "relationship_subjects",
            "relationship_predicates", "relationship_objects",
            "relationships_per_image", "attributes_per_object",
            "object_attributes", "image_paths",
        ]:
            assert key in f, key
        assert f["object_attributes"].shape[2] == 30

    # runtime loader: dense padded contract
    ds = VgDataset(
        os.path.join(vg_dir, "train.h5"),
        os.path.join(vg_dir, "images"),
        vocab,
        image_size=64,
        max_objects=6,
        attribute_dim=5,
    )
    assert len(ds) > 0
    loader = Loader(ds, batch_size=2, shuffle=True, seed=0, num_threads=2)
    batch = next(iter(loader))
    assert batch["imgs"].shape == (2, 64, 64, 3)
    assert batch["objs"].shape == (2, 6)
    assert batch["boxes"].shape == (2, 6, 4)
    assert batch["masks"].shape == (2, 6, 64, 64, 1)
    assert batch["attribute"].shape == (2, 6, 5)
    assert batch["valid"].sum() > 0
    # masks nonzero exactly for valid objects with nonzero area
    v = batch["valid"] > 0
    area = batch["masks"].sum((2, 3, 4))
    assert np.all(area[~v] == 0)
    assert np.all(area[v] > 0)
    # boxes normalized
    assert batch["boxes"].min() >= 0 and batch["boxes"].max() <= 1
    # deterministic given seed
    batch2 = next(iter(Loader(ds, batch_size=2, shuffle=True, seed=0, num_threads=2)))
    np.testing.assert_array_equal(batch["objs"], batch2["objs"])

    # co-occurrence builder
    m = build_matrix(os.path.join(vg_dir, "train.h5"), len(vocab["object_idx_to_name"]), 5)
    assert m.sum() > 0


def test_native_batch_equals_numpy_batch(vg_dir):
    """Native per-batch assembly == pure-numpy per-sample assembly."""
    import json as _json

    from aglayout_tpu.data import native

    if native.load_lib() is None:
        pytest.skip("native lib not built")
    with open(os.path.join(vg_dir, "vocab.json")) as f:
        vocab = _json.load(f)
    ds = VgDataset(
        os.path.join(vg_dir, "train.h5"),
        os.path.join(vg_dir, "images"),
        vocab,
        image_size=64,
        max_objects=6,
        attribute_dim=5,
    )
    rng1 = np.random.RandomState(7)
    rng2 = np.random.RandomState(7)
    idxs = [0, 1, min(2, len(ds) - 1)]
    numpy_samples = [ds.sample(i, rng1) for i in idxs]
    metas = [ds.sample_meta(i, rng2) for i in idxs]
    b, o, size = len(idxs), ds.o_max, ds.image_size
    boxes_px = np.stack([m["boxes_px"] for m in metas]).reshape(b * o, 4)
    att_ids = np.stack([m["att_ids"] for m in metas]).reshape(b * o, -1)
    valid = np.stack([m["valid"] for m in metas]).reshape(b * o)
    img_w = np.repeat([m["img_w"] for m in metas], o)
    img_h = np.repeat([m["img_h"] for m in metas], o)
    boxes, boxes_s, masks, masks_s, attribute = native.assemble_objects(
        boxes_px, img_w, img_h, att_ids, valid, ds.attribute_dim, size
    )
    ref = {k: np.stack([s[k] for s in numpy_samples]) for k in numpy_samples[0]}
    np.testing.assert_allclose(boxes.reshape(b, o, 4), ref["boxes"], atol=1e-6)
    np.testing.assert_allclose(boxes_s.reshape(b, o, 4), ref["boxes_shift"], atol=1e-6)
    np.testing.assert_array_equal(masks.reshape(b, o, size, size, 1), ref["masks"])
    np.testing.assert_array_equal(masks_s.reshape(b, o, size, size, 1), ref["masks_shift"])
    np.testing.assert_array_equal(attribute.reshape(b, o, -1), ref["attribute"])
