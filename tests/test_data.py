"""Data pipeline tests (reference model: tests/test_data.py)."""

from pathlib import Path

import numpy as np
import pytest

from yolo_re_tpu.data.augment import (
    augment_hsv,
    letterbox,
    xywhn2xyxy,
    xyxy2xywhn,
)
from yolo_re_tpu.data.config import AugmentConfig, CacheMode, DataConfig
from yolo_re_tpu.data.dataset import DataLoader, YOLODataset, to_tensor
from yolo_re_tpu.data.transforms import (
    HSV,
    Letterbox,
    Mosaic,
    RandomFlip,
    Sample,
    default_train_transforms,
)


def test_coord_roundtrip():
    xywhn = np.array([[0.5, 0.5, 0.2, 0.4]], np.float32)
    xyxy = xywhn2xyxy(xywhn, 100, 200)
    np.testing.assert_allclose(xyxy, [[40, 60, 60, 140]])
    back = xyxy2xywhn(xyxy, 100, 200)
    np.testing.assert_allclose(back, xywhn, atol=1e-6)


def test_letterbox_shapes():
    img = np.zeros((100, 200, 3), np.uint8)
    out, ratio, pad = letterbox(img, 640)
    assert out.shape == (640, 640, 3)
    assert ratio == (3.2, 3.2)
    out, _, _ = letterbox(img, 640, auto=True, stride=32)
    assert out.shape[1] == 640
    assert out.shape[0] % 32 == 0


def test_hsv_zero_gain_identity():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    orig = img.copy()
    augment_hsv(img, 0, 0, 0, rng)
    np.testing.assert_array_equal(img, orig)


def test_hsv_range():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    augment_hsv(img, 0.015, 0.7, 0.4, rng)
    assert img.dtype == np.uint8


def test_flip_deterministic():
    img = np.zeros((10, 10, 3), np.uint8)
    img[:, :5] = 255  # left half white
    labels = np.array([[0, 0.25, 0.5, 0.5, 1.0]], np.float32)
    flip = RandomFlip(flip_lr=1.0, flip_ud=0.0)
    out = flip(Sample(img, labels, 10), np.random.default_rng(0))
    assert out.img[0, 0, 0] == 0       # left now black
    assert out.img[0, -1, 0] == 255    # right now white
    np.testing.assert_allclose(out.labels[0, 1], 0.75)


def test_dataset_loading(synthetic_dataset):
    ds = YOLODataset(synthetic_dataset, img_size=64)
    assert len(ds) == 8
    img, labels, hw = ds.load_raw(0)
    assert img.ndim == 3
    assert labels.shape[1] == 5
    assert max(img.shape[:2]) == 64


def test_dataset_cache_roundtrip(synthetic_dataset):
    ds1 = YOLODataset(synthetic_dataset, img_size=64)
    ds2 = YOLODataset(synthetic_dataset, img_size=64)  # from cache file
    for a, b in zip(ds1.labels, ds2.labels):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(ds1.shapes, ds2.shapes)


def test_dataset_ram_cache(synthetic_dataset):
    ds = YOLODataset(synthetic_dataset, img_size=64, cache=CacheMode.RAM)
    ds.load_raw(0)
    assert 0 in ds._ram_cache


def test_mosaic_output(synthetic_dataset):
    ds = YOLODataset(synthetic_dataset, img_size=64)
    mosaic = Mosaic(ds, img_size=64, prob=1.0, scale=0.5)
    img, labels, hw = ds.load_raw(0)
    out = mosaic(Sample(img, labels, 64), np.random.default_rng(0))
    assert out.img.shape == (64, 64, 3)
    # mosaic path outputs xyxy pixel labels
    if len(out.labels):
        assert out.labels[:, 1:5].max() <= 64 + 1e-3


def test_mosaic_skip_path(synthetic_dataset):
    ds = YOLODataset(synthetic_dataset, img_size=64)
    mosaic = Mosaic(ds, img_size=64, prob=0.0)
    img, labels, hw = ds.load_raw(0)
    out = mosaic(Sample(img, labels, 64), np.random.default_rng(0))
    assert out.img.shape == (64, 64, 3)
    if len(out.labels):
        assert out.labels[:, 1:5].max() > 1.5  # pixel coords


def test_full_train_pipeline(synthetic_dataset):
    ds = YOLODataset(synthetic_dataset, img_size=64, augment=True)
    ds.transforms = default_train_transforms(ds, 64, AugmentConfig("full"))
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s.img.shape == (64, 64, 3)
    if len(s.labels):  # back to normalized
        assert s.labels[:, 1:5].max() <= 1.0 + 1e-6
        assert s.labels[:, 1:5].min() >= -1e-6


def test_to_tensor():
    img = np.full((4, 4, 3), 255, np.uint8)
    img[..., 0] = 0  # B=0 in BGR
    t = to_tensor(Sample(img, np.zeros((0, 5), np.float32), 4))
    assert t.shape == (4, 4, 3)
    assert t.dtype == np.float32
    assert t[0, 0, 2] == 0.0  # B channel moved to last in RGB
    assert t[0, 0, 0] == 1.0


def test_dataloader_batches(synthetic_dataset):
    ds = YOLODataset(synthetic_dataset, img_size=64)
    ds.transforms = None
    from yolo_re_tpu.data.transforms import default_val_transforms
    ds.transforms = default_val_transforms(64)
    loader = DataLoader(ds, batch_size=4, max_boxes=16, workers=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (4, 64, 64, 3)
    assert b["targets"].shape == (4, 16, 5)
    assert b["nboxes"].shape == (4,)
    assert b["nboxes"].max() >= 1


def test_dataloader_deterministic(synthetic_dataset):
    ds = YOLODataset(synthetic_dataset, img_size=64, augment=True)
    ds.transforms = default_train_transforms(ds, 64, AugmentConfig("full"))
    loader = DataLoader(ds, batch_size=4, max_boxes=16, shuffle=True,
                        workers=2)
    b1 = next(iter(loader))
    b2 = next(iter(loader))
    np.testing.assert_array_equal(b1["images"], b2["images"])
    loader.set_epoch(1)
    b3 = next(iter(loader))
    assert not np.array_equal(b1["images"], b3["images"])


def test_rect_mode(synthetic_dataset):
    ds = YOLODataset(synthetic_dataset, img_size=64, rect=True, batch_size=4)
    ar = ds.shapes[:, 0] / ds.shapes[:, 1]
    assert np.all(np.diff(ar) >= 0)  # sorted by aspect ratio
    assert ds.batch_shapes.shape == (2, 2)
    assert np.all(ds.batch_shapes % ds.stride == 0)


def test_augment_config_presets():
    full = AugmentConfig("full")
    assert full.mosaic == 1.0 and full.mixup == 0.15 and full.scale == 0.9
    light = AugmentConfig("light", mosaic=0.9)
    assert light.mosaic == 0.9 and light.mixup == 0.0
    with pytest.raises(ValueError):
        AugmentConfig("nope")


# The reference's preset table verbatim (src/yolo/data/config.py:24-73),
# with its flipud/fliplr spelled flip_ud/flip_lr here. Every geometric/HSV
# field of every preset must match — fine-tuning with any preset has to
# produce the reference's augmentation distribution.
_REFERENCE_PRESETS = {
    "full": dict(mosaic=1.0, mosaic_scale=(0.5, 1.5), mixup=0.15,
                 hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, degrees=0.0,
                 translate=0.1, scale=0.9, shear=0.0, perspective=0.0,
                 flip_ud=0.0, flip_lr=0.5),
    "light": dict(mosaic=0.5, mosaic_scale=(0.8, 1.2), mixup=0.0,
                  hsv_h=0.01, hsv_s=0.5, hsv_v=0.3, degrees=0.0,
                  translate=0.1, scale=0.5, shear=0.0, perspective=0.0,
                  flip_ud=0.0, flip_lr=0.5),
    "minimal": dict(mosaic=0.0, mosaic_scale=(1.0, 1.0), mixup=0.0,
                    hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, degrees=0.0,
                    translate=0.0, scale=0.0, shear=0.0, perspective=0.0,
                    flip_ud=0.0, flip_lr=0.5),
}


@pytest.mark.parametrize("preset", ["full", "light", "minimal"])
def test_augment_presets_match_reference_field_by_field(preset):
    cfg = AugmentConfig(preset)
    for name, want in _REFERENCE_PRESETS[preset].items():
        got = getattr(cfg, name)
        assert tuple(got) == want if isinstance(want, tuple) else got == want, \
            f"{preset}.{name}: ours {got!r} != reference {want!r}"


def test_data_config_yaml(tmp_path):
    p = tmp_path / "d.yaml"
    p.write_text("train: /x/images\nval: /y/images\nnc: 3\nimg_size: 320\n")
    cfg = DataConfig.from_yaml(p)
    assert cfg.train_path == "/x/images"
    assert cfg.num_classes == 3
    assert cfg.img_size == 320


def test_rect_loader_batches(synthetic_dataset):
    """Rect mode: per-batch stride-aligned shapes, labels letterboxed."""
    ds = YOLODataset(synthetic_dataset, img_size=64, rect=True, batch_size=4)
    loader = DataLoader(ds, batch_size=4, max_boxes=16, shuffle=False,
                        workers=2)
    batches = list(loader)
    assert len(batches) == 2
    for bi, b in enumerate(batches):
        h, w = b["images"].shape[1:3]
        assert h % ds.stride == 0 and w % ds.stride == 0
        expect = ds.batch_shapes[bi]
        assert (h, w) == (expect[0], expect[1])
        # labels normalized to the rect canvas
        n = int(b["nboxes"].max())
        assert n >= 1
        assert b["targets"][..., 1:5].max() <= 1.0 + 1e-6


def _write_voc_xml(path, w, h, objects):
    """objects: list of (name, xmin, ymin, xmax, ymax, difficult)."""
    objs = "".join(
        f"<object><name>{n}</name><difficult>{d}</difficult>"
        f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
        f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>"
        for n, x1, y1, x2, y2, d in objects)
    path.write_text(
        f"<annotation><size><width>{w}</width><height>{h}</height>"
        f"<depth>3</depth></size>{objs}</annotation>")


def test_voc_xml_to_yolo(tmp_path):
    from yolo_re_tpu.data.voc import voc_xml_to_yolo

    xml = tmp_path / "a.xml"
    _write_voc_xml(xml, 200, 100, [
        ("dog", 50, 25, 150, 75, 0),      # center (100,50), size (100,50)
        ("cat", 0, 0, 20, 20, 1),         # difficult -> skipped
        ("unicorn", 0, 0, 20, 20, 0),     # unknown class -> skipped
    ])
    lines = voc_xml_to_yolo(xml)
    assert len(lines) == 1
    cls, xc, yc, w, h = lines[0].split()
    assert int(cls) == 11  # dog
    np.testing.assert_allclose(
        [float(xc), float(yc), float(w), float(h)], [0.5, 0.5, 0.5, 0.5])
    assert len(voc_xml_to_yolo(xml, keep_difficult=True)) == 2


def test_convert_voc_devkit(tmp_path):
    from yolo_re_tpu.data.voc import convert_voc_devkit

    devkit = tmp_path / "VOCdevkit"
    for year, ids in (("VOC2007", ["000001", "000002"]),
                      ("VOC2012", ["2012_001"])):
        (devkit / year / "JPEGImages").mkdir(parents=True)
        (devkit / year / "Annotations").mkdir(parents=True)
        for img_id in ids:
            (devkit / year / "JPEGImages" / f"{img_id}.jpg").write_bytes(b"x")
            _write_voc_xml(devkit / year / "Annotations" / f"{img_id}.xml",
                           100, 100, [("person", 10, 10, 90, 90, 0)])
    main_dir = devkit / "VOC2007" / "ImageSets" / "Main"
    main_dir.mkdir(parents=True)
    (main_dir / "test.txt").write_text("000002\n")  # -> val split

    out = tmp_path / "voc"
    train_dir, val_dir = convert_voc_devkit(devkit, out)
    train_imgs = sorted(p.name for p in Path(train_dir).glob("*.jpg"))
    val_imgs = sorted(p.name for p in Path(val_dir).glob("*.jpg"))
    assert train_imgs == ["000001.jpg", "2012_001.jpg"]
    assert val_imgs == ["000002.jpg"]
    assert (out / "labels" / "train" / "000001.txt").exists()
    assert (out / "labels" / "val" / "000002.txt").exists()
    label = (out / "labels" / "val" / "000002.txt").read_text().split()
    assert label[0] == "14"  # person
