"""Schedule / optimizer / EMA / checkpoint / trainer tests
(reference model: tests/test_train.py, plus the trainer integration smoke
test SURVEY §4 says the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_re_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from yolo_re_tpu.train.config import TrainConfig
from yolo_re_tpu.train.ema import ema_update, init_ema
from yolo_re_tpu.train.optimizer import (
    clip_by_global_norm,
    init_sgd_state,
    sgd_step,
)
from yolo_re_tpu.train.schedule import WarmupCosineSchedule, one_cycle_lr


def test_train_config_defaults():
    cfg = TrainConfig()
    assert cfg.epochs == 100
    assert cfg.lr == 0.01
    assert cfg.momentum == 0.937
    assert cfg.weight_decay == 0.0005
    assert cfg.warmup_epochs == 3.0
    assert cfg.lrf == 0.01


def test_schedule_warmup_trajectory():
    sched = WarmupCosineSchedule(base_lr=0.01, total_steps=1000,
                                 warmup_steps=100)
    # quirk: step 0 = base values (reference steps scheduler after optimizer)
    tol = 1e-5
    lr0, bias0, m0 = (float(v) for v in sched(0))
    assert abs(lr0 - 0.01) < tol and abs(m0 - 0.937) < tol
    lr, bias, m = (float(v) for v in sched(50))
    assert abs(lr - 0.005) < tol
    assert abs(bias - (0.1 + (0.01 - 0.1) * 0.5)) < tol
    assert abs(m - (0.8 + (0.937 - 0.8) * 0.5)) < tol
    lr, bias, m = (float(v) for v in sched(100))
    assert abs(lr - 0.01) < tol and abs(m - 0.937) < tol


def test_schedule_cosine_decay_monotone():
    sched = WarmupCosineSchedule(base_lr=0.01, total_steps=1000,
                                 warmup_steps=100, lrf=0.01)
    lrs = [float(sched(s)[0]) for s in range(101, 1000, 100)]
    assert all(a >= b for a, b in zip(lrs, lrs[1:]))
    final = float(sched(1000)[0])
    assert abs(final - 0.01 * 0.01) < 1e-6


def test_one_cycle_endpoints():
    assert abs(one_cycle_lr(0, 100) - 1.0) < 1e-9
    assert abs(one_cycle_lr(100, 100) - 0.01) < 1e-9


def test_sgd_matches_torch_semantics():
    # p=1, g=1, wd=0.1, m=0.9, lr=0.1:
    # g' = 1 + 0.1*1 = 1.1; buf = 1.1; p = 1 - 0.11 = 0.89
    params = {"w": jnp.ones(())}
    grads = {"w": jnp.ones(())}
    bufs = init_sgd_state(params)
    labels = {"w": "weight"}
    p, b = sgd_step(params, grads, bufs, labels, lr=0.1, bias_lr=0.1,
                    momentum=0.9, weight_decay=0.1)
    assert abs(float(p["w"]) - 0.89) < 1e-6
    # second step: buf = 0.9*1.1 + (1 + 0.1*0.89) = 2.079; p = 0.89 - 0.2079
    p, b = sgd_step(p, grads, b, labels, lr=0.1, bias_lr=0.1,
                    momentum=0.9, weight_decay=0.1)
    assert abs(float(p["w"]) - (0.89 - 0.2079)) < 1e-6


def test_sgd_group_lrs():
    params = {"w": jnp.ones(()), "bias": jnp.ones(())}
    grads = {"w": jnp.ones(()), "bias": jnp.ones(())}
    labels = {"w": "weight", "bias": "bias"}
    p, _ = sgd_step(params, grads, init_sgd_state(params), labels,
                    lr=0.0, bias_lr=1.0, momentum=0.0, weight_decay=0.0)
    assert float(p["w"]) == 1.0     # lr 0
    assert float(p["bias"]) == 0.0  # bias lr 1


def test_clip_by_global_norm():
    grads = {"a": jnp.full((4,), 10.0)}
    clipped, norm = clip_by_global_norm(grads, 1.0)
    assert abs(float(norm) - 20.0) < 1e-4
    assert abs(float(jnp.linalg.norm(clipped["a"])) - 1.0) < 1e-3


def test_ema_ramp():
    params = {"w": jnp.zeros(())}
    stats = {"m": jnp.zeros(())}
    ema = init_ema(params, stats)
    new_params = {"w": jnp.ones(())}
    ema = ema_update(ema, new_params, stats, decay=0.9999, tau=2000)
    d = 0.9999 * (1 - np.exp(-1 / 2000))
    assert abs(float(ema["params"]["w"]) - (1 - d)) < 1e-5
    assert int(ema["updates"]) == 1


def test_checkpoint_roundtrip(tmp_path):
    params = {"layer": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    stats = {"layer": {"mean": np.ones(3, np.float32)}}
    ema = {"params": params, "stats": stats,
           "updates": np.int32(7)}
    bufs = {"layer": {"w": np.zeros((2, 3), np.float32)}}
    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, params=params, stats=stats, ema=ema, opt_bufs=bufs,
                    epoch=3, global_step=42, best_fitness=0.5,
                    config={"lr": 0.01})
    ckpt = load_checkpoint(path)
    np.testing.assert_array_equal(ckpt["params"]["layer"]["w"],
                                  params["layer"]["w"])
    assert ckpt["epoch"] == 3
    assert ckpt["global_step"] == 42
    assert ckpt["best_fitness"] == 0.5
    assert int(ckpt["ema"]["updates"]) == 7
    assert ckpt["config"]["lr"] == 0.01


def test_checkpoint_roundtrip_orbax(tmp_path):
    """Same contract through the orbax (directory) backend; load_checkpoint
    auto-detects the format."""
    from yolo_re_tpu.train.checkpoint import save_checkpoint_orbax

    params = {"layer": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    stats = {"layer": {"mean": np.ones(3, np.float32)}}
    ema = {"params": params, "stats": stats, "updates": np.int32(7)}
    bufs = {"layer": {"w": np.zeros((2, 3), np.float32)}}
    path = tmp_path / "ckpt"
    save_checkpoint_orbax(path, params=params, stats=stats, ema=ema,
                          opt_bufs=bufs, epoch=3, global_step=42,
                          best_fitness=0.5, config={"lr": 0.01})
    ckpt = load_checkpoint(path)
    np.testing.assert_array_equal(ckpt["params"]["layer"]["w"],
                                  params["layer"]["w"])
    assert (ckpt["epoch"], ckpt["global_step"]) == (3, 42)
    assert int(ckpt["ema"]["updates"]) == 7
    assert ckpt["config"]["lr"] == 0.01


def test_trainer_loss_decreases(tiny_model_path, synthetic_dataset):
    """Integration smoke: a few steps of real training reduce the loss
    (the test SURVEY §4 notes the reference lacks)."""
    from yolo_re_tpu.data.config import AugmentConfig, DataConfig
    from yolo_re_tpu.data.dataset import create_dataloader
    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.train.trainer import Trainer

    model = YOLO.from_yaml(tiny_model_path)
    data = DataConfig(train_path=synthetic_dataset, num_classes=8,
                      img_size=64, batch_size=4, workers=2, max_boxes=16,
                      augment=AugmentConfig("minimal"))
    trainer = Trainer(model, data=data, epochs=10, data_parallel=False,
                      warmup_epochs=0.0, lr=0.05,
                      output_dir="/tmp/yolo_tpu_test_run")
    first = trainer.train_one_epoch(0)
    for e in range(1, 10):
        last = trainer.train_one_epoch(e)
    assert np.all(np.isfinite(last))
    assert last.sum() < first.sum()


def test_trainer_device_augment(tiny_model_path, synthetic_dataset):
    """Device-side HSV/flip path: one epoch runs, host aug stages zeroed."""
    from yolo_re_tpu.data.config import AugmentConfig, DataConfig
    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.train.trainer import Trainer

    model = YOLO.from_yaml(tiny_model_path)
    data = DataConfig(train_path=synthetic_dataset, num_classes=8,
                      img_size=64, batch_size=4, workers=2, max_boxes=16,
                      augment=AugmentConfig("full"))
    trainer = Trainer(model, data=data, epochs=1, data_parallel=False,
                      device_augment=True,
                      output_dir="/tmp/yolo_tpu_test_devaug")
    assert trainer._device_aug is not None
    assert trainer._device_aug["flip_lr"] == 0.5
    items = trainer.train_one_epoch(0)
    import numpy as np
    assert np.all(np.isfinite(items))


def test_trainer_device_augment_full(tiny_model_path, synthetic_dataset):
    """device_augment='full': mosaic/zoom/mixup/HSV/flip all inside the
    jitted step; host pipeline reduced to decode + letterbox."""
    from yolo_re_tpu.data.config import AugmentConfig, DataConfig
    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.train.trainer import Trainer

    model = YOLO.from_yaml(tiny_model_path)
    data = DataConfig(train_path=synthetic_dataset, num_classes=8,
                      img_size=64, batch_size=4, workers=2, max_boxes=16,
                      augment=AugmentConfig("full"))
    trainer = Trainer(model, data=data, epochs=1, data_parallel=False,
                      device_augment="full",
                      output_dir="/tmp/yolo_tpu_test_devaug_full")
    assert trainer._device_aug_full
    assert trainer._device_aug["mosaic_p"] == 1.0
    # host pipeline must have its heavy stages zeroed (no double mosaic)
    host_stages = trainer.train_loader.dataset.transforms.transforms
    mosaic = next(t for t in host_stages if type(t).__name__ == "Mosaic")
    mixup = next(t for t in host_stages if type(t).__name__ == "MixUp")
    assert mosaic.prob == 0.0 and mixup.prob == 0.0
    items = trainer.train_one_epoch(0)
    import numpy as np
    assert np.all(np.isfinite(items))


def test_trainer_dual_head(tiny_dual_model_path, synthetic_dataset):
    """Dual-head training end-to-end: aux weighted loss, one epoch runs
    (BASELINE config #5 smoke)."""
    from yolo_re_tpu.data.config import AugmentConfig, DataConfig
    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.train.trainer import Trainer

    model = YOLO.from_yaml(tiny_dual_model_path)
    data = DataConfig(train_path=synthetic_dataset, num_classes=8,
                      img_size=64, batch_size=4, workers=2, max_boxes=16,
                      augment=AugmentConfig("minimal"))
    trainer = Trainer(model, data=data, epochs=1, data_parallel=False,
                      output_dir="/tmp/yolo_tpu_test_dual")
    assert trainer.is_dual
    items = trainer.train_one_epoch(0)
    assert np.all(np.isfinite(items))


def test_trainer_optimizer_injection_optax(tiny_model_path,
                                           synthetic_dataset):
    """The reference Trainer accepts a user optimizer (trainer.py:120-132;
    its Modal path trains with plain Adam, train_modal.py:514). Here the
    analogue is an optax GradientTransformation."""
    import optax

    from yolo_re_tpu.data.config import AugmentConfig, DataConfig
    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.train.trainer import Trainer

    model = YOLO.from_yaml(tiny_model_path)
    data = DataConfig(train_path=synthetic_dataset, num_classes=8,
                      img_size=64, batch_size=4, workers=2, max_boxes=16,
                      augment=AugmentConfig("minimal"))
    trainer = Trainer(model, data=data, epochs=3, data_parallel=False,
                      optimizer=optax.adam(1e-3),
                      output_dir="/tmp/yolo_tpu_test_optax")
    first = trainer.train_one_epoch(0)
    last = trainer.train_one_epoch(1)
    last = trainer.train_one_epoch(2)
    assert np.all(np.isfinite(last))
    assert last.sum() < first.sum()


def test_trainer_optimizer_injection_pair(tiny_model_path,
                                          synthetic_dataset):
    """(init_fn, step_fn) form: plain SGD written by hand — the params
    must move exactly as the injected rule dictates."""
    from yolo_re_tpu.data.config import AugmentConfig, DataConfig
    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.train.trainer import Trainer

    def init_fn(params):
        return {}

    def step_fn(params, grads, state, step):
        new = jax.tree.map(lambda p, g: p - 0.01 * g, params, grads)
        return new, state

    model = YOLO.from_yaml(tiny_model_path)
    data = DataConfig(train_path=synthetic_dataset, num_classes=8,
                      img_size=64, batch_size=4, workers=2, max_boxes=16,
                      augment=AugmentConfig("minimal"))
    trainer = Trainer(model, data=data, epochs=1, data_parallel=False,
                      optimizer=(init_fn, step_fn),
                      output_dir="/tmp/yolo_tpu_test_optpair")
    before = np.asarray(trainer.params["stem1"]["w"]).copy()
    items = trainer.train_one_epoch(0)
    assert np.all(np.isfinite(items))
    after = np.asarray(trainer.params["stem1"]["w"])
    assert not np.array_equal(before, after)


def test_trainer_full_loop_and_resume(tiny_model_path, synthetic_dataset,
                                      tmp_path):
    """trainer.train() end to end: validates on EMA, writes best/last
    checkpoints + metrics.jsonl, and resumes exactly (reference policy:
    src/yolo/train/trainer.py:197-228, 336-371)."""
    import json

    from yolo_re_tpu.data.config import AugmentConfig, DataConfig
    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.train.trainer import Trainer

    out = tmp_path / "run"
    model = YOLO.from_yaml(tiny_model_path)
    data = DataConfig(train_path=synthetic_dataset,
                      val_path=synthetic_dataset, num_classes=8,
                      img_size=64, batch_size=4, workers=2, max_boxes=16,
                      augment=AugmentConfig("minimal"))
    trainer = Trainer(model, data=data, epochs=2, data_parallel=False,
                      val_period=1, output_dir=str(out))
    results = trainer.train()
    assert "map50" in results
    assert (out / "last.npz").exists()
    assert (out / "metrics.jsonl").exists()
    lines = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert len(lines) == 2 and "val_map50" in lines[-1]
    # per-epoch validation debug dumps, like the reference's evaluator
    # (src/yolo/eval/evaluator.py:164-196 via trainer.py:326)
    epoch_dirs = sorted((out / "debug").glob("epoch*"))
    assert epoch_dirs, "validate() wrote no debug images"
    assert any(list(d.glob("*.jpg")) for d in epoch_dirs)

    # resume: epoch counter, step counter, weights all restored
    trainer2 = Trainer(model, data=data, epochs=3, data_parallel=False,
                       val_period=10 ** 9, output_dir=str(out))
    trainer2.load_checkpoint(out / "last.npz")
    assert trainer2.start_epoch == 2
    assert trainer2.global_step == trainer.global_step
    a = np.asarray(trainer.params["stem1"]["w"])
    b = np.asarray(trainer2.params["stem1"]["w"])
    np.testing.assert_array_equal(a, b)
    items = trainer2.train_one_epoch(trainer2.start_epoch)
    assert np.all(np.isfinite(items))
