"""Engine + callbacks + trainer: a 2-epoch micro-run with validation
triggering, EMA tracking, periodic checkpointing and metric accumulation."""
import os

import numpy as np

import jax

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
from cerberus_tpu.models.convert import load_checkpoint
from cerberus_tpu.train.opt import build_trainer, get_config
from cerberus_tpu.train.steps import head_order

MODEL_KWARGS = {
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
}
LOSS_KWARGS = {
    "loss_info": {
        "Lumen-INST": {"weight": 1.5, "loss": {"ce": 1}},
        "Gland-INST": {"weight": 1.4, "loss": {"ce": 1}},
        "Nuclei-INST": {"weight": 1, "loss": {"ce": 1}},
        "Nuclei-TYPE": {"weight": 0, "loss": {"ce": 1, "dice": 1}},
        "Gland-TYPE": {"weight": 1, "loss": {"ce": 1, "dice": 1}},
        "Patch-Class": {"weight": 0.4, "loss": {"ce": 1}},
    },
    "class_weight": {"Gland-TYPE": {1: 1, 2: 1},
                     "Nuclei-TYPE": {1: 12, 2: 1, 3: 2, 4: 6, 5: 12, 6: 2}},
}
CFG = ModelConfig.from_kwargs(MODEL_KWARGS)


class FakeLoader:
    batch_size = 2

    def __init__(self, n_batches=2, hw=48, seed=0):
        self.n_batches = n_batches
        self.hw = hw
        self.seed = seed

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        heads = head_order(CFG)
        ch = {"Lumen-INST": 3, "Gland-INST": 3, "Nuclei-INST": 3,
              "Nuclei-TYPE": 7, "Gland-TYPE": 3}
        for _ in range(self.n_batches):
            batch = {
                "img": rng.integers(0, 255, (2, self.hw, self.hw, 3)
                                    ).astype(np.uint8),
                "has_target": np.ones((2, len(heads)), np.float32),
                "Patch-Class": rng.integers(0, 9, (2, 1, 1, 1)).astype(np.int32),
            }
            for head, n_cls in ch.items():
                batch[head] = rng.integers(0, n_cls, (2, self.hw, self.hw, 1)
                                           ).astype(np.int32)
                if head.endswith("-INST"):
                    batch[head + "#WEIGHT-MAP"] = np.ones(
                        (2, self.hw, self.hw, 1), np.float32)
            yield batch


def test_trainer_micro_run(tmp_path):
    log_dir = str(tmp_path / "logs")
    os.makedirs(log_dir)
    config = get_config(MODEL_KWARGS, LOSS_KWARGS, nr_epochs=2,
                        per_n_steps=2)
    train_engine, infer_engine, net = build_trainer(
        config, {"train": FakeLoader(2)}, {"valid": FakeLoader(1, seed=9)},
        log_dir=log_dir, best_metric="valid-Patch-Class-acc")
    train_engine.run(nr_epoch=2)

    # steps advanced
    assert int(net.state.step) == 4
    # EMA scalars tracked
    assert "overall_loss" in train_engine.state.tracked_step_output["scalar"]
    assert "lr-net" in train_engine.state.tracked_step_output["scalar"]
    # periodic checkpoint: the counter increments after STEP_COMPLETED (the
    # reference's cadence, run_utils/engine.py:194-196), so with 4 batches
    # and per_n_step=2 exactly one periodic save fires (at global step 2);
    # the best-metric ConditionalSaver also saves at least once
    ckpts = sorted(f for f in os.listdir(log_dir) if f.endswith(".tar"))
    assert "net_step-000002.tar" in ckpts
    assert "net_best=[valid-Patch-Class-acc].tar" in ckpts
    params = load_checkpoint(os.path.join(log_dir, sorted(ckpts)[0]))
    assert "backbone.conv1" in params
    # validation ran (chained engine) and produced metrics into stats file
    assert os.path.exists(f"{log_dir}/stats.yml")
    # validation metrics include accuracy for at least one head
    import yaml

    with open(f"{log_dir}/stats.yml") as f:
        stats = yaml.safe_load(f)
    all_keys = {k for epoch in stats.values() for k in epoch}
    assert any("acc" in k for k in all_keys), all_keys


def test_trainer_on_mesh(tmp_path):
    import conftest

    from cerberus_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(conftest.cpu_mesh_devices())
    config = get_config(MODEL_KWARGS, LOSS_KWARGS, nr_epochs=1, per_n_steps=5)
    train_engine, _infer, net = build_trainer(
        config, {"train": FakeLoader(1, hw=48)}, {"valid": FakeLoader(1)},
        mesh=mesh)
    # batch of 2 splits across... mesh size 8 needs batch % 8 == 0; use a
    # loader with batch 8
    class Loader8(FakeLoader):
        batch_size = 8

        def __iter__(self):
            for b in super().__iter__():
                yield {k: np.concatenate([v] * 4) for k, v in b.items()}

    train_engine.loader_dict = {"train": Loader8(1)}
    train_engine.run(nr_epoch=1)
    assert int(net.state.step) == 1


def test_resume_on_mesh_and_step_seeding(tmp_path):
    """--resume under a mesh restores params/step (ADVICE r1: it was
    silently ignored), and the engine step counter is seeded from the
    restored step so checkpoint names / log steps continue monotonically."""
    import conftest

    from cerberus_tpu.models.convert import save_train_state
    from cerberus_tpu.models.net_desc import init_net_params
    from cerberus_tpu.parallel.mesh import make_mesh

    ckpt = str(tmp_path / "resume.tar")
    params = init_net_params(jax.random.PRNGKey(3), CFG)
    marker = np.asarray(params["conv_map"]["kernel"]).copy() + 0.5
    params["conv_map"] = {"kernel": marker}
    save_train_state(ckpt, params, None, step=2000)

    config = get_config(MODEL_KWARGS, LOSS_KWARGS, nr_epochs=1, per_n_steps=5)
    config["phase_list"][0]["run_info"]["net"]["resume_from"] = ckpt
    mesh = make_mesh(conftest.cpu_mesh_devices())
    train_engine, _infer, net = build_trainer(
        config, {"train": FakeLoader(1)}, {"valid": FakeLoader(1)},
        mesh=mesh)
    assert int(net.state.step) == 2000
    assert train_engine.state.curr_global_step == 2000
    np.testing.assert_allclose(
        np.asarray(net.state.params["conv_map"]["kernel"]), marker)
    # non-mesh path seeds the counter too
    train_engine2, _i2, net2 = build_trainer(
        config, {"train": FakeLoader(1)}, {"valid": FakeLoader(1)})
    assert int(net2.state.step) == 2000
    assert train_engine2.state.curr_global_step == 2000


def test_conditional_saver_strict_comparator(tmp_path):
    """Strict '>' must fire when the current epoch beats all PRIOR epochs
    (ADVICE r1: the scan included the current epoch, making '>' impossible)."""
    import yaml

    from cerberus_tpu.train.callbacks import ConditionalSaver
    from cerberus_tpu.train.engine import State

    log_dir = str(tmp_path)
    stats = {"1": {"valid-acc": 0.5}, "2": {"valid-acc": 0.7}}
    with open(f"{log_dir}/stats.yml", "w") as f:
        yaml.safe_dump(stats, f)

    class _Net:
        class state:
            params = init_params_tiny()
            step = 2

    state = State()
    state.logging = True
    state.log_dir = log_dir
    state.log_info = {"yaml_file": f"{log_dir}/stats.yml"}
    state.curr_epoch = 2
    state.run_info = {"net": _Net()}

    saver = ConditionalSaver("valid-acc", comparator=">")
    saver.run(state, None)
    assert os.path.exists(f"{log_dir}/net_best=[valid-acc].tar")

    # not an improvement -> no overwrite
    os.remove(f"{log_dir}/net_best=[valid-acc].tar")
    stats["3"] = {"valid-acc": 0.7}
    with open(f"{log_dir}/stats.yml", "w") as f:
        yaml.safe_dump(stats, f)
    state.curr_epoch = 3
    saver.run(state, None)
    assert not os.path.exists(f"{log_dir}/net_best=[valid-acc].tar")


def init_params_tiny():
    from cerberus_tpu.models.net_desc import init_net_params

    return init_net_params(jax.random.PRNGKey(0), CFG)


def test_async_saver_flush_and_error_propagation(tmp_path):
    """save_train_state_async: writes are durable after flush and loadable;
    a failing write raises at flush_pending_saves, not silently."""
    import pytest

    from cerberus_tpu.models.convert import (
        flush_pending_saves,
        load_train_state,
        save_train_state_async,
    )

    params = init_params_tiny()
    path = str(tmp_path / "ck.tar")
    for step in (1, 2, 3):  # same path: single-worker pool keeps order
        save_train_state_async(path, params, None, step=step)
    flush_pending_saves()
    got, _opt, step = load_train_state(path)
    assert step == 3
    np.testing.assert_array_equal(
        np.asarray(got["backbone.conv1"]["kernel"]),
        np.asarray(params["backbone.conv1"]["kernel"]))

    save_train_state_async(str(tmp_path / "no_dir" / "x.tar"), params)
    with pytest.raises(FileNotFoundError):
        flush_pending_saves()
    flush_pending_saves()  # queue drained: idempotent after the raise


def test_multi_phase_training_chains_params(tmp_path):
    """phase_list with two phases: phase 1 (pretrained=-1) starts from
    phase 0's final params; each phase logs under <log_dir>/<idx>
    (reference models/opt.py:39-41,66-68 schema; runner defined here)."""
    from cerberus_tpu.train.opt import get_config, run_training

    log_dir = str(tmp_path / "logs")
    os.makedirs(log_dir)
    config = get_config(MODEL_KWARGS, LOSS_KWARGS, nr_epochs=1,
                        per_n_steps=1)
    p0 = dict(config["phase_list"][0])
    p1 = {"run_info": {"net": dict(p0["run_info"]["net"], pretrained=-1)},
          "nr_epochs": 1}
    config["phase_list"] = [p0, p1]

    net = run_training(config, {"train": FakeLoader(2)},
                       {"valid": FakeLoader(1, seed=9)}, log_dir=log_dir)
    # both phases stepped: 2 batches each, phase 1 resumed phase 0's params
    # (fresh optimizer/step per phase, like a new engine run)
    assert int(net.state.step) == 2
    assert os.path.isdir(os.path.join(log_dir, "00"))
    assert os.path.isdir(os.path.join(log_dir, "01"))
    ck0 = [f for f in os.listdir(os.path.join(log_dir, "00"))
           if f.endswith(".tar")]
    ck1 = [f for f in os.listdir(os.path.join(log_dir, "01"))
           if f.endswith(".tar")]
    assert ck0 and ck1


def test_mesh_resume_writes_continuing_checkpoints(tmp_path):
    """A resumed MESH run must write correctly-numbered subsequent
    checkpoints (VERDICT r2 task 8). Naming convention (reference
    run_utils/engine.py:185-195 parity): the filename is the engine
    counter at STEP_COMPLETED time, which is payload optimizer step - 1;
    a file named step-K therefore holds step K+1, and resuming from it
    seeds the counter to K+1 so subsequent names continue at step-(K+1)
    without ever overwriting the resume source."""
    import conftest

    from cerberus_tpu.models.convert import (
        flush_pending_saves,
        load_train_state,
        save_train_state,
    )
    from cerberus_tpu.models.net_desc import init_net_params
    from cerberus_tpu.parallel.mesh import make_mesh

    ckpt = str(tmp_path / "resume.tar")
    params = init_net_params(jax.random.PRNGKey(3), CFG)
    save_train_state(ckpt, params, None, step=2000)

    log_dir = str(tmp_path / "logs")
    os.makedirs(log_dir)
    config = get_config(MODEL_KWARGS, LOSS_KWARGS, nr_epochs=1,
                        per_n_steps=1)
    config["phase_list"][0]["run_info"]["net"]["resume_from"] = ckpt
    mesh = make_mesh(conftest.cpu_mesh_devices())

    class Loader8(FakeLoader):
        batch_size = 8

        def __iter__(self):
            for b in super().__iter__():
                yield {k: np.concatenate([v] * 4) for k, v in b.items()}

    train_engine, _infer, net = build_trainer(
        config, {"train": Loader8(2)}, {"valid": FakeLoader(1)},
        log_dir=log_dir, mesh=mesh)
    train_engine.run(nr_epoch=1)
    flush_pending_saves()

    tars = sorted(f for f in os.listdir(log_dir) if f.endswith(".tar"))
    # resume file holds step 2000 => its own would-be name is step-001999;
    # the resumed run's first save is step-002000 (payload 2001): monotone,
    # no collision with the resume source's name
    assert tars == ["net_step-002000.tar", "net_step-002001.tar"], tars
    for i, name in enumerate(tars, start=2000):
        _p, _o, step = load_train_state(os.path.join(log_dir, name))
        assert step == i + 1, (name, step)
    assert int(net.state.step) == 2002
