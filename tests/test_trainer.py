"""End-to-end trainer tests on a tiny clustered dataset (CPU mesh):
loss decreases, eval beats chance, checkpoints roundtrip, scheduler
decays the LR at milestones, resume continues from the saved epoch."""

import os

import numpy as np
import pytest

from gsrs_tpu.config import (
    EvalConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from gsrs_tpu.data.adjacency import build_graph
from gsrs_tpu.data.synthetic import clustered
from gsrs_tpu.models.registry import build_model
from gsrs_tpu.ops.ell import ell_from_interactions
from gsrs_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def tiny_cluster_data():
    return clustered(120, 160, n_clusters=4, seed=3)


def make_trainer(data, tmp_path, **train_kw):
    cfg = ExperimentConfig(
        model=ModelConfig(num_layers=2, embedding_dim=16),
        train=TrainConfig(
            batch_size=512,
            lr=5e-2,
            epochs=10,
            checkpoint_dir=str(tmp_path),
            tensorboard=False,
            eval_every=5,
            save_every=4,
            **train_kw,
        ),
        eval=EvalConfig(test_batch=64, topks=(10, 20)),
    )
    graph = build_graph(data, edge_pad_multiple=512)
    model = build_model(cfg.model, graph, ell=ell_from_interactions(data))
    return Trainer(cfg, data, graph, model)


def test_fit_improves_and_checkpoints(tiny_cluster_data, tmp_path):
    trainer = make_trainer(tiny_cluster_data, tmp_path)
    state = trainer.fit(epochs=10, verbose=False)
    assert state.epoch == 10
    metrics = trainer.evaluate(state)
    # chance recall@20 ≈ 20/160 = 0.125; clustered structure must beat it
    assert metrics["recall@20"] > 0.2, metrics
    assert os.path.isdir(tmp_path / "last")
    assert any(p.name.startswith("best-epoch") for p in tmp_path.iterdir())
    assert os.path.isdir(tmp_path / "lgn-clustered-120x160-2-16")
    # CSV logs written with the reference schemas
    train_csv = (tmp_path / "train_epoch_metrics.csv").read_text().splitlines()
    assert train_csv[0] == "epoch,time_sec,train_loss,lr"
    assert len(train_csv) == 11
    valid_csv = (tmp_path / "valid_epoch_metrics.csv").read_text().splitlines()
    assert valid_csv[0].startswith("epoch,time_sec,lr,precision@10")


def test_loss_decreases(tiny_cluster_data, tmp_path):
    trainer = make_trainer(tiny_cluster_data, tmp_path)
    state = trainer.init_state()
    losses = []
    for _ in range(6):
        state, loss = trainer.train_epoch(state)
        losses.append(loss)
    assert losses[-1] < losses[0] * 0.6


def test_resume_roundtrip(tiny_cluster_data, tmp_path):
    trainer = make_trainer(tiny_cluster_data, tmp_path)
    state = trainer.init_state()
    for _ in range(3):
        state, _ = trainer.train_epoch(state)
    trainer.save_last(state)
    ref_params = np.asarray(state.params["user_emb"])

    trainer2 = make_trainer(tiny_cluster_data, tmp_path, resume=True)
    state2 = trainer2.maybe_resume(trainer2.init_state())
    assert state2.epoch == 3
    np.testing.assert_array_equal(np.asarray(state2.params["user_emb"]), ref_params)
    # and training continues from there
    state3, loss = trainer2.train_epoch(state2)
    assert state3.epoch == 4 and np.isfinite(loss)


def test_scheduler_milestones(tiny_cluster_data, tmp_path):
    trainer = make_trainer(
        tiny_cluster_data,
        tmp_path,
        use_scheduler=True,
        sched_milestones=(2, 4),
        sched_gamma=0.5,
    )
    state = trainer.init_state()
    lrs = [trainer.current_lr(state)]
    for _ in range(5):
        state, _ = trainer.train_epoch(state)
        lrs.append(trainer.current_lr(state))
    assert lrs[0] == pytest.approx(5e-2)
    assert lrs[2] == pytest.approx(2.5e-2)
    assert lrs[4] == pytest.approx(1.25e-2)


def test_mf_model_trains(tiny_cluster_data, tmp_path):
    cfg = ExperimentConfig(
        model=ModelConfig(model="mf", embedding_dim=16),
        train=TrainConfig(
            batch_size=512, lr=5e-2, checkpoint_dir=str(tmp_path), tensorboard=False
        ),
        eval=EvalConfig(test_batch=64),
    )
    graph = build_graph(tiny_cluster_data, edge_pad_multiple=512)
    model = build_model(cfg.model, graph)
    trainer = Trainer(cfg, tiny_cluster_data, graph, model)
    state = trainer.init_state()
    losses = []
    for _ in range(5):
        state, loss = trainer.train_epoch(state)
        losses.append(loss)
    assert losses[-1] < losses[0]


def test_final_epoch_always_evaluated(tiny_cluster_data, tmp_path):
    """Regression: when epochs is a multiple of eval_every, the in-loop
    eval fires before training each epoch, so the final state must still
    get the post-loop final eval."""
    trainer = make_trainer(tiny_cluster_data, tmp_path)  # eval_every=5
    trainer.fit(epochs=5, verbose=False)
    rows = (tmp_path / "valid_epoch_metrics.csv").read_text().splitlines()
    epochs_evaled = [int(r.split(",")[0]) for r in rows[1:]]
    assert 0 in epochs_evaled and 5 in epochs_evaled


def test_steps_per_scan_chunks_train(tiny_cluster_data, tmp_path):
    """Chunked scanning must train fine and produce losses in the same
    regime as the single-scan path (different RNG stream per chunk, so
    exact equality is not expected)."""
    t1 = make_trainer(tiny_cluster_data, tmp_path / "a")
    t2 = make_trainer(tiny_cluster_data, tmp_path / "b", steps_per_scan=1)
    assert t2.steps_per_epoch > 1  # the chunking is actually exercised
    s1, s2 = t1.init_state(), t2.init_state()
    l1 = l2 = None
    for _ in range(5):
        s1, l1 = t1.train_epoch(s1)
        s2, l2 = t2.train_epoch(s2)
    assert s2.epoch == 5
    assert np.isfinite(l2)
    assert l2 < 0.6 and abs(l1 - l2) < 0.15


def test_early_stopping(tiny_cluster_data, tmp_path):
    """With an impossible-to-improve patience of 1 eval and a model that
    barely moves (lr ~0), training must stop at the second eval rather
    than run all epochs."""
    trainer = make_trainer(
        tiny_cluster_data, tmp_path, early_stop_evals=1
    )
    # sabotage improvement: zero learning rate → metrics never improve
    import optax

    trainer.optimizer = optax.sgd(0.0)
    trainer._epoch_fn = None
    state = trainer.fit(epochs=50, verbose=False)
    # evals happen at e0 (sets best) and e5 (no improvement → stop)
    assert state.epoch == 5


def test_steps_per_scan_uncapped_matches_auto_below_cap(tiny_cluster_data, tmp_path):
    """-1 forces one uncapped scan segment. On a tiny dataset (fewer than
    128 steps/epoch) auto (0) already runs a single segment, so the two
    must be bit-identical — same RNG stream, same scan structure."""
    t1 = make_trainer(tiny_cluster_data, tmp_path / "a")
    t2 = make_trainer(tiny_cluster_data, tmp_path / "b", steps_per_scan=-1)
    assert t1.steps_per_epoch <= 128
    s1, s2 = t1.init_state(), t2.init_state()
    for _ in range(3):
        s1, l1 = t1.train_epoch(s1)
        s2, l2 = t2.train_epoch(s2)
    assert l1 == l2
    np.testing.assert_array_equal(
        np.asarray(s1.params["user_emb"]), np.asarray(s2.params["user_emb"])
    )


def test_save_last_every_throttles_and_final_save(tiny_cluster_data, tmp_path):
    """save_last_every (round-5: an Orbax write costs ~1-2 s, which
    dominated wall time at sub-second epochs) must throttle the rolling
    'last' save to the cadence AND still leave a final current 'last'
    checkpoint when fit() exits."""
    trainer = make_trainer(tiny_cluster_data, tmp_path, save_last_every=4)
    calls = []
    real = trainer.save_last
    trainer.save_last = lambda st: (calls.append(st.epoch), real(st))[1]
    state = trainer.fit(epochs=10, verbose=False)
    # cadence epochs 4, 8 + the final exit save at 10
    assert calls == [4, 8, 10], calls
    # the final 'last' checkpoint must restore to epoch 10
    restored = trainer.init_state()
    restored = trainer.maybe_resume(restored)
    assert restored.epoch == state.epoch == 10
