"""Fused Adam (train/fused_adam.py) vs optax.adam equivalence.

The fused backends must produce the same trajectories as the reference
optax chain (which itself mirrors torch.optim.Adam defaults, reference
code/utils.py:51) — same params after N steps, under a constant LR and
under the MultiStepLR schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gsrs_tpu.train.fused_adam import FusedAdam, _fused_adam_leaf_pallas


def _tree(seed=0, dtype=jnp.float32):
    k = jax.random.key(seed)
    k1, k2 = jax.random.split(k)
    return {
        "user_emb": jax.random.normal(k1, (37, 16), dtype) * 0.1,
        "item_emb": jax.random.normal(k2, (53, 16), dtype) * 0.1,
    }


def _grads(step, params):
    k = jax.random.key(100 + step)
    return jax.tree.map(
        lambda p: jax.random.normal(
            jax.random.fold_in(k, p.shape[0]), p.shape, p.dtype
        ),
        params,
    )


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_matches_optax_constant_lr(backend):
    sched = optax.constant_schedule(1e-2)
    fused = FusedAdam(schedule=sched, backend=backend, interpret=True)
    ref = optax.adam(learning_rate=sched)

    p_f = _tree()
    p_r = _tree()
    s_f = fused.init(p_f)
    s_r = ref.init(p_r)
    for step in range(5):
        g = _grads(step, p_f)
        p_f, s_f = fused.step(p_f, g, s_f)
        upd, s_r = ref.update(g, s_r, p_r)
        p_r = optax.apply_updates(p_r, upd)
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_matches_optax_schedule():
    # milestone boundary inside the run: lr halves at step 3
    sched = optax.piecewise_constant_schedule(1e-2, {3: 0.5})
    fused = FusedAdam(schedule=sched, backend="jnp")
    ref = optax.adam(learning_rate=sched)
    p_f, p_r = _tree(1), _tree(1)
    s_f, s_r = fused.init(p_f), ref.init(p_r)
    for step in range(6):
        g = _grads(step, p_f)
        p_f, s_f = fused.step(p_f, g, s_f)
        upd, s_r = ref.update(g, s_r, p_r)
        p_r = optax.apply_updates(p_r, upd)
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_pallas_leaf_odd_shape_roundtrip():
    # a leaf whose size is not a multiple of 128 exercises the pad/slice
    p = jnp.linspace(-1.0, 1.0, 37 * 11).reshape(37, 11)
    m = jnp.zeros_like(p)
    v = jnp.zeros_like(p)
    g = jnp.ones_like(p) * 0.5
    scalars = jnp.array([1e-2, 1.0 / (1 - 0.9), 1.0 / (1 - 0.999)], jnp.float32)
    po, mo, vo = _fused_adam_leaf_pallas(
        p, m, v, g, scalars, 0.9, 0.999, 1e-8, interpret=True
    )
    assert po.shape == p.shape and mo.shape == p.shape and vo.shape == p.shape
    # first step with g=0.5 everywhere: mhat=g, vhat=g^2 -> update = lr*~1
    np.testing.assert_allclose(
        np.asarray(p - po), 1e-2 * 0.5 / (0.5 + 1e-8), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(mo), 0.1 * 0.5, atol=1e-6)


def test_bf16_params_keep_dtype():
    sched = optax.constant_schedule(1e-2)
    fused = FusedAdam(schedule=sched, backend="jnp")
    p = _tree(2, jnp.bfloat16)
    s = fused.init(p)
    g = _grads(0, p)
    p2, s2 = fused.step(p, g, s)
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(p2))
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(s2.mu))


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_trainer_integration_fused(tmp_path, backend):
    """End-to-end: fused trainer matches the optax trainer's loss
    trajectory on identical data/seed (same RNG stream, same update
    math), and improves loss."""
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

    data = clustered(60, 80, n_clusters=4, seed=3)

    def run(fused):
        cfg = ExperimentConfig(
            model=ModelConfig(num_layers=2, embedding_dim=8),
            train=TrainConfig(
                batch_size=256,
                lr=5e-2,
                epochs=3,
                checkpoint_dir=str(tmp_path / fused),
                tensorboard=False,
                fused_adam=fused,
            ),
            eval=EvalConfig(test_batch=32, topks=(10,)),
        )
        graph = build_graph(data, edge_pad_multiple=256)
        model = build_model(cfg.model, graph, ell=ell_from_interactions(data))
        tr = Trainer(cfg, data, graph, model)
        state = tr.init_state()
        losses = []
        for _ in range(3):
            state, loss = tr.train_epoch(state)
            losses.append(float(loss))
        return losses

    base = run("off")
    fused = run(backend)
    assert fused[-1] < fused[0]
    np.testing.assert_allclose(fused, base, rtol=2e-4)
