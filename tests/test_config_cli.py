"""Config/CLI mapping tests: the full reference flag surface parses and
lands in the right config fields (reference code/parse.py:16-114), plus
the long-name alias package and utils."""

import numpy as np

from gsrs_tpu.cli import build_parser, config_from_args
from gsrs_tpu.config import milestones_from_string, topks_from_string


def _cfg(argv):
    return config_from_args(build_parser().parse_args(argv))


def test_defaults_match_reference():
    cfg = _cfg([])
    assert cfg.train.batch_size == 2048
    assert cfg.model.embedding_dim == 64
    assert cfg.model.num_layers == 3
    assert cfg.train.lr == 1e-3
    assert cfg.train.decay == 1e-4
    assert cfg.train.epochs == 1000
    assert cfg.train.seed == 2020
    assert cfg.eval.topks == (20,)
    assert cfg.model.model == "lgn"
    assert cfg.train.sched_milestones == (120, 240, 360, 480)
    assert cfg.train.sched_gamma == 0.5
    assert cfg.model.pop_hidden == 32
    assert cfg.model.gate_hidden == 64
    assert cfg.model.gate_entropy_coeff == 1e-4
    assert cfg.model.keep_prob == 0.6
    assert cfg.train.save_every == 10


def test_flag_mapping():
    cfg = _cfg(
        [
            "--bpr_batch", "4096",
            "--recdim", "128",
            "--layer", "4",
            "--dropout", "1",
            "--use_pop_gate",
            "--use_item_item",
            "--i2i_path", "/tmp/x.npz",
            "--i2i_alpha", "0.25",
            "--use_scheduler",
            "--sched_milestones", "[10,20]",
            "--topks", "[10,20]",
            "--model", "mf",
            "--bf16",
            "--spmm", "segment",
        ]
    )
    assert cfg.train.batch_size == 4096
    assert cfg.model.embedding_dim == 128
    assert cfg.model.num_layers == 4
    assert cfg.model.dropout is True
    assert cfg.model.use_pop_gate and cfg.model.use_item_item
    assert cfg.model.i2i_path == "/tmp/x.npz"
    assert cfg.model.i2i_alpha == 0.25
    assert cfg.train.use_scheduler
    assert cfg.train.sched_milestones == (10, 20)
    assert cfg.eval.topks == (10, 20)
    assert cfg.model.model == "mf"
    assert cfg.model.bf16_compute
    assert cfg.model.spmm_mode == "segment"


def test_string_parsers():
    assert topks_from_string("[20]") == (20,)
    assert topks_from_string("[10, 20]") == (10, 20)
    assert topks_from_string("20") == (20,)
    assert milestones_from_string("[120,240]") == (120, 240)
    assert milestones_from_string("120,240") == (120, 240)
    assert milestones_from_string("500") == (500,)


def test_alias_package_resolves_same_modules():
    import graph_and_sequential_recommendation_systems_tpu as alias
    import gsrs_tpu

    assert alias.__version__ == gsrs_tpu.__version__
    from graph_and_sequential_recommendation_systems_tpu import models

    import gsrs_tpu.models as real_models

    assert models is real_models


def test_timer_named_tape():
    from gsrs_tpu.utils import Timer

    Timer.zero()
    with Timer.named("phase"):
        pass
    with Timer.named("phase"):
        pass
    assert Timer.counts()["phase"] == 2
    assert Timer.dict()["phase"] >= 0
    Timer.zero()
    assert Timer.dict() == {}


def test_set_seed_runs():
    from gsrs_tpu.utils import set_seed

    set_seed(123)
    a = np.random.rand(3)
    set_seed(123)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_minibatch_and_shuffle():
    from gsrs_tpu.utils.batching import minibatch, shuffle

    a = np.arange(10)
    b = np.arange(10) * 2
    batches = list(minibatch(a, b, batch_size=4))
    assert len(batches) == 3
    assert len(batches[-1][0]) == 2  # ragged tail kept (reference parity)
    sa, sb = shuffle(a, b, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(sb, sa * 2)  # permuted in unison
    assert not np.array_equal(sa, a)  # and actually permuted (seed 0 does)
    np.testing.assert_array_equal(np.sort(sa), a)  # …losing no elements


def test_compute_ppr_weights_rows_normalized(tiny_data):
    import scipy.sparse as sp

    from tools.compute_ppr import compute_ppr_weights  # conftest adds repo root

    R = tiny_data.user_item_net
    adj = sp.bmat([[None, R], [R.T, None]], format="csr", dtype=np.float64)
    W = compute_ppr_weights(adj, alpha=0.15, layers=3)
    assert W.shape == (tiny_data.n_users + tiny_data.m_items, 4)
    np.testing.assert_allclose(W.sum(axis=1), 1.0, rtol=1e-9)
    assert (W >= 0).all()


def test_pallas_scoring_flag_forms():
    """--use_pallas_scoring: absent = auto, bare = on, value = as given."""
    from gsrs_tpu.cli import build_parser, config_from_args

    p = build_parser()
    base = ["--dataset", "gowalla"]
    assert config_from_args(p.parse_args(base)).eval.use_pallas_scoring == "auto"
    assert (
        config_from_args(
            p.parse_args(base + ["--use_pallas_scoring"])
        ).eval.use_pallas_scoring
        == "on"
    )
    assert (
        config_from_args(
            p.parse_args(base + ["--use_pallas_scoring", "off"])
        ).eval.use_pallas_scoring
        == "off"
    )
