"""Offline tooling tests: i2i builder math vs hand-computed oracles
(reference preprocess_instacart_i2i.py pipeline), Instacart converter
semantics (reference prepare_instacart.py), i2i CLI artifact roundtrip
into the model."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from gsrs_tpu.data.dataset import InteractionData, load_dataset
from gsrs_tpu.data.i2i import (
    build_item_item,
    cooccurrence_counts,
    symmetrize_and_normalize,
    topk_prune,
    weight_matrix,
)


@pytest.fixture
def basket_data():
    # users' baskets: u0:{0,1,2}, u1:{0,1}, u2:{2,3}
    u = np.array([0, 0, 0, 1, 1, 2, 2])
    i = np.array([0, 1, 2, 0, 1, 2, 3])
    return InteractionData("baskets", 3, 4, u, i, {})


def test_cooccurrence_counts(basket_data):
    C = cooccurrence_counts(basket_data).toarray()
    # items 0,1 co-occur in two baskets; 0-2 and 1-2 in one; 2-3 in one
    expect = np.array(
        [
            [0, 2, 1, 0],
            [2, 0, 1, 0],
            [1, 1, 0, 1],
            [0, 0, 1, 0],
        ],
        dtype=float,
    )
    np.testing.assert_array_equal(C, expect)


def test_jaccard_weighting(basket_data):
    C = cooccurrence_counts(basket_data)
    A = weight_matrix(C, basket_data.item_degrees, "jaccard").toarray()
    # deg = [2,2,2,1]; jaccard(0,1) = 2/(2+2-2) = 1.0
    assert A[0, 1] == pytest.approx(1.0)
    # jaccard(2,3) = 1/(2+1-1) = 0.5
    assert A[2, 3] == pytest.approx(0.5)


def test_ppmi_weighting_nonnegative(basket_data):
    C = cooccurrence_counts(basket_data)
    A = weight_matrix(C, basket_data.item_degrees, "ppmi")
    assert (A.data >= 0).all()
    # PMI(0,1) = log((2/7) / (2/7 * 2/7)) = log(7/2) > 0
    np.testing.assert_allclose(A.toarray()[0, 1], np.log(7 / 2), rtol=1e-6)


def test_topk_prune():
    A = sp.csr_matrix(
        np.array([[0, 5, 3, 1], [2, 0, 0, 0], [0, 0, 0, 0], [9, 8, 7, 0]], float)
    )
    P = topk_prune(A, 2).toarray()
    np.testing.assert_array_equal(
        P, [[0, 5, 3, 0], [2, 0, 0, 0], [0, 0, 0, 0], [9, 8, 0, 0]]
    )


def test_symmetrize_and_normalize():
    A = sp.csr_matrix(np.array([[0, 4.0], [1.0, 0]]))
    N = symmetrize_and_normalize(A).toarray()
    # max-symmetrized: [[0,4],[4,0]]; degrees [4,4] → normalized [[0,1],[1,0]]
    np.testing.assert_allclose(N, [[0, 1], [1, 0]])
    np.testing.assert_allclose(N, N.T)


def test_full_pipeline_and_model_fusion(basket_data, tmp_path):
    A = build_item_item(basket_data, scheme="cooc", topk=2)
    assert (A != A.T).nnz == 0  # symmetric
    path = str(tmp_path / "i2i_adj.npz")
    sp.save_npz(path, A)

    # feed through the model's i2i fusion path
    import dataclasses

    import jax

    from gsrs_tpu.config import ModelConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.models.lightgcn import ItemItemGraph, LightGCN

    graph = build_graph(basket_data, edge_pad_multiple=32)
    cfg = ModelConfig(
        num_layers=1, embedding_dim=4, use_item_item=True, i2i_alpha=0.5
    )
    model = LightGCN(
        cfg, graph, i2i=ItemItemGraph.from_scipy(sp.load_npz(path), 32)
    )
    params = model.init_params(jax.random.key(0))
    _, ai = model.propagate(params)
    base = LightGCN(dataclasses.replace(cfg, use_item_item=False), graph)
    _, ai0 = base.propagate(params)
    expect = np.asarray(ai0) + 0.5 * (A.toarray() @ np.asarray(ai0))
    np.testing.assert_allclose(np.asarray(ai), expect, atol=1e-5)


def test_instacart_prepare(tmp_path):
    import pandas as pd

    from gsrs_tpu.data.instacart import prepare_instacart

    # 3 users; u1 has 3 prior orders, u2 has 2, u3 has 1 (filtered out)
    orders = pd.DataFrame(
        {
            "order_id": [1, 2, 3, 4, 5, 6, 7],
            "user_id": [1, 1, 1, 2, 2, 3, 1],
            "eval_set": ["prior"] * 6 + ["train"],
            "order_number": [1, 2, 3, 1, 2, 1, 4],
        }
    )
    products = pd.DataFrame(
        {
            "order_id": [1, 1, 2, 3, 3, 4, 5, 6],
            "product_id": [10, 11, 10, 12, 13, 20, 21, 30],
        }
    )
    odir = tmp_path / "raw"
    odir.mkdir()
    orders.to_csv(odir / "orders.csv", index=False)
    products.to_csv(odir / "order_products__prior.csv", index=False)

    out = tmp_path / "instacart"
    n, m = prepare_instacart(
        str(odir / "orders.csv"),
        str(odir / "order_products__prior.csv"),
        str(out),
        min_orders=2,
    )
    data = load_dataset(str(out))
    # user 3 filtered (1 prior order); user 1: train orders 1,2 = items
    # {10,11}, test order 3 = {12,13}; user 2: train {20}, test {21}
    assert n == 2
    assert m == 6  # union of train+test items
    assert os.path.exists(out / "user_list.txt")
    assert data.train_size == 3  # u1:{10,11}, u2:{20}
    assert len(data.test_dict) == 2
    assert sum(len(v) for v in data.test_dict.values()) == 3  # {12,13},{21}


def test_movielens_prepare_formats(tmp_path):
    from gsrs_tpu.data.movielens import prepare_movielens

    # ML-100K u.data style: user \t item \t rating \t ts
    # u1: items 10(t1,r5) 11(t2,r4) 12(t3,r5) 13(t4,r4) — all positives
    # u2: 10(t1,r4) 11(t2,r3→dropped) 12(t3,r4) — only 2 positives
    rows = [
        (1, 10, 5, 100), (1, 11, 4, 200), (1, 12, 5, 300), (1, 13, 4, 400),
        (2, 10, 4, 100), (2, 11, 3, 200), (2, 12, 4, 300),
    ]
    udata = tmp_path / "u.data"
    udata.write_text("".join(f"{u}\t{i}\t{r}\t{t}\n" for u, i, r, t in rows))

    out = tmp_path / "ml"
    n, m = prepare_movielens(
        str(udata), str(out), min_rating=4.0, min_interactions=2,
        split="leave_last",
    )
    data = load_dataset(str(out))
    # u1 keeps {10,11,12} train, {13} test; u2 keeps {10} train, {12} test
    assert (n, m) == (2, 4)
    assert data.train_size == 4
    assert len(data.test_dict) == 2

    # ratio split: u1 has 4 positives, test_frac .5 → last 2 held out
    out2 = tmp_path / "ml2"
    prepare_movielens(
        str(udata), str(out2), min_rating=4.0, min_interactions=2,
        split="ratio", test_frac=0.5,
    )
    d2 = load_dataset(str(out2))
    assert sum(len(v) for v in d2.test_dict.values()) == 3  # u1: 2, u2: 1

    # ML-1M :: format parses identically
    dat = tmp_path / "ratings.dat"
    dat.write_text("".join(f"{u}::{i}::{r}::{t}\n" for u, i, r, t in rows))
    out3 = tmp_path / "ml3"
    assert prepare_movielens(
        str(dat), str(out3), min_rating=4.0, min_interactions=2,
        split="leave_last",
    ) == (2, 4)

    # ML-25M csv-with-header format
    csvf = tmp_path / "ratings.csv"
    csvf.write_text(
        "userId,movieId,rating,timestamp\n"
        + "".join(f"{u},{i},{r}.0,{t}\n" for u, i, r, t in rows)
    )
    out4 = tmp_path / "ml4"
    assert prepare_movielens(
        str(csvf), str(out4), min_rating=4.0, min_interactions=2,
        split="leave_last",
    ) == (2, 4)
