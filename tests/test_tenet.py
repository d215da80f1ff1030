"""tenet trainer: .dat parsing, iRPROP- convergence, FANN_FLO_2.1
round-trip through the existing FannNet evaluator, and training on the
reference's own shipped data (trtenetapplication.pas semantics)."""

import os

import numpy as np
import pytest

from texrex_spark.clean.boilerplate import FannNet
from texrex_spark.train.tenet import TrainData, to_fann_text, train_net

REF_DAT = os.path.join(
    os.environ.get("TEXREX_DATA_DIR", "/root/reference/data"), "boilerplate.de.dat"
)


def test_traindata_parse():
    text = "2 3 1\n0.1 0.2 0.3\n1\n0.4 0.5 0.6\n0\n"
    d = TrainData.parse(text)
    assert d.x.shape == (2, 3) and d.y.shape == (2, 1)
    assert d.x[1, 2] == pytest.approx(0.6) and d.y[0, 0] == 1.0


def test_xor_converges_deterministically():
    x = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], float)
    y = np.array([[-1], [1], [1], [-1]], float)
    net, trace = train_net(TrainData(x, y), hidden=(6,), epochs=3000,
                           desired_error=1e-3, seed=3)
    assert trace[-1] < 1e-2 and trace[-1] < trace[0]
    net2, trace2 = train_net(TrainData(x, y), hidden=(6,), epochs=3000,
                             desired_error=1e-3, seed=3)
    assert trace == trace2  # seeded: bit-identical reruns
    assert all(np.array_equal(a, b) for a, b in zip(net.weights, net2.weights))


def test_fann_text_roundtrip():
    x = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], float)
    y = np.array([[-1], [1], [1], [-1]], float)
    net, _ = train_net(TrainData(x, y), hidden=(5, 4), epochs=200,
                       desired_error=1e-6, seed=11)
    rt = FannNet.parse(to_fann_text(net))
    assert rt.layer_sizes == net.layer_sizes
    xs = np.random.default_rng(0).uniform(0, 1, (40, 2))
    assert np.allclose(net.run(xs), rt.run(xs), atol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_DAT), reason="reference data absent")
def test_trains_on_reference_data():
    """300 epochs on the shipped German training set must reach >0.95
    training accuracy at the symmetric decision threshold (the full
    reference run uses 50k epochs; this pins the trainer's trajectory)."""
    with open(REF_DAT, encoding="utf-8") as f:
        data = TrainData.parse(f.read())
    assert data.x.shape == (9917, 37)
    sub = TrainData(data.x[:2000], data.y[:2000] * 2.0 - 1.0)
    net, trace = train_net(sub, hidden=(18,), epochs=300,
                           desired_error=1e-4, seed=7)
    assert trace[-1] < trace[0]
    acc = float(np.mean((net.run(sub.x) > 0.0) == (sub.y[:, 0] > 0.0)))
    assert acc > 0.95
    # the trained net must flow through the chain's loader path
    rt = FannNet.parse(to_fann_text(net))
    assert np.allclose(rt.run(sub.x[:50]), net.run(sub.x[:50]), atol=1e-6)
