"""tenet — the boilerplate-net trainer (reference: src/programs/tenet.pas,
src/units/trtenetapplication.pas).

The reference builds a fully-connected net with ``fann_create_standard``
(37 inputs -> one 18-neuron hidden layer by default -> 1 output,
trtenetapplication.pas:128-138, 396-410), hidden activation
FANN_SIGMOID_SYMMETRIC, output FANN_LINEAR_PIECE_SYMMETRIC, trains with
FANN_TRAIN_RPROP (:136) on a FANN-format ``.dat`` file to 50,000 epochs or
a target MSE, and saves FANN_FLO_2.1 (:420-422).  This module reproduces
that as deterministic numpy: full-batch iRPROP- (Igel & Huesken 2000 — the
algorithm FANN's RPROP implements) with seeded [-0.1, 0.1] init, and a
FANN_FLO_2.1 writer whose output loads through clean/boilerplate.FannNet
(round-trip pinned by tests).

Spark posture: training data is driver-sized by construction (the shipped
.dat files are ~10k rows x 37 features; even 10^6 rows is megabytes), so
training runs as local vectorized numpy — the DISTRIBUTED path is
inference, where the trained net rides the broadcastable FannNet into the
cleaning chain's mapInPandas kernel.  Distributing 50k synchronous
full-batch epochs over executors would add a barrier per epoch and win
nothing.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..clean.boilerplate import FannNet

SIGMOID_SYMMETRIC = 5  # FANN activation codes, fann_data.h
LINEAR_PIECE_SYMMETRIC = 10


@dataclass
class TrainData:
    """FANN training-file pair block: header ``n n_in n_out``, then
    alternating input / output lines (the shipped boilerplate.*.dat)."""

    x: np.ndarray  # (n, n_in)
    y: np.ndarray  # (n, n_out)

    @classmethod
    def parse(cls, text: str) -> "TrainData":
        toks = text.split()
        n, n_in, n_out = int(toks[0]), int(toks[1]), int(toks[2])
        vals = np.array(toks[3:], dtype=np.float64)
        if len(vals) != n * (n_in + n_out):
            raise ValueError(
                f"expected {n}x({n_in}+{n_out}) values, got {len(vals)}"
            )
        pairs = vals.reshape(n, n_in + n_out)
        return cls(pairs[:, :n_in].copy(), pairs[:, n_in:].copy())


def _forward(weights, x, steep=0.5):
    """Activations per layer under the tenet defaults: tanh(s*z) hidden,
    clip(s*z, -1, 1) output.  Returns ([input, h1, ..., out], z_out) with
    bias column appended to every non-output layer; z_out is the output
    layer's raw preactivation (the backward pass needs it for the clip
    derivative)."""
    acts = [np.hstack([x, np.ones((x.shape[0], 1))])]
    z_out = None
    for li, w in enumerate(weights):
        z = acts[-1] @ w
        if li < len(weights) - 1:
            a = np.tanh(steep * z)
            acts.append(np.hstack([a, np.ones((a.shape[0], 1))]))
        else:
            z_out = z
            acts.append(np.clip(steep * z, -1.0, 1.0))
    return acts, z_out


def _gradients(weights, x, y, steep=0.5):
    """Full-batch MSE gradients (d MSE / d w) and the batch MSE, FANN's
    definition: mean squared error over all output units and rows."""
    acts, z_out = _forward(weights, x, steep)
    out = acts[-1]
    err = out - y
    mse = float(np.mean(err**2))
    # output: d clip(s*z)/dz = s inside the linear range, 0 when clipped
    delta = 2.0 * err / err.size * np.where(np.abs(steep * z_out) < 1.0, steep, 0.0)
    grads = [None] * len(weights)
    for li in range(len(weights) - 1, -1, -1):
        grads[li] = acts[li].T @ delta
        if li > 0:
            back = delta @ weights[li].T  # includes the bias column
            a_prev = acts[li][:, :-1]  # drop bias before tanh'
            delta = back[:, :-1] * steep * (1.0 - a_prev**2)
    return grads, mse


def train_net(
    data: TrainData,
    hidden: tuple[int, ...] = (18,),
    epochs: int = 50_000,
    desired_error: float = 1e-4,
    seed: int = 7,
    steep: float = 0.5,
) -> tuple[FannNet, list[float]]:
    """iRPROP- to the reference's stopping rule (epochs or MSE <=
    desired_error).  Returns (net, per-report MSE trace)."""
    rng = np.random.default_rng(seed)
    n_in, n_out = data.x.shape[1], data.y.shape[1]
    sizes = [n_in] + list(hidden) + [n_out]
    weights = [
        rng.uniform(-0.1, 0.1, (sizes[i] + 1, sizes[i + 1]))
        for i in range(len(sizes) - 1)
    ]
    # iRPROP- state (FANN defaults): eta+ 1.2, eta- 0.5, delta0 0.1,
    # delta in [1e-6, 50]
    steps = [np.full_like(w, 0.1) for w in weights]
    prev = [np.zeros_like(w) for w in weights]
    trace = []
    for epoch in range(epochs):
        grads, mse = _gradients(weights, data.x, data.y, steep)
        if epoch % 100 == 0 or mse <= desired_error:
            trace.append(mse)
        if mse <= desired_error:
            break
        for w, g, st, pg in zip(weights, grads, steps, prev):
            sign = g * pg
            st *= np.where(sign > 0, 1.2, np.where(sign < 0, 0.5, 1.0))
            np.clip(st, 1e-6, 50.0, out=st)
            g[sign < 0] = 0.0  # iRPROP-: no revert, just forget the sign
            w -= np.sign(g) * st
            pg[:] = g
    layer_sizes = [s + 1 for s in sizes[:-1]] + [sizes[-1] + 1]
    acts = [SIGMOID_SYMMETRIC] * len(hidden) + [LINEAR_PIECE_SYMMETRIC]
    return FannNet(layer_sizes, weights, acts, [steep] * len(weights)), trace


def to_fann_text(net: FannNet) -> str:
    """FANN_FLO_2.1 text serialization of a FannNet, field-for-field the
    layout libfann's fann_save writes and fann_create_from_file re-reads
    (mirrored against the shipped data/boilerplate.de.net): the full
    fixed-order header block, per-layer bias neurons, and connection
    indices that are GLOBAL source-neuron ids restarting at the previous
    layer's first neuron for every target neuron.  FannNet.parse reads it
    back too (round-trip pinned in tests)."""
    sizes = net.layer_sizes
    header = (
        "FANN_FLO_2.1\n"
        f"num_layers={len(sizes)}\n"
        "learning_rate=0.700000\n"
        "connection_rate=1.000000\n"
        "network_type=0\n"
        "learning_momentum=0.000000\n"
        "training_algorithm=2\n"  # FANN_TRAIN_RPROP — what train_net implements
        "train_error_function=1\n"
        "train_stop_function=0\n"
        "cascade_output_change_fraction=0.010000\n"
        "quickprop_decay=-0.000100\n"
        "quickprop_mu=1.750000\n"
        "rprop_increase_factor=1.200000\n"
        "rprop_decrease_factor=0.500000\n"
        "rprop_delta_min=0.000000\n"
        "rprop_delta_max=50.000000\n"
        "rprop_delta_zero=0.100000\n"
        "cascade_output_stagnation_epochs=12\n"
        "cascade_candidate_change_fraction=0.010000\n"
        "cascade_candidate_stagnation_epochs=12\n"
        "cascade_max_out_epochs=150\n"
        "cascade_max_cand_epochs=150\n"
        "cascade_num_candidate_groups=2\n"
        "bit_fail_limit=3.49999994039535522461e-01\n"
        "cascade_candidate_limit=1.00000000000000000000e+03\n"
        "cascade_weight_multiplier=4.00000005960464477539e-01\n"
        "cascade_activation_functions_count=10\n"
        "cascade_activation_functions=3 5 7 8 10 11 14 15 16 17 \n"
        "cascade_activation_steepnesses_count=4\n"
        "cascade_activation_steepnesses=2.50000000000000000000e-01 "
        "5.00000000000000000000e-01 7.50000000000000000000e-01 "
        "1.00000000000000000000e+00 \n"
        "layer_sizes=" + " ".join(str(s) for s in sizes) + " \n"
        "scale_included=0\n"
    )
    neurons: list[tuple[int, int, float]] = [(0, 0, 0.0)] * sizes[0]
    conns: list[tuple[int, float]] = []
    src_offset = 0
    for li, w in enumerate(net.weights):
        prev, real = w.shape
        act, steep = net.activations[li], net.steepness[li]
        for j in range(real):
            neurons.append((prev, act, steep))
            conns.extend((src_offset + k, w[k, j]) for k in range(prev))
        if sizes[li + 1] - real == 1:
            neurons.append((0, 0, 0.0))  # this layer's bias neuron
        src_offset += sizes[li]
    return (
        header
        + "neurons (num_inputs, activation_function, activation_steepness)="
        + "".join(f"({n}, {a}, {s:.20e}) " for n, a, s in neurons)
        + "\n"
        + "connections (connected_to_neuron, weight)="
        + "".join(f"({i}, {v:.20e}) " for i, v in conns)
        + "\n"
    )
