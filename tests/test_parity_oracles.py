"""Independent-oracle parity: LSTM cell vs torch.nn.LSTM, GATv2 vs an
explicit edge-loop NumPy implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_lstm_cell_matches_torch():
    """The backward policy's LSTM must match torch.nn.LSTM step-for-step
    given identical weights (gate order i,f,g,o; torch's two biases sum)."""
    import torch

    from gflownet_spai_tpu.models.policies import BackwardPolicyParams, _lstm_cell

    rng = np.random.default_rng(0)
    input_dim, hidden = 1, 5
    w_ih = rng.standard_normal((input_dim, 4 * hidden)) * 0.3
    w_hh = rng.standard_normal((hidden, 4 * hidden)) * 0.3
    b = rng.standard_normal(4 * hidden) * 0.1

    tl = torch.nn.LSTM(input_dim, hidden, batch_first=True).double()
    with torch.no_grad():
        tl.weight_ih_l0.copy_(torch.tensor(w_ih.T))
        tl.weight_hh_l0.copy_(torch.tensor(w_hh.T))
        tl.bias_ih_l0.copy_(torch.tensor(b))
        tl.bias_hh_l0.zero_()

    p = BackwardPolicyParams(
        w_ih=jnp.asarray(w_ih), w_hh=jnp.asarray(w_hh), b=jnp.asarray(b),
        fc_w=jnp.zeros((hidden, 1)), fc_b=jnp.zeros((1,)),
    )
    T = 7
    xs = rng.standard_normal((T, input_dim))
    with torch.no_grad():
        out_t, (h_t, c_t) = tl(torch.tensor(xs, dtype=torch.float64)[None])

    carry = (jnp.zeros(hidden, jnp.float64), jnp.zeros(hidden, jnp.float64))
    ours = []
    for t in range(T):
        carry, h = _lstm_cell(p, carry, jnp.asarray(xs[t]))
        ours.append(np.asarray(h))
    np.testing.assert_allclose(np.stack(ours), out_t[0].numpy(), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(carry[0]), h_t[0, 0].numpy(), rtol=1e-8)


def test_gatv2_matches_explicit_numpy_oracle():
    """gatv2_apply vs a literal per-edge/per-head NumPy evaluation of the
    GATv2 equations (scores = aᵀ LeakyReLU(Wx_j + Wx_i + We), softmax over
    in-neighbors incl. self-loop with mean edge feature)."""
    from gflownet_spai_tpu.models.gat import gatv2_apply, gatv2_init

    rng = np.random.default_rng(1)
    N, E, IN, OUT, H = 5, 7, 3, 2, 2
    p = gatv2_init(jax.random.PRNGKey(0), IN, OUT, heads=H, dtype=jnp.float64)
    x = rng.standard_normal((N, IN))
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    ea = rng.standard_normal((E, 1))

    got = np.asarray(gatv2_apply(
        p, jnp.asarray(x), jnp.asarray(src, jnp.int32),
        jnp.asarray(dst, jnp.int32), jnp.asarray(ea), N, H, OUT))

    w_src = np.asarray(p.w_src).reshape(IN, H, OUT)
    w_dst = np.asarray(p.w_dst).reshape(IN, H, OUT)
    w_edge = np.asarray(p.w_edge).reshape(1, H, OUT)
    b_src = np.asarray(p.b_src).reshape(H, OUT)
    att = np.asarray(p.att)
    bias = np.asarray(p.bias)

    # mean-filled self-loop edge features (of the TRANSFORMED features,
    # matching the implementation: mean of ea @ w_edge)
    ea_t = np.einsum("ef,fho->eho", ea, w_edge)         # [E, H, OUT]
    mean_ea_t = ea_t.mean(axis=0)

    def leaky(v):
        return np.where(v > 0, v, 0.2 * v)

    out = np.zeros((N, H, OUT))
    for i in range(N):
        # incoming edges + self loop
        inc = [(src[e], ea_t[e]) for e in range(E) if dst[e] == i]
        inc.append((i, mean_ea_t))
        for h in range(H):
            scores, feats = [], []
            for j, e_t in inc:
                m = (x[j] @ w_src[:, h] + b_src[h]) + (x[i] @ w_dst[:, h]) + e_t[h]
                scores.append(att[h] @ leaky(m))
                feats.append(x[j] @ w_src[:, h] + b_src[h])
            sc = np.asarray(scores)
            al = np.exp(sc - sc.max()); al /= al.sum()
            out[i, h] = sum(a * f for a, f in zip(al, feats))
    want = out.reshape(N, H * OUT) + bias
    np.testing.assert_allclose(got, want, rtol=1e-9)
